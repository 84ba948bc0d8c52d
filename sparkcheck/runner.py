"""Execution: run a compiled suite against a DataFrame.

Job structure (vs the reference, SURVEY.md §4):
- pass 1: ONE ``df.agg(...)`` per domain — all aggregate values, map-condition
  unexpected counts, HLL sketches, and drift histogram buckets fused. With
  ``per_partition=True`` this becomes ``df.rollup("__pid").agg(...)`` so one
  pass yields per-partition verdict rows AND the exact global result (the
  reference runs one job per materialized metric family instead:
  map_metric_provider.py:2344-2490).
- pass 2 (optional): dependent conditions (z-score) whose expressions need
  pass-1 values (mean/stddev) — one fused agg for all of them together.
- extra jobs only where semantics require them: window conditions
  (increasing/decreasing), uniqueness dup-groups (groupBy instead of the
  reference's whole-table window — column_values_unique.py:83-87), referential
  anti-joins, audio-invariant joins, and violation samples for failed
  expectations (filter + limit, like map_metric_provider.py:2372-2415).

Scale notes: the fused pass is a single scan with map-side partial
aggregation; `bytes`-typed columns are never read unless an audio expectation
is in the suite (Catalyst column pruning); violation samples are capped
driver-side (COMPLETE caps at ``unexpected_list_limit``, default 10k) with the
full set available via the checkpoint results sink instead of the driver.
"""

from __future__ import annotations

import traceback
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .expectations.defs import ExpectationSpec, get_spec
from .metrics import conditions as C
from .metrics import sketches
from .planner import CompiledItem, DomainPlan, compile_suite
from .results import (
    format_map_output,
    mostly_success,
    normalize_result_format,
    validate_metric_value_between,
)
from .types import (
    ExpectationConfiguration,
    ExpectationSuite,
    ExpectationSuiteValidationResult,
    ExpectationValidationResult,
    build_statistics,
)

UNEXPECTED_LIST_LIMIT = 10_000


def _is_valid_partition_object(po) -> bool:
    """Reference execution_engine/util.py:21-78 semantics."""
    import numpy as _np
    if po is None:
        return False
    if "values" in po and "weights" in po:
        return (len(po["values"]) == len(po["weights"])
                and _np.allclose(sum(po["weights"]), 1))
    if "bins" in po and "weights" in po:
        comb = list(po["weights"])
        if "tail_weights" in po:
            if len(po["tail_weights"]) != 2:
                return False
            comb = comb + list(po["tail_weights"])
        bins = po["bins"]
        return (len(bins) == len(po["weights"]) + 1
                and all(b2 > b1 for b1, b2 in zip(bins, bins[1:]))
                and _np.allclose(sum(comb), 1.0))
    return False


class ValidationRun:
    """Holds one validation run's context and results."""

    def __init__(
        self,
        df: DataFrame,
        *,
        tables: dict[str, DataFrame] | None = None,
        result_format: Any = "BASIC",
        catch_exceptions: bool = True,
        per_partition: bool = False,
        partition_col: str | None = None,
        unique_strategy: str = "exact",  # 'exact' | 'approx' | 'auto'
        partition_verdict_sink: str | None = None,
    ) -> None:
        self.df = df
        self.tables = tables or {}
        self.rf = normalize_result_format(result_format)
        self.rf.setdefault("unexpected_list_limit", UNEXPECTED_LIST_LIMIT)
        self.catch_exceptions = catch_exceptions
        self.per_partition = per_partition
        self.partition_col = partition_col
        self.unique_strategy = unique_strategy
        # VERDICT r3 #6: with per_partition=True the rollup produces one row
        # per partition x the full slot-table width; collect()ing that is
        # fine at thousands of partitions but a driver-memory edge at 100k+
        # Iceberg partitions. Set `partition_verdict_sink` (a directory) to
        # write the rollup rows AND the derived per-partition verdict rows
        # as parquet DISTRIBUTED — the driver only ever reads the single
        # global row back. Read results with read_partition_verdicts().
        self.partition_verdict_sink = partition_verdict_sink
        if partition_verdict_sink is not None and not per_partition:
            raise ValueError(
                "partition_verdict_sink requires per_partition=True")
        self.partition_verdicts: list[dict] = []

    # ------------------------------------------------------------- helpers

    def _pid_expr(self):
        """Rollup key for per-partition verdicts: a REAL partition column
        (e.g. the Iceberg partition value — semantically meaningful, stable
        across parallelism levels) when given, else the physical
        spark_partition_id (reflects the current scan layout)."""
        if self.partition_col:
            return F.col(self.partition_col)
        return F.spark_partition_id()

    def _sample_limit(self) -> int:
        if self.rf["result_format"] == "COMPLETE":
            return self.rf["unexpected_list_limit"]
        return self.rf["partial_unexpected_count"]

    # ------------------------------------- distributed verdict sink (r4)

    def _sink_lits(self, item: CompiledItem) -> list[Column]:
        import json as _json
        kw = item.kwargs
        domain = (kw.get("column") or ",".join(kw.get("column_list", []))
                  or kw.get("column_A", ""))
        return [
            F.lit(item.config.expectation_type).alias("expectation_type"),
            F.lit(domain).alias("domain"),
            F.lit(item.spec.kind).alias("kind"),
            F.lit(_json.dumps(kw, sort_keys=True, default=str))
            .alias("config_kwargs"),
        ]

    def _sink_verdict_select(self, item: CompiledItem) -> list[Column] | None:
        """Spark-expression verdict derivation for one fused item over stored
        rollup rows — the distributed twin of _evr_from_row_quiet. Returns
        None when the verdict is not Catalyst-expressible (exact-opt-in
        quantiles / non-numeric or datetime bounds / NaN-bearing value
        sets); those fall back to a NARROW driver collect of just that
        item's slot columns. Drift items go through _sink_drift_frame
        (Arrow-scored) instead."""
        spec, kw = item.spec, item.kwargs
        pid = F.col("__pid").cast("string").alias("partition_id")
        lits = self._sink_lits(item)
        null_l = F.lit(None).cast("long")
        null_d = F.lit(None).cast("double")

        def _between(v: Column) -> Column:
            lo, hi = kw.get("min_value"), kw.get("max_value")
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (v > lo if kw.get("strict_min") else v >= lo)
            if hi is not None:
                cond = cond & (v < hi if kw.get("strict_max") else v <= hi)
            # validate_metric_value_between: a NULL observed value fails
            return F.when(v.isNull(), F.lit(False)).otherwise(cond)

        def _numeric_bounds() -> bool:
            lo, hi = kw.get("min_value"), kw.get("max_value")
            num = (int, float, type(None))
            return (isinstance(lo, num) and isinstance(hi, num)
                    and not isinstance(lo, bool) and not isinstance(hi, bool)
                    and not kw.get("parse_strings_as_datetimes"))

        if spec.kind == "map":
            el = F.coalesce(F.col(item.slots["element"]), F.lit(0)).cast("long")
            nn = F.coalesce(F.col(item.slots["nonnull"]), F.lit(0)).cast("long")
            ux = F.coalesce(F.col(item.slots["unexpected"]), F.lit(0)).cast("long")
            mostly = float(kw.get("mostly", 1.0))
            # mostly_success(): vacuous pass on empty/all-null, else
            # (nonnull - unexpected) / nonnull >= mostly
            success = ((el == 0) | (nn == 0)
                       | ((nn - ux).cast("double")
                          >= F.lit(mostly) * nn.cast("double")))
            return [pid, *lits, success.alias("success"),
                    el.alias("element_count"),
                    (el - nn).alias("missing_count"),
                    ux.alias("unexpected_count"),
                    null_d.alias("observed_value")]
        if spec.kind == "agg":
            if not _numeric_bounds():
                return None
            v = F.col(item.slots["value"]).cast("double")
            return [pid, *lits, _between(v).alias("success"),
                    null_l.alias("element_count"),
                    null_l.alias("missing_count"),
                    null_l.alias("unexpected_count"),
                    v.alias("observed_value")]
        if spec.kind == "agg_custom":
            handler = spec.extra["handler"]
            if handler == "row_count":
                v = F.coalesce(F.col(item.slots["value"]), F.lit(0))
                success = (v == int(kw["value"])
                           if spec.extra["mode"] == "equal"
                           else _between(v) if _numeric_bounds() else None)
                if success is None:
                    return None
                return [pid, *lits, success.alias("success"),
                        null_l.alias("element_count"),
                        null_l.alias("missing_count"),
                        null_l.alias("unexpected_count"),
                        v.cast("double").alias("observed_value")]
            if handler == "unique_proportion":
                if not _numeric_bounds():
                    return None
                nn = F.coalesce(F.col(item.slots["nonnull"]), F.lit(0))
                v = F.when(nn > 0, F.col(item.slots["distinct"])
                           .cast("double") / nn.cast("double"))
                return [pid, *lits, _between(v).alias("success"),
                        null_l.alias("element_count"),
                        null_l.alias("missing_count"),
                        null_l.alias("unexpected_count"),
                        v.alias("observed_value")]
            if handler == "quantiles" and "value" in item.slots:
                # fused percentile_approx array; exact-opt-in (approxQuantile
                # job) has no slot and stays on the driver fallback
                vals = F.col(item.slots["value"])
                ranges = kw["quantile_ranges"]["value_ranges"]
                conds = [F.lit(len(ranges) > 0)]
                for i, (lo, hi) in enumerate(ranges):
                    v = F.element_at(vals, i + 1)
                    c = v.isNotNull()
                    if lo is not None:
                        c = c & (v >= lo)
                    if hi is not None:
                        c = c & (v <= hi)
                    conds.append(c)
                from functools import reduce as _reduce
                success = F.when(
                    vals.isNull() | (F.size(vals) < len(ranges)),
                    F.lit(False)).otherwise(
                        _reduce(lambda a, b: a & b, conds))
                return [pid, *lits, success.alias("success"),
                        null_l.alias("element_count"),
                        null_l.alias("missing_count"),
                        null_l.alias("unexpected_count"),
                        null_d.alias("observed_value")]
            if handler == "distinct_set":
                # the rollup already stores each partition's sorted
                # collect_set; subset/superset/equal reduce to array_except
                # emptiness checks — pure Catalyst, no driver round-trip.
                # The per-partition observed SET itself doesn't fit the
                # sink's double observed_value (matches the collected
                # path, which also normalizes non-numeric observed to null).
                mode = spec.extra["mode"]
                vs = kw.get("value_set")
                obs = F.col(item.slots["value"])
                if vs is not None:
                    prim = (int, float, str, bool)
                    if not all(isinstance(v, prim)
                               and not (isinstance(v, float) and v != v)
                               for v in vs):
                        return None  # NaN / exotic types: driver semantics
                if vs is None:
                    # null set = universal set (vacuously true
                    # subset/superset; equal only to the empty set)
                    success = (F.lit(True) if mode != "equal"
                               else F.coalesce(F.size(obs), F.lit(0)) == 0)
                elif len(vs) == 0:
                    success = (F.lit(True) if mode == "superset"
                               else F.coalesce(F.size(obs), F.lit(0)) == 0)
                else:
                    lit_arr = F.array(*[F.lit(v) for v in dict.fromkeys(vs)])
                    subset = F.size(F.array_except(obs, lit_arr)) == 0
                    superset = F.size(F.array_except(lit_arr, obs)) == 0
                    raw = {"subset": subset, "superset": superset,
                           "equal": subset & superset}[mode]
                    # a partition with zero non-null rows stores an empty
                    # (or null) set: subset vacuously holds, the others
                    # need every expected value present
                    success = F.when(obs.isNull(),
                                     F.lit(mode == "subset")).otherwise(raw)
                return [pid, *lits, success.alias("success"),
                        null_l.alias("element_count"),
                        null_l.alias("missing_count"),
                        null_l.alias("unexpected_count"),
                        null_d.alias("observed_value")]
            return None
        return None

    def _sink_drift_frame(self, item: CompiledItem, pid_src: DataFrame):
        """Distributed per-partition drift verdicts: the score is a pure
        function of the partition's fused bin counts, computed by an
        Arrow-batched pandas UDF calling the SAME sketches.* scoring code as
        the driver path — no per-partition row ever reaches the driver.
        Categorical KL with the default tail_weight_holdout of 0 is scored
        here too (any out-of-set mass is inf however it splits, so one
        synthetic entry is exact). Returns None (driver fallback) for the
        genuinely driver-bound modes: auto-partition KL (builds the
        partition from the batch), bootstrapped KS (raw-sample job), and
        categorical KL with a positive holdout (out-of-set expected mass is
        split per distinct value — its own (value, partition) job)."""
        import pandas as pd
        spec, kw = item.spec, item.kwargs
        score_kind = spec.extra["score"]
        if item.info.get("auto") or kw.get("bootstrap"):
            return None
        values = (list(item.info["values"])
                  if score_kind == "kl" and "values" in item.info else None)
        if values is not None and float(kw.get("tail_weight_holdout", 0.0)) > 0:
            # a positive holdout is split per distinct out-of-set value
            # (tail_weight_holdout / n_unexpected), so per-partition
            # exactness would need its own (value, partition) job — keep
            # the narrow driver fallback for this opt-in. With the default
            # holdout of 0 the verdict is exact from the rollup alone: any
            # out-of-set mass scores inf however it is split.
            return None
        expected = list(item.info["expected_weights"])
        bins = list(item.info["bins"]) if item.info.get("bins") else None
        po = kw.get("partition_object") or {}
        tail_w = list(po["tail_weights"]) if po.get("tail_weights") else None
        th = float(kw.get("tail_weight_holdout", 0.0))
        ih = float(kw.get("internal_weight_holdout", 0.0))
        bin_cols = list(item.info["bin_aliases"])
        nb = len(bin_cols)
        _OUT_OF_SET = object()

        def score_batch(*series):
            def val(s, i):
                v = s.iloc[i]
                return 0.0 if v is None or pd.isna(v) else float(v)
            out = []
            for i in range(len(series[0])):
                counts = [val(series[j], i) for j in range(nb)]
                below, above, nonnull = (val(series[nb], i),
                                         val(series[nb + 1], i),
                                         val(series[nb + 2], i))
                if score_kind == "kl" and values is not None:
                    observed = {c: n for c, n in zip(values, counts)}
                    out_mass = nonnull - sum(counts)
                    if out_mass > 0.5:
                        # holdout == 0 (gated above): ANY out-of-set mass
                        # scores inf regardless of its split across values,
                        # so one synthetic entry holding the whole mass is
                        # exact (object() sentinel: never collides with a
                        # real category)
                        observed[_OUT_OF_SET] = out_mass
                    v, _ = sketches.kl_divergence_categorical(
                        observed, nonnull, values, expected, 0.0)
                elif score_kind == "kl":
                    v, _ = sketches.kl_divergence(
                        counts, expected, below, above, nonnull, th, ih,
                        bins=bins, expected_tail_weights=tail_w)
                elif score_kind == "ks":
                    v = sketches.ks_statistic(counts, expected)
                elif score_kind == "psi":
                    v = sketches.psi(counts, expected)
                elif score_kind == "chisq_p":
                    v, _ = sketches.chisquare_p_value(counts, expected)
                elif score_kind in ("ks_p", "ks_param_p"):
                    v = sketches.ks_p_value(
                        sketches.ks_statistic(counts, expected), sum(counts))
                else:
                    v = sketches.chisquare_statistic(counts, expected)
                out.append(v)
            return pd.Series(out, dtype="float64")

        udf = F.pandas_udf(score_batch, "double")
        in_cols = [F.col(c) for c in bin_cols]
        in_cols.append(F.col(item.slots["below"]).cast("double")
                       if "below" in item.slots else F.lit(0.0))
        in_cols.append(F.col(item.slots["above"]).cast("double")
                       if "above" in item.slots else F.lit(0.0))
        in_cols.append(F.col(item.slots["nonnull"]).cast("double"))
        scored = pid_src.withColumn("__score", udf(*in_cols))
        v = F.col("__score")
        finite = ~(F.isnan(v) | (v == float("inf")) | (v == float("-inf")))
        threshold = kw.get("threshold")
        if score_kind == "kl":
            success = (F.lit(True) if threshold is None
                       else F.coalesce(v <= float(threshold), F.lit(False)))
            observed = F.when(finite, v)   # displayable rule (_kl_evr)
        else:
            t = float(threshold)
            cmp = v > t if spec.extra.get("direction") == "greater" else v < t
            # Spark orders NaN above every double (NaN > t is TRUE); python's
            # nan > t is False — pin the python semantics
            success = F.coalesce(
                F.when(F.isnan(v), F.lit(False)).otherwise(cmp), F.lit(False))
            observed = v
        null_l = F.lit(None).cast("long")
        return scored.select(
            F.col("__pid").cast("string").alias("partition_id"),
            *self._sink_lits(item), success.alias("success"),
            null_l.alias("element_count"), null_l.alias("missing_count"),
            null_l.alias("unexpected_count"),
            observed.alias("observed_value")).select(*self._SINK_COLS)

    _SINK_SCHEMA = ("partition_id string, expectation_type string, "
                    "domain string, kind string, success boolean, "
                    "element_count long, missing_count long, "
                    "unexpected_count long, observed_value double, "
                    "config_kwargs string")
    _SINK_COLS = ["partition_id", "expectation_type", "domain", "kind",
                  "success", "element_count", "missing_count",
                  "unexpected_count", "observed_value", "config_kwargs"]

    def _fused_pass_to_sink(self, dp: DomainPlan, dfd: DataFrame,
                            didx: int) -> dict:
        """Per-partition fused pass for 100k+-partition tables: the wide
        rollup (partitions x slot-table width) is written to the sink as
        parquet DISTRIBUTED and per-partition verdict rows are derived from
        it with Catalyst expressions (map/agg/row_count/unique_proportion/
        quantile/distinct_set kinds) or an Arrow-batched pandas UDF (drift
        scores) — the driver reads back only the single global row (a pushed
        `__pid IS NULL` filter on the tiny parquet). The residual
        driver-bound items (exact-opt-in quantiles, auto-partition KL,
        bootstrapped KS, categorical KL with a positive tail_weight_holdout)
        collect a NARROW projection (that
        item's slot columns only), never the full slot table. Returns the
        global row."""
        import json as _json
        import os
        from functools import reduce
        spark = dfd.sparkSession
        sink = self.partition_verdict_sink
        rollup_path = os.path.join(sink, f"rollup-domain-{didx}.parquet")
        (dfd.withColumn("__pid", self._pid_expr())
            .rollup("__pid").agg(*dp.slot_table.agg_list)
            .write.mode("overwrite").parquet(rollup_path))
        stored = spark.read.parquet(rollup_path)
        g = stored.filter(F.col("__pid").isNull()).collect()
        grow = g[0].asDict() if g else {a: None for a in dp.slot_table.exprs}
        pid_src = stored.filter(F.col("__pid").isNotNull())
        frames, narrow = [], []
        for item in dp.fused_items:
            if item.spec.kind == "drift":
                fr = self._sink_drift_frame(item, pid_src)
                if fr is not None:
                    frames.append(fr)
                else:
                    narrow.append(item)
                continue
            sel = self._sink_verdict_select(item)
            if sel is not None:
                try:
                    # select() analyzes eagerly: a type that Catalyst can't
                    # coerce (e.g. string value_set against a numeric
                    # distinct_set slot) degrades to the narrow driver
                    # fallback instead of failing the whole union write
                    frames.append(
                        pid_src.select(*sel).select(*self._SINK_COLS))
                except Exception:  # noqa: BLE001 — analysis-time only
                    narrow.append(item)
            else:
                narrow.append(item)
        if frames:
            out = reduce(lambda a, b: a.unionByName(b), frames)
            out.write.mode("overwrite").parquet(
                os.path.join(sink, f"verdicts-domain-{didx}.parquet"))
        if narrow:
            rows_out = []
            for item in narrow:
                cols = sorted(set(item.slots.values())
                              | set(item.info.get("bin_aliases", [])))
                for r in pid_src.select("__pid", *cols).collect():
                    d = r.asDict()
                    try:
                        pevr = self._evr_from_row_quiet(item, d)
                    except Exception:  # noqa: BLE001 — mirror collected path
                        continue
                    if pevr is None:
                        continue
                    res = pevr.result or {}
                    ov = res.get("observed_value")
                    kw = item.kwargs
                    rows_out.append((
                        str(d["__pid"]), item.config.expectation_type,
                        kw.get("column") or ",".join(kw.get("column_list", []))
                        or kw.get("column_A", ""),
                        item.spec.kind, bool(pevr.success),
                        _opt_int(res.get("element_count")),
                        _opt_int(res.get("missing_count")),
                        _opt_int(res.get("unexpected_count")),
                        float(ov) if isinstance(ov, (int, float))
                        and not isinstance(ov, bool) else None,
                        _json.dumps(kw, sort_keys=True, default=str)))
            if rows_out:
                (spark.createDataFrame(rows_out, self._SINK_SCHEMA)
                 .write.mode("overwrite").parquet(os.path.join(
                     sink, f"verdicts-domain-{didx}-driver.parquet")))
        return grow

    def _collect_samples(self, dfd: DataFrame, unexpected_cond: Column,
                         item: CompiledItem) -> tuple[list, list | None]:
        """Violation samples, plus — when the result format names
        `unexpected_index_column_names` — a keyed index entry per sample.

        Spark has no stable row index, so the reference's pandas-only
        `unexpected_index_list` (positional indices, expectation.py:
        1541-1553) is re-expressed the way its newer result-format contract
        does: the caller names business-key column(s) (e.g. clip_id) and
        each entry is a dict of those key values + the domain column's
        unexpected value. Same limit/caps as the sample list."""
        if self.rf["result_format"] == "BOOLEAN_ONLY":
            return [], None
        kw = item.kwargs
        value = item.spec.sample_value(kw) if item.spec.sample_value else F.col(kw["column"])
        idx_cols = self.rf.get("unexpected_index_column_names") or None
        sel = [value.alias("v")]
        if idx_cols:
            sel += [F.col(c).alias(f"__idx_{i}") for i, c in enumerate(idx_cols)]
        rows = (
            dfd.filter(unexpected_cond)
            .select(*sel)
            .limit(self._sample_limit())
            .collect()
        )
        samples = [self._sample_py(r["v"], kw) for r in rows]
        if not idx_cols:
            return samples, None
        domain = kw.get("column")
        index_list = []
        for r, s in zip(rows, samples):
            entry = {c: r[f"__idx_{i}"] for i, c in enumerate(idx_cols)}
            if domain and domain not in entry:
                entry[domain] = s
            index_list.append(entry)
        return samples, index_list

    @staticmethod
    def _sample_py(v, kw: dict):
        """Struct samples -> python shapes matching the reference corpus:
        column pairs become [A, B] lists, multicolumn rows become dicts."""
        from pyspark.sql import Row
        if isinstance(v, Row):
            if "column_list" in kw:
                d = v.asDict()
                return {c: d.get(c) for c in kw["column_list"]}
            return list(v)
        return v

    def _map_evr(self, item: CompiledItem, element: int, nonnull: int, unexpected: int,
                 samples: list, index_list: list | None = None) -> ExpectationValidationResult:
        mostly = item.kwargs.get("mostly", 1.0)
        success = mostly_success(element, nonnull, unexpected, mostly)
        result = format_map_output(self.rf, success, element, nonnull, unexpected, samples,
                                   unexpected_index_list=index_list)
        return ExpectationValidationResult(success=success, expectation_config=item.config, result=result)

    def _between_evr(self, item: CompiledItem, value: Any) -> ExpectationValidationResult:
        kw = item.kwargs
        min_v, max_v = kw.get("min_value"), kw.get("max_value")
        if kw.get("parse_strings_as_datetimes"):
            # deprecated reference kwarg (expectation.py:1338-1360): string
            # bounds parsed with dateutil; the observed datetime is rendered
            # with output_strftime_format (or str) in the result
            from dateutil.parser import parse as _parse
            for name, b in (("min", min_v), ("max", max_v)):
                if b is not None:
                    try:
                        parsed = _parse(b)
                    except (TypeError, ValueError):
                        continue
                    if name == "min":
                        min_v = parsed
                    else:
                        max_v = parsed
        import datetime as _dt
        cmp_value = value
        if (isinstance(value, _dt.date)
                and not isinstance(value, _dt.datetime)
                and (isinstance(min_v, _dt.datetime)
                     or isinstance(max_v, _dt.datetime))):
            # DATE column vs dateutil-parsed bounds (always datetimes):
            # python refuses date-vs-datetime comparison, so compare the
            # day's midnight but keep the date for observed_value rendering
            cmp_value = _dt.datetime.combine(value, _dt.time.min)
        out = validate_metric_value_between(
            cmp_value, min_v, max_v,
            kw.get("strict_min", False), kw.get("strict_max", False))
        if cmp_value is not value:
            out["result"]["observed_value"] = value
        if kw.get("parse_strings_as_datetimes") and out["result"].get(
                "observed_value") is not None:
            import datetime as _dt
            ov = out["result"]["observed_value"]
            if isinstance(ov, (_dt.datetime, _dt.date)):
                fmt = kw.get("output_strftime_format")
                out["result"]["observed_value"] = (
                    ov.strftime(fmt) if fmt else str(ov))
        return ExpectationValidationResult(
            success=out["success"], expectation_config=item.config, result=out["result"])

    def _record_partition_verdict(self, pid: int, item: CompiledItem, success: bool,
                                  extra: dict) -> None:
        # pid is the physical partition id (int) or, with partition_col, the
        # partition's column value (any scalar type)
        self.partition_verdicts.append({
            "partition_id": int(pid) if isinstance(pid, (int, bool)) else pid,
            "expectation_type": item.config.expectation_type,
            "domain": item.kwargs.get("column")
            or ",".join(item.kwargs.get("column_list", []))
            or item.kwargs.get("column_A", ""),
            "success": bool(success),
            # full kwargs so consumers (checkpoint single-pass) can identify
            # the exact CONFIG — (type, domain) alone collides when a suite
            # checks the same column twice with different bounds
            "config_kwargs": dict(item.kwargs),
            "kind": item.spec.kind,
            **extra,
        })

    # ---------------------------------------------------------- fused evrs

    def _evr_from_row(self, item: CompiledItem, row: dict) -> ExpectationValidationResult:
        """Build the EVR for a fused item from one agg-result row. Used for the
        global row; per-partition rows go through _partition_verdict_from_row."""
        spec, kw = item.spec, item.kwargs
        if spec.kind == "map":
            element = int(row[item.slots["element"]] or 0)
            nonnull = int(row[item.slots["nonnull"]] or 0)
            unexpected = int(row[item.slots["unexpected"]] or 0)
            samples: list = []
            index_list = None
            if unexpected and self.rf["result_format"] != "BOOLEAN_ONLY":
                nn = self._nonnull_of(item)
                expected = spec.condition(kw)
                samples, index_list = self._collect_samples(
                    item.info["dfd"], nn & ~expected, item)
            return self._map_evr(item, element, nonnull, unexpected, samples, index_list)

        if spec.kind == "agg":
            return self._between_evr(item, row[item.slots["value"]])

        if spec.kind == "agg_custom":
            return self._agg_custom_evr(item, row)

        if spec.kind == "drift":
            return self._drift_evr(item, row)

        raise ValueError(f"unexpected fused kind {spec.kind}")

    def _nonnull_of(self, item: CompiledItem) -> Column:
        spec, kw = item.spec, item.kwargs
        if not spec.filter_nulls:
            return F.lit(True)
        if spec.nonnull is not None:
            return spec.nonnull(kw)
        return F.col(kw["column"]).isNotNull()

    def _agg_custom_evr(self, item: CompiledItem, row: dict) -> ExpectationValidationResult:
        kw, handler = item.kwargs, item.spec.extra["handler"]
        if handler == "row_count":
            count = int(row[item.slots["value"]] or 0)
            if item.spec.extra["mode"] == "equal":
                success = count == int(kw["value"])
                return ExpectationValidationResult(
                    success=success, expectation_config=item.config,
                    result={"observed_value": count})
            return self._between_evr(item, count)
        if handler == "quantiles":
            if item.info.get("use_approx_quantile"):
                values = item.info["dfd"].approxQuantile(
                    item.kwargs["column"], item.info["quantiles"], 0.0)
            else:
                values = row[item.slots["value"]]
                values = list(values) if values is not None else []
            ranges = kw["quantile_ranges"]["value_ranges"]
            successes = []
            for v, (lo, hi) in zip(values, ranges):
                ok = v is not None and (lo is None or v >= lo) and (hi is None or v <= hi)
                successes.append(bool(ok))
            return ExpectationValidationResult(
                success=all(successes) and len(values) == len(ranges),
                expectation_config=item.config,
                result={"observed_value": {
                    "quantiles": item.info["quantiles"], "values": values},
                    "details": {"success_details": successes}})
        if handler == "unique_proportion":
            distinct = int(row[item.slots["distinct"]] or 0)
            nonnull = int(row[item.slots["nonnull"]] or 0)
            proportion = (distinct / nonnull) if nonnull else None
            return self._between_evr(item, proportion)
        if handler == "distinct_set":
            observed = sorted(row[item.slots["value"]] or [])
            mode = item.spec.extra["mode"]
            oset = set(observed)
            if kw.get("value_set") is None:
                # null set = universal set (vacuously true subset/contains)
                success = True if mode != "equal" else len(oset) == 0
            else:
                value_set = set(kw["value_set"])
                success = {
                    "subset": oset <= value_set,
                    "superset": oset >= value_set,
                    "equal": oset == value_set,
                }[mode]
            return ExpectationValidationResult(
                success=bool(success), expectation_config=item.config,
                result={"observed_value": observed})
        raise ValueError(handler)

    def _raw_sample_pool(self, item: CompiledItem, nonnull: int, *,
                         cap: int, seed: int):
        """Bounded uniform sample of the column's raw non-null values for
        driver-side bootstrap scoring. Below the cap the pool is the whole
        column; above it, a seeded fraction sample (slightly over-drawn,
        then limited) — one extra narrow scan, pruned to the single column."""
        import numpy as np
        kw = item.kwargs
        col = F.col(kw["column"]).cast("double")
        nn = item.info["dfd"].filter(col.isNotNull()).select(col.alias("v"))
        if nonnull > cap:
            frac = min(1.0, cap * 1.2 / nonnull)
            nn = nn.sample(False, frac, seed)
        vals = np.array([r["v"] for r in nn.limit(cap).collect()], dtype=float)
        # sort: collect order varies with partitioning, and rng.choice draws
        # by position — sorting makes the bootstrap value deterministic for
        # a given multiset (exactly reproducible below the cap)
        return np.sort(vals)

    def _drift_counts(self, item: CompiledItem, row: dict) -> tuple[list[float], float, float, float]:
        counts = [float(row[a] or 0) for a in item.info["bin_aliases"]]
        below = float(row[item.slots["below"]] or 0) if "below" in item.slots else 0.0
        above = float(row[item.slots["above"]] or 0) if "above" in item.slots else 0.0
        nonnull = float(row[item.slots["nonnull"]] or 0)
        return counts, below, above, nonnull

    def _drift_evr(self, item: CompiledItem, row: dict) -> ExpectationValidationResult:
        kw = item.kwargs
        counts, below, above, nonnull = self._drift_counts(item, row)
        score_kind = item.spec.extra["score"]
        expected = item.info["expected_weights"]
        categorical = "values" in item.info
        if score_kind == "kl":
            return self._kl_evr(item, row, counts, below, above, nonnull, categorical)
        if score_kind == "ks":
            value, details = sketches.ks_statistic(counts, expected), {}
        elif score_kind == "psi":
            value, details = sketches.psi(counts, expected), {}
        elif score_kind == "chisq_p":
            value, details = sketches.chisquare_p_value(counts, expected)
        elif score_kind == "ks_p" and kw.get("bootstrap"):
            # reference-faithful mode (column_bootstrapped_ks_test_p_value
            # .py:44-96): bootstrap raw samples against the partition CDF.
            # The pool is a BOUNDED uniform sample of the column (cap
            # default 100k) so driver memory stays flat at any scale — the
            # bootstrap itself only draws samples*size values from it.
            po = kw["partition_object"]
            import math as _math
            if any(_math.isinf(b) for b in po["bins"]):
                raise ValueError("Partition endpoints must be finite.")
            if sum(po.get("tail_weights", []) or []) > 0:
                raise ValueError(
                    "Partition cannot have tail weights -- endpoints must "
                    "be finite.")
            pool = self._raw_sample_pool(
                item, int(nonnull), cap=int(kw.get("bootstrap_pool_cap", 100_000)),
                seed=int(kw.get("bootstrap_seed", 42)))
            value, details = sketches.bootstrap_ks_test(
                pool, po["bins"], po["weights"],
                p=float(kw.get("p", 0.05)),
                bootstrap_samples=int(kw.get("bootstrap_samples") or 1000),
                bootstrap_sample_size=kw.get("bootstrap_sample_size"),
                seed=int(kw.get("bootstrap_seed", 42)))
            details["ks_statistic_binned"] = sketches.ks_statistic(
                counts, expected)
        elif score_kind in ("ks_p", "ks_param_p"):
            ks = sketches.ks_statistic(counts, expected)
            n_eff = sum(counts)
            value = sketches.ks_p_value(ks, n_eff)
            details = {"ks_statistic": ks, "n_effective": n_eff,
                       # semantic divergence from the reference, by design:
                       # the reference (pandas-only) bootstraps RAW samples;
                       # ours scores the KS asymptotic p on the BINNED sketch
                       # (mergeable across partitions, bounded memory) — the
                       # p-values differ, especially at small n. Pass
                       # bootstrap=True for the reference-faithful raw-sample
                       # bootstrap (bounded pool).
                       "method": "asymptotic_ks_on_binned_sketch"}
        else:
            value, details = sketches.chisquare_statistic(counts, expected), {}
        threshold = float(kw["threshold"])
        if item.spec.extra.get("direction") == "greater":
            success = value is not None and value > threshold
        else:
            success = value is not None and value < threshold
        observed_partition = (
            sketches.build_categorical_partition(item.info["values"], counts)
            if categorical else sketches.build_partition_from_edges(item.info["bins"], counts))
        return ExpectationValidationResult(
            success=bool(success), expectation_config=item.config,
            result={"observed_value": value,
                    "details": {"observed_partition": observed_partition,
                                "expected_partition": kw["partition_object"], **details}})

    def _kl_evr(self, item: CompiledItem, row: dict, counts, below, above,
                nonnull, categorical: bool) -> ExpectationValidationResult:
        """expect_column_kl_divergence_to_be_less_than with the reference's
        exact semantics (expect_column_kl_divergence_to_be_less_than.py:
        315-630): scipy-entropy normalization, tail_weights / holdout rules,
        +/-inf endpoints, categorical outer-union fill, observed_value None
        on inf/nan, success = kl <= threshold (True when threshold is None).
        """
        kw = item.kwargs
        po = kw.get("partition_object")
        threshold = kw.get("threshold")
        th = float(kw.get("tail_weight_holdout", 0.0))
        ih = float(kw.get("internal_weight_holdout", 0.0))

        if item.info.get("auto"):
            return self._kl_auto_evr(item, nonnull, threshold, th, ih)

        if categorical:
            values = item.info["values"]
            observed = {v: float(c) for v, c in zip(values, counts)}
            seen_mass = sum(observed.values())
            value, details = None, None
            if nonnull - seen_mass > 0.5:
                # values outside the expected set exist: one groupBy job
                # resolves their counts (rare path; the fused pass already
                # covered the expected values). The driver only ever sees the
                # top `max_unexpected_values` rows — above that, the KL is
                # computed from three JVM-side scalars (distinct count, total,
                # sum c*ln c), exactly, with driver memory flat at any
                # out-of-set cardinality.
                cap = int(kw.get("max_unexpected_values", 1000))
                col = F.col(kw["column"])
                out = (item.info["dfd"].filter(col.isNotNull() & ~col.isin(values))
                       .groupBy(col).agg(F.count(F.lit(1)).alias("__n")))
                top = (out.orderBy(F.desc("__n"), col)
                       .limit(cap + 1).collect())
                if len(top) <= cap:
                    for r in top:
                        observed[r[kw["column"]]] = float(r["__n"])
                else:
                    cnt = F.col("__n").cast("double")
                    srow = out.agg(
                        F.count(F.lit(1)).alias("n_distinct"),
                        F.sum(cnt).alias("total"),
                        F.sum(cnt * F.log(cnt)).alias("clogc")).first()
                    value = sketches.kl_divergence_categorical_scalars(
                        observed, float(nonnull), values,
                        item.info["expected_weights"], th,
                        int(srow["n_distinct"]), float(srow["total"]),
                        float(srow["clogc"]))
                    shown = {r[kw["column"]]: float(r["__n"]) for r in top[:cap]}
                    details = {
                        "observed_partition": {
                            "values": values, "weights": [
                                observed.get(v, 0.0) / nonnull if nonnull else 0.0
                                for v in values]},
                        "expected_partition": {
                            "values": values,
                            "weights": item.info["expected_weights"]},
                        "unexpected_values_truncated": {
                            "distinct": int(srow["n_distinct"]),
                            "total_count": int(srow["total"]),
                            "top": {str(k): v for k, v in shown.items()},
                            "note": f"out-of-set values exceed "
                                    f"max_unexpected_values={cap}; KL computed "
                                    "exactly from distributed scalars"},
                    }
            if value is None:
                value, details = sketches.kl_divergence_categorical(
                    observed, float(nonnull), values,
                    item.info["expected_weights"], th)
        else:
            value, details = sketches.kl_divergence(
                counts, item.info["expected_weights"], below, above, nonnull,
                th, ih, bins=item.info.get("bins"),
                expected_tail_weights=po.get("tail_weights"))

        import math
        displayable = not (math.isinf(value) or math.isnan(value))
        observed_value = value if displayable else None
        success = True if threshold is None else bool(value <= float(threshold))
        if not categorical:
            bins = item.info.get("bins") or []
            shown_bins = [b for b in bins if not math.isinf(b)]
            details = {
                "observed_partition": {"bins": shown_bins,
                                       "weights": details["observed_weights"],
                                       "tail_weights": details["observed_tail_weights"]},
                "expected_partition": {"bins": shown_bins,
                                       "weights": details["expected_weights"],
                                       "tail_weights": details["expected_tail_weights"]},
            }
        return ExpectationValidationResult(
            success=success, expectation_config=item.config,
            result={"observed_value": observed_value, "details": details})


    def _kl_auto_evr(self, item: CompiledItem, nonnull, threshold, th, ih):
        """partition_object=None: build the partition FROM this batch
        (reference :338-356) — the observed distribution scored against a
        partition of itself (KL ~ 0; the result's value is the returned
        partition for later runs, matching the profiler role)."""
        import math
        kw = item.kwargs
        dfd = item.info["dfd"]
        col_name = kw["column"]
        col = F.col(col_name)
        if item.info["auto"] == "categorical":
            # BOUNDED (r3): the driver only ever sees the top `max_categories`
            # groups. Above the cap, KL is still exact — the auto path scores
            # the batch against a partition of itself, and KL(p||p) == 0
            # identically at any cardinality — so only the returned partition
            # is truncated (kept to the top-mass values, annotated). Mirrors
            # the bounded given-partition out-of-set path above and the
            # profiler's approx_distinct <= max_categories guard.
            cap = int(kw.get("max_categories", 1000))
            grouped = (dfd.filter(col.isNotNull()).groupBy(col)
                       .agg(F.count(F.lit(1)).alias("__n")))
            rows = grouped.orderBy(F.desc("__n"), col).limit(cap + 1).collect()
            if len(rows) > cap:
                srow = grouped.agg(
                    F.count(F.lit(1)).alias("n_distinct"),
                    F.sum(F.col("__n").cast("double")).alias("total")).first()
                rows = rows[:cap]
                observed = {r[col_name]: float(r["__n"]) for r in rows}
                values = sorted(observed, key=lambda v: (v is None, str(v)))
                weights = ([observed[v] / nonnull for v in values]
                           if nonnull else [])
                value = 0.0
                details = {
                    "observed_partition": {"values": values, "weights": weights},
                    "expected_partition": {"values": values, "weights": weights},
                    "partition_truncated": {
                        "distinct": int(srow["n_distinct"]),
                        "total_count": int(srow["total"]),
                        "max_categories": cap,
                        "note": "auto partition bounded to the top max_categories "
                                "values by count; KL(p||p) = 0 exactly at any "
                                "cardinality, so observed_value is unaffected"},
                }
            else:
                observed = {r[col_name]: float(r["__n"]) for r in rows}
                values = sorted(observed, key=lambda v: (v is None, str(v)))
                weights = ([observed[v] / nonnull for v in values]
                           if nonnull else [])
                value, details = sketches.kl_divergence_categorical(
                    observed, float(nonnull), values, weights, th)
        else:
            qs = [i / 10 for i in range(11)]
            edges = dfd.approxQuantile(col_name, qs, 0.0) if nonnull else []
            bins = sorted(set(e for e in edges if e is not None))
            if len(bins) < 2:
                return ExpectationValidationResult(
                    success=True, expectation_config=item.config,
                    result={"observed_value": None,
                            "details": {"note": "not enough data to partition"}})
            exprs = []
            for i in range(len(bins) - 1):
                lo, hi = bins[i], bins[i + 1]
                cond = (col >= lo) & ((col <= hi) if i == len(bins) - 2 else (col < hi))
                exprs.append(F.coalesce(
                    F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).alias(f"h{i}"))
            hrow = dfd.agg(*exprs).first().asDict()
            counts = [float(hrow[f"h{i}"]) for i in range(len(bins) - 1)]
            weights = [c / nonnull for c in counts] if nonnull else []
            value, details = sketches.kl_divergence(
                counts, weights, 0.0, 0.0, nonnull, th, ih, bins=bins,
                expected_tail_weights=None)
            details = {
                "observed_partition": {"bins": bins, "weights": details["observed_weights"],
                                       "tail_weights": details["observed_tail_weights"]},
                "expected_partition": {"bins": bins, "weights": details["expected_weights"],
                                       "tail_weights": details["expected_tail_weights"]},
            }
        displayable = not (math.isinf(value) or math.isnan(value))
        success = True if threshold is None else bool(value <= float(threshold))
        return ExpectationValidationResult(
            success=success, expectation_config=item.config,
            result={"observed_value": value if displayable else None,
                    "details": details if isinstance(details, dict) else {}})


    # ----------------------------------------------------------- job items

    def _run_job_item(self, item: CompiledItem, dfd: DataFrame, grow: dict,
                      pid_rows: list[dict] | None = None,
                      didx: int = 0,
                      jidx: int = 0) -> ExpectationValidationResult:
        handler_kind = item.spec.kind
        if handler_kind == "map_window":
            return self._run_window_item(item, dfd, grow,
                                         pid_rows=pid_rows, didx=didx,
                                         jidx=jidx)
        if handler_kind == "map_unique":
            return self._run_unique_item(item, dfd, grow,
                                         pid_rows=pid_rows, didx=didx,
                                         jidx=jidx)
        if handler_kind == "value":
            if item.spec.extra.get("handler") == "cramers_phi":
                return self._run_cramers_phi(item, dfd, grow)
            return self._run_most_common(item, dfd, grow)
        if handler_kind == "referential":
            return self._run_referential(item, dfd, grow)
        if handler_kind == "audio":
            from .metrics import audio as audio_metrics
            if item.spec.extra.get("handler") == "header":
                return audio_metrics.run_header_item(self, item, dfd, grow)
            if item.spec.extra.get("handler") == "payload":
                return audio_metrics.run_payload_item(self, item, dfd, grow)
            return audio_metrics.run_snr_item(self, item, dfd, grow)
        raise ValueError(handler_kind)

    def _run_window_item(self, item: CompiledItem, dfd: DataFrame, grow: dict,
                         pid_rows: list[dict] | None = None,
                         didx: int = 0,
                         jidx: int = 0) -> ExpectationValidationResult:
        # Reference runs window conditions as their own job too
        # (map_metric_provider.py:2344-2369). A global-ordered window cannot
        # be fused; per-partition verdicts (r5) attribute each
        # order-violating ROW to its own input partition — a boundary
        # violation (first value below the previous partition's last) counts
        # against the partition holding the offending row. The pid is tagged
        # BEFORE the window shuffle so it reflects input lineage, same as
        # the fused rollup's.
        kw = item.kwargs
        per_part = self.per_partition
        if per_part:
            dfd = dfd.withColumn("__pid", self._pid_expr())
        # reference null-filters the domain BEFORE the window (so `prev` is
        # the previous NON-null value — interspersed nulls don't mask
        # regressions): sparkdf_execution_engine.py:592-629
        dfd = dfd.filter(F.col(kw["column"]).isNotNull())
        nn = F.lit(True)
        expected = item.spec.condition(kw)
        sel = [F.col(kw["column"]),
               (nn & ~expected).alias("__unexpected"), nn.alias("__nn")]
        if per_part:
            sel.append(F.col("__pid"))
        flagged = dfd.select(*sel)
        ux_agg = F.coalesce(
            F.sum(F.when(F.col("__unexpected"), 1).otherwise(0)),
            F.lit(0)).alias("u")
        element = int(grow[item.slots["element"]] or 0)
        nonnull = int(grow[item.slots["nonnull"]] or 0)
        mostly = float(kw.get("mostly", 1.0))
        if per_part and self.partition_verdict_sink is not None:
            # one pass: rollup by pid written distributed, global row read
            # back via a pushed __pid IS NULL filter; per-partition verdicts
            # derived executor-side against the stored domain rollup's
            # element/nonnull (exactly the unique-item sink shape)
            import os
            spark = flagged.sparkSession
            wpath = os.path.join(self.partition_verdict_sink,
                                 f"wrollup-domain-{didx}-w{jidx}.parquet")
            (flagged.rollup("__pid").agg(ux_agg)
             .write.mode("overwrite").parquet(wpath))
            stored = spark.read.parquet(wpath)
            g = stored.filter(F.col("__pid").isNull()).collect()
            unexpected = int(g[0]["u"]) if g else 0
            rollup = (spark.read.parquet(os.path.join(
                self.partition_verdict_sink,
                f"rollup-domain-{didx}.parquet"))
                .filter(F.col("__pid").isNotNull())
                .select("__pid", item.slots["element"],
                        item.slots["nonnull"]))
            joined = rollup.join(
                stored.filter(F.col("__pid").isNotNull()), "__pid", "left")
            el = F.coalesce(F.col(item.slots["element"]), F.lit(0)).cast("long")
            nn_c = F.coalesce(F.col(item.slots["nonnull"]), F.lit(0)).cast("long")
            ux = F.coalesce(F.col("u"), F.lit(0)).cast("long")
            success = ((el == 0) | (nn_c == 0)
                       | ((nn_c - ux).cast("double")
                          >= F.lit(mostly) * nn_c.cast("double")))
            (joined.select(
                F.col("__pid").cast("string").alias("partition_id"),
                *self._sink_lits(item), success.alias("success"),
                el.alias("element_count"), (el - nn_c).alias("missing_count"),
                ux.alias("unexpected_count"),
                F.lit(None).cast("double").alias("observed_value"))
             .select(*self._SINK_COLS)
             .write.mode("overwrite").parquet(os.path.join(
                 self.partition_verdict_sink,
                 f"verdicts-domain-{didx}-w{jidx}.parquet")))
        elif per_part:
            rows = flagged.rollup("__pid").agg(ux_agg).collect()
            by_pid = {r["__pid"]: int(r["u"] or 0)
                      for r in rows if r["__pid"] is not None}
            g = [r for r in rows if r["__pid"] is None]
            unexpected = int(g[0]["u"]) if g else 0
            for prow in pid_rows or []:
                el = int(prow[item.slots["element"]] or 0)
                nn_p = int(prow[item.slots["nonnull"]] or 0)
                ux = by_pid.get(prow["__pid"], 0)
                self._record_partition_verdict(
                    prow["__pid"], item,
                    mostly_success(el, nn_p, ux, mostly),
                    {"unexpected_count": ux, "element_count": el,
                     "missing_count": el - nn_p, "observed_value": None})
        else:
            unexpected = int(flagged.agg(ux_agg).first()["u"])
        samples: list = []
        if unexpected and self.rf["result_format"] != "BOOLEAN_ONLY":
            samples = [
                r[kw["column"]]
                for r in flagged.filter("__unexpected").select(kw["column"])
                .limit(self._sample_limit()).collect()
            ]
        return self._map_evr(item, element, nonnull, unexpected, samples)

    def _run_unique_item(self, item: CompiledItem, dfd: DataFrame, grow: dict,
                         pid_rows: list[dict] | None = None,
                         didx: int = 0,
                         jidx: int = 0) -> ExpectationValidationResult:
        """Uniqueness via groupBy dup-groups — marks every row of a duplicated
        value unexpected, exactly like the reference's window form
        (column_values_unique.py:83-87), but with a key-partitioned shuffle
        instead of a whole-table window.

        HLL++ prescreen (north_star): the fused pass already computed
        approx_count_distinct. With unique_strategy='approx' the verdict uses
        the sketch alone (no second job — for exploratory scans); 'exact'
        (default) always resolves exact dup counts.

        per_partition (r5): the exact path also emits one verdict row per
        partition counting that partition's rows that participate in a
        GLOBAL duplicate group (the counts sum to the global
        unexpected_count). Derived from a (key, partition) pre-aggregation,
        so the extra cost is one shuffle of distinct-key-sized data; in sink
        mode the rows are joined to the stored rollup and written by
        executors — nothing per-partition reaches the driver. The
        approx/clean-prescreen strategies skip per-partition verdicts: an
        HLL sketch cannot attribute cross-partition duplicates.
        """
        kw = item.kwargs
        compound = item.spec.extra.get("compound", False)
        cols = kw["column_list"] if compound else [kw["column"]]
        element = int(grow[item.slots["element"]] or 0)
        nonnull = int(grow[item.slots["nonnull"]] or 0)
        approx = int(grow[item.slots["approx_distinct"]] or 0)

        rsd = float(kw.get("rsd", 0.05))
        if self.unique_strategy in ("approx", "auto"):
            # HLL++ prescreen (north_star): the fused pass already paid for
            # approx_count_distinct. est_dups beyond the 3*rsd noise band is
            # REAL duplication; inside the band the sketch cannot distinguish
            # dups from estimation error.
            est_dups = max(0, nonnull - approx)
            tolerated = 3.0 * rsd * max(nonnull, 1)
            suspect = est_dups > tolerated
            if self.unique_strategy == "auto" and suspect:
                pass  # fall through to the exact groupBy job below
            else:
                if self.unique_strategy == "auto":
                    # clean prescreen: no detectable duplicates at the
                    # sketch's resolution — skip the exact job entirely
                    success, reported = True, 0
                else:  # pure 'approx' verdict
                    success = (not suspect) or mostly_success(
                        element, nonnull, est_dups, kw.get("mostly", 1.0))
                    reported = est_dups if suspect else 0
                result = format_map_output(
                    self.rf, bool(success), element, nonnull, reported, [])
                result["details"] = {
                    "strategy": ("hll_prescreen_clean"
                                 if self.unique_strategy == "auto" else "hll_approx"),
                    "approx_distinct": approx, "rsd": rsd,
                    "dup_rows_upper_bound": int(tolerated)}
                return ExpectationValidationResult(
                    success=bool(success), expectation_config=item.config, result=result)

        # reference default is all_values_are_missing
        # (expect_compound_columns_to_be_unique.py:35): partially-null keys
        # DO participate in dup grouping (nulls group together). Must match
        # the fused nonnull slot's filter (planner.py) or the mostly
        # denominator and the dup scan would disagree on partially-null rows.
        nn = C.multicolumn_domain_filter(
            {"column_list": cols,
             "ignore_row_if": kw.get("ignore_row_if", "all_values_are_missing")}) \
            if compound else F.col(cols[0]).isNotNull()
        g1 = None
        if self.per_partition:
            # (key, partition) pre-agg: the global dup groups AND each
            # partition's share of them derive from this one distinct-key-
            # sized intermediate (map-side partial agg does the heavy lift)
            g1 = (dfd.filter(nn).withColumn("__pid", self._pid_expr())
                  .groupBy(*cols, "__pid")
                  .agg(F.count(F.lit(1)).alias("__c")))
            vc = g1.groupBy(*cols).agg(F.sum("__c").alias("__cnt"))
        else:
            vc = dfd.filter(nn).groupBy(*cols).agg(
                F.count(F.lit(1)).alias("__cnt"))
        dup = vc.filter(F.col("__cnt") > 1)
        stats = dup.agg(
            F.coalesce(F.sum("__cnt"), F.lit(0)).alias("dup_rows"),
            F.count(F.lit(1)).alias("dup_groups")).first()
        unexpected = int(stats["dup_rows"])
        samples: list = []
        if unexpected and self.rf["result_format"] != "BOOLEAN_ONLY":
            k = self._sample_limit()
            top = dup.orderBy(F.desc("__cnt"), *cols).limit(k).collect()
            for r in top:
                val = r[cols[0]] if not compound else {c: r[c] for c in cols}
                samples.extend([val] * min(int(r["__cnt"]), k - len(samples)))
                if len(samples) >= k:
                    break
        evr = self._map_evr(item, element, nonnull, unexpected, samples)
        if evr.result:
            evr.result["details"] = {
                "strategy": ("exact_after_suspect_prescreen"
                             if self.unique_strategy == "auto" else "exact_groupby"),
                "approx_distinct": approx,
                "duplicate_groups": int(stats["dup_groups"])}
        if g1 is not None:
            self._emit_unique_partition_verdicts(item, g1, dup, cols,
                                                 pid_rows, didx, jidx)
        return evr

    def _emit_unique_partition_verdicts(self, item: CompiledItem, g1, dup,
                                        cols: list[str],
                                        pid_rows: list[dict] | None,
                                        didx: int, jidx: int) -> None:
        """Per-partition rows participating in a GLOBAL duplicate group:
        g1 = (key, partition, count), dup = the duplicated keys. Null-safe
        key equality — partially-null compound keys DO group (and therefore
        duplicate) in the reference semantics."""
        import os
        from functools import reduce
        g = g1.alias("g")
        d = dup.select(*cols).alias("d")
        cond = reduce(lambda a, b: a & b,
                      [F.col(f"g.{c}").eqNullSafe(F.col(f"d.{c}"))
                       for c in cols])
        pid_dup = (g.join(d, cond, "left_semi")
                   .groupBy("__pid").agg(F.sum("__c").alias("__dup")))
        mostly = float(item.kwargs.get("mostly", 1.0))
        if self.partition_verdict_sink is not None:
            # join executor-side to the stored rollup's per-partition
            # element/nonnull and write verdict rows distributed
            spark = g1.sparkSession
            rollup = (spark.read.parquet(os.path.join(
                self.partition_verdict_sink,
                f"rollup-domain-{didx}.parquet"))
                .filter(F.col("__pid").isNotNull())
                .select("__pid", item.slots["element"],
                        item.slots["nonnull"]))
            joined = rollup.join(pid_dup, "__pid", "left")
            el = F.coalesce(F.col(item.slots["element"]), F.lit(0)).cast("long")
            nn = F.coalesce(F.col(item.slots["nonnull"]), F.lit(0)).cast("long")
            ux = F.coalesce(F.col("__dup"), F.lit(0)).cast("long")
            success = ((el == 0) | (nn == 0)
                       | ((nn - ux).cast("double")
                          >= F.lit(mostly) * nn.cast("double")))
            null_l = F.lit(None).cast("long")
            (joined.select(
                F.col("__pid").cast("string").alias("partition_id"),
                *self._sink_lits(item), success.alias("success"),
                el.alias("element_count"), (el - nn).alias("missing_count"),
                ux.alias("unexpected_count"),
                F.lit(None).cast("double").alias("observed_value"))
             .select(*self._SINK_COLS)
             .write.mode("overwrite").parquet(os.path.join(
                 self.partition_verdict_sink,
                 f"verdicts-domain-{didx}-u{jidx}.parquet")))
            return
        dups_by_pid = {r["__pid"]: int(r["__dup"] or 0)
                       for r in pid_dup.collect()}  # bounded by #partitions
        for prow in pid_rows or []:
            el = int(prow[item.slots["element"]] or 0)
            nn = int(prow[item.slots["nonnull"]] or 0)
            ux = dups_by_pid.get(prow["__pid"], 0)
            self._record_partition_verdict(
                prow["__pid"], item,
                mostly_success(el, nn, ux, item.kwargs.get("mostly", 1.0)),
                {"unexpected_count": ux, "element_count": el,
                 "missing_count": el - nn, "observed_value": None})

    def _run_most_common(self, item: CompiledItem, dfd: DataFrame, grow: dict) -> ExpectationValidationResult:
        """Most-common value(s) with the tie collect BOUNDED (`max_ties`,
        default 100): on a degenerate column where every value occurs once,
        ALL distinct values tie at the max, so an uncapped collect pulls the
        whole column to the driver. Above the cap the success flag is still
        exact — tie count and set membership resolve as two JVM-side scalar
        jobs — only the reported list is truncated (annotated in details).
        Reference (pandas value_counts, expect_column_most_common_value_
        to_be_in_set) keeps all ties; identical below the cap."""
        kw = item.kwargs
        col = kw["column"]
        cap = int(kw.get("max_ties", 100))
        value_set = set(kw["value_set"])
        vc = dfd.filter(F.col(col).isNotNull()).groupBy(col).agg(
            F.count(F.lit(1)).alias("__cnt"))
        vc = vc.persist()
        truncated = False
        details = None
        try:
            mx_row = vc.agg(F.max("__cnt").alias("m")).first()
            mx = mx_row["m"]
            if mx is None:
                observed: list = []
                success = False  # empty column: nothing can be most common
            else:
                ties = vc.filter(F.col("__cnt") == mx)
                top = ties.select(col).orderBy(col).limit(cap + 1).collect()
                truncated = len(top) > cap
                observed = sorted(r[col] for r in top[:cap])
                if truncated:
                    n_ties = ties.count()
                    in_set = bool(value_set) and ties.filter(
                        F.col(col).isin(list(value_set))).limit(1).count() > 0
                    if kw.get("ties_okay"):
                        success = in_set
                    else:
                        success = False  # n_ties > cap >= 1, never exactly one
                    details = {"ties_truncated": {
                        "n_ties": int(n_ties), "max_ties": cap,
                        "note": "observed_value lists the first max_ties tied "
                                "values; success computed exactly from "
                                "distributed tie count / set membership"}}
                elif kw.get("ties_okay"):
                    success = len(set(observed) & value_set) > 0
                else:
                    success = len(observed) == 1 and observed[0] in value_set
        finally:
            vc.unpersist()
        result = {"observed_value": observed}
        if details:
            result["details"] = details
        return ExpectationValidationResult(
            success=bool(success), expectation_config=item.config,
            result=result)

    def _run_cramers_phi(self, item: CompiledItem, dfd: DataFrame, grow: dict) -> ExpectationValidationResult:
        """Cramér's phi (V) of a column pair: distributed groupBy(A,B)
        contingency counts, chi2 + phi scored driver-side. The reference is
        pandas-only (crosstab + scipy chi2_contingency); no continuity
        correction here. Guarded by max_cells against high-cardinality pairs."""
        import math
        kw = item.kwargs
        ca, cb = kw["column_A"], kw["column_B"]
        max_cells = int(kw.get("max_cells", 10_000))
        cells = (dfd.filter(F.col(ca).isNotNull() & F.col(cb).isNotNull())
                 .groupBy(ca, cb).agg(F.count(F.lit(1)).alias("__n"))
                 .limit(max_cells + 1).collect())
        if len(cells) > max_cells:
            raise ValueError(
                f"cramers_phi contingency exceeds max_cells={max_cells}; "
                "bucketize the columns first")
        n = sum(r["__n"] for r in cells)
        row_tot: dict = {}
        col_tot: dict = {}
        for r in cells:
            row_tot[r[ca]] = row_tot.get(r[ca], 0) + r["__n"]
            col_tot[r[cb]] = col_tot.get(r[cb], 0) + r["__n"]
        chi2 = 0.0
        if n > 0:
            obs = {(r[ca], r[cb]): r["__n"] for r in cells}
            for a, ra in row_tot.items():
                for b, cb_tot in col_tot.items():
                    e = ra * cb_tot / n
                    o = obs.get((a, b), 0)
                    if e > 0:
                        chi2 += (o - e) ** 2 / e
        k = min(len(row_tot), len(col_tot))
        phi = math.sqrt(chi2 / (n * (k - 1))) if n > 0 and k > 1 else 0.0
        threshold = float(kw["threshold"])
        success = phi < threshold
        return ExpectationValidationResult(
            success=bool(success), expectation_config=item.config,
            result={"observed_value": phi,
                    "details": {"chi2": chi2, "n": n,
                                "n_rows": len(row_tot), "n_cols": len(col_tot)}})

    def _run_referential(self, item: CompiledItem, dfd: DataFrame, grow: dict) -> ExpectationValidationResult:
        kw, handler = item.kwargs, item.spec.extra["handler"]
        if handler == "row_count_other_table":
            self_count = int(grow[item.slots["value"]] or 0)
            other = self.tables[kw["other_table_name"]]
            other_count = other.count()
            return ExpectationValidationResult(
                success=self_count == other_count, expectation_config=item.config,
                result={"observed_value": self_count,
                        "details": {"other_table_row_count": other_count}})
        # FK check: every value of `column` exists in other_table.other_column.
        # left_anti join — Catalyst/AQE picks broadcast when the (distinct)
        # reference side is small; reference GE does this via stored
        # evaluation-parameter URNs instead (core/evaluation_parameters.py).
        col = kw["column"]
        other = self.tables[kw["other_table"]]
        ref = other.select(F.col(kw.get("other_column", col)).alias(col)).distinct()
        orphans = dfd.filter(F.col(col).isNotNull()).join(ref, on=col, how="left_anti")
        unexpected = orphans.count()
        element = int(grow[item.slots["element"]] or 0)
        nonnull = int(grow[item.slots["nonnull"]] or 0)
        samples: list = []
        if unexpected and self.rf["result_format"] != "BOOLEAN_ONLY":
            samples = [r[col] for r in orphans.select(col).limit(self._sample_limit()).collect()]
        return self._map_evr(item, element, nonnull, int(unexpected), samples)

    # ------------------------------------------------------ dependent pass

    def _run_dependent_items(self, items: list[CompiledItem], dfd: DataFrame,
                             grow: dict, pid_rows: list[dict],
                             didx: int = 0) -> list[tuple[CompiledItem, ExpectationValidationResult]]:
        """Z-score conditions: second fused pass using pass-1 mean/stddev."""
        exprs = []
        conds: dict[str, Column] = {}
        for i, item in enumerate(items):
            kw = item.kwargs
            mean = grow[item.slots["mean"]]
            std = grow[item.slots["stddev"]]
            expected = C.z_score_under_threshold(kw, mean, std)
            nn = F.col(kw["column"]).isNotNull()
            cond = nn & ~expected
            conds[f"z{i}"] = cond
            exprs.append(F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).alias(f"z{i}"))
        if self.per_partition and self.partition_verdict_sink is not None:
            # sink mode (r4 #6): rollup written distributed; only the global
            # row is read back; per-partition z verdicts derived in Spark
            import os
            from functools import reduce
            spark = dfd.sparkSession
            zpath = os.path.join(self.partition_verdict_sink,
                                 f"zrollup-domain-{didx}.parquet")
            (dfd.withColumn("__pid", self._pid_expr())
                .rollup("__pid").agg(*exprs)
                .write.mode("overwrite").parquet(zpath))
            stored = spark.read.parquet(zpath)
            zg = stored.filter(F.col("__pid").isNull()).collect()
            zrow = zg[0].asDict() if zg else {f"z{i}": 0 for i in range(len(items))}
            pid_src = stored.filter(F.col("__pid").isNotNull())
            null_l = F.lit(None).cast("long")
            parts = [pid_src.select(
                F.col("__pid").cast("string").alias("partition_id"),
                *self._sink_lits(item),
                F.lit(True).alias("success"),
                null_l.alias("element_count"),
                null_l.alias("missing_count"),
                F.coalesce(F.col(f"z{i}"), F.lit(0)).cast("long")
                .alias("unexpected_count"),
                F.lit(None).cast("double").alias("observed_value"))
                .select(*self._SINK_COLS)
                for i, item in enumerate(items)]
            if parts:
                reduce(lambda a, b: a.unionByName(b), parts).write.mode(
                    "overwrite").parquet(os.path.join(
                        self.partition_verdict_sink,
                        f"verdicts-domain-{didx}-z.parquet"))
        elif self.per_partition:
            rows = dfd.withColumn("__pid", self._pid_expr()).rollup("__pid").agg(*exprs).collect()
            global_rows = [r for r in rows if r["__pid"] is None]
            zrow = global_rows[0].asDict() if global_rows else {f"z{i}": 0 for i in range(len(items))}
            for r in rows:
                if r["__pid"] is None:
                    continue
                for i, item in enumerate(items):
                    self._record_partition_verdict(
                        r["__pid"], item, True, {"unexpected_count": int(r[f"z{i}"] or 0)})
        else:
            zrow = dfd.agg(*exprs).first().asDict() if exprs else {}
        out = []
        for i, item in enumerate(items):
            element = int(grow[item.slots["element"]] or 0)
            nonnull = int(grow[item.slots["nonnull"]] or 0)
            unexpected = int(zrow.get(f"z{i}", 0) or 0)
            samples: list = []
            index_list = None
            if unexpected and self.rf["result_format"] != "BOOLEAN_ONLY":
                samples, index_list = self._collect_samples(dfd, conds[f"z{i}"], item)
            evr = self._map_evr(item, element, nonnull, unexpected, samples, index_list)
            out.append((item, evr))
        return out

    # -------------------------------------------------------------- schema

    def _run_schema_item(self, item: CompiledItem) -> ExpectationValidationResult:
        import pyspark.sql.types as sparktypes

        kw, handler = item.kwargs, item.spec.extra["handler"]
        schema = self.df.schema
        columns = [f.name for f in schema.fields]
        if handler == "column_exists":
            ok = kw["column"] in columns
            if ok and kw.get("column_index") is not None:
                ok = columns.index(kw["column"]) == int(kw["column_index"])
            return ExpectationValidationResult(
                success=bool(ok), expectation_config=item.config, result={})
        if handler == "columns_ordered":
            if kw.get("column_list") is None:  # vacuously true (corpus)
                return ExpectationValidationResult(
                    success=True, expectation_config=item.config,
                    result={"observed_value": columns})
            expected = list(kw["column_list"])
            return ExpectationValidationResult(
                success=columns == expected, expectation_config=item.config,
                result={"observed_value": columns})
        if handler == "columns_set":
            expected = set(kw.get("column_set") or [])
            observed = set(columns)
            exact = kw.get("exact_match", True)
            if kw.get("exact_match") is None:
                exact = True
            success = observed == expected if exact else expected <= observed
            return ExpectationValidationResult(
                success=bool(success), expectation_config=item.config,
                result={"observed_value": sorted(columns),
                        "details": {"unexpected": sorted(observed - expected),
                                    "missing": sorted(expected - observed)}})
        if handler == "column_count":
            n = len(columns)
            if item.spec.extra["mode"] == "equal":
                return ExpectationValidationResult(
                    success=n == int(kw["value"]), expectation_config=item.config,
                    result={"observed_value": n})
            return self._between_evr(item, n)
        if handler in ("of_type", "in_type_list"):
            # reference short-circuits to a schema check on Spark
            # (expect_column_values_to_be_of_type.py:381-401)
            actual = schema[kw["column"]].dataType
            names = [kw["expected_type"]] if handler == "of_type" else list(kw["type_list"])
            classes = tuple(
                getattr(sparktypes, n) for n in names if hasattr(sparktypes, n))
            success = isinstance(actual, classes) if classes else False
            return ExpectationValidationResult(
                success=bool(success), expectation_config=item.config,
                result={"observed_value": type(actual).__name__})
        raise ValueError(handler)

    # ------------------------------------------------------------ main run


    # ----------------------------------------------------- config validation

    _BOUNDED_TYPES = {
        "expect_column_values_to_be_between",
        "expect_column_value_lengths_to_be_between",
        "expect_column_mean_to_be_between", "expect_column_min_to_be_between",
        "expect_column_max_to_be_between", "expect_column_sum_to_be_between",
        "expect_column_stdev_to_be_between", "expect_column_median_to_be_between",
        "expect_table_row_count_to_be_between",
        "expect_table_column_count_to_be_between",
    }
    _NUMERIC_COLUMN_TYPES = {
        "expect_column_mean_to_be_between", "expect_column_sum_to_be_between",
        "expect_column_stdev_to_be_between", "expect_column_median_to_be_between",
        "expect_column_quantile_values_to_be_between",
        "expect_column_value_z_scores_to_be_less_than",
    }
    _NUMERIC_BOUND_TYPES = {
        "expect_column_mean_to_be_between", "expect_column_sum_to_be_between",
        "expect_column_stdev_to_be_between", "expect_column_median_to_be_between",
        "expect_table_row_count_to_be_between",
        "expect_table_column_count_to_be_between",
        "expect_column_value_lengths_to_be_between",
    }
    _STRING_COLUMN_TYPES = {
        "expect_column_value_lengths_to_be_between": "object of type 'int' has no len() — value-length expectations require a string column",
        "expect_column_value_lengths_to_equal": "object of type 'int' has no len() — value-length expectations require a string column",
        "expect_column_values_to_match_strftime_format": "Values passed to expect_column_values_to_match_strftime_format must be of type string",
    }

    def _validate_config(self, config: ExpectationConfiguration) -> None:
        """Kwarg/type validation mirroring the reference's config checks
        (golden corpus error cases: missing bounds, min>max, non-numeric
        bounds/columns, wrong input dtypes)."""
        import pyspark.sql.types as T
        etype = config.expectation_type
        spec = get_spec(etype)
        kw = {**spec.defaults, **config.kwargs}
        num = (int, float)

        if etype in self._BOUNDED_TYPES:
            mn, mx = kw.get("min_value"), kw.get("max_value")
            # only the map-level expectations error on missing bounds; the
            # aggregate/table betweens are vacuously true (golden corpus)
            # the reference is inconsistent here and the golden corpus
            # encodes it: min/sum error on missing bounds, mean/median/
            # stdev/max/table-counts are vacuously true
            if mn is None and mx is None and etype in (
                    "expect_column_values_to_be_between",
                    "expect_column_value_lengths_to_be_between",
                    "expect_column_min_to_be_between",
                    "expect_column_sum_to_be_between"):
                raise ValueError("min_value and max_value cannot both be None")
            # value-length betweens allow max < min (all rows unexpected)
            if etype != "expect_column_value_lengths_to_be_between" and (
                    isinstance(mn, num) and not isinstance(mn, bool)
                    and isinstance(mx, num) and not isinstance(mx, bool) and mn > mx):
                raise ValueError("min_value cannot be greater than max_value")
            if etype in self._NUMERIC_BOUND_TYPES:
                for b in (mn, mx):
                    if b is not None and (isinstance(b, bool) or not isinstance(b, num)):
                        raise ValueError("min_value and max_value must be numbers")
            if etype == "expect_column_value_lengths_to_be_between":
                for b in (mn, mx):
                    if b is not None and not float(b).is_integer():
                        raise ValueError("min_value and max_value must be integers")

        if etype == "expect_column_values_to_not_be_in_set":
            vs = kw.get("value_set")
            if vs is None:
                raise TypeError("argument of type 'NoneType' is not iterable")
            if any(v is None for v in vs):
                raise ValueError(
                    "expect_column_values_to_not_be_in_set cannot support a None "
                    "in the value_set in spark")

        if etype == "expect_column_kl_divergence_to_be_less_than":
            po = kw.get("partition_object")
            threshold = kw.get("threshold")
            th = kw.get("tail_weight_holdout", 0.0)
            ih = kw.get("internal_weight_holdout", 0.0)
            if po is not None and not _is_valid_partition_object(po):
                raise ValueError("Invalid partition object.")
            if threshold is not None and (
                    isinstance(threshold, bool) or not isinstance(threshold, num)
                    or threshold < 0):
                raise ValueError(
                    "Threshold must be specified, greater than or equal to zero.")
            for name, hv in (("tail_weight_holdout", th), ("internal_weight_holdout", ih)):
                if isinstance(hv, bool) or not isinstance(hv, num) or hv < 0 or hv > 1:
                    raise ValueError(f"{name} must be between zero and one.")
            if po is not None:
                if th != 0 and "tail_weights" in po:
                    raise ValueError(
                        "tail_weight_holdout must be 0 when using tail_weights in partition object")
                if "values" in po and ih > 0:
                    raise ValueError(
                        "Internal weight holdout cannot be used for discrete data.")
                if "bins" in po:
                    bins = po["bins"]
                    neg_inf = bins[0] == float("-inf")
                    pos_inf = bins[-1] == float("inf")
                    if neg_inf and pos_inf and th > 0:
                        raise ValueError(
                            "tail_weight_holdout cannot be used for partitions with infinite endpoints.")
                    if (neg_inf or pos_inf) and "tail_weights" in po:
                        raise ValueError(
                            "There can be no tail weights for partitions with one or both endpoints at infinity")
                    if kw.get("bucketize_data", True) is False:
                        raise ValueError(
                            "KL Divergence cannot be computed with a continuous partition "
                            "object and the bucketize_data parameter set to false.")

        if etype == "expect_column_quantile_values_to_be_between":
            for pair in kw.get("quantile_ranges", {}).get("value_ranges", []):
                lo, hi = pair
                if lo is not None and hi is not None and lo > hi:
                    raise ValueError("quantile_ranges must consist of ordered pairs")

        if etype in ("expect_table_row_count_to_equal", "expect_table_column_count_to_equal"):
            v = kw.get("value")
            if isinstance(v, bool) or not isinstance(v, int):
                raise ValueError("value must be an integer")

        fields = {f.name: f.dataType for f in self.df.schema.fields}
        col = kw.get("column")
        dt = fields.get(col) if col else None
        if dt is not None:
            if etype in self._NUMERIC_COLUMN_TYPES and not isinstance(
                    dt, (T.NumericType,)):
                raise TypeError(
                    f"{etype} requires a numeric column; '{col}' is {dt.simpleString()}")
            if etype in self._STRING_COLUMN_TYPES and not isinstance(
                    dt, (T.StringType,)):
                raise TypeError(self._STRING_COLUMN_TYPES[etype])
            if etype == "expect_column_values_to_be_between":
                mn, mx = kw.get("min_value"), kw.get("max_value")
                numeric_col = isinstance(dt, T.NumericType)
                string_col = isinstance(dt, T.StringType)
                for b in (mn, mx):
                    if b is None:
                        continue
                    b_num = isinstance(b, num) and not isinstance(b, bool)
                    if (numeric_col and not b_num) or (string_col and b_num):
                        raise TypeError(
                            "Column values, min_value, and max_value must either "
                            "be None or of the same type.")

    def _missing_columns(self, config: ExpectationConfiguration) -> list[str]:
        """Column-existence pre-check (the reference wires every metric to a
        table.columns dependency — column_aggregate_metric_provider.py:244-267)."""
        kw = config.kwargs
        refs: list[str] = []
        spec = get_spec(config.expectation_type)
        if spec.kind == "schema" or spec.extra.get("handler") == "row_count_other_table":
            return []
        for key in ("column", "column_A", "column_B"):
            if key in kw:
                refs.append(kw[key])
        refs.extend(kw.get("column_list", []))
        have = set(self.df.columns)
        return [c for c in refs if c not in have]

    def run(self, suite: ExpectationSuite) -> ExpectationSuiteValidationResult:
        evrs: dict[str, ExpectationValidationResult] = {}
        plannable = []
        for config in suite.expectations:
            unresolved = _unresolved_parameters(config.kwargs)
            if unresolved:
                exc = KeyError(
                    f"evaluation parameter(s) not supplied: {unresolved}")
                if not self.catch_exceptions:
                    raise exc
                evrs[id(config)] = ExpectationValidationResult(
                    success=False, expectation_config=config, result={},
                    exception_info={
                        "raised_exception": True,
                        "exception_message": f"KeyError: {exc}",
                        "exception_traceback": None,
                    })
                continue
            missing = self._missing_columns(config)
            if missing:
                exc = KeyError(f"column(s) not found in table: {missing}")
                if not self.catch_exceptions:
                    raise exc
                evrs[id(config)] = ExpectationValidationResult(
                    success=False, expectation_config=config, result={},
                    exception_info={
                        "raised_exception": True,
                        "exception_message": f"KeyError: {exc}",
                        "exception_traceback": None,
                    })
                continue
            try:
                self._validate_config(config)
            except Exception as exc:  # noqa: BLE001 — config errors become EVRs
                if not self.catch_exceptions:
                    raise
                evrs[id(config)] = ExpectationValidationResult(
                    success=False, expectation_config=config, result={},
                    exception_info={
                        "raised_exception": True,
                        "exception_message": f"{type(exc).__name__}: {exc}",
                        "exception_traceback": traceback.format_exc(),
                    })
                continue
            plannable.append(config)
        plan = compile_suite(plannable)

        def record(config: ExpectationConfiguration, fn) -> None:
            try:
                evrs[id(config)] = fn()
            except Exception as e:  # noqa: BLE001
                if not self.catch_exceptions:
                    raise
                evrs[id(config)] = ExpectationValidationResult(
                    success=False, expectation_config=config, result={},
                    exception_info={
                        "raised_exception": True,
                        "exception_message": f"{type(e).__name__}: {e}",
                        "exception_traceback": traceback.format_exc(),
                    })

        for item in plan.schema_items:
            record(item.config, lambda it=item: self._run_schema_item(it))

        for didx, dp in enumerate(plan.domains.values()):
            dfd = self.df
            if dp.row_condition:
                try:
                    rc = C.row_condition_filter(
                        {"row_condition": dp.row_condition,
                         "condition_parser": dp.condition_parser})
                except Exception as exc:  # noqa: BLE001 — bad condition: EVRs, not abort
                    if not self.catch_exceptions:
                        raise
                    # an unparseable row_condition fails every expectation in
                    # this domain as an exception EVR (same contract as any
                    # other config error) and the rest of the suite still runs
                    def _reraise(e=exc):
                        raise ValueError(f"invalid row_condition: {e}") from e
                    for it in dp.fused_items + dp.dependent_items + dp.job_items:
                        record(it.config, _reraise)
                    continue
                dfd = dfd.filter(rc)
            for it in dp.fused_items + dp.dependent_items + dp.job_items:
                it.info["dfd"] = dfd

            grow: dict = {}
            pid_rows: list[dict] = []
            if dp.slot_table.exprs:
                agg_list = dp.slot_table.agg_list
                try:
                    if self.per_partition and self.partition_verdict_sink is not None:
                        # 100k+-partition mode: verdict rows go to the sink
                        # distributed; nothing wide is collected (r4 #6)
                        grow = self._fused_pass_to_sink(dp, dfd, didx)
                    elif self.per_partition:
                        rows = [r.asDict() for r in
                                dfd.withColumn("__pid", self._pid_expr())
                                .rollup("__pid").agg(*agg_list).collect()]
                        global_rows = [r for r in rows if r["__pid"] is None]
                        grow = global_rows[0] if global_rows else {a: None for a in dp.slot_table.exprs}
                        pid_rows = [r for r in rows if r["__pid"] is not None]
                    else:
                        first = dfd.agg(*agg_list).first()
                        grow = first.asDict() if first is not None else {a: None for a in dp.slot_table.exprs}
                except Exception as exc:  # noqa: BLE001 — fused pass failed: attribute to every item
                    if not self.catch_exceptions:
                        raise
                    tb = traceback.format_exc()
                    for it in dp.fused_items + dp.dependent_items + dp.job_items:
                        evrs[id(it.config)] = ExpectationValidationResult(
                            success=False, expectation_config=it.config, result={},
                            exception_info={
                                "raised_exception": True,
                                "exception_message": f"{type(exc).__name__}: {exc}",
                                "exception_traceback": tb,
                            })
                    continue

            for item in dp.fused_items:
                record(item.config, lambda it=item: self._evr_from_row(it, grow))
                for prow in pid_rows:
                    try:
                        pevr = self._evr_from_row_quiet(item, prow)
                        if pevr is not None:
                            self._record_partition_verdict(
                                prow["__pid"], item, pevr.success,
                                {"unexpected_count": pevr.result.get("unexpected_count"),
                                 "element_count": pevr.result.get("element_count"),
                                 "missing_count": pevr.result.get("missing_count"),
                                 "observed_value": _jsonable(pevr.result.get("observed_value"))})
                    except Exception:  # noqa: BLE001
                        pass

            if dp.dependent_items:
                try:
                    for item, evr in self._run_dependent_items(
                            dp.dependent_items, dfd, grow, pid_rows, didx):
                        evrs[id(item.config)] = evr
                except Exception as e:  # noqa: BLE001
                    if not self.catch_exceptions:
                        raise
                    for item in dp.dependent_items:
                        record(item.config, lambda exc=e: (_ for _ in ()).throw(exc))

            for jidx, item in enumerate(dp.job_items):
                record(item.config,
                       lambda it=item, j=jidx: self._run_job_item(
                           it, dfd, grow, pid_rows=pid_rows, didx=didx,
                           jidx=j))

        results = []
        for config in suite.expectations:
            results.append(evrs[id(config)])
        success = all(r.success for r in results)
        return ExpectationSuiteValidationResult(
            success=success, results=results, statistics=build_statistics(results),
            meta={"expectation_suite_name": suite.expectation_suite_name})

    def _evr_from_row_quiet(self, item: CompiledItem, row: dict) -> ExpectationValidationResult | None:
        """Per-partition verdict from a rollup row — no sample collection.

        Returns None when the item's verdict is NOT a pure function of the
        rollup row (raw-sample bootstrap, auto-built partitions, exact
        opt-in quantiles, positive-holdout categorical KL with out-of-set
        mass): scoring those per partition would both attribute a
        GLOBAL-data value to every partition label and run one driver job
        per partition. Such items simply have no per-partition rows."""
        spec, kw = item.spec, item.kwargs
        if spec.kind == "map":
            element = int(row[item.slots["element"]] or 0)
            nonnull = int(row[item.slots["nonnull"]] or 0)
            unexpected = int(row[item.slots["unexpected"]] or 0)
            return self._map_evr_no_samples(item, element, nonnull, unexpected)
        if spec.kind == "drift":
            if kw.get("bootstrap") or item.info.get("auto"):
                return None
            if "values" in item.info and spec.extra["score"] == "kl":
                return self._categorical_kl_row_verdict(item, row)
        if (spec.kind == "agg_custom"
                and spec.extra.get("handler") == "quantiles"
                and item.info.get("use_approx_quantile")):
            return None
        if spec.kind in ("agg", "agg_custom", "drift"):
            rf_save = dict(self.rf)
            try:
                self.rf["result_format"] = "BOOLEAN_ONLY"
                if spec.kind == "agg":
                    return self._between_evr(item, row[item.slots["value"]])
                if spec.kind == "agg_custom":
                    return self._agg_custom_evr(item, row)
                return self._drift_evr(item, row)
            finally:
                self.rf = rf_save
        return None

    def _categorical_kl_row_verdict(self, item: CompiledItem, row: dict
                                    ) -> ExpectationValidationResult | None:
        """Row-local categorical KL — the collected-path twin of the sink
        scorer's categorical branch. With the default holdout of 0 any
        out-of-set mass is inf however it splits (one synthetic entry is
        exact); a positive holdout with out-of-set mass needs its own
        (value, partition) job, so no per-partition verdict is emitted
        (the _kl_evr global path would otherwise attribute whole-table
        out-of-set counts to this partition AND run a groupBy per pid)."""
        import math
        kw = item.kwargs
        counts, _, _, nonnull = self._drift_counts(item, row)
        th = float(kw.get("tail_weight_holdout", 0.0))
        values = item.info["values"]
        observed = {v: float(c) for v, c in zip(values, counts)}
        out_mass = nonnull - sum(observed.values())
        if out_mass > 0.5:
            if th > 0:
                return None
            observed[object()] = out_mass
        value, _ = sketches.kl_divergence_categorical(
            observed, float(nonnull), values,
            item.info["expected_weights"], th)
        threshold = kw.get("threshold")
        success = (True if threshold is None
                   else bool(value <= float(threshold)))
        displayable = not (math.isinf(value) or math.isnan(value))
        return ExpectationValidationResult(
            success=success, expectation_config=item.config,
            result={"observed_value": value if displayable else None})

    def _map_evr_no_samples(self, item: CompiledItem, element: int, nonnull: int,
                            unexpected: int) -> ExpectationValidationResult:
        mostly = item.kwargs.get("mostly", 1.0)
        success = mostly_success(element, nonnull, unexpected, mostly)
        return ExpectationValidationResult(
            success=success, expectation_config=item.config,
            result={"element_count": element, "unexpected_count": unexpected,
                    "missing_count": element - nonnull})


def _jsonable(v: Any) -> Any:
    try:
        import json
        json.dumps(v)
        return v
    except (TypeError, ValueError):
        return str(v)


def _opt_int(v: Any) -> int | None:
    return None if v is None else int(v)


def read_partition_verdicts(spark, sink_path: str) -> DataFrame:
    """All per-partition verdict rows a `partition_verdict_sink` run wrote
    (distributed derivation + the driver-derived narrow items + the z-score
    pass), as one DataFrame — the scale-safe replacement for
    result.meta['partition_verdicts'] when partitions number 100k+."""
    import os
    return spark.read.parquet(os.path.join(sink_path, "verdicts-*.parquet"))


def resolve_evaluation_parameters(
    suite: ExpectationSuite, params: dict | None) -> ExpectationSuite:
    """Substitute ``{"$PARAMETER": "<name>"}`` kwargs with values supplied at
    validation time — the reference's evaluation-parameter mechanism
    (core/evaluation_parameters.py:199-304; URN store lookups become plain
    dict lookups here since cross-suite values live in the results table)."""
    def subst(v):
        if isinstance(v, dict) and set(v) == {"$PARAMETER"}:
            name = v["$PARAMETER"]
            if params is not None and name in params:
                return params[name]
            # the reference allows EXPRESSIONS here — arithmetic, round/trunc,
            # and temporal builtins now()/datetime()/timedelta(), possibly
            # referencing supplied params (core/evaluation_parameters.py)
            from .eval_params import evaluate_parameter_expression
            try:
                return evaluate_parameter_expression(name, params)
            except Exception:
                # leave unresolved: ValidationRun converts it into a
                # per-expectation exception EVR (catch_exceptions semantics),
                # instead of aborting the whole validate() call here
                return v
        if isinstance(v, dict):
            return {k: subst(x) for k, x in v.items()}
        if isinstance(v, list):
            return [subst(x) for x in v]
        return v

    needs = any(
        isinstance(v, (dict, list)) for c in suite.expectations for v in c.kwargs.values())
    if not needs:
        return suite
    out = ExpectationSuite(suite.expectation_suite_name, meta=dict(suite.meta))
    for c in suite.expectations:
        out.expectations.append(ExpectationConfiguration(
            c.expectation_type, subst(dict(c.kwargs)), dict(c.meta)))
    return out


def _unresolved_parameters(v) -> list[str]:
    """Names of ``{"$PARAMETER": ...}`` markers still present after
    resolve_evaluation_parameters (i.e. not supplied by the caller)."""
    if isinstance(v, dict):
        if set(v) == {"$PARAMETER"}:
            return [v["$PARAMETER"]]
        return [n for x in v.values() for n in _unresolved_parameters(x)]
    if isinstance(v, list):
        return [n for x in v for n in _unresolved_parameters(x)]
    return []


def validate(
    df: DataFrame,
    suite: ExpectationSuite,
    *,
    tables: dict[str, DataFrame] | None = None,
    result_format: Any = "BASIC",
    catch_exceptions: bool = True,
    per_partition: bool = False,
    partition_col: str | None = None,
    unique_strategy: str = "exact",
    evaluation_parameters: dict | None = None,
    partition_verdict_sink: str | None = None,
) -> ExpectationSuiteValidationResult:
    suite = resolve_evaluation_parameters(suite, evaluation_parameters)
    run = ValidationRun(
        df, tables=tables, result_format=result_format,
        catch_exceptions=catch_exceptions, per_partition=per_partition,
        partition_col=partition_col, unique_strategy=unique_strategy,
        partition_verdict_sink=partition_verdict_sink)
    result = run.run(suite)
    if per_partition:
        result.meta["partition_verdicts"] = run.partition_verdicts
        if partition_verdict_sink is not None:
            # verdict rows live in the sink, not the driver — read them with
            # read_partition_verdicts(spark, path)
            result.meta["partition_verdicts_path"] = partition_verdict_sink
    return result
