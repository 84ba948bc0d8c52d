"""Incremental snapshot validation: validate each append-only delta ONCE and
derive whole-table verdicts from merged sufficient statistics.

At 10^12 rows a nightly full-table validation re-reads ~100 TB to re-verify
data that has not changed. Iceberg-style tables grow by appending immutable
files (``io.write_table`` snapshots; Iceberg incremental scans), so the
scale-correct loop is:

    for each NEW snapshot:  validate only the appended delta (one fused pass)
    whole-table verdicts:   merge per-snapshot sufficient statistics

Which statistics make an expectation mergeable (all folds are exact unless
noted):

- map / pair / multicolumn conditions — each row's pass/fail depends on that
  row alone, so (element, nonnull, unexpected) counts SUM exactly.
- row_count — counts sum.
- mean / sum — (count, sum) sum; merged mean = sum/count.
- min / max — fold by min/max.
- stddev (sample) — (count, sum, sum of squares) sum; merged
  stddev = sqrt((S2 - S1^2/C)/(C-1)). Float64 sums: the only inexactness is
  last-ulp association order, bounded by the snapshot count (not row count).
- drift (KL / KS / PSI / chi-square with an explicit partition_object) —
  histogram bucket counts sum exactly, so the merged score is IDENTICAL to a
  full recompute. Categorical drift merges only when no out-of-set values
  were observed (resolving out-of-set mass needs per-value counts).
- distinct value set (subset/superset/equal) — per-delta ``collect_set``
  folds by set union.
- uniqueness — approximate only: per-delta DataSketches HLL
  (``hll_sketch_agg``) merge losslessly via ``hll_union_agg``; the merged
  verdict is the engine's documented HLL-prescreen strategy
  (``unique_strategy='approx'``). EXACT uniqueness is NOT derivable from
  per-delta statistics (a duplicate can span two snapshots) — it is reported
  as unsupported and needs one full-table pass.
- median / quantiles — approximate with a declared bound: per-delta
  DataSketches KLL doubles sketches (``kll_sketch_agg_double``) merge
  losslessly via ``kll_merge_agg_double``; the merged quantile differs from
  a full recompute by at most the sketch's normalized rank error
  (~1.7%/0.8% two/one-sided at the default k=200, 99% confidence — tune
  with ``kll_k``). Expectations that explicitly request EXACT quantiles
  (``exact=True``, ``allow_relative_error=0``, ``interpolation='linear'``)
  stay unsupported: exact order statistics are not derivable from
  per-delta sketches.
- schema checks — evaluated per delta, folded by AND (sound for append-only
  tables: every file ever written satisfied the check).

- audio invariants (SNR/payload/header) and referential checks — mergeable
  with ``frozen_reference=True`` (+ ``tables=``): each delta runs its own
  prescreen-join/anti-join job against the reference table and the
  map-shaped (element, nonnull, unexpected) counts sum exactly, PROVIDED the
  reference table does not change between deltas (the caller asserts this;
  a grown reference could legalize a previously-orphaned FK value, making
  old counts stale). This is the 10^12-clip loop for the north-rule audio
  table: only newly appended clips are decoded.

NOT mergeable, reported in ``unsupported`` (run a full validation for these):
exact-opt-in median/quantiles (see above), z-score
(defined against the evolving global mean/std — old rows' verdicts change
when data appends), increasing/decreasing windows (order spans snapshots),
exact uniqueness / exact unique_proportion / exact unique_value_count
(both of the latter merge with the approximate=True HLL opt-in),
referential/audio without the frozen-reference opt-in, bootstrapped KS and
auto-partition KL (raw-sample / batch-derived partitions).

The per-snapshot stats file is a few KB of JSON regardless of delta size;
merging is driver-side arithmetic plus (only when uniqueness is present) one
tiny Spark job that unions the stored HLL sketches. Reference analogue: GE
has no incremental mode — Checkpoint re-validates the full batch every run
(checkpoint/checkpoint.py:202-306); this module is the Spark-first
replacement for that loop on append-only tables.
"""

from __future__ import annotations

import base64
import hashlib
import json
import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import config_id
from .planner import CompiledItem, compile_suite
from .results import (format_map_output, mostly_success,
                      normalize_result_format)
from .runner import UNEXPECTED_LIST_LIMIT, ValidationRun
from .types import (ExpectationSuite, ExpectationSuiteValidationResult,
                    ExpectationValidationResult, build_statistics)

STATS_FORMAT_VERSION = 1

# distinct-set statistics are stored verbatim in the per-snapshot JSON; the
# KB-sized-stats-file guarantee requires them to stay value-set-sized
MAX_DISTINCT_SET = 10_000

# agg-kind expectation types with an exact sufficient-statistic decomposition
_MERGEABLE_AGGS = {
    "expect_column_mean_to_be_between": "mean",
    "expect_column_min_to_be_between": "min",
    "expect_column_max_to_be_between": "max",
    "expect_column_sum_to_be_between": "sum",
    "expect_column_stdev_to_be_between": "stdev",
}

_DRIFT_SCORES_MERGEABLE = {"kl", "ks", "psi", "chisq_p", "ks_param_p"}

# default DataSketches KLL k: ~0.8% one-sided normalized rank error at 99%
# confidence, 4-5 KB serialized — override per expectation with kll_k=
KLL_DEFAULT_K = 200
# published DataSketches KLL accuracy model (single-sided, 99% confidence):
# eps(k) ≈ 2.296 / k^0.9 — inverted to honor allow_relative_error
_KLL_EPS_COEF, _KLL_EPS_EXP = 2.296, 0.9
_KLL_MAX_K = 16384  # ~0.04% rank error, ~300 KB sketch — still stats-file KB


def _kll_k_for(kw: dict) -> int:
    """Effective KLL k for a quantile expectation: explicit ``kll_k`` wins;
    otherwise a positive ``allow_relative_error`` is treated as the caller's
    rank-error tolerance and k is derived from the inverted accuracy model
    (never below the default — tighter than requested is always safe).
    Tolerances the largest supported sketch cannot deliver are rejected at
    classification time, not silently rounded to k=200."""
    if "kll_k" in kw:
        return int(kw["kll_k"])
    err = kw.get("allow_relative_error", False)
    if isinstance(err, (int, float)) and not isinstance(err, bool) and err > 0:
        k = math.ceil((_KLL_EPS_COEF / float(err)) ** (1.0 / _KLL_EPS_EXP))
        return max(KLL_DEFAULT_K, k)
    return KLL_DEFAULT_K


def _suite_fingerprint(suite: ExpectationSuite) -> str:
    ids = sorted(config_id(c.expectation_type, c.kwargs)
                 for c in suite.expectations)
    return hashlib.md5(json.dumps(ids).encode()).hexdigest()[:16]


def _rsd_to_lg_config_k(rsd: float) -> int:
    """HLL standard error ~= 1.04 / sqrt(2^lgK); pick the smallest lgK whose
    error is <= the requested rsd (clamped to the sketch's valid 4..21)."""
    lg = math.ceil(2.0 * math.log2(1.04 / max(rsd, 1e-6)))
    return max(4, min(21, int(lg)))


class _Unsupported(Exception):
    pass


def _classify_item(item: CompiledItem, *,
                   frozen_reference: bool = False) -> str:
    """-> merge strategy name, or raise _Unsupported(reason)."""
    kind = item.spec.kind
    etype = item.config.expectation_type
    if kind in ("audio", "referential"):
        if not frozen_reference:
            raise _Unsupported(
                f"{kind} counts merge only while the reference table is "
                "unchanged between deltas — opt in with "
                "frozen_reference=True (and pass tables=)")
        if (kind == "referential"
                and item.spec.extra.get("handler") == "row_count_other_table"):
            return "rowcount_vs_other"
        return "job_counts"
    if kind == "map":
        return "map"
    if kind == "agg":
        if etype in _MERGEABLE_AGGS:
            return "agg:" + _MERGEABLE_AGGS[etype]
        if etype == "expect_column_unique_value_count_to_be_between":
            if item.kwargs.get("approximate"):
                return "agg:hll"
            raise _Unsupported(
                "exact distinct count is not derivable from per-delta "
                "statistics (pass approximate=True for a mergeable HLL "
                "sketch, or run a full validation)")
        if etype == "expect_column_median_to_be_between":
            # approximate within the KLL sketch's declared rank-error bound
            # (the full-validation path is exact F.median; merging sketches
            # is the documented incremental tolerance, like HLL uniqueness)
            return "kll:median"
        raise _Unsupported(
            f"{etype} has no exact sufficient-statistic decomposition")
    if kind == "agg_custom":
        handler = item.spec.extra["handler"]
        if handler == "row_count":
            return "row_count"
        if handler == "distinct_set":
            return "distinct_set"
        if handler == "quantiles":
            kw = item.kwargs
            err = kw.get("allow_relative_error", False)
            if (kw.get("exact") is True or kw.get("interpolation") == "linear"
                    or (err is not False and err == 0)):
                raise _Unsupported(
                    "exact quantiles are not derivable from per-delta "
                    "statistics — drop the exactness opt-in (exact=True / "
                    "allow_relative_error=0 / interpolation='linear') to "
                    "merge a KLL sketch, or run a full validation")
            if _kll_k_for(kw) > _KLL_MAX_K:
                raise _Unsupported(
                    f"allow_relative_error={err} is tighter than the "
                    f"largest supported merge sketch delivers (KLL "
                    f"k={_KLL_MAX_K} ≈ "
                    f"{_KLL_EPS_COEF / _KLL_MAX_K ** _KLL_EPS_EXP:.2%} rank "
                    "error) — loosen it, pass kll_k= explicitly, or run a "
                    "full validation")
            return "kll:quantiles"
        if handler == "unique_proportion":
            if item.kwargs.get("approximate"):
                return "unique_proportion:hll"
            raise _Unsupported(
                "exact unique proportion needs an exact distinct count, "
                "which does not decompose into per-delta statistics — pass "
                "approximate=True for a mergeable HLL sketch (distinct "
                "estimate / nonnull count), or run a full validation")
        raise _Unsupported(f"{handler} is not mergeable")
    if kind == "drift":
        if item.info.get("auto"):
            raise _Unsupported(
                "auto-partition KL derives the partition from the batch "
                "itself; pass an explicit partition_object to merge")
        if item.kwargs.get("bootstrap"):
            raise _Unsupported("bootstrapped KS resamples raw values")
        if item.spec.extra.get("score") not in _DRIFT_SCORES_MERGEABLE:
            raise _Unsupported(
                f"drift score {item.spec.extra.get('score')!r} is not "
                "computable from merged bucket counts")
        return "drift"
    if kind == "map_unique":
        return "unique_approx"
    if kind == "schema":
        return "schema"
    if kind == "map_dependent":
        raise _Unsupported(
            "z-scores are defined against the whole-table mean/std, which "
            "changes when data appends — old rows' verdicts are not stable")
    if kind == "map_window":
        raise _Unsupported("window order spans snapshot boundaries")
    raise _Unsupported(f"kind {kind!r} needs raw rows, not statistics")


class IncrementalCheckpoint:
    """Append-only incremental validation over a snapshot-log table.

    >>> inc = IncrementalCheckpoint(suite, store_path)
    >>> inc.validate_table(spark, table_path)   # validates NEW snapshots only
    >>> result = inc.merged_result(spark)       # whole-table verdicts

    ``unsupported()`` lists the suite's expectations that cannot be merged
    from statistics (with reasons); validate those with a full run. With
    ``strict=True`` construction fails instead when any exist.
    """

    def __init__(self, suite: ExpectationSuite, store_path: str, *,
                 result_format: str = "BASIC", strict: bool = False,
                 tables: dict | None = None,
                 frozen_reference: bool = False) -> None:
        self.suite = suite
        self.store_path = store_path
        self.result_format = result_format
        self.tables = tables or {}
        self._fp = _suite_fingerprint(suite)
        self._plan = compile_suite(suite.expectations)
        self._strategy: dict[int, str] = {}   # id(config) -> strategy
        self._unsupported: list[dict] = []
        for item in self._iter_items():
            try:
                self._strategy[id(item.config)] = _classify_item(
                    item, frozen_reference=frozen_reference)
            except _Unsupported as e:
                self._unsupported.append({
                    "expectation_type": item.config.expectation_type,
                    "domain": item.kwargs.get("column")
                    or ",".join(item.kwargs.get("column_list", [])) or "",
                    "reason": str(e),
                })
        if strict and self._unsupported:
            raise ValueError(
                "suite has non-mergeable expectations: "
                + json.dumps(self._unsupported, indent=2))
        os.makedirs(os.path.join(store_path, "stats"), exist_ok=True)

    # ------------------------------------------------------------- plan walk

    def _iter_items(self):
        for item in self._plan.schema_items:
            yield item
        for dp in self._plan.domains.values():
            yield from (dp.fused_items + dp.dependent_items + dp.job_items)

    def _domain_items(self):
        """(domain_id, domain_plan, [supported items]) triples."""
        for did, dp in self._plan.domains.items():
            items = [it for it in dp.fused_items + dp.job_items
                     if id(it.config) in self._strategy]
            yield did, dp, items

    # -------------------------------------------------------- stat compiling

    def _stat_exprs(self, items: list[CompiledItem]) -> dict[str, dict]:
        """alias -> {"expr": Column, "op": merge-op}. Aliases are the
        planner's semantic slot keys (stable across processes), so two
        expectations sharing a metric share one statistic."""
        stats: dict[str, dict] = {}

        def add(key: str, expr, op: str) -> str:
            if key not in stats:
                stats[key] = {"expr": expr.alias(f"s{len(stats)}"), "op": op,
                              "col": f"s{len(stats)}"}
            return key

        for item in items:
            strat = self._strategy[id(item.config)]
            kw = item.kwargs
            inv = {a: k for k, a in
                   self._owning_domain(item).slot_table.keys.items()}
            if strat in ("map", "unique_approx", "drift", "row_count",
                         "distinct_set"):
                for role, alias in item.slots.items():
                    key = inv[alias]
                    expr = self._owning_domain(item).slot_table.exprs[alias]
                    if strat == "unique_approx" and role == "approx_distinct":
                        # replace the approx_count_distinct scalar (not
                        # mergeable) with the sketch itself (losslessly
                        # mergeable via hll_union_agg)
                        nn = self._unique_nn(item)
                        target = (F.struct(*[F.col(c)
                                             for c in kw["column_list"]])
                                  if item.spec.extra.get("compound")
                                  else F.col(kw["column"]))
                        lg = _rsd_to_lg_config_k(float(kw.get("rsd", 0.05)))
                        add("hllsk::" + key,
                            F.hll_sketch_agg(F.when(nn, target), F.lit(lg)),
                            "hll")
                    elif strat == "distinct_set" and role == "value":
                        add(key, expr, "set_union")
                    else:
                        add(key, expr, "sum")
                for alias in item.info.get("bin_aliases", []):
                    add(inv[alias],
                        self._owning_domain(item).slot_table.exprs[alias],
                        "sum")
            elif strat.startswith("kll:"):
                k = _kll_k_for(kw)
                add(f"inc::kll::{kw['column']}::{k}",
                    F.kll_sketch_agg_double(
                        F.col(kw["column"]).cast("double"), F.lit(k)),
                    "kll")
            elif strat == "unique_proportion:hll":
                col = F.col(kw["column"])
                lg = _rsd_to_lg_config_k(float(kw.get("rsd", 0.05)))
                # lg in the key: two expectations on the same column with
                # different rsd must not share (and silently degrade) a sketch
                add(f"inc::hllp::{kw['column']}::{lg}",
                    F.hll_sketch_agg(col, F.lit(lg)), "hll")
                add(f"inc::nncnt::{kw['column']}", F.count(col), "sum")
            elif strat.startswith("agg:"):
                col = F.col(kw["column"])
                dbl = col.cast("double")
                what = strat.split(":", 1)[1]
                if what in ("mean", "stdev"):
                    add(f"inc::cnt::{kw['column']}", F.count(col), "sum")
                    add(f"inc::sum::{kw['column']}", F.sum(dbl), "sum")
                if what == "stdev":
                    add(f"inc::sumsq::{kw['column']}", F.sum(dbl * dbl), "sum")
                if what == "min":
                    add(f"inc::min::{kw['column']}", F.min(col), "min")
                if what == "max":
                    add(f"inc::max::{kw['column']}", F.max(col), "max")
                if what == "sum":
                    add(f"inc::nsum::{kw['column']}", F.sum(col),
                        "sum_nullable")
                if what == "hll":
                    lg = _rsd_to_lg_config_k(float(kw.get("rsd", 0.05)))
                    add(f"inc::hll::{kw['column']}",
                        F.hll_sketch_agg(col, F.lit(lg)), "hll")
        return stats

    def _owning_domain(self, item: CompiledItem):
        for dp in self._plan.domains.values():
            if item in dp.fused_items or item in dp.job_items:
                return dp
        raise KeyError(item.config.expectation_type)

    @staticmethod
    def _unique_nn(item: CompiledItem):
        from .metrics import conditions as C
        kw = item.kwargs
        if item.spec.extra.get("compound") or "column_list" in kw:
            return C.multicolumn_domain_filter(
                {**kw, "ignore_row_if":
                 kw.get("ignore_row_if", "all_values_are_missing")})
        return F.col(kw["column"]).isNotNull()

    # ---------------------------------------------------------- delta passes

    def _manifest_path(self) -> str:
        return os.path.join(self.store_path, "manifest.json")

    def _load_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                m = json.load(f)
        except FileNotFoundError:
            return {"validated": [], "suite_fp": self._fp,
                    "format_version": STATS_FORMAT_VERSION}
        if m.get("suite_fp") != self._fp:
            raise ValueError(
                "stats store was written by a different suite version — "
                "point at a fresh store or re-validate from scratch")
        return m

    def _commit_manifest(self, m: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path())

    def validate_delta(self, df: DataFrame, *, snapshot_id: str) -> dict:
        """One fused statistics pass per domain over THIS delta; commits the
        stats file then the manifest (crash between the two = the snapshot
        re-validates on resume; the stats write is idempotent)."""
        manifest = self._load_manifest()
        if snapshot_id in manifest["validated"]:
            return {"snapshot_id": snapshot_id, "skipped": True}
        out: dict = {"snapshot_id": snapshot_id, "suite_fp": self._fp,
                     "format_version": STATS_FORMAT_VERSION, "domains": {},
                     "schema": {}}
        from .metrics import conditions as C
        for did, dp, items in self._domain_items():
            dfd = df
            if dp.row_condition:
                dfd = dfd.filter(C.row_condition_filter(
                    {"row_condition": dp.row_condition,
                     "condition_parser": dp.condition_parser}))
            stats = self._stat_exprs(items)
            if not stats:
                continue
            row = dfd.agg(*[s["expr"] for s in stats.values()]).first()
            vals = {}
            for key, s in stats.items():
                v = row[s["col"]]
                if (s["op"] == "set_union" and v is not None
                        and len(v) > MAX_DISTINCT_SET):
                    # the per-snapshot stats file must stay KB-sized; a
                    # high-cardinality distinct-set column would silently
                    # grow it per delta — refuse instead
                    raise ValueError(
                        f"distinct-set statistic {key!r} has {len(v)} "
                        f"values in this delta (cap {MAX_DISTINCT_SET}) — "
                        "a value-set check on a high-cardinality column is "
                        "not incrementally mergeable at bounded size; drop "
                        "it from the suite or validate it with a full run")
                vals[key] = _encode(v, key, s["op"])
            out["domains"][did] = vals
        if self._plan.schema_items:
            vr = ValidationRun(df)
            for item in self._plan.schema_items:
                evr = vr._run_schema_item(item)
                out["schema"][config_id(item.config.expectation_type,
                                        item.kwargs)] = bool(evr.success)
        job_items = [it for it in self._iter_items()
                     if self._strategy.get(id(it.config)) in
                     ("job_counts", "rowcount_vs_other")]
        if job_items:
            # frozen-reference audio/referential: run their own join jobs on
            # THIS delta only (prescreen/anti-join against the full reference
            # table) and keep the map-shaped counts, which sum exactly
            sub = ExpectationSuite(self.suite.expectation_suite_name
                                   + "#incremental-jobs")
            for it in job_items:
                sub.expectations.append(it.config)
            res = ValidationRun(df, tables=self.tables,
                                catch_exceptions=False).run(sub)
            jobs = {}
            for it, evr in zip(job_items, res.results):
                cid = config_id(it.config.expectation_type, it.kwargs)
                if self._strategy[id(it.config)] == "rowcount_vs_other":
                    jobs[cid] = {
                        "observed": int(evr.result["observed_value"]),
                        "other": int(
                            evr.result["details"]["other_table_row_count"])}
                else:
                    r = evr.result
                    jobs[cid] = {"el": int(r.get("element_count") or 0),
                                 "mi": int(r.get("missing_count") or 0),
                                 "ux": int(r.get("unexpected_count") or 0)}
            out["jobs"] = jobs
        path = os.path.join(self.store_path, "stats", f"{snapshot_id}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        manifest["validated"].append(snapshot_id)
        self._commit_manifest(manifest)
        return {"snapshot_id": snapshot_id, "skipped": False}

    def validate_table(self, spark, table_path: str) -> dict:
        """Validate every snapshot of an ``io.write_table`` snapshot-log
        table that is not yet in the stats store, as deltas, oldest first."""
        from .io import read_table, read_table_delta, snapshots
        manifest = self._load_manifest()
        done = set(manifest["validated"])
        ran = []
        # an overwrite snapshot REPLACES data, so statistics merged from
        # snapshots before it would describe rows that no longer exist. The
        # LATEST non-append snapshot is therefore the merge base: validate
        # it as a full read and the appends after it as deltas. If the store
        # already holds stats from before that base, they are stale — refuse
        # loudly instead of merging silently-wrong verdicts.
        history = snapshots(table_path)
        base_idx = 0
        for i, snap in enumerate(history):
            if i > 0 and snap.get("mode") != "append":
                base_idx = i
        stale = done & {s["id"] for s in history[:base_idx]}
        if stale:
            raise ValueError(
                f"snapshot {history[base_idx]['id']!r} overwrote the table "
                f"but the stats store still holds pre-overwrite snapshots "
                f"{sorted(stale)} — their statistics describe replaced rows; "
                "start a fresh stats store from the overwrite")
        prev = None
        for snap in history[base_idx:]:
            sid = snap["id"]
            if sid not in done:
                if prev is None:
                    df, _ = read_table(spark, table_path, snapshot_id=sid)
                else:
                    df, _ = read_table_delta(spark, table_path, prev,
                                             snapshot_id=sid)
                self.validate_delta(df, snapshot_id=sid)
                ran.append(sid)
            prev = sid
        return {"validated_now": ran, "validated_total":
                len(self._load_manifest()["validated"])}

    # --------------------------------------------------------------- merging

    def unsupported(self) -> list[dict]:
        return list(self._unsupported)

    def _load_stats(self) -> list[dict]:
        manifest = self._load_manifest()
        out = []
        for sid in manifest["validated"]:
            with open(os.path.join(self.store_path, "stats",
                                   f"{sid}.json")) as f:
                s = json.load(f)
            if s.get("format_version") != STATS_FORMAT_VERSION:
                raise ValueError(f"stats format mismatch in {sid}")
            out.append(s)
        return out

    def merged_result(self, spark=None) -> ExpectationSuiteValidationResult:
        """Whole-table verdicts from the merged statistics. The merge itself
        is driver-side arithmetic over the KB-sized stats files; ``spark``
        (an active session) is only needed when the suite contains
        uniqueness/HLL expectations — one tiny job unions the stored
        sketches. (Plan compilation in ``__init__`` builds Catalyst Column
        objects, so the process still needs a live SparkContext — merge
        never runs a job or scans data, but it is not JVM-free.)"""
        deltas = self._load_stats()
        if not deltas:
            raise ValueError("no validated snapshots in the stats store")
        merged_domains: dict[str, dict] = {}
        hll_pending: list[tuple[str, str, list[bytes]]] = []  # (did,key,[sk])
        kll_pending: list[tuple[str, str, int, list[bytes]]] = []
        kll_need: dict[str, set] = {}   # "did\x00key" -> quantiles wanted
        for did, dp, items in self._domain_items():
            stats = self._stat_exprs(items)   # recompiled for op metadata
            for item in items:
                strat = self._strategy[id(item.config)]
                if strat.startswith("kll:"):
                    kw = item.kwargs
                    key = (f"inc::kll::{kw['column']}"
                           f"::{_kll_k_for(kw)}")
                    qs = ({0.5} if strat == "kll:median"
                          else {float(q) for q in item.info["quantiles"]})
                    kll_need.setdefault(f"{did}\x00{key}", set()).update(qs)
            acc: dict = {}
            for key, s in stats.items():
                # A key the CURRENT engine folds but a stored delta lacks
                # means that delta was validated by an engine version that
                # classified the expectation as unsupported (e.g. median /
                # quantiles before KLL merging existed): merging only the
                # sketches that exist would silently report partial-data
                # verdicts as whole-table ones. Raise loudly, like
                # _job_verdict does for missing job counts.
                absent = [d["snapshot_id"] for d in deltas
                          if key not in d["domains"].get(did, {})]
                if absent:
                    raise ValueError(
                        f"snapshot(s) {absent} have no stored statistic "
                        f"{key!r} — they were validated by an engine version "
                        "that did not fold it; re-validate them or start a "
                        "fresh stats store")
                vals = [_decode(d["domains"].get(did, {}).get(key))
                        for d in deltas]
                op = s["op"]
                if op == "sum":
                    acc[key] = sum(int(v) if isinstance(v, int) else v
                                   for v in vals if v is not None) \
                        if any(v is not None for v in vals) else 0
                elif op == "sum_nullable":
                    nn = [v for v in vals if v is not None]
                    acc[key] = sum(nn) if nn else None
                elif op == "min":
                    nn = [v for v in vals if v is not None]
                    acc[key] = min(nn) if nn else None
                elif op == "max":
                    nn = [v for v in vals if v is not None]
                    acc[key] = max(nn) if nn else None
                elif op == "set_union":
                    u = set()
                    for v in vals:
                        u.update(v or [])
                    acc[key] = sorted(u)
                elif op == "hll":
                    sketches = [v for v in vals if v is not None]
                    hll_pending.append((did, key, sketches))
                    acc[key] = None  # filled below
                elif op == "kll":
                    sketches = [v for v in vals if v is not None]
                    kll_pending.append(
                        (did, key, int(key.rsplit("::", 1)[1]), sketches))
                    acc[key] = None  # filled below
                else:  # pragma: no cover
                    raise ValueError(op)
            merged_domains[did] = acc
        if any(sk for _, _, sk in hll_pending):
            if spark is None:
                raise ValueError(
                    "merging uniqueness sketches needs a SparkSession — "
                    "pass spark to merged_result()")
            rows = [(f"{did}\x00{key}", sk)
                    for did, key, sks in hll_pending for sk in sks]
            if rows:
                est = {r["k"]: int(r["est"]) for r in
                       (spark.createDataFrame(rows, "k string, sk binary")
                        .groupBy("k")
                        .agg(F.hll_sketch_estimate(
                            F.hll_union_agg("sk", F.lit(True))).alias("est"))
                        .collect())}
                for did, key, sks in hll_pending:
                    if sks:
                        merged_domains[did][key] = est.get(f"{did}\x00{key}", 0)
        if any(sk for _, _, _, sk in kll_pending):
            if spark is None:
                raise ValueError(
                    "merging quantile sketches needs a SparkSession — "
                    "pass spark to merged_result()")
            # two tiny jobs over the KB-sized sketches (never the data):
            # 1. merge per (composite key, k) — one job per distinct k so the
            #    merged sketch keeps the caller's accuracy parameter
            from collections import defaultdict
            by_k: dict[int, list] = defaultdict(list)
            for did, key, k, sks in kll_pending:
                for sk in sks:
                    by_k[k].append((f"{did}\x00{key}", sk))
            merged_sk: dict[str, bytes] = {}
            for k, rows in by_k.items():
                for r in (spark.createDataFrame(rows, "k string, sk binary")
                          .groupBy("k")
                          .agg(F.kll_merge_agg_double("sk", F.lit(k))
                               .alias("m")).collect()):
                    merged_sk[r["k"]] = bytes(r["m"])
            # 2. extract every quantile any expectation needs from the
            #    merged sketches — the rank argument must be foldable, so
            #    each distinct quantile becomes one literal column
            all_qs = sorted({float(q) for qs in kll_need.values()
                             for q in qs})
            qvals: dict[tuple, float] = {}
            if merged_sk and all_qs:
                res = (spark.createDataFrame(
                           list(merged_sk.items()), "k string, sk binary")
                       .select("k", *[
                           F.kll_sketch_get_quantile_double("sk", F.lit(q))
                           .alias(f"q{i}") for i, q in enumerate(all_qs)])
                       .collect())
                for r in res:
                    for i, q in enumerate(all_qs):
                        qvals[(r["k"], q)] = r[f"q{i}"]
            for did, key, k, sks in kll_pending:
                if sks:
                    ck = f"{did}\x00{key}"
                    merged_domains[did][key] = {
                        q: qvals.get((ck, float(q)))
                        for q in kll_need.get(ck, ())}
        return self._verdicts(merged_domains, deltas)

    # ------------------------------------------------------------- verdicts

    def _verdicts(self, merged_domains: dict,
                  deltas: list[dict]) -> ExpectationSuiteValidationResult:
        # a detached ValidationRun shim: the fused-EVR methods used below
        # (_map_evr / _between_evr / _agg_custom_evr / _drift_evr on explicit
        # partition_objects) are row-arithmetic only — no DataFrame touched
        vr = ValidationRun.__new__(ValidationRun)
        vr.rf = normalize_result_format(self.result_format)
        vr.rf.setdefault("unexpected_list_limit", UNEXPECTED_LIST_LIMIT)
        vr.partition_verdicts = []
        results = []
        for item in self._plan.schema_items:
            cid = config_id(item.config.expectation_type, item.kwargs)
            oks = [d["schema"].get(cid) for d in deltas]
            success = all(bool(o) for o in oks)
            results.append(ExpectationValidationResult(
                success=success, expectation_config=item.config,
                result={"details": {"per_snapshot_success": oks}}))
        for did, dp, items in self._domain_items():
            acc = merged_domains.get(did, {})
            stats = self._stat_exprs(items)
            inv_rows = {key: acc.get(key) for key in stats}

            for item in items:
                strat = self._strategy[id(item.config)]
                if strat in ("job_counts", "rowcount_vs_other"):
                    results.append(self._job_verdict(vr, item, strat, deltas))
                    continue
                inv = {a: k for k, a in dp.slot_table.keys.items()}
                row = {a: inv_rows.get(inv[a]) for a in inv
                       if inv[a] in inv_rows}
                results.append(self._item_verdict(vr, item, strat, row,
                                                  inv_rows, inv))
        return ExpectationSuiteValidationResult(
            success=all(r.success for r in results),
            results=results, statistics=build_statistics(results),
            meta={"expectation_suite_name":
                  self.suite.expectation_suite_name,
                  "incremental": {
                      "snapshots_merged": [d["snapshot_id"] for d in deltas],
                      "unsupported": self._unsupported}})

    def _job_verdict(self, vr, item: CompiledItem, strat: str,
                     deltas: list[dict]) -> ExpectationValidationResult:
        cid = config_id(item.config.expectation_type, item.kwargs)
        recs = [d.get("jobs", {}).get(cid) for d in deltas]
        if any(r is None for r in recs):
            missing = [d["snapshot_id"] for d, r in zip(deltas, recs)
                       if r is None]
            raise ValueError(
                f"snapshot(s) {missing} have no job counts for "
                f"{item.config.expectation_type} — they were validated by a "
                "checkpoint without frozen_reference; re-validate them")
        if strat == "rowcount_vs_other":
            others = {r["other"] for r in recs}
            if len(others) > 1:
                raise ValueError(
                    "the reference table's row count changed between deltas "
                    f"({sorted(others)}) — frozen_reference was violated; "
                    "incremental counts are stale, run a full validation")
            observed = sum(r["observed"] for r in recs)
            other = next(iter(others))
            return ExpectationValidationResult(
                success=observed == other, expectation_config=item.config,
                result={"observed_value": observed,
                        "details": {"other_table_row_count": other}})
        el = sum(r["el"] for r in recs)
        mi = sum(r["mi"] for r in recs)
        ux = sum(r["ux"] for r in recs)
        return vr._map_evr(item, el, el - mi, ux, [], None)

    def _item_verdict(self, vr, item: CompiledItem, strat: str, row: dict,
                      inv_rows: dict, inv: dict) -> ExpectationValidationResult:
        kw = item.kwargs
        if strat == "map":
            element = int(row[item.slots["element"]] or 0)
            nonnull = int(row[item.slots["nonnull"]] or 0)
            unexpected = int(row[item.slots["unexpected"]] or 0)
            # samples live with each delta's own validation, not the stats
            return vr._map_evr(item, element, nonnull, unexpected, [], None)
        if strat == "unique_approx":
            element = int(row[item.slots["element"]] or 0)
            nonnull = int(row[item.slots["nonnull"]] or 0)
            approx = int(inv_rows.get(
                "hllsk::" + inv[item.slots["approx_distinct"]]) or 0)
            rsd = float(kw.get("rsd", 0.05))
            est_dups = max(0, nonnull - approx)
            tolerated = 3.0 * rsd * max(nonnull, 1)
            suspect = est_dups > tolerated
            success = (not suspect) or mostly_success(
                element, nonnull, est_dups, kw.get("mostly", 1.0))
            result = format_map_output(vr.rf, bool(success), element, nonnull,
                                       est_dups if suspect else 0, [])
            result["details"] = {
                "strategy": "hll_prescreen_incremental",
                "approx_distinct": approx,
                "note": ("merged DataSketches HLL union across snapshots; "
                         "exact dup counts need one full-table pass"),
            }
            return ExpectationValidationResult(
                success=bool(success), expectation_config=item.config,
                result=result)
        if strat.startswith("agg:"):
            what = strat.split(":", 1)[1]
            c = kw["column"]
            if what == "mean":
                cnt = inv_rows.get(f"inc::cnt::{c}") or 0
                value = (inv_rows.get(f"inc::sum::{c}") / cnt) if cnt else None
            elif what == "stdev":
                cnt = inv_rows.get(f"inc::cnt::{c}") or 0
                s1 = inv_rows.get(f"inc::sum::{c}") or 0.0
                s2 = inv_rows.get(f"inc::sumsq::{c}") or 0.0
                value = (math.sqrt(max(0.0, (s2 - s1 * s1 / cnt) / (cnt - 1)))
                         if cnt >= 2 else None)
            elif what == "min":
                value = _maybe_temporal(inv_rows.get(f"inc::min::{c}"), kw)
            elif what == "max":
                value = _maybe_temporal(inv_rows.get(f"inc::max::{c}"), kw)
            elif what == "sum":
                value = inv_rows.get(f"inc::nsum::{c}")
            elif what == "hll":
                value = inv_rows.get(f"inc::hll::{c}")
            else:  # pragma: no cover
                raise ValueError(what)
            return vr._between_evr(item, value)
        if strat.startswith("kll:"):
            c = kw["column"]
            k = _kll_k_for(kw)
            qmap = inv_rows.get(f"inc::kll::{c}::{k}") or {}
            note = {"strategy": "kll_sketch_merge",
                    "kll_k": k,
                    "note": ("merged DataSketches KLL doubles sketches "
                             "across snapshots; observed quantiles are "
                             "within the sketch's normalized rank-error "
                             "bound of a full recompute")}
            if strat == "kll:median":
                evr = vr._between_evr(item, qmap.get(0.5))
                evr.result.setdefault("details", {}).update(note)
                return evr
            quantiles = [float(q) for q in item.info["quantiles"]]
            values = [qmap.get(q) for q in quantiles]
            ranges = kw["quantile_ranges"]["value_ranges"]
            successes = [bool(v is not None
                              and (lo is None or v >= lo)
                              and (hi is None or v <= hi))
                         for v, (lo, hi) in zip(values, ranges)]
            return ExpectationValidationResult(
                success=all(successes) and all(v is not None for v in values)
                and len(values) == len(ranges),
                expectation_config=item.config,
                result={"observed_value": {"quantiles": quantiles,
                                           "values": values},
                        "details": {"success_details": successes, **note}})
        if strat == "unique_proportion:hll":
            c = kw["column"]
            lg = _rsd_to_lg_config_k(float(kw.get("rsd", 0.05)))
            distinct = inv_rows.get(f"inc::hllp::{c}::{lg}")
            nonnull = int(inv_rows.get(f"inc::nncnt::{c}") or 0)
            value = (distinct / nonnull) if nonnull else None
            evr = vr._between_evr(item, value)
            evr.result.setdefault("details", {}).update({
                "strategy": "hll_union_incremental",
                "approx_distinct": distinct,
                "nonnull_count": nonnull,
                "note": ("proportion = merged DataSketches HLL distinct "
                         "estimate / summed nonnull count; distinct "
                         "standard error ≈ 1.04/sqrt(2^lgConfigK)")})
            return evr
        if strat in ("row_count", "distinct_set"):
            return vr._agg_custom_evr(item, row)
        if strat == "drift":
            if "values" in item.info:
                nonnull = float(row[item.slots["nonnull"]] or 0)
                seen = sum(float(row[a] or 0)
                           for a in item.info["bin_aliases"])
                if nonnull - seen > 0.5:
                    raise ValueError(
                        "categorical drift merge saw values outside the "
                        "expected set; resolving their mass needs per-value "
                        "counts — run a full validation for this check")
            item.info["dfd"] = None  # guard: merge path must never scan
            return vr._drift_evr(item, row)
        raise ValueError(strat)  # pragma: no cover


def _maybe_temporal(value, kw: dict):
    """_encode JSON-serializes a date/timestamp min/max fold as str(v); a
    merged verdict with parse_strings_as_datetimes=True would then compare
    str vs datetime bounds and raise TypeError (ADVICE r4). Decode the ISO
    string back when the expectation declares datetime semantics."""
    if isinstance(value, str) and kw.get("parse_strings_as_datetimes"):
        import datetime
        # str(date) is exactly 'YYYY-MM-DD'; decode it back to a date, not
        # a midnight datetime (datetime.fromisoformat also accepts
        # date-only strings, so it must not be tried first — a decoded
        # midnight datetime compared against a date bound raises TypeError
        # and diverges from full validation's observed_value rendering).
        parse = (datetime.date.fromisoformat if len(value) == 10
                 else datetime.datetime.fromisoformat)
        try:
            return parse(value)
        except ValueError:
            return value
    return value


def _encode(v, key: str, op: str):
    if v is None:
        return None
    if op in ("hll", "kll"):
        return {"b64": base64.b64encode(bytes(v)).decode()}
    if op == "set_union":
        return list(v)
    if isinstance(v, (bool, int, float, str)):
        return v
    # timestamps/dates from min/max fold fine as ISO strings
    return str(v)


def _decode(v):
    if isinstance(v, dict) and "b64" in v:
        return base64.b64decode(v["b64"])
    return v
