"""Reference-profile builder + profile-driven suite generation.

Plays the role of the reference's UserConfigurableProfiler
(great_expectations/profile/user_configurable_profiler.py:34+): compute a
column profile from a *clean* snapshot once (ONE fused aggregation pass), store
it as JSON, and score later runs against it (bounds + distribution drift).

The profile JSON carries, per numeric column: count/nulls/min/max/mean/stddev,
exact-interpolated quantiles, and a continuous partition object
({bins, weights} — the same shape the reference validates in
execution_engine/util.py:48-78); per low-cardinality string column: a
categorical partition object ({values, weights}).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .types import ExpectationSuite

_NUMERIC = (T.IntegerType, T.LongType, T.ShortType, T.ByteType,
            T.FloatType, T.DoubleType, T.DecimalType)

DEFAULT_QUANTILES = [0.05, 0.25, 0.5, 0.75, 0.95]


def build_reference_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    n_bins: int = 10,
    max_categories: int = 64,
    quantiles: list[float] | None = None,
    exact: bool = False,
) -> dict:
    """ONE fused agg pass for stats + quantiles, a second for histogram bins
    (bin edges depend on pass-1 quantiles), plus one tiny groupBy per
    categorical column.

    Quantiles default to percentile_approx (bounded-memory sketch, exact
    below ~10^4 rows per partition), mirroring the engine's plan-gated
    quantile path: the profile builder runs on the "clean snapshot", which
    may be the FULL table, and exact F.percentile buffers every value of
    every numeric column in one aggregation — a memory hazard at 10^12
    rows. Pass ``exact=True`` to opt back into sort-based exact
    interpolated percentiles (documented memory bound)."""
    qs = DEFAULT_QUANTILES if quantiles is None else quantiles
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or list(fields)

    exprs = [F.count(F.lit(1)).alias("__rows")]
    numeric_cols, string_cols = [], []
    for c in cols:
        dt = fields[c]
        exprs.append(F.coalesce(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)).alias(f"{c}__nulls"))
        if isinstance(dt, _NUMERIC):
            numeric_cols.append(c)
            exprs += [
                F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max"),
                F.avg(c).alias(f"{c}__mean"), F.stddev_samp(c).alias(f"{c}__std"),
            ]
            if qs:
                qarr = F.array(*[F.lit(q) for q in qs])
                exprs.append(
                    (F.percentile(F.col(c), qarr) if exact
                     else F.percentile_approx(F.col(c), qarr, F.lit(10_000))
                     ).alias(f"{c}__q"))
        elif isinstance(dt, T.StringType):
            string_cols.append(c)
            exprs.append(F.approx_count_distinct(c).alias(f"{c}__approx_distinct"))
    row = df.agg(*exprs).first().asDict()

    profile: dict[str, Any] = {"row_count": int(row["__rows"]), "columns": {}}

    # pass 2: histograms on quantile-derived bins (equi-depth-ish edges)
    hist_exprs = []
    edges_by_col: dict[str, list[float]] = {}
    for c in numeric_cols:
        lo, hi = row[f"{c}__min"], row[f"{c}__max"]
        if lo is None or hi is None or float(lo) == float(hi):
            continue
        lo, hi = float(lo), float(hi)
        width = (hi - lo) / n_bins
        edges = [lo + i * width for i in range(n_bins)] + [hi]
        edges_by_col[c] = edges
        for i in range(n_bins):
            cond = (F.col(c) >= edges[i]) & (
                (F.col(c) <= edges[i + 1]) if i == n_bins - 1 else (F.col(c) < edges[i + 1]))
            hist_exprs.append(
                F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).alias(f"{c}__h{i}"))
    hrow = df.agg(*hist_exprs).first().asDict() if hist_exprs else {}

    for c in numeric_cols:
        qvals = row.get(f"{c}__q") if qs else None
        entry: dict[str, Any] = {
            "type": "numeric",
            "null_count": int(row[f"{c}__nulls"]),
            "min": _f(row.get(f"{c}__min")), "max": _f(row.get(f"{c}__max")),
            "mean": _f(row.get(f"{c}__mean")), "stddev": _f(row.get(f"{c}__std")),
            "quantiles": {"q": qs, "values": [_f(v) for v in (qvals or [])]},
        }
        if c in edges_by_col:
            counts = [int(hrow[f"{c}__h{i}"]) for i in range(n_bins)]
            total = sum(counts)
            entry["partition_object"] = {
                "bins": edges_by_col[c],
                "weights": [cnt / total if total else 0.0 for cnt in counts],
            }
        profile["columns"][c] = entry

    for c in string_cols:
        entry = {"type": "string", "null_count": int(row[f"{c}__nulls"]),
                 "approx_distinct": int(row[f"{c}__approx_distinct"])}
        if entry["approx_distinct"] <= max_categories:
            vc = (df.filter(F.col(c).isNotNull()).groupBy(c)
                  .agg(F.count(F.lit(1)).alias("n")).orderBy(c).collect())
            total = sum(r["n"] for r in vc)
            entry["partition_object"] = {
                "values": [r[c] for r in vc],
                "weights": [r["n"] / total if total else 0.0 for r in vc],
            }
        profile["columns"][c] = entry

    return profile


def _f(v: Any) -> float | None:
    return None if v is None else float(v)


def suite_from_profile(
    profile: dict,
    *,
    name: str = "profile_suite",
    drift_threshold: float = 0.1,
    bounds_slack: float = 0.10,
    not_null_columns: list[str] | None = None,
) -> ExpectationSuite:
    """Generate a drift/bounds suite scoring a new snapshot against the stored
    reference profile (north_star: KS/PSI/KL vs a reference profile)."""
    suite = ExpectationSuite(name)
    for c in (not_null_columns or []):
        suite.add("expect_column_values_to_not_be_null", column=c)
    for c, p in profile["columns"].items():
        if p["type"] == "numeric" and p.get("mean") is not None:
            lo = p["mean"] - bounds_slack * max(abs(p["mean"]), 1.0)
            hi = p["mean"] + bounds_slack * max(abs(p["mean"]), 1.0)
            suite.add("expect_column_mean_to_be_between", column=c, min_value=lo, max_value=hi)
        if p.get("partition_object"):
            suite.add(
                "expect_column_kl_divergence_to_be_less_than",
                column=c, partition_object=p["partition_object"],
                threshold=drift_threshold, tail_weight_holdout=1e-5,
                internal_weight_holdout=1e-5)
            suite.add(
                "expect_column_psi_to_be_less_than",
                column=c, partition_object=p["partition_object"], threshold=drift_threshold)
    return suite


def save_profile(profile: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(profile, f, indent=2)


def load_profile(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
