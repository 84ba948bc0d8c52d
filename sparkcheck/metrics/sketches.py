"""Distribution-drift scoring over binned counts merged from the fused pass.

The fused aggregation emits per-bin conditional counts (planner._compile_drift)
— per partition when rollup mode is on, so these "sketches" merge by plain
addition. Scoring runs driver-side in numpy:

- KL divergence with tail/internal weight holdout, matching the reference
  expect_column_kl_divergence_to_be_less_than semantics
  (great_expectations/expectations/core/expect_column_kl_divergence_to_be_less_than.py:315-470;
  partition-object shape per execution_engine/util.py:21-196).
- KS statistic (max CDF gap on the shared binning) and PSI — our additions for
  the north-star drift checks (statistics, not p-values: scipy-free).
- chi-square statistic.
"""

from __future__ import annotations

import numpy as np


def _normalize(counts: np.ndarray, total: float) -> np.ndarray:
    if total <= 0:
        return np.zeros_like(counts, dtype=float)
    return counts.astype(float) / total


def kl_divergence(
    observed_counts: list[float],
    expected_weights: list[float],
    below_count: float = 0.0,
    above_count: float = 0.0,
    nonnull_count: float | None = None,
    tail_weight_holdout: float = 0.0,
    internal_weight_holdout: float = 0.0,
    categorical: bool = False,
) -> tuple[float, dict]:
    """KL(observed || expected) over the partition bins.

    Holdout semantics per the reference: ``tail_weight_holdout`` reserves
    expected mass for observations outside the bins (split evenly below/above);
    ``internal_weight_holdout`` is spread over expected-zero internal bins.
    Observed mass where expected (after holdout) is zero => +inf.
    """
    obs = np.asarray(observed_counts, dtype=float)
    exp = np.asarray(expected_weights, dtype=float)
    exp = exp / exp.sum() if exp.sum() > 0 else exp
    total = float(nonnull_count) if nonnull_count is not None else float(obs.sum() + below_count + above_count)
    po = _normalize(obs, total)
    po_below = below_count / total if total > 0 else 0.0
    po_above = above_count / total if total > 0 else 0.0

    pe = exp * (1.0 - tail_weight_holdout - internal_weight_holdout)
    zero_mask = pe == 0
    n_zero = int(zero_mask.sum())
    if internal_weight_holdout > 0 and n_zero:
        pe = pe + zero_mask * (internal_weight_holdout / n_zero)
    pe_tail = tail_weight_holdout / 2.0

    details = {
        "observed_weights": po.tolist(),
        "expected_weights": pe.tolist(),
        "observed_tail_weights": [po_below, po_above],
        "expected_tail_weights": [pe_tail, pe_tail],
    }

    def term(p: float, q: float) -> float:
        if p == 0:
            return 0.0
        if q == 0:
            return float("inf")
        return p * np.log(p / q)

    kl = sum(term(p, q) for p, q in zip(po, pe))
    if not categorical:
        kl += term(po_below, pe_tail) + term(po_above, pe_tail)
    elif po_below or po_above:
        kl = float("inf")
    return float(kl), details


def ks_statistic(observed_counts: list[float], expected_weights: list[float]) -> float:
    """Max |CDF_obs - CDF_exp| over the shared binning (two-sample KS on the
    binned sketch; the reference's scipy KS is pandas-only and suppressed for
    Spark — this is our distributed-friendly equivalent)."""
    obs = np.asarray(observed_counts, dtype=float)
    exp = np.asarray(expected_weights, dtype=float)
    po = obs / obs.sum() if obs.sum() > 0 else obs
    pe = exp / exp.sum() if exp.sum() > 0 else exp
    return float(np.max(np.abs(np.cumsum(po) - np.cumsum(pe)))) if len(po) else 0.0


def psi(observed_counts: list[float], expected_weights: list[float], eps: float = 1e-6) -> float:
    """Population Stability Index with epsilon clamping on empty bins."""
    obs = np.asarray(observed_counts, dtype=float)
    exp = np.asarray(expected_weights, dtype=float)
    po = np.clip(obs / obs.sum() if obs.sum() > 0 else obs, eps, None)
    pe = np.clip(exp / exp.sum() if exp.sum() > 0 else exp, eps, None)
    po, pe = po / po.sum(), pe / pe.sum()
    return float(np.sum((po - pe) * np.log(po / pe)))


def chisquare_statistic(observed_counts: list[float], expected_weights: list[float]) -> float:
    obs = np.asarray(observed_counts, dtype=float)
    exp = np.asarray(expected_weights, dtype=float)
    n = obs.sum()
    pe = exp / exp.sum() if exp.sum() > 0 else exp
    expected_counts = pe * n
    mask = expected_counts > 0
    if not mask.any():
        return float("inf") if n > 0 else 0.0
    return float(np.sum((obs[mask] - expected_counts[mask]) ** 2 / expected_counts[mask]))


def build_partition_from_edges(edges: list[float], counts: list[float]) -> dict:
    """Continuous partition object ({bins, weights}) from histogram counts —
    same JSON shape the reference validates in execution_engine/util.py:48-78."""
    total = float(sum(counts))
    weights = [c / total if total else 0.0 for c in counts]
    return {"bins": [float(e) for e in edges], "weights": weights}


def build_categorical_partition(values: list, counts: list[float]) -> dict:
    total = float(sum(counts))
    return {"values": list(values), "weights": [c / total if total else 0.0 for c in counts]}
