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


def entropy_kl(pk, qk) -> float:
    """KL(pk || qk) with scipy.stats.entropy semantics: BOTH vectors are
    normalized to sum to 1 first; observed mass where expected is zero => inf;
    degenerate inputs => nan."""
    pk = np.asarray(pk, dtype=float)
    qk = np.asarray(qk, dtype=float)
    sp, sq = pk.sum(), qk.sum()
    if sp <= 0 or sq <= 0:
        return float("nan")
    p, q = pk / sp, qk / sq
    total = 0.0
    for pi, qi in zip(p, q):
        if pi == 0:
            continue
        if qi == 0:
            return float("inf")
        total += pi * np.log(pi / qi)
    return float(total)


def kl_divergence(
    observed_counts: list[float],
    expected_weights: list[float],
    below_count: float = 0.0,
    above_count: float = 0.0,
    nonnull_count: float | None = None,
    tail_weight_holdout: float = 0.0,
    internal_weight_holdout: float = 0.0,
    bins: list[float] | None = None,
    expected_tail_weights: list[float] | None = None,
) -> tuple[float, dict]:
    """Continuous-partition KL(observed || expected), matching the reference
    branch-for-branch (expect_column_kl_divergence_to_be_less_than.py:468-630):

    - ``scipy.stats.entropy`` semantics (both vectors normalized),
    - partition ``tail_weights`` OR ``tail_weight_holdout`` (mutually
      exclusive, enforced by the caller),
    - +/-inf bin endpoints: the edge weights ARE the tail weights; holdout is
      rejected for double-infinite partitions and assigned to the open side
      for single-infinite ones,
    - ``internal_weight_holdout`` spread over expected-zero internal bins.
    """
    obs = np.asarray(observed_counts, dtype=float)
    total = float(nonnull_count) if nonnull_count is not None else float(
        obs.sum() + below_count + above_count)
    observed = _normalize(obs, total)
    below_w = below_count / total if total > 0 else 0.0
    above_w = above_count / total if total > 0 else 0.0

    expected = np.asarray(expected_weights, dtype=float) * (
        1.0 - tail_weight_holdout - internal_weight_holdout)
    if internal_weight_holdout > 0:
        zero_mask = expected == 0
        n_zero = int(zero_mask.sum())
        if n_zero:
            expected = expected + zero_mask * (internal_weight_holdout / n_zero)

    bins = list(bins) if bins is not None else []
    neg_inf = bool(bins) and bins[0] == float("-inf")
    pos_inf = bool(bins) and bins[-1] == float("inf")

    if neg_inf and pos_inf:
        comb_exp = expected
        exp_tails = [float(expected[0]), float(expected[-1])]
        exp_main = expected[1:-1]
        comb_obs = observed
        obs_tails = [float(observed[0]), float(observed[-1])]
        obs_main = observed[1:-1]
    elif neg_inf:
        comb_exp = np.concatenate((expected, [tail_weight_holdout]))
        exp_tails = [float(expected[0]), tail_weight_holdout]
        exp_main = expected[1:]
        comb_obs = np.concatenate((observed, [above_w]))
        obs_tails = [float(observed[0]), above_w]
        obs_main = observed[1:]
    elif pos_inf:
        comb_exp = np.concatenate(([tail_weight_holdout], expected))
        exp_tails = [tail_weight_holdout, float(expected[-1])]
        exp_main = expected[:-1]
        comb_obs = np.concatenate(([below_w], observed))
        obs_tails = [below_w, float(observed[-1])]
        obs_main = observed[:-1]
    else:
        if expected_tail_weights is not None:
            comb_exp = np.concatenate(
                ([expected_tail_weights[0]], expected, [expected_tail_weights[1]]))
            exp_tails = [float(expected_tail_weights[0]), float(expected_tail_weights[1])]
        else:
            comb_exp = np.concatenate(
                ([tail_weight_holdout / 2], expected, [tail_weight_holdout / 2]))
            exp_tails = [tail_weight_holdout / 2, tail_weight_holdout / 2]
        exp_main = expected
        comb_obs = np.concatenate(([below_w], observed, [above_w]))
        obs_tails = [below_w, above_w]
        obs_main = observed

    kl = entropy_kl(comb_obs, comb_exp)
    details = {
        "observed_weights": np.asarray(obs_main, dtype=float).tolist(),
        "expected_weights": np.asarray(exp_main, dtype=float).tolist(),
        "observed_tail_weights": [float(x) for x in obs_tails],
        "expected_tail_weights": [float(x) for x in exp_tails],
    }
    return kl, details


def kl_divergence_categorical(
    observed_counts: dict,
    nonnull_count: float,
    values: list,
    weights: list[float],
    tail_weight_holdout: float = 0.0,
) -> tuple[float, dict]:
    """Categorical KL matching the reference (same file, :391-447): outer
    union of observed and expected values; values we expected but never saw
    count as observed 0; values we saw but did not expect receive
    tail_weight_holdout / n_unexpected expected mass each (scaling the
    declared weights by 1 - holdout); scipy-entropy normalization."""
    expected = {v: float(w) for v, w in zip(values, weights)}
    union = list(expected)
    for v in observed_counts:
        if v not in expected:
            union.append(v)
    n_unexpected = sum(1 for v in union if v not in expected)
    pk, qk = [], []
    for v in union:
        pk.append(observed_counts.get(v, 0.0) / nonnull_count if nonnull_count else 0.0)
        if v in expected:
            qk.append(expected[v] * ((1 - tail_weight_holdout) if n_unexpected else 1.0))
        else:
            qk.append(tail_weight_holdout / n_unexpected if n_unexpected else 0.0)
    kl = entropy_kl(pk, qk)
    details = {
        "observed_partition": {"values": union, "weights": pk},
        "expected_partition": {"values": union, "weights": qk},
    }
    return kl, details


def kl_divergence_categorical_scalars(
    observed_expected_counts: dict,
    nonnull_count: float,
    values: list,
    weights: list[float],
    tail_weight_holdout: float,
    n_unexpected: int,
    unexpected_total: float,
    unexpected_clogc: float,
) -> float:
    """Exact categorical KL when the out-of-set values are summarized by
    three scalars instead of materialized per-value: their distinct count
    n_unexpected, total count, and sum of c*ln(c). Works because every
    out-of-set value gets the SAME expected mass (tail_weight_holdout /
    n_unexpected), so their KL contribution
        sum_i p_i ln(p_i / q)  =  (L - T ln(nn*sp)) / (nn*sp) - (T/(nn*sp)) ln q
    depends only on (T = sum c_i, L = sum c_i ln c_i) — both computable
    JVM-side with one aggregate, keeping driver memory flat at any
    cardinality. Matches kl_divergence_categorical bit-for-bit (same
    scipy-entropy normalization)."""
    import math
    expected = {v: float(w) for v, w in zip(values, weights)}
    th = float(tail_weight_holdout)
    seen_mass = sum(observed_expected_counts.get(v, 0.0) for v in expected)
    if nonnull_count <= 0:
        return float("nan")
    sp = (seen_mass + unexpected_total) / nonnull_count
    w_sum = sum(expected.values())
    sq = w_sum * (1.0 - th) + th if n_unexpected else w_sum
    if sp <= 0 or sq <= 0:
        return float("nan")
    total = 0.0
    for v in expected:
        c = observed_expected_counts.get(v, 0.0)
        if c == 0:
            continue
        p = c / nonnull_count / sp
        q = expected[v] * ((1.0 - th) if n_unexpected else 1.0) / sq
        if q == 0:
            return float("inf")
        total += p * math.log(p / q)
    if n_unexpected and unexpected_total > 0:
        if th == 0:
            return float("inf")  # observed mass where expected is zero
        nnsp = nonnull_count * sp
        q = (th / n_unexpected) / sq
        total += (unexpected_clogc - unexpected_total * math.log(nnsp)) / nnsp
        total -= (unexpected_total / nnsp) * math.log(q)
    return float(total)


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


# ---------------------------------------------------------------- p-values
# scipy is not available in this container; the tail probabilities below are
# standard textbook algorithms (regularized incomplete gamma via series /
# continued fraction; Kolmogorov asymptotic series) in pure python/numpy.


def _gammainc_upper_reg(s: float, x: float, max_iter: int = 200, eps: float = 1e-12) -> float:
    """Regularized upper incomplete gamma Q(s, x) = Gamma(s,x)/Gamma(s)."""
    import math
    if x < 0 or s <= 0:
        return float("nan")
    if x == 0:
        return 1.0
    lg = math.lgamma(s)
    if x < s + 1.0:
        # lower series P(s,x), return 1 - P
        term = 1.0 / s
        total = term
        a = s
        for _ in range(max_iter):
            a += 1.0
            term *= x / a
            total += term
            if abs(term) < abs(total) * eps:
                break
        p = total * math.exp(-x + s * math.log(x) - lg)
        return max(0.0, min(1.0, 1.0 - p))
    # continued fraction for Q (modified Lentz)
    tiny = 1e-300
    b = x + 1.0 - s
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, max_iter + 1):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    q = h * math.exp(-x + s * math.log(x) - lg)
    return max(0.0, min(1.0, q))


def chisquare_p_value(observed_counts: list[float], expected_weights: list[float]) -> tuple[float, dict]:
    """Chi-square goodness-of-fit p-value on the binned counts.
    dof = (#bins with expected mass) - 1."""
    stat = chisquare_statistic(observed_counts, expected_weights)
    exp = np.asarray(expected_weights, dtype=float)
    dof = max(1, int((exp > 0).sum()) - 1)
    if not np.isfinite(stat):
        return 0.0, {"chi2_statistic": stat, "dof": dof}
    p = _gammainc_upper_reg(dof / 2.0, stat / 2.0)
    return float(p), {"chi2_statistic": float(stat), "dof": dof}


def kolmogorov_sf(lam: float) -> float:
    """Q_KS(lambda) = 2 * sum_{j>=1} (-1)^{j-1} exp(-2 j^2 lambda^2)."""
    if lam <= 0:
        return 1.0
    total = 0.0
    for j in range(1, 101):
        term = 2.0 * (-1.0) ** (j - 1) * np.exp(-2.0 * j * j * lam * lam)
        total += term
        if abs(term) < 1e-12:
            break
    return float(min(1.0, max(0.0, total)))


def ks_p_value(ks: float, n: float) -> float:
    """Asymptotic one-sample KS p-value with the small-n correction
    lambda = (sqrt(n) + 0.12 + 0.11/sqrt(n)) * D. The reference bootstraps
    scipy KS on raw samples (pandas-only); ours scores the binned sketch CDF —
    distributed-friendly at 10^12 rows."""
    if n <= 0:
        return 1.0
    en = float(np.sqrt(n))
    return kolmogorov_sf((en + 0.12 + 0.11 / en) * ks)


def ks_cdf_exact(n: int, d: float) -> float:
    """Exact P(D_n < d) for the one-sample two-sided KS statistic —
    Marsaglia–Tsang–Wang, "Evaluating Kolmogorov's Distribution" (JSS 2003):
    P = (n!/n^n) * (H^n)[k-1,k-1] for an (2k-1)-square band matrix H, with
    k = ceil(n d), h = k - n d. Scipy-free; used for the small-n bootstrap
    resamples where the asymptotic formula is badly biased."""
    if d <= 0:
        return 0.0
    if d >= 1:
        return 1.0
    k = int(np.ceil(n * d))
    h = k - n * d
    m = 2 * k - 1
    H = np.zeros((m, m))
    for i in range(m):
        for j in range(m):
            if i - j + 1 >= 0:
                H[i, j] = 1.0
    for i in range(m):
        H[i, 0] -= h ** (i + 1)
        H[m - 1, i] -= h ** (m - i)
    if 2 * h - 1 > 0:
        H[m - 1, 0] += (2 * h - 1) ** m
    import math
    for i in range(m):
        for j in range(m):
            if i - j + 1 > 0:
                H[i, j] /= float(math.factorial(i - j + 1))
    # iterated multiply with rescaling (exponent carried separately)
    Hn = np.eye(m)
    e_q = 0
    for _ in range(n):
        Hn = Hn @ H
        if Hn[k - 1, k - 1] > 1e140:
            Hn *= 1e-140
            e_q += 140
    t = Hn[k - 1, k - 1]
    # multiply by n!/n^n incrementally to stay in range
    for i in range(1, n + 1):
        t *= i / n
        if t < 1e-140 and e_q > 0:
            t *= 1e140
            e_q -= 140
    return float(min(1.0, max(0.0, t * 10.0 ** e_q)))


def ks_p_value_small_n(d: float, n: int) -> float:
    """One-sample two-sided KS p-value: exact (MTW) for n <= 50, asymptotic
    beyond — mirroring scipy.stats.kstest's mode='auto' switch."""
    if n <= 50:
        return 1.0 - ks_cdf_exact(n, d)
    return ks_p_value(d, n)


def bootstrap_ks_test(pool: np.ndarray, bins: list[float],
                      weights: list[float], *, p: float = 0.05,
                      bootstrap_samples: int = 1000,
                      bootstrap_sample_size: int | None = None,
                      seed: int = 42) -> tuple[float, dict]:
    """Reference-faithful bootstrapped KS
    (column_bootstrapped_ks_test_p_value.py:44-96): draw
    `bootstrap_samples` resamples of `bootstrap_sample_size` raw values
    (default 2x the number of partition weights) from the pool, KS-test each
    against the partition's interpolated CDF, and report
    (1 + #{p_i >= p}) / (samples + 1). Differences from the reference, by
    design: seeded RNG (deterministic verdicts) and the pool is a bounded
    uniform sample of the column, not the whole column (driver memory flat
    at any scale; the bootstrap only ever touches samples*size draws)."""
    test_cdf = np.append([0.0], np.cumsum(weights))
    size = bootstrap_sample_size or len(weights) * 2
    rng = np.random.default_rng(seed)
    hits = 0
    for _ in range(bootstrap_samples):
        s = np.sort(rng.choice(pool, size=size))
        cdf_vals = np.interp(s, bins, test_cdf)
        dplus = float(np.max(np.arange(1, size + 1) / size - cdf_vals))
        dminus = float(np.max(cdf_vals - np.arange(0, size) / size))
        d = max(dplus, dminus)
        if ks_p_value_small_n(d, size) >= p:
            hits += 1
    value = (1 + hits) / (bootstrap_samples + 1)
    return value, {"method": "bootstrapped_raw_sample",
                   "bootstrap_samples": bootstrap_samples,
                   "bootstrap_sample_size": size, "p": p,
                   "pool_size": int(len(pool)), "seed": seed}


def distribution_cdf(dist: str, params: dict, x: float) -> float:
    """CDF of a named distribution (norm/uniform/expon) at x — scipy-free."""
    import math
    if dist in ("norm", "normal"):
        m = float(params.get("mean", params.get("loc", 0.0)))
        sd = float(params.get("std_dev", params.get("scale", 1.0)))
        if sd <= 0:
            return 0.0 if x < m else 1.0
        return 0.5 * (1.0 + math.erf((x - m) / (sd * math.sqrt(2.0))))
    if dist == "uniform":
        lo = float(params.get("min_value", params.get("loc", 0.0)))
        scale = params.get("scale")
        hi = float(params["max_value"]) if "max_value" in params else lo + float(scale or 1.0)
        if x <= lo:
            return 0.0
        if x >= hi:
            return 1.0
        return (x - lo) / (hi - lo)
    if dist in ("expon", "exponential"):
        loc = float(params.get("loc", 0.0))
        scale = float(params.get("scale", 1.0))
        if x <= loc:
            return 0.0
        return 1.0 - math.exp(-(x - loc) / scale)
    raise ValueError(f"unsupported distribution: {dist}")


def distribution_bin_weights(dist: str, params: dict, bins: list[float]) -> tuple[list[float], float, float]:
    """Expected per-bin mass + below/above tail mass of a named distribution
    on the given bin edges (for parameterized-distribution KS on sketches)."""
    cdfs = [distribution_cdf(dist, params, b) for b in bins]
    weights = [max(0.0, cdfs[i + 1] - cdfs[i]) for i in range(len(bins) - 1)]
    return weights, cdfs[0], 1.0 - cdfs[-1]


def build_partition_from_edges(edges: list[float], counts: list[float]) -> dict:
    """Continuous partition object ({bins, weights}) from histogram counts —
    same JSON shape the reference validates in execution_engine/util.py:48-78."""
    total = float(sum(counts))
    weights = [c / total if total else 0.0 for c in counts]
    return {"bins": [float(e) for e in edges], "weights": weights}


def build_categorical_partition(values: list, counts: list[float]) -> dict:
    total = float(sum(counts))
    return {"values": list(values), "weights": [c / total if total else 0.0 for c in counts]}
