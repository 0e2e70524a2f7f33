"""Distribution-drift test statistics (chi-square, two-sample KS) over histograms.

Implemented from the standard public formulas (no scipy in this environment):
- regularized incomplete gamma via series / continued fraction (textbook
  algorithms) for the chi-square survival function,
- asymptotic Kolmogorov distribution for the two-sample KS p-value.

These power the drift stage (SURVEY.md §7.1 item 6): per-source observed
histograms vs reference histograms held in actor-pool state.
"""

from __future__ import annotations

import math

import numpy as np


# --------------------------------------------------------------------------- gamma

def _gammainc_upper_reg(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) = Γ(a,x)/Γ(a)."""
    if x < 0 or a <= 0:
        return float("nan")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        # lower series: P(a,x), return 1-P
        ap = a
        summ = 1.0 / a
        delta = summ
        for _ in range(500):
            ap += 1.0
            delta *= x / ap
            summ += delta
            if abs(delta) < abs(summ) * 1e-15:
                break
        p = summ * math.exp(-x + a * math.log(x) - math.lgamma(a))
        return max(0.0, 1.0 - p)
    # continued fraction for Q directly
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def chi2_sf(stat: float, dof: int) -> float:
    """Chi-square survival function P(X >= stat)."""
    if dof <= 0:
        return float("nan")
    return float(_gammainc_upper_reg(dof / 2.0, stat / 2.0))


# --------------------------------------------------------------------------- chi-square

def chi2_two_sample(obs: np.ndarray, ref: np.ndarray, min_expected: float = 5.0):
    """Two-sample chi-square homogeneity test over aligned histogram counts.

    Bins with a combined expected count below ``min_expected`` are pooled into
    their neighbor (standard practice to keep the chi-square approximation
    valid). Returns ``(stat, dof, pvalue)``.
    """
    obs = np.asarray(obs, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    n1, n2 = obs.sum(), ref.sum()
    if n1 == 0 or n2 == 0:
        return 0.0, 0, 1.0
    # pool sparse bins left-to-right
    pooled: list[tuple[float, float]] = []
    acc_o = acc_r = 0.0
    for o, r in zip(obs, ref):
        acc_o += o
        acc_r += r
        if acc_o + acc_r >= min_expected * 2:
            pooled.append((acc_o, acc_r))
            acc_o = acc_r = 0.0
    if acc_o or acc_r:
        if pooled:
            lo, lr = pooled[-1]
            pooled[-1] = (lo + acc_o, lr + acc_r)
        else:
            pooled.append((acc_o, acc_r))
    if len(pooled) < 2:
        return 0.0, 0, 1.0
    po = np.array([p[0] for p in pooled])
    pr = np.array([p[1] for p in pooled])
    tot = po + pr
    # expected under homogeneity
    e1 = tot * (n1 / (n1 + n2))
    e2 = tot * (n2 / (n1 + n2))
    with np.errstate(divide="ignore", invalid="ignore"):
        stat = float(np.nansum((po - e1) ** 2 / e1) + np.nansum((pr - e2) ** 2 / e2))
    dof = len(pooled) - 1
    return stat, dof, chi2_sf(stat, dof)


# --------------------------------------------------------------------------- KS

def _kolmogorov_sf(lam: float) -> float:
    """Asymptotic Kolmogorov distribution survival Q(λ) = 2 Σ (-1)^{k-1} e^{-2k²λ²}."""
    if lam <= 0:
        return 1.0
    s = 0.0
    for k in range(1, 101):
        term = 2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        s += term
        if abs(term) < 1e-12:
            break
    return min(max(s, 0.0), 1.0)


def ks_two_sample_from_hist(obs: np.ndarray, ref: np.ndarray):
    """Two-sample KS test from aligned histogram counts → ``(D, pvalue)``.

    D is the max absolute difference of the two empirical CDFs evaluated at
    bin edges (a lower bound on the exact sample KS statistic, standard for
    binned drift detection).
    """
    obs = np.asarray(obs, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    n, m = obs.sum(), ref.sum()
    if n == 0 or m == 0:
        return 0.0, 1.0
    c1 = np.cumsum(obs) / n
    c2 = np.cumsum(ref) / m
    d = float(np.max(np.abs(c1 - c2)))
    ne = n * m / (n + m)
    lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
    return d, _kolmogorov_sf(lam)
