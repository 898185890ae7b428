"""RDP accountant for the subsampled Gaussian mechanism (DP-SGD).

Mirrors the privacy accounting behind Opacus's
``PrivacyEngine.make_private_with_epsilon`` (ref: base_train.py:337-348):
given a target (epsilon, delta), sample rate q and number of steps, find the
Gaussian noise multiplier sigma by bisection on the RDP bound.

The math is the standard Mironov/Abadi RDP analysis of the Poisson-subsampled
Gaussian mechanism (Mironov, "Renyi Differential Privacy", 2017; Mironov et
al., "RDP of the Sampled Gaussian Mechanism", 2019 — public literature, same
analysis Opacus implements):

  RDP of Gaussian with multiplier sigma at order a:  a / (2 sigma^2)
  Subsampled at rate q: computed via the log-binomial expansion for integer
  orders, with the standard stable log-sum-exp accumulation.
  Conversion to (eps, delta): eps = min_a [ rdp(a) + log1p(-1/a)
                                           - log(delta * a) / (a - 1) ]
"""
from __future__ import annotations

import math
from typing import Iterable, Optional, Sequence

DEFAULT_ORDERS = tuple([1 + x / 10.0 for x in range(1, 100)] + list(range(12, 64)))


def _log_comb(n: int, k: int) -> float:
    return (
        math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)
    )


def _rdp_subsampled_gaussian_int(q: float, sigma: float, alpha: int) -> float:
    """RDP at integer order alpha for the sampled Gaussian mechanism."""
    # log E[( (1-q) + q e^{(2j-1)/(2 sigma^2)} ) ] expansion:
    # A(alpha) = sum_j C(alpha, j) (1-q)^{alpha-j} q^j e^{j(j-1)/(2 sigma^2)}
    log_terms = []
    for j in range(alpha + 1):
        log_t = (
            _log_comb(alpha, j)
            + j * math.log(q)
            + (alpha - j) * math.log1p(-q)
            + (j * j - j) / (2.0 * sigma * sigma)
        )
        log_terms.append(log_t)
    m = max(log_terms)
    s = sum(math.exp(t - m) for t in log_terms)
    return (m + math.log(s)) / (alpha - 1)


def _rdp_subsampled_gaussian_frac(q: float, sigma: float, alpha: float) -> float:
    """Fractional orders by linear interpolation between integer neighbors
    (standard practice; conservative for this convex quantity)."""
    if alpha <= 2:
        # rdp is non-decreasing in alpha: rdp(2) upper-bounds (1, 2]
        return _rdp_subsampled_gaussian_int(q, sigma, 2)
    lo, hi = int(math.floor(alpha)), int(math.ceil(alpha))
    if lo == hi:
        return _rdp_subsampled_gaussian_int(q, sigma, lo)
    r_lo = _rdp_subsampled_gaussian_int(q, sigma, lo)
    r_hi = _rdp_subsampled_gaussian_int(q, sigma, hi)
    t = (alpha - lo) / (hi - lo)
    return r_lo + t * (r_hi - r_lo)


def compute_rdp(q: float, noise_multiplier: float, steps: int,
                orders: Sequence[float] = DEFAULT_ORDERS):
    """Total RDP over `steps` compositions at each order."""
    sigma = noise_multiplier
    if q == 0 or sigma == 0:
        return [float("inf")] * len(orders)
    out = []
    for a in orders:
        if q == 1.0:
            rdp = a / (2 * sigma * sigma)
        elif a <= 1:
            rdp = float("inf")
        else:
            rdp = _rdp_subsampled_gaussian_frac(q, sigma, a)
        out.append(rdp * steps)
    return out


def rdp_to_epsilon(rdp: Iterable[float], delta: float,
                   orders: Sequence[float] = DEFAULT_ORDERS) -> float:
    """Tightest (eps, delta) conversion over orders (Balle et al. 2020 form,
    as used by Opacus/TF-Privacy)."""
    best = float("inf")
    for a, r in zip(orders, rdp):
        if a <= 1 or math.isinf(r):
            continue
        eps = r + math.log1p(-1.0 / a) - (math.log(delta) + math.log(a)) / (a - 1)
        best = min(best, max(eps, 0.0))
    return best


def epsilon(q: float, noise_multiplier: float, steps: int, delta: float) -> float:
    return rdp_to_epsilon(compute_rdp(q, noise_multiplier, steps), delta)


def get_noise_multiplier(
    target_epsilon: float,
    target_delta: float,
    sample_rate: float,
    epochs: Optional[int] = None,
    steps: Optional[int] = None,
    precision: float = 0.01,
    max_sigma: float = 2000.0,
) -> float:
    """Bisection for sigma hitting target_epsilon — the Opacus
    ``get_noise_multiplier`` contract (ref usage: base_train.py:340-348 with
    delta = 1/len(train_dataloader), epochs=50)."""
    if steps is None:
        if epochs is None:
            raise ValueError("need epochs or steps")
        steps = int(math.ceil(epochs / sample_rate))
    lo, hi = 1e-3, 10.0
    while epsilon(sample_rate, hi, steps, target_delta) > target_epsilon:
        hi *= 2
        if hi > max_sigma:
            raise ValueError("cannot reach target epsilon")
    while hi - lo > precision:
        mid = (lo + hi) / 2
        if epsilon(sample_rate, mid, steps, target_delta) < target_epsilon:
            hi = mid
        else:
            lo = mid
    return hi
