"""The reference README's workflows, ported to kde_tpu -- these are also the
five BASELINE.json benchmark configurations.

Run: python examples/readme_examples.py
(plotting is out of scope, as in the reference, which splits it into
KernelDensityEstimatePlotting.jl; each example prints summary statistics).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kde_tpu import (get_kde_max, kde, prod_appx_ms_gibbs, resample,
                     sample, set_seed)


def example_1d_lcv(n=100):
    """Basic 1-D: LOOCV fit of a bimodal sample + fixed-bw fit + resample
    (reference README.md:36-38)."""
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(size=n // 2),
                        10.0 + 2.0 * rng.normal(size=n // 2)])
    p100 = kde(x)                      # LOOCV bandwidth
    p2 = kde(np.array([0.0, 10.0]), [1.0])
    p75 = resample(p2, 75)
    print(f"1D LCV: bw={float(p100.get_bw()[0, 0]):.4f}, "
          f"resampled Npts={p75.npts}")
    return p100, p2, p75


def example_multidim_marginals():
    """3-D LOOCV fit + chained marginals (reference README.md:46-51)."""
    rng = np.random.default_rng(1)
    pd2 = kde(rng.normal(size=(3, 100)))
    pm12 = pd2.marginal([0, 1])
    pm2 = pm12.marginal([1])
    print(f"3D fit bws={np.round(np.asarray(pd2.get_bw()[:, 0]), 4)}, "
          f"marginal dims={pm2.ndim}")
    return pd2, pm12, pm2


def example_2d_product(n=100, mcmc=5):
    """2-D Gibbs product of two 100-component KDEs
    (reference README.md:53-61)."""
    rng = np.random.default_rng(2)
    p = kde(rng.normal(size=(2, n)))
    q = kde(2.0 + rng.normal(size=(2, n)))
    pgm, _ = prod_appx_ms_gibbs(n, [p, q], n_iter=mcmc)
    pq = kde(np.asarray(pgm))
    pq1 = pq.marginal([0])
    print(f"2D product: mean={np.round(np.asarray(pgm).mean(axis=1), 3)} "
          f"(expect ~[1, 1])")
    return p, q, pq, pq1


def example_beta_rayleigh(n_beta=300, n_ray=100):
    """Non-Gaussian 1-D product: Beta(1, 0.45) x (Rayleigh(0.5) - 0.5)
    (reference README.md:74-80)."""
    rng = np.random.default_rng(3)
    beta = rng.beta(1.0, 0.45, size=n_beta)
    rayl = rng.rayleigh(0.5, size=n_ray) - 0.5
    p = kde(beta)
    q = kde(rayl)
    pgm, _ = prod_appx_ms_gibbs(100, [p, q], n_iter=5)
    pq = kde(np.asarray(pgm))
    print(f"Beta x Rayleigh product: mode~{get_kde_max(pq)[0]:.3f}, "
          f"mean={float(np.asarray(pgm).mean()):.3f}")
    return p, q, pq


def example_4d_multimodal(n=200):
    """4-D multimodal product with marginals over dims 2:4
    (reference README.md:85-97)."""
    rng = np.random.default_rng(4)
    pts = np.vstack([
        2 * rng.normal(size=(1, n)) + 3,
        np.concatenate([2 * rng.normal(size=n // 2) + 3.0,
                        2 * rng.normal(size=n // 2) - 3.0])[None, :],
        2 * rng.normal(size=(2, n)) + 3,
    ])
    p = kde(rng.normal(size=(4, 100)))
    q = kde(pts)
    pq = p * q
    pq_234 = pq.marginal([1, 2, 3])
    print(f"4D product: Npts={pq.npts}, marginal(2:4) dims={pq_234.ndim}, "
          f"mean={np.round(np.asarray(pq.get_points()).mean(axis=1), 2)}")
    return p, q, pq


if __name__ == "__main__":
    set_seed(0)
    example_1d_lcv()
    example_multidim_marginals()
    example_2d_product()
    example_beta_rayleigh()
    example_4d_multimodal()
