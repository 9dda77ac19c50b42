"""API-compatibility surface: names/semantics mirroring the reference's
export list (reference src/KernelDensityEstimate.jl:13-51)."""
import numpy as np
import jax.numpy as jnp

import kde_tpu
from kde_tpu import (evaluate_dual_tree, kde, ksize, nloo_ll)
from kde_tpu.utils.debug import print_ball_tree, print_chain_state


def test_export_surface():
    for name in ["kde", "KDE", "evaluate_dual_tree", "eval_avg_logl",
                 "entropy", "kld", "minkld", "inters_intg_appx_is",
                 "get_kde_range", "get_kde_max", "get_kde_mean", "get_kde_fit",
                 "sample", "rand_kde", "resample", "marginal" if False else
                 "prod_appx_ms_gibbs", "product", "to_string", "from_string",
                 "set_force_eval_direct", "ksize", "nloo_ll",
                 "FlatBallTree", "build_balltree"]:
        assert hasattr(kde_tpu, name), name


def test_evaluate_dual_tree_alias():
    rng = np.random.default_rng(0)
    p = kde(rng.normal(size=(2, 30)), [0.4])
    q = kde(rng.normal(size=(2, 10)), [0.4])
    # KDE-as-positions variant
    a = np.asarray(evaluate_dual_tree(p, q))
    b = np.asarray(p.evaluate(q.get_points()))
    np.testing.assert_allclose(a, b, rtol=1e-12)
    # self -> LOO
    c = np.asarray(evaluate_dual_tree(p, p))
    d = np.asarray(p.evaluate(None, lv_flag=True))
    np.testing.assert_allclose(c, d, rtol=1e-12)


def test_nloo_ll_and_ksize():
    rng = np.random.default_rng(1)
    p = kde(rng.normal(size=(1, 50)), [0.5])
    h1 = nloo_ll(1.0, p)
    from kde_tpu import entropy
    np.testing.assert_allclose(h1, float(entropy(p)), rtol=1e-10)
    # scaling up the bandwidth of an undersmoothed fit changes entropy
    assert nloo_ll(2.0, p) != h1
    q = ksize(p)
    assert q.npts == p.npts
    assert float(q.get_bw()[0, 0]) > 0


def test_kernel_type():
    p = kde(np.zeros((1, 3)), [1.0])
    assert p.kernel_type.name == "Gaussian"


def test_debug_dumpers(capsys):
    p = kde(np.array([[0.0, 1.0, 2.0]]), [0.5])
    print_ball_tree(p.tree)
    out = capsys.readouterr().out
    assert "num_points=3" in out and "perm" in out
    from kde_tpu import prod_appx_ms_gibbs
    import jax
    pts, idx, labels = prod_appx_ms_gibbs(2, [p, p], record_labels=True,
                                          key=jax.random.PRNGKey(0))
    print_chain_state(pts, idx, labels, sample=0)
    out = capsys.readouterr().out
    assert "chain 0" in out and "level path" in out


def test_fence_forces_completion():
    """utils.fence reduces arbitrary pytrees to one fetched checksum."""
    import jax.numpy as jnp
    from kde_tpu.utils import fence
    v = fence(jnp.ones((3, 3)), (jnp.zeros(4), jnp.arange(5)))
    assert v == 9.0 + 0.0 + 10.0
    assert fence() == 0.0


def test_type_aliases_and_bw_bounds():
    """Reference type aliases (BallTreeDensity/MixtureDensity,
    src/BallTreeDensity01.jl:9-24; VectorRange,
    src/KernelDensityEstimate.jl:63) and the bwMin/bwMax accessors
    (src/BallTreeDensity01.jl:95-99)."""
    assert kde_tpu.BallTreeDensity is kde_tpu.KDE
    assert kde_tpu.MixtureDensity is kde_tpu.KDE
    assert hasattr(kde_tpu, "VectorRange")
    p = kde(np.array([[0.0, 1.0, 2.0]]), [0.5])
    assert isinstance(p, kde_tpu.BallTreeDensity)
    # uniform bandwidth: bounds equal the shared variance at every node
    np.testing.assert_allclose(p.bw_min(), [0.25])
    np.testing.assert_allclose(p.bw_max(2), [0.25])
    # multibandwidth: per-node bounds bracket the per-kernel variances
    bwm = np.array([[0.1, 0.2, 0.4]])
    q = kde(np.array([[0.0, 1.0, 2.0]]), bwm)
    root_min, root_max = q.bw_min(0), q.bw_max(0)
    np.testing.assert_allclose(root_min, [0.01])
    np.testing.assert_allclose(root_max, [0.16])


def test_free_function_exports():
    """Remaining names from the reference export list
    (src/KernelDensityEstimate.jl:13-51): free-function marginal/Npts/Ndim
    and the BallTree type name."""
    import kde_tpu as kt
    p = kde(np.zeros((2, 4)), [1.0, 2.0])
    assert kt.npts(p) == 4 and kt.ndim(p) == 2
    m = kt.marginal(p, [1])
    assert m.ndim == 1 and float(m.get_bw()[0, 0]) == 2.0
    assert kt.BallTree is kt.FlatBallTree
    assert isinstance(p.tree, kt.BallTree)
