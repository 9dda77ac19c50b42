"""Hand-derived worked trace of the multiscale Gibbs product (VERDICT r1 #8).

The replay-parity suite proves the vectorized engine reproduces the serial
oracle (``kde_tpu.reference_impl``) trace-for-trace -- but the oracle itself
is *our reading* of the Julia reference.  This test anchors that reading to
the Julia source directly: a 2-density, 2-kernel, 1-D, one-sample product is
computed here by **straight-line arithmetic transcribing the reference's
code path step by step** (every formula cites its src/MSGibbs01.jl line),
with fixed injected randU/randN streams.  Both the serial oracle and the
vectorized engine must reproduce the hand trace exactly.

Trace shape for this config (Np=1 output sample, Ndens=2, Npts=2, Niter=1):
``maxNp = 2 -> Nlevels = floor(log2 2) + 1 = 2`` (src/MSGibbs01.jl:568,660);
uniforms consumed: ``Ndens * (1 + Nlevels*(1 + Niter)) = 10``; normals:
``Ndim * (Nlevels + 1) = 3``.
"""

import numpy as np
import pytest

from kde_tpu import kde, prod_appx_ms_gibbs
from kde_tpu.reference_impl import serial_gibbs_product

# chosen to exercise both CDF branches (first / second candidate) across the
# ten selections; values are otherwise arbitrary
U = np.array([0.77, 0.43, 0.20, 0.81, 0.65, 0.07, 0.55, 0.93, 0.31, 0.48])
NRM = np.array([0.6, -1.1, 0.35])


def _densities():
    # density A: kernels at 0, 2 with variance 0.25; B: at 1, 3, variance 1.0
    a = kde(np.array([[0.0, 2.0]]), [0.5])
    b = kde(np.array([[1.0, 3.0]]), [1.0])
    return a, b


def _hand_trace(ta, tb, add_entropy):
    """The reference algorithm, transcribed line by line for this config.

    ``ta``/``tb`` are the flat ball trees (2N = 4 slots, root = slot 0,
    leaves = slots 2..3; tree construction itself is anchored separately by
    the MATLAB golden fixtures, tests/test_balltree.py).  All *Gibbs*
    arithmetic below is explicit -- no loops over levels/densities, no reuse
    of the oracle's helpers.
    """
    mA, vA, wA = ta.means[:, 0], ta.bandwidth[:, 0], ta.weights
    mB, vB, wB = tb.means[:, 0], tb.bandwidth[:, 0], tb.weights

    def select(u, m, v, w, mu, cov):
        """makeFasterSampleIndex! for the two leaf candidates (slots 2, 3):
        p_z = exp(-0.5*((m_z-mu)^2/c_z + log c_z)) * w_z with c_z = bw_z
        (+ product covariance when doCalmost, src/MSGibbs01.jl:287-296),
        normalized into a CDF (:318-326); selectLabelOnLevel (:330-351)
        scans z = 1..dNp-1 and accepts the first z with u <= cdf[z], falling
        to the last candidate otherwise."""
        c2, c3 = v[2] + cov, v[3] + cov
        p2 = np.exp(-0.5 * ((m[2] - mu) ** 2 / c2 + np.log(c2))) * w[2]
        p3 = np.exp(-0.5 * ((m[3] - mu) ** 2 / c3 + np.log(c3))) * w[3]
        return 2 if u <= p2 / (p2 + p3) else 3

    def product2(muA, varA, muB, varB):
        """gaussianProductMeanCov! (src/MSGibbs01.jl:176-216): information
        form, lam_j = 1/var_j, cov = 1/sum(lam), mu = cov * sum(lam*mu)."""
        lamA, lamB = 1.0 / varA, 1.0 / varB
        cov = 1.0 / (lamA + lamB)
        return cov * (lamA * muA + lamB * muB), cov

    # initIndices! (:477-497): level list = [root]; p = [weight(root)] = [1];
    # the scan runs z over 1..dNp-1 = (empty) so the root is selected
    # unconditionally, but ONE uniform is still consumed per density
    # (ruptr += 1 at :346) -> U[0], U[1] burned.
    # calcIndices!: selections = root stats.

    # ---- level 1 ----
    # samplePoint! (:440-463, addEntropy=true at the per-level call :594):
    # product of the root kernels, then mu + sqrt(cov)*randN -> consumes NRM[0]
    mu1, cov1 = product2(mA[0], vA[0], mB[0], vB[0])
    x1 = mu1 + np.sqrt(cov1) * NRM[0]
    # levelDown! (:500-523): [root] -> both children = leaf slots [2, 3]
    # sampleIndices! (:364-385): condition each density's label on x1; the
    # candidate variance is the leaf bandwidth alone (doCalmost=false -> no
    # +cov term, :286) but log(c) IS still added (:296)
    iA = select(U[2], mA, vA, wA, x1, 0.0)
    iB = select(U[3], mB, vB, wB, x1, 0.0)
    # one Gibbs sweep (Niter=1, :604-608), sequential over densities:
    # j=A leaves out A -> Malmost/Calmost = B's currently selected kernel
    # (:415-417); candidate variance = bw_z + Calmost (doCalmost=true, :287-291)
    iA = select(U[4], mA, vA, wA, mB[iB], vB[iB])
    # j=B uses A's NEW selection (sequential scan order, :604-608)
    iB = select(U[5], mB, vB, wB, mA[iA], vA[iA])

    # ---- level 2 ----
    # samplePoint!: product of the two selected leaf kernels -> NRM[1]
    mu2, cov2 = product2(mA[iA], vA[iA], mB[iB], vB[iB])
    x2 = mu2 + np.sqrt(cov2) * NRM[1]
    # levelDown! on leaves is a no-op: left(leaf) = leaf itself and
    # right(leaf) = NO_CHILD (leaf init, src/BallTree01.jl:426-427), so the
    # level list self-replicates
    iA = select(U[6], mA, vA, wA, x2, 0.0)
    iB = select(U[7], mB, vB, wB, x2, 0.0)
    iA = select(U[8], mA, vA, wA, mB[iB], vB[iB])
    iB = select(U[9], mB, vB, wB, mA[iA], vA[iA])

    # export (:612-616): original point index of the selected leaf via the
    # build permutation (reference is 1-based; 0-based here matches the
    # fixture-dump convention)
    idx = np.array([ta.permutation[iA], tb.permutation[iB]])
    # final samplePoint! (:625): with addEntropy the point is jittered by
    # NRM[2]; without, it is exactly the product mean (:455-459) -- the
    # normal cursor advances either way (rnptr += 1 at :452)
    muf, covf = product2(mA[iA], vA[iA], mB[iB], vB[iB])
    xf = muf + (np.sqrt(covf) * NRM[2] if add_entropy else 0.0)
    return xf, idx


@pytest.mark.parametrize("add_entropy", [True, False])
def test_worked_trace(add_entropy):
    a, b = _densities()
    want_x, want_idx = _hand_trace(a.tree, b.tree, add_entropy)

    pts_s, idx_s, _ = serial_gibbs_product(
        [a.tree, b.tree], 1, 1, U, NRM, add_entropy=add_entropy)
    np.testing.assert_allclose(pts_s[0, 0], want_x, rtol=1e-12)
    np.testing.assert_array_equal(idx_s[:, 0], want_idx)

    pts_v, idx_v = prod_appx_ms_gibbs(
        1, [a, b], n_iter=1, add_entropy=add_entropy, rand_u=U, rand_n=NRM)
    np.testing.assert_allclose(np.asarray(pts_v)[0, 0], want_x, rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(idx_v)[:, 0], want_idx)


# ---------------------------------------------------------------------------
# partial-dimension worked trace (VERDICT r2 #7): the corner where an oracle
# misreading of the dim-mask semantics would be invisible to replay parity
# ---------------------------------------------------------------------------

# 2-D config: density A informs both dims, density B only dim 1.
# Uniforms: Ndens*(1 + Nlevels*(1+Niter)) = 2*(1+2*2) = 10;
# normals: Ndim*(Nlevels+1) = 2*3 = 6.
U_P = np.array([0.77, 0.43, 0.30, 0.81, 0.72, 0.07, 0.55, 0.93, 0.28, 0.48])
NRM_P = np.array([0.6, -1.1, 0.35, -0.2, 0.9, -0.7])
MASK_P = np.array([[True, True], [False, True]])


def _densities_partial():
    a = kde(np.array([[0.0, 2.0], [0.5, 1.5]]), [0.5])
    b = kde(np.array([[10.0, 11.0], [1.0, 3.0]]), [1.0])
    return a, b


def _hand_trace_partial(ta, tb, add_entropy):
    """Reference code path with partialDimMask = [[1,1],[0,1]], transcribed
    step by step.  The load-bearing reads:

    * ``updateGlbParticlesVariance!`` zeroes B's dim-0 particle/variance
      (src/MSGibbs01.jl:95-107), so B never contributes dim-0 information.
    * ``gaussianProductMeanCov!`` checks ``partialDimMask[j][dim]`` per
      contributor (:199-209): dim 0 of every product is A's kernel alone
      (cov = A's variance, no actual "product"), dim 1 is the two-kernel
      information product.
    * ``makeFasterSampleIndex!`` restricts candidate likelihoods to
      ``partialDimMask[j][i] && dimmask[i]`` where ``dimmask`` is the OR of
      the *other* densities' masks (:270-285).  With B = [0,1]: A's own
      selections use dim 1 ONLY (A's dim-0 information has no counterpart
      to condition on), and B's likewise -- so in this config every label
      selection is a pure dim-1 computation even though A is full-dim.
    """
    mA, vA, wA = ta.means, ta.bandwidth, ta.weights          # [4, 2], [4]
    mB, vB, wB = tb.means, tb.bandwidth, tb.weights

    def select(u, m, v, w, mu1, cov1):
        # dim 1 only (see docstring); formulas as src/MSGibbs01.jl:287-296
        c2, c3 = v[2, 1] + cov1, v[3, 1] + cov1
        p2 = np.exp(-0.5 * ((m[2, 1] - mu1) ** 2 / c2 + np.log(c2))) * w[2]
        p3 = np.exp(-0.5 * ((m[3, 1] - mu1) ** 2 / c3 + np.log(c3))) * w[3]
        return 2 if u <= p2 / (p2 + p3) else 3

    def product_d1(muA, varA, muB, varB):
        lamA, lamB = 1.0 / varA, 1.0 / varB                  # :199-209
        cov = 1.0 / (lamA + lamB)
        return cov * (lamA * muA + lamB * muB), cov

    # initIndices!: U_P[0], U_P[1] burned (single root candidate)
    # ---- level 1 ----
    # samplePoint! walks dims in order, one randN each (:448-461):
    # dim 0 <- A's root kernel alone; dim 1 <- information product
    x0 = mA[0, 0] + np.sqrt(vA[0, 0]) * NRM_P[0]
    mu1, cov1 = product_d1(mA[0, 1], vA[0, 1], mB[0, 1], vB[0, 1])
    x1 = mu1 + np.sqrt(cov1) * NRM_P[1]
    del x0                           # never conditioned on in this config
    iA = select(U_P[2], mA, vA, wA, x1, 0.0)
    iB = select(U_P[3], mB, vB, wB, x1, 0.0)
    # Gibbs sweep: j=A leaves out A -> conditioner is B's selected kernel
    # (dim 1); j=B uses A's NEW selection (sequential, :604-608)
    iA = select(U_P[4], mA, vA, wA, mB[iB, 1], vB[iB, 1])
    iB = select(U_P[5], mB, vB, wB, mA[iA, 1], vA[iA, 1])

    # ---- level 2 (leaves self-replicate) ----
    x0 = mA[iA, 0] + np.sqrt(vA[iA, 0]) * NRM_P[2]
    mu2, cov2 = product_d1(mA[iA, 1], vA[iA, 1], mB[iB, 1], vB[iB, 1])
    x1 = mu2 + np.sqrt(cov2) * NRM_P[3]
    del x0
    iA = select(U_P[6], mA, vA, wA, x1, 0.0)
    iB = select(U_P[7], mB, vB, wB, x1, 0.0)
    iA = select(U_P[8], mA, vA, wA, mB[iB, 1], vB[iB, 1])
    iB = select(U_P[9], mB, vB, wB, mA[iA, 1], vA[iA, 1])

    idx = np.array([ta.permutation[iA], tb.permutation[iB]])
    # final samplePoint! (:625): dim 0 is A's selected kernel alone
    xf0 = mA[iA, 0] + (np.sqrt(vA[iA, 0]) * NRM_P[4] if add_entropy else 0.0)
    muf, covf = product_d1(mA[iA, 1], vA[iA, 1], mB[iB, 1], vB[iB, 1])
    xf1 = muf + (np.sqrt(covf) * NRM_P[5] if add_entropy else 0.0)
    return np.array([xf0, xf1]), idx


@pytest.mark.parametrize("add_entropy", [True, False])
def test_worked_trace_partial_dims(add_entropy):
    a, b = _densities_partial()
    want_x, want_idx = _hand_trace_partial(a.tree, b.tree, add_entropy)

    pts_s, idx_s, _ = serial_gibbs_product(
        [a.tree, b.tree], 1, 1, U_P, NRM_P, add_entropy=add_entropy,
        partial_dim_mask=MASK_P)
    np.testing.assert_allclose(pts_s[:, 0], want_x, rtol=1e-12)
    np.testing.assert_array_equal(idx_s[:, 0], want_idx)

    pts_v, idx_v = prod_appx_ms_gibbs(
        1, [a, b], n_iter=1, add_entropy=add_entropy, rand_u=U_P,
        rand_n=NRM_P, partial_dim_mask=MASK_P)
    np.testing.assert_allclose(np.asarray(pts_v)[:, 0], want_x, rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(idx_v)[:, 0], want_idx)


# ---------------------------------------------------------------------------
# multibandwidth worked trace (VERDICT r2 #7): per-kernel bandwidths pin the
# per-node bw read (src/MSGibbs01.jl:287 `bw(glb.trees[j], zz, i)` under the
# multibandwidth stride, src/BallTreeDensity01.jl:92-93) and the
# moment-matched internal-node variances entering coarse-level candidates
# ---------------------------------------------------------------------------

U_M = np.array([0.77, 0.43, 0.60, 0.81, 0.35, 0.07, 0.55, 0.93, 0.12, 0.48])
NRM_M = np.array([0.6, -1.1, 0.35])


def _densities_multibw():
    # per-kernel bandwidth std-devs (bw [d, N] -> multibandwidth)
    a = kde(np.array([[0.0, 2.0]]), np.array([[0.5, 0.9]]))
    b = kde(np.array([[1.0, 3.0]]), np.array([[1.0, 0.6]]))
    return a, b


def _hand_trace_multibw(ta, tb, add_entropy):
    """Same straight-line arithmetic as the uniform-bw trace, but the leaf
    bandwidths differ per kernel AND the level-1 candidates are the
    moment-matched root stats (wL(sL^2+muL^2)+wR(sR^2+muR^2)-mu^2,
    src/BallTreeDensity01.jl:178-185) -- an oracle that read the uniform
    bandwidth stride (or broadcast one leaf bw) would diverge here."""
    assert ta.multibandwidth and tb.multibandwidth
    mA, vA, wA = ta.means[:, 0], ta.bandwidth[:, 0], ta.weights
    mB, vB, wB = tb.means[:, 0], tb.bandwidth[:, 0], tb.weights

    def select(u, m, v, w, mu, cov):
        c2, c3 = v[2] + cov, v[3] + cov
        p2 = np.exp(-0.5 * ((m[2] - mu) ** 2 / c2 + np.log(c2))) * w[2]
        p3 = np.exp(-0.5 * ((m[3] - mu) ** 2 / c3 + np.log(c3))) * w[3]
        return 2 if u <= p2 / (p2 + p3) else 3

    def product2(muA, varA, muB, varB):
        lamA, lamB = 1.0 / varA, 1.0 / varB
        cov = 1.0 / (lamA + lamB)
        return cov * (lamA * muA + lamB * muB), cov

    # initIndices! burns U_M[0], U_M[1]
    mu1, cov1 = product2(mA[0], vA[0], mB[0], vB[0])     # root moment stats
    x1 = mu1 + np.sqrt(cov1) * NRM_M[0]
    iA = select(U_M[2], mA, vA, wA, x1, 0.0)
    iB = select(U_M[3], mB, vB, wB, x1, 0.0)
    iA = select(U_M[4], mA, vA, wA, mB[iB], vB[iB])
    iB = select(U_M[5], mB, vB, wB, mA[iA], vA[iA])
    mu2, cov2 = product2(mA[iA], vA[iA], mB[iB], vB[iB])
    x2 = mu2 + np.sqrt(cov2) * NRM_M[1]
    iA = select(U_M[6], mA, vA, wA, x2, 0.0)
    iB = select(U_M[7], mB, vB, wB, x2, 0.0)
    iA = select(U_M[8], mA, vA, wA, mB[iB], vB[iB])
    iB = select(U_M[9], mB, vB, wB, mA[iA], vA[iA])
    idx = np.array([ta.permutation[iA], tb.permutation[iB]])
    muf, covf = product2(mA[iA], vA[iA], mB[iB], vB[iB])
    xf = muf + (np.sqrt(covf) * NRM_M[2] if add_entropy else 0.0)
    return xf, idx


def test_multibw_trees_have_distinct_leaf_bandwidths():
    """Guard that the config actually exercises the multibandwidth stride:
    the two leaf bandwidths differ within each tree, and the root variance
    is the moment-matched combination (not either leaf's)."""
    a, b = _densities_multibw()
    for t in (a.tree, b.tree):
        assert t.multibandwidth
        assert t.bandwidth[2, 0] != t.bandwidth[3, 0]
        wL, wR = t.weights[2], t.weights[3]
        wT = wL + wR
        mu = (wL * t.means[2, 0] + wR * t.means[3, 0]) / wT
        v = (wL / wT * (t.bandwidth[2, 0] + t.means[2, 0] ** 2)
             + wR / wT * (t.bandwidth[3, 0] + t.means[3, 0] ** 2) - mu ** 2)
        np.testing.assert_allclose(t.bandwidth[0, 0], v, rtol=1e-9)


@pytest.mark.parametrize("add_entropy", [True, False])
def test_worked_trace_multibandwidth(add_entropy):
    a, b = _densities_multibw()
    want_x, want_idx = _hand_trace_multibw(a.tree, b.tree, add_entropy)

    pts_s, idx_s, _ = serial_gibbs_product(
        [a.tree, b.tree], 1, 1, U_M, NRM_M, add_entropy=add_entropy)
    np.testing.assert_allclose(pts_s[0, 0], want_x, rtol=1e-12)
    np.testing.assert_array_equal(idx_s[:, 0], want_idx)

    pts_v, idx_v = prod_appx_ms_gibbs(
        1, [a, b], n_iter=1, add_entropy=add_entropy, rand_u=U_M,
        rand_n=NRM_M)
    np.testing.assert_allclose(np.asarray(pts_v)[0, 0], want_x, rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(idx_v)[:, 0], want_idx)


def test_worked_trace_hits_both_cdf_branches():
    """The chosen uniforms must actually exercise both sides of the CDF scan
    (first candidate accepted AND fall-to-last), otherwise the trace would
    not pin the tie/accept rule."""
    a, b = _densities()
    ta, tb = a.tree, b.tree
    picked = set()

    mA, vA, wA = ta.means[:, 0], ta.bandwidth[:, 0], ta.weights
    mB, vB, wB = tb.means[:, 0], tb.bandwidth[:, 0], tb.weights

    def select(u, m, v, w, mu, cov):
        c2, c3 = v[2] + cov, v[3] + cov
        p2 = np.exp(-0.5 * ((m[2] - mu) ** 2 / c2 + np.log(c2))) * w[2]
        p3 = np.exp(-0.5 * ((m[3] - mu) ** 2 / c3 + np.log(c3))) * w[3]
        z = 2 if u <= p2 / (p2 + p3) else 3
        picked.add(z)
        return z

    def product2(muA, varA, muB, varB):
        lamA, lamB = 1.0 / varA, 1.0 / varB
        cov = 1.0 / (lamA + lamB)
        return cov * (lamA * muA + lamB * muB), cov

    mu1, cov1 = product2(mA[0], vA[0], mB[0], vB[0])
    x1 = mu1 + np.sqrt(cov1) * NRM[0]
    iA = select(U[2], mA, vA, wA, x1, 0.0)
    iB = select(U[3], mB, vB, wB, x1, 0.0)
    iA = select(U[4], mA, vA, wA, mB[iB], vB[iB])
    iB = select(U[5], mB, vB, wB, mA[iA], vA[iA])
    mu2, cov2 = product2(mA[iA], vA[iA], mB[iB], vB[iB])
    x2 = mu2 + np.sqrt(cov2) * NRM[1]
    select(U[6], mA, vA, wA, x2, 0.0)
    select(U[7], mB, vB, wB, x2, 0.0)
    assert picked == {2, 3}


# ---------------------------------------------------------------------------
# degenerate-fallback worked trace (round 3): far-apart densities where
# EVERY candidate likelihood underflows the reference's 1e-99 total
# (src/MSGibbs01.jl:311-315) -- the corner where a shared misreading of the
# fallback in the oracle AND the engines would be invisible to replay parity
# ---------------------------------------------------------------------------

# same stream shape as the base trace (Np=1, Ndens=2, Npts=2, Niter=1):
# 10 uniforms, 3 normals; values chosen to hit both uniform-fallback
# branches (u <= 0.5 -> first candidate, else second)
U_D = np.array([0.11, 0.89, 0.30, 0.81, 0.72, 0.07, 0.55, 0.93, 0.28, 0.48])
NRM_D = np.array([0.6, -1.1, 0.35])


def _densities_far():
    # ~100 bandwidths apart: every cross-density kernel evaluation is
    # exp(-O(10^4)) = 0.0 in linear f64 -> the total underflows 1e-99 at
    # every selection after the (weight-only) init
    a = kde(np.array([[0.0, 2.0]]), [0.5])
    b = kde(np.array([[100.0, 103.0]]), [0.5])
    return a, b


def _hand_trace_degenerate(ta, tb, add_entropy):
    """The base trace's arithmetic with the reference's degenerate branch
    transcribed: after the per-candidate Gaussian evaluations (:287-296),
    ``pT = sum(p)``; when ``pT < 1e-99`` every candidate's p is overwritten
    with the LAST candidate's weight (``p_ .= weight(zz)``, :313 -- a
    constant, so the normalized CDF is uniform), then the usual
    normalize+scan select (:318-351)."""
    mA, vA, wA = ta.means[:, 0], ta.bandwidth[:, 0], ta.weights
    mB, vB, wB = tb.means[:, 0], tb.bandwidth[:, 0], tb.weights

    def select(u, m, v, w, mu, cov):
        c2, c3 = v[2] + cov, v[3] + cov
        p2 = np.exp(-0.5 * ((m[2] - mu) ** 2 / c2 + np.log(c2))) * w[2]
        p3 = np.exp(-0.5 * ((m[3] - mu) ** 2 / c3 + np.log(c3))) * w[3]
        if p2 + p3 < 1e-99:                       # :311-315
            p2 = p3 = w[3]                        # p_ .= weight(last)
        return 2 if u <= p2 / (p2 + p3) else 3

    def product2(muA, varA, muB, varB):
        lamA, lamB = 1.0 / varA, 1.0 / varB
        cov = 1.0 / (lamA + lamB)
        return cov * (lamA * muA + lamB * muB), cov

    # initIndices!: root selected unconditionally, U[0], U[1] burned
    # level 1: x1 from the ROOT product (the roots are ~100 apart, so x1
    # sits near the precision-weighted midpoint -- far from both leaf sets)
    mu1, cov1 = product2(mA[0], vA[0], mB[0], vB[0])
    x1 = mu1 + np.sqrt(cov1) * NRM_D[0]
    iA = select(U_D[2], mA, vA, wA, x1, 0.0)      # degenerate -> uniform
    iB = select(U_D[3], mB, vB, wB, x1, 0.0)      # degenerate -> uniform
    iA = select(U_D[4], mA, vA, wA, mB[iB], vB[iB])   # degenerate (LOO)
    iB = select(U_D[5], mB, vB, wB, mA[iA], vA[iA])   # degenerate (LOO)

    # level 2 (leaves self-replicate)
    mu2, cov2 = product2(mA[iA], vA[iA], mB[iB], vB[iB])
    x2 = mu2 + np.sqrt(cov2) * NRM_D[1]
    iA = select(U_D[6], mA, vA, wA, x2, 0.0)
    iB = select(U_D[7], mB, vB, wB, x2, 0.0)
    iA = select(U_D[8], mA, vA, wA, mB[iB], vB[iB])
    iB = select(U_D[9], mB, vB, wB, mA[iA], vA[iA])

    idx = np.array([ta.permutation[iA], tb.permutation[iB]])
    muf, covf = product2(mA[iA], vA[iA], mB[iB], vB[iB])
    xf = muf + (np.sqrt(covf) * NRM_D[2] if add_entropy else 0.0)
    return xf, idx


@pytest.mark.parametrize("add_entropy", [True, False])
def test_worked_trace_degenerate(add_entropy):
    a, b = _densities_far()
    want_x, want_idx = _hand_trace_degenerate(a.tree, b.tree, add_entropy)

    # sanity: the conditional selections really are in the degenerate regime
    mA, vA = a.tree.means[:, 0], a.tree.bandwidth[:, 0]
    assert np.exp(-0.5 * (mA[2] - 100.0) ** 2 / vA[2]) == 0.0

    pts_s, idx_s, _ = serial_gibbs_product(
        [a.tree, b.tree], 1, 1, U_D, NRM_D, add_entropy=add_entropy)
    np.testing.assert_allclose(pts_s[0, 0], want_x, rtol=1e-12)
    np.testing.assert_array_equal(idx_s[:, 0], want_idx)

    pts_v, idx_v = prod_appx_ms_gibbs(
        1, [a, b], n_iter=1, add_entropy=add_entropy, rand_u=U_D,
        rand_n=NRM_D)
    np.testing.assert_allclose(np.asarray(pts_v)[0, 0], want_x, rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(idx_v)[:, 0], want_idx)


def test_worked_trace_degenerate_hits_both_branches():
    """The degenerate trace must actually exercise both uniform-fallback
    branches (first and second candidate) or it proves nothing about the
    fallback CDF.  In this config EVERY selection after the burned init
    uniforms (U_D[0], U_D[1]) is in the fallback regime, where the
    normalized CDF is exactly [0.5, 1.0] -- so the branch taken by
    selection k is determined by U_D[2 + k] <= 0.5.  Assert on the trace's
    ACTUAL selection uniforms, so editing U_D cannot silently reduce the
    trace to a single branch."""
    sel = [2 if u <= 0.5 else 3 for u in U_D[2:]]
    assert 2 in sel and 3 in sel, sel
    # cross-check against the hand trace itself: its final labels are the
    # permuted slots selected by the LAST two uniforms (U_D[8], U_D[9])
    a, b = _densities_far()
    _, idx = _hand_trace_degenerate(a.tree, b.tree, True)
    slot_a = 2 if U_D[8] <= 0.5 else 3
    slot_b = 2 if U_D[9] <= 0.5 else 3
    assert idx[0] == a.tree.permutation[slot_a]
    assert idx[1] == b.tree.permutation[slot_b]
