"""Node-clustered best-first grower (trees/grow_cluster.py): parity with
the dataset-order grower.

The clustered layout is a performance transform — the split rule, gain
scan, minls veto, and routing are shared code with trees/grow.py — but
histogram partial sums accumulate in a different doc order, so f32
rounding can differ in ulps.  The bitwise test therefore uses INTEGER
pseudoresponses (sums exact in f32 -> identical histograms -> identical
trees); the end-to-end test allows metric-level tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quickrank_tpu.trees.grow import GrowConfig, fit_tree
from quickrank_tpu.trees.grow_cluster import fit_tree_clustered


def _mk(N=4096, F_real=20, W=32, B=16, seed=0):
    rng = np.random.default_rng(seed)
    binned = np.zeros((N, W), np.uint8)
    binned[:, :F_real] = rng.integers(0, B, (N, F_real))
    grad = rng.integers(-8, 9, N).astype(np.float32)  # integer: exact sums
    mask = rng.random(N) < 0.9
    thresholds = np.sort(rng.standard_normal((W, B)), axis=1).astype(
        np.float32
    )
    return (
        jnp.asarray(binned), jnp.asarray(grad), jnp.asarray(mask),
        jnp.asarray(thresholds),
    )


@pytest.mark.parametrize("nleaves", [4, 10])
def test_clustered_matches_plain_bitwise(nleaves):
    binned, grad, mask, thr = _mk()
    cfg = GrowConfig(
        nleaves=nleaves, min_leaf_support=2, num_bins=16,
        num_real_features=20,
    )
    key = jax.random.PRNGKey(3)
    t_plain, n_plain = fit_tree(binned, grad, mask, thr, cfg, key=key)
    t_clus, n_clus = fit_tree_clustered(binned, grad, mask, thr, cfg, key=key)
    np.testing.assert_array_equal(t_plain.feature, t_clus.feature)
    np.testing.assert_array_equal(t_plain.threshold_bin, t_clus.threshold_bin)
    np.testing.assert_array_equal(t_plain.left, t_clus.left)
    np.testing.assert_array_equal(t_plain.is_leaf, t_clus.is_leaf)
    np.testing.assert_array_equal(t_plain.threshold, t_clus.threshold)
    # clustered recomputes leaf assignment by (matmul) descent over the
    # original order; plain routes during growth — must agree exactly
    np.testing.assert_array_equal(np.asarray(n_plain), np.asarray(n_clus))


def test_clustered_max_depth_and_sampling():
    binned, grad, mask, thr = _mk(seed=5)
    cfg = GrowConfig(
        nleaves=10, min_leaf_support=1, num_bins=16, max_depth=3,
        max_features=0.6, num_real_features=20,
    )
    key = jax.random.PRNGKey(11)
    t_plain, n_plain = fit_tree(binned, grad, mask, thr, cfg, key=key)
    t_clus, n_clus = fit_tree_clustered(binned, grad, mask, thr, cfg, key=key)
    np.testing.assert_array_equal(t_plain.feature, t_clus.feature)
    np.testing.assert_array_equal(t_plain.threshold_bin, t_clus.threshold_bin)
    np.testing.assert_array_equal(np.asarray(n_plain), np.asarray(n_clus))


def test_lambdamart_clustered_end_to_end(splits):
    """Full training with cluster='on' (XLA-fallback partition on CPU) —
    the trajectory may diverge on f32 gain ties, so assert quality-level
    parity, not bitwise: same-scale NDCG and a sane model."""
    from quickrank_tpu.learning import LambdaMart
    from quickrank_tpu.metrics import Ndcg

    train, valid, _ = splits
    on = LambdaMart(ntrees=6, nleaves=8, nthresholds=32, seed=1,
                    cluster="on")
    off = LambdaMart(ntrees=6, nleaves=8, nthresholds=32, seed=1,
                     cluster="off")
    h_on = on.learn(train, valid, Ndcg(10), verbose=False)
    h_off = off.learn(train, valid, Ndcg(10), verbose=False)
    assert abs(h_on["train"][-1] - h_off["train"][-1]) < 5e-3
    assert int(on.ensemble.num_trees) == int(off.ensemble.num_trees)


def test_lambdamart_clustered_sharded_parity(splits):
    """cluster='on' under a 4-device data mesh: split decisions derive
    only from psum'd histograms and the partition directives are
    shard-local, so the sharded run matches the single-device run up to
    psum summation-order rounding (which, as for the dataset-order
    LambdaMART, can flip f32 gain near-ties — assert metric-level
    parity, the suite's standard for float-gradient learners)."""
    from quickrank_tpu.learning import LambdaMart
    from quickrank_tpu.metrics import Ndcg
    from quickrank_tpu.parallel import make_mesh

    train, _, _ = splits
    m = Ndcg(10)
    one = LambdaMart(ntrees=4, nleaves=6, nthresholds=32, seed=1,
                     cluster="on")
    h1 = one.learn(train, None, m, verbose=False)
    four = LambdaMart(ntrees=4, nleaves=6, nthresholds=32, seed=1,
                      cluster="on")
    h4 = four.learn(train, None, m, verbose=False, mesh=make_mesh(4))
    assert abs(h1["train"][-1] - h4["train"][-1]) < 2e-3
    assert int(one.ensemble.num_trees) == int(four.ensemble.num_trees)
