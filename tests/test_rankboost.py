"""RankBoost factorized pair-weight machinery.

The implementation never materializes the reference's per-query pair-weight
matrices (rankboost.cc:276-292); these tests pin the factorization to a
brute-force dense-D oracle, exercise a near-pathological list length that a
dense [Q, Dmax, Dmax] layout would turn into Dmax^2 memory, and assert
sharded-vs-single-device parity of the learned model.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from quickrank_tpu.data.synthetic import make_ranking_dataset, make_train_valid_test
from quickrank_tpu.learning import RankBoost
from quickrank_tpu.learning.mart import TrainData
from quickrank_tpu.learning.rankboost import pair_potentials
from quickrank_tpu.metrics import Ndcg
from quickrank_tpu.parallel import make_mesh


def _dense_oracle(sd, s_flat, num_bins):
    """Materialize D(i,j) = exp(s_i - s_j) * pair_mask / S per padded query
    and read pi / S / r off it — the reference's explicit representation."""
    sp = np.asarray(
        jnp.where(sd.slot_mask, s_flat[np.asarray(sd.pad_index)], 0.0),
        np.float64,
    )
    lp = np.asarray(sd.labels)[np.asarray(sd.pad_index)]
    sm = np.asarray(sd.slot_mask)
    Q, Dm = sp.shape
    ii = np.arange(Dm)[:, None]
    jj = np.arange(Dm)[None, :]
    pi_p = np.zeros((Q, Dm))
    S = 0.0
    Dqs = []
    for q in range(Q):
        mask = (ii < jj) & sm[q][:, None] & sm[q][None, :] & (
            lp[q][None, :] > lp[q][:, None]
        )
        Dq = np.where(mask, np.exp(sp[q][:, None] - sp[q][None, :]), 0.0)
        S += Dq.sum()
        Dqs.append(Dq)
    for q in range(Q):
        Dq = Dqs[q] / S
        pi_p[q] = Dq.sum(axis=0) - Dq.sum(axis=1)
    pi = np.zeros(len(np.asarray(sd.doc_mask)))
    inv_q, inv_slot = np.asarray(sd.inv_q), np.asarray(sd.inv_slot)
    dm = np.asarray(sd.doc_mask)
    pi[dm] = pi_p[inv_q[dm], inv_slot[dm]]
    binned = np.asarray(sd.binned, np.int64)
    F = binned.shape[1]
    r = np.zeros((F, num_bins))
    for f in range(F):
        for t in range(num_bins):
            r[f, t] = pi[dm & (binned[:, f] > t)].sum()
    return pi, S, r


def test_factorized_potentials_match_dense_oracle():
    ds = make_ranking_dataset(
        num_queries=6, num_features=5, avg_docs_per_query=30, seed=7
    )
    tr = TrainData.build(ds, nthresholds=16)
    rng = np.random.default_rng(0)
    # a spread of cumulative scores like mid-training rounds produce
    s = jnp.asarray(
        rng.normal(0, 2.0, tr.padded.num_docs_padded).astype(np.float32)
        * np.asarray(tr.step.doc_mask)
    )
    levels = tuple(float(x) for x in np.unique(ds.labels))
    f_star, t_star, best_r, S, pi = pair_potentials(
        s, tr.step, levels, tr.num_bins
    )
    pi_o, S_o, r_o = _dense_oracle(tr.step, np.asarray(s), tr.num_bins)
    np.testing.assert_allclose(float(S), S_o, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pi), pi_o, rtol=2e-4, atol=1e-9)
    assert (int(f_star), int(t_star)) == np.unravel_index(
        np.argmax(r_o), r_o.shape
    )
    np.testing.assert_allclose(float(best_r), r_o.max(), rtol=1e-4)


def test_rankboost_long_list():
    """One query with ~1000 docs beside tiny ones: the factorized layout is
    O(Q * Dmax), where a dense pair tensor would need Q * Dmax^2 floats
    (the MSLR blow-up in miniature)."""
    big = make_ranking_dataset(
        num_queries=1, num_features=8, avg_docs_per_query=1000, seed=3
    )
    small = make_ranking_dataset(
        num_queries=6, num_features=8, avg_docs_per_query=12, seed=4
    )
    from quickrank_tpu.data.dataset import Dataset

    feats = np.vstack([big.features, small.features])
    labels = np.concatenate([big.labels, small.labels])
    qids = np.concatenate([big.qids.repeat(big.docs_per_query()),
                           (small.qids + 1000).repeat(small.docs_per_query())])
    ds = Dataset.from_arrays(feats, labels, qids, name="longlist")
    rb = RankBoost(ntrees=8, nthresholds=32, seed=1)
    info = rb.learn(ds, None, Ndcg(10), verbose=False)
    assert np.isfinite(info["train"]).all()
    assert info["train"][-1] >= info["train"][0] - 1e-6
    assert len(rb.features_) == 8


def test_rankboost_sharded_matches_single_device():
    """Weak-ranker choices derive only from psum'd S / potential histograms,
    so the learned (feature, theta, alpha) sequence must match the
    single-device run (rankboost.cc:300-347's OpenMP loops, distributed)."""
    train, valid, _ = make_train_valid_test(num_queries=(32, 12, 12))
    r1 = RankBoost(ntrees=12, nthresholds=32, seed=1)
    r1.learn(train, valid, Ndcg(10), verbose=False)
    r4 = RankBoost(ntrees=12, nthresholds=32, seed=1)
    r4.learn(train, valid, Ndcg(10), verbose=False, mesh=make_mesh(4))
    np.testing.assert_array_equal(r1.features_, r4.features_)
    np.testing.assert_allclose(r1.thetas_, r4.thetas_, rtol=1e-6)
    np.testing.assert_allclose(r1.alphas_, r4.alphas_, rtol=1e-3)


def test_rankboost_no_discordant_pairs_is_finite():
    """A training set where every query's docs share one label has zero
    pair-weight mass (S = 0).  The potentials and the running Z ratio must
    degrade to alpha = 0 — not 0/0 NaN — matching the explicit-D
    formulation where all of D is zero (rankboost.cc:276-292)."""
    from quickrank_tpu.data.dataset import Dataset

    rng = np.random.default_rng(0)
    n_q, dpq = 8, 10
    feats = rng.standard_normal((n_q * dpq, 6)).astype(np.float32)
    labels = np.repeat(np.arange(n_q) % 3, dpq).astype(np.float32)
    qids = np.repeat(np.arange(1, n_q + 1), dpq)
    ds = Dataset.from_arrays(feats, labels, qids, name="flat-labels")
    rb = RankBoost(ntrees=4, nthresholds=16, seed=0)
    info = rb.learn(ds, None, Ndcg(10), verbose=False)
    assert np.isfinite(info["train"]).all()
    assert np.allclose(rb.alphas_, 0.0)
