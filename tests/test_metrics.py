"""Metric oracle tests — counterpart of catch-unit-tests/metric/ir/*:
hand-computed DCG/NDCG values and jacobian-vs-brute-force-swap equivalence
(test-ndcg.cc:37-66 style), plus numpy cross-checks on random data."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from quickrank_tpu.metrics import Dcg, Map, Ndcg, Rmse, Tndcg, metric_factory
from quickrank_tpu.metrics import core


def pad(arrs, D=None, fill=0.0):
    """list of 1-D arrays -> (padded [Q, D], mask, nvalid)"""
    D = D or max(len(a) for a in arrs)
    Q = len(arrs)
    out = np.full((Q, D), fill, dtype=np.float32)
    mask = np.zeros((Q, D), dtype=bool)
    nv = np.zeros((Q,), dtype=np.int32)
    for i, a in enumerate(arrs):
        out[i, : len(a)] = a
        mask[i, : len(a)] = True
        nv[i] = len(a)
    return jnp.asarray(out), jnp.asarray(mask), jnp.asarray(nv)


def ref_dcg(labels_by_rank, k):
    return sum(
        (2.0 ** l - 1.0) / math.log2(i + 2.0)
        for i, l in enumerate(labels_by_rank[:k])
    )


class TestDcgNdcg:
    # hand-built list: labels in dataset order, scores ranking them
    labels = np.array([3, 2, 0, 1, 0], dtype=np.float32)
    scores = np.array([5.0, 4.0, 3.0, 2.0, 1.0], dtype=np.float32)  # identity rank

    def test_dcg_values(self):
        s, m, nv = pad([self.scores])
        l, _, _ = pad([self.labels])
        for k in (1, 2, 3, 5, 10):
            got = float(Dcg(k).evaluate_per_query(s, l, m, nv)[0])
            assert got == pytest.approx(ref_dcg(self.labels, k), rel=1e-4)

    def test_dcg_respects_score_order(self):
        scores = np.array([1.0, 2.0, 5.0, 4.0, 3.0], dtype=np.float32)
        s, m, nv = pad([scores])
        l, _, _ = pad([self.labels])
        order = np.argsort(-scores, kind="stable")
        expect = ref_dcg(self.labels[order], 3)
        assert float(Dcg(3).evaluate_per_query(s, l, m, nv)[0]) == pytest.approx(
            expect, rel=1e-4
        )

    def test_ndcg_values(self):
        s, m, nv = pad([self.scores])
        l, _, _ = pad([self.labels])
        ideal = np.sort(self.labels)[::-1]
        for k in (1, 3, 5):
            expect = ref_dcg(self.labels, k) / ref_dcg(ideal, k)
            got = float(Ndcg(k).evaluate_per_query(s, l, m, nv)[0])
            assert got == pytest.approx(expect, rel=1e-4)

    def test_ndcg_zero_idcg(self):
        # all labels 0 -> idcg == 0 -> ndcg == 0 (ndcg.cc:55-58)
        s, m, nv = pad([self.scores])
        l, _, _ = pad([np.zeros(5, dtype=np.float32)])
        assert float(Ndcg(5).evaluate_per_query(s, l, m, nv)[0]) == 0.0

    def test_mean_over_queries(self):
        s, m, nv = pad([self.scores, self.scores[:3]])
        l, _, _ = pad([self.labels, self.labels[:3]])
        pq = Ndcg(10).evaluate_per_query(s, l, m, nv)
        qmask = jnp.asarray([True, True])
        met = Ndcg(10)
        num, den = met.aggregate(pq, qmask)
        assert float(met.finalize(num, den)) == pytest.approx(
            float((pq[0] + pq[1]) / 2.0), rel=1e-5
        )


class TestSwapEquivalence:
    """Closed-form delta matrices must equal brute-force swap re-evaluation."""

    @pytest.fixture(scope="class")
    def ranked(self):
        rng = np.random.default_rng(3)
        lists = [
            rng.integers(0, 5, size=n).astype(np.float32) for n in (8, 13, 5, 20)
        ]
        scores = [np.sort(rng.normal(size=len(l)))[::-1].copy() for l in lists]
        sl, sm, nv = pad(lists)
        ss, _, _ = pad(scores, fill=-np.inf)
        return ss, sl, sm, nv

    @pytest.mark.parametrize("cutoff", [3, 10, 1 << 30])
    def test_ndcg_jacobian_vs_swap(self, ranked, cutoff):
        ss, sl, sm, nv = ranked
        fast = core.ndcg_delta_matrix(sl, sm, nv, cutoff, normalize=True)

        def metric_on_sorted(sorted_labels, nvalid):
            D = sorted_labels.shape[-1]
            disc = core.discounts(D, cutoff, nvalid)
            d = jnp.sum(core.gains(jnp.where(sm, sorted_labels, 0.0)) * disc, axis=-1)
            idcg = core.ideal_dcg(sorted_labels, sm, nvalid, cutoff)
            return jnp.where(idcg > 0, d / jnp.maximum(idcg, 1e-30), 0.0)

        brute = core.generic_swap_delta_matrix(metric_on_sorted, sl, sm, nv)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(brute), atol=2e-5)

    @pytest.mark.parametrize("cutoff", [3, 10])
    def test_dcg_jacobian_vs_swap(self, ranked, cutoff):
        ss, sl, sm, nv = ranked
        fast = core.ndcg_delta_matrix(sl, sm, nv, cutoff, normalize=False)

        def metric_on_sorted(sorted_labels, nvalid):
            D = sorted_labels.shape[-1]
            disc = core.discounts(D, cutoff, nvalid)
            return jnp.sum(
                core.gains(jnp.where(sm, sorted_labels, 0.0)) * disc, axis=-1
            )

        brute = core.generic_swap_delta_matrix(metric_on_sorted, sl, sm, nv)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(brute), atol=2e-5)

    def test_map_jacobian_vs_swap(self, ranked):
        ss, sl, sm, nv = ranked
        fast = core.map_delta_matrix(sl, sm, nv, 1 << 30)

        def metric_on_sorted(sorted_labels, nvalid):
            D = sorted_labels.shape[-1]
            r = jnp.arange(D, dtype=jnp.float32)
            valid = (r[None, :] < nvalid[:, None]) & sm
            rel = jnp.where(valid & (sorted_labels > 0), 1.0, 0.0)
            rc = jnp.cumsum(rel, axis=-1)
            ap = jnp.sum(rel * rc / (r[None, :] + 1.0), axis=-1)
            n = jnp.sum(rel, axis=-1)
            return jnp.where(n > 0, ap / jnp.maximum(n, 1.0), 0.0)

        brute = core.generic_swap_delta_matrix(metric_on_sorted, sl, sm, nv)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(brute), atol=2e-5)

    def test_tndcg_jacobian_no_ties_matches_ndcg(self, ranked):
        # with strictly decreasing scores there are no ties; TNDCG == NDCG
        ss, sl, sm, nv = ranked
        t = core.tndcg_delta_matrix(sl, ss, sm, nv, 10)
        n = core.ndcg_delta_matrix(sl, sm, nv, 10, normalize=True)
        np.testing.assert_allclose(np.asarray(t), np.asarray(n), atol=2e-5)


class TestTndcg:
    def test_ties_averaged(self):
        labels = np.array([3, 1, 2, 0], dtype=np.float32)
        scores = np.array([2.0, 1.0, 1.0, 0.5], dtype=np.float32)
        s, m, nv = pad([scores])
        l, _, _ = pad([labels])
        # tie group at ranks 1,2 (labels 1 and 2): avg gain = (1 + 3)/2 = 2
        g0 = 2.0 ** 3 - 1
        avg = ((2.0 ** 1 - 1) + (2.0 ** 2 - 1)) / 2.0
        g3 = 0.0
        tdcg = g0 / math.log2(2) + avg / math.log2(3) + avg / math.log2(4) + g3
        idcg = ref_dcg(np.sort(labels)[::-1], 10)
        got = float(Tndcg(10).evaluate_per_query(s, l, m, nv)[0])
        assert got == pytest.approx(tdcg / idcg, rel=1e-4)

    def test_no_ties_equals_ndcg(self):
        labels = np.array([3, 1, 2, 0, 1], dtype=np.float32)
        scores = np.array([5.0, 4.0, 3.0, 2.0, 1.0], dtype=np.float32)
        s, m, nv = pad([scores])
        l, _, _ = pad([labels])
        a = float(Tndcg(3).evaluate_per_query(s, l, m, nv)[0])
        b = float(Ndcg(3).evaluate_per_query(s, l, m, nv)[0])
        assert a == pytest.approx(b, rel=1e-5)


class TestMapRmse:
    def test_map_hand_value(self):
        labels = np.array([1, 0, 1, 0, 1], dtype=np.float32)
        scores = np.array([5.0, 4.0, 3.0, 2.0, 1.0], dtype=np.float32)
        s, m, nv = pad([scores])
        l, _, _ = pad([labels])
        expect = (1 / 1 + 2 / 3 + 3 / 5) / 3
        assert float(Map(10).evaluate_per_query(s, l, m, nv)[0]) == pytest.approx(
            expect, rel=1e-5
        )

    def test_rmse_negated(self):
        labels = np.array([1.0, 0.0, 2.0], dtype=np.float32)
        scores = np.array([0.5, 0.0, 1.0], dtype=np.float32)
        s, m, nv = pad([scores])
        l, _, _ = pad([labels])
        met = Rmse()
        pq = met.evaluate_per_query(s, l, m, nv)
        num, den = met.aggregate(pq, jnp.asarray([True]), jnp.asarray(3))
        expect = -math.sqrt((0.25 + 0.0 + 1.0) / 3)
        assert float(met.finalize(num, den)) == pytest.approx(expect, rel=1e-5)


def test_factory():
    assert isinstance(metric_factory("ndcg", 10), Ndcg)
    assert isinstance(metric_factory("NDCG@10"), Ndcg)
    assert metric_factory("MAP@7").cutoff == 7
    assert isinstance(metric_factory("tndcg", 5), Tndcg)
    assert isinstance(metric_factory("RMSE"), Rmse)
    with pytest.raises(ValueError):
        metric_factory("NOPE")
    assert repr(metric_factory("NDCG@10")) == "NDCG@10"
