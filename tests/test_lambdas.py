"""Lambda-gradient kernel tests: parity with a direct numpy transcription of
the reference's pair-loop semantics (lambdamart.cc:113-143), chunking
equivalence, and sample-cleaning behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from quickrank_tpu.metrics import Ndcg
from quickrank_tpu.metrics.core import ndcg_delta_matrix, rank_order
from quickrank_tpu.ops.lambdas import lambda_gradients


def _numpy_reference_lambdas(scores, labels, cutoff):
    """Scalar transcription of the reference loop: rank docs by score,
    for ordered rank pairs (j, k), j != k, skipping once both are beyond the
    cutoff, when label_j > label_k accumulate rho-weighted |DeltaNDCG|."""
    n = len(scores)
    order = np.argsort(-scores, kind="stable")  # rank -> doc
    slabels = labels[order]
    # ideal DCG
    disc = 1.0 / np.log2(np.arange(n) + 2.0)
    disc_cut = np.where(np.arange(n) < cutoff, disc, 0.0)
    ideal = np.sort(labels)[::-1]
    idcg = np.sum((2.0**ideal - 1.0) * disc_cut)
    lam = np.zeros(n)
    w = np.zeros(n)
    if idcg <= 0:
        return lam, w
    for j in range(n):
        for k in range(n):
            if j == k:
                continue
            if j >= cutoff and k >= cutoff:
                break
            if slabels[j] > slabels[k]:
                dj = disc_cut[j]
                dk = disc_cut[k]
                delta = abs((dk - dj) * (2.0 ** slabels[j] - 2.0 ** slabels[k]) / idcg)
                dj_doc, dk_doc = order[j], order[k]
                rho = 1.0 / (1.0 + np.exp(scores[dj_doc] - scores[dk_doc]))
                lam[dj_doc] += rho * delta
                lam[dk_doc] -= rho * delta
                w[dj_doc] += rho * (1 - rho) * delta
                w[dk_doc] += rho * (1 - rho) * delta
    return lam, w


def test_lambda_kernel_matches_reference_loop(rng):
    Q, D, cutoff = 5, 24, 10
    scores = rng.normal(size=(Q, D)).astype(np.float32)
    labels = rng.integers(0, 5, size=(Q, D)).astype(np.float32)
    nvalid = rng.integers(8, D + 1, size=Q).astype(np.int32)
    slot_mask = np.arange(D)[None, :] < nvalid[:, None]
    labels = np.where(slot_mask, labels, 0)

    lam, w = lambda_gradients(
        jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(slot_mask),
        jnp.asarray(nvalid), Ndcg(cutoff),
    )
    lam, w = np.asarray(lam), np.asarray(w)
    for q in range(Q):
        n = nvalid[q]
        ref_l, ref_w = _numpy_reference_lambdas(
            scores[q, :n].astype(np.float64), labels[q, :n].astype(np.float64),
            cutoff,
        )
        np.testing.assert_allclose(lam[q, :n], ref_l, rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(w[q, :n], ref_w, rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(lam[q, n:], 0)


def test_lambda_chunking_equivalence(rng):
    Q, D = 8, 16
    scores = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=(Q, D)).astype(np.float32))
    mask = jnp.ones((Q, D), bool)
    nvalid = jnp.full((Q,), D, jnp.int32)
    m = Ndcg(10)
    l0, w0 = lambda_gradients(scores, labels, mask, nvalid, m)
    l1, w1 = lambda_gradients(scores, labels, mask, nvalid, m, query_chunk=2)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), atol=1e-6)
    # non-divisor chunk: Q=8 pads to 9 (r5 — previously the auto-chunk
    # walked down to a divisor, collapsing to 1-query chunks for prime Q)
    l2, w2 = lambda_gradients(scores, labels, mask, nvalid, m, query_chunk=3)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w2), atol=1e-6)


def test_lambda_sign_convention(rng):
    """The top-labeled doc must receive positive lambda when mis-ranked."""
    scores = jnp.asarray([[0.0, 1.0]], jnp.float32)  # doc1 ranked above doc0
    labels = jnp.asarray([[2.0, 0.0]], jnp.float32)  # but doc0 is relevant
    mask = jnp.ones((1, 2), bool)
    nvalid = jnp.asarray([2], jnp.int32)
    lam, w = lambda_gradients(scores, labels, mask, nvalid, Ndcg(10))
    lam = np.asarray(lam)[0]
    assert lam[0] > 0 and lam[1] < 0
    assert np.asarray(w).min() >= 0


def test_banded_lambda_matches_full(rng):
    """The cutoff-banded fast path must reproduce the full pair computation
    (swap deltas vanish beyond the cutoff for DCG/NDCG)."""
    from quickrank_tpu.ops.lambdas import _lambda_block, _lambda_block_banded
    from quickrank_tpu.metrics import Dcg

    Q, D = 6, 48
    scores = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=(Q, D)).astype(np.float32))
    nvalid = jnp.asarray(rng.integers(10, D + 1, size=Q).astype(np.int32))
    mask = jnp.arange(D)[None, :] < nvalid[:, None]
    labels = jnp.where(mask, labels, 0)
    for m in (Ndcg(10), Dcg(10), Ndcg(3)):
        l0, w0 = _lambda_block(scores, labels, mask, nvalid, m)
        l1, w1 = _lambda_block_banded(scores, labels, mask, nvalid, m)
        # rtol term: the two forms sum the same pair terms in different
        # orders, and XLA's fusion choices (which vary with compile
        # context) move the result by a last ulp on O(10) magnitudes —
        # a pure atol=2e-6 flaked at exactly 1 element / 288
        np.testing.assert_allclose(
            np.asarray(l0), np.asarray(l1), rtol=2e-6, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(w0), np.asarray(w1), rtol=2e-6, atol=2e-6
        )
