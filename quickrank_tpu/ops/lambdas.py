"""Pairwise LambdaRank gradient kernel.

Vectorized replacement of ``LambdaMart::compute_pseudoresponses``
(src/learning/forests/lambdamart.cc:62-152): instead of a per-query OpenMP
loop with an O(n^2) scalar pair walk, all queries are processed as a batched
``[Q, D, D]`` pair tensor (optionally in query chunks to bound memory — the
TPU analog of the reference's cutoff ``break`` at lambdamart.cc:124-126 is a
pair mask).

Per query, for every rank pair (j, k) with label_j > label_k and not both
beyond the metric cutoff:

    rho    = 1 / (1 + exp(s_j - s_k))          (lambdamart.cc:132-134)
    lambda_j += rho * |Delta_jk|,   lambda_k -= rho * |Delta_jk|
    w_j    += rho (1-rho) |Delta_jk|,  w_k    += the same

where Delta is the metric's rank-space swap-delta matrix ("jacobian").
Outputs are mapped from rank space back to doc slots via the score argsort
permutation (the pos_of_rank unmap of rankedresults.h:37-75).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quickrank_tpu.metrics import core


def _lambda_block(scores, labels, slot_mask, nvalid, metric):
    """One query block: returns (lambdas, weights) in *slot* space [C, D]."""
    order = core.rank_order(scores, slot_mask)
    ss = jnp.take_along_axis(scores, order, axis=-1)
    sl = jnp.take_along_axis(labels, order, axis=-1)
    sm = jnp.take_along_axis(slot_mask, order, axis=-1)
    sl = jnp.where(sm, sl, 0.0)

    delta = jnp.abs(metric.delta_matrix(ss, sl, sm, nvalid))  # [C, D, D]

    D = scores.shape[-1]
    cut = min(metric.cutoff, D)
    r = jnp.arange(D)
    beyond = r >= cut
    pair_mask = (
        (sl[..., :, None] > sl[..., None, :])
        & sm[..., :, None]
        & sm[..., None, :]
        & ~(beyond[None, :, None] & beyond[None, None, :])
    )

    # rho = sigmoid(s_k - s_j): large when the pair is mis-ordered.
    rho = jax.nn.sigmoid(ss[..., None, :] - ss[..., :, None])
    m = jnp.where(pair_mask, rho * delta, 0.0)
    mw = jnp.where(pair_mask, rho * (1.0 - rho) * delta, 0.0)

    lam_rank = jnp.sum(m, axis=-1) - jnp.sum(m, axis=-2)
    w_rank = jnp.sum(mw, axis=-1) + jnp.sum(mw, axis=-2)

    ranks = core.inverse_permutation(order)
    lam = jnp.take_along_axis(lam_rank, ranks, axis=-1)
    w = jnp.take_along_axis(w_rank, ranks, axis=-1)
    return (
        jnp.where(slot_mask, lam, 0.0).astype(jnp.float32),
        jnp.where(slot_mask, w, 0.0).astype(jnp.float32),
    )


def lambda_gradients(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    slot_mask: jnp.ndarray,
    nvalid: jnp.ndarray,
    metric,
    query_chunk: Optional[int] = None,
):
    """Batched lambda/weight gradients over padded per-query views.

    scores/labels: f32 [Q, D]; slot_mask: bool [Q, D]; nvalid: i32 [Q].
    Returns (lambdas [Q, D], weights [Q, D]) in slot space.
    ``query_chunk`` bounds the live [chunk, D, D] pair tensor; by default a
    chunk is chosen automatically so the pair tensors stay under ~1 GB (the
    reference bounds the pair loop with the metric cutoff break,
    lambdamart.cc:124-126 — here padded blocks + masking play that role).
    """
    Q, D = scores.shape
    if query_chunk is None:
        # ~6 live [C, D, D] f32 tensors; keep them under ~1 GB total
        budget = (1 << 30) // (6 * 4 * max(D * D, 1))
        if budget >= Q:
            query_chunk = Q
        else:
            query_chunk = max(1, budget)
            while Q % query_chunk:
                query_chunk -= 1
    if query_chunk >= Q:
        return _lambda_block(scores, labels, slot_mask, nvalid, metric)
    assert Q % query_chunk == 0, (Q, query_chunk)
    C = Q // query_chunk

    def one(args):
        s, l, m, n = args
        return _lambda_block(s, l, m, n, metric)

    resh = lambda x: x.reshape((C, query_chunk) + x.shape[1:])  # noqa: E731
    lam, w = jax.lax.map(
        one, (resh(scores), resh(labels), resh(slot_mask), resh(nvalid))
    )
    return lam.reshape(scores.shape), w.reshape(scores.shape)
