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


def _lambda_block_banded(scores, labels, slot_mask, nvalid, metric):
    """Cutoff-banded lambda block for DCG/NDCG.

    The reference's pair loop breaks once both ranks are beyond the metric
    cutoff (lambdamart.cc:124-126) because their swap deltas are zero; the
    batched analog computes only the two rectangular pair blocks touching
    the cutoff — A (rows j < cut, all k) and B (all j, cols k < cut) —
    instead of the full [D, D] tensor:

        lambda[r<cut] = rowsum_A[r] - colsum_B[r]
        lambda[r>=cut] = rowsum_B[r] - colsum_A[r]
        w[r<cut]     = rowsum_Aw[r] + colsum_Bw[r]
        w[r>=cut]    = rowsum_Bw[r] + colsum_Aw[r]

    ~D/(2 cut) times less pair work/memory (65x at MSLR list lengths).
    """
    from quickrank_tpu.metrics.metrics import Dcg, Ndcg

    normalize = type(metric) is Ndcg
    order = core.rank_order(scores, slot_mask)
    ss = jnp.take_along_axis(scores, order, axis=-1)
    sl = jnp.take_along_axis(labels, order, axis=-1)
    sm = jnp.take_along_axis(slot_mask, order, axis=-1)
    sl = jnp.where(sm, sl, 0.0)

    D = scores.shape[-1]
    cut = min(metric.cutoff, D)
    disc = core.discounts(D, metric.cutoff, nvalid)  # zero beyond cut/nvalid
    g = jnp.where(sm, jnp.exp2(sl), 0.0)
    if normalize:
        idcg = core.ideal_dcg(sl, sm, nvalid, metric.cutoff)
        inv = jnp.where(idcg > 0, 1.0 / jnp.maximum(idcg, 1e-30), 0.0)
    else:
        inv = jnp.ones(scores.shape[:-1], scores.dtype)

    def block(j_sl, j_ss, j_sm, j_disc, j_g, k_sl, k_ss, k_sm, k_disc, k_g):
        # f[j, k] = mask * rho * |delta|, fw likewise with rho(1-rho)
        delta = jnp.abs(
            (k_disc[..., None, :] - j_disc[..., :, None])
            * (j_g[..., :, None] - k_g[..., None, :])
        ) * inv[..., None, None]
        mask = (
            (j_sl[..., :, None] > k_sl[..., None, :])
            & j_sm[..., :, None]
            & k_sm[..., None, :]
        )
        rho = jax.nn.sigmoid(k_ss[..., None, :] - j_ss[..., :, None])
        f = jnp.where(mask, rho * delta, 0.0)
        fw = jnp.where(mask, rho * (1.0 - rho) * delta, 0.0)
        return f, fw

    c = lambda x: x[..., :cut]  # noqa: E731
    A, Aw = block(
        c(sl), c(ss), c(sm), c(disc), c(g), sl, ss, sm, disc, g
    )  # [C, cut, D]
    B, Bw = block(
        sl, ss, sm, disc, g, c(sl), c(ss), c(sm), c(disc), c(g)
    )  # [C, D, cut]

    rowsum_A = jnp.sum(A, axis=-1)  # [C, cut]
    colsum_A = jnp.sum(A, axis=-2)  # [C, D]
    rowsum_B = jnp.sum(B, axis=-1)  # [C, D]
    colsum_B = jnp.sum(B, axis=-2)  # [C, cut]
    rowsum_Aw = jnp.sum(Aw, axis=-1)
    colsum_Aw = jnp.sum(Aw, axis=-2)
    rowsum_Bw = jnp.sum(Bw, axis=-1)
    colsum_Bw = jnp.sum(Bw, axis=-2)

    in_cut = jnp.arange(D) < cut
    pad = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, D - cut)])  # noqa: E731
    lam_rank = jnp.where(
        in_cut, pad(rowsum_A) - pad(colsum_B), rowsum_B - colsum_A
    )
    w_rank = jnp.where(
        in_cut, pad(rowsum_Aw) + pad(colsum_Bw), rowsum_Bw + colsum_Aw
    )

    ranks = core.inverse_permutation(order)
    lam = jnp.take_along_axis(lam_rank, ranks, axis=-1)
    w = jnp.take_along_axis(w_rank, ranks, axis=-1)
    return (
        jnp.where(slot_mask, lam, 0.0).astype(jnp.float32),
        jnp.where(slot_mask, w, 0.0).astype(jnp.float32),
    )


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
    from quickrank_tpu.metrics.metrics import Dcg, Ndcg

    Q, D = scores.shape
    cut = min(metric.cutoff, D)
    # Cutoff-banded fast path for DCG/NDCG (swap deltas vanish beyond the
    # cutoff, mirroring the reference's loop break, lambdamart.cc:124-126).
    banded = type(metric) in (Dcg, Ndcg) and 3 * cut <= D
    block = _lambda_block_banded if banded else _lambda_block
    pair_elems = (2 * cut * D) if banded else (D * D)
    if query_chunk is None:
        # ~6 live pair tensors; keep them under ~1 GB total
        budget = (1 << 30) // (6 * 4 * max(pair_elems, 1))
        if budget >= Q:
            query_chunk = Q
        else:
            query_chunk = max(1, budget)
            while Q % query_chunk:
                query_chunk -= 1
    if query_chunk >= Q:
        return block(scores, labels, slot_mask, nvalid, metric)
    assert Q % query_chunk == 0, (Q, query_chunk)
    C = Q // query_chunk

    def one(args):
        s, l, m, n = args
        return block(s, l, m, n, metric)

    resh = lambda x: x.reshape((C, query_chunk) + x.shape[1:])  # noqa: E731
    lam, w = jax.lax.map(
        one, (resh(scores), resh(labels), resh(slot_mask), resh(nvalid))
    )
    return lam.reshape(scores.shape), w.reshape(scores.shape)
