"""Split-statistics histograms over binned features.

TPU-native replacement of ``RTNodeHistogram`` (include/learning/tree/
rtnode_histogram.h:26, src/learning/tree/rtnode_histogram.cc:41-217): instead
of per-node cumulative ``sumlbl[f][t]`` / ``count[f][t]`` arrays rebuilt with
OpenMP loops, histograms are dense ``[F, B, C]`` tensors built by one
scatter-add over the doc axis and cumulative sums are taken at gain-scan time.

Channels (C axis): 0 = doc count, 1 = sum of gradients (pseudoresponses),
2 = sum of squared gradients (backs the node deviance used as the best-first
split priority, rt.cc:59-76).

In sharded training each chip builds the histogram of its local docs and the
results are ``psum``-reduced over the mesh axis — the single cross-chip
collective of the training loop (SURVEY.md §2.9).
"""

from __future__ import annotations

import jax.numpy as jnp

NCHANNELS = 3  # count, sum_grad, sum_grad_sq


def doc_channels(grad: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-doc channel values ``[N, 3]`` = (1, g, g^2), zeroed where masked."""
    m = mask.astype(grad.dtype)
    return jnp.stack([m, grad * m, grad * grad * m], axis=-1)


def _on_tpu() -> bool:
    import jax as _jax

    try:
        return _jax.default_backend() == "tpu"
    except Exception:
        return False


def masked_histogram(
    binned: jnp.ndarray,
    values: jnp.ndarray,
    mask: jnp.ndarray,
    num_bins: int,
) -> jnp.ndarray:
    """Histogram of one doc subset: ``hist[f, b, c] = sum over docs in mask
    with bin(doc, f) == b of values[doc, c]``.

    binned: i32 ``[N, F]``; values: ``[N, C]``; mask: bool ``[N]``.
    Returns ``[F, B, C]`` float32.

    Dispatch: the MXU Pallas kernel on TPU (ops/pallas_histogram.py), the
    scatter-add fallback elsewhere.
    """
    if _on_tpu():
        # channel-major select ([C, N] — ~3x less HBM traffic than the
        # 8-lane-padded doc-major [N, C] form), then the node kernel with
        # the mask folded in as a two-node id row: out-of-mask docs route
        # to node 1, whose channels are never read back
        vt = jnp.where(mask[None, :], values.T, 0.0)
        return masked_histogram_t(binned, vt, mask, num_bins)
    return masked_histogram_scatter(binned, values, mask, num_bins)


def masked_histogram_t(
    binned: jnp.ndarray,
    values_t: jnp.ndarray,
    mask: jnp.ndarray,
    num_bins: int,
    f_used: int = 0,
) -> jnp.ndarray:
    """:func:`masked_histogram` from CHANNEL-MAJOR premasked values.

    ``values_t`` is f32 ``[C, N]`` with zero columns outside the *constant*
    doc/sample mask (so it can be built once per tree); ``mask`` carries the
    per-call subset bits only.  On TPU the subset select happens INSIDE the
    Pallas kernel (``pos`` row, an [N] i32 per call) instead of an [N, C]
    doc-major select + layout copy per call — the same trick that made
    level-wise growth fast (ops/pallas_histogram.py::_node_kernel).  The
    best-first grower calls this once per split (trees/grow.py::hist_of).
    """
    if _on_tpu():
        from quickrank_tpu.ops.pallas_histogram import node_histogram_pallas

        pos = jnp.where(mask, 0, 1).astype(jnp.int32)
        return node_histogram_pallas(
            binned, values_t, pos, num_bins, 0, 1, f_used=f_used
        )
    if f_used:
        binned = binned[:, :f_used]
    return masked_histogram_scatter(binned, values_t.T, mask, num_bins)


def masked_histogram_scatter(
    binned: jnp.ndarray,
    values: jnp.ndarray,
    mask: jnp.ndarray,
    num_bins: int,
) -> jnp.ndarray:
    """Scatter-add implementation (one pass over N x F).  Masked docs are
    routed to a dummy overflow bin that is sliced away."""
    binned = binned.astype(jnp.int32)  # u8 storage would overflow the keys
    N, F = binned.shape
    C = values.shape[-1]
    # Masked docs go to an extra trash bin per feature.
    safe_bins = jnp.where(mask[:, None], binned, num_bins)
    fidx = jnp.arange(F, dtype=jnp.int32)[None, :]
    flat = fidx * (num_bins + 1) + safe_bins  # [N, F]
    vals = jnp.broadcast_to(values[:, None, :], (N, F, C))
    hist = jnp.zeros((F * (num_bins + 1), C), dtype=jnp.float32)
    hist = hist.at[flat.reshape(-1)].add(
        vals.reshape(-1, C), mode="drop", unique_indices=False
    )
    return hist.reshape(F, num_bins + 1, C)[:, :num_bins, :]


def node_histograms(
    binned: jnp.ndarray,
    values: jnp.ndarray,
    node_of_doc: jnp.ndarray,
    doc_mask: jnp.ndarray,
    num_nodes: int,
    num_bins: int,
    values_premasked: bool = False,
) -> jnp.ndarray:
    """Histograms for every node at once: ``[num_nodes, F, B, C]``.

    The batched equivalent of building an RTNodeHistogram per fringe node
    (rtnode_histogram.cc:41-70).  Docs with node id outside [0, num_nodes)
    or masked out contribute nothing.  On TPU the MXU kernel packs several
    nodes' channels per pass and selects node membership IN the kernel
    (ops/pallas_histogram.py::node_histogram_pallas); elsewhere one flat
    scatter-add.  Pass ``values_premasked=True`` when value rows of docs
    outside ``doc_mask`` are already zero — it skips an [N, C] select that
    otherwise round-trips HBM.
    """
    if _on_tpu():
        from quickrank_tpu.ops.pallas_histogram import node_histogram_pallas

        N, F = binned.shape
        C = values.shape[-1]
        if not values_premasked:
            values = jnp.where(doc_mask[:, None], values, 0.0)
        # channel-major for the kernel: a doc-major [N, small-C] f32 array
        # is 128-lane padded on device (see _node_kernel docstring); the
        # transpose fuses into the kernel operand build
        vt = values.T
        # pack several nodes' channel groups into one kernel pass (the
        # channel axis is the matmul M dimension, so packing raises MXU
        # occupancy and turns per-level growth into ~1 pass per level)
        per_pass = max(1, 32 // C)
        outs = []
        for n0 in range(0, num_nodes, per_pass):
            k = min(per_pass, num_nodes - n0)
            h = node_histogram_pallas(
                binned, vt, node_of_doc, num_bins, n0, k
            )  # [F, B, k*C]
            outs.append(
                jnp.moveaxis(h.reshape(F, h.shape[1], k, C), 2, 0)
            )
        return jnp.concatenate(outs, axis=0)
    return node_histograms_scatter(
        binned, values, node_of_doc, doc_mask, num_nodes, num_bins
    )


def node_histograms_scatter(
    binned: jnp.ndarray,
    values: jnp.ndarray,
    node_of_doc: jnp.ndarray,
    doc_mask: jnp.ndarray,
    num_nodes: int,
    num_bins: int,
) -> jnp.ndarray:
    """Scatter-add implementation keyed by (node, feature, bin)."""
    binned = binned.astype(jnp.int32)  # u8 storage would overflow the keys
    N, F = binned.shape
    C = values.shape[-1]
    ok = doc_mask & (node_of_doc >= 0) & (node_of_doc < num_nodes)
    node = jnp.where(ok, node_of_doc, num_nodes)
    fidx = jnp.arange(F, dtype=jnp.int32)[None, :]
    # out-of-range bin ids (bin == num_bins happens for features past the
    # FLT_MAX sentinel, e.g. +inf values) are DROPPED per (doc, feature)
    # element — the same semantic as the Pallas kernel's one-hot (no
    # column matches) and masked_histogram_scatter's trash bin; a clamp
    # here would count such docs in the top bin on CPU only, diverging
    # trees between backends.
    bin_ok = (binned >= 0) & (binned < num_bins)
    node_elem = jnp.where(bin_ok, node[:, None], num_nodes)
    flat = (node_elem * F + fidx) * num_bins + jnp.clip(
        binned, 0, num_bins - 1
    )
    vals = jnp.broadcast_to(values[:, None, :], (N, F, C))
    hist = jnp.zeros(((num_nodes + 1) * F * num_bins, C), dtype=jnp.float32)
    hist = hist.at[flat.reshape(-1)].add(
        vals.reshape(-1, C), mode="drop", unique_indices=False
    )
    return hist.reshape(num_nodes + 1, F, num_bins, C)[:num_nodes]
