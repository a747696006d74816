"""Level-wise (depth-wise) tree growth — the TPU throughput mode.

A performance-oriented alternative to the reference-faithful best-first
grower (trees/grow.py): all fringe nodes of a level split in ONE batched
histogram computation (node-packed channels, ops/pallas_histogram.py), so a
depth-D tree costs ~D histogram passes instead of one per split — about 4x
fewer passes for 16-leaf trees.  Unlike oblivious trees, every node still
chooses its OWN (feature, threshold); unlike best-first, the tree is grown
breadth-first to a fixed depth, the standard depth-wise GBDT regime
(XGBoost's default).  This mode is an extension — the reference grows
best-first only (rt.cc:49-90) — and produces depth-capped trees that
automatically use the perfect-tree scoring kernel.

Gain/minls/routing semantics are identical to the best-first grower.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quickrank_tpu.ops.histogram import doc_channels, node_histograms
from quickrank_tpu.trees.grow import GrowConfig, _feature_sample_mask
from quickrank_tpu.trees.structs import Tree

NEG_INF = float("-inf")


def _route_bits(binned, f_sel, t_star, pos, n_nodes):
    """Per-doc routing bit ``binned[n, f_sel[pos[n]]] > t_star[pos[n]]``.

    Two exact contractions instead of elementwise gathers over the doc axis
    (which the TPU serializes ~50x slower): a bf16 one-hot matmul picks each
    node's split-feature column on the MXU (bin ids <= 255 are exact in
    bf16), and a [N, nodes] one-hot select picks each doc's own node's
    value and threshold."""
    F = binned.shape[1]
    sel = (f_sel[None, :] == jnp.arange(F)[:, None]).astype(jnp.bfloat16)
    fcols = jax.lax.dot_general(
        binned.astype(jnp.bfloat16), sel,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, nodes]
    own = pos[:, None] == jnp.arange(n_nodes)[None, :]
    val = jnp.sum(jnp.where(own, fcols, 0.0), axis=1)
    thr = jnp.sum(
        jnp.where(own, t_star[None, :].astype(jnp.float32), 0.0), axis=1
    )
    return val > thr


def fit_tree_levelwise(
    binned: jnp.ndarray,
    grad: jnp.ndarray,
    doc_mask: jnp.ndarray,
    thresholds: jnp.ndarray,
    depth: int,
    cfg: GrowConfig,
    key: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> tuple[Tree, jnp.ndarray]:
    """Grow a depth-``depth`` tree breadth-first (heap node layout: node i
    has children 2i+1/2i+2; leaves occupy [2^depth - 1, 2^(depth+1) - 1)).

    Returns (Tree without leaf values, node_of_doc over ALL docs).
    """
    N, F = binned.shape
    B = cfg.num_bins
    minls = cfg.min_leaf_support
    feat_axis = cfg.feat_axis
    F_global = F * cfg.feat_axis_size
    max_nodes = 2 ** (depth + 1) - 1
    if key is None:
        key = jax.random.PRNGKey(0)

    chan = doc_channels(grad, doc_mask)
    tree = Tree.empty(max_nodes)
    # level-local node index of each doc (0..2^d - 1 at level d)
    pos = jnp.zeros((N,), jnp.int32)
    # whether each doc's current node is still splittable (alive)
    nfs = cfg.num_feature_samples(F_global)

    for d in range(depth):
        n_nodes = 2**d
        base = n_nodes - 1  # heap id of first node at this level
        hist = node_histograms(binned, chan, pos, doc_mask, n_nodes, B)
        if axis_name is not None:
            hist = jax.lax.psum(hist, axis_name)
        key, sub = jax.random.split(key)
        feat_mask_g = _feature_sample_mask(sub, F_global, nfs)
        if feat_axis is None:
            feat_mask = feat_mask_g
        else:
            shard = jax.lax.axis_index(feat_axis)
            feat_mask = jax.lax.dynamic_slice(feat_mask_g, (shard * F,), (F,))

        cum = jnp.cumsum(hist, axis=2)  # [nodes, F, B, 3]
        lc = cum[..., 0]
        ls = cum[..., 1]
        tc = cum[:, :, -1:, 0]
        ts = cum[:, :, -1:, 1]
        rc = tc - lc
        rs = ts - ls
        gain = ls * ls / jnp.maximum(lc, 1.0) + rs * rs / jnp.maximum(rc, 1.0)
        valid = (
            (lc >= minls) & (rc >= minls) & feat_mask[None, :, None]
        )
        gain = jnp.where(valid, gain, NEG_INF)
        flat = jnp.argmax(gain.reshape(n_nodes, -1), axis=1)  # [nodes]
        f_loc = (flat // B).astype(jnp.int32)
        t_loc = (flat % B).astype(jnp.int32)
        best = jnp.take_along_axis(
            gain.reshape(n_nodes, -1), flat[:, None], axis=1
        )[:, 0]
        has_valid = jnp.any(valid.reshape(n_nodes, -1), axis=1)

        if feat_axis is None:
            f_star, t_star = f_loc, t_loc
            can = has_valid & (best > 0)
            thr_val = thresholds[f_star, t_star]
            # per-doc routing bit for its OWN node's split
            bit = _route_bits(binned, f_star, t_star, pos, n_nodes).astype(
                jnp.int32
            )
        else:
            shard = jax.lax.axis_index(feat_axis)
            cand = jnp.stack(
                [
                    jnp.where(has_valid, best, NEG_INF),
                    (shard * F + f_loc).astype(jnp.float32),
                    t_loc.astype(jnp.float32),
                ],
                axis=1,
            )  # [nodes, 3]
            allc = jax.lax.all_gather(cand, feat_axis)  # [k, nodes, 3]
            bidx = jnp.argmax(allc[:, :, 0], axis=0)  # [nodes]
            sel = jnp.take_along_axis(allc, bidx[None, :, None], axis=0)[0]
            can = jnp.isfinite(sel[:, 0]) & (sel[:, 0] > 0)
            f_star = sel[:, 1].astype(jnp.int32)  # GLOBAL
            t_star = sel[:, 2].astype(jnp.int32)
            owns = (f_star // F) == shard
            fl = jnp.where(owns, f_star % F, 0)
            my_bit = _route_bits(binned, fl, t_star, pos, n_nodes)
            my_owns = owns[pos]
            bit = jax.lax.psum(
                (my_bit & my_owns).astype(jnp.int32), feat_axis
            )
            thr_val = jax.lax.psum(
                jnp.where(owns, thresholds[fl, t_star], 0.0), feat_axis
            )

        # write this level's internal nodes
        ids = base + jnp.arange(n_nodes)
        tree = tree.replace(
            feature=tree.feature.at[ids].set(jnp.where(can, f_star, -1)),
            threshold=tree.threshold.at[ids].set(
                jnp.where(can, thr_val, 0.0)
            ),
            threshold_bin=tree.threshold_bin.at[ids].set(
                jnp.where(can, t_star, -1)
            ),
            left=tree.left.at[ids].set(jnp.where(can, 2 * ids + 1, 0)),
            right=tree.right.at[ids].set(jnp.where(can, 2 * ids + 2, 0)),
            is_leaf=tree.is_leaf.at[ids].set(~can),
        )
        # docs in un-split nodes keep routing left (bit forced 0) so their
        # leaf-range collapse matches the perfect-tree embedding convention
        bit = jnp.where(can[pos], bit, 0)
        pos = 2 * pos + bit

    # Final doc node id: replay each doc's recorded path bits over the tree
    # arrays, stopping at the first ancestor that stayed a leaf.  No feature
    # gathers, so this works unchanged under feature sharding.
    node = jnp.zeros((N,), jnp.int32)
    for d in range(depth):
        b = (pos >> (depth - 1 - d)) & 1
        nxt = jnp.where(b == 1, tree.right[node], tree.left[node])
        node = jnp.where(tree.is_leaf[node], node, nxt).astype(jnp.int32)
    return tree, node
