"""Best-first growth over a node-clustered work buffer (TPU fast path).

Semantically the same grower as trees/grow.py::fit_tree (same split
priority, gains, minls veto, routing, leaf assignment — rt.cc:49-355),
re-engineered so every tree node's docs occupy a contiguous, TILE-aligned
run of rows of a work buffer.  Each per-split histogram pass then touches
only the splitting node's tiles — the histogram kernel's data-dependent
tile skip (3.5x at 1/8 live, scripts/bench_nodesweep.py) fires on every
pass instead of only on lucky doc orders — and after the split the node's
run is re-partitioned into its two children by the MXU partition kernel
(ops/pallas_partition.py) instead of a 40-115 ms XLA row scatter.

The work buffer is ``[N_work, W] u8``: binned features in columns
``[0, F)`` plus per-doc payload bytes in the pad columns —
``grad`` as its 4 little-endian f32 bytes (bitcast, exact),
a count/mask byte, and the node id as ``pos + 1`` (0 = dead row).
Payload bytes ride the partition matmul exactly (u8 <= 255 is exact in
bf16), so per-split channel values are rebuilt from the buffer itself
with one bitcast — no cross-order gathers anywhere in the loop.

The final per-doc leaf assignment is recomputed over the ORIGINAL doc
order by a matmul-form descent (exact, bin-space routing), so callers see
the same (tree, node_of_doc) contract as fit_tree.

Reference counterpart of the layout: the per-node sampleid lists of
rt.cc:325-347, here as physical row runs instead of index vectors.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from quickrank_tpu.ops.histogram import masked_histogram_t
from quickrank_tpu.ops.pallas_partition import (
    MODE_COPY,
    MODE_DEAD,
    MODE_MOVE,
    TILE,
    partition_rows,
)
from quickrank_tpu.trees.grow import (
    GrowConfig,
    NEG_INF,
    _best_split,
    _deviance,
    _feature_sample_mask,
    _node_stats,
)
from quickrank_tpu.trees.structs import Tree

#: payload byte columns, relative to the END of the work buffer
_GRAD = -8   # ..-4: grad f32 little-endian bytes
_CNT = -4    # count/mask byte (doc_mask & sample mask)
_POS = -3    # node id + 1 (0 = dead row)


def payload_columns_required() -> int:
    """Pad columns the clustered layout needs past the real features."""
    return 8


@struct.dataclass
class _ClusterState:
    tree: Tree
    work: jnp.ndarray  # u8 [N_w, W]
    hist: jnp.ndarray  # f32 [max_nodes, W, B, 3]
    run_tile: jnp.ndarray  # i32 [max_nodes] first tile of each node's run
    run_ntiles: jnp.ndarray  # i32 [max_nodes] tiles in the run (0 = none)
    deviance: jnp.ndarray
    active: jnp.ndarray
    frozen: jnp.ndarray
    depth: jnp.ndarray
    n_nodes: jnp.ndarray
    taken: jnp.ndarray
    key: jnp.ndarray


def _cols_lanemajor(work: jnp.ndarray, cols) -> jnp.ndarray:
    """Selected columns of the u8 work buffer as LANE-MAJOR f32 rows
    [len(cols), N], via one exact one-hot bf16 contraction.

    Orientation matters as much as the selection: a doc-major [N, 1]
    result acquires a 128-lane-padded layout that poisons every
    downstream [N] op (the 0.2 s/iteration regression documented in
    ops/pallas_histogram.py) — contracting with the one-hot on the LEFT
    keeps docs on the lane axis throughout."""
    W = work.shape[1]
    sel = (
        jnp.asarray(cols)[:, None] == jnp.arange(W)[None, :]
    ).astype(jnp.bfloat16)  # [K, W]
    return jax.lax.dot_general(
        sel, work.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, N]


def _channels(work: jnp.ndarray, w_logical: int):
    """(chan_t [3, N_w] premasked, pos [N_w] i32, live [N_w] bool) from the
    payload bytes (at the end of the LOGICAL width — the buffer may carry
    extra 128-lane padding): count, grad, grad^2 — the best-first
    histogram channel set (ops/histogram.py).  The f32 grad is
    reconstructed from its 4 bytes in exact i32 arithmetic + bitcast."""
    base = w_logical - 8
    rows = _cols_lanemajor(work, [base, base + 1, base + 2, base + 3,
                                  w_logical + _CNT, w_logical + _POS])
    b = rows[:4].astype(jnp.int32)
    g = jax.lax.bitcast_convert_type(
        (b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)).astype(jnp.int32),
        jnp.float32,
    )
    cnt = rows[4]
    posb = rows[5]
    chan_t = jnp.stack([cnt, g, g * g])
    pos = posb.astype(jnp.int32) - 1
    return chan_t, pos, posb > 0


def build_work_buffer(
    binned: jnp.ndarray,
    grad: jnp.ndarray,
    sample_mask: jnp.ndarray,
    n_work: int,
) -> jnp.ndarray:
    """Assemble the per-tree work buffer: binned + payload bytes, extended
    with dead slack rows to ``n_work`` (static; children runs grow into
    the slack as alignment/guard tiles) and 128-lane-padded columns (the
    partition kernel's DMA slices require 128-aligned lane extents)."""
    N, W = binned.shape
    m = sample_mask
    g = jnp.where(m, grad, 0.0).astype(jnp.float32)
    gbytes = jax.lax.bitcast_convert_type(g, jnp.uint8).reshape(N, 4)
    payload = jnp.concatenate(
        [
            gbytes,
            m.astype(jnp.uint8)[:, None],
            jnp.full((N, 1), 1, jnp.uint8),  # pos + 1: everything in node 0
            jnp.zeros((N, 2), jnp.uint8),
        ],
        axis=1,
    )
    work = jax.lax.dynamic_update_slice(binned, payload, (0, W - 8))
    w_pad = -(-W // 128) * 128
    return jnp.pad(work, ((0, n_work - N), (0, w_pad - W)))


# descend_tree_binned_matmul moved to ops/scoring.py (it is the general
# gather-free descent, used by Mart/DART rescoring too); re-exported here
# for back-compat with existing callers/tests.
from quickrank_tpu.ops.scoring import descend_tree_binned_matmul  # noqa: E402,F401


def _align8(x):
    return (x + 7) // 8 * 8


def fit_tree_clustered(
    binned: jnp.ndarray,
    grad: jnp.ndarray,
    doc_mask: jnp.ndarray,
    thresholds: jnp.ndarray,
    cfg: GrowConfig,
    key: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> tuple[Tree, jnp.ndarray]:
    """Drop-in for trees/grow.py::fit_tree on the clustered work buffer.

    Requires: u8 binned (<= 256 bins), N % 1024 == 0,
    ``cfg.num_real_features`` set, >= 8 pad columns past the real
    features, no feature-axis sharding, no collapse factor.  Split
    decisions replicate under data sharding exactly like fit_tree (the
    psum'd histogram is the only cross-chip input).
    """
    N, W = binned.shape
    B = cfg.num_bins
    max_nodes = cfg.max_nodes
    minls = cfg.min_leaf_support
    F_real = cfg.num_real_features or W
    assert cfg.feat_axis is None, "clustered x feature sharding excluded"
    assert binned.dtype == jnp.uint8 and N % TILE == 0
    assert W - F_real >= payload_columns_required()
    if key is None:
        key = jax.random.PRNGKey(0)

    # slack bound: at any instant total tiles <= sum over live runs of
    # ceil((live_rows + 7 * parent_tiles) / TILE) + 1  (align8 gaps are
    # regenerated per split, never accumulated), which solves to
    # N/TILE + 2*runs + ceil(7*T/1024)-ish — 2*max_nodes + 32 extra tiles
    # covers it with margin
    n_work = N + TILE * (2 * max_nodes + 32)
    T_w = n_work // TILE
    work = build_work_buffer(binned, grad, doc_mask, n_work)

    real_cols = jnp.arange(W) < F_real
    nfs = cfg.num_feature_samples(F_real)

    def hist_of(work_, mask):
        chan_t, _, _ = _channels(work_, W)
        h = masked_histogram_t(work_, chan_t, mask, B, f_used=W)
        if axis_name is not None:
            h = jax.lax.psum(h, axis_name)
        return h

    chan0, pos0, live0 = _channels(work, W)
    root_hist = hist_of(work, pos0 == 0)
    c0, s0, s20 = _node_stats(root_hist)

    state = _ClusterState(
        tree=Tree.empty(max_nodes),
        work=work,
        hist=jnp.zeros((max_nodes, W, B, 3), jnp.float32).at[0].set(root_hist),
        run_tile=jnp.zeros((max_nodes,), jnp.int32),
        run_ntiles=jnp.zeros((max_nodes,), jnp.int32).at[0].set(N // TILE),
        deviance=jnp.zeros((max_nodes,), jnp.float32)
        .at[0].set(_deviance(c0, s0, s20)),
        active=jnp.zeros((max_nodes,), bool).at[0].set(True),
        frozen=jnp.zeros((max_nodes,), bool),
        depth=jnp.zeros((max_nodes,), jnp.int32),
        n_nodes=jnp.asarray(1, jnp.int32),
        taken=jnp.asarray(0, jnp.int32),
        key=key,
    )

    def cond(s: _ClusterState):
        heap = s.active & ~s.frozen
        hs = jnp.sum(heap.astype(jnp.int32))
        return (hs > 0) & (s.taken + hs < cfg.nleaves)

    def body(s: _ClusterState) -> _ClusterState:
        heap = s.active & ~s.frozen
        leaf = jnp.argmax(jnp.where(heap, s.deviance, NEG_INF)).astype(
            jnp.int32
        )
        key, sub = jax.random.split(s.key)
        feat_mask = _feature_sample_mask(sub, F_real, nfs)
        feat_mask = jnp.pad(feat_mask, (0, W - F_real)) & real_cols
        h_leaf = s.hist[leaf]
        has_split, f_star, t_star, _ = _best_split(h_leaf, feat_mask, minls)
        can_split = has_split & (s.deviance[leaf] > 0)
        if cfg.max_depth:
            can_split = can_split & (s.depth[leaf] < cfg.max_depth)

        def do_split(s: _ClusterState) -> _ClusterState:
            a = s.n_nodes
            b = s.n_nodes + 1
            chan_t, pos, live = _channels(s.work, W)
            fcol = _cols_lanemajor(s.work, f_star[None])[0]
            goes_left = fcol <= t_star.astype(jnp.float32)
            in_leaf = (pos == leaf) & live
            left_hist = hist_of(s.work, in_leaf & goes_left)
            right_hist = h_leaf - left_hist
            ca, sa, s2a = _node_stats(left_hist)
            cb, sb, s2b = _node_stats(right_hist)

            # ---- partition directives (all tiny [T_w]/[max_nodes] math)
            tiles = jnp.arange(T_w, dtype=jnp.int32)
            rs = s.run_tile[leaf]
            rn = s.run_ntiles[leaf]
            in_leaf_tile = (tiles >= rs) & (tiles < rs + rn)
            zrows = (in_leaf & goes_left).reshape(T_w, TILE)
            orows = (in_leaf & ~goes_left).reshape(T_w, TILE)
            zc = _align8(jnp.sum(zrows, axis=1, dtype=jnp.int32))
            oc = _align8(jnp.sum(orows, axis=1, dtype=jnp.int32))
            zc = jnp.where(in_leaf_tile, zc, 0)
            oc = jnp.where(in_leaf_tile, oc, 0)
            ltiles = -(-jnp.sum(zc) // TILE) + 1  # +1 guard tile
            rtiles = -(-jnp.sum(oc) // TILE) + 1
            # new layout: children inherit the leaf's position in the run
            # order; every run repacks densely in that order
            new_ntiles = (
                s.run_ntiles.at[leaf].set(0).at[a].set(ltiles)
                .at[b].set(rtiles)
            )
            sort_key = 2 * s.run_tile
            sort_key = sort_key.at[a].set(2 * rs).at[b].set(2 * rs + 1)
            order = jnp.argsort(
                jnp.where(new_ntiles > 0, sort_key, jnp.int32(2**30))
            )
            sizes_sorted = new_ntiles[order]
            starts_sorted = jnp.cumsum(sizes_sorted) - sizes_sorted
            new_start = jnp.zeros((max_nodes,), jnp.int32).at[order].set(
                starts_sorted
            )
            # old owner of each tile (runs are disjoint; dead tiles -> none)
            cover = (
                (tiles[:, None] >= s.run_tile[None, :])
                & (tiles[:, None] < (s.run_tile + s.run_ntiles)[None, :])
                & (s.run_ntiles[None, :] > 0)
            )
            run_of_tile = jnp.argmax(cover, axis=1).astype(jnp.int32)
            covered = jnp.any(cover, axis=1)
            mode = jnp.where(
                in_leaf_tile,
                MODE_MOVE,
                jnp.where(covered, MODE_COPY, MODE_DEAD),
            ).astype(jnp.int32)
            zoff = jnp.cumsum(zc) - zc
            ooff = jnp.cumsum(oc) - oc
            dsta = jnp.where(
                in_leaf_tile,
                new_start[a] * TILE + zoff,
                (new_start[run_of_tile] + (tiles - s.run_tile[run_of_tile]))
                * TILE,
            ).astype(jnp.int32)
            dstb = (new_start[b] * TILE + ooff).astype(jnp.int32)
            full = lambda v: jnp.full((T_w,), v, jnp.int32)  # noqa: E731
            bit = jnp.where(
                in_leaf, jnp.where(goes_left, 0, 1), 2
            ).astype(jnp.int32)
            work2 = partition_rows(
                s.work, bit, mode, dsta, dstb,
                full(a + 1), full(b + 1), W + _POS,
                fstar=full(f_star), tstar=full(t_star),
            )

            tree = s.tree.replace(
                feature=s.tree.feature.at[leaf].set(f_star),
                threshold=s.tree.threshold.at[leaf].set(
                    thresholds[f_star, t_star]
                ),
                threshold_bin=s.tree.threshold_bin.at[leaf].set(t_star),
                left=s.tree.left.at[leaf].set(a),
                right=s.tree.right.at[leaf].set(b),
                is_leaf=s.tree.is_leaf.at[leaf].set(False),
                n_nodes=s.n_nodes + 2,
            )
            return s.replace(
                tree=tree,
                work=work2,
                hist=s.hist.at[a].set(left_hist).at[b].set(right_hist),
                run_tile=new_start,
                run_ntiles=new_ntiles,
                deviance=s.deviance.at[a]
                .set(_deviance(ca, sa, s2a))
                .at[b]
                .set(_deviance(cb, sb, s2b)),
                active=s.active.at[leaf].set(False).at[a].set(True)
                .at[b].set(True),
                depth=s.depth.at[a].set(s.depth[leaf] + 1)
                .at[b].set(s.depth[leaf] + 1),
                n_nodes=s.n_nodes + 2,
                key=key,
            )

        def freeze(s: _ClusterState) -> _ClusterState:
            return s.replace(
                frozen=s.frozen.at[leaf].set(True),
                taken=s.taken + 1,
                key=key,
            )

        return jax.lax.cond(can_split, do_split, freeze, s)

    final = jax.lax.while_loop(cond, body, state)
    depth_bound = (
        min(cfg.max_depth, cfg.nleaves - 1)
        if cfg.max_depth
        else cfg.nleaves - 1
    )
    node_of_doc = descend_tree_binned_matmul(
        binned, final.tree, depth_bound
    )
    return final.tree, node_of_doc
