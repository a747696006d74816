"""Vectorized ensemble scoring — the QuickScore-style traversal-free path.

Replaces the reference's per-doc recursive tree walk
(``RTNode::score_instance``, include/learning/tree/rtnode.h:134-152, and
``Ensemble::score_instance``, src/learning/tree/ensemble.cc:111-118) with a
batched iterative descent: all docs advance one level per step via gathers,
so there is no recursion, no branching per doc, and XLA fuses the whole
ensemble sweep.  The oblivious-tree bit-OR leaf indexing trick
(src/io/generate_oblivious.cc:306-312) lives in ops/oblivious.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from quickrank_tpu.trees.structs import EnsembleTensors, Tree


def kahan_add(s: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray):
    """One Kahan-compensated accumulation step: returns (s', c') with
    ``s' + c' ~= s + c + d`` to ~f64 accuracy while staying in f32.

    The reference accumulates ensemble scores in double (``Score = double``,
    include/types.h:28-35; ensemble.cc:111-118); on TPU f64 is emulated and
    slow, so compensated f32 is the native equivalent.  XLA does not
    reassociate float arithmetic by default, so the correction term
    survives compilation (asserted by tests/test_precision.py).
    """
    y = d - c
    t = s + y
    return t, (t - s) - y


def descend_tree(features: jnp.ndarray, tree: Tree, max_depth: int) -> jnp.ndarray:
    """Leaf node id reached by every doc: i32 [N].

    ``max_depth`` iterations of: gather split params at the current node,
    route left/right on ``x[f] <= threshold`` (rt.cc:330 semantics).  Docs
    already at a leaf stay put, so ``max_depth`` only needs to upper-bound
    the tree depth (worst case nleaves-1 for best-first trees).
    """
    N = features.shape[0]
    node0 = jnp.zeros((N,), jnp.int32)

    def step(_, node):
        f = tree.feature[node]
        thr = tree.threshold[node]
        leaf = tree.is_leaf[node]
        x = jnp.take_along_axis(
            features, jnp.maximum(f, 0)[:, None], axis=1
        )[:, 0]
        nxt = jnp.where(x <= thr, tree.left[node], tree.right[node])
        return jnp.where(leaf, node, nxt).astype(jnp.int32)

    return jax.lax.fori_loop(0, max_depth, step, node0)


def descend_tree_matmul(
    features: jnp.ndarray, tree: Tree, max_depth: int
) -> jnp.ndarray:
    """Value-space descent with one-hot column selection — the TPU path
    for models too deep for the perfect-tree embedding (best-first
    16-leaf trees run to depth 15; 2^15-leaf embeddings don't pay).

    EXACT despite the MXU: every output element of the column-select dot
    is a sum of exactly one nonzero product (each node has one split
    feature), ``x * 1.0`` is exact under any bf16-pass decomposition of
    an f32 matmul (1.0 is exact in bf16, x = hi + lo splits recombine in
    the f32 accumulator), and ``x * 0.0`` is 0 — so the compare sees the
    original f32 feature bit-for-bit (pinned vs the gather path by
    tests/test_trees.py).  Rationale as descend_tree_binned_matmul: a
    per-doc gather chain costs ~0.9 s/tree at MSLR scale."""
    N, W = features.shape
    max_nodes = tree.max_nodes
    node = jnp.zeros((N,), jnp.int32)
    ids = jnp.arange(max_nodes)
    sel = (
        tree.feature[None, :] == jnp.arange(W)[:, None]
    ).astype(jnp.float32)  # [W, max_nodes]
    fcols = jax.lax.dot_general(
        features.astype(jnp.float32), sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [N, max_nodes] — every node's split column for every doc

    for _ in range(max_depth):
        own = (node[:, None] == ids[None, :]).astype(jnp.float32)
        val = jnp.sum(own * fcols, axis=1)
        thr = _onehot_read(own, tree.threshold)
        left = _onehot_read(own, tree.left)
        right = _onehot_read(own, tree.right)
        leaf = _onehot_read(own, tree.is_leaf.astype(jnp.int32))
        nxt = jnp.where(val <= thr, left, right)
        node = jnp.where(leaf > 0, node.astype(jnp.float32), nxt).astype(
            jnp.int32
        )
    return node


def score_tree(features: jnp.ndarray, tree: Tree, max_depth: int) -> jnp.ndarray:
    """Unweighted output of one tree for every doc: f32 [N].

    Dispatches gather descent (CPU: O(N) per level) vs matmul descent +
    one-hot leaf read (TPU: per-doc gathers serialize ~50x slower) at
    trace time, the same backend split ops/histogram.py uses."""
    if jax.default_backend() == "tpu":
        return leaf_values_onehot(
            descend_tree_matmul(features, tree, max_depth), tree
        )
    return tree.leaf_value[descend_tree(features, tree, max_depth)]


def descend_tree_binned(
    binned: jnp.ndarray,
    tree: Tree,
    max_depth: int,
    feat_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Same descent in bin space (training-time path: bin <= threshold_bin
    routing is exactly the value <= threshold routing by construction).

    With ``feat_axis`` (inside a shard_map over a 2-D data x feature mesh)
    ``binned`` is the shard-LOCAL feature block while ``tree.feature``
    holds GLOBAL feature ids: each level, the shard owning the split
    feature computes the routing bit and a psum over the feature axis
    broadcasts it — the same owner-psum discipline fit_tree uses for
    split routing (trees/grow.py do_split)."""
    N, F = binned.shape
    node0 = jnp.zeros((N,), jnp.int32)

    def step(_, node):
        f = tree.feature[node]
        tb = tree.threshold_bin[node]
        leaf = tree.is_leaf[node]
        if feat_axis is None:
            x = jnp.take_along_axis(
                binned, jnp.maximum(f, 0)[:, None], axis=1
            )[:, 0]
            goes_left = x <= tb
        else:
            shard = jax.lax.axis_index(feat_axis)
            owns = (f // F) == shard  # f = -1 on leaves: owned by no shard
            fl = jnp.where(owns, f % F, 0)
            x = jnp.take_along_axis(binned, fl[:, None], axis=1)[:, 0]
            bit = ((x <= tb) & owns).astype(jnp.int32)
            goes_left = jax.lax.psum(bit, feat_axis) > 0
        nxt = jnp.where(goes_left, tree.left[node], tree.right[node])
        return jnp.where(leaf, node, nxt).astype(jnp.int32)

    return jax.lax.fori_loop(0, max_depth, step, node0)


def _onehot_read(own_f32: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """One-hot weighted read of a tiny per-node table: f32 [N].

    ``own_f32`` is the [N, max_nodes] one-hot of each doc's node id.  A
    plain ``table[node]`` gather from even a 31-entry table lowers to a
    ~15-20 ms serialized path at MSLR scale on this target
    (scripts/bench_permute.py); the one-hot product/sum fuses into a
    single VPU pass and is exact (one nonzero term per row, f32 products
    of {0,1} weights)."""
    return jnp.sum(own_f32 * table.astype(jnp.float32)[None, :], axis=1)


def leaf_values_onehot(node: jnp.ndarray, tree: Tree) -> jnp.ndarray:
    """``tree.leaf_value[node]`` without the per-doc gather: f32 [N].

    Exact replacement for the reference's leaf-output read after routing
    (rtnode.h:134-152 returns the reached leaf's avglabel); negative node
    ids clamp to 0 like the gather path's ``jnp.maximum(node, 0)``.  On
    CPU the plain gather stays (no TPU gather penalty there; bitwise
    equal either way)."""
    if jax.default_backend() != "tpu":
        return tree.leaf_value[jnp.maximum(node, 0)]
    ids = jnp.arange(tree.max_nodes)
    own = (
        jnp.maximum(node, 0)[:, None] == ids[None, :]
    ).astype(jnp.float32)
    return _onehot_read(own, tree.leaf_value)


def descend_tree_binned_matmul(
    binned: jnp.ndarray, tree: Tree, max_depth: int
) -> jnp.ndarray:
    """Bin-space tree descent with MXU column selection instead of per-doc
    column gathers (jnp.take_along_axis serializes ~50x slower on TPU —
    same rationale as grow_level._route_bits).  ALL per-doc table lookups
    (split column, threshold, child ids, leaf bit) go through one-hot
    dots: an [N]-gather from even a 31-entry table lowers to a ~15-20 ms
    slow path on this target (scripts/bench_permute.py's flat-gather
    row), and descent needs four per level.  Exact: u8 bins <= 255 are
    exact in bf16 (and the threshold_bins they compare against are < 256
    by mart.py's wire construction); wider bin ids (u16 wire,
    nthresholds > 256) ride the f32/HIGHEST-precision dot, exact to 2^24
    (see descend_tree_matmul's exactness argument).  The table dots run
    in f32 with one-hot weights.

    Bitwise-equal to descend_tree_binned, asserted by
    tests/test_cluster.py and tests/test_trees.py."""
    N, W = binned.shape
    max_nodes = tree.max_nodes
    node = jnp.zeros((N,), jnp.int32)
    ids = jnp.arange(max_nodes)
    # u8 wire data (StepData.binned whenever num_bins <= 256, mart.py
    # ``wire = binned.astype(np.uint8)``) rides a single-pass bf16 dot:
    # bin ids <= 255 and their threshold_bins (< 256 by the same
    # construction) are exact bf16 integers, and the f32 accumulator keeps
    # the dot exact.  Wider wire dtypes (u16/i32, nthresholds > 256) take
    # the multi-pass f32/HIGHEST dot, exact to 2^24.  This is the hot
    # per-iteration dot of DART deltas and binned rescores — do not fold
    # the branches (r5 briefly removed the u8 path on a wrong dead-code
    # premise).
    if binned.dtype == jnp.uint8:
        blk, selt, prec = jnp.bfloat16, jnp.bfloat16, None
    else:
        blk, selt, prec = jnp.float32, jnp.float32, jax.lax.Precision.HIGHEST
    sel = (
        tree.feature[None, :] == jnp.arange(W)[:, None]
    ).astype(selt)  # [W, max_nodes]
    fcols = jax.lax.dot_general(
        binned.astype(blk), sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        **({"precision": prec} if prec is not None else {}),
    )  # [N, max_nodes] — every node's split column for every doc

    for _ in range(max_depth):
        own = (node[:, None] == ids[None, :]).astype(jnp.float32)
        val = jnp.sum(own * fcols, axis=1)
        thr = _onehot_read(own, tree.threshold_bin)
        left = _onehot_read(own, tree.left)
        right = _onehot_read(own, tree.right)
        leaf = _onehot_read(own, tree.is_leaf.astype(jnp.int32))
        nxt = jnp.where(val <= thr, left, right)
        node = jnp.where(leaf > 0, node.astype(jnp.float32), nxt).astype(
            jnp.int32
        )
    return node


def tree_delta_binned(
    binned: jnp.ndarray,
    tree: Tree,
    max_depth: int,
    feat_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Leaf value reached by every doc, in bin space: f32 [N].

    The gather-free scoring delta used on every per-iteration validation
    rescore (mart.cc:361-366's per-tree valid update) and DART's
    dropped-set/full rescores (dart.cc:552-558): matmul descent + one-hot
    leaf read when the feature axis is whole; under feature sharding the
    owner-psum descent routes (local blocks can't one-hot globally) and
    only the leaf read goes one-hot.  On CPU (the test suite's virtual
    devices) the gather path stays: the one-hot builds are O(N x nodes)
    per level there with none of the TPU gather penalty.  Both paths are
    bitwise-equal (tests/test_trees.py), so the dispatch is invisible."""
    if feat_axis is None:
        if jax.default_backend() == "tpu":
            node = descend_tree_binned_matmul(binned, tree, max_depth)
            return leaf_values_onehot(node, tree)
        node = descend_tree_binned(binned, tree, max_depth)
        return tree.leaf_value[node]
    node = descend_tree_binned(binned, tree, max_depth, feat_axis)
    return leaf_values_onehot(node, tree)


@partial(
    jax.jit, static_argnames=("max_depth", "num_trees_hint", "compensated")
)
def score_ensemble(
    features: jnp.ndarray,
    ens: EnsembleTensors,
    max_depth: Optional[int] = None,
    num_trees_hint: Optional[int] = None,
    compensated: bool = False,
) -> jnp.ndarray:
    """Weighted ensemble scores: f32 [N] = sum_t weight_t * tree_t(doc).

    A scan over tree slots (memory-light; the per-tree descent is itself
    fully vectorized over docs).  Dead slots (t >= num_trees) have weight 0.
    With ``compensated`` the sum over trees is Kahan-compensated — the f32
    analog of the reference's double accumulator (ensemble.cc:111-118).
    """
    md = max_depth or ens.max_nodes

    def body(carry, t):
        acc, comp = carry
        tree = ens.tree(t)
        s = score_tree(features, tree, md)
        w = jnp.where(t < ens.num_trees, ens.weight[t], 0.0)
        if compensated:
            return kahan_add(acc, comp, w * s), None
        return (acc + w * s, comp), None

    T = num_trees_hint or ens.capacity
    init = jnp.zeros((features.shape[0],), jnp.float32)
    (out, _), _ = jax.lax.scan(body, (init, init), jnp.arange(T))
    return out


@partial(jax.jit, static_argnames=("max_depth",))
def partial_scores(
    features: jnp.ndarray, ens: EnsembleTensors, max_depth: Optional[int] = None
) -> jnp.ndarray:
    """Per-tree *unweighted* scores [N, T] — the partial-score dataset used
    by Cleaver/LineSearch post-optimization (Ensemble::partial_scores_instance
    ensemble.cc:120-131, Driver::extract_partial_scores driver.cc:411-446).
    """
    md = max_depth or ens.max_nodes

    def body(_, t):
        s = score_tree(features, ens.tree(t), md)
        return None, jnp.where(t < ens.num_trees, s, 0.0)

    _, cols = jax.lax.scan(body, None, jnp.arange(ens.capacity))
    return jnp.swapaxes(cols, 0, 1)
