"""Perfect-binary-tree embedding of (depth-capped) tree ensembles.

Any tree of depth <= D embeds into the complete binary tree of depth D:
missing subtrees become pass-through nodes (threshold +inf -> always left)
and the leaf value replicates across the collapsed leaf range.  In this
layout every internal node's (feature, threshold) is doc-independent, which
makes scoring traversal-free for ARBITRARY (not just oblivious) ensembles —
the generalization of the quickscore bit trick to asymmetric trees.

Heap indexing: internal node i has children 2i+1 / 2i+2; the ancestor of
leaf l (0..2^D-1) at depth d is (2^d - 1) + (l >> (D - d)); the direction
taken there is bit (l >> (D-1-d)) & 1 (1 = right).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

FLT_MAX = np.float32(3.4028235e38)


@struct.dataclass
class PerfectEnsemble:
    """fid/thr: [T, I] internal nodes in heap order (I = 2^D - 1);
    leaf: [T, 2^D]; weight: [T]."""

    fid: jnp.ndarray
    thr: jnp.ndarray
    leaf: jnp.ndarray
    weight: jnp.ndarray
    num_trees: jnp.ndarray

    @property
    def depth(self) -> int:
        return int(self.leaf.shape[1]).bit_length() - 1


def tree_depths(ens, cap: Optional[int] = None) -> np.ndarray:
    """Max depth of each live tree in an EnsembleTensors.

    Iterative (explicit worklist): a degenerate chain-shaped tree from an
    XML import is bounded by the node budget, not Python's process-global
    recursion limit (rtnode.h:134's recursion rides the C++ stack; ours must
    not ride sys.setrecursionlimit).  With ``cap``, a tree found deeper than
    ``cap`` reports ``cap + 1`` without walking its remaining nodes."""
    T = int(ens.num_trees)
    left = np.asarray(ens.left)
    right = np.asarray(ens.right)
    isleaf = np.asarray(ens.is_leaf)

    def depth(t):
        maxd = 0
        stack = [(0, 0)]
        while stack:
            i, d = stack.pop()
            if isleaf[t, i]:
                maxd = max(maxd, d)
                continue
            if cap is not None and d >= cap:
                return cap + 1
            stack.append((int(left[t, i]), d + 1))
            stack.append((int(right[t, i]), d + 1))
        return maxd

    return np.asarray([depth(t) for t in range(T)])


def ensemble_to_perfect(
    ens, max_depth: int = 5, pad_to_multiple: int = 25
) -> Optional[PerfectEnsemble]:
    """Embed an EnsembleTensors into perfect depth-D form, or None when any
    tree is deeper than ``max_depth``.  The tree count is padded with
    zero-weight dummies to a multiple of ``pad_to_multiple`` so the scoring
    kernel always has an even block split."""
    T = int(ens.num_trees)
    if T == 0:
        return None
    depths = tree_depths(ens, cap=max_depth)
    D = int(max(1, depths.max()))
    if D > max_depth:
        return None
    I = 2**D - 1
    L = 2**D
    feat = np.asarray(ens.feature)
    thrv = np.asarray(ens.threshold)
    left = np.asarray(ens.left)
    right = np.asarray(ens.right)
    isleaf = np.asarray(ens.is_leaf)
    lv = np.asarray(ens.leaf_value)

    fid = np.zeros((T, I), np.int32)
    thr = np.full((T, I), FLT_MAX, np.float32)
    leaf = np.zeros((T, L), np.float32)

    for t in range(T):
        def embed(i, heap, depth):
            if isleaf[t, i]:
                # replicate leaf value over the collapsed range
                span = 2 ** (D - depth)
                start = (heap - (2**depth - 1)) * span
                leaf[t, start : start + span] = lv[t, i]
                return
            fid[t, heap] = feat[t, i]
            thr[t, heap] = thrv[t, i]
            embed(int(left[t, i]), 2 * heap + 1, depth + 1)
            embed(int(right[t, i]), 2 * heap + 2, depth + 1)

        embed(0, 0, 0)

    weight = np.asarray(ens.weight)[:T]
    Tp = _round_up_int(T, pad_to_multiple)
    if Tp != T:
        fid = np.pad(fid, ((0, Tp - T), (0, 0)))
        thr = np.pad(thr, ((0, Tp - T), (0, 0)), constant_values=FLT_MAX)
        leaf = np.pad(leaf, ((0, Tp - T), (0, 0)))
        weight = np.pad(weight, (0, Tp - T))

    return PerfectEnsemble(
        fid=jnp.asarray(fid),
        thr=jnp.asarray(thr),
        leaf=jnp.asarray(leaf),
        weight=jnp.asarray(weight),
        num_trees=jnp.asarray(T, jnp.int32),
    )


def _round_up_int(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def compact_feature_space(features: np.ndarray, fid: np.ndarray):
    """If a model references <= 128 distinct features, select just those
    columns and remap ids — the selection matmul's contraction dim then fits
    one 128-lane MXU tile instead of two (2x efficiency).

    Returns (features_subset [N, U], fid_remapped) or None when not
    beneficial.
    """
    fid = np.asarray(fid)
    used = np.unique(fid)
    F = features.shape[1]
    if len(used) > 128 or len(used) >= F:
        return None
    remap = np.zeros(F, np.int32)
    remap[used] = np.arange(len(used), dtype=np.int32)
    return np.ascontiguousarray(features[:, used]), remap[fid]
