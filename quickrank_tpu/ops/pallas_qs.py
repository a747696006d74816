"""Pallas TPU kernel for QuickScorer bitvector scoring (any-depth trees).

The XLA formulation (trees/qs.py::score_qs) re-reads the doc tile and
round-trips every intermediate through HBM once per 8-tree group; this
kernel streams (doc tile) x (tree block) over a 2-D grid — the doc tile
and one block's tables live in VMEM, intermediates never touch HBM, and
the output tile accumulates across the tree-block grid dimension:

  false bits  = (S_block @ X_planes) > thr          # MXU, exact f32 via
                                                    # 3 bf16 planes (same
                                                    # trick as pallas_perfect)
  excluded    = EXCL_blockdiag @ false_bits         # MXU [TB*L, TB*I]
  reached     = excluded == 0
  prefix      = STRICT_LOWER_blockdiag @ reached    # MXU: any leaf to the
                                                    # left already reached?
  first       = reached * (prefix == 0)             # leftmost survivor
  out[tile]  += wleaf . first                       # weighted leaf pick

Correctness identical to trees/qs.py (leftmost non-excluded leaf is the
exit leaf); the prefix-OR via a strict-lower-triangular matmul replaces
the lane-axis cumsum, which Mosaic has no cheap primitive for.  Exact
routing: {0,1} bit operands, integer counts in f32 accumulators, and the
feature column select reconstructs f32 compares from three bf16 planes
(hi/mid/lo), as in ops/pallas_perfect.py.  The cross-tree SUM is plain
f32 in block order (not the per-tree Kahan chain of score_qs); tests
bound the drift against the compensated reference.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quickrank_tpu.trees.qs import QSEnsemble


from quickrank_tpu.ops.util import round_up as _round_up


def _kernel(
    feats_ref, s_ref, thr_ref, excl_ref, tri_ref, wleaf_ref, out_ref,
    planes_ref,
):
    # hi/mid/lo bf16 planes reconstruct the f32 features exactly for the
    # comparison dots; they depend only on the DOC tile, so they are
    # computed once per tile (first tree block) into VMEM scratch —
    # recomputing them per (tile, block) step was ~1/4 of kernel time.
    @pl.when(pl.program_id(1) == 0)
    def _planes():
        x = feats_ref[:]
        F = x.shape[1]
        hi32 = x.astype(jnp.bfloat16).astype(jnp.float32)
        rem = x - hi32
        mid32 = rem.astype(jnp.bfloat16).astype(jnp.float32)
        planes_ref[:, :F] = hi32.astype(jnp.bfloat16)
        planes_ref[:, F : 2 * F] = mid32.astype(jnp.bfloat16)
        planes_ref[:, 2 * F :] = (rem - mid32).astype(jnp.bfloat16)

    # one K=3F dot instead of three K=F dots: the one-hot S row repeats
    # in all three plane sections, so the f32 accumulator receives
    # hi + mid + lo = x exactly
    sel = jax.lax.dot_general(
        s_ref[:], planes_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TB*I, tile_n] — the split-feature value at every node
    false_bits = (sel > thr_ref[:]).astype(jnp.bfloat16)
    excluded = jax.lax.dot_general(
        excl_ref[:], false_bits, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TB*L, tile_n] exact exclusion counts
    reached = (excluded == 0.0).astype(jnp.bfloat16)
    prefix = jax.lax.dot_general(
        tri_ref[:], reached, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TB*L, tile_n] — reached leaves strictly left within the tree
    first = jnp.where(prefix == 0.0, reached.astype(jnp.float32), 0.0)
    part = jnp.sum(wleaf_ref[:] * first, axis=0)[None, :]

    # out block covers 8 consecutive doc tiles (sublane-legal block
    # shape); row i%8 belongs to THIS doc tile.  Initialize it on the
    # first tree block, accumulate afterwards; all 8 rows are written
    # before the block index (i//8) advances and writes back.
    row = pl.program_id(0) % 8

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[pl.ds(row, 1), :] = part

    @pl.when(pl.program_id(1) > 0)
    def _acc():
        out_ref[pl.ds(row, 1), :] += part


@partial(jax.jit, static_argnames=("tile_n", "tree_block", "interpret"))
def score_qs_pallas(
    features: jnp.ndarray,
    qs: QSEnsemble,
    tile_n: int = 0,
    tree_block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Weighted ensemble scores f32 [N] — Pallas QS path.

    tile_n=0 auto-selects: 2048 (the swept optimum: 21.7 ms for 1000
    16-leaf trees x 131k docs; 2026-08-20) when the doc count fills it,
    smaller for small batches (the grid pads N to 8 tiles).
    ``interpret=True`` runs the kernel in pallas interpret mode so CPU
    tests can pin parity."""
    if tile_n <= 0:
        tile_n = 2048 if features.shape[0] >= 8 * 2048 else 256
    N, F = features.shape
    Tp, I = qs.fid.shape
    L = qs.leafval.shape[1]
    TB = tree_block
    Tb = _round_up(Tp, TB)
    nblocks = Tb // TB

    fid = qs.fid
    thr = qs.thr
    excl = qs.excl
    leafval = qs.leafval
    weight = qs.weight
    if Tb != Tp:
        pad = Tb - Tp
        fid = jnp.pad(fid, ((0, pad), (0, 0)))
        thr = jnp.pad(
            thr, ((0, pad), (0, 0)),
            constant_values=jnp.float32(3.4028235e38),
        )
        excl = jnp.pad(excl, ((0, pad), (0, 0), (0, 0)))
        leafval = jnp.pad(leafval, ((0, pad), (0, 0)))
        weight = jnp.pad(weight, (0, pad))

    # node-major within block: rows [b*TB*I + t*I + i]; the one-hot is
    # repeated across the three bf16-plane sections (K = 3F single dot)
    S1 = (
        fid.reshape(-1)[:, None] == jnp.arange(F, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)  # [Tb*I, F]
    S = jnp.concatenate([S1, S1, S1], axis=1)  # [Tb*I, 3F]
    thr_col = thr.reshape(-1, 1)  # [Tb*I, 1]
    # block-diagonal exclusion: row (t*L + l) of a block reads only tree
    # t's bits — [nblocks, TB, L, TB, I] with zeros off the t==t' diagonal
    eye = jnp.eye(TB, dtype=jnp.float32)
    excl_bd = jnp.einsum(
        "btil,tu->btlui",
        excl.reshape(nblocks, TB, I, L).astype(jnp.float32),
        eye,
    ).astype(jnp.bfloat16).reshape(nblocks * TB * L, TB * I)
    # strict-lower-triangular within each tree's L-lane block
    li = np.arange(TB * L)
    tri_np = (
        (li[:, None] // L == li[None, :] // L)
        & (li[None, :] % L < li[:, None] % L)
    ).astype(np.float32)
    tri = jnp.asarray(tri_np.astype(jnp.bfloat16))  # [TB*L, TB*L]
    wleaf = (leafval * weight[:, None]).reshape(-1, 1)  # [Tb*L, 1]

    n_pad = _round_up(max(N, tile_n), tile_n * 8)
    if n_pad != N:
        features = jnp.pad(features, ((0, n_pad - N), (0, 0)))
    grid = (n_pad // tile_n, nblocks)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad // tile_n, tile_n), jnp.float32),
        grid=grid,
        scratch_shapes=[
            pltpu.VMEM((tile_n, 3 * F), jnp.bfloat16),
        ],
        in_specs=[
            pl.BlockSpec(
                (tile_n, F), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TB * I, 3 * F), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TB * I, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TB * L, TB * I), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TB * L, TB * L), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TB * L, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, tile_n), lambda i, j: (i // 8, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            # BOTH dims "arbitrary": 8 consecutive doc-tile iterations
            # read-modify-write one (8, tile_n) output block (index map
            # i // 8), so a "parallel" dim 0 would race if Mosaic ever
            # partitioned it across cores at a non-8-aligned boundary
            # (megacore targets).  Single-core v5e executes sequentially
            # either way — the measured win is the tree-block streaming,
            # not cross-tile parallelism.
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(features, S, thr_col, excl_bd, tri, wleaf)
    return out.reshape(-1)[:N]
