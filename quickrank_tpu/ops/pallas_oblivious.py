"""Pallas TPU kernel for oblivious-ensemble scoring.

Fuses the whole quickscore pipeline — split-feature selection, threshold
comparison, bit-OR leaf indexing, leaf-value reduction — into one kernel so
the only HBM traffic is reading each feature tile once and writing [N]
scores (the pure-XLA version in ops/oblivious.py materializes the [N, T*D]
selection and one-hot tensors in HBM, which dominates its runtime).

Per doc tile (grid dimension):
  1. ``sel = S @ x_tile`` on the MXU, where S is the static [T*D, F] one-hot
     split-feature selector (f32; exact — no precision loss vs the
     reference's float comparisons, rt.cc:330);
  2. VPU compare against the [T*D, 1] thresholds -> bit planes;
  3. bit-OR into leaf indices [T, TILE] (generate_oblivious.cc:306-312);
  4. leaf lookup as 2^D masked accumulations, then a tree-axis reduction.

All model tables live in VMEM across the whole sweep (a 1000-tree depth-4
model needs ~2.5 MB).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quickrank_tpu.trees.oblivious import ObliviousEnsemble


from quickrank_tpu.ops.util import round_up as _round_up


def _kernel(
    feats_ref, s_ref, thr_ref, wleaf_ref, out_ref, *, T, D, L, TB,
    streamed=False,
):
    # feats_ref: [TILE_N, F]; s_ref: [T*D, F] (bf16 one-hot); thr_ref:
    # [T*D, 1]; wleaf_ref: [T, L]; out_ref: [grid, TILE_N].
    # Trees are processed in blocks of TB to bound live VMEM intermediates.
    x = feats_ref[:]
    tile_n = x.shape[0]
    # The MXU computes bf16 x bf16 -> f32, which would round the features
    # (comparisons near thresholds would flip), so split x into three bf16
    # planes (3 x 8 mantissa bits >= f32's 24 bits) CONCATENATED along the
    # feature axis: the one-hot selector row repeats across the three
    # sections, so ONE K=3F dot returns hi + mid + lo = x exactly in the
    # f32 accumulator (2026-08-20: one wide dot beats three K=F dots ~1.5x
    # in MXU passes — same trick as ops/pallas_qs.py).
    hi32 = x.astype(jnp.bfloat16).astype(jnp.float32)
    rem = x - hi32
    mid32 = rem.astype(jnp.bfloat16).astype(jnp.float32)
    planes = jnp.concatenate(
        [
            hi32.astype(jnp.bfloat16),
            mid32.astype(jnp.bfloat16),
            (rem - mid32).astype(jnp.bfloat16),
        ],
        axis=1,
    )  # [tile_n, 3F]

    # Rows of s_ref/thr_ref are laid out d-major (row d*T + t), so per tree
    # block the D bit planes come from D strided static slices — no sublane
    # reshuffle is ever needed to assemble leaf indices.
    total = jnp.zeros((1, tile_n), jnp.float32)
    for b in range(T // TB):
        idx = jnp.zeros((TB, tile_n), jnp.int32)
        for d in range(D):
            r0 = d * T + b * TB
            s_blk = s_ref[r0 : r0 + TB, :]
            sel = jax.lax.dot_general(
                s_blk, planes,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TB, TILE_N]
            bit = (sel > thr_ref[r0 : r0 + TB, :]).astype(jnp.int32)
            idx = idx + (bit << (D - 1 - d))
        acc = jnp.zeros((TB, tile_n), jnp.float32)
        for l in range(L):
            acc = acc + wleaf_ref[b * TB : (b + 1) * TB, l][:, None] * (
                idx == l
            ).astype(jnp.float32)
        total = total + jnp.sum(acc, axis=0)[None, :]
    if streamed:
        # (8, tile_n) output block (pallas_qs layout, index map i // 8):
        # constant VMEM residency, scales to arbitrarily large N; each of
        # the 8 consecutive doc-tile iterations writes its own block row.
        out_ref[pl.ds(pl.program_id(0) % 8, 1), :] = total
    else:
        # whole output VMEM-resident (measured ~10% faster at 131k docs
        # than the streamed block — 6.8 vs 7.5 ms); used while the output
        # fits comfortably alongside the model tables
        out_ref[pl.ds(pl.program_id(0), 1), :] = total


@partial(jax.jit, static_argnames=("tile_n", "tree_block", "interpret"))
def score_oblivious_pallas(
    features: jnp.ndarray,
    ens: ObliviousEnsemble,
    tile_n: int = 256,
    tree_block: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Weighted oblivious-ensemble scores f32 [N] (Pallas fast path)."""
    N, F = features.shape
    T, D = ens.fid.shape
    L = ens.num_leaves
    if tree_block <= 0:
        tree_block = T
        for cand in (250, 200, 125, 100, 50, 25):
            if T % cand == 0 and T > cand:
                tree_block = cand
                break

    live = (jnp.arange(T) < ens.num_trees).astype(jnp.float32)
    wleaf = ens.leaf * (ens.weight * live)[:, None]  # [T, L]

    # Static one-hot selector (fid is data, so the one-hot is built on
    # device; XLA folds it when the model is a compile-time constant).
    # d-major row layout: row d*T + t holds (tree t, level d).
    fid_dm = jnp.swapaxes(ens.fid, 0, 1).reshape(-1)
    S1 = (
        fid_dm[:, None] == jnp.arange(F, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)  # [D*T, F]
    # repeated across the three bf16-plane sections (K = 3F single dot)
    S = jnp.concatenate([S1, S1, S1], axis=1)  # [D*T, 3F]
    thr = jnp.swapaxes(ens.thr, 0, 1).reshape(-1, 1)  # [D*T, 1]

    # whole-resident output while it fits comfortably in VMEM beside the
    # model tables (~10% faster, the benched regime); stream an 8-row
    # block past that so the kernel scales to arbitrarily large N
    streamed = N * 4 > (16 << 20)
    n_pad = _round_up(max(N, tile_n), tile_n * 8 if streamed else tile_n)
    if n_pad != N:
        features = jnp.pad(features, ((0, n_pad - N), (0, 0)))
    grid = (n_pad // tile_n,)

    assert T % tree_block == 0, (T, tree_block)
    out = pl.pallas_call(
        partial(_kernel, T=T, D=D, L=L, TB=tree_block, streamed=streamed),
        out_shape=jax.ShapeDtypeStruct((grid[0], tile_n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (T * D, 3 * F), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((T * D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (8, tile_n), lambda i: (i // 8, 0), memory_space=pltpu.VMEM
            )
            if streamed
            else pl.BlockSpec(
                (grid[0], tile_n), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ),
        compiler_params=pltpu.CompilerParams(
            # consecutive iterations share an output block in both modes —
            # must not be split across cores (see ops/pallas_qs.py)
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(features, S, thr, wleaf)
    return out.reshape(-1)[:N]
