"""Pallas TPU kernel for perfect-tree (arbitrary ensemble) scoring.

Generalizes the oblivious bit-OR kernel to asymmetric trees embedded in
perfect depth-D form (trees/perfect.py): all 2^D - 1 internal-node
comparisons per tree are doc-independent column selections, computed on the
MXU exactly like the oblivious kernel (three bf16 planes reconstruct f32);
leaf membership is the path product over each leaf's D statically-indexed
ancestor bits — no per-doc gathers anywhere.

Rows are node-major (row i*T + t) so the per-(leaf, depth) ancestor slice
``bits[a_d(l)]`` is one contiguous [TB, TILE] block.

Cost scales with 2^D vs the oblivious kernel's D, so this path is for
depth-capped ensembles (D <= 5 by default); deeper trees fall back to the
descent scorer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quickrank_tpu.trees.perfect import PerfectEnsemble


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(feats_ref, s_ref, thr_ref, wleaf_ref, out_ref, *, T, D, TB, tile_n):
    I = 2**D - 1
    L = 2**D
    x = feats_ref[:]
    hi32 = x.astype(jnp.bfloat16).astype(jnp.float32)
    rem = x - hi32
    mid32 = rem.astype(jnp.bfloat16).astype(jnp.float32)
    hi = hi32.astype(jnp.bfloat16)
    mid = mid32.astype(jnp.bfloat16)
    lo = (rem - mid32).astype(jnp.bfloat16)

    total = jnp.zeros((1, tile_n), jnp.float32)
    for b in range(T // TB):
        # comparison bit planes for every internal node of this tree block
        bits = []
        for i in range(I):
            r0 = i * T + b * TB
            s_blk = s_ref[r0 : r0 + TB, :]
            sel = (
                jax.lax.dot_general(
                    s_blk, hi,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    s_blk, mid,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    s_blk, lo,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            # right-branch indicator (v > thr); +inf pass-through nodes give 0
            bits.append(
                (sel > thr_ref[r0 : r0 + TB, :]).astype(jnp.float32)
            )
        # level-by-level prefix products: every internal node's reach
        # indicator is built once and shared by both subtrees — 2L-2
        # multiplies instead of the naive L*D per-leaf path products
        cur = [None]  # None = empty product (root reach = 1)
        for d in range(D):
            nxt = []
            for j in range(2**d):
                bit = bits[(2**d - 1) + j]
                p = cur[j]
                if p is None:
                    nxt += [1.0 - bit, bit]
                else:
                    nxt += [p - p * bit, p * bit]  # p*(1-b) with one mul
            cur = nxt
        acc = jnp.zeros((TB, tile_n), jnp.float32)
        for l in range(L):
            acc = acc + wleaf_ref[b * TB : (b + 1) * TB, l][:, None] * cur[l]
        total = total + jnp.sum(acc, axis=0)[None, :]
    out_ref[pl.ds(pl.program_id(0), 1), :] = total


@partial(jax.jit, static_argnames=("tile_n", "tree_block"))
def score_perfect_pallas(
    features: jnp.ndarray,
    ens: PerfectEnsemble,
    tile_n: int = 256,
    tree_block: int = 0,
) -> jnp.ndarray:
    """Weighted ensemble scores f32 [N] for a perfect-embedded model."""
    N, F = features.shape
    T, I = ens.fid.shape
    D = ens.depth
    L = 2**D
    if tree_block <= 0:
        tree_block = T
        for cand in (125, 100, 50, 25, 20, 10, 5):
            if T % cand == 0 and T > cand:
                tree_block = cand
                break

    live = (jnp.arange(T) < ens.num_trees).astype(jnp.float32)
    wleaf = ens.leaf * (ens.weight * live)[:, None]
    # node-major rows: row i*T + t
    fid_nm = jnp.swapaxes(ens.fid, 0, 1).reshape(-1)
    S = (
        fid_nm[:, None] == jnp.arange(F, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    thr = jnp.swapaxes(ens.thr, 0, 1).reshape(-1, 1)

    n_pad = _round_up(max(N, tile_n), tile_n)
    if n_pad != N:
        features = jnp.pad(features, ((0, n_pad - N), (0, 0)))
    grid = (n_pad // tile_n,)
    assert T % tree_block == 0, (T, tree_block)

    out = pl.pallas_call(
        partial(_kernel, T=T, D=D, TB=tree_block, tile_n=tile_n),
        out_shape=jax.ShapeDtypeStruct((grid[0], tile_n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I * T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I * T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (grid[0], tile_n), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
    )(features, S, thr, wleaf)
    return out.reshape(-1)[:N]
