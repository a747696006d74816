"""Pallas TPU kernel for split-statistics histograms.

The pure-XLA path (ops/histogram.py) lowers the (feature, bin) scatter-add
to a sort-based scatter — the dominant cost of a boosting iteration on TPU.
This kernel reformulates the histogram as a matmul so it runs on the MXU:

    hist[c, f*B + b] = sum_n chan[n, c] * onehot(binned[n, f] == b)

i.e. contract the [C, TILE] channel block against a [TILE, G*B] one-hot
block (G features at a time), accumulating into a VMEM-resident [C, F*B]
output across doc tiles.  The channel axis (count, grad, grad^2, padded to
8 sublanes) is the M dimension and G*B (512+ lanes) the N dimension, so MXU
utilization is high.  Channel values are split hi+lo into two bf16 planes so
the f32 sums are reproduced to ~2^-16 relative — far below the gain-scan
noise floor.

Replaces the shared-memory accumulation loops of rtnode_histogram.cc:41-70
on the TPU path; ops/histogram.py dispatches here on TPU devices.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CH_PAD = 8  # minimum channel-row padding (one sublane tile)


from quickrank_tpu.ops.util import round_up as _round_up


def _bin_pad(num_bins: int, G: int) -> int:
    """Smallest bin-axis pad such that a G-feature column group spans a
    whole number of 128-lane tiles: ``(G * Bp) % LANES == 0``.

    The "repeat" one-hot layout interleaves features within a group
    (column = bin * G + feature), so the LANE-tiling constraint applies to
    the fused G*Bp axis, not to Bp itself — at the sweep-recommended 63
    bins with G=32 this gives Bp=64, halving the Ω(docs × feats × bins)
    one-hot build (77 % of the training step at 2.56M docs) and the MXU N
    dimension versus rounding every feature's bin axis up to 128.
    """
    step = LANES // math.gcd(G, LANES)
    return _round_up(num_bins, step)


def _kernel(binned_ref, chan_ref, out_ref, *, F, Bp, G, tile_n):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # hi+lo bf16 split inside the kernel (outside, XLA's excess-precision
    # folding can elide the rounding and silently drop the lo plane).  The
    # two planes are STACKED on the channel axis so one matmul covers both
    # (M stays under one 128-sublane tile either way).
    v = chan_ref[:]
    hi32 = v.astype(jnp.bfloat16).astype(jnp.float32)
    hi = hi32.astype(jnp.bfloat16)
    lo = (v - hi32).astype(jnp.bfloat16)
    planes = jnp.concatenate([hi, lo], axis=1)  # [TILE, 2*CH]
    ch = v.shape[1]

    # pltpu.repeat is a TILE repeat ([a b] -> [a b a b ...]), so column
    # col of the repeated block holds feature (col % G) at bin (col // G).
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, G * Bp), 1)
    bin_of_col = col // G
    for g0 in range(0, F, G):  # F is pre-padded to a multiple of G
        chunk = binned_ref[:, g0 : g0 + G].astype(jnp.int32)  # [TILE, G]
        rep = pltpu.repeat(chunk, Bp, axis=1)  # [TILE, G*Bp]
        oh = (rep == bin_of_col).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            planes, oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [2*CH, G*Bp]
        out_ref[:, g0 * Bp : g0 * Bp + G * Bp] += part[:ch] + part[ch:]


def _node_kernel(
    binned_ref, vals_ref, out_ref, *, F, Bp, G, tile_n, n0, k, C,
    onehot="repeat", skip_empty=True,
):
    """Per-node packed histogram: node selection happens IN the kernel.

    ``vals`` is TRANSPOSED [C+1, N]: rows 0..C-1 are the (pre-masked)
    channel values, row C is each doc's node id as f32.  The transposed
    layout keeps docs on the lane axis — the physical array is exact (a
    doc-major [N, small-C] f32 array is 128-lane padded by T(8,128) tiling,
    and a separate [N, 1] node operand poisons every downstream [N] op
    with that padded layout: a measured 0.2 s/iteration regression).  It
    is also the matmul-native orientation: the contraction runs directly
    as planes[ch, TILE] @ onehot[TILE, G*B] with no in-kernel transpose.
    Packing in VMEM avoids the [N, k*C] HBM round-trip (select + concat +
    layout copy + pad, ~25 ms/iteration at MSLR scale) host-side packing
    paid.

    ``onehot`` picks the one-hot build (the VPU-bound ~95% of pass cost):
      * "repeat" — pltpu.repeat the [TILE, G] chunk to [TILE, G*Bp] and
        compare against a bin-of-column iota; output bins interleaved by
        feature (col % G), one matmul per G features.
      * "bcast"  — per-feature broadcast compare of one column against a
        [TILE, Bp] iota (no repeat materialization — 1/3 fewer VPU ops),
        one matmul per feature; output is feature-major, no unscramble."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = vals_ref[C : C + 1, :]  # [1, TILE] node ids (exact f32)
    in_range = (p >= jnp.float32(n0)) & (p <= jnp.float32(n0 + k - 1))
    # data-dependent tile skip: a tile whose docs all belong to OTHER nodes
    # would contribute exact zeros — skip its one-hot + matmul work
    # entirely.  Fires when node membership is CLUSTERED in dataset order:
    # dataset order is query-contiguous, so splits on query-correlated
    # features (common in LTR) put whole queries on one side and leave
    # long dead runs for the sibling's pass; scattered membership just
    # pays this [1, TILE] reduction.  (Pad docs carry node id 0: they can
    # only inhibit the skip, never corrupt a sum — their values are 0.)
    def _accumulate():
        v = vals_ref[:C, :]  # [C, TILE] f32, pre-masked
        blocks = [
            v * (p == jnp.float32(n0 + i)).astype(jnp.float32)
            for i in range(k)
        ]  # node-major channel blocks
        ch_pad = out_ref.shape[0]
        if ch_pad > k * C:
            blocks.append(jnp.zeros((ch_pad - k * C, tile_n), jnp.float32))
        packed = jnp.concatenate(blocks, axis=0)  # [ch_pad, TILE]
        hi32 = packed.astype(jnp.bfloat16).astype(jnp.float32)
        hi = hi32.astype(jnp.bfloat16)
        lo = (packed - hi32).astype(jnp.bfloat16)
        planes = jnp.concatenate([hi, lo], axis=0)  # [2*ch_pad, TILE]

        if onehot == "bcast":
            col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, Bp), 1)
            for f in range(F):
                fcol = binned_ref[:, f : f + 1].astype(jnp.int32)  # [TILE, 1]
                oh = (fcol == col).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    planes, oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [2*ch_pad, Bp]
                out_ref[:, f * Bp : (f + 1) * Bp] += (
                    part[:ch_pad] + part[ch_pad:]
                )
            return

        col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, G * Bp), 1)
        bin_of_col = col // G
        for g0 in range(0, F, G):
            chunk = binned_ref[:, g0 : g0 + G].astype(jnp.int32)
            rep = pltpu.repeat(chunk, Bp, axis=1)
            oh = (rep == bin_of_col).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                planes, oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [2*ch_pad, G*Bp]
            out_ref[:, g0 * Bp : g0 * Bp + G * Bp] += (
                part[:ch_pad] + part[ch_pad:]
            )

    if skip_empty:
        pl.when(jnp.sum(in_range.astype(jnp.float32)) > 0.0)(_accumulate)
    else:
        _accumulate()


@partial(
    jax.jit,
    static_argnames=(
        "num_bins", "n0", "k", "tile_n", "feat_group", "onehot", "skip_empty",
        "f_used", "interpret",
    ),
)
def node_histogram_pallas(
    binned: jnp.ndarray,
    values_t: jnp.ndarray,
    pos: jnp.ndarray,
    num_bins: int,
    n0: int,
    k: int,
    tile_n: int = 1024,
    feat_group: int = 0,
    onehot: str = "repeat",
    skip_empty: bool = True,
    f_used: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """hist[f, b, i*C + c] = sum_{n: pos[n] == n0+i} values_t[c, n]
    [binned[n, f] == b]  ->  [F, B, k*C].

    ``values_t`` is channel-major [C, N] and must already be masked (zero
    columns for docs outside the doc mask).  Keep inputs doc-tile aligned
    (N % tile_n == 0 — see shard_and_pad's doc_align) for pad-free calls.
    ``f_used`` (0 = all columns) limits the histogram to the first
    ``f_used`` feature columns — the clustered work buffer is 128-lane
    padded for its DMA kernel, and the dead tail would otherwise pay
    one-hot cost."""
    N, F = binned.shape
    if f_used:
        F = f_used
    C = values_t.shape[0]
    ch = k * C
    ch_pad = _round_up(max(ch, CH_PAD), 8)
    if feat_group <= 0:
        # 2026-08-20 on-chip sweep (scripts/bench_bins_kernel.py): G=32 wins
        # at >=127 bins (47.5 vs 51.7 ms at 255); G=64 wins once the packed
        # bin pad is sub-128 (20.7 vs 22.4 ms at 63 bins, 15.8 vs 20.2 at
        # 31) — the wider group amortizes the per-group chunk handling that
        # dominates once the one-hot shrinks.  Guard on F so tiny problems
        # don't pay 8x feature padding.
        feat_group = 64 if (num_bins <= 64 and F >= 64) else 32
    G = feat_group
    # "bcast" writes per-feature [*, f*Bp:(f+1)*Bp] output slices, which are
    # lane-aligned only when Bp is a LANES multiple; "repeat" works on the
    # fused G*Bp axis and supports the packed sub-128 bin pad (63 bins ->
    # Bp=64 at G=32: two features share each 128-lane tile).
    Bp = (
        _round_up(num_bins, LANES) if onehot == "bcast"
        else _bin_pad(num_bins, G)
    )
    n_pad = _round_up(max(N, tile_n), tile_n)
    Fp = _round_up(F, G)
    # fold the node ids in as one more f32 channel row (ids < 2^24 exact);
    # fused into the same [C+1, N] operand write
    vals = jnp.concatenate(
        [values_t.astype(jnp.float32), pos.astype(jnp.float32)[None, :]],
        axis=0,
    )
    if n_pad != N:
        binned = jnp.pad(binned, ((0, n_pad - N), (0, 0)))
        # pad docs carry node id 0 (zero-padded pos row): they select node
        # n0 only when n0 == 0, and always with zero channel values — they
        # can inhibit the skip_empty tile skip but never perturb a sum
        vals = jnp.pad(vals, ((0, 0), (0, n_pad - N)))
    if binned.shape[1] < Fp:
        binned = jnp.pad(binned, ((0, 0), (0, Fp - binned.shape[1])))
    # the block carries binned's full width (a 128-lane-padded clustered
    # work buffer may be wider than Fp); the kernel loops only to Fp
    Wb = binned.shape[1]

    out = pl.pallas_call(
        partial(
            _node_kernel, F=Fp, Bp=Bp, G=G, tile_n=tile_n, n0=n0, k=k, C=C,
            onehot=onehot, skip_empty=skip_empty,
        ),
        out_shape=jax.ShapeDtypeStruct((ch_pad, Fp * Bp), jnp.float32),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, Wb), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C + 1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ch_pad, Fp * Bp), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(binned, vals)
    if onehot == "bcast":  # feature-major output, no interleave to undo
        hist = out[:ch].reshape(ch, Fp, Bp)[:, :F, :num_bins]
        return jnp.moveaxis(hist, 0, -1)
    hist = out[:ch].reshape(ch, Fp // G, Bp, G)
    hist = jnp.swapaxes(hist, 2, 3).reshape(ch, Fp, Bp)[:, :F, :num_bins]
    return jnp.moveaxis(hist, 0, -1)


@partial(
    jax.jit, static_argnames=("num_bins", "tile_n", "feat_group", "interpret")
)
def histogram_pallas(
    binned: jnp.ndarray,
    values: jnp.ndarray,
    num_bins: int,
    tile_n: int = 0,
    feat_group: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """hist[f, b, c] = sum_n values[n, c] [binned[n, f] == b]  ->  [F, B, C].

    ``values`` must already be masked (zero rows contribute nothing); padding
    docs added for tiling carry zero values.  The channel axis may carry
    several packed groups (e.g. per-node channels for level-wise growth) —
    it is padded to a multiple of 8 sublanes.
    """
    N, F = binned.shape
    C = values.shape[-1]
    ch_pad = _round_up(max(C, CH_PAD), 8)
    # Tile 1024 / G 32: EXTRAPOLATED from the 2026-08-19 on-chip sweep of
    # the NODE kernel (46 ms vs 55 ms at G=16, 220 ms at G=8 at MSLR scale,
    # scripts/bench_histkernel.py) — this plain kernel shares the one-hot
    # build that dominates that sweep but was not swept itself; its one
    # production caller (grow.py::segment_sums) pins feat_group=16 for its
    # single-column shape.  G's extra feature padding (F -> round_up(F, G))
    # is already priced into the sweep numbers.
    if tile_n <= 0:
        tile_n = 1024
    if feat_group <= 0:
        feat_group = 32
    Bp = _bin_pad(num_bins, feat_group)
    n_pad = _round_up(max(N, tile_n), tile_n)
    if n_pad != N:
        # pad docs carry zero channel values, so any bin id is harmless
        binned = jnp.pad(binned, ((0, n_pad - N), (0, 0)))
        values = jnp.pad(values, ((0, n_pad - N), (0, 0)))

    v = values.astype(jnp.float32)
    vp = jnp.pad(v, ((0, 0), (0, ch_pad - C)))

    # Feature-group G such that G*Bp lanes stay MXU-friendly but VMEM-light.
    G = feat_group
    grid = (n_pad // tile_n,)
    Fp = _round_up(F, G)
    if Fp != F:
        # pad feature columns land in output columns >= F, sliced away below
        binned = jnp.pad(binned, ((0, 0), (0, Fp - F)))

    out = pl.pallas_call(
        partial(_kernel, F=Fp, Bp=Bp, G=G, tile_n=tile_n),
        out_shape=jax.ShapeDtypeStruct((ch_pad, Fp * Bp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, Fp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, ch_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ch_pad, Fp * Bp), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(binned, vp)
    # out column layout per G-group: col = b * G + g  (tile-repeat order)
    # [CH_PAD, Fp*Bp] -> [C, n_groups, Bp, G] -> [C, n_groups, G, Bp]
    hist = out[:C].reshape(C, Fp // G, Bp, G)
    hist = jnp.swapaxes(hist, 2, 3).reshape(C, Fp, Bp)[:, :F, :num_bins]
    return jnp.moveaxis(hist, 0, -1)
