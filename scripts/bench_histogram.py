"""Standalone probe for the histogram Pallas kernel at web30k scale.

Decomposes the ~50 ms/pass cost (BENCHMARKS.md hot-spot table) by timing
kernel VARIANTS that differ only in how the one-hot block is built:

  current   pltpu.repeat -> i32 compare -> bf16 select   (3 VPU ops/elem)
  bcast     broadcasted 3-D compare, g-major columns     (no repeat copy)
  nobuild   matmul against a constant block (MXU + load floor)
  nomatmul  build the one-hot, reduce it cheaply (VPU build cost alone)

All data are jit arguments (closure constants would be baked into the
executable), and iterations are chained through a data dependency inside
one lax.scan (on the axon tunnel block_until_ready does not reliably wait;
see CLAUDE.md timing gotcha).

Usage: PYTHONPATH=.:/root/.axon_site python scripts/bench_histogram.py
Env:   QRTPU_HB_N (docs, default 2558169), QRTPU_HB_C (channels, default 3),
       QRTPU_HB_VARIANTS (comma list), QRTPU_HB_TILES / QRTPU_HB_GROUPS.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# -- variant kernels ---------------------------------------------------------


def _planes(chan_ref):
    v = chan_ref[:]
    hi32 = v.astype(jnp.bfloat16).astype(jnp.float32)
    hi = hi32.astype(jnp.bfloat16)
    lo = (v - hi32).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=1), v.shape[1]


def _k_current(binned_ref, chan_ref, out_ref, *, F, Bp, G, tile_n):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    planes, ch = _planes(chan_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, G * Bp), 1)
    bin_of_col = col // G
    for g0 in range(0, F, G):
        chunk = binned_ref[:, g0 : g0 + G].astype(jnp.int32)
        rep = pltpu.repeat(chunk, Bp, axis=1)
        oh = (rep == bin_of_col).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            planes, oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, g0 * Bp : g0 * Bp + G * Bp] += part[:ch] + part[ch:]


def _k_bcast(binned_ref, chan_ref, out_ref, *, F, Bp, G, tile_n):
    """One-hot as a broadcasted compare per feature column (g-major cols)."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    planes, ch = _planes(chan_ref)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile_n, Bp), 1)
    for g0 in range(0, F, G):
        ohs = []
        for g in range(G):
            c = binned_ref[:, g0 + g].astype(jnp.int32)
            ohs.append((c[:, None] == iota).astype(jnp.bfloat16))
        oh = jnp.concatenate(ohs, axis=1)  # [TILE, G*Bp], g-major
        part = jax.lax.dot_general(
            planes, oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, g0 * Bp : g0 * Bp + G * Bp] += part[:ch] + part[ch:]


def _k_nobuild(binned_ref, chan_ref, out_ref, *, F, Bp, G, tile_n):
    """Matmul + memory floor: contract against a data-independent block."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    planes, ch = _planes(chan_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, G * Bp), 1)
    for g0 in range(0, F, G):
        # touch the binned block so the HBM load is not elided; vary the
        # block per group so the matmul cannot be CSE'd across the loop
        touch = binned_ref[:, g0 : g0 + G].astype(jnp.int32)
        oh0 = (col % 7 == (g0 % 5)).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            planes, oh0, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, g0 * Bp : g0 * Bp + G * Bp] += (
            part[:ch] + part[ch:] + jnp.sum(touch[0, :]).astype(jnp.float32)
        )


def _k_nomatmul(binned_ref, chan_ref, out_ref, *, F, Bp, G, tile_n):
    """Build cost alone: one-hot built then folded by a cheap reduction."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _planes(chan_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, G * Bp), 1)
    bin_of_col = col // G
    acc = jnp.zeros((8, G * Bp), jnp.float32)
    for g0 in range(0, F, G):
        chunk = binned_ref[:, g0 : g0 + G].astype(jnp.int32)
        rep = pltpu.repeat(chunk, Bp, axis=1)
        oh = (rep == bin_of_col).astype(jnp.bfloat16)
        acc = acc + jnp.sum(
            oh.reshape(tile_n // 8, 8, G * Bp), axis=0
        ).astype(jnp.float32)
    out_ref[:8, : G * Bp] += acc


KERNELS = {
    "current": _k_current,
    "bcast": _k_bcast,
    "nobuild": _k_nobuild,
    "nomatmul": _k_nomatmul,
}


@partial(
    jax.jit,
    static_argnames=("variant", "num_bins", "tile_n", "feat_group", "reps"),
)
def run_variant(binned, values, variant, num_bins, tile_n, feat_group, reps):
    """reps chained kernel calls; returns (hist, checksum). Inputs must be
    pre-padded: N % tile_n == 0, F % feat_group == 0, C % 8 == 0."""
    N, F = binned.shape
    ch_pad = values.shape[1]
    Bp = _round_up(num_bins, LANES)
    G = feat_group

    def call(v):
        return pl.pallas_call(
            partial(KERNELS[variant], F=F, Bp=Bp, G=G, tile_n=tile_n),
            out_shape=jax.ShapeDtypeStruct((ch_pad, F * Bp), jnp.float32),
            grid=(N // tile_n,),
            in_specs=[
                pl.BlockSpec((tile_n, F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, ch_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ch_pad, F * Bp), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(binned, v)

    def body(carry, _):
        v, s = carry
        h = call(v)
        s2 = h[0, 0]
        # chain: next input depends on this output (unfoldable, value-neutral)
        v2 = v + (s2 * jnp.float32(1e-38)).astype(v.dtype)
        return (v2, s + s2), None

    (vf, s), _ = jax.lax.scan(body, (values, jnp.float32(0.0)), None,
                              length=reps)
    return s


def main():
    N = int(os.environ.get("QRTPU_HB_N", 2558169))
    C = int(os.environ.get("QRTPU_HB_C", 3))
    B = 255
    F = 136
    variants = os.environ.get(
        "QRTPU_HB_VARIANTS", "nobuild,nomatmul,current,bcast"
    ).split(",")
    tiles = [int(x) for x in os.environ.get("QRTPU_HB_TILES", "1024").split(",")]
    groups = [int(x) for x in os.environ.get("QRTPU_HB_GROUPS", "16").split(",")]

    rng = np.random.default_rng(0)
    tile_max, g_max = max(tiles), max(groups)
    Np = _round_up(N, tile_max * (min(tiles) if len(tiles) > 1 else 1))
    Np = _round_up(N, int(np.lcm.reduce(tiles)))
    Fp = _round_up(F, int(np.lcm.reduce(groups)))
    Cp = _round_up(max(C, 8), 8)
    binned = jnp.asarray(rng.integers(0, B, (Np, Fp), dtype=np.uint8))
    values = jnp.asarray(
        rng.standard_normal((Np, Cp), dtype=np.float32)
    )
    gb = Np * Fp / 1e9
    print(f"# N={Np} F={Fp} C={Cp} B={B}  ({gb:.2f} G doc-feats/pass)")

    reps = 10
    for tile in tiles:
        for G in groups:
            for v in variants:
                t0 = time.perf_counter()
                s = run_variant(binned, values, v, B, tile, G, reps)
                float(s)  # compile + warm (same static reps as timed call)
                t_c = time.perf_counter() - t0
                t0 = time.perf_counter()
                s = run_variant(binned, values, v, B, tile, G, reps)
                float(s)
                dt = (time.perf_counter() - t0) / reps
                print(
                    f"tile={tile:5d} G={G:3d} {v:9s} {dt * 1e3:8.2f} ms/pass"
                    f"  (compile+1 {t_c:.1f}s)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
