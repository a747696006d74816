"""Microbenchmark for the node-histogram Pallas kernel (real TPU).

Sweeps tile/feature-group parameters of the production kernel
(ops/pallas_histogram.py::node_histogram_pallas) and measures experimental
one-hot-build variants at MSLR scale (2.6M docs, 144 padded features, 256
bins, 4 packed nodes x 2 channels).  The one-hot build is VPU-bound and
~95% of pass cost (CLAUDE.md perf notes), so variants target fewer VPU ops:

  * bcast  — per-feature broadcast compare (one column vs a [TILE, B] iota)
             instead of pltpu.repeat materializing [TILE, G*B]; one matmul
             per feature accumulating straight into the output block.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_histkernel.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quickrank_tpu.ops.pallas_histogram import (
    LANES,
    _round_up,
    node_histogram_pallas,
)

N, F, B = 2_560_000, 144, 256
K_NODES, C = 4, 2  # one mid-level pass: 4 nodes x (grad, count)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    binned = jnp.asarray(rng.integers(0, B, size=(N, F)).astype(np.uint8))
    vt = jnp.asarray(rng.standard_normal((C, N)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, K_NODES, size=N).astype(np.int32))
    return binned, vt, pos


def timeit(fn, *args, rounds=8):
    """Chained accumulator timing (axon tunnel: block_until_ready on the
    output alone is unreliable — fetch a scalar through a data chain)."""
    out = fn(*args)
    acc = jnp.zeros_like(out)
    acc = acc + fn(*args)
    float(acc.sum())  # warm + sync
    t0 = time.perf_counter()
    for _ in range(rounds):
        acc = acc * 0.5 + fn(*args)
    s = float(acc.sum())
    dt = (time.perf_counter() - t0) / rounds
    assert np.isfinite(s)
    return dt


# -- experimental: repeat-free per-feature broadcast compare -----------------

def _bcast_kernel(binned_ref, vals_ref, out_ref, *, F, Bp, tile_n, n0, k, C):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v = vals_ref[:C, :]
    p = vals_ref[C : C + 1, :]
    blocks = [
        v * (p == jnp.float32(n0 + i)).astype(jnp.float32) for i in range(k)
    ]
    ch_pad = out_ref.shape[0]
    if ch_pad > k * C:
        blocks.append(jnp.zeros((ch_pad - k * C, tile_n), jnp.float32))
    packed = jnp.concatenate(blocks, axis=0)
    hi32 = packed.astype(jnp.bfloat16).astype(jnp.float32)
    hi = hi32.astype(jnp.bfloat16)
    lo = (packed - hi32).astype(jnp.bfloat16)
    planes = jnp.concatenate([hi, lo], axis=0)  # [2*ch_pad, TILE]

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, Bp), 1)
    for f in range(F):
        fcol = binned_ref[:, f : f + 1].astype(jnp.int32)  # [TILE, 1]
        oh = (fcol == col).astype(jnp.bfloat16)  # broadcast, no repeat
        part = jax.lax.dot_general(
            planes, oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, f * Bp : (f + 1) * Bp] += part[:ch_pad] + part[ch_pad:]


@partial(jax.jit, static_argnames=("num_bins", "n0", "k", "tile_n"))
def bcast_variant(binned, values_t, pos, num_bins, n0, k, tile_n=1024):
    N_, F_ = binned.shape
    C_ = values_t.shape[0]
    ch_pad = _round_up(max(k * C_, 8), 8)
    Bp = _round_up(num_bins, LANES)
    n_pad = _round_up(max(N_, tile_n), tile_n)
    vals = jnp.concatenate(
        [values_t.astype(jnp.float32), pos.astype(jnp.float32)[None, :]], axis=0
    )
    if n_pad != N_:
        binned = jnp.pad(binned, ((0, n_pad - N_), (0, 0)))
        vals = jnp.pad(vals, ((0, 0), (0, n_pad - N_)))
    out = pl.pallas_call(
        partial(_bcast_kernel, F=F_, Bp=Bp, tile_n=tile_n, n0=n0, k=k, C=C_),
        out_shape=jax.ShapeDtypeStruct((ch_pad, F_ * Bp), jnp.float32),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, F_), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C_ + 1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ch_pad, F_ * Bp), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
    )(binned, vals)
    hist = out[: k * C_].reshape(k * C_, F_, Bp)[:, :, :num_bins]
    return jnp.moveaxis(hist, 0, -1)


def main():
    dev = jax.devices()[0]
    log(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    binned, vt, pos = make_inputs()

    # correctness cross-check on a slice
    ref = node_histogram_pallas(binned[:4096], vt[:, :4096], pos[:4096], B, 0, K_NODES)
    got = bcast_variant(binned[:4096], vt[:, :4096], pos[:4096], B, 0, K_NODES)
    err = float(jnp.max(jnp.abs(ref - got)))
    log(f"# bcast vs current max|diff| = {err:.3e}")

    for tile_n in (512, 1024, 2048):
        for G in (8, 16, 32):
            try:
                f = lambda b, v, p: node_histogram_pallas(
                    b, v, p, B, 0, K_NODES, tile_n=tile_n, feat_group=G
                )
                dt = timeit(f, binned, vt, pos)
                print(f"current  tile={tile_n:4d} G={G:2d}  {dt*1e3:8.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"current  tile={tile_n:4d} G={G:2d}  FAIL {type(e).__name__}: {e}"[:140])
    for tile_n in (512, 1024, 2048):
        try:
            f = lambda b, v, p: bcast_variant(b, v, p, B, 0, K_NODES, tile_n=tile_n)
            dt = timeit(f, binned, vt, pos)
            print(f"bcast    tile={tile_n:4d}        {dt*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"bcast    tile={tile_n:4d}        FAIL {type(e).__name__}: {e}"[:140])


if __name__ == "__main__":
    main()
