"""On-chip parity + timing for the packed sub-128 bin-pad histogram path.

At the sweep-recommended 63 bins the r4 kernel rounded the bin axis up to
128 lanes, so the Ω(docs x feats x bins) one-hot build ran at 50% lane
occupancy ("63 and 127 bins cost the SAME kernel time", BENCHMARKS.md).
The r5 packed layout (ops/pallas_histogram.py::_bin_pad) fuses the
G-feature group onto one lane axis, so 63 bins -> Bp=64: two features per
128-lane tile.  This script checks bit-level parity vs the scatter path on
the real chip and times 63 vs 127 vs 255 bins at MSLR scale (127 costs
exactly what 63 cost before the change — the built-in "before" number).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_bins_kernel.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax.numpy as jnp

from quickrank_tpu.ops.histogram import masked_histogram_scatter, node_histograms_scatter
from quickrank_tpu.ops.pallas_histogram import node_histogram_pallas

N, F = 2_560_000, 144
K_NODES, C = 4, 2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, rounds=8):
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


def main():
    rng = np.random.default_rng(0)

    # ---- parity on a slice, on the real chip (Mosaic path, not interpret)
    n_small = 8192
    for bins in (63, 31, 96, 255):
        binned_s = jnp.asarray(
            rng.integers(0, bins, size=(n_small, F)).astype(np.uint8)
        )
        vt_s = jnp.asarray(rng.standard_normal((C, n_small)).astype(np.float32))
        pos_s = jnp.asarray(rng.integers(0, K_NODES, size=n_small).astype(np.int32))
        got = node_histogram_pallas(binned_s, vt_s, pos_s, bins, 0, K_NODES)
        ref = node_histograms_scatter(
            binned_s.astype(jnp.int32), vt_s.T,
            pos_s, jnp.ones((n_small,), bool), K_NODES, bins,
        )  # [k, F, B, C] -> [F, B, k*C]
        ref2 = jnp.moveaxis(ref, 0, 2).reshape(F, bins, K_NODES * C)
        err = float(jnp.max(jnp.abs(got - ref2)))
        scale = float(jnp.max(jnp.abs(ref2)))
        log(f"# parity bins={bins}: max|diff|={err:.3e} (scale {scale:.1f})")
        assert err <= 2e-4 * max(scale, 1.0), (bins, err)

        # k=1 masked path parity too (best-first shape)
        got1 = node_histogram_pallas(
            binned_s, vt_s, (pos_s == 0).astype(jnp.int32) ^ 1, bins, 0, 1
        )
        ref1 = masked_histogram_scatter(
            binned_s.astype(jnp.int32), vt_s.T, pos_s == 0, bins
        )
        err1 = float(jnp.max(jnp.abs(got1 - ref1)))
        assert err1 <= 2e-4 * max(scale, 1.0), (bins, err1)
    log("# parity OK")

    # ---- timing at MSLR scale (burn-in first: the FIRST timed loop in a
    # process reads 2.5-6x inflated on this tunnel; interleave variants so
    # drift hits all of them equally — CLAUDE.md measurement gotchas)
    binned255 = jnp.asarray(rng.integers(0, 255, size=(N, F)).astype(np.uint8))
    vt = jnp.asarray(rng.standard_normal((C, N)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, K_NODES, size=N).astype(np.int32))

    BINS = (255, 127, 63, 31)
    binned_of = {
        b: jnp.minimum(binned255, b - 1).astype(jnp.uint8) for b in BINS
    }
    fns = {
        b: (lambda b_: (lambda x, v, p: node_histogram_pallas(
            x, v, p, b_, 0, K_NODES)))(b)
        for b in BINS
    }
    # burn-in: one full timed loop whose result is discarded
    timeit(fns[255], binned_of[255], vt, pos, rounds=4)
    # 3 interleaved repetitions per variant; report median
    times = {b: [] for b in BINS}
    for _ in range(3):
        for b in BINS:
            times[b].append(timeit(fns[b], binned_of[b], vt, pos, rounds=6))
    for b in BINS:
        med = float(np.median(times[b]) * 1e3)
        spread = (max(times[b]) - min(times[b])) * 1e3
        print(f"node k=4 C=2  bins={b:3d}  {med:8.2f} ms  (spread {spread:.1f})")

    # best-first shape: k=1, C=3
    vt3 = jnp.asarray(rng.standard_normal((3, N)).astype(np.float32))
    pos_bf = jnp.asarray((rng.uniform(size=N) < 0.5).astype(np.int32))
    fns1 = {
        b: (lambda b_: (lambda x, v, p: node_histogram_pallas(
            x, v, p, b_, 0, 1)))(b)
        for b in BINS
    }
    times1 = {b: [] for b in BINS}
    for _ in range(3):
        for b in BINS:
            times1[b].append(
                timeit(fns1[b], binned_of[b], vt3, pos_bf, rounds=6)
            )
    for b in BINS:
        med = float(np.median(times1[b]) * 1e3)
        spread = (max(times1[b]) - min(times1[b])) * 1e3
        print(f"bestfirst k=1 C=3  bins={b:3d}  {med:8.2f} ms  (spread {spread:.1f})")


if __name__ == "__main__":
    main()
