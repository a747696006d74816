"""Pass cost of node_histogram_pallas vs packed-node count (real TPU).

The r3 step profile showed best-first in-loop passes (~18 ms, k=1) cost
half a level-wise packed pass (38.5-55.8 ms, k<=10) — i.e. the MXU matmul
(M = 2 * ch_pad grows with packed nodes) is a major cost component, not
just the VPU one-hot build.  This sweep pins the M-scaling to size the
min-side sibling-subtraction redesign, and re-validates the skip_empty
tile skip at the k=1 shape on clustered vs scattered membership.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_nodesweep.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from quickrank_tpu.ops.pallas_histogram import node_histogram_pallas

N, F, B = 2_560_000, 160, 256  # F pre-padded to G=32 multiple (no in-call pad)
C = 3  # count, grad, newton weight (the LambdaMART channel set)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, rounds=8):
    out = fn(*args)
    acc = jnp.zeros_like(out)
    acc = acc + fn(*args)
    s = float(acc.sum())
    if not np.isfinite(s):
        raise RuntimeError("non-finite warmup")
    t0 = time.perf_counter()
    for _ in range(rounds):
        acc = acc * 0.5 + fn(*args)
    float(acc.sum())
    return (time.perf_counter() - t0) / rounds


def main():
    dev = jax.devices()[0]
    log(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')} "
        f"N={N} F={F} B={B} C={C}")
    rng = np.random.default_rng(0)
    binned = jnp.asarray(rng.integers(0, B, size=(N, F)).astype(np.uint8))
    vt = jnp.asarray(rng.standard_normal((C, N)).astype(np.float32))

    for k in (1, 2, 4, 8, 10, 16):
        pos = jnp.asarray(rng.integers(0, k, size=N).astype(np.int32))
        fn = lambda b, v, p: node_histogram_pallas(b, v, p, B, 0, k)  # noqa: E731
        dt = timeit(fn, binned, vt, pos)
        ch_pad = max(8, -(-k * C // 8) * 8)
        print(f"k={k:2d} (M={2*ch_pad:3d})  uniform pos      {dt*1e3:8.2f} ms")

    # skip_empty at the k=1 shape: live fraction 1/2 and 1/8,
    # clustered (contiguous) vs scattered membership
    for frac, name in ((0.5, "1/2"), (0.125, "1/8")):
        live = int(N * frac)
        pos_c = jnp.asarray(
            (np.arange(N) >= live).astype(np.int32)
        )  # first `live` docs are node 0
        pos_s = jnp.asarray((rng.random(N) >= frac).astype(np.int32))
        fn = lambda b, v, p: node_histogram_pallas(b, v, p, B, 0, 1)  # noqa: E731
        dt_c = timeit(fn, binned, vt, pos_c)
        dt_s = timeit(fn, binned, vt, pos_s)
        print(f"k= 1 live={name}: clustered {dt_c*1e3:8.2f} ms   "
              f"scattered {dt_s*1e3:8.2f} ms")

    # in-call feature pad cost: same pass from a 144-column binned
    binned144 = binned[:, :144]
    pos = jnp.asarray(rng.integers(0, 4, size=N).astype(np.int32))
    f160 = lambda b, v, p: node_histogram_pallas(b, v, p, B, 0, 4)  # noqa: E731
    dt_pre = timeit(f160, binned, vt, pos)
    dt_pad = timeit(f160, binned144, vt, pos)
    print(f"k= 4 F=160 prepadded {dt_pre*1e3:8.2f} ms   "
          f"F=144 (in-call pad to 160) {dt_pad*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
