"""Microbenchmark for the node-histogram Pallas kernel (real TPU).

Sweeps tile/feature-group parameters of the production kernel
(ops/pallas_histogram.py::node_histogram_pallas) and measures experimental
one-hot-build variants at MSLR scale (2.6M docs, 144 padded features, 256
bins, 4 packed nodes x 2 channels).  The one-hot build is VPU-bound and
~95% of pass cost (CLAUDE.md perf notes); the "bcast" production variant
(ops/pallas_histogram.py, onehot="bcast") drops the repeat materialization.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_histkernel.py
"""

from __future__ import annotations

import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from quickrank_tpu.ops.pallas_histogram import node_histogram_pallas

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


def main():
    dev = jax.devices()[0]
    log(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    binned, vt, pos = make_inputs()

    # correctness cross-check on a slice (G=16 explicitly: the bcast
    # variant under the post-sweep G=32 default overflows scoped VMEM —
    # bcast lost the sweep and is kept only as a comparison point)
    ref = node_histogram_pallas(
        binned[:4096], vt[:, :4096], pos[:4096], B, 0, K_NODES,
        feat_group=16,
    )
    got = node_histogram_pallas(
        binned[:4096], vt[:, :4096], pos[:4096], B, 0, K_NODES,
        onehot="bcast", feat_group=16,
    )
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
            f = lambda b, v, p: node_histogram_pallas(
                b, v, p, B, 0, K_NODES, tile_n=tile_n, onehot="bcast",
                feat_group=16,  # bcast x G=32 overflows scoped VMEM
            )
            dt = timeit(f, binned, vt, pos)
            print(f"bcast    tile={tile_n:4d}        {dt*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"bcast    tile={tile_n:4d}        FAIL {type(e).__name__}: {e}"[:140])

    # data-dependent tile skip (skip_empty): measure (a) Mosaic compiles it,
    # (b) its overhead when every tile is live, (c) its win when in-range
    # docs are CLUSTERED (1/8 contiguous block — splits on query-correlated
    # features produce query-contiguous node runs), and (d) that scattered
    # membership is a no-op, not a loss (no tile is ever empty then).
    pos_clustered = jnp.asarray(
        np.where(np.arange(N) < N // 8, 0, K_NODES + 3).astype(np.int32)
    )
    pos_scattered = jnp.asarray(
        np.where(
            np.random.default_rng(1).uniform(size=N) < 0.125, 0, K_NODES + 3
        ).astype(np.int32)
    )
    for label, p_, skip in (
        ("all-live   skip=1", pos, True),
        ("all-live   skip=0", pos, False),
        ("1/8-clust  skip=1", pos_clustered, True),
        ("1/8-clust  skip=0", pos_clustered, False),
        ("1/8-scatt  skip=1", pos_scattered, True),
    ):
        try:
            f = lambda b, v, pp: node_histogram_pallas(
                b, v, pp, B, 0, K_NODES, tile_n=1024, skip_empty=skip
            )
            dt = timeit(f, binned, vt, p_)
            print(f"skiptest {label}  {dt*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"skiptest {label}  FAIL {type(e).__name__}: {e}"[:140])

    # best-first shape: one split pass = k=1 mask-as-node, C=3 channels
    # (count, grad, grad^2) — the masked_histogram_t path (trees/grow.py)
    rng = np.random.default_rng(2)
    vt3 = jnp.asarray(rng.standard_normal((3, N)).astype(np.float32))
    pos_bf = jnp.asarray(
        (rng.uniform(size=N) < 0.5).astype(np.int32) ^ 1
    )  # ~half the docs in the split leaf, scattered
    for tile_n in (512, 1024, 2048):
        try:
            f = lambda b, v, pp: node_histogram_pallas(
                b, v, pp, B, 0, 1, tile_n=tile_n
            )
            dt = timeit(f, binned, vt3, pos_bf)
            print(f"bestfirst k=1 C=3 tile={tile_n:4d}  {dt*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"bestfirst k=1 C=3 tile={tile_n:4d}  FAIL {type(e).__name__}: {e}"[:140])


if __name__ == "__main__":
    main()
