"""On-chip cost of doc-axis permutation primitives at MSLR scale.

The node-clustered histogram ordering (VERDICT r2 item 1) hinges on how
much a full row permutation of the binned [N, F] u8 tensor costs per tree
level.  This sweeps the candidate implementations:

  * take      — jnp.take(binned, perm, axis=0) (row gather)
  * scatter   — zeros.at[dest].set(binned) (row scatter)
  * onehot-mm — permutation as a tiled bf16 one-hot matmul on the MXU
  * 1-bit dest computation — the [N] cumsum arithmetic that derives the
    stable-partition destination from routing bits (per level)

plus the [C, N] lane gather for the channel rows.  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_permute.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, rounds=10):
    """Chained-accumulator timing (CLAUDE.md: block_until_ready on the axon
    tunnel is unreliable — chain iterations and fetch a scalar)."""
    out = fn(*args)
    leaves = jax.tree.leaves(out)
    float(jnp.sum(leaves[0][..., :1].astype(jnp.float32)))  # warm + sync
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(rounds):
        out = fn(*args)
        acc = acc + jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32))
    float(acc)
    return (time.perf_counter() - t0) / rounds


def main():
    N, F = 2_600_000 // 1024 * 1024, 144
    rng = np.random.default_rng(0)
    binned = jax.device_put(rng.integers(0, 256, (N, F)).astype(np.uint8))
    perm_h = rng.permutation(N).astype(np.int32)
    perm = jax.device_put(perm_h)
    chan = jax.device_put(rng.standard_normal((4, N)).astype(np.float32))
    bits = jax.device_put((rng.random(N) < 0.5).astype(np.int32))
    dev = jax.devices()[0]
    log(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}  N={N} F={F}")

    take = jax.jit(lambda b, p: jnp.take(b, p, axis=0))
    dt = timeit(take, binned, perm)
    log(f"take(binned u8 [N,F], perm)         : {dt*1e3:8.2f} ms")

    b32 = binned.astype(jnp.int32)
    dt = timeit(take, b32, perm)
    log(f"take(binned i32 [N,F], perm)        : {dt*1e3:8.2f} ms")

    scat = jax.jit(
        lambda b, d: jnp.zeros_like(b).at[d].set(b, unique_indices=True)
    )
    dt = timeit(scat, binned, perm)
    log(f"scatter rows u8 (.at[dest].set)     : {dt*1e3:8.2f} ms")

    lane = jax.jit(lambda c, p: jnp.take(c, p, axis=1))
    dt = timeit(lane, chan, perm)
    log(f"take(chan f32 [4,N], perm, axis=1)  : {dt*1e3:8.2f} ms")

    flat = jax.jit(lambda c, p: jnp.take(c, p, axis=0))
    dt = timeit(flat, chan[0], perm)
    log(f"take(flat f32 [N], perm)            : {dt*1e3:8.2f} ms")

    def dest_of_bits(bit):
        z = 1 - bit
        zc = jnp.cumsum(z)
        nz = zc[-1]
        oc = jnp.cumsum(bit)
        return jnp.where(bit == 0, zc - 1, nz + oc - 1).astype(jnp.int32)

    dt = timeit(jax.jit(dest_of_bits), bits)
    log(f"1-bit dest (2x [N] i32 cumsum)      : {dt*1e3:8.2f} ms")

    # permutation as MXU one-hot matmul, tiled: out[i,:] = in[perm[i],:].
    # Tile the N axis: out tile t needs rows perm[t*T:(t+1)*T] which span
    # all of `in` — a [T, N] one-hot is too big; instead go via sort:
    srt = jax.jit(
        lambda b, p: jax.lax.sort(
            (p,) + tuple(b[:, i] for i in range(0, F, 4)), num_keys=1
        )
    )
    try:
        dt = timeit(srt, binned, perm)
        log(f"lax.sort key + 36 u8 payload cols   : {dt*1e3:8.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"lax.sort payload variant failed: {e}")

    # argsort of small-int keys (the per-level pos sort alternative)
    pos = jax.device_put(rng.integers(0, 16, N).astype(np.int32))
    asrt = jax.jit(lambda p: jnp.argsort(p, stable=True))
    dt = timeit(asrt, pos)
    log(f"stable argsort of [N] i32 (16 vals) : {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
