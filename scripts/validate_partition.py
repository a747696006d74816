"""On-chip validation + timing of the partition kernel (real TPU).

Randomized directive sets are run through BOTH the Pallas kernel and the
XLA reference (ops/pallas_partition.py) and compared bit-exactly; then
an MSLR-scale timing probe measures ms/partition for an all-MOVE repack
(level-wise shape) and a mostly-COPY repack (best-first shape).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_partition.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from quickrank_tpu.ops.pallas_partition import (
    MODE_COPY, MODE_DEAD, MODE_MOVE, TILE, _partition_rows_tpu,
    partition_rows_xla,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_directives(rng, T, W, pos_col, runs):
    """Random run layout: `runs` = list of (start_tile, n_tiles, split?)."""
    N = T * TILE
    data = rng.integers(0, 256, (N, W)).astype(np.uint8)
    data[:, pos_col] = 0  # default dead
    bit = np.full(N, 2, np.int32)
    mode = np.full(T, MODE_DEAD, np.int32)
    dsta = np.zeros(T, np.int32)
    dstb = np.zeros(T, np.int32)
    sz = np.zeros(T, np.int32)
    so = np.zeros(T, np.int32)
    fstar = np.zeros(T, np.int32)
    tstar = np.zeros(T, np.int32)

    def align(n):
        return -(-n // TILE) * TILE

    out_ptr = 0
    stamp = 3
    for (s, n, split) in runs:
        rows = slice(s * TILE, (s + n) * TILE)
        data[rows, pos_col] = stamp
        # sprinkle dead pad rows inside the run
        deadmask = rng.random(n * TILE) < 0.05
        seg = data[rows]
        seg[deadmask, pos_col] = 0
        data[rows] = seg
        if not split:
            for i in range(n):
                mode[s + i] = MODE_COPY
                dsta[s + i] = out_ptr + i * TILE
            out_ptr += n * TILE + TILE
        else:
            f = int(rng.integers(0, W - 16))
            t = int(rng.integers(64, 192))
            live = data[rows][:, pos_col] > 0
            # bit: 0 = goes left (bin <= t), 1 = right, 2 = dead
            b = np.where(live, (data[rows][:, f] > t).astype(np.int32), 2)
            bit[rows] = b
            zc = np.array([
                (b[i * TILE:(i + 1) * TILE] == 0).sum() for i in range(n)
            ])
            oc = np.array([
                (b[i * TILE:(i + 1) * TILE] == 1).sum() for i in range(n)
            ])
            # DMA row offsets must be 8-aligned (sublane tiling): each
            # tile's stream contribution is padded to 8 rows — the <=7-row
            # gaps inside a child run are zero (dead) rows, harmless to
            # the tile-pure layout
            align8 = lambda n: -(-n // 8) * 8  # noqa: E731
            zstart = out_ptr
            ostart = zstart + align(sum(align8(c) for c in zc)) + TILE
            zoff, ooff = zstart, ostart
            for i in range(n):
                mode[s + i] = MODE_MOVE
                dsta[s + i] = zoff
                dstb[s + i] = ooff
                sz[s + i] = stamp * 2
                so[s + i] = stamp * 2 + 1
                fstar[s + i] = f
                tstar[s + i] = t
                zoff += align8(zc[i])
                ooff += align8(oc[i])
            out_ptr = ostart + align(sum(align8(c) for c in oc)) + TILE
        stamp += 4
    assert out_ptr <= N, (out_ptr, N)
    return data, bit, mode, dsta, dstb, sz, so, fstar, tstar


def run_both(case, pos_col):
    data, bit, mode, dsta, dstb, sz, so, fstar, tstar = case
    j = jnp.asarray
    got = _partition_rows_tpu(
        j(data), j(mode), j(dsta), j(dstb), j(sz), j(so), j(fstar),
        j(tstar), pos_col,
    )
    want = partition_rows_xla(
        j(data), j(bit), j(mode), j(dsta), j(dstb), j(sz), j(so), pos_col
    )
    return np.asarray(got), np.asarray(want)


def main():
    dev = jax.devices()[0]
    log(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)
    W, pos_col = 256, 168

    for trial in range(4):
        case = build_directives(
            rng, 24, W, pos_col,
            [(0, 3, True), (4, 2, False), (7, 4, True), (12, 1, False)],
        )
        got, want = run_both(case, pos_col)
        if not (got == want).all():
            bad = np.argwhere(got != want)
            log(f"trial {trial}: MISMATCH at {bad[:5]} "
                f"got {got[tuple(bad[0])]} want {want[tuple(bad[0])]}")
            sys.exit(1)
        mode = case[2]
        log(f"trial {trial}: exact match ({(mode == MODE_MOVE).sum()} move "
            f"/ {(mode == MODE_COPY).sum()} copy tiles)")

    # timing at MSLR scale
    N = 2_560_000 // TILE * TILE
    T = N // TILE
    for name, move_frac in (("all-move (level-wise)", 1.0),
                            ("1/8-move (best-first deep split)", 0.125)):
        n_move = int(T * move_frac * 0.45)
        runs = [(0, n_move, True)]
        if move_frac < 1.0:
            runs.append((n_move + 1, int(T * 0.4), False))
        data, bit, mode, dsta, dstb, sz, so, fstar, tstar = (
            build_directives(rng, T, W, pos_col, runs)
        )
        j = jnp.asarray
        args = (j(data), j(mode), j(dsta), j(dstb), j(sz), j(so),
                j(fstar), j(tstar))
        out = _partition_rows_tpu(*args, pos_col)
        float(out[0, 0].astype(jnp.float32))  # compile + sync
        t0 = time.perf_counter()
        rounds = 8
        acc = jnp.float32(0)
        for _ in range(rounds):
            out = _partition_rows_tpu(*args, pos_col)
            acc = acc + out[0, 0].astype(jnp.float32)
        float(acc)
        dt = (time.perf_counter() - t0) / rounds
        print(f"{name:36s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
