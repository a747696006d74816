"""Row-partition primitive (ops/pallas_partition.py): XLA reference
semantics (the CPU path the clustered growers use off-TPU).

The TPU kernel itself is validated on-chip against this reference by
scripts/validate_partition.py (randomized); here we pin the reference's
contract: stable within-tile order, tile-aligned child runs, dead rows
dropped, pos bytes restamped, copies relocated verbatim.
"""

import numpy as np
import jax.numpy as jnp

from quickrank_tpu.ops.pallas_partition import (
    MODE_COPY,
    MODE_DEAD,
    MODE_MOVE,
    TILE,
    partition_rows_xla,
)


def _np_reference(data, bit, mode, dsta, dstb, sz, so, pos_col):
    N, W = data.shape
    out = np.zeros_like(data)
    for t in range(N // TILE):
        rows = data[t * TILE : (t + 1) * TILE]
        b = bit[t * TILE : (t + 1) * TILE]
        if mode[t] == MODE_COPY:
            out[dsta[t] : dsta[t] + TILE] = rows
        elif mode[t] == MODE_MOVE:
            z = rows[b == 0].copy()
            o = rows[b == 1].copy()
            z[:, pos_col] = sz[t]
            o[:, pos_col] = so[t]
            out[dsta[t] : dsta[t] + len(z)] = z
            out[dstb[t] : dstb[t] + len(o)] = o
    return out


def _random_case(rng, T=12, W=40, pos_col=37):
    N = T * TILE
    data = rng.integers(0, 256, (N, W)).astype(np.uint8)
    data[:, pos_col] = rng.integers(1, 5, N)
    bit = rng.integers(0, 3, N).astype(np.int32)  # 2 = dead
    # layout: tiles 0-1 = one splitting run, 2-3 = surviving runs (copy,
    # relocated), 4 = dead, 5 = splitting run of a second node; tiles
    # 6-11 = dead slack the repack expands into (fixed-size work buffer)
    mode = np.array(
        [MODE_MOVE, MODE_MOVE, MODE_COPY, MODE_COPY, MODE_DEAD, MODE_MOVE]
        + [MODE_DEAD] * (T - 6),
        np.int32,
    )
    zc = [(bit[t * TILE : (t + 1) * TILE] == 0).sum() for t in range(T)]
    oc = [(bit[t * TILE : (t + 1) * TILE] == 1).sum() for t in range(T)]

    def align(n):
        return -(-n // TILE) * TILE

    # run A (tiles 0-1): left child at 0, right child after guard
    la_start = 0
    ra_start = align(zc[0] + zc[1]) + TILE
    # copies next
    c_start = ra_start + align(oc[0] + oc[1]) + TILE
    # run B (tile 5)
    lb_start = c_start + 2 * TILE
    rb_start = lb_start + align(zc[5]) + TILE
    dsta = np.array(
        [la_start, la_start + zc[0], c_start, c_start + TILE, 0, lb_start],
        np.int32,
    )
    dstb = np.array(
        [ra_start, ra_start + oc[0], 0, 0, 0, rb_start], np.int32
    )
    sz = np.array([7, 7, 0, 0, 0, 9], np.int32)
    so = np.array([8, 8, 0, 0, 0, 10], np.int32)
    n_out = rb_start + align(oc[5]) + TILE
    assert n_out <= N
    return data, bit, mode, dsta, dstb, sz, so, pos_col


def test_partition_xla_matches_model():
    rng = np.random.default_rng(0)
    for _ in range(3):
        data, bit, mode, dsta, dstb, sz, so, pc = _random_case(rng)
        got = np.asarray(
            partition_rows_xla(
                jnp.asarray(data), jnp.asarray(bit), jnp.asarray(mode),
                jnp.asarray(dsta), jnp.asarray(dstb), jnp.asarray(sz),
                jnp.asarray(so), pc,
            )
        )
        want = _np_reference(data, bit, mode, dsta, dstb, sz, so, pc)
        np.testing.assert_array_equal(got, want)


def test_partition_xla_dead_rows_dropped():
    rng = np.random.default_rng(1)
    data, bit, mode, dsta, dstb, sz, so, pc = _random_case(rng)
    out = np.asarray(
        partition_rows_xla(
            jnp.asarray(data), jnp.asarray(bit), jnp.asarray(mode),
            jnp.asarray(dsta), jnp.asarray(dstb), jnp.asarray(sz),
            jnp.asarray(so), pc,
        )
    )
    # every row is either all-zero (dead) or carries a restamped/copied pos
    pos = out[:, pc]
    dead = (out == 0).all(axis=1)
    assert ((pos > 0) | dead).all()
    assert dead.any()  # guard tiles / alignment pads exist and are dead
