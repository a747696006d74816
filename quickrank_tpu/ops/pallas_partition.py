"""Pallas TPU kernel: stable row partition into node-clustered order.

Training keeps the binned doc matrix in *node-clustered* order — every
tree node's docs occupy a contiguous, tile-aligned run of rows — so the
histogram kernel's data-dependent tile skip (ops/pallas_histogram.py,
measured 3.5x at 1/8-live membership) fires on every per-node pass
instead of only on lucky layouts.  After each split the split node's run
must be re-partitioned into its two children.  XLA row gathers/scatters
cost 40-115 ms at MSLR scale regardless of row width (per-row bound,
scripts/bench_permute.py) — this kernel does the movement at near-HBM
speed instead:

  * the work buffer rides runs as whole 1024-row tiles, so every tile is
    either fully inside the splitting run (MOVE), fully in a surviving
    run (COPY — one DMA to its repacked position), or dead;
  * a MOVE tile recomputes its rows' routing bits on the MXU from the
    split's (feature, threshold-bin) — a one-hot row contraction, exact
    because u8 bins <= 255 are exact in bf16 — then compacts rows with a
    one-hot permutation matmul P[dest, src] into
    [zeros-block | zero pad | ones-block | zero pad] and writes the two
    TILE-row blocks at their child-run offsets with fixed-size DMAs;
  * child runs are padded to tile boundaries plus one guard tile, so the
    fixed-size DMA "spill" past a block's used rows always lands in dead
    space and always carries zero rows (pos byte 0 = dead, see below);
  * the output buffer is pre-zeroed (aliased input), so dead gaps read
    as dead rows without any cleanup pass.

Row payload convention (shared with the clustered growers): the work
buffer is ``[N_work, W] u8`` holding the binned features in columns
``[0, F)`` and per-doc payload bytes after them — f32 values travel as
their 4 little-endian bytes (bitcast, exact) and the node-id byte stores
``pos + 1`` so 0 always means "dead row".  The kernel stamps the node
byte of moved rows with the destination child's id.

No reference counterpart: QuickRank's per-node sampleid lists
(rt.cc:325-347) are the pointer-world shadow of this layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
MODE_COPY = 0
MODE_MOVE = 1
MODE_DEAD = 2


def _kernel(
    # scalar prefetch (SMEM [T] each)
    mode_ref, dsta_ref, dstb_ref, stampz_ref, stampo_ref, fstar_ref,
    tstar_ref,
    # tensor operands
    data_hbm,   # ANY [N, W] u8
    zeros_hbm,  # ANY [N, W] u8 (pre-zeroed, aliased to the output)
    out_hbm,    # ANY [N, W] u8
    # scratch
    block,   # VMEM (TILE, W) u8
    outbuf,  # VMEM (2*TILE, W) u8
    tri,     # VMEM (TILE, TILE) f32 — strict lower triangle
    sem_f, sem_c, sem_zo,
    *, W, pos_col,
):
    t = pl.program_id(0)
    mode = mode_ref[t]

    @pl.when(t == 0)
    def _init():
        # strict-lower-triangular ones: rank[j] = sum_i m[i] * tri[i, j]
        # (f32 matmul — counts up to TILE are exact; bf16 would cap at 256)
        i = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        tri[:] = (i < j).astype(jnp.float32)

    @pl.when(mode == MODE_COPY)
    def _copy():
        # surviving run tile: DMA it to its repacked position
        dma = pltpu.make_async_copy(
            data_hbm.at[pl.ds(t * TILE, TILE)],
            out_hbm.at[pl.ds(pl.multiple_of(dsta_ref[t], 8), TILE)],
            sem_c,
        )
        dma.start()
        dma.wait()

    @pl.when(mode == MODE_MOVE)
    def _move():
        fetch = pltpu.make_async_copy(
            data_hbm.at[pl.ds(t * TILE, TILE)], block, sem_f
        )
        fetch.start()
        fetch.wait()

        # u8 <= 255 is exact in bf16; Mosaic needs the widening staged
        # through i32/f32 (no native u8<->bf16 casts on this target)
        blk = (
            block[:].astype(jnp.int32).astype(jnp.float32)
            .astype(jnp.bfloat16)
        )

        def col_as_row(col_ids):
            """Row vector [1, TILE] of column ``col`` of the block, via an
            exact one-hot contraction (keeps everything lane-oriented —
            no in-kernel transposes)."""
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) == col_ids
            ).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                sel, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, TILE]

        fcol = col_as_row(fstar_ref[t])
        posb = col_as_row(pos_col)
        live = posb > 0.0  # pos byte 0 = dead pad row, dropped on move
        goes_left = fcol <= tstar_ref[t].astype(jnp.float32)
        zm = (live & goes_left).astype(jnp.float32)
        om = (live & ~goes_left).astype(jnp.float32)
        # exclusive within-tile rank among zeros / ones (exact f32 counts)
        zrank = jax.lax.dot_general(
            zm, tri[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, TILE]
        orank = jax.lax.dot_general(
            om, tri[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        nz = jnp.sum(zm)
        no = jnp.sum(om)
        # dest row in the (2*TILE)-row staging buffer: zeros pack at
        # [0, nz), ones at [TILE, TILE+no); dead columns map nowhere, so
        # every unclaimed staging row comes out of the matmul as exact
        # zeros — including its pos byte, i.e. dead.
        # dead rows get dest -1 (never matches an output row) — folding
        # liveness into dest keeps P a pure compare->cast (a bf16
        # elementwise multiply over [2*TILE, TILE] lowers very poorly on
        # this target)
        dest = jnp.where(
            zm > 0, zrank, jnp.float32(TILE) + orank
        ).astype(jnp.int32)
        dest = jnp.where((zm + om) > 0, dest, -1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (2 * TILE, TILE), 0)
        P = (rows == dest).astype(jnp.bfloat16)
        moved = jax.lax.dot_general(
            P, blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2*TILE, W) — exact: one term per output element
        out_rows = jax.lax.broadcasted_iota(jnp.int32, (2 * TILE, 1), 0)
        stampcol = jnp.where(
            out_rows < TILE,
            jnp.where(
                out_rows < nz.astype(jnp.int32),
                stampz_ref[t], 0,
            ),
            jnp.where(
                out_rows - TILE < no.astype(jnp.int32),
                stampo_ref[t], 0,
            ),
        )
        # stamp the pos byte with a full-width i32 select (a 1-lane column
        # store lowers to per-row scalar stores); exact small ints:
        # f32 -> i32 (fptosi) -> u8 (trunci)
        cols = jax.lax.broadcasted_iota(jnp.int32, (2 * TILE, W), 1)
        stamped = jnp.where(
            cols == pos_col,
            jnp.broadcast_to(stampcol, (2 * TILE, W)),
            moved.astype(jnp.int32),
        )
        outbuf[:] = stamped.astype(jnp.uint8)
        # stream offsets are 8-aligned by the layout contract (per-tile
        # contributions padded to 8 rows); Mosaic needs the static proof
        dz = pltpu.make_async_copy(
            outbuf.at[pl.ds(0, TILE)],
            out_hbm.at[pl.ds(pl.multiple_of(dsta_ref[t], 8), TILE)],
            sem_zo,
        )
        do = pltpu.make_async_copy(
            outbuf.at[pl.ds(TILE, TILE)],
            out_hbm.at[pl.ds(pl.multiple_of(dstb_ref[t], 8), TILE)],
            sem_zo,
        )
        dz.start()
        do.start()
        # inline waits: each stream's fixed-size writes spill into rows the
        # NEXT same-stream write owns, so same-stream order must hold; and
        # outbuf is reused by the next MOVE tile.
        dz.wait()
        do.wait()


def partition_rows(
    data: jnp.ndarray,
    bit: jnp.ndarray,
    mode: jnp.ndarray,
    dsta: jnp.ndarray,
    dstb: jnp.ndarray,
    stamp_z: jnp.ndarray,
    stamp_o: jnp.ndarray,
    pos_col: int,
    fstar: jnp.ndarray | None = None,
    tstar: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Repack ``data`` [N, W] u8 (N % 1024 == 0) by per-tile directives.

    mode[t]: 0 = copy tile t to row offset dsta[t]; 1 = stable-partition
    tile t's LIVE rows (pos byte > 0) by the tile's split — a live row
    goes to the left-child stream at dsta[t] when
    ``data[row, fstar[t]] <= tstar[t]`` else to the right-child stream at
    dstb[t] — stamping the pos byte (column ``pos_col``) with
    stamp_z[t]/stamp_o[t]; 2 = dead tile, emit nothing.  ``bit`` [N] i32
    (0 left, 1 right, else drop) must agree with (fstar, tstar) on live
    rows; the TPU kernel recomputes bits from (fstar, tstar) (exact — u8
    bins are exact in bf16), the XLA fallback consumes ``bit`` directly.
    Offsets must follow the tile-aligned run layout contract (module
    docstring): per-tile stream offsets are exclusive prefix sums of
    per-tile zero/one counts, child runs are tile-aligned with one
    trailing guard tile.  Unwritten output rows are zero (dead).
    """
    if jax.default_backend() != "tpu":
        return partition_rows_xla(
            data, bit, mode, dsta, dstb, stamp_z, stamp_o, pos_col
        )
    assert fstar is not None and tstar is not None
    return _partition_rows_tpu(
        data, mode, dsta, dstb, stamp_z, stamp_o, fstar, tstar, pos_col
    )


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnames=("pos_col",))
def _partition_rows_tpu(
    data, mode, dsta, dstb, stamp_z, stamp_o, fstar, tstar, pos_col: int
):
    N, W = data.shape
    T = N // TILE
    zeros = jnp.zeros_like(data)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(T,),
        in_specs=[
            # explicit HBM: ANY may place small arrays in VMEM, whose
            # dynamic row slices demand 128-aligned lane extents
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((TILE, W), jnp.uint8),
            pltpu.VMEM((2 * TILE, W), jnp.uint8),
            pltpu.VMEM((TILE, TILE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def kernel(mode_r, dsta_r, dstb_r, sz_r, so_r, fs_r, ts_r, data_r,
               zeros_r, out_r, block, outbuf, tri, sf, sc, szo):
        _kernel(
            mode_r, dsta_r, dstb_r, sz_r, so_r, fs_r, ts_r, data_r,
            zeros_r, out_r, block, outbuf, tri, sf, sc, szo,
            W=W, pos_col=pos_col,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.uint8),
        input_output_aliases={8: 0},  # zeros buffer -> output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        mode.astype(jnp.int32),
        dsta.astype(jnp.int32),
        dstb.astype(jnp.int32),
        stamp_z.astype(jnp.int32),
        stamp_o.astype(jnp.int32),
        fstar.astype(jnp.int32),
        tstar.astype(jnp.int32),
        data,
        zeros,
    )


def partition_rows_xla(
    data, bit, mode, dsta, dstb, stamp_z, stamp_o, pos_col: int
):
    """Reference/fallback implementation with one row scatter (slow on TPU
    — ~40 ms at MSLR scale — but exact and backend-agnostic; the CPU test
    path and the kernel-validation oracle)."""
    N, W = data.shape
    T = N // TILE
    tile = jnp.arange(N, dtype=jnp.int32) // TILE
    row_in_tile = jnp.arange(N, dtype=jnp.int32) % TILE
    b = bit.reshape(-1).astype(jnp.int32)
    md = mode[tile]
    is_copy = md == MODE_COPY
    is_move = md == MODE_MOVE
    live = data[:, pos_col] > 0
    zm = is_move & live & (b == 0)
    om = is_move & live & (b == 1)

    def _rank_in_tile(mask):
        m2 = mask.reshape(T, TILE).astype(jnp.int32)
        return (jnp.cumsum(m2, axis=1) - m2).reshape(-1)

    dest = jnp.where(is_copy, dsta[tile] + row_in_tile, N)
    dest = jnp.where(zm, dsta[tile] + _rank_in_tile(zm), dest)
    dest = jnp.where(om, dstb[tile] + _rank_in_tile(om), dest)
    stamped = jnp.where(
        zm, stamp_z[tile], jnp.where(om, stamp_o[tile], 0)
    ).astype(jnp.uint8)
    pos_vals = jnp.where(is_copy, data[:, pos_col], stamped)
    vals = data.at[:, pos_col].set(pos_vals)
    out = jnp.zeros_like(data)
    return out.at[jnp.where(dest < N, dest, N)].set(
        jnp.where((dest < N)[:, None], vals, 0), mode="drop"
    )
