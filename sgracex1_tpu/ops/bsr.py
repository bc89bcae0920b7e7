"""Block-sparse (BSR) aggregation: dense tiles on the MXU.

The one-hot Pallas kernel (ops/pallas_spmm.py) pays ~(rb+cb)/2 redundant
FLOPs per edge to express gather/scatter as matmuls. This backend removes
the indices entirely: the adjacency is stored as the set of *nonempty*
``tb x tb`` dense tiles, and aggregation is a batched dense matmul per tile
with row-block accumulation — pure MXU, no gather. After RCM reordering
(graph/reorder.py) real graphs keep only a fraction of their tiles
(measured: citeseer 49/169, pubmed 2332/6084 at tb=256), so this does
~3x less FLOPs AND bytes than the dense backend while keeping its
simplicity. This is the TPU-native descendant of the reference's
SPMM_BLOCK row-grouping idea: trade fine-grained sparsity for regular
dense blocks the hardware is fast at.

Two execution paths: an XLA one (einsum + segment-sum over tiles) that
differentiates natively, and a Pallas kernel with output-block revisit
accumulation for large graphs.
"""

from __future__ import annotations

import dataclasses
import functools as _functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgracex1_tpu.graph.csr import SparseMatrix

# f32 scratch cap for the on-device tile build; module-level so tests can
# shrink it to exercise the multi-batch path at CI sizes
_DEVICE_BUILD_BATCH_BYTES = 1 << 30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSRMatrix:
    """Nonempty dense tiles of a sparse matrix, sorted by (rb, cb).

    ``slices``: static (tile_lo, tile_hi, rb_lo, rb_hi) call slices cut
    at row-block-run boundaries, computed host-side at build time. Grid
    kernels consuming >_MAX_TILES_PER_CALL tiles must split into one
    pallas call per slice: the per-call scalar-prefetch arrays live in
    SMEM, and a 100k-tile schedule (2^20-node flash GAT at tb=128)
    exhausts it — the same boundary ops/fused_agg hit at 2^23. None
    means "not computed" (device-built transposes, padded plans);
    consumers fall back to a single call."""

    tiles: jax.Array  # [T, tb, tb]
    tile_rb: jax.Array  # int32[T]
    tile_cb: jax.Array  # int32[T]
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    tb: int = dataclasses.field(metadata=dict(static=True))
    slices: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    # same, over the COLUMN-sorted tile order (consumed by the flash
    # backward's column-streaming pass): (pos_lo, pos_hi, cb_lo, cb_hi)
    slices_col: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def num_tiles(self) -> int:
        return self.tiles.shape[0]

    @property
    def n_row_tiles(self) -> int:
        return _round_up(self.n_rows, self.tb) // self.tb


# max grid steps per pallas call for tile-streaming kernels (see
# BSRMatrix.slices); ops/fused_agg has its own equivalent constant
_MAX_TILES_PER_CALL = 8192


def tile_call_slices(tile_rb: "np.ndarray", n_rt: int) -> tuple:
    """Static (lo, hi, rb_lo, rb_hi) slices over a HOST rb array, cut at
    row-block-run boundaries with at most _MAX_TILES_PER_CALL tiles per
    slice (a longer single run stays whole)."""
    T = len(tile_rb)
    run_starts = np.flatnonzero(
        np.r_[True, tile_rb[1:] != tile_rb[:-1]]
    )
    slices = []
    lo = 0
    while lo < T:
        if T - lo <= _MAX_TILES_PER_CALL:
            hi = T
        else:
            k = np.searchsorted(
                run_starts, lo + _MAX_TILES_PER_CALL, side="right"
            ) - 1
            hi = int(run_starts[k])
            if hi <= lo:
                k2 = np.searchsorted(run_starts, lo, side="right")
                hi = int(run_starts[k2]) if k2 < len(run_starts) else T
                import warnings

                warnings.warn(
                    f"tile_call_slices: a single row-block run spans "
                    f"{hi - lo} tiles (> the {_MAX_TILES_PER_CALL}-step "
                    "SMEM-safe cap) and cannot be split — splitting a "
                    "run would break in-run accumulation/softmax "
                    "semantics. The compile may be very slow or fail "
                    "with RESOURCE_EXHAUSTED; reduce tb or re-partition "
                    "the hub rows.",
                    stacklevel=3,
                )
        # the first slice starts at block 0 and the last ends at n_rt so
        # the concatenated outputs align with the unsliced [n_rt*tb, ...]
        # shape (row blocks with no tiles stay unwritten, as before)
        rb_lo = int(tile_rb[lo]) if lo > 0 else 0
        rb_hi = int(tile_rb[hi]) if hi < T else n_rt
        slices.append((lo, hi, rb_lo, rb_hi))
        lo = hi
    return tuple(slices)


def bsr_tile_keys(
    A: SparseMatrix, tb: int, *, cover_rows: bool = False,
    cover_cols: bool = False,
) -> np.ndarray:
    """Host-side sorted tile keys ``rb << 32 | cb`` of bsr_from_sparse's
    tile set (including the zero cover tiles). Exposed so schedule
    builders (ops/fused_agg) can read the layout WITHOUT pulling the
    device-resident tile_rb/tile_cb back through the TPU relay — a
    round-trip measured at ~14 s per array at the 1M-node scale because
    it synchronizes the in-flight device tile builds."""
    r = np.asarray(A.rows[: A.nnz])
    c = np.asarray(A.cols[: A.nnz])
    key = (r // tb).astype(np.int64) << 32 | (c // tb).astype(np.int64)
    uniq = np.unique(key)
    # merge zero cover tiles into the key set BEFORE the scatter, so the
    # tile array is built once, already sorted — no post-concat + resort
    # of a multi-GB array
    extra = []
    if cover_rows:
        n_rt = _round_up(A.n_rows, tb) // tb
        have_rb = np.unique((uniq >> 32).astype(np.int64))
        missing = np.setdiff1d(np.arange(n_rt, dtype=np.int64), have_rb)
        if len(missing):
            extra.append(missing << 32)
    if cover_cols:
        n_ct = _round_up(A.n_cols, tb) // tb
        have_cb = np.unique(uniq & 0xFFFFFFFF)
        missing = np.setdiff1d(np.arange(n_ct, dtype=np.int64), have_cb)
        if len(missing):
            extra.append(missing)
    if extra:
        uniq = np.unique(np.concatenate([uniq, *extra]))
    return uniq


def bsr_from_sparse(
    A: SparseMatrix, *, tb: int = 256, dtype=jnp.bfloat16,
    cover_rows: bool = False, cover_cols: bool = False,
    device_build: bool | None = None, mask: bool = False,
    batch_postprocess=None,
) -> BSRMatrix:
    """Host-side build: densify each nonempty (rb, cb) tile.

    ``cover_rows`` adds an explicit zero tile at (rb, 0) for every row block
    with no nonzeros — required when the Pallas kernel is the consumer and
    the tile set covers only part of the matrix (e.g. the hybrid backend's
    dense-tile subset): unvisited output blocks are never written.
    ``cover_cols`` does the same at (0, cb) for empty column blocks, so that
    ``bsr_transpose`` of the result still row-covers — letting the prepare
    step build the transposed plan on-device instead of paying a second
    multi-GB host scatter.

    ``device_build`` forces (True) or forbids (False) the on-device edge
    scatter; default None auto-selects it for large tile sets on TPU (the
    host scatter + tile upload costs minutes at 1M-node scale). Tests force
    True on CPU to cover the path CI otherwise never runs.

    ``mask`` emits int8 {0,1} edge-presence tiles instead of value tiles,
    thresholded per build batch so the f32 scratch never holds the whole
    tile set (a 1M-node hybrid tile set is ~5 GB in f32 but ~1.2 GB as
    int8 masks).

    ``batch_postprocess`` (device build only) maps each built tile batch
    before concatenation — used by the 1-bit pack so the int8 intermediate
    never exceeds one batch (at 2^22 nodes the FULL int8 tile set is
    ~10 GB and exhausted HBM before the r3 fix; per-batch packing caps the
    peak at ~1.3 GB). Must preserve the leading (tile-count) axis.
    """
    r = np.asarray(A.rows[: A.nnz])
    c = np.asarray(A.cols[: A.nnz])
    v = np.asarray(A.vals[: A.nnz], dtype=np.float32)
    if mask:
        dtype = jnp.int8
    key = (r // tb).astype(np.int64) << 32 | (c // tb).astype(np.int64)
    uniq = bsr_tile_keys(A, tb, cover_rows=cover_rows, cover_cols=cover_cols)
    T = max(len(uniq), 1)
    np_dtype = jnp.dtype(dtype)
    tile_bytes = T * tb * tb * np_dtype.itemsize
    if device_build is None:
        device_build = (
            tile_bytes > (256 << 20) and jax.default_backend() == "tpu"
        )
    if len(v) and device_build:
        # large tile sets: ship only the EDGES (~16 B/edge) and scatter into
        # the tile array inside one jitted program on-device. The host
        # scatter + multi-GB tile upload path below costs minutes at
        # 1M-node scale (measured 112 s scatter + ~30 s upload for a
        # 6142x512x512 hybrid tile set); this path is ~1 s upload + a
        # one-off compile + ~0.1 s scatter.
        inv = np.searchsorted(uniq, key).astype(np.int32)
        # bucket the edge-array length as well (pad with the OOB sentinel
        # T, which every batch drops) — the edge count is part of the
        # compiled program's signature, and an exact-nnz shape would defeat
        # the compile-cache reuse the tile bucketing above buys
        E = len(inv)
        E_b = _round_up(max(E, 1), 1 << 18)
        pad = E_b - E
        inv_d = jnp.asarray(np.pad(inv, (0, pad), constant_values=1 << 30))
        rr_d = jnp.asarray(
            np.pad((r % tb).astype(np.int32), (0, pad))
        )
        cc_d = jnp.asarray(
            np.pad((c % tb).astype(np.int32), (0, pad))
        )
        v_d = jnp.asarray(np.pad(v, (0, pad)))
        # batch the f32 scatter scratch to <=1 GB so peak device memory is
        # bounded (out-of-batch edges are dropped via an OOB sentinel; one
        # compiled program serves every batch because the offset is traced).
        # T is a STATIC arg — bucket it (multiple of 256, or exactly the
        # batch cap) so the compiled program is reused across graphs and
        # hits the relay's cross-process compile cache instead of paying
        # ~15-40 s per fresh tile count.
        batch = max(1, int(_DEVICE_BUILD_BATCH_BYTES) // (tb * tb * 4))
        post = batch_postprocess or (lambda t: t)
        if T <= batch:
            # postprocess BEFORE the [:T] slice: the bucketed T_b keeps the
            # postprocess program compile-cache-stable across graphs
            T_b = min(batch, _round_up(T, 256))
            dev_tiles = post(_device_tile_build(
                T_b, tb, np_dtype, mask, inv_d, rr_d, cc_d, v_d, 0
            ))[:T]
        else:
            parts = [
                post(_device_tile_build(
                    batch, tb, np_dtype, mask, inv_d, rr_d, cc_d, v_d, b0
                ))
                for b0 in range(0, T, batch)
            ]
            dev_tiles = jnp.concatenate(parts)[:T]
    else:
        # cast on the HOST: shipping f32 tiles and casting on device would
        # double the relay transfer and exceed the single-request size cap
        tiles = np.zeros((T, tb, tb), np_dtype)
        if len(v):
            # vectorized duplicate-safe scatter, processed in bounded-memory
            # tile batches: np.add.at into one [T, tb, tb] f32 array is ~50x
            # slower at multi-million-edge scale
            inv = np.searchsorted(uniq, key)
            idx = (inv * tb + r % tb) * tb + (c % tb)
            order = np.argsort(idx, kind="stable")
            sidx, sv = idx[order], v[order]
            per_tile = tb * tb
            batch = max(1, (128 << 20) // (per_tile * 4))  # 128 MB scratch
            for b0 in range(0, T, batch):
                b1 = min(T, b0 + batch)
                lo = np.searchsorted(sidx, b0 * per_tile)
                hi = np.searchsorted(sidx, b1 * per_tile)
                if lo == hi:
                    continue
                buf = np.zeros((b1 - b0) * per_tile, np.float32)
                bi = sidx[lo:hi] - b0 * per_tile
                bv = sv[lo:hi]
                st = np.flatnonzero(np.r_[True, bi[1:] != bi[:-1]])
                buf[bi[st]] = np.add.reduceat(bv, st)
                buf = buf.reshape(b1 - b0, tb, tb)
                tiles[b0:b1] = (buf > 0) if mask else buf.astype(np_dtype)
        from sgracex1_tpu.utils.transfer import chunked_device_put

        dev_tiles = chunked_device_put(tiles)
    tile_rb = (uniq >> 32).astype(np.int32)
    tile_cb = (uniq & 0xFFFFFFFF).astype(np.int32)
    if len(uniq) == 0:
        tile_rb = np.zeros(1, np.int32)
        tile_cb = np.zeros(1, np.int32)
    return BSRMatrix(
        tiles=dev_tiles,
        tile_rb=jnp.asarray(tile_rb),
        tile_cb=jnp.asarray(tile_cb),
        n_rows=A.n_rows,
        n_cols=A.n_cols,
        tb=tb,
        slices=tile_call_slices(
            tile_rb, _round_up(A.n_rows, tb) // tb
        ),
        slices_col=tile_call_slices(
            np.sort(tile_cb), _round_up(A.n_cols, tb) // tb
        ),
    )


@_functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _device_tile_build(T, tb, np_dtype, mask, inv, rr, cc, v, offset):
    """Scatter the edge-list slice [offset, offset+T) into [T, tb, tb]
    tiles on-device (f32 accumulate, cast to the target dtype — or
    thresholded to an int8 {0,1} mask — once per batch). Edges outside
    the batch are redirected to an out-of-bounds sentinel and dropped —
    negative indices would wrap, not drop."""
    local = inv - offset
    local = jnp.where((local >= 0) & (local < T), local, T)
    tiles = jnp.zeros((T, tb, tb), jnp.float32)
    tiles = tiles.at[local, rr, cc].add(v, mode="drop")
    if mask:
        return (tiles > 0).astype(jnp.int8)
    return tiles.astype(np_dtype)


def bsr_mask_from_sparse(
    A: SparseMatrix, *, tb: int = 256,
    cover_rows: bool = False, cover_cols: bool = False,
    device_build: bool | None = None, batch_postprocess=None,
) -> BSRMatrix:
    """BSR of the edge MASK (int8 {0,1} tiles): all the flash-GAT kernel
    reads from the adjacency is ``tile > 0``, so int8 tiles carry the same
    information at 1/4 the HBM traffic of f32. Measured pubmed flash:
    1.17 -> 1.08 ms at tb=512 (the kernel is VPU-bound on the tile
    elementwise ops, so the saving is mostly memory, not time; tb=1024
    int8 reaches 0.84 ms). Mask tiles are also the aggregation tiles for
    rank-1-factorable adjacencies (graph/normalize.rank1_factor): cover
    flags and device_build pass through to bsr_from_sparse for that use.
    Zero-valued edges (fill=0 self-loops) threshold away, matching their
    null contribution to ``A @ H``."""
    return bsr_from_sparse(
        A, tb=tb, mask=True,
        cover_rows=cover_rows, cover_cols=cover_cols,
        device_build=device_build, batch_postprocess=batch_postprocess,
    )


def pad_bsr_tile_count(B: BSRMatrix, T_pad: int) -> BSRMatrix:
    """Pad the tile set to a static count with all-zero tiles.

    Zero tiles contribute nothing to ``A @ H`` (0 @ H == 0) and are
    already a supported input of every tile kernel (the cover_rows /
    cover_cols builds emit them), so padding only stabilizes the traced
    shape — used by training loops that re-prepare fresh sampled
    subgraphs every epoch to keep one compiled step program.

    The pad tiles inherit the LAST tile's row block: the grid kernels
    zero the output block on the first step of each contiguous tile_rb
    run, so a pad tile starting a new run at an already-visited row
    block would erase its accumulated output. Appending at the tail of
    the final run keeps them no-op revisits."""
    T = B.num_tiles
    if T_pad <= T:
        return B
    pad = T_pad - T
    tiles = jnp.concatenate(
        [B.tiles, jnp.zeros((pad,) + B.tiles.shape[1:], B.tiles.dtype)]
    )
    pad_rb = jnp.broadcast_to(B.tile_rb[-1], (pad,))
    # pad tiles extend the FINAL rb run; grow the last call slice with
    # them (or drop to single-call mode if slices were never computed).
    # slices_col cannot survive padding (cb=0 pad tiles sort to the FRONT
    # of the column order) — padded plans are CI-scale, single call is
    # fine there.
    slices = None
    if B.slices is not None:
        lo, hi, rb_lo, rb_hi = B.slices[-1]
        slices = B.slices[:-1] + ((lo, hi + pad, rb_lo, rb_hi),)
    return dataclasses.replace(
        B,
        tiles=tiles,
        tile_rb=jnp.concatenate([B.tile_rb, pad_rb]),
        tile_cb=jnp.concatenate([B.tile_cb, jnp.zeros(pad, jnp.int32)]),
        slices=slices,
        slices_col=None,
    )


def pack_mask_bsr(B: BSRMatrix, *, batch_tiles: int | None = None) -> BSRMatrix:
    """int8 {0,1} mask tiles [T, tb, tb] -> 1-bit packed uint8
    [T, tb, tb/8], packed ON DEVICE in bounded batches (the int32 shift
    intermediates would be 4x the mask bytes if materialized whole).

    Pack layout is bit-plane-major along columns: byte i bit j holds
    column ``j*(tb/8) + i``, so the kernel unpack is 8 shift-and-mask ops
    plus a lane concatenation of eight [tb, tb/8] planes — no element
    interleave, which Mosaic cannot relayout cheaply. With tb=1024 each
    plane is exactly one 128-lane tile wide."""
    tb = B.tb
    assert tb % 8 == 0 and (tb // 8) % 128 == 0, "tb/8 must be lane-aligned"
    T = B.num_tiles
    if batch_tiles is None:
        # <=512 MB of int32 intermediate per batch
        batch_tiles = max(1, (512 << 20) // (tb * tb * 4))
    parts = [
        _pack_mask_batch(B.tiles[b0 : min(T, b0 + batch_tiles)])
        for b0 in range(0, T, batch_tiles)
    ]
    tiles = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return dataclasses.replace(B, tiles=tiles)


@jax.jit
def _pack_mask_batch(m: jax.Array) -> jax.Array:
    T, tb, _ = m.shape
    tb8 = tb // 8
    planes = m.astype(jnp.int32).reshape(T, tb, 8, tb8)
    packed = planes[:, :, 0, :]
    for j in range(1, 8):
        packed = packed | (planes[:, :, j, :] << j)
    return packed.astype(jnp.uint8)


def bsr_bitmask_from_sparse(
    A: SparseMatrix, *, tb: int = 1024,
    cover_rows: bool = False, cover_cols: bool = False,
    device_build: bool | None = None,
) -> BSRMatrix:
    """BSR of the edge mask packed to 1 BIT per entry — the storage the
    reference's 1-bit adjacency quantization implies (quantization_qbits
    with qbits=1, sgrace.py:62-68), 32x less HBM than f32 tiles, 8x less
    than int8 masks. Consumed by both the flash-GAT kernel and
    bsr_spmm_pallas (both detect the packed shape and unpack in-kernel).

    Build path: int8 mask tiles (device-built for large tile sets) packed
    on device — no f32 or host-side tile materialization, so this is
    usable at the 1M-node scale where the tile set is multi-GB.

    On the flash kernel the win is capacity (the kernel is VPU-bound:
    pubmed tb=1024 0.860 ms packed vs 0.847 int8); on the HBM-bound BSR
    aggregation at 1M-node scale the 8x fewer tile bytes are wall-time."""
    assert tb % 8 == 0 and (tb // 8) % 128 == 0, "tb/8 must be lane-aligned"
    if device_build is None:
        device_build = jax.default_backend() == "tpu"
    if not device_build:
        # HOST path: scatter bits straight into the packed array — no
        # int8 tile materialization and no jit pack pass. One
        # np.bitwise_or.at over the edges (~0.1 us/edge) replaced an
        # int8-build-then-pack pipeline measured 0.7 s per 2.5M-edge
        # shard block (the distributed prepare's dominant term, r5).
        r = np.asarray(A.rows[: A.nnz]).astype(np.int64)
        c = np.asarray(A.cols[: A.nnz]).astype(np.int64)
        v = np.asarray(A.vals[: A.nnz])
        keep = v > 0
        r, c = r[keep], c[keep]
        uniq = bsr_tile_keys(
            A, tb, cover_rows=cover_rows, cover_cols=cover_cols
        )
        T = max(len(uniq), 1)
        nb = tb // 8
        packed = np.zeros((T, tb, nb), np.uint8)
        if len(r):
            inv = np.searchsorted(uniq, (r // tb) << 32 | (c // tb))
            lc = c % tb
            np.bitwise_or.at(
                packed,
                (inv, r % tb, lc % nb),
                (np.uint8(1) << (lc // nb).astype(np.uint8)),
            )
        tile_rb = (uniq >> 32).astype(np.int32)
        tile_cb = (uniq & 0xFFFFFFFF).astype(np.int32)
        if len(uniq) == 0:
            tile_rb = np.zeros(1, np.int32)
            tile_cb = np.zeros(1, np.int32)
        n_rt_eff = _round_up(A.n_rows, tb) // tb
        n_ct_eff = _round_up(A.n_cols, tb) // tb
        return BSRMatrix(
            tiles=jnp.asarray(packed),
            tile_rb=jnp.asarray(tile_rb),
            tile_cb=jnp.asarray(tile_cb),
            n_rows=A.n_rows,
            n_cols=A.n_cols,
            tb=tb,
            slices=tile_call_slices(tile_rb, n_rt_eff),
            slices_col=tile_call_slices(
                np.sort(tile_cb.astype(np.int64)), n_ct_eff
            ),
        )
    B = bsr_mask_from_sparse(
        A, tb=tb, cover_rows=cover_rows, cover_cols=cover_cols,
        device_build=device_build,
        # pack each device-built batch immediately: the full int8 tile set
        # is ~10 GB at 2^22 nodes and exhausted HBM before this (r3)
        batch_postprocess=_pack_mask_batch,
    )
    if B.tiles.shape[-1] == tb:  # host-build path: tiles still unpacked
        # (an np.packbits host pack was tried here and measured 2.2x
        # SLOWER than the jit shift pack — the bool cast + per-batch
        # asarray copies dominate; XLA's vectorized shifts win)
        return pack_mask_bsr(B)
    return B


def unpack_mask_tile(t: jax.Array, tb: int) -> jax.Array:
    """In-kernel unpack of one packed mask tile [tb, tb/8] -> bool [tb, tb].

    Works on int32 (v5e has no int8/uint8 vector compare) and concatenates
    the eight bit planes along lanes, matching bsr_bitmask_from_sparse's
    pack layout."""
    return unpack_mask01_tile(t, tb) > 0.5


def unpack_mask01_tile(t: jax.Array, tb: int, dtype=jnp.float32) -> jax.Array:
    """In-kernel unpack of one packed mask tile [tb, tb/8] -> {0,1}
    [tb, tb] in ``dtype`` — the additive-mask form the flash and BSR
    kernels consume (shift-and-mask already yields {0,1}; no compare
    needed). Matmul consumers pass bf16 to skip the extra f32->bf16
    cast pass over the unpacked tile."""
    ti = t.astype(jnp.int32) & 0xFF
    planes = [((ti >> j) & 1) for j in range(8)]
    return jnp.concatenate(planes, axis=-1).astype(dtype)


def bsr_spmm_xla(B: BSRMatrix, H: jax.Array) -> jax.Array:
    """out = A @ H via batched tile matmuls + tile-row segment sum (XLA)."""
    tb = B.tb
    n_ct = _round_up(B.n_cols, tb) // tb
    n_rt = B.n_row_tiles
    P = H.shape[1]
    if H.shape[0] != n_ct * tb:
        H = jnp.pad(H, ((0, n_ct * tb - H.shape[0]), (0, 0)))
    Hg = H.reshape(n_ct, tb, P)[B.tile_cb]  # [T, tb, P]
    prod = jax.lax.dot_general(
        B.tiles.astype(jnp.bfloat16),
        Hg.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [T, tb, P]
    out = jax.ops.segment_sum(prod, B.tile_rb, num_segments=n_rt)
    return out.reshape(n_rt * tb, P)[: B.n_rows]


def bsr_transpose(B: BSRMatrix) -> BSRMatrix:
    """BSR of A^T: swap block coordinates, transpose each tile, resort by
    row block. Host-side when given numpy tiles, traceable otherwise.
    1-bit packed tiles cannot be element-transposed (bits are packed along
    columns) — build the transposed plan from the transposed edge list."""
    if B.tiles.shape[-1] != B.tb:
        raise ValueError(
            "bsr_transpose cannot transpose 1-bit packed tiles; build the "
            "transposed plan via bsr_bitmask_from_sparse(A.transpose(), ...)"
        )
    # tiles are (rb, cb)-sorted by construction, so a stable sort on cb
    # yields (cb, rb) order (int64 keys are unavailable under jax's
    # default x64-disabled config)
    order = jnp.argsort(B.tile_cb, stable=True)
    return BSRMatrix(
        tiles=jnp.transpose(B.tiles, (0, 2, 1))[order],
        tile_rb=B.tile_cb[order],
        tile_cb=B.tile_rb[order],
        n_rows=B.n_cols,
        n_cols=B.n_rows,
        tb=B.tb,
    )


def _bsr_kernel(tile_rb, tile_cb, a_ref, h_ref, out_ref, tb: int):
    g = pl.program_id(0)
    first = jnp.logical_or(g == 0, tile_rb[g] != tile_rb[jnp.maximum(g - 1, 0)])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = a_ref[:]
    if a.shape[-1] == tb // 8 and tb > 8:  # 1-bit packed mask tile
        # (a per-bit-plane 8-matmul variant that skips the lane-concat
        # relayout was measured IDENTICAL at 1M scale — 7.517 vs 7.505 ms,
        # r3 diag V5 — and reverted; the unpack cost is the shift+and+cast
        # op count, not the concat)
        a = unpack_mask01_tile(a, tb)
    out_ref[:] += jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        h_ref[:].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def bsr_spmm_pallas(
    B: BSRMatrix, H: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """out = A @ H with one dense-tile matmul per grid step (tiles are
    sorted by row block, so each output block accumulates over a
    contiguous run of steps — the same revisit pattern as a matmul
    k-loop). Consumes value tiles, int8 {0,1} mask tiles, and 1-bit
    packed mask tiles (bsr_bitmask_from_sparse) — the packed form reads
    8x fewer tile bytes, the decisive lever when the kernel is HBM-bound
    (the 1M power-law regime, BENCH_r02)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tb = B.tb
    n_ct = _round_up(B.n_cols, tb) // tb
    n_rt = B.n_row_tiles
    P = H.shape[1]
    # cast H OUTSIDE the kernel: the matmul consumes bf16 either way, and
    # streaming bf16 blocks halves the per-tile H DMA (the kernel is
    # DMA-bound at large T — measured ~220-300 GB/s effective)
    H = H.astype(jnp.bfloat16)
    if H.shape[0] != n_ct * tb:
        H = jnp.pad(H, ((0, n_ct * tb - H.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B.num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, tb, B.tiles.shape[-1]), lambda g, rbs, cbs: (g, 0, 0)
            ),
            pl.BlockSpec((tb, P), lambda g, rbs, cbs: (cbs[g], 0)),
        ],
        out_specs=pl.BlockSpec((tb, P), lambda g, rbs, cbs: (rbs[g], 0)),
    )

    def kernel(tile_rb, tile_cb, a_ref, h_ref, out_ref):
        _bsr_kernel(tile_rb, tile_cb, a_ref[0], h_ref, out_ref, tb)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rt * tb, P), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B.num_tiles * tb * tb * P,
            bytes_accessed=B.num_tiles
            * (tb * B.tiles.shape[-1] * B.tiles.dtype.itemsize + tb * P * 4 * 2),
            transcendentals=0,
        ),
    )(B.tile_rb, B.tile_cb, B.tiles, H)
    return out[: B.n_rows]


def _bsr_rowloop_kernel(
    row_start, tile_cb, tiles_hbm, h_hbm, out_ref,
    tile_buf, h_buf, tile_sem, h_sem, *, tb: int,
):
    g = pl.program_id(0)
    start = row_start[g]
    cnt = row_start[g + 1] - start

    def tile_dma(slot, k):
        return pltpu.make_async_copy(
            tiles_hbm.at[start + k], tile_buf.at[slot], tile_sem.at[slot]
        )

    def h_dma(slot, k):
        cb = tile_cb[start + k]
        return pltpu.make_async_copy(
            h_hbm.at[pl.ds(cb * tb, tb)], h_buf.at[slot], h_sem.at[slot]
        )

    @pl.when(cnt > 0)
    def _():  # warm-up: first tile + H block in flight before the loop
        tile_dma(0, 0).start()
        h_dma(0, 0).start()

    out_ref[:] = jnp.zeros_like(out_ref)

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < cnt)
        def _():
            tile_dma(nxt, k + 1).start()
            h_dma(nxt, k + 1).start()

        tile_dma(slot, k).wait()
        h_dma(slot, k).wait()
        a = tile_buf[slot]
        if a.shape[-1] == tb // 8 and tb > 8:  # 1-bit packed mask tile
            a = unpack_mask01_tile(a, tb)
        out_ref[:] += jax.lax.dot_general(
            a.astype(jnp.bfloat16),
            h_buf[slot],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, cnt, body, 0)


def bsr_spmm_rowloop(
    B: BSRMatrix, H: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """out = A @ H with one grid step per OUTPUT row block and a
    double-buffered inner loop over that block's tiles.

    The one-tile-per-grid-step kernel (bsr_spmm_pallas) pays ~1.3 us of
    grid/pipeline bookkeeping per tile on top of its ~0.5 us of DMA
    (measured r3: 4546 tiles at tb=512 -> 7.9 ms where the DMA floor is
    ~2.1 ms). Here the grid is the row blocks (output written exactly
    once, no revisit accumulation) and the tiles of one row stream through
    a 2-deep VMEM buffer with manual async copies, so per-tile cost
    approaches the DMA/MXU max. Consumes the same tile formats as
    bsr_spmm_pallas (value / int8 mask / 1-bit packed)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tb = B.tb
    inner = B.tiles.shape[-1]
    n_ct = _round_up(B.n_cols, tb) // tb
    n_rt = B.n_row_tiles
    P = H.shape[1]
    H = H.astype(jnp.bfloat16)
    if H.shape[0] != n_ct * tb:
        H = jnp.pad(H, ((0, n_ct * tb - H.shape[0]), (0, 0)))
    # prefix offsets of each row block's tile run (tiles are rb-sorted)
    row_start = jnp.searchsorted(
        B.tile_rb, jnp.arange(n_rt + 1, dtype=B.tile_rb.dtype)
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((tb, P), lambda g, rs, cbs: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, tb, inner), B.tiles.dtype),
            pltpu.VMEM((2, tb, P), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _functools.partial(_bsr_rowloop_kernel, tb=tb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rt * tb, P), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B.num_tiles * tb * tb * P,
            bytes_accessed=B.num_tiles
            * (tb * inner * B.tiles.dtype.itemsize + tb * P * 2)
            + n_rt * tb * P * 4,
            transcendentals=0,
        ),
    )(row_start, B.tile_cb, B.tiles, H)
    return out[: B.n_rows]


def _bsr_int8_kernel(tile_rb, tile_cb, a_ref, h_ref, out_ref):
    g = pl.program_id(0)
    first = jnp.logical_or(g == 0, tile_rb[g] != tile_rb[jnp.maximum(g - 1, 0)])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = a_ref[0]  # int8, unsigned grid shifted by -128
    h = h_ref[:]  # int8, signed grid
    acc = jax.lax.dot_general(
        a, h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    # unshift: Aq = As + 128 per PRESENT tile (absent tiles are true zeros
    # of A and contribute nothing); quant/int8.matmul_unsigned_x_signed is
    # the dense form of the same identity
    corr = 128 * jnp.sum(h.astype(jnp.int32), axis=0, keepdims=True)
    out_ref[:] += acc + corr


def bsr_spmm_int8(
    B: BSRMatrix, Hq: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """Full-integer ``Aq @ Hq`` on BSR tiles: int8 x int8 -> int32 on the
    MXU, one tile matmul per grid step.

    ``B.tiles``: int8 adjacency values on the UNSIGNED grid stored shifted
    by -128 (quant/int8 convention; build with
    quant.int8.bsr_int8_from_sparse — absent positions hold -128 = shifted
    zero). ``Hq``: signed int8 [N, P]. Returns the exact int32 accumulator
    [n_rt*tb, P]; the caller requantizes/dequantizes — the TPU-native form
    of the reference's quantized engine at its full supported problem size
    (sgrace.py:334-365,1296-1845), with no dense N x N anywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tb = B.tb
    n_ct = _round_up(B.n_cols, tb) // tb
    n_rt = B.n_row_tiles
    P = Hq.shape[1]
    if Hq.shape[0] != n_ct * tb:
        Hq = jnp.pad(Hq, ((0, n_ct * tb - Hq.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B.num_tiles,),
        in_specs=[
            pl.BlockSpec((1, tb, tb), lambda g, rbs, cbs: (g, 0, 0)),
            pl.BlockSpec((tb, P), lambda g, rbs, cbs: (cbs[g], 0)),
        ],
        out_specs=pl.BlockSpec((tb, P), lambda g, rbs, cbs: (rbs[g], 0)),
    )
    out = pl.pallas_call(
        _bsr_int8_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rt * tb, P), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B.num_tiles * tb * tb * P,
            bytes_accessed=B.num_tiles * (tb * tb + tb * P) * 1
            + n_rt * tb * P * 4,
            transcendentals=0,
        ),
    )(B.tile_rb, B.tile_cb, B.tiles, Hq)
    return out


@_functools.partial(jax.custom_vjp)
def bsr_spmm(B, Bt, H):
    """Differentiable ``A @ H`` on BSR tiles (Pallas forward AND backward).

    ``Bt`` is the pre-transposed plan (``bsr_transpose(B)``): the VJP
    ``d/dH (A @ H) . g = A^T @ g`` is just the same kernel over the
    transposed tiles, so both directions stay on the MXU with no gather.
    B/Bt take ``None`` cotangents (the adjacency is data, not a parameter —
    matching the reference, whose backward never differentiates ADJ,
    sgrace.py:1094-1103).
    """
    return bsr_spmm_pallas(B, H)


def _bsr_spmm_fwd(B, Bt, H):
    return bsr_spmm_pallas(B, H), (Bt, H.shape[0])


def _bsr_spmm_bwd(res, g):
    Bt, n = res
    gH = bsr_spmm_pallas(Bt, g)
    if gH.shape[0] < n:  # H was padded past the adjacency's column count
        gH = jnp.pad(gH, ((0, n - gH.shape[0]), (0, 0)))
    return None, None, gH[:n]


bsr_spmm.defvjp(_bsr_spmm_fwd, _bsr_spmm_bwd)
