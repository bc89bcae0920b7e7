"""Fused GAT attention aggregation — flash-attention over BSR graph tiles.

The reference computes GAT attention as dense N x N score matrices in
emulation (``sgrace.py:634-647``) and as streamed per-edge E/S buffers in
hardware (``sgrace.py:498-539``). The XLA edge path (ops/sddmm.py +
edge_softmax + gather/segment aggregation) is numerically faithful but
gather-bound on TPU (~12 ns/edge). This kernel removes every gather:

    for each nonempty (rb, cb) adjacency tile, sorted by rb:
        E    = s1[rb-block] + s2[cb-block]^T          (VPU outer add)
        E    = LeakyReLU(E); mask where A_tile <= 0   (reference adj_d > 0
                                                       mask, sgrace.py:640)
        online softmax: m, l running max/denominator  (flash-attention)
        acc  = acc * corr + softmax_tile @ Wh[cb-block]   (MXU)
    out[rb-block] = acc / l

i.e. the *graph* version of flash attention: the adjacency's BSR tiles are
the attention mask, so compute is O(nonempty tiles), not O(N^2), and the
row softmax never materializes per-edge score vectors.

Multi-head batching: every kernel takes a head dimension in its grid
(``grid = (H, num_tiles)``, tiles innermost so the online-softmax streaming
order per head is unchanged) — ONE compiled kernel serves all H heads, and
the adjacency tiles / scalar-prefetch index maps are shared across heads.
Head-dependent operands are laid out head-major 3-D (``[H, N_pad, 1]``
scores/stats, ``[H, N_pad, F]`` features) so every block's trailing two
dims are (tb, full-dim) — the Mosaic lowering constraint. Public entry
points are shape-polymorphic: 1-D ``s1``/``s2`` + 2-D ``Wh`` is the legacy
single-head call; head-LAST ``[N, H]`` scores + ``[N, H, F]`` features run
H heads batched (the reference's head_count, sgrace.py:1176-1179, which
its own config declares unused — we implement it for real).

Backward comes in two flavors:

- ``gat_attention_agg`` (edge backward): the reference's softmax-Jacobian
  identity ``soft_grad = att*q - att*sum(att*q)`` (sgrace.py:979-981)
  evaluated on the edge list — correctness-first fallback.
- ``gat_attention_agg_fused`` (flash backward): the same math evaluated
  tile-wise with NO per-edge gathers. The forward saves the per-row
  softmax stats (running max ``m`` and denominator ``l``), so each tile's
  probabilities ``p = exp(e - m)/l`` are recomputable locally. Using
  ``dE = p*(q - t)*lrelu'`` with ``q = gO @ Wh^T`` (tile MXU matmul) and
  ``t[r] = sum_c p*q``, the row-reductions ``t``, ``u1 = sum p*q*lrelu'``,
  ``u2 = sum p*lrelu'`` stream over row-sorted tiles (pass 1, giving
  ``ds1 = u1 - t*u2``), while the column-reductions ``dWh = p^T @ gO`` and
  ``ds2 = colsum(dE)`` stream over column-sorted tiles (pass 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.ops.bsr import BSRMatrix, unpack_mask01_tile

_NEG_INF = -9e15  # reference mask value (sgrace.py:638)

# VPU cost facts measured on the attached v5e (benchmarks/bench_vpu_cal.py):
# simple elementwise ops ~3.4 T/s, compare+select ~1.7 slots, exp ~13 slots
# (and exp2 is NOT cheaper than exp — 223 vs 264 G/s). The kernels below are
# therefore written to minimize selects and make every exp optional-fast:
#   - masked scores hold the finite _MASKED fill, and the running max is
#     initialized to _M_INIT, so ``exp(e - m)`` underflows to exact 0.0 at
#     masked entries WITHOUT a select: m >= _M_INIT always, and
#     _MASKED - _M_INIT = -9.999e8 is far below f32 exp's ~-88 underflow
#     point. Real scores below _M_INIT (|logit| > 1e5) would lose the
#     empty-row guarantee, but GAT logits are O(10).
#   - LeakyReLU is ``max(e, alpha*e)`` (mul+max), not compare+select.
#   - the {0,1} mask applies additively — ``(e - BIG) + m01*BIG`` — two
#     arithmetic ops instead of compare+select.

# v5e has 128 MB of VMEM; Mosaic's default 16 MB scoped limit OOMs the
# tb=1024 BACKWARD passes at F=64 (measured: "scoped allocation 18.26M
# exceeded" in a GATModel train step at n=32k — the two [tb, tb] f32
# probability/cotangent intermediates per pass plus double-buffered
# blocks). Raise the per-kernel budget for the BACKWARD passes only:
# granting the forward the same 100 MB made Mosaic schedule it ~7%
# slower (pubmed tb=1024: 0.769 vs 0.717 ms at <= 64 MB — the r3->r4
# "regression" bisected to exactly this, r5), so forward kernels keep
# the default scope.
_VMEM_LIMIT = 100 * 1024 * 1024

_MASKED = -1e9
_M_INIT = -1e5
_MASK_BIG = 1e9

# hybrid-kernel chunk payloads (gathered s2/Wh rows + local-row slots)
# become VMEM-RESIDENT below this size — one bulk DMA per call instead
# of a per-chunk small-block fetch whose exposed latency measured
# ~6.7 us per chunk at 2^20 (see flash_gat_hybrid_forward). Above it
# (e.g. H=4, F=64 at large R) the streamed mode is the fallback.
_RESIDENT_CHUNK_BUDGET = 64 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _norm_heads(s1, s2, Wh):
    """Normalize (s1, s2, Wh) to the head-last multi-head layout.

    Returns (s1 [N1, H], s2 [N2, H], Wh [Nw, H, F], squeeze) where
    ``squeeze`` marks the legacy single-head call (1-D scores)."""
    if s1.ndim == 1:
        return s1[:, None], s2[:, None], Wh[:, None, :], True
    return s1, s2, Wh, False


def _hmaj(x):
    """Head-last [N, H] / [N, H, F] -> head-major [H, N] / [H, N, F].

    Scores/stats stay 2-D: a trailing unit dim ([H, N, 1]) is 128x-
    padded by the TPU tiled layout — 512 MB stored AND copied per
    operand at 2^20 (r5 finding). Kernels read (1, tb) blocks and
    relayout rows/columns in VMEM."""
    if x.ndim == 2:
        return x.T
    return jnp.transpose(x, (1, 0, 2))


def _hstat(x, tb: int):
    """Head-major scores/stats [H, Npad] -> the 4-D sublane-padded form
    [H, Npad/tb, 8, tb] (data in sublane row 0) whose (1, 1, 8, tb)
    blocks satisfy Mosaic's (8, 128) block rule for EVERY head count —
    2-D (1, tb) blocks are only legal when H == 1 (the r5 bench caught
    H=4 failing to lower)."""
    H, Np = x.shape
    x = x.reshape(H, Np // tb, 1, tb)
    return jnp.pad(x, ((0, 0), (0, 0), (0, 7), (0, 0)))


def _unstat(x):
    """[H, nb, 8, tb] stat output -> head-last [nb*tb, H]."""
    return x[:, :, 0, :].reshape(x.shape[0], -1).T


def _tile_mask01(a_ref, tb: int):
    """Adjacency tile -> f32 {0,1} mask, for the additive-mask form.

    int8 mask tiles hold exactly {0,1}, so the cast alone suffices (no
    compare — Mosaic/v5e has no int8 vector compare anyway); 1-bit packed
    tiles (detected by the narrow last dim) unpack to {0,1} planes; value
    tiles need the > 0 test."""
    if a_ref.shape[-1] == tb // 8 and tb > 8:
        return unpack_mask01_tile(a_ref[0], tb)
    if a_ref.dtype == jnp.int8:
        return a_ref[0].astype(jnp.float32)
    return (a_ref[0].astype(jnp.float32) > 0).astype(jnp.float32)


# Schraudolph fast exp: exp(x) ~ bitcast_f32(int32(A*x + B)) — one fma, one
# clamp, one convert (~4 VPU slots vs ~13 for exp; bench_vpu_cal.py). The
# clamp to >= 0 maps deep-negative x to exact 0.0 instead of bit garbage
# (softmax arguments are always <= 0 here: e - m with m >= rowmax(e)).
# B tuned for minimal max relative error: 2.98% over x in [-30, 0].
_FEXP_A = 12102203.161561485  # 2^23 / ln 2
_FEXP_B = 1064986816.0  # 127 * 2^23 - 366400


def _fast_exp(x):
    i = jnp.maximum(_FEXP_A * x + _FEXP_B, 0.0).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _flash_gat_kernel(
    tile_rb, tile_cb, a_ref, s1_ref, s2_ref, wh_ref, out_ref,
    m_ref, l_ref, acc_ref, *, alpha: float, fast_exp: bool = False,
    m_out=None, l_out=None,
):
    # grid = (H, num_tiles): dim 0 is the head, dim 1 streams tiles; the
    # scratch accumulators reset at every row-block start, so head
    # transitions (which restart at g == 0) need no special handling
    g = pl.program_id(1)
    ng = pl.num_programs(1)
    first = jnp.logical_or(g == 0, tile_rb[g] != tile_rb[jnp.maximum(g - 1, 0)])
    last = jnp.logical_or(
        g == ng - 1, tile_rb[jnp.minimum(g + 1, ng - 1)] != tile_rb[g]
    )

    @pl.when(first)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _M_INIT)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tb = s1_ref.shape[-1]
    m01 = _tile_mask01(a_ref, tb)  # [tb, tb] f32 {0,1}
    # (1, 1, 8, tb) stat blocks, data in sublane 0: s1 relayouts to a
    # [tb, 1] column, s2 is a row
    e = s1_ref[0, 0, 0:1, :].reshape(-1, 1) + s2_ref[0, 0, 0:1, :]
    e = jnp.maximum(e, alpha * e)  # LeakyReLU (alpha in (0, 1))
    # additive mask: + 0 where edge (exact — the inner term is 0), - BIG
    # where not; no compare+select (1.7 slots) on the tile
    e = e + (m01 * _MASK_BIG - _MASK_BIG)

    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(e, axis=1, keepdims=True))
    # no mask select: masked e - m_new <= _MASKED - _M_INIT underflows to 0
    exp_elt = _fast_exp if fast_exp else jnp.exp
    p = exp_elt(e - m_new)
    corr = jnp.exp(m_old - m_new)  # per-row: keep exact
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jnp.dot(
        p.astype(jnp.bfloat16),
        wh_ref[0].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(last)
    def _():
        out_ref[0] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        if m_out is not None:
            m_out[0, 0] = jnp.broadcast_to(
                m_ref[:].reshape(1, -1), m_out.shape[2:]
            )
            l_out[0, 0] = jnp.broadcast_to(
                l_ref[:].reshape(1, -1), l_out.shape[2:]
            )


def _flash_gat_kernel_stats(
    tile_rb, tile_cb, a_ref, s1_ref, s2_ref, wh_ref,
    out_ref, m_out, l_out, m_ref, l_ref, acc_ref, *, alpha: float,
    fast_exp: bool = False,
):
    _flash_gat_kernel(
        tile_rb, tile_cb, a_ref, s1_ref, s2_ref, wh_ref, out_ref,
        m_ref, l_ref, acc_ref, alpha=alpha, fast_exp=fast_exp,
        m_out=m_out, l_out=l_out,
    )


def _flash_gat_kernel_subskip(
    tile_rb, tile_cb, pop, a_ref, s1_ref, s2_ref, wh_ref, out_ref,
    m_ref, l_ref, acc_ref, *, alpha: float, sb: int,
):
    """Occupancy experiment (r3 verdict #4): predicate the score math per
    (sb x sb) sub-block on a prefetched population bitmap, paying one
    scalar branch per sub-block instead of the dead-lane elementwise ops
    and exps.

    MEASURED NEGATIVE (pubmed RCM tb=1024 int8, 2026-08-20,
    benchmarks/diag_flash_subskip.py): sb=128 2.98 ms at 33% occupancy
    and sb=256 1.41 ms at 79%, vs 0.72 ms for the plain kernel — 2-4x
    SLOWER despite skipping most of the work. A [128, 128] VPU op runs
    16 vregs where the full-tile op runs 1024, so the per-op issue
    overhead (and 64 scf.if branches per grid step) dwarfs the dead-lane
    savings — the same lesson as the r3 manual-DMA rowloop: on this chip
    Mosaic's full-tile pipeline beats fine-grained manual scheduling.
    Kept, like bsr_spmm_rowloop, as the recorded counterexample."""
    g = pl.program_id(1)
    ng = pl.num_programs(1)
    first = jnp.logical_or(g == 0, tile_rb[g] != tile_rb[jnp.maximum(g - 1, 0)])
    last = jnp.logical_or(
        g == ng - 1, tile_rb[jnp.minimum(g + 1, ng - 1)] != tile_rb[g]
    )

    @pl.when(first)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _M_INIT)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tb = s1_ref.shape[1]
    ns = tb // sb
    for i in range(ns):
        ri = slice(i * sb, (i + 1) * sb)
        for j in range(ns):
            b = i * ns + j
            bit = (pop[g, b // 32] >> (b % 32)) & 1

            @pl.when(bit != 0)
            def _(i=i, j=j, ri=ri):
                cj = slice(j * sb, (j + 1) * sb)
                a = a_ref[0, ri, cj]
                if a_ref.shape[-1] == tb:  # int8 {0,1} or value tiles
                    if a_ref.dtype == jnp.int8:
                        m01 = a.astype(jnp.float32)
                    else:
                        m01 = (a.astype(jnp.float32) > 0).astype(
                            jnp.float32
                        )
                else:
                    raise NotImplementedError(
                        "subskip consumes unpacked tiles only"
                    )
                e = s1_ref[0, ri] + s2_ref[0, cj].reshape(1, -1)
                e = jnp.maximum(e, alpha * e)
                e = e + (m01 * _MASK_BIG - _MASK_BIG)
                m_old = m_ref[ri]
                m_new = jnp.maximum(
                    m_old, jnp.max(e, axis=1, keepdims=True)
                )
                p = jnp.exp(e - m_new)
                corr = jnp.exp(m_old - m_new)
                l_ref[ri] = l_ref[ri] * corr + jnp.sum(
                    p, axis=1, keepdims=True
                )
                acc_ref[ri] = acc_ref[ri] * corr + jnp.dot(
                    p.astype(jnp.bfloat16),
                    wh_ref[0, cj].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                m_ref[ri] = m_new

    @pl.when(last)
    def _():
        out_ref[0] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)


def subblock_pop_bitmap(B: BSRMatrix, A, sb: int) -> "np.ndarray":
    """int32 [T, ceil((tb/sb)^2 / 32)] per-tile sub-block population bits
    for the subskip kernel, from the host edge list."""
    import numpy as np

    tb = B.tb
    ns = tb // sb
    r = np.asarray(A.rows[: A.nnz]).astype(np.int64)
    c = np.asarray(A.cols[: A.nnz]).astype(np.int64)
    v = np.asarray(A.vals[: A.nnz])
    r, c = r[v > 0], c[v > 0]
    tile_rb = np.asarray(B.tile_rb).astype(np.int64)
    tile_cb = np.asarray(B.tile_cb).astype(np.int64)
    key_of_tile = tile_rb << 32 | tile_cb
    ekey = (r // tb) << 32 | (c // tb)
    t_of_e = np.searchsorted(key_of_tile, ekey)
    sub = ((r // sb) % ns) * ns + (c // sb) % ns
    nw = -(-(ns * ns) // 32)
    pop = np.zeros((B.num_tiles, nw), np.int32)
    np.bitwise_or.at(
        pop, (t_of_e, sub // 32), (1 << (sub % 32)).astype(np.int32)
    )
    return pop


def flash_gat_forward_subskip(
    B: BSRMatrix,
    pop,
    s1: jax.Array,
    s2: jax.Array,
    Wh: jax.Array,
    *,
    alpha: float = 0.2,
    sb: int = 128,
    interpret: bool | None = None,
):
    """flash_gat_forward with per-sub-block occupancy skipping (single
    head, int8/value tiles). EXPERIMENTAL — kept with its measured
    verdict either way (the rowloop/exp2/fast_exp precedent)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s1, s2, Wh, squeeze = _norm_heads(s1, s2, Wh)
    H = s1.shape[1]
    assert H == 1, "subskip experiment is single-head"
    tb = B.tb
    n_rt = B.n_row_tiles
    n_ct = _round_up(B.n_cols, tb) // tb
    F = Wh.shape[-1]
    if Wh.shape[0] != n_ct * tb:
        Wh = jnp.pad(Wh, ((0, n_ct * tb - Wh.shape[0]), (0, 0), (0, 0)))
    if s1.shape[0] != n_rt * tb:
        s1 = jnp.pad(s1, ((0, n_rt * tb - s1.shape[0]), (0, 0)))
    if s2.shape[0] != n_ct * tb:
        s2 = jnp.pad(s2, ((0, n_ct * tb - s2.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(H, B.num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, tb, B.tiles.shape[-1]),
                lambda h, g, rbs, cbs, pop: (g, 0, 0),
            ),
            pl.BlockSpec(
                (1, tb, 1), lambda h, g, rbs, cbs, pop: (h, rbs[g], 0)
            ),
            pl.BlockSpec(
                (1, tb, 1), lambda h, g, rbs, cbs, pop: (h, cbs[g], 0)
            ),
            pl.BlockSpec(
                (1, tb, F), lambda h, g, rbs, cbs, pop: (h, cbs[g], 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tb, F), lambda h, g, rbs, cbs, pop: (h, rbs[g], 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, F), jnp.float32),
        ],
    )
    res = pl.pallas_call(
        partial(_flash_gat_kernel_subskip, alpha=alpha, sb=sb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, n_rt * tb, F), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * B.num_tiles * tb * tb * (F + 4),
            bytes_accessed=H * B.num_tiles * (tb * tb * 2 + tb * F * 2),
            transcendentals=H * B.num_tiles * tb * tb,
        ),
    )(
        B.tile_rb, B.tile_cb, jnp.asarray(pop),
        B.tiles, _hmaj(s1)[:, :, None], _hmaj(s2)[:, :, None],
        _hmaj(Wh),
    )
    o = jnp.transpose(res, (1, 0, 2))[: B.n_rows]
    return o[:, 0, :] if squeeze else o


def flash_gat_forward(
    B: BSRMatrix,
    s1: jax.Array,
    s2: jax.Array,
    Wh: jax.Array,
    *,
    alpha: float = 0.2,
    interpret: bool | None = None,
    return_stats: bool = False,
    fast_exp: bool = False,
):
    """out[r] = sum_c softmax_c(LeakyReLU(s1[r]+s2[c]) | A[r,c]>0) * Wh[c].

    B holds the adjacency values (mask via > 0); s1/s2 are the per-node
    attention halves (Wh @ a_src / Wh @ a_dst): 1-D ``[N]`` (single head)
    or 2-D ``[N, H]``; Wh: ``[N, F]`` or ``[N, H, F]``. All H heads run in
    ONE kernel (head = leading grid dim). Output ``[N, F]`` / ``[N, H, F]``.

    With ``return_stats`` also returns the per-row softmax stats
    ``(m, l)`` (running max / denominator, shape [n_rt*tb, H]) that the
    fused backward needs to recompute tile probabilities locally. The
    stats are internal — consume them only via flash_gat_backward / the
    halo stats-merge.

    ``fast_exp`` swaps the per-element exp for the Schraudolph bitcast
    approximation (max 3% relative error on attention probabilities).
    MEASURED SLOWER in-kernel than ``jnp.exp`` on this chip (1.16 vs
    1.02 ms at pubmed, r3 — the bitcast int ops cost more VPU slots than
    the hardware exp's ~11; DESIGN.md §2) — kept default-off as the
    recorded negative result. The per-row rescale exps stay exact either
    way.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s1, s2, Wh, squeeze = _norm_heads(s1, s2, Wh)
    H = s1.shape[1]
    tb = B.tb
    n_rt = B.n_row_tiles
    n_ct = _round_up(B.n_cols, tb) // tb
    F = Wh.shape[-1]
    if Wh.shape[0] != n_ct * tb:
        Wh = jnp.pad(Wh, ((0, n_ct * tb - Wh.shape[0]), (0, 0), (0, 0)))
    if s1.shape[0] != n_rt * tb:
        s1 = jnp.pad(s1, ((0, n_rt * tb - s1.shape[0]), (0, 0)))
    if s2.shape[0] != n_ct * tb:
        s2 = jnp.pad(s2, ((0, n_ct * tb - s2.shape[0]), (0, 0)))

    T = B.num_tiles
    # split big tile schedules into one pallas call per B.slices entry
    # (row-block-run boundaries; SMEM cap on the scalar-prefetch arrays —
    # a 100k-tile single call at tb=128/2^20 nodes failed exactly like
    # the 25k-step fused schedule at 2^23, see ops/bsr.BSRMatrix.slices)
    slices = B.slices if B.slices is not None else ((0, T, 0, n_rt),)

    s1h = _hstat(_hmaj(s1), tb)
    s2h = _hstat(_hmaj(s2), tb)
    Whh = _hmaj(Wh)

    def _call(lo, hi, rb_lo, rb_hi):
        nr = rb_hi - rb_lo
        frac = (hi - lo) / T
        out_spec = pl.BlockSpec(
            (1, tb, F), lambda h, g, rbs, cbs: (h, rbs[g] - rb_lo, 0)
        )
        stat_spec = pl.BlockSpec(
            (1, 1, 8, tb),
            lambda h, g, rbs, cbs: (h, rbs[g] - rb_lo, 0, 0),
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H, hi - lo),
            in_specs=[
                pl.BlockSpec(
                    (1, tb, B.tiles.shape[-1]),
                    lambda h, g, rbs, cbs: (lo + g, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 8, tb),
                    lambda h, g, rbs, cbs: (h, rbs[g], 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 8, tb),
                    lambda h, g, rbs, cbs: (h, cbs[g], 0, 0),
                ),
                pl.BlockSpec(
                    (1, tb, F), lambda h, g, rbs, cbs: (h, cbs[g], 0)
                ),
            ],
            out_specs=[out_spec, stat_spec, stat_spec]
            if return_stats
            else out_spec,
            scratch_shapes=[
                pltpu.VMEM((tb, 1), jnp.float32),
                pltpu.VMEM((tb, 1), jnp.float32),
                pltpu.VMEM((tb, F), jnp.float32),
            ],
        )
        out_shape = jax.ShapeDtypeStruct((H, nr * tb, F), jnp.float32)
        stat_shape = jax.ShapeDtypeStruct(
            (H, nr, 8, tb), jnp.float32
        )
        return pl.pallas_call(
            partial(
                _flash_gat_kernel_stats
                if return_stats
                else _flash_gat_kernel,
                alpha=alpha,
                fast_exp=fast_exp,
            ),
            grid_spec=grid_spec,
            out_shape=[out_shape, stat_shape, stat_shape]
            if return_stats
            else out_shape,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(2 * H * T * frac * tb * tb * (F + 4)),
                bytes_accessed=int(
                    H * T * frac * (tb * tb * 2 + tb * F * 2)
                ),
                transcendentals=int(H * T * frac * tb * tb),
            ),
        )(
            B.tile_rb[lo:hi], B.tile_cb[lo:hi], B.tiles, s1h, s2h, Whh
        )

    parts = [_call(*sl) for sl in slices]
    if len(parts) == 1:
        res = parts[0]
    elif return_stats:
        res = tuple(
            jnp.concatenate([p[i] for p in parts], axis=1)
            for i in range(3)
        )
    else:
        res = jnp.concatenate(parts, axis=1)

    def shape_out(o):
        o = jnp.transpose(o, (1, 0, 2))[: B.n_rows]  # [N, H, F]
        return o[:, 0, :] if squeeze else o

    if return_stats:
        out, m, l = res
        # stats head-LAST [n_rt*tb, H] for the (halo) callers
        return shape_out(out), _unstat(m), _unstat(l)
    return shape_out(res)


# ---------------------------------------------------------------------------
# differentiable wrapper: flash forward + reference-identity edge backward
# ---------------------------------------------------------------------------


def _edge_scores(A: SparseMatrix, s1, s2, alpha):
    e_pre = jnp.take(s1, A.rows) + jnp.take(s2, A.cols)
    e = jnp.where(e_pre > 0, e_pre, alpha * e_pre)
    mask = A.vals > 0
    masked = jnp.where(mask, e, _NEG_INF)
    row_max = jax.ops.segment_max(masked, A.rows, num_segments=A.n_rows)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    ex = jnp.where(mask, jnp.exp(masked - jnp.take(row_max, A.rows)), 0.0)
    denom = jax.ops.segment_sum(ex, A.rows, num_segments=A.n_rows)
    s = ex / jnp.take(jnp.where(denom > 0, denom, 1.0), A.rows)
    return e_pre, s, mask


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def gat_attention_agg(A, B, s1, s2, Wh, alpha=0.2):
    """Differentiable fused GAT aggregation (single head).

    A: SparseMatrix (edge list, used by the backward pass); B: BSRMatrix of
    the same adjacency (used by the flash forward). Gradients flow to s1,
    s2 (-> attention params) and Wh. A and B are regular (traceable)
    arguments with ``None`` cotangents, so the op works when the adjacency
    enters through a jit/scan boundary.
    """
    return flash_gat_forward(B, s1, s2, Wh, alpha=alpha)


def _gat_agg_fwd(A, B, s1, s2, Wh, alpha):
    return flash_gat_forward(B, s1, s2, Wh, alpha=alpha), (A, s1, s2, Wh)


def _gat_agg_bwd(alpha, res, g_out):
    A, s1, s2, Wh = res
    e_pre, s, mask = _edge_scores(A, s1, s2, alpha)
    # q[k] = g_out[row_k] . Wh[col_k]  (SDDMM of the cotangent)
    q = jnp.sum(
        jnp.take(g_out, A.rows, axis=0) * jnp.take(Wh, A.cols, axis=0),
        axis=1,
    )
    # softmax Jacobian (the reference's identity, sgrace.py:979-981):
    # dE = s * (q - sum_row(s * q))
    t = jax.ops.segment_sum(s * q, A.rows, num_segments=A.n_rows)
    dE = s * (q - jnp.take(t, A.rows))
    dE = dE * jnp.where(e_pre > 0, 1.0, alpha)  # LeakyReLU' (sgrace.py:1011)
    dE = jnp.where(mask, dE, 0.0)
    ds1 = jax.ops.segment_sum(dE, A.rows, num_segments=A.n_rows)
    ds2 = jax.ops.segment_sum(dE, A.cols, num_segments=A.n_cols)
    # dWh[c] = sum_r s_rc * g_out[r]  (transposed attention aggregation)
    dWh = jax.ops.segment_sum(
        jnp.take(g_out, A.rows, axis=0) * s[:, None],
        A.cols,
        num_segments=Wh.shape[0],
    )
    return None, None, ds1[: s1.shape[0]], ds2[: s2.shape[0]], dWh


gat_attention_agg.defvjp(_gat_agg_fwd, _gat_agg_bwd)


# ---------------------------------------------------------------------------
# fully fused backward: tile kernels, no per-edge gathers
# ---------------------------------------------------------------------------


def _tile_probs(a_ref, s1, s2, m, l, alpha, fast_exp: bool = False):
    """Recompute one tile's softmax probabilities from saved (m, l) stats
    (same additive-mask / underflow form as the forward kernel).

    s1/m/l: [1, tb] ROW blocks (relayouted to columns here); s2: [1, tb].
    Returns (p, lrelu'-selector).
    """
    tb_r = s1.shape[-1]
    m01 = _tile_mask01(a_ref, tb_r)
    e_pre = s1.reshape(-1, 1) + s2
    e = jnp.maximum(e_pre, alpha * e_pre)
    e = e + (m01 * _MASK_BIG - _MASK_BIG)
    # masked entries underflow to exact 0 (see _MASKED); padding rows have
    # m = 0, l = 0 from the stat padding -> p = exp(-1e9) = 0 there too
    exp_elt = _fast_exp if fast_exp else jnp.exp
    p = exp_elt(e - m.reshape(-1, 1)) / jnp.maximum(
        l.reshape(-1, 1), 1e-30
    )
    lr = jnp.where(e_pre > 0, 1.0, alpha)
    return p, lr


def _flash_bwd_row_kernel(
    tile_rb, tile_cb, a_ref, s1_ref, s2_ref, m_ref, l_ref, wh_ref, go_ref,
    t_ref, u1_ref, u2_ref, *, alpha: float, fast_exp: bool = False,
):
    """Pass 1 (row-sorted tiles): row reductions of the softmax Jacobian.

    t[r]  = sum_c p*q        (q = gO @ Wh^T, the cotangent SDDMM)
    u1[r] = sum_c p*q*lrelu'
    u2[r] = sum_c p*lrelu'    =>  ds1 = u1 - t*u2  (host-side elementwise)
    """
    g = pl.program_id(1)
    first = jnp.logical_or(g == 0, tile_rb[g] != tile_rb[jnp.maximum(g - 1, 0)])

    @pl.when(first)
    def _():
        t_ref[:] = jnp.zeros_like(t_ref)
        u1_ref[:] = jnp.zeros_like(u1_ref)
        u2_ref[:] = jnp.zeros_like(u2_ref)

    p, lr = _tile_probs(
        a_ref, s1_ref[0, 0, 0:1, :], s2_ref[0, 0, 0:1, :],
        m_ref[0, 0, 0:1, :], l_ref[0, 0, 0:1, :], alpha,
        fast_exp=fast_exp,
    )
    q = jax.lax.dot_general(
        go_ref[0].astype(jnp.bfloat16),
        wh_ref[0].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tb, tb]
    pq = p * q

    def _acc_row(ref, val):
        # all 8 sublane rows accumulate identically; consumers read row 0
        ref[0, 0] += jnp.broadcast_to(val.reshape(1, -1), ref.shape[2:])

    _acc_row(t_ref, jnp.sum(pq, axis=1))
    _acc_row(u1_ref, jnp.sum(pq * lr, axis=1))
    _acc_row(u2_ref, jnp.sum(p * lr, axis=1))


def _flash_bwd_col_kernel(
    perm, rbs_c, cbs_c, a_ref, s1_ref, s2_ref, m_ref, l_ref, t_ref,
    wh_ref, go_ref, dwh_ref, ds2_ref, *, alpha: float,
    fast_exp: bool = False,
):
    """Pass 2 (column-sorted tiles): column reductions.

    dWh[c] = sum_r p[r,c] * gO[r]          (p^T @ gO, MXU)
    ds2[c] = sum_r dE[r,c],  dE = p*(q - t)*lrelu'
    """
    g = pl.program_id(1)
    first = jnp.logical_or(g == 0, cbs_c[g] != cbs_c[jnp.maximum(g - 1, 0)])

    @pl.when(first)
    def _():
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        ds2_ref[:] = jnp.zeros_like(ds2_ref)

    p, lr = _tile_probs(
        a_ref, s1_ref[0, 0, 0:1, :], s2_ref[0, 0, 0:1, :],
        m_ref[0, 0, 0:1, :], l_ref[0, 0, 0:1, :], alpha,
        fast_exp=fast_exp,
    )
    q = jax.lax.dot_general(
        go_ref[0].astype(jnp.bfloat16),
        wh_ref[0].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dE = (
        p * (q - t_ref[0, 0, 0:1, :].reshape(-1, 1)) * lr
    )  # [tb(r), tb(c)]
    dwh_ref[0] += jax.lax.dot_general(
        p.astype(jnp.bfloat16),
        go_ref[0].astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tb(c), F]
    ones = jnp.ones((1, dE.shape[0]), jnp.float32)
    colsum = jax.lax.dot_general(
        ones, dE, (((1,), (0,)), ((), ()))
    )  # [1, tb(c)]
    ds2_ref[0, 0] += jnp.broadcast_to(colsum, ds2_ref.shape[2:])


def _pad_bwd_operands(B: BSRMatrix, s1, s2, Wh, g_out):
    """Pad head-last (s1 [*, H], s2, Wh [*, H*F], g_out) to the tile grid
    the backward kernels read."""
    tb = B.tb
    n_rt = B.n_row_tiles
    n_ct = _round_up(B.n_cols, tb) // tb
    if Wh.shape[0] != n_ct * tb:
        Wh = jnp.pad(Wh, ((0, n_ct * tb - Wh.shape[0]), (0, 0)))
    if s1.shape[0] != n_rt * tb:
        s1 = jnp.pad(s1, ((0, n_rt * tb - s1.shape[0]), (0, 0)))
    if s2.shape[0] != n_ct * tb:
        s2 = jnp.pad(s2, ((0, n_ct * tb - s2.shape[0]), (0, 0)))
    if g_out.shape[0] != n_rt * tb:
        g_out = jnp.pad(g_out, ((0, n_rt * tb - g_out.shape[0]), (0, 0)))
    return s1, s2, Wh, g_out


def _bwd_row_pass(B, s1, s2, m, l, Wh, g_out, *, alpha, interpret,
                  fast_exp=False):
    """Row-streaming pass over padded head-last operands (s1/s2/m/l
    [*, H], Wh/g_out [*, H*F]) -> (t, u1, u2), each [n_rt*tb, H].
    ``m``/``l`` are the (possibly externally merged) softmax stats used to
    recompute tile probabilities."""
    tb = B.tb
    n_rt = B.n_row_tiles
    T = B.num_tiles
    H = s1.shape[1]
    F = Wh.shape[1] // H
    W3 = _hmaj(Wh.reshape(-1, H, F))
    G3 = _hmaj(g_out.reshape(-1, H, F))
    s1h = _hstat(_hmaj(s1), tb)
    s2h = _hstat(_hmaj(s2), tb)
    mh = _hstat(_hmaj(m), tb)
    lh = _hstat(_hmaj(l), tb)
    slices = B.slices if B.slices is not None else ((0, T, 0, n_rt),)

    def _call(lo, hi, rb_lo, rb_hi):
        frac = (hi - lo) / T
        stat = pl.BlockSpec(
            (1, 1, 8, tb),
            lambda h, g, rbs, cbs: (h, rbs[g] - rb_lo, 0, 0),
        )
        stat_in = pl.BlockSpec(
            (1, 1, 8, tb), lambda h, g, rbs, cbs: (h, rbs[g], 0, 0)
        )
        row_grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H, hi - lo),
            in_specs=[
                pl.BlockSpec(
                    (1, tb, B.tiles.shape[-1]),
                    lambda h, g, rbs, cbs: (lo + g, 0, 0),
                ),
                stat_in,
                pl.BlockSpec(
                    (1, 1, 8, tb),
                    lambda h, g, rbs, cbs: (h, cbs[g], 0, 0),
                ),
                stat_in,
                stat_in,
                pl.BlockSpec(
                    (1, tb, F), lambda h, g, rbs, cbs: (h, cbs[g], 0)
                ),
                pl.BlockSpec(
                    (1, tb, F), lambda h, g, rbs, cbs: (h, rbs[g], 0)
                ),
            ],
            out_specs=[stat, stat, stat],
        )
        stat_shape = jax.ShapeDtypeStruct(
            (H, rb_hi - rb_lo, 8, tb), jnp.float32
        )
        return pl.pallas_call(
            partial(_flash_bwd_row_kernel, alpha=alpha, fast_exp=fast_exp),
            grid_spec=row_grid,
            out_shape=[stat_shape, stat_shape, stat_shape],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(2 * H * T * frac * tb * tb * (F + 4)),
                bytes_accessed=int(
                    H * T * frac * (tb * tb + 2 * tb * F * 4)
                ),
                transcendentals=int(H * T * frac * tb * tb),
            ),
        )(
            B.tile_rb[lo:hi], B.tile_cb[lo:hi], B.tiles,
            s1h, s2h, mh, lh, W3, G3,
        )

    parts = [_call(*sl) for sl in slices]
    if len(parts) == 1:
        t, u1, u2 = parts[0]
    else:
        t, u1, u2 = (
            jnp.concatenate([p[i] for p in parts], axis=1) for i in range(3)
        )
    return _unstat(t), _unstat(u1), _unstat(u2)


def _bwd_col_pass(B, s1, s2, m, l, t, Wh, g_out, *, alpha, interpret,
                  fast_exp=False):
    """Column-streaming pass over padded head-last operands -> (dWh, ds2),
    shapes [n_ct*tb, H*F] / [n_ct*tb, H]. ``t`` is the full row reduction
    (local + any external edges) the Jacobian identity subtracts."""
    tb = B.tb
    n_ct = _round_up(B.n_cols, tb) // tb
    T = B.num_tiles
    H = s1.shape[1]
    F = Wh.shape[1] // H
    W3 = _hmaj(Wh.reshape(-1, H, F))
    G3 = _hmaj(g_out.reshape(-1, H, F))
    perm = jnp.argsort(B.tile_cb)
    rbs_c = jnp.take(B.tile_rb, perm)
    cbs_c = jnp.take(B.tile_cb, perm)
    s1h = _hstat(_hmaj(s1), tb)
    s2h = _hstat(_hmaj(s2), tb)
    mh = _hstat(_hmaj(m), tb)
    lh = _hstat(_hmaj(l), tb)
    th = _hstat(_hmaj(t), tb)
    slices = (
        B.slices_col if B.slices_col is not None else ((0, T, 0, n_ct),)
    )

    def _call(lo, hi, cb_lo, cb_hi):
        frac = (hi - lo) / T
        rstat = pl.BlockSpec(
            (1, 1, 8, tb),
            lambda h, g, perm, rbs, cbs: (h, rbs[g], 0, 0),
        )
        col_grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(H, hi - lo),
            in_specs=[
                pl.BlockSpec(
                    (1, tb, B.tiles.shape[-1]),
                    lambda h, g, perm, rbs, cbs: (perm[g], 0, 0),
                ),
                rstat,
                pl.BlockSpec(
                    (1, 1, 8, tb),
                    lambda h, g, perm, rbs, cbs: (h, cbs[g], 0, 0),
                ),
                rstat,
                rstat,
                rstat,
                pl.BlockSpec(
                    (1, tb, F), lambda h, g, perm, rbs, cbs: (h, cbs[g], 0)
                ),
                pl.BlockSpec(
                    (1, tb, F), lambda h, g, perm, rbs, cbs: (h, rbs[g], 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, tb, F),
                    lambda h, g, perm, rbs, cbs: (h, cbs[g] - cb_lo, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 8, tb),
                    lambda h, g, perm, rbs, cbs: (
                        h, cbs[g] - cb_lo, 0, 0
                    ),
                ),
            ],
        )
        nc = cb_hi - cb_lo
        return pl.pallas_call(
            partial(_flash_bwd_col_kernel, alpha=alpha, fast_exp=fast_exp),
            grid_spec=col_grid,
            out_shape=[
                jax.ShapeDtypeStruct((H, nc * tb, F), jnp.float32),
                jax.ShapeDtypeStruct((H, nc, 8, tb), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(4 * H * T * frac * tb * tb * (F + 2)),
                bytes_accessed=int(
                    H * T * frac * (tb * tb + 3 * tb * F * 4)
                ),
                transcendentals=int(H * T * frac * tb * tb),
            ),
        )(
            perm[lo:hi], rbs_c[lo:hi], cbs_c[lo:hi], B.tiles,
            s1h, s2h, mh, lh, th, W3, G3,
        )

    parts = [_call(*sl) for sl in slices]
    if len(parts) == 1:
        dWh, ds2 = parts[0]
    else:
        dWh = jnp.concatenate([p[0] for p in parts], axis=1)
        ds2 = jnp.concatenate([p[1] for p in parts], axis=1)
    return (
        jnp.transpose(dWh, (1, 0, 2)).reshape(n_ct * tb, H * F),
        _unstat(ds2),
    )


def flash_gat_backward(
    B: BSRMatrix,
    s1: jax.Array,
    s2: jax.Array,
    Wh: jax.Array,
    g_out: jax.Array,
    m: jax.Array,
    l: jax.Array,
    *,
    alpha: float = 0.2,
    interpret: bool | None = None,
):
    """(ds1, ds2, dWh) of the flash GAT aggregation — tile kernels only.

    Same Jacobian identity as the reference (sgrace.py:979-981,1011),
    reorganized into row- and column-streaming tile reductions so no
    E-sized gather ever materializes. Shape-polymorphic like the forward
    (1-D scores = single head; [N, H] scores + [N, H, F] features = batched
    heads, one kernel per pass for all H). ``m``/``l``: [n_rt*tb, H].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s1, s2, Wh, squeeze = _norm_heads(s1, s2, Wh)
    H = s1.shape[1]
    F = Wh.shape[-1]
    g_out = g_out.reshape(g_out.shape[0], H * F)
    n1, n2, nw = s1.shape[0], s2.shape[0], Wh.shape[0]
    s1, s2, Wh, g_out = _pad_bwd_operands(
        B, s1, s2, Wh.reshape(nw, H * F), g_out
    )
    t, u1, u2 = _bwd_row_pass(
        B, s1, s2, m, l, Wh, g_out, alpha=alpha, interpret=interpret
    )
    ds1 = (u1 - t * u2)[:n1]
    dWh, ds2 = _bwd_col_pass(
        B, s1, s2, m, l, t, Wh, g_out, alpha=alpha, interpret=interpret
    )
    ds2 = ds2[:n2]
    dWh = dWh[:nw].reshape(nw, H, F)
    if squeeze:
        return ds1[:, 0], ds2[:, 0], dWh[:, 0, :]
    return ds1, ds2, dWh


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def gat_attention_agg_fused(B, s1, s2, Wh, alpha=0.2):
    """Differentiable fused GAT aggregation, flash forward AND backward.

    Unlike ``gat_attention_agg`` this never touches the edge list: both
    directions stream BSR tiles through the MXU, with all heads batched
    into one kernel per pass. Gradients flow to s1, s2 (-> attention
    params) and Wh; B is a regular (traceable) argument with a ``None``
    cotangent.
    """
    return flash_gat_forward(B, s1, s2, Wh, alpha=alpha)


def _gat_agg_fused_fwd(B, s1, s2, Wh, alpha):
    out, m, l = flash_gat_forward(B, s1, s2, Wh, alpha=alpha, return_stats=True)
    return out, (B, s1, s2, Wh, m, l)


def _gat_agg_fused_bwd(alpha, res, g_out):
    B, s1, s2, Wh, m, l = res
    ds1, ds2, dWh = flash_gat_backward(B, s1, s2, Wh, g_out, m, l, alpha=alpha)
    return None, ds1, ds2, dWh


gat_attention_agg_fused.defvjp(_gat_agg_fused_fwd, _gat_agg_fused_bwd)


# ---------------------------------------------------------------------------
# hybrid flash forward: dense tiles + remainder CHUNK steps in ONE kernel
# ---------------------------------------------------------------------------


def _flash_hybrid_kernel(
    srb, scb, stile, schunk, skind,
    a_ref, s1_ref, s2_ref, wh_ref, s2g_ref, whg_ref, lrow_ref,
    out_ref, m_ref, l_ref, acc_ref, *, alpha: float, tb: int, K: int,
    m_out=None, l_out=None, chunk_mode: str = "full",
    resident: bool = False,
):
    """Flash-GAT grid step that is EITHER a dense adjacency tile (the
    _flash_gat_kernel math) OR a remainder chunk: K pre-gathered edges
    of this output row block, scored lane-packed and scattered into the
    resident (m, l, acc) state through a one-hot [tb, K] grid — the
    attention analogue of ops/fused_agg's chunk steps. The r4-era
    alternative (edge-path remainder + external stats merge) cost
    ~15 ms at 2^20 nodes for 64k edges: narrow segment reductions over
    1M segments plus several full [N, F] merge passes. Here the merge
    is free — the chunk lands in the same online-softmax state the
    tiles stream through, one grid step per K edges."""
    g = pl.program_id(1)
    hh = pl.program_id(0)  # head (hoisted: program_id inside pl.when
    # bodies does not lower in interpret mode)
    S = pl.num_programs(1)
    first = jnp.logical_or(g == 0, srb[g] != srb[jnp.maximum(g - 1, 0)])
    last = jnp.logical_or(g == S - 1, srb[g + 1] != srb[g])

    @pl.when(first)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _M_INIT)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def _online_update(e, feats):
        """Shared online-softmax update: e [tb, X] masked scores (dead
        entries hold <= _MASKED), feats [X, F] bf16-castable."""
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, jnp.max(e, axis=1, keepdims=True))
        p = jnp.exp(e - m_new)
        corr = jnp.exp(m_old - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + jnp.dot(
            p.astype(jnp.bfloat16),
            feats.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    # universal kind semantics: != 1 -> tile, >= 1 -> chunk (3 = both)
    @pl.when(skind[g] != 1)
    def _():
        m01 = _tile_mask01(a_ref, tb)
        e = s1_ref[0, 0, 0:1, :].reshape(-1, 1) + s2_ref[0, 0, 0:1, :]
        e = jnp.maximum(e, alpha * e)
        _online_update(e + (m01 * _MASK_BIG - _MASK_BIG), wh_ref[0])

    if chunk_mode != "off":

        @pl.when(skind[g] >= 1)
        def _():
            if resident:
                # VMEM-resident chunk payloads, indexed dynamically by
                # the prefetched chunk id: per-chunk block streaming
                # measured ~6.7 us of exposed small-DMA latency per
                # fetch-set at 2^20 even when attached to tile steps
                # (Mosaic fetches declared blocks unconditionally);
                # resident payloads pay ONE bulk DMA per call instead
                ch = schunk[g]
                lr = lrow_ref[ch, 0:1, :]  # [1, K]
                sg = s2g_ref[0, ch, 0:1, :]  # head via the index map
                feats = whg_ref[0, ch]  # [K, F]
            else:
                lr = lrow_ref[0, 0:1, :]  # [1, K] f32 rows (tb = dead)
                sg = s2g_ref[0, 0, 0:1, :]
                feats = whg_ref[0, 0]
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (tb, K), 0
            ).astype(jnp.float32)
            if chunk_mode == "noscore":
                # diag mode: GCN-style one-hot add, no score math
                oh = (iota == lr).astype(jnp.bfloat16)
                acc_ref[:] += jnp.dot(
                    oh, feats.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                return
            oh01 = (iota == lr).astype(jnp.float32)
            e = s1_ref[0, 0, 0:1, :].reshape(-1, 1) + sg
            e = jnp.maximum(e, alpha * e)
            _online_update(e + (oh01 * _MASK_BIG - _MASK_BIG), feats)

    @pl.when(last)
    def _():
        out_ref[0] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        if m_out is not None:
            m_out[0, 0] = jnp.broadcast_to(
                m_ref[:].reshape(1, -1), m_out.shape[2:]
            )
            l_out[0, 0] = jnp.broadcast_to(
                l_ref[:].reshape(1, -1), l_out.shape[2:]
            )


def _flash_hybrid_kernel_stats(
    srb, scb, stile, schunk, skind,
    a_ref, s1_ref, s2_ref, wh_ref, s2g_ref, whg_ref, lrow_ref,
    out_ref, m_out, l_out, m_ref, l_ref, acc_ref,
    *, alpha: float, tb: int, K: int, resident: bool = False,
):
    _flash_hybrid_kernel(
        srb, scb, stile, schunk, skind,
        a_ref, s1_ref, s2_ref, wh_ref, s2g_ref, whg_ref, lrow_ref,
        out_ref, m_ref, l_ref, acc_ref, alpha=alpha, tb=tb, K=K,
        m_out=m_out, l_out=l_out, resident=resident,
    )


def flash_gat_hybrid_forward(
    plan,
    s1: jax.Array,
    s2: jax.Array,
    Wh: jax.Array,
    *,
    alpha: float = 0.2,
    interpret: bool | None = None,
    return_stats: bool = False,
    _chunk_mode: str = "full",
):
    """Hybrid flash-GAT forward over a fused schedule (ops/fused_agg
    FusedAggPlan built on the DENSE attention tiles + remainder edges,
    value mode): one kernel pass computes the exact row softmax over ALL
    edges — tiles and remainder chunks share the online (m, l, acc)
    state, so no external merge exists. Multi-head batched like
    flash_gat_forward; with ``return_stats`` also returns the TRUE
    (m, l) over every edge (what the merged-stats backward consumes).

    Matches the reference engine's one-pipeline-slot-per-real-edge
    economics (kernelMatrixmult_all.cpp:2009-2048) for attention: dense
    hub tiles ride full [tb, tb] score grids, sparse-tail edges pay one
    [tb, K] grid per K edges instead of a whole dead-lane tile."""
    B = plan.B
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s1, s2, Wh, squeeze = _norm_heads(s1, s2, Wh)
    H = s1.shape[1]
    tb, K = B.tb, plan.K
    n_rt = B.n_row_tiles
    n_ct = _round_up(B.n_cols, tb) // tb
    F = Wh.shape[-1]
    R = plan.num_chunks

    # chunk gathers from the UNPADDED arrays (slot_col holds global col
    # ids; dead slots point at col 0 with sentinel lrow -> inert). ONE
    # gather of [Wh | s2] rows: a standalone take(s2, slot_col) is a
    # 4-byte random read per slot that pays a full HBM transaction each
    # (measured 15.4 ms for 390k slots at 2^20 rows — more than the
    # whole tile pass); ridden along the 4F-byte Wh row it is free.
    # Rows are additionally padded to the 512-byte HBM transaction width
    # when affordable: 132-byte rows still measured ~44 ns/slot (4.9 ms
    # of the 2^20 hybrid), transaction-width rows gather at ~4 ns/slot.
    lanes = H * (F + 1)
    pad_lanes = 0
    if lanes < 128 and Wh.shape[0] * 128 * 4 <= (2 << 30):
        pad_lanes = 128 - lanes
    cat = jnp.concatenate(
        [Wh.reshape(Wh.shape[0], H * F), s2]
        + ([jnp.zeros((Wh.shape[0], pad_lanes), Wh.dtype)]
           if pad_lanes else []),
        axis=1,
    )  # [N, H*(F+1) (+pad)]
    g = jnp.take(cat, plan.slot_col, axis=0)
    whg = g[:, : H * F]
    s2g = g[:, H * F : H * (F + 1)]  # [R*K, H]
    # head-major, sublane-padded like plan.lrow's [R, 8, K] layout
    s2g = jnp.pad(
        s2g.T.reshape(H, R, 1, K), ((0, 0), (0, 0), (0, 7), (0, 0))
    )
    whg = jnp.transpose(whg.reshape(R, K, H, F), (2, 0, 1, 3))

    if Wh.shape[0] != n_ct * tb:
        Wh = jnp.pad(Wh, ((0, n_ct * tb - Wh.shape[0]), (0, 0), (0, 0)))
    if s1.shape[0] != n_rt * tb:
        s1 = jnp.pad(s1, ((0, n_rt * tb - s1.shape[0]), (0, 0)))
    if s2.shape[0] != n_ct * tb:
        s2 = jnp.pad(s2, ((0, n_ct * tb - s2.shape[0]), (0, 0)))
    s1h = _hstat(_hmaj(s1), tb)
    s2h = _hstat(_hmaj(s2), tb)
    Whh = _hmaj(Wh)

    S = plan.num_steps
    slices = plan.slices
    if len(slices) == 1 and slices[0][1] in (-1, S):
        slices = ((0, S, 0, n_rt),)
    inner = B.tiles.shape[-1]

    # VMEM-resident chunk payloads when they fit: streaming them as
    # per-step blocks measured ~6.7 us of exposed small-DMA latency per
    # chunk fetch-set at 2^20 (5.8 ms for 859 chunks — more than their
    # compute by 4x), because Mosaic fetches declared blocks
    # unconditionally and the transfers are too small to pipeline.
    # Resident payloads are fetched once per call and indexed
    # dynamically by the prefetched chunk id.
    # residency is PER HEAD: the chunk payload blocks are indexed by the
    # grid's head dim, so one head's slice is fetched per h-sweep (H
    # bulk DMAs per call). Mosaic DOUBLE-BUFFERS the resident operands
    # (H=4 pubmed: scoped demand 120.9 M against a 40 M payload cap —
    # r5 bench), so residency is priced at 2x the per-head payload;
    # larger payloads stream per-step instead
    payload = (
        (s2g.size * 4 + whg.size * 4) // H + plan.lrow.size * 4
    )
    # Mosaic's measured scoped demand for resident per-head payloads:
    # ~2x per-head size at H=1 (double-buffered whole-array operands),
    # but ~3.2x at H>1 — the h-indexed payload slices keep an extra
    # in-flight copy across the head sweep (2^20 H=4 demanded 116.4M
    # against the 2x-priced 88M cap and OOMed at compile; pubmed H=4,
    # 48 + 3.2x11.6M = 85M, fits and runs). Larger payloads stream.
    fac = 2.0 if H == 1 else 3.3
    resident = int(fac * payload) + (48 << 20) <= _VMEM_LIMIT
    # the stats variant (training fwd) needs more scratch than the
    # budget arithmetic suggests — Mosaic's scoped demand grew with the
    # budget itself (59 M at a 44 M cap, 62.7 M at 60 M; r5 bench) —
    # so it simply gets the full backward-tier budget
    vmem_lim = (
        (_VMEM_LIMIT if return_stats else
         min(_VMEM_LIMIT, int(fac * payload) + (48 << 20)))
        if resident else None
    )

    def _call(lo, hi, rb_lo, rb_hi):
        nr = rb_hi - rb_lo
        frac = (hi - lo) / S
        out_spec = pl.BlockSpec(
            (1, tb, F),
            lambda h, g, rb, cb, ti, ch, kd: (h, rb[g] - rb_lo, 0),
        )
        stat_spec = pl.BlockSpec(
            (1, 1, 8, tb),
            lambda h, g, rb, cb, ti, ch, kd: (h, rb[g] - rb_lo, 0, 0),
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(H, hi - lo),
            in_specs=[
                pl.BlockSpec(
                    (1, tb, inner),
                    lambda h, g, rb, cb, ti, ch, kd: (ti[g], 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 8, tb),
                    lambda h, g, rb, cb, ti, ch, kd: (h, rb[g], 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 8, tb),
                    lambda h, g, rb, cb, ti, ch, kd: (h, cb[g], 0, 0),
                ),
                pl.BlockSpec(
                    (1, tb, F),
                    lambda h, g, rb, cb, ti, ch, kd: (h, cb[g], 0),
                ),
            ] + ([
                pl.BlockSpec(
                    (1,) + s2g.shape[1:],
                    lambda h, g, rb, cb, ti, ch, kd: (h, 0, 0, 0),
                ),
                pl.BlockSpec(
                    (1,) + whg.shape[1:],
                    lambda h, g, rb, cb, ti, ch, kd: (h, 0, 0, 0),
                ),
                pl.BlockSpec(
                    plan.lrow.shape,
                    lambda h, g, rb, cb, ti, ch, kd: (0, 0, 0),
                ),
            ] if resident else [
                pl.BlockSpec(
                    (1, 1, 8, K),
                    lambda h, g, rb, cb, ti, ch, kd: (h, ch[g], 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, K, F),
                    lambda h, g, rb, cb, ti, ch, kd: (h, ch[g], 0, 0),
                ),
                pl.BlockSpec(
                    (1, 8, K),
                    lambda h, g, rb, cb, ti, ch, kd: (ch[g], 0, 0),
                ),
            ]),
            out_specs=[out_spec, stat_spec, stat_spec]
            if return_stats
            else out_spec,
            scratch_shapes=[
                pltpu.VMEM((tb, 1), jnp.float32),
                pltpu.VMEM((tb, 1), jnp.float32),
                pltpu.VMEM((tb, F), jnp.float32),
            ],
        )
        out_shape = jax.ShapeDtypeStruct((H, nr * tb, F), jnp.float32)
        stat_shape = jax.ShapeDtypeStruct((H, nr, 8, tb), jnp.float32)
        T = B.num_tiles
        return pl.pallas_call(
            partial(
                _flash_hybrid_kernel_stats
                if return_stats
                else _flash_hybrid_kernel,
                alpha=alpha,
                tb=tb,
                K=K,
                resident=resident,
                **({} if return_stats else
                   dict(chunk_mode=_chunk_mode)),
            ),
            grid_spec=grid_spec,
            out_shape=[out_shape, stat_shape, stat_shape]
            if return_stats
            else out_shape,
            interpret=interpret,
            **({} if vmem_lim is None else dict(
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem_lim
                )
            )),
            cost_estimate=pl.CostEstimate(
                flops=int(
                    2 * H * frac * (T * tb * tb + R * tb * K) * (F + 4)
                ),
                bytes_accessed=int(
                    H
                    * frac
                    * (
                        T * (tb * inner + tb * F * 2)
                        + R * K * (F + 1) * 4
                    )
                ),
                transcendentals=int(
                    H * frac * (T * tb * tb + R * tb * K)
                ),
            ),
        )(
            plan.step_rb[lo : hi + 1],
            plan.step_cb[lo:hi],
            plan.step_tile[lo:hi],
            plan.step_chunk[lo:hi],
            plan.step_kind[lo:hi],
            B.tiles, s1h, s2h, Whh, s2g, whg, plan.lrow,
        )

    parts = [_call(*sl) for sl in slices]
    if len(parts) == 1:
        res = parts[0]
    elif return_stats:
        res = tuple(
            jnp.concatenate([p[i] for p in parts], axis=1)
            for i in range(3)
        )
    else:
        res = jnp.concatenate(parts, axis=1)

    def shape_out(o):
        o = jnp.transpose(o, (1, 0, 2))[: B.n_rows]
        return o[:, 0, :] if squeeze else o

    if return_stats:
        out, m, l = res
        return shape_out(out), _unstat(m), _unstat(l)
    return shape_out(res)


# ---------------------------------------------------------------------------
# distributed building block: local flash tiles + halo edges, softmax-stats
# merge in BOTH directions (forward combine + merged-stats fused backward)
# ---------------------------------------------------------------------------


def _halo_gat_forward(
    B, s1, s2, s2h, Wh, halo, rows_rem, cols_halo, mask_rem, alpha,
    edges_sorted: bool = False,
):
    """One shard's GAT row softmax over local tiles + remote (halo) edges.

    Head-last multi-head layout throughout: s1/s2 [n, H], s2h [HL, H],
    Wh [n, H, F], halo [HL, H, F]. Local tiles run the flash kernel
    (partial stats m_l, l_l); the few boundary edges run the classic
    streaming-softmax pieces; the two are combined with the flash
    block-combine identity

        m = max(m_l, m_r);  l = l_l*e^{m_l-m} + l_r*e^{m_r-m}
        out = (acc_l*e^{m_l-m} + acc_r*e^{m_r-m}) / l

    which is exactly the row softmax over all edges. ``edges_sorted``
    marks ``rows_rem`` as non-decreasing — the segment reductions take
    XLA's sorted-scatter fast path (~2.5x at 2^20 rows). Returns
    (out [nl, H, F], merged stats (m, l) [nl, H]).
    """
    nl = B.n_rows
    o_l, m_l, l_l = flash_gat_forward(B, s1, s2, Wh, alpha=alpha,
                                      return_stats=True)
    m_l = m_l[:nl]  # [nl, H]
    l_l = l_l[:nl]
    acc_l = o_l * l_l[..., None]  # un-normalize the local partial result

    mask = mask_rem[:, None]  # one adjacency mask shared by all heads
    e = jnp.take(s1, rows_rem, axis=0) + jnp.take(s2h, cols_halo, axis=0)
    e = jnp.maximum(e, alpha * e)
    e = jnp.where(mask, e, _MASKED)
    m_r = jax.ops.segment_max(
        e, rows_rem, num_segments=nl, indices_are_sorted=edges_sorted
    )
    m_r = jnp.maximum(m_r, _M_INIT)  # empty rows: -inf -> sentinel
    ex = jnp.where(mask, jnp.exp(e - jnp.take(m_r, rows_rem, axis=0)), 0.0)
    l_r = jax.ops.segment_sum(
        ex, rows_rem, num_segments=nl, indices_are_sorted=edges_sorted
    )
    acc_r = jax.ops.segment_sum(
        jnp.take(halo, cols_halo, axis=0) * ex[..., None],
        rows_rem,
        num_segments=nl,
        indices_are_sorted=edges_sorted,
    )

    m = jnp.maximum(m_l, m_r)
    c_l = jnp.exp(m_l - m)
    c_r = jnp.exp(m_r - m)
    l = l_l * c_l + l_r * c_r
    num = acc_l * c_l[..., None] + acc_r * c_r[..., None]
    out = jnp.where(
        l[..., None] > 0, num / jnp.maximum(l, 1e-30)[..., None], 0.0
    )
    return out, m, l


@partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def flash_gat_halo_agg(
    B, s1, s2, s2h, Wh, halo, rows_rem, cols_halo, mask_rem, alpha=0.2,
    edges_sorted: bool = False,
):
    """Differentiable shard-local GAT aggregation over local BSR tiles plus
    halo edges — fused flash kernels in BOTH directions, with the softmax
    stats merged across the two edge populations and all heads batched into
    one kernel per pass (1-D/2-D scores polymorphism as in the other entry
    points).

    Contains no collectives: the halo buffer is a regular diff argument, so
    under shard_map autodiff transposes the surrounding all_to_all/gather
    automatically and the cotangent flows back to the owning shards.
    Gradients: s1/s2/s2h (-> attention params), Wh (local hidden rows),
    halo (received remote hidden rows). B and the edge arrays get ``None``.

    The backward recomputes local tile probabilities from the MERGED (m, l)
    — the distributed extension of flash attention's saved-stats backward —
    and evaluates the reference softmax-Jacobian identity
    (sgrace.py:979-981,1011) with the row reduction t summed over local AND
    remote edges.
    """
    squeeze = s1.ndim == 1
    s1, s2, Wh, _ = _norm_heads(s1, s2, Wh)
    if squeeze:
        s2h, halo = s2h[:, None], halo[:, None, :]
    out, _, _ = _halo_gat_forward(
        B, s1, s2, s2h, Wh, halo, rows_rem, cols_halo, mask_rem, alpha,
        edges_sorted,
    )
    return out[:, 0, :] if squeeze else out


def _halo_agg_fwd(B, s1, s2, s2h, Wh, halo, rows_rem, cols_halo, mask_rem,
                  alpha, edges_sorted):
    squeeze = s1.ndim == 1
    s1n, s2n, Whn, _ = _norm_heads(s1, s2, Wh)
    s2hn, halon = (s2h[:, None], halo[:, None, :]) if squeeze else (s2h, halo)
    out, m, l = _halo_gat_forward(
        B, s1n, s2n, s2hn, Whn, halon, rows_rem, cols_halo, mask_rem, alpha,
        edges_sorted,
    )
    res = (B, s1n, s2n, s2hn, Whn, halon, rows_rem, cols_halo, mask_rem,
           m, l, squeeze)
    return (out[:, 0, :] if squeeze else out), res


def _halo_agg_bwd(alpha, edges_sorted, res, g_out):
    (B, s1, s2, s2h, Wh, halo, rows_rem, cols_halo, mask_rem, m, l,
     squeeze) = res
    interpret = jax.default_backend() != "tpu"
    nl = B.n_rows
    tb = B.tb
    n_rt = B.n_row_tiles
    H = s1.shape[1]
    F = Wh.shape[-1]
    n1, n2, nw = s1.shape[0], s2.shape[0], Wh.shape[0]
    HL = halo.shape[0]
    g_out = g_out.reshape(g_out.shape[0], H, F)

    # pad merged stats to the tile grid (padding rows have no edges; their
    # mask zeroes p regardless of the stat values — use (0, 1) to stay safe)
    m_p = jnp.pad(m, ((0, n_rt * tb - nl), (0, 0)))
    l_p = jnp.pad(l, ((0, n_rt * tb - nl), (0, 0)), constant_values=1.0)

    s1p, s2p, Whp, g_outp = _pad_bwd_operands(
        B, s1, s2, Wh.reshape(nw, H * F), g_out.reshape(-1, H * F)
    )

    # local tile row reductions under the merged stats
    t_l, u1_l, u2_l = _bwd_row_pass(
        B, s1p, s2p, m_p, l_p, Whp, g_outp, alpha=alpha, interpret=interpret
    )

    # remote-edge pieces of the same reductions ([E, H] per-head lanes);
    # p recomputed from the merged stats in the kernels' base-2 domain
    mask = mask_rem[:, None]
    e_pre = jnp.take(s1, rows_rem, axis=0) + jnp.take(s2h, cols_halo, axis=0)
    lr = jnp.where(e_pre > 0, 1.0, alpha)
    e2 = jnp.maximum(e_pre, alpha * e_pre)
    p_r = jnp.where(
        mask, jnp.exp(e2 - jnp.take(m, rows_rem, axis=0)), 0.0
    ) / jnp.take(jnp.maximum(l, 1e-30), rows_rem, axis=0)
    q_r = jnp.sum(
        jnp.take(g_out, rows_rem, axis=0) * jnp.take(halo, cols_halo, axis=0),
        axis=-1,
    )  # [E, H]
    t_r = jax.ops.segment_sum(
        p_r * q_r, rows_rem, num_segments=nl,
        indices_are_sorted=edges_sorted,
    )
    u1_r = jax.ops.segment_sum(
        p_r * q_r * lr, rows_rem, num_segments=nl,
        indices_are_sorted=edges_sorted,
    )
    u2_r = jax.ops.segment_sum(
        p_r * lr, rows_rem, num_segments=nl,
        indices_are_sorted=edges_sorted,
    )

    t = t_l[:nl] + t_r
    ds1 = (u1_l[:nl] + u1_r) - t * (u2_l[:nl] + u2_r)

    # local column reductions need the FULL t (local + remote)
    t_p = jnp.pad(t, ((0, n_rt * tb - nl), (0, 0)))
    dWh, ds2 = _bwd_col_pass(
        B, s1p, s2p, m_p, l_p, t_p, Whp, g_outp, alpha=alpha,
        interpret=interpret,
    )

    # remote-edge cotangents: attention scores of halo columns and the halo
    # feature rows themselves (transposed attention aggregation)
    dE_r = p_r * (q_r - jnp.take(t, rows_rem, axis=0)) * lr
    dE_r = jnp.where(mask, dE_r, 0.0)
    ds2h = jax.ops.segment_sum(dE_r, cols_halo, num_segments=HL)
    d_halo = jax.ops.segment_sum(
        jnp.take(g_out, rows_rem, axis=0) * p_r[..., None],
        cols_halo,
        num_segments=HL,
    )
    ds1 = ds1[:n1]
    ds2 = ds2[:n2]
    dWh = dWh[:nw].reshape(nw, H, F)
    if squeeze:
        ds1, ds2, ds2h = ds1[:, 0], ds2[:, 0], ds2h[:, 0]
        dWh, d_halo = dWh[:, 0, :], d_halo[:, 0, :]
    return (
        None, ds1, ds2, ds2h, dWh, d_halo, None, None, None,
    )


flash_gat_halo_agg.defvjp(_halo_agg_fwd, _halo_agg_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gat_attention_agg_hybrid(
    plan,
    rest: SparseMatrix,
    s1: jax.Array,
    s2: jax.Array,
    Wh: jax.Array,
    alpha: float = 0.2,
    edges_sorted: bool = False,
):
    """Single-chip HYBRID flash GAT: dense adjacency tiles AND remainder
    chunk steps in ONE kernel pass (flash_gat_hybrid_forward) — an exact
    row softmax over all edges, differentiable end to end.

    The full-cover flash kernel pays a whole ``tb x tb`` score tile per
    nonempty tile; on ultra-sparse power-law graphs tiles hold <1% real
    edges, so attention ran 6.5x slower than the same graph's GCN
    aggregation. This is the attention analogue of the GCN hybrid split
    (ops/dispatch split_by_tile_density + ops/fused_agg chunk steps):
    ``plan`` is a value-mode FusedAggPlan whose B holds only the tiles
    dense enough that one tile of score math beats their edges on the
    chunk path (cover_rows/cover_cols=True — every output row and dWh
    column block must be written by some tile), and whose chunks carry
    the rest. The reference engine pays exactly one pipeline slot per
    real edge (kernelMatrixmult_all.cpp:2009-2048); this recovers that
    economics for attention at scale. (The r4-era alternative — edge-path
    remainder + external stats merge, flash_gat_halo_agg with the remote
    population aliased local — measured 15 ms of narrow segment ops and
    full-array merge passes for 64k edges at 2^20 nodes; the chunk steps
    replace all of it.)

    ``rest`` is the same remainder as an edge list — consumed only by
    the BACKWARD, whose remainder terms are cheap per-edge reductions
    (the existing merged-stats halo backward with s2h = s2, halo = Wh;
    fan-in cotangents summed). Gradients flow to s1, s2, Wh; plan/rest
    get None cotangents. ``edges_sorted`` marks rest.rows sorted.
    """
    return flash_gat_hybrid_forward(plan, s1, s2, Wh, alpha=alpha)


def _hybrid_agg_fwd(plan, rest, s1, s2, Wh, alpha, edges_sorted):
    squeeze = s1.ndim == 1
    s1n, s2n, Whn, _ = _norm_heads(s1, s2, Wh)
    out, m, l = flash_gat_hybrid_forward(
        plan, s1n, s2n, Whn, alpha=alpha, return_stats=True
    )
    res = (plan.B, rest, s1n, s2n, Whn, m, l, squeeze)
    return (out[:, 0, :] if squeeze else out), res


def _hybrid_agg_bwd(alpha, edges_sorted, res, g_out):
    B, rest, s1n, s2n, Whn, m, l, squeeze = res
    nl = B.n_rows
    # the halo backward with the remote population aliased to the local
    # one: its (m, l) are exactly this kernel's true stats, its t row
    # reduction sums tiles + remainder, and the remainder cotangents
    # (ds2h, d_halo) are this op's fan-in terms for (s2, Wh)
    halo_res = (
        B, s1n, s2n, s2n, Whn, Whn,
        rest.rows, rest.cols, rest.vals > 0,
        m[:nl], l[:nl], False,
    )
    if squeeze:
        g_out = g_out[:, None, :]
    (_, ds1, ds2, ds2h, dWh, d_halo, _, _, _) = _halo_agg_bwd(
        alpha, edges_sorted, halo_res, g_out
    )
    ds2 = ds2 + ds2h
    dWh = dWh + d_halo
    if squeeze:
        ds1, ds2, dWh = ds1[:, 0], ds2[:, 0], dWh[:, 0, :]
    return None, None, ds1, ds2, dWh


gat_attention_agg_hybrid.defvjp(_hybrid_agg_fwd, _hybrid_agg_bwd)


def gat_attention_agg_ref(A: SparseMatrix, s1, s2, Wh, alpha=0.2):
    """jnp reference (edge path) — the executable spec flash is tested
    against; identical math to sddmm + edge_softmax + weighted spmm."""
    _, s, _ = _edge_scores(A, s1, s2, alpha)
    return jax.ops.segment_sum(
        jnp.take(Wh, A.cols, axis=0) * s[:, None],
        A.rows,
        num_segments=A.n_rows,
    )
