"""Headline benchmark suite — one JSON line for the round driver.

Three measurements, in order of importance (later phases are skipped if the
deadline budget runs short; every phase is individually guarded so a failure
or relay hang cannot void the metrics already captured):

1. Citeseer 1-layer GNN forward ``D = A @ (X @ W)`` — the reference's one
   recorded hardware perf probe (4.65 ms on the RFSoC FPGA, 1 FEA-thread /
   1 ADJ-thread / 2 CUs, fp16 — jupyter/test/mmult-master.ipynb cell 34; see
   BASELINE.md). Reported as the headline ``value``/``vs_baseline``, as the
   median of 5 independent two-point estimates with the max-min spread.
2. Pubmed fused flash-GAT attention aggregation (the gat_mode accelerator
   call, sgrace.py:498-539) — ms and adjacency-edges/s.
3. A 2^20-node power-law graph (avg_degree 16; dense impossible at this
   size) aggregated on the cost-model-chosen sparse backend — ms and
   edges/s. This is the north-star regime: ogbn-products-shaped degree skew
   where only the sparse tile kernels can carry the load.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Timing methodology: the TPU relay in this environment has ~25 ms round-trip
sync latency and async dispatch that `block_until_ready` does not fully
cover, so each op is iterated inside one jitted fori_loop with a data
dependence and synced once via host readback, at two iteration counts whose
difference divides out the per-call relay overhead (see TwoPoint).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MS = 4.65  # FPGA citeseer 1t1t2c (BASELINE.md)
CITESEER = dict(N=3327, M=3703, P=32, NNZ_ADJ=12431, NNZ_FEA=105165)
PUBMED = dict(N=19717, M=500, NNZ_ADJ=88651)

DEADLINE_S = 1200.0  # overall benchmark deadline (hung-relay protection)
_START = time.time()

# filled incrementally; emitted even if a later phase hangs or fails
RESULT: dict = {}
EXTRA: dict = {}
_STASH: dict = {}  # cross-phase host objects (e.g. the 1M graph)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining() -> float:
    return DEADLINE_S - (time.time() - _START)


class TwoPoint:
    """Two-point fori_loop estimator with the compiled programs reused
    across repeats (so repeated estimates measure run-to-run spread, not
    recompilation). Time a k1- and a k2-iteration loop; the difference
    divides out the per-call relay overhead (~25 ms +/- several ms), and
    (k2 - k1) * per_iter >> relay jitter. A (k, 1) estimator is not
    reproducible here (measured spread 0.001-0.086 ms across identical
    runs); this one repeats to within ~2%."""

    def __init__(self, step, init, consts=(), k1=400, k2=2400):
        import jax
        import jax.numpy as jnp

        self.k1, self.k2 = k1, k2
        self.init, self.consts = init, consts

        def make(k):
            @jax.jit
            def f(x0, consts):
                # consts (adjacency, weights) enter as jit ARGUMENTS —
                # closure capture would embed them into the program sent to
                # the remote compiler (HTTP 413 at large-graph sizes)
                return jax.lax.fori_loop(
                    0, k, lambda i, x: step(x, *consts), x0
                )

            return f

        self._f1, self._f2 = make(k1), make(k2)

        def _sum(x):  # sync any pytree carry by pulling one scalar
            # dtype-arg reduce, NOT astype: an eager astype materializes a
            # full f32 copy of the carry (4 GiB at the 2^23 sweep size)
            leaves = jax.tree_util.tree_leaves(x)
            return float(
                sum(jnp.sum(l, dtype=jnp.float32) for l in leaves)
            )

        self._sum = _sum
        # compile + warm both programs
        self._sum(self._f1(init, consts))
        self._sum(self._f2(init, consts))

    def _time(self, f, reps):
        ts = []
        for _ in range(reps):
            t = time.time()
            self._sum(f(self.init, self.consts))
            ts.append(time.time() - t)
        return float(np.median(ts))

    def estimate(self, reps=7) -> float:
        """Median seconds per iteration of `step`."""
        t2 = self._time(self._f2, reps)
        t1 = self._time(self._f1, reps)
        return (t2 - t1) / (self.k2 - self.k1)


def load_citeseer():
    from sgracex1_tpu.graph import io

    if io.reference_data_dir() is not None:
        adj, fea, w = io.load_reference_dataset("citeseer")
        return adj, np.asarray(fea.to_dense()), w
    # synthetic with identical dims/sparsity if reference data not mounted
    from sgracex1_tpu.graph.csr import SparseMatrix

    rng = np.random.default_rng(0)
    c = CITESEER
    r = rng.integers(0, c["N"], c["NNZ_ADJ"])
    cl = rng.integers(0, c["N"], c["NNZ_ADJ"])
    adj = SparseMatrix.from_coo(
        r, cl, rng.random(c["NNZ_ADJ"]).astype(np.float32), (c["N"], c["N"])
    )
    X = np.zeros((c["N"], c["M"]), np.float32)
    ri = rng.integers(0, c["N"], c["NNZ_FEA"])
    ci = rng.integers(0, c["M"], c["NNZ_FEA"])
    X[ri, ci] = 1.0
    w = rng.standard_normal((c["M"], c["P"])).astype(np.float32) * 0.1
    return adj, X, w


def load_pubmed_adj():
    from sgracex1_tpu.graph import io

    if io.reference_data_dir() is not None:
        adj, _, _ = io.load_reference_dataset("pubmed")
        return adj
    from sgracex1_tpu.graph.csr import SparseMatrix

    rng = np.random.default_rng(1)
    p = PUBMED
    r = rng.integers(0, p["N"], p["NNZ_ADJ"])
    c = rng.integers(0, p["N"], p["NNZ_ADJ"])
    return SparseMatrix.from_coo(
        r, c, rng.random(p["NNZ_ADJ"]).astype(np.float32) + 0.1,
        (p["N"], p["N"]),
    )


def phase_citeseer():
    """Headline: citeseer 1-layer forward, 5 estimates, median + spread."""
    import jax
    import jax.numpy as jnp

    from sgracex1_tpu.ops.dispatch import prepare_adjacency, agg_matmul

    adj, X, w = load_citeseer()
    adj = adj.device()
    X = jax.device_put(X).astype(jnp.bfloat16)
    W = jax.device_put(w.astype(np.float32)).astype(jnp.bfloat16)
    prep = prepare_adjacency(adj, method="auto")
    log("citeseer aggregation backend:", prep.kind)

    def layer_step(x, prep, W):
        h = jnp.dot(x, W, preferred_element_type=jnp.float32)
        out = agg_matmul(prep, h.astype(jnp.bfloat16))
        # data dependence to stop loop-invariant hoisting: feed the output
        # back into the leading columns of x (slice update, not scatter)
        return x.at[:, : out.shape[1]].add(out.astype(x.dtype) * 1e-12)

    tp = TwoPoint(layer_step, X, consts=(prep, W))
    est_ms = sorted(tp.estimate() * 1e3 for _ in range(5))
    ms = float(np.median(est_ms))
    spread = est_ms[-1] - est_ms[0]
    log(
        f"citeseer layer fwd: {ms:.4f} ms (spread {spread:.4f} over 5 "
        f"estimates: {[f'{e:.4f}' for e in est_ms]})  "
        f"({CITESEER['NNZ_ADJ'] / ms * 1e3 / 1e6:.0f} M adj-edges/s)"
    )
    RESULT.update(
        metric="citeseer_layer_fwd_ms",
        value=round(ms, 4),
        unit="ms",
        vs_baseline=round(BASELINE_MS / ms, 2),
    )
    EXTRA["citeseer_spread_ms"] = round(spread, 4)
    EXTRA["citeseer_backend"] = prep.kind


def phase_pubmed_flash_gat():
    """Fused flash-GAT attention aggregation on pubmed: exact and fast-exp
    forward (F=32, 1 head), a batched-head forward (H=4), and a full
    fwd+bwd+Adam training step through the fused tile kernels — the
    reference's accb training-offload capability (sgrace.py:701-878) as a
    driver-captured number."""
    import jax
    import jax.numpy as jnp

    from sgracex1_tpu.graph.reorder import rcm_order, permute_graph
    from sgracex1_tpu.ops.bsr import bsr_mask_from_sparse
    from sgracex1_tpu.ops.flash_gat import (
        flash_gat_forward,
        gat_attention_agg_fused,
    )
    from sgracex1_tpu.utils.roofline import cost_flash_gat

    adj = load_pubmed_adj()
    # RCM first — the framework's documented recipe for the tile kernels
    # (DESIGN.md §1): pubmed keeps ~2.6x fewer nonempty tiles reordered,
    # and the flash kernel's work is O(nonempty tiles)
    adj, _ = permute_graph(adj, rcm_order(adj))
    rng = np.random.default_rng(0)
    N, F = adj.n_rows, 32
    Wh = jax.device_put(rng.standard_normal((N, F)).astype(np.float32))
    s1 = jax.device_put(rng.standard_normal(N).astype(np.float32))
    s2 = jax.device_put(rng.standard_normal(N).astype(np.float32))
    # product prep paths: the chooser prices fwd+bwd for training
    # (pubmed: full-cover tb=1024) and fwd only for inference (pubmed:
    # tb=256 hybrid with resident chunks, ~20% faster forward) — the
    # fwd measurement uses the inference layout, the train step the
    # training layout, each the product-optimal choice
    from sgracex1_tpu.ops.dispatch import prepare_adjacency
    from sgracex1_tpu.ops.flash_gat import (
        flash_gat_hybrid_forward,
        gat_attention_agg_hybrid,
    )

    prep = jax.device_put(
        prepare_adjacency(adj, method="xla", for_gat=True,
                          gat_train=False)
    )
    prep_t = jax.device_put(
        prepare_adjacency(adj, method="xla", for_gat=True)
    )
    B = prep.gat_bsr
    hybrid = prep.gat_plan is not None
    log(f"pubmed flash layout: {B.num_tiles} x tb={B.tb}"
        + (f" + {prep.gat_plan.num_rest_chunks} chunks" if hybrid
           else " (full cover)"))
    EXTRA["pubmed_flash_hybrid"] = hybrid

    # measurements ordered most-important-first: EXTRA accumulates as each
    # lands, so a slow relay that exhausts the phase budget mid-way still
    # leaves the earlier numbers in the record. (The fast_exp variant lives
    # in benchmarks/bench_gat.py — measured slower on this chip, not worth
    # a driver-capture compile slot.)
    if hybrid:
        def step(wh, prep, s1, s2):
            o = flash_gat_hybrid_forward(prep.gat_plan, s1, s2, wh)
            return wh + o[: wh.shape[0]] * 1e-12
    else:
        def step(wh, prep, s1, s2):
            o = flash_gat_forward(prep.gat_bsr, s1, s2, wh)
            return wh + o[: wh.shape[0]] * 1e-12

    tp = TwoPoint(step, Wh, consts=(prep, s1, s2), k1=100, k2=600)
    sec = float(np.median([tp.estimate() for _ in range(3)]))
    n_ch = prep.gat_plan.num_rest_chunks if hybrid else 0
    rl = cost_flash_gat(B, F, n_chunks=n_ch).roofline(sec)
    log(
        f"pubmed flash GAT fwd: {sec*1e3:.4f} ms  "
        f"({adj.nnz/sec/1e6:.0f} M edges/s, {rl['pct_roofline']}% of "
        f"{rl['bound']} roof; VPU {rl['pct_vpu']}% HBM {rl['pct_hbm']}%)"
    )
    EXTRA["pubmed_flash_gat_ms"] = round(sec * 1e3, 4)
    EXTRA["pubmed_flash_gat_medges_s"] = round(adj.nnz / sec / 1e6, 1)
    EXTRA["pubmed_flash_gat_pct_roofline"] = rl["pct_roofline"]
    EXTRA["pubmed_flash_gat_bound"] = rl["bound"]
    EXTRA["pubmed_flash_gat_pct_vpu"] = rl["pct_vpu"]
    if hybrid:
        # the roofline above is vs the PURE score-math roof; on a hybrid
        # layout at cache-resident scale the per-call fixed work (slot
        # gathers, run drains, chunk steps) dominates, so also attribute
        # against the calibrated LAYOUT model the chooser used — the
        # number that says whether the kernel hit its own cost model
        from sgracex1_tpu.ops import dispatch as _d

        srb = np.asarray(prep.gat_plan.step_rb)[:-1]
        n_runs = int((np.r_[True, srb[1:] != srb[:-1]]).sum())
        packed = B.tiles.shape[-1] != B.tb
        model_s = (
            B.num_tiles * _d._flash_tile_s(B.tb, packed)
            + n_runs * _d._flash_run_s(B.tb)
            + n_ch * _d._flash_chunk_s(B.tb, n_ch)
            + _d._FLASH_HYBRID_FIXED_S
        )
        pct_model = round(100.0 * model_s / sec, 1)
        log(
            f"  hybrid layout model {model_s*1e3:.3f} ms -> measured is "
            f"{pct_model}% of model (roofline % is vs pure score-math)"
        )
        EXTRA["pubmed_flash_gat_pct_model"] = pct_model

    # full training step: fwd + fused flash backward + Adam on (W, att)
    import optax

    F_in = 64
    X = jax.device_put(rng.standard_normal((N, F_in)).astype(np.float32))
    params = {
        "W": jax.device_put(
            (rng.standard_normal((F_in, F)) * 0.1).astype(np.float32)
        ),
        "att": jax.device_put(
            (rng.standard_normal((2 * F,)) * 0.1).astype(np.float32)
        ),
    }
    opt = optax.adam(1e-3)

    def train_step(carry, prep_t, X):
        params, opt_state = carry

        def loss_fn(p):
            Wh = jnp.dot(X, p["W"], preferred_element_type=jnp.float32)
            s1 = Wh @ p["att"][:F]
            s2 = Wh @ p["att"][F:]
            if prep_t.gat_plan is not None:
                out = gat_attention_agg_hybrid(
                    prep_t.gat_plan, prep_t.gat_rest, s1, s2, Wh, 0.2,
                    prep_t.gat_rest.rows_sorted,
                )
            else:
                out = gat_attention_agg_fused(
                    prep_t.gat_bsr, s1, s2, Wh, 0.2
                )
            return jnp.sum(out**2) * 1e-9

        g = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(params, updates), opt_state)

    carry = (params, opt.init(params))
    tp = TwoPoint(train_step, carry, consts=(prep_t, X), k1=30, k2=180)
    sec_t = float(np.median([tp.estimate() for _ in range(3)]))
    from sgracex1_tpu.utils.roofline import cost_flash_gat_bwd

    # the step is fwd + fused two-pass backward (X@W, the score matvecs,
    # and Adam are <2% of the modeled time at these shapes)
    Bt = prep_t.gat_bsr
    cht = (
        prep_t.gat_plan.num_rest_chunks
        if prep_t.gat_plan is not None else 0
    )
    rl_t = (
        cost_flash_gat(Bt, F, n_chunks=cht) + cost_flash_gat_bwd(Bt, F)
    ).roofline(sec_t)
    log(
        f"pubmed flash GAT train step (fwd+bwd+Adam): {sec_t*1e3:.4f} ms "
        f"({adj.nnz/sec_t/1e6:.0f} M edges/s, SOL {rl_t['pct_sol']}% of "
        f"{rl_t['sol_bound']})"
    )
    EXTRA["pubmed_gat_train_step_ms"] = round(sec_t * 1e3, 4)
    EXTRA["pubmed_gat_train_step_pct_sol"] = rl_t["pct_sol"]

    # batched heads: H=4 in ONE kernel (the r2 marquee change, on-chip)
    H = 4
    WhH = jax.device_put(rng.standard_normal((N, H, F)).astype(np.float32))
    s1H = jax.device_put(rng.standard_normal((N, H)).astype(np.float32))
    s2H = jax.device_put(rng.standard_normal((N, H)).astype(np.float32))

    tp = TwoPoint(step, WhH, consts=(prep, s1H, s2H), k1=50, k2=300)
    sec_h = float(np.median([tp.estimate() for _ in range(3)]))
    log(
        f"pubmed flash GAT fwd H=4 batched: {sec_h*1e3:.4f} ms "
        f"({adj.nnz*H/sec_h/1e6:.0f} M edge-heads/s)"
    )
    EXTRA["pubmed_flash_gat_h4_ms"] = round(sec_h * 1e3, 4)


def phase_powerlaw_1m():
    """>=2^20-node power-law aggregation on the auto-chosen sparse backend."""
    import jax
    import jax.numpy as jnp

    from sgracex1_tpu.graph.datasets import powerlaw_node_classification
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.graph.reorder import degree_order, permute_graph
    from sgracex1_tpu.ops.dispatch import prepare_adjacency, agg_matmul

    t0 = time.time()
    n = 1 << 20
    data = powerlaw_node_classification(
        n=n, avg_degree=16, num_features=8, seed=0
    )
    A = sym_norm(data.edge_index, data.num_nodes)
    # hub-clustering degree sort: packs hub edges into dense MXU tiles for
    # the hybrid split (the framework's documented power-law recipe). The
    # feature matrix below is generated directly in the permuted order.
    A, _ = permute_graph(A, degree_order(A))
    gen_s = time.time() - t0
    log(f"powerlaw graph: n={n} nnz={A.nnz} (gen+degsort {gen_s:.0f}s)")
    EXTRA["powerlaw_1m_gen_s"] = round(gen_s, 1)
    t0 = time.time()
    prep = prepare_adjacency(A, method="auto", dense_max_bytes=0)
    log(
        f"powerlaw backend: {prep.kind}"
        + (
            f" (tiles={prep.bsr.num_tiles} tb={prep.bsr.tb},"
            f" rest={prep.rest.nnz if prep.rest is not None else 0} edges)"
            if prep.kind == "hybrid"
            else ""
        )
        + f"  (prepare {time.time()-t0:.0f}s)"
    )
    EXTRA["powerlaw_1m_prepare_s"] = round(time.time() - t0, 1)
    if prep.fused is not None:
        EXTRA["powerlaw_1m_rest_chunks"] = int(prep.fused.num_rest_chunks)
    _STASH["powerlaw_A"] = A  # reused by the int8 phase
    key = jax.random.PRNGKey(0)
    # bf16 features: the production dtype at this scale (the 2^21+ scale
    # sweep requires it for capacity; P=128 bf16 is the documented fast
    # config). The f32 secondary below quantifies the input-cast pass.
    H = jax.random.normal(key, (A.n_cols, 128), jnp.bfloat16)

    def step(h, prep):
        out = agg_matmul(prep, h)
        return h + out * jnp.asarray(1e-12, h.dtype)

    tp = TwoPoint(step, H, consts=(prep,), k1=4, k2=24)
    sec = float(np.median([tp.estimate(reps=5) for _ in range(3)]))
    eps = A.nnz / sec
    from sgracex1_tpu.utils.roofline import cost_for_prep

    rl = cost_for_prep(prep, 128, h_itemsize=2).roofline(sec)
    log(
        f"powerlaw 1M-node agg ({prep.kind}, bf16): {sec*1e3:.3f} ms  "
        f"({eps/1e6:.0f} M edges/s, {rl['pct_roofline']}% of "
        f"{rl['bound']} roof; SOL {rl['pct_sol']}% of {rl['sol_bound']}; "
        f"VPU {rl['pct_vpu']}% HBM {rl['pct_hbm']}% MXU {rl['pct_mxu']}%)"
    )
    # secondary: f32 features (adds the in-pipeline f32 -> bf16 cast pass)
    H32 = jax.random.normal(key, (A.n_cols, 128), jnp.float32)
    tp32 = TwoPoint(step, H32, consts=(prep,), k1=4, k2=24)
    sec32 = float(tp32.estimate(reps=5))
    EXTRA["powerlaw_1m_agg_f32_ms"] = round(sec32 * 1e3, 3)
    log(f"powerlaw 1M-node agg (f32 features): {sec32*1e3:.3f} ms "
        f"({A.nnz/sec32/1e6:.0f} M edges/s)")
    EXTRA["powerlaw_1m_nnz"] = int(A.nnz)
    EXTRA["powerlaw_1m_backend"] = prep.kind
    if prep.bsr is not None:
        EXTRA["powerlaw_1m_tiles"] = (
            f"{prep.bsr.num_tiles}x{prep.bsr.tb} "
            f"{prep.bsr.tiles.dtype}[{prep.bsr.tiles.shape[-1]}]"
        )
    EXTRA["powerlaw_1m_agg_ms"] = round(sec * 1e3, 3)
    EXTRA["powerlaw_1m_medges_s"] = round(eps / 1e6, 1)
    EXTRA["powerlaw_1m_pct_roofline"] = rl["pct_roofline"]
    EXTRA["powerlaw_1m_bound"] = rl["bound"]
    EXTRA["powerlaw_1m_pct_sol"] = rl["pct_sol"]
    EXTRA["powerlaw_1m_sol_bound"] = rl["sol_bound"]

    # full GCN-layer training step at 1M nodes: fwd + transposed-tile
    # backward + Adam — the reference's accb capability (sgrace.py:701-878)
    # at a scale the reference cannot touch (its on-chip cap is N <= 6144)
    import optax

    rngk = jax.random.PRNGKey(1)
    W = jax.random.normal(rngk, (128, 128), jnp.float32) * 0.05
    opt = optax.adam(1e-3)

    def train_step(carry, prep, X):
        W, opt_state = carry

        def loss_fn(w):
            out = agg_matmul(prep, jnp.dot(X, w))
            return jnp.sum(out**2) * 1e-12

        g = jax.grad(loss_fn)(W)
        updates, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(W, updates), opt_state)

    carry = (W, opt.init(W))
    tp = TwoPoint(train_step, carry, consts=(prep, H), k1=3, k2=18)
    sec_t = float(np.median([tp.estimate(reps=5) for _ in range(3)]))
    log(
        f"powerlaw 1M-node GCN train step (fwd+bwd+Adam): {sec_t*1e3:.3f} ms"
        f"  ({A.nnz/sec_t/1e6:.0f} M edges/s)"
    )
    EXTRA["powerlaw_1m_train_step_ms"] = round(sec_t * 1e3, 3)

    # flash-GAT attention at the same scale — a GAT the reference cannot
    # express (its on-chip cap is N <= 6144). The r5 HYBRID attention
    # path: dense hub tiles + remainder chunk steps in one kernel
    # (chooser-picked split), exact row softmax over all edges.
    from sgracex1_tpu.ops.dispatch import _choose_flash_plan
    from sgracex1_tpu.ops.flash_gat import gat_attention_agg_hybrid

    t0 = time.time()
    prep_g = prepare_adjacency(A, method="xla", for_gat=True)
    # whole prep rides as a jit ARGUMENT: every leaf must be device-
    # resident or the host COO re-uploads per timed call
    prep_g = jax.device_put(prep_g)
    gat_tb = prep_g.gat_bsr.tb
    hybrid_gat = prep_g.gat_plan is not None
    log(f"1M flash plan: {prep_g.gat_bsr.num_tiles} x tb={gat_tb}"
        + (f" + {prep_g.gat_plan.num_chunks} chunks"
           f" ({prep_g.gat_rest.nnz} rest edges)" if hybrid_gat else
           " (full cover)")
        + f" ({time.time()-t0:.0f}s build)")
    F = 32
    Whg = jax.random.normal(jax.random.PRNGKey(2), (A.n_rows, F))
    s1g = jax.random.normal(jax.random.PRNGKey(3), (A.n_rows,))
    s2g = jax.random.normal(jax.random.PRNGKey(4), (A.n_rows,))

    if hybrid_gat:
        def gat_step(wh, prep_g, s1g, s2g):
            o = gat_attention_agg_hybrid(
                prep_g.gat_plan, prep_g.gat_rest, s1g, s2g, wh, 0.2,
                True,
            )
            return wh + o[: wh.shape[0]] * 1e-12
    else:
        from sgracex1_tpu.ops.flash_gat import flash_gat_forward

        def gat_step(wh, prep_g, s1g, s2g):
            o = flash_gat_forward(prep_g.gat_bsr, s1g, s2g, wh)
            return wh + o[: wh.shape[0]] * 1e-12

    tp = TwoPoint(gat_step, Whg, consts=(prep_g, s1g, s2g), k1=2, k2=12)
    sec_g = float(np.median([tp.estimate(reps=5) for _ in range(3)]))
    log(
        f"powerlaw 1M flash GAT fwd "
        f"({'hybrid ' if hybrid_gat else ''}tb={gat_tb}): "
        f"{sec_g*1e3:.2f} ms ({A.nnz/sec_g/1e6:.0f} M edges/s)"
    )
    EXTRA["powerlaw_1m_gat_fwd_ms"] = round(sec_g * 1e3, 2)
    EXTRA["powerlaw_1m_gat_tb"] = gat_tb
    EXTRA["powerlaw_1m_gat_hybrid"] = hybrid_gat

    # full GAT train step at 1M: fwd + merged-stats hybrid backward +
    # Adam on (W, att) — r4's weakest headline (201 ms) re-measured on
    # the hybrid path
    if hybrid_gat and remaining() > 180:
        Xg = jax.random.normal(
            jax.random.PRNGKey(7), (A.n_rows, 128), jnp.bfloat16
        )
        Wg = jax.random.normal(
            jax.random.PRNGKey(8), (128, F), jnp.float32) * 0.05
        attg = jax.random.normal(
            jax.random.PRNGKey(9), (2 * F,), jnp.float32) * 0.1
        optg = optax.adam(1e-3)

        def gat_train(carry, prep_g, Xg):
            (W, att), opt_state = carry

            def loss_fn(p):
                W, att = p
                Wh = jnp.dot(Xg, W.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
                s1 = Wh @ att[:F]
                s2 = Wh @ att[F:]
                out = gat_attention_agg_hybrid(
                    prep_g.gat_plan, prep_g.gat_rest, s1, s2, Wh, 0.2,
                    True,
                )
                return jnp.sum(out**2) * 1e-12

            g = jax.grad(loss_fn)((W, att))
            updates, opt_state = optg.update(g, opt_state)
            return (optax.apply_updates((W, att), updates), opt_state)

        carry_g = ((Wg, attg), optg.init((Wg, attg)))
        tp = TwoPoint(gat_train, carry_g, consts=(prep_g, Xg), k1=2, k2=8)
        sec_gt = float(np.median([tp.estimate(reps=5) for _ in range(3)]))
        log(
            f"powerlaw 1M GAT train step (hybrid fwd+bwd+Adam): "
            f"{sec_gt*1e3:.2f} ms ({A.nnz/sec_gt/1e6:.0f} M edges/s)"
        )
        EXTRA["powerlaw_1m_gat_train_step_ms"] = round(sec_gt * 1e3, 2)


def phase_int8():
    """Quantized-engine perf evidence — the reference's headline capability
    (sgrace.py:334-365,1296-1845) as driver-captured numbers:

    - pubmed int8 flash-GAT forward (integer X@W + score matvecs feeding
      the flash tile kernel) vs the float flash number;
    - pubmed full-integer 2-layer GCN forward (both matmuls int8 on the
      MXU, shifted-int8 value tiles, no dense N x N);
    - 1M-node int8 value-tile aggregation on the hybrid split's dense
      part (bsr_spmm_int8) vs the packed-mask bf16 number — the
      adjacency-quantized regime where values are int8, masks can't
      apply.
    """
    import jax
    import jax.numpy as jnp

    from sgracex1_tpu.graph.reorder import rcm_order, permute_graph
    from sgracex1_tpu.ops.bsr import bsr_mask_from_sparse, bsr_spmm_int8
    from sgracex1_tpu.quant import int8 as qi8
    from sgracex1_tpu.quant.calibration import CalibrationTable

    adj = load_pubmed_adj()
    adj, _ = permute_graph(adj, rcm_order(adj))
    rng = np.random.default_rng(0)
    N, F_in, F = adj.n_rows, 64, 32

    # --- int8 flash GAT forward on pubmed ---
    X = rng.uniform(0, 1, (N, F_in)).astype(np.float32)
    W = rng.uniform(-0.5, 0.5, (F_in, F)).astype(np.float32)
    att = rng.uniform(-0.5, 0.5, (2 * F, 1)).astype(np.float32)
    c_x = qi8.QuantConstants(
        s_o=1.0, s=1.0 / 255.0, z=0, qbits=8, signed=False
    )
    c_w = qi8.QuantConstants(
        s_o=1.0, s=0.5 / 127.0, z=0, qbits=8, signed=True
    )
    layer = qi8.freeze_gat_layer(W, att, c_x, c_w, h_absmax=8.0)
    xs = qi8.quantize_unsigned_shifted(jnp.asarray(X), c_x)
    B = bsr_mask_from_sparse(adj, tb=1024)

    def gat_step(x, B, layer):
        acc, _ = qi8.int8_gat_layer_flash(layer, B, x)
        return (x.astype(jnp.float32) + acc[:, :1] * 1e-12).astype(x.dtype)

    tp = TwoPoint(gat_step, xs, consts=(B, layer), k1=60, k2=360)
    sec = float(np.median([tp.estimate() for _ in range(3)]))
    log(f"pubmed int8 flash GAT fwd (F_in=64->F=32): {sec*1e3:.4f} ms "
        f"({adj.nnz/sec/1e6:.0f} M edges/s)")
    EXTRA["int8_pubmed_flash_gat_ms"] = round(sec * 1e3, 4)
    if EXTRA.get("pubmed_flash_gat_ms"):
        EXTRA["int8_flash_vs_float"] = round(
            EXTRA["pubmed_flash_gat_ms"] / (sec * 1e3), 2
        )

    # --- full-integer 2-layer GCN on pubmed ---
    h1, p = 32, 16
    W1 = rng.uniform(-0.5, 0.5, (F_in, h1)).astype(np.float32)
    W2 = rng.uniform(-0.5, 0.5, (h1, p)).astype(np.float32)
    amax = qi8.collect_amax_gcn2_sparse(adj, X, W1, W2)
    cal = CalibrationTable.for_qbits(
        8,
        dict(w_min=-0.5, w_max=0.5, w_min2=-0.5, w_max2=0.5,
             f_min=0.0, f_max=1.0, a_min=0.0,
             a_max=float(np.asarray(adj.vals).max()) or 1.0),
    )
    net = qi8.freeze_gcn2_sparse(W1, W2, adj, cal, tb=512, **amax)
    xs2 = qi8.quantize_unsigned_shifted(jnp.asarray(X), cal.features)

    def gcn_step(x, net):
        out = qi8.int8_gcn2_sparse_forward(net, x)
        return (x.astype(jnp.float32) + out[:, :1] * 1e-12).astype(x.dtype)

    tp = TwoPoint(gcn_step, xs2, consts=(net,), k1=60, k2=360)
    sec2 = float(np.median([tp.estimate() for _ in range(3)]))
    log(f"pubmed full-integer 2-layer GCN fwd: {sec2*1e3:.4f} ms "
        f"({2*adj.nnz/sec2/1e6:.0f} M edge-layers/s)")
    EXTRA["int8_pubmed_gcn2_ms"] = round(sec2 * 1e3, 4)

    # --- 1M-node FULL-integer hybrid aggregation (adjacency-quantized):
    # shifted-int8 dense tiles + quantized remainder chunks in one fused
    # schedule — every edge of the graph, exact int32 out ---
    A = _STASH.get("powerlaw_A")
    if A is None:
        log("int8 1M: powerlaw graph unavailable (phase 3 skipped)")
        return
    c_a = qi8.QuantConstants(
        s_o=1.0,
        s=max(float(np.asarray(A.vals[: A.nnz]).max()), 1e-8) / 255.0,
        z=0, qbits=8, signed=False,
    )
    t0 = time.time()
    plan8 = qi8.prepare_int8_hybrid(A, c_a, tb=1024)
    log(f"1M int8 hybrid build: {time.time()-t0:.0f}s "
        f"({plan8.B.num_tiles} tiles + {plan8.num_rest_chunks} chunks)")
    Hq = jax.device_put(
        (rng.integers(-127, 127, (A.n_cols, 128))).astype(np.int8)
    )

    def agg8_step(h, plan8):
        acc = qi8.int8_hybrid_agg(plan8, h)
        return (h.astype(jnp.int32) + acc[: h.shape[0], :] // (1 << 30)).astype(
            jnp.int8
        )

    tp = TwoPoint(agg8_step, Hq, consts=(plan8,), k1=4, k2=24)
    sec3 = float(np.median([tp.estimate(reps=5) for _ in range(3)]))
    log(f"powerlaw 1M FULL-int8 hybrid agg ({plan8.B.num_tiles} tiles + "
        f"{plan8.num_rest_chunks} chunks): "
        f"{sec3*1e3:.3f} ms ({A.nnz/sec3/1e6:.0f} M edges/s)")
    EXTRA["int8_1m_agg_ms"] = round(sec3 * 1e3, 3)
    if EXTRA.get("powerlaw_1m_agg_ms"):
        EXTRA["int8_1m_vs_bf16"] = round(
            EXTRA["powerlaw_1m_agg_ms"] / (sec3 * 1e3), 2
        )


def emit(rc: int):
    if RESULT:
        RESULT["extra"] = EXTRA
        print(json.dumps(RESULT))
        sys.stdout.flush()
    import os

    os._exit(rc)  # a stuck relay call in a daemon thread can't be joined


def main():
    import jax

    from sgracex1_tpu.utils.compcache import enable_persistent_cache
    from sgracex1_tpu.utils.watchdog import device_alive_retry

    # compiles (not runs) dominate the wall time of a cold capture through
    # the relay; the persistent cache makes repeat captures start warm
    enable_persistent_cache()
    log("devices:", jax.devices())
    # Relay outages are the #1 way a round loses its perf record (it
    # happened in round 1 and again while developing round 2): keep probing
    # as long as the deadline still fits the headline phase, rather than
    # aborting after a fixed 3 attempts. Each probe gets its own 60 s
    # deadline; hung probes run in daemon threads and cannot wedge us.
    alive = False
    while remaining() > 300.0:
        if device_alive_retry(attempts=1, seconds=60.0):
            alive = True
            break
        log(f"liveness probe failed; retrying ({remaining():.0f}s left)")
        time.sleep(15.0)
    if not alive:
        log("ERROR: device liveness probes exhausted the deadline "
            "(relay outage)")
        emit(1)

    phases = [
        ("citeseer", phase_citeseer, 240.0),
        ("pubmed_flash_gat", phase_pubmed_flash_gat, 360.0),
        ("powerlaw_1m", phase_powerlaw_1m, 480.0),
        ("int8", phase_int8, 240.0),
    ]
    for name, fn, budget in phases:
        if remaining() < budget * 0.5:
            log(f"SKIP {name}: only {remaining():.0f}s of deadline left")
            continue
        try:
            from sgracex1_tpu.utils.watchdog import run_with_deadline

            run_with_deadline(fn, min(budget, max(remaining() - 10, 1)))
        except Exception as e:  # noqa: BLE001 — phase isolation
            log(f"ERROR in phase {name}: {type(e).__name__}: {e}")
    emit(0 if RESULT else 1)


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001
        log(f"FATAL: {type(e).__name__}: {e}")
        emit(1)
