"""Multi-device scaling efficiency of the distributed GNN layer.

On CI this runs on a virtual CPU mesh (XLA_FLAGS=
--xla_force_host_platform_device_count=N); on a TPU slice the same code
measures real ICI scaling. Reports edges/s per device count and scaling
efficiency vs 1 device — the BASELINE.md target is >= 80%.
"""

import sys, os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from benchmarks.common import timed_loop, header
from sgracex1_tpu.graph.normalize import sym_norm
from sgracex1_tpu.parallel.mesh import make_mesh
from sgracex1_tpu.parallel.partition import partition_graph, pad_nodes
from sgracex1_tpu.parallel.spmm_dist import dist_gnn_layer
from sgracex1_tpu.parallel.halo import build_halo, dist_gnn_layer_halo


def bench(n_devices: int, data, base_eps=None, *, halo=False):
    from jax.sharding import NamedSharding, PartitionSpec as P

    edge_index, n, F, Wd = data
    mesh = make_mesh(n_devices)
    A = sym_norm(edge_index, n)
    if halo:
        G, n_pad = build_halo(A, n_devices)
        layer = dist_gnn_layer_halo
    else:
        G, n_pad = partition_graph(A, n_devices)
        layer = dist_gnn_layer
    sh = NamedSharding(mesh, P("graph"))
    rng = np.random.default_rng(0)
    x = jax.device_put(
        pad_nodes(rng.standard_normal((n, F)).astype(np.float32), n_pad), sh
    )
    G = jax.device_put(G, sh)
    W = jax.device_put(Wd)

    def step(xv):
        out = layer(mesh, G, xv, W, relu=False)
        return xv + out[:, : xv.shape[1]] * 1e-12

    sec = timed_loop(step, x, iters=20)
    eps = A.nnz / sec
    tag = "halo" if halo else "gthr"
    eff = "" if base_eps is None else f"  eff {eps / (base_eps * n_devices) * 100:5.1f}%"
    print(f"  {n_devices} dev [{tag}]: {sec * 1e3:8.3f} ms  {eps / 1e6:8.1f} M edges/s{eff}")
    return eps


def main():
    n, F, H = 16384, 128, 128
    rng = np.random.default_rng(1)
    e = n * 16
    edge_index = np.stack(
        [rng.integers(0, n, e), rng.integers(0, n, e)]
    ).astype(np.int64)
    W = rng.standard_normal((F, H)).astype(np.float32) * 0.1

    header(f"distributed GNN layer scaling (N={n}, E~{e}, F={F})")
    if jax.devices()[0].platform == "cpu":
        print(
            "  NOTE: virtual CPU mesh — all devices share one physical CPU,"
            " so 'eff' measures sharding OVERHEAD only; real scaling"
            " efficiency requires a physical multi-chip slice."
        )
    base = bench(1, (edge_index, n, F, W))
    for d in (2, 4, 8):
        if d <= jax.device_count():
            bench(d, (edge_index, n, F, W), base)
            bench(d, (edge_index, n, F, W), base, halo=True)

    # Predicted ICI scaling on real v5e hardware: exact collective bytes per
    # layer (a property of the halo plan) / ICI bandwidth vs the roofline
    # compute split. This is the falsifiable multi-chip claim this
    # environment (one chip) can make — see BASELINE.md "Scaling".
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.parallel.comm_model import (
        allgather_comm,
        halo_comm,
        predicted_efficiency,
    )
    from sgracex1_tpu.parallel.halo import build_halo
    from sgracex1_tpu.utils.roofline import cost_xla_edges

    A = sym_norm(edge_index, n)
    # single-chip compute time: HBM-bound ideal for the edge path (upper
    # bound on comm impact — a slower kernel only hides comm better)
    comp = cost_xla_edges(A.nnz, n, H)
    t1 = comp.hbm_bytes / 819e9
    header("predicted ICI efficiency on v5e (comm-volume model)")
    for d in (2, 4, 8, 16):
        G, n_pad = build_halo(A, d)
        for name, c in (
            ("halo", halo_comm(G, F=H, backward=True)),
            ("gthr", allgather_comm(n_pad, F=H, S=d, backward=True)),
        ):
            p = predicted_efficiency(t1, d, c)
            print(
                f"  {d:2d} dev [{name}]: comm {c.bytes_out / 1e6:7.2f} MB"
                f"  t_comp {p['t_comp_us']:8.1f} us"
                f"  t_comm {p['t_comm_us']:8.1f} us"
                f"  eff {p['efficiency'] * 100:5.1f}%"
            )


if __name__ == "__main__":
    main()
