"""ICI communication-volume model for the distributed layers.

The BASELINE.md scaling target (>= 80% edges/s efficiency at N devices)
cannot be measured in this environment — one physical chip is attached, and
a virtual CPU mesh measures collective *overhead*, not ICI bandwidth. What
can be stated honestly is a first-order comm model: exact bytes each
collective moves per layer (a property of the halo plan, not the hardware),
divided by ICI bandwidth, against the roofline compute time
(:mod:`sgracex1_tpu.utils.roofline`). This replaces the unvalidated
percentage with a falsifiable prediction, the way the scaling-book recipe
prescribes (mesh -> shardings -> collectives -> count the bytes).

The reference's analogue is its crossbar/DMA sizing arithmetic
(``kernelMatrixmult_all.cpp`` C-buffer replication; SURVEY.md §2.5) — the
FPGA design also had to budget boundary traffic against fabric bandwidth.

TPU v5e ICI: 4 links/chip at 400 Gbps aggregate 1600 Gbps ~ 200 GB/s per
chip (2D torus). A 1D ``all_to_all`` over a mesh axis rides one link pair
per neighbor; the defaults model the aggregate case and are constructor
parameters for other topologies.
"""

from __future__ import annotations

import dataclasses

V5E_ICI_BYTES_S = 200e9  # per-chip aggregate, 2D torus
V5E_ICI_LINK_BYTES_S = 50e9  # one link direction


@dataclasses.dataclass(frozen=True)
class CommCost:
    """Per-device, per-layer-invocation ICI traffic in bytes."""

    bytes_out: float  # sent over ICI by each device
    note: str = ""

    def seconds(self, ici_bytes_s: float = V5E_ICI_BYTES_S) -> float:
        return self.bytes_out / ici_bytes_s

    def __add__(self, other: "CommCost") -> "CommCost":
        return CommCost(
            self.bytes_out + other.bytes_out,
            "+".join(n for n in (self.note, other.note) if n),
        )


def halo_comm(G, F: int, *, itemsize: int = 4, backward: bool = False) -> CommCost:
    """Boundary exchange of :class:`~sgracex1_tpu.parallel.halo.HaloGraph`.

    The forward ``all_to_all`` ships ``send_idx``-gathered rows [S, L, F];
    each device keeps its own slot, so (S-1)*L*F*itemsize crosses ICI.
    The backward transposes the collective (same volume back).
    """
    S, L = G.n_shards, G.halo_len
    per_pass = (S - 1) * L * F * itemsize
    return CommCost(
        float(per_pass * (2 if backward else 1)),
        note=f"halo S={S} L={L} F={F}",
    )


def allgather_comm(n_pad: int, F: int, S: int, *, itemsize: int = 4,
                   backward: bool = False) -> CommCost:
    """Replicated-H layer (``spmm_dist.dist_gnn_layer``): each device
    receives the other shards' rows — (S-1)/S * n_pad * F. The backward's
    ``psum``/reduce-scatter of the gathered cotangent moves the same volume."""
    per_pass = (S - 1) / S * n_pad * F * itemsize
    return CommCost(
        float(per_pass * (2 if backward else 1)),
        note=f"all-gather n={n_pad} F={F} S={S}",
    )


def predicted_efficiency(
    comp_sec_single: float,
    n_devices: int,
    comm: CommCost,
    *,
    ici_bytes_s: float = V5E_ICI_BYTES_S,
    overlap: float = 0.0,
) -> dict:
    """Scaling efficiency prediction: perfect 1/S compute split plus
    serialized (or partially overlapped) collective time.

    efficiency = T_1 / (S * T_S)  with  T_S = T_1/S + (1-overlap)*T_comm.
    """
    t_comp = comp_sec_single / n_devices
    t_comm = comm.seconds(ici_bytes_s) * (1.0 - min(max(overlap, 0.0), 1.0))
    t_step = t_comp + t_comm
    return dict(
        t_comp_us=round(t_comp * 1e6, 2),
        t_comm_us=round(t_comm * 1e6, 2),
        efficiency=round(t_comp / t_step, 4) if t_step > 0 else 1.0,
        comm_bytes=int(comm.bytes_out),
        note=comm.note,
    )


def scaling_table(
    comp_sec_single: float,
    comms: dict,
    *,
    ici_bytes_s: float = V5E_ICI_BYTES_S,
    overlap: float = 0.0,
) -> dict:
    """``{n_devices: CommCost}`` -> per-count efficiency predictions."""
    return {
        s: predicted_efficiency(
            comp_sec_single, s, c, ici_bytes_s=ici_bytes_s, overlap=overlap
        )
        for s, c in sorted(comms.items())
    }
