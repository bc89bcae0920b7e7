"""Device mesh construction.

The reference scales spatially inside one FPGA with FEA_THREADS/ADJ_THREADS
row-sharding (kernelMatrixmult_all.cpp:3060-3072,3439-3452); the TPU-native
replacement is a 1D device mesh over which graph rows/edges are sharded, with
XLA collectives riding ICI. Multi-host extends the same mesh over DCN via
jax.distributed (same code path — GSPMD is host-count agnostic).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "graph"
) -> Mesh:
    """1D mesh over the first n_devices local devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))
