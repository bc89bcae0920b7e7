"""Host<->device transfer utilities.

The TPU relay in this environment caps single-transfer request sizes (HTTP
413 above a few hundred MB) and has high per-transfer latency, so large host
arrays are shipped in chunks and concatenated on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_DEFAULT_CHUNK_BYTES = 64 << 20  # 64 MB


def chunked_device_put(
    x: np.ndarray, *, chunk_bytes: int = _DEFAULT_CHUNK_BYTES, device=None
) -> jax.Array:
    """device_put a large host array in row chunks."""
    x = np.asarray(x)
    if x.nbytes <= chunk_bytes or x.ndim == 0:
        return jax.device_put(x, device)
    rows_per_chunk = max(1, chunk_bytes // max(x[0:1].nbytes, 1))
    parts = [
        jax.device_put(x[i : i + rows_per_chunk], device)
        for i in range(0, x.shape[0], rows_per_chunk)
    ]
    return jnp.concatenate(parts, axis=0)
