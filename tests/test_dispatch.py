"""Aggregation backend dispatch tests (dense / pallas / xla parity).

The pallas backend runs in interpret mode automatically on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.ops.dispatch import prepare_adjacency, agg_matmul


def _graph(rng, n=260, density=0.05):
    mat = sp.random(n, n, density=density, format="csr", random_state=21).astype(
        np.float32
    )
    mat.setdiag(0.5)
    return SparseMatrix.from_scipy(mat), mat


@pytest.mark.parametrize("method", ["dense", "xla", "pallas"])
def test_agg_matmul_parity(rng, method):
    A, mat = _graph(rng)
    kw = dict(rb=128, cb=128) if method == "pallas" else {}
    prep = prepare_adjacency(A, method=method, **kw)
    H = rng.standard_normal((A.n_cols, 128)).astype(np.float32)
    out = np.asarray(agg_matmul(prep, jnp.asarray(H)))
    np.testing.assert_allclose(out, mat @ H, rtol=5e-2, atol=5e-2)


def test_pallas_backward_matches_transpose(rng):
    A, mat = _graph(rng, n=200)
    prep = prepare_adjacency(A, method="pallas", rb=128, cb=128)
    H = jnp.asarray(rng.standard_normal((A.n_cols, 128)).astype(np.float32))
    v = rng.standard_normal((A.n_rows, 128)).astype(np.float32)
    g = jax.grad(lambda h: jnp.vdot(agg_matmul(prep, h), v))(H)
    np.testing.assert_allclose(np.asarray(g), mat.T @ v, rtol=5e-2, atol=5e-2)


def test_auto_selects_dense_for_small(rng):
    A, _ = _graph(rng)
    prep = prepare_adjacency(A, method="auto")
    assert prep.kind == "dense"
    assert prep.dense is not None


def test_dense_backward(rng):
    A, mat = _graph(rng)
    prep = prepare_adjacency(A, method="dense", dense_dtype=jnp.float32)
    H = jnp.asarray(rng.standard_normal((A.n_cols, 64)).astype(np.float32))
    v = rng.standard_normal((A.n_rows, 64)).astype(np.float32)
    g = jax.grad(lambda h: jnp.vdot(agg_matmul(prep, h), v))(H)
    np.testing.assert_allclose(np.asarray(g), mat.T @ v, rtol=1e-4, atol=1e-4)


def test_prepared_adjacency_under_jit(rng):
    A, mat = _graph(rng)
    prep = prepare_adjacency(A, method="dense")
    H = jnp.asarray(rng.standard_normal((A.n_cols, 32)).astype(np.float32))
    out = np.asarray(jax.jit(agg_matmul)(prep, H))
    np.testing.assert_allclose(out, mat @ H, rtol=5e-2, atol=5e-2)
