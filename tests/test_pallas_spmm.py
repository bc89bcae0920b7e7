"""Pallas one-hot SpMM kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.ops.pallas_spmm import plan_spmm, spmm_pallas


def _case(rng, n, m, density, p=128):
    mat = sp.random(
        n, m, density=density, format="csr", random_state=int(rng.integers(1 << 30))
    ).astype(np.float32)
    A = SparseMatrix.from_scipy(mat)
    H = rng.standard_normal((m, p)).astype(np.float32)
    return A, mat, H


@pytest.mark.parametrize(
    "n,m,density",
    [(300, 300, 0.05), (1500, 900, 0.01), (257, 129, 0.3), (100, 100, 0.0)],
)
def test_pallas_spmm_matches_scipy(rng, n, m, density):
    A, mat, H = _case(rng, n, m, density)
    plan = plan_spmm(A, rb=256, cb=256, be=1024)
    Hp = jnp.asarray(np.pad(H, ((0, plan.cb - m % plan.cb if m % plan.cb else 0), (0, 0))))
    out = np.asarray(spmm_pallas(plan, Hp, interpret=True))
    np.testing.assert_allclose(out, mat @ H, rtol=5e-2, atol=5e-2)


def test_pallas_spmm_multiblock_accumulation(rng):
    """Rows spanning several column blocks accumulate correctly."""
    n = 200
    mat = sp.random(n, n, density=0.15, format="csr", random_state=8).astype(
        np.float32
    )
    A = SparseMatrix.from_scipy(mat)
    H = rng.standard_normal((n, 128)).astype(np.float32)
    plan = plan_spmm(A, rb=128, cb=128, be=1024)
    out = np.asarray(spmm_pallas(plan, jnp.asarray(H), interpret=True))
    np.testing.assert_allclose(out, mat @ H, rtol=5e-2, atol=5e-2)


def test_plan_covers_all_edges(rng):
    A, mat, _ = _case(rng, 500, 400, 0.03)
    plan = plan_spmm(A, rb=256, cb=256, be=1024)
    assert int((np.asarray(plan.val) != 0).sum()) == (mat.toarray() != 0).sum()
    # groups ordered by row block
    rbs = np.asarray(plan.tile_rb)
    assert (np.diff(rbs) >= 0).all()
