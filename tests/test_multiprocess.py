"""Real 2-process jax.distributed execution (CPU + gloo collectives).

The rest of the suite exercises the distributed code paths on a
single-process virtual mesh; this test launches TWO separate Python
processes that join one cluster via ``init_multihost`` (2 procs x 2
local CPU devices = a 4-device global mesh), run a halo-exchange GCN
layer forward + backward, and must match the single-process reference
bit-for-tolerance. Covers coordinator bring-up, cross-process
collectives (the all_to_all halo exchange spans the process boundary),
and multi-process array construction."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_halo_gcn_matches_single(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mp_worker.py")
    out_path = str(tmp_path / "mp_out.npz")
    port = _free_port()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # drop any inherited single-process device-count forcing from the
    # parent test session
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), out_path],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    got = np.load(out_path)
    n = int(got["n"])

    # single-process reference (this process, no distribution)
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.ops.spmm import spmm

    rng = np.random.default_rng(0)
    f, h = 12, 8
    m = n * 6
    ei = np.unique(
        np.stack([rng.integers(0, n, m), rng.integers(0, n, m)]), axis=1
    )
    A = sym_norm(ei, n)
    X = rng.standard_normal((n, f)).astype(np.float32)
    W = jnp.asarray(rng.standard_normal((f, h)).astype(np.float32) * 0.3)

    def single(xv, Wv):
        return jnp.maximum(spmm(A, jnp.dot(xv, Wv)), 0.0)

    expect = np.asarray(single(jnp.asarray(X), W))
    np.testing.assert_allclose(
        got["out"][:n], expect, rtol=1e-5, atol=1e-5
    )

    def loss(xv, Wv):
        return jnp.sum(single(xv, Wv) ** 2)

    gx, gW = jax.grad(loss, argnums=(0, 1))(jnp.asarray(X), W)
    np.testing.assert_allclose(
        got["gx"][:n], np.asarray(gx), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        got["gW"], np.asarray(gW), rtol=1e-4, atol=1e-5
    )
