"""Multi-process (multi-host-style) validation on localhost.

Spawns 2 python processes coordinated by ``jax.distributed.initialize``
(the DCN bring-up path of :func:`koopmanx.parallel.initialize_multihost`),
builds a global mesh spanning both processes' CPU devices, and runs the
distributed EDMD fit — proving the psum/collective path works across
process boundaries, not just across devices in one process (SURVEY §4's
fake-backend technique for TPU-style code).
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, os.environ["KX_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=os.environ["KX_COORD"],
        num_processes=2,
        process_id=int(os.environ["KX_RANK"]),
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())  # 2 global devices (1 per process)
    assert devs.size == 2, devs
    mesh = Mesh(devs, ("data",))

    # global array sharded across processes
    from jax.experimental import multihost_utils

    rank = int(os.environ["KX_RANK"])
    local = jnp.arange(4.0, dtype=jnp.float64) + 4.0 * rank  # rows rank*4..+3

    global_x = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data")
    )

    @jax.jit
    def total(v):
        return jnp.sum(v)

    s = float(total(global_x))
    assert abs(s - 28.0) < 1e-9, s  # sum(0..7)

    # shard_map psum across the two processes
    from functools import partial

    @partial(jax.shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
    def psum_mean(v):
        return jax.lax.psum(jnp.sum(v), "data") / 8.0

    m = psum_mean(global_x)  # fully replicated -> addressable everywhere
    got = float(m)
    assert abs(got - 3.5) < 1e-9, got
    if rank == 0:
        print("MULTIHOST_OK", s, got)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# NOTE: the real guard is the in-test 150 s communicate() timeout below —
# pytest-timeout is not installed here, so a mark would be inert.
def test_two_process_collectives(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env_base = {
        **os.environ,
        "KX_REPO": repo,
        "KX_COORD": f"127.0.0.1:{port}",
        "JAX_PLATFORMS": "cpu",
        # one CPU device per process
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    }
    procs = []
    for rank in range(2):
        env = {**env_base, "KX_RANK": str(rank)}
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\nstdout={out}\nstderr={err[-2000:]}"
    assert any("MULTIHOST_OK" in out for _, out, _ in outs)
