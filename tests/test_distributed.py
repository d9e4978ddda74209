"""Multi-host entry (parallel/distributed.py): a REAL 2-process CPU
cluster — coordinator on localhost, each process contributing 2 virtual
CPU devices — asserting initialize() wires jax.distributed, global_mesh
spans every process's devices, a cross-process psum sees all shards, and
is_primary gates exactly one writer.
"""
import socket
import subprocess
import sys
import textwrap

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_WORKER = textwrap.dedent(
    """
    import os, sys, json
    # 2 virtual CPU devices per process, CPU platform (the axon
    # sitecustomize would otherwise pick the tunneled TPU).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from neuma_tpu.parallel.distributed import (
        global_mesh, initialize, is_primary,
    )

    multi = initialize()  # resolves JAX_* env vars set by the test
    assert multi, "env-var resolution failed to initialize"

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    mesh = global_mesh(("dp",))
    assert mesh.devices.size == 4

    # Cross-process collective: each process fills ITS local shards
    # with (process_id + 1); psum over the mesh must see both.
    pid = jax.process_index()
    arr = jax.make_array_from_callback(
        (4,),
        NamedSharding(mesh, P("dp")),
        lambda idx: jnp.full((1,), float(pid + 1), jnp.float32),
    )

    from jax import shard_map

    total = jax.jit(
        shard_map(
            lambda x: jax.lax.psum(x, "dp"),
            mesh=mesh,
            in_specs=P("dp"),
            out_specs=P(),
        )
    )(arr)
    # shards: two from process 0 (1.0) + two from process 1 (2.0).
    total = float(jax.device_get(total.addressable_shards[0].data)[0])
    assert total == 6.0, total

    print(json.dumps({"pid": pid, "primary": is_primary(),
                      "psum": total}))
    """
)


def test_two_process_cpu_cluster(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PATH="/usr/bin:/bin",
        )
        import os

        for k in ("HOME", "PYTHONPATH", "LD_LIBRARY_PATH", "PATH"):
            if k in os.environ:
                env[k] = os.environ[k]
        env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get(
            "PYTHONPATH", ""
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                cwd=os.getcwd(),
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out.strip().splitlines()[-1])

    import json

    rows = sorted((json.loads(o) for o in outs), key=lambda r: r["pid"])
    assert [r["pid"] for r in rows] == [0, 1]
    assert [r["primary"] for r in rows] == [True, False]
    assert all(r["psum"] == 6.0 for r in rows)
