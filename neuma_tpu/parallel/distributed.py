"""Multi-host entry: ``jax.distributed`` initialization + global mesh.

New capability vs the reference (single-GPU, no distributed backend
anywhere — SURVEY.md section 5.8). On a TPU pod slice every host runs the
same program; ``initialize()`` wires the JAX distributed service so
``jax.devices()`` spans the slice (ICI) and DCN connects slices.

Usage from the apps (opt-in; single-process runs are untouched):

    from neuma_tpu.parallel.distributed import initialize, global_mesh
    initialize()                      # no-op off-cluster
    mesh = global_mesh(("dp", "vp"), (len(jax.devices()) // 2, 2))
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` when running multi-process.

    Resolution order: explicit args > the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``) > TPU-pod auto-detection (argless
    ``jax.distributed.initialize()``, which reads the TPU metadata
    server). Returns True if a multi-process runtime was initialized.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    # On Cloud TPU pods, an argless initialize autodetects topology.
    # Only engage when the worker list actually names MULTIPLE hosts —
    # single-host tunnels (e.g. TPU_WORKER_HOSTNAMES=localhost) need no
    # distributed runtime, and initializing after the backend is up
    # raises. Failures degrade to single-process rather than killing
    # the app.
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if "," in hosts or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
            return True
        except RuntimeError as e:  # backend already up / double init
            import warnings

            warnings.warn(
                f"jax.distributed auto-init skipped: {e}", RuntimeWarning
            )
    return False


def global_mesh(
    axis_names: Sequence[str] = ("dp",),
    axis_sizes: Optional[Tuple[int, ...]] = None,
):
    """A mesh over ALL devices in the (possibly multi-host) runtime.

    With ``axis_sizes=None`` a 1-axis mesh over every device is
    returned. Axis order convention: earlier axes change slowest — put
    the DCN-crossing axis (data parallel) first so inner axes
    (views/grid slabs) ride the ICI."""
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    if axis_sizes is None:
        axis_sizes = (devices.size,)
    assert int(np.prod(axis_sizes)) == devices.size, (
        f"mesh {axis_sizes} != {devices.size} devices"
    )
    return Mesh(devices.reshape(axis_sizes), tuple(axis_names))


def process_index() -> int:
    import jax

    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return process_index() == 0
