"""Multi-host initialization.

The reference's multi-process machinery (mp.spawn per GPU, NCCL process
groups, MASTER_ADDR/TCPStore rendezvous - reference: yogo/train.py:96-105,
152-159, 645-656) has no analog on a single TPU host: JAX is
single-controller and XLA drives all chips. Across hosts (TPU pods), the
only requirement is jax.distributed.initialize() before device use; this
module wraps that plus the env-var conventions.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods jax can also autodetect
    everything, in which case calling with no args is correct. Returns True
    if distributed mode was initialized, False for single-host runs.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _env_int("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        # TPU-pod autodetect: multi-worker TPU VMs export a comma-separated
        # TPU_WORKER_HOSTNAMES; there jax.distributed.initialize() discovers
        # the coordinator itself. A single-entry (or empty) value means one
        # worker - skipping (not erroring) keeps CPU/dev environments
        # working, where unconditional autodetect would raise or hang.
        if "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""):
            jax.distributed.initialize()
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def process_shard() -> tuple:
    """(process_index, process_count) for sharding host-side data loaders."""
    return jax.process_index(), jax.process_count()
