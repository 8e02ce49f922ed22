"""Multi-process (multi-host) runtime initialization.

TPU-native counterpart of the reference's ``misc.init_distributed_mode``
(misc.py:217-249): discover this process's rank/world from the launcher's
environment variables and initialize JAX's distributed runtime so
``jax.devices()`` spans all hosts and ``jax.process_index()`` /
``process_count()`` drive per-host data sharding.

Discovery order (the same launchers the reference supports, misc.py:218-233):
  1. explicit JAX vars:    COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID
  2. torchrun/env://:      MASTER_ADDR, MASTER_PORT, WORLD_SIZE, RANK
  3. OpenMPI:              OMPI_COMM_WORLD_SIZE / _RANK (+ MASTER_ADDR)
  4. SLURM:                SLURM_NTASKS / SLURM_PROCID (+ SLURM_STEP_NODELIST
                           first node or MASTER_ADDR)

On TPU pods none of this is needed — ``jax.distributed.initialize()`` with no
args discovers everything from the TPU metadata server; call
``maybe_initialize_distributed()`` anyway: it falls through to that path when
it detects a Cloud TPU environment.

Usage (every entry point, before touching jax.devices()):

    from dynamic_tuning_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()

Data flow after init: each process's loader shards by
``process_index/process_count`` (data/loader.py), per-host batches are
assembled into global arrays by ``mesh.shard_batch`` via
``jax.make_array_from_process_local_data``, gradients all-reduce over ICI/DCN
automatically under jit, and eval concat uses
``multihost_utils.process_allgather`` (train/runner.py).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple


def _first_slurm_node(nodelist: str) -> str:
    """First hostname of a SLURM nodelist ('n[1-4],m2' -> 'n1')."""
    head = nodelist.split(",")[0]
    if "[" in head:
        prefix, rng = head.split("[", 1)
        first = rng.rstrip("]").split(",")[0].split("-")[0]
        return prefix + first
    return head


def discover(env: Optional[dict] = None) -> Optional[Tuple[str, int, int]]:
    """-> (coordinator_address, num_processes, process_id), or None when no
    multi-process launcher environment is present."""
    e = os.environ if env is None else env

    if "COORDINATOR_ADDRESS" in e:
        return (e["COORDINATOR_ADDRESS"], int(e.get("NUM_PROCESSES", 1)),
                int(e.get("PROCESS_ID", 0)))
    if "RANK" in e and "WORLD_SIZE" in e:          # torchrun / env:// style
        addr = e.get("MASTER_ADDR", "127.0.0.1")
        port = e.get("MASTER_PORT", "29500")
        return (f"{addr}:{port}", int(e["WORLD_SIZE"]), int(e["RANK"]))
    if "OMPI_COMM_WORLD_SIZE" in e:                # OpenMPI (misc.py:223-227)
        addr = e.get("MASTER_ADDR", "127.0.0.1")
        port = e.get("MASTER_PORT", "29500")
        return (f"{addr}:{port}", int(e["OMPI_COMM_WORLD_SIZE"]),
                int(e["OMPI_COMM_WORLD_RANK"]))
    if "SLURM_NTASKS" in e and int(e["SLURM_NTASKS"]) > 1:  # misc.py:228-233
        addr = e.get("MASTER_ADDR")
        for var in ("SLURM_STEP_NODELIST", "SLURM_JOB_NODELIST",
                    "SLURM_NODELIST"):
            if addr is None and var in e:
                addr = _first_slurm_node(e[var])
        if addr is None:
            raise RuntimeError(
                "SLURM multi-task job but no coordinator address: set "
                "MASTER_ADDR or run under srun (no SLURM_*_NODELIST found)")
        port = e.get("MASTER_PORT", "29500")
        return (f"{addr}:{port}", int(e["SLURM_NTASKS"]),
                int(e["SLURM_PROCID"]))
    return None


_INITIALIZED = False


def maybe_initialize_distributed(local_device_ids=None) -> bool:
    """Initialize jax.distributed from the launcher env; no-op (returns
    False) for a plain single-process run.  Idempotent."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    import jax

    found = discover()
    if found is None:
        # Cloud TPU pod slices self-discover; only trigger when the TPU
        # runtime env is present AND spans multiple workers.
        if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1:
            jax.distributed.initialize()
            _INITIALIZED = True
            return True
        return False
    addr, nproc, pid = found
    if nproc <= 1:
        return False
    jax.distributed.initialize(coordinator_address=addr, num_processes=nproc,
                               process_id=pid,
                               local_device_ids=local_device_ids)
    _INITIALIZED = True
    return True
