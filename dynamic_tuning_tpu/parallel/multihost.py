"""Multi-host initialization helper.

The reference discovers ranks from env:// / OMPI / SLURM variables and calls
torch.distributed.init_process_group (misc.py:217-249).  On TPU pods, JAX
auto-initializes from the TPU runtime; on CPU/GPU clusters (or when the
coordinator env vars are set explicitly), call ``maybe_initialize()`` once at
program start — it is a no-op on a single host.
"""

from __future__ import annotations

import os


def maybe_initialize() -> bool:
    """Initialize jax.distributed from env vars when present.

    Recognized (in priority order):
      * JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
      * SLURM (SLURM_NTASKS / SLURM_PROCID / SLURM_STEP_NODELIST) — handled
        natively by jax.distributed.initialize()
      * OMPI_COMM_WORLD_SIZE / OMPI_COMM_WORLD_RANK + MASTER_ADDR[:PORT]

    Returns True if distributed init ran.
    """
    import jax

    if jax.process_count() > 1:     # already initialized (e.g. TPU pod)
        return True

    env = os.environ
    if "JAX_COORDINATOR_ADDRESS" in env:
        jax.distributed.initialize(
            coordinator_address=env["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(env["JAX_NUM_PROCESSES"]),
            process_id=int(env["JAX_PROCESS_ID"]))
        return True
    if "SLURM_NTASKS" in env and int(env["SLURM_NTASKS"]) > 1:
        jax.distributed.initialize()
        return True
    if "OMPI_COMM_WORLD_SIZE" in env and int(env["OMPI_COMM_WORLD_SIZE"]) > 1:
        addr = env.get("MASTER_ADDR", "localhost")
        port = env.get("MASTER_PORT", "8476")
        jax.distributed.initialize(
            coordinator_address=f"{addr}:{port}",
            num_processes=int(env["OMPI_COMM_WORLD_SIZE"]),
            process_id=int(env["OMPI_COMM_WORLD_RANK"]))
        return True
    return False
