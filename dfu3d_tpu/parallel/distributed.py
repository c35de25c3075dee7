"""Multi-host initialization (SURVEY §2.4 / §5.8).

The reference's NCCL process-group init (common_utils.init_dist_pytorch:189-204
and init_dist_slurm:162-186) maps to `jax.distributed.initialize`: one python
process per host, all chips of the host driven by that process, collectives
compiled into the pjit'd program over ICI/DCN — the mesh is the backend.

On TPU pods the environment provides coordinator discovery automatically; on
other setups pass coordinator_address/num_processes/process_id explicitly (the
SLURM path does this from SLURM_* variables, mirroring the reference's
scontrol-derived MASTER_ADDR).
"""
from __future__ import annotations

import os


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialize multi-host JAX. No-op on single-host. Returns (rank, world)."""
    import jax

    if num_processes is None and "SLURM_NTASKS" in os.environ:
        # SLURM path (reference init_dist_slurm semantics)
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ["SLURM_PROCID"])
        if coordinator_address is None:
            nodelist = os.environ.get("SLURM_STEP_NODELIST", "localhost")
            head = nodelist.split(",")[0].replace("[", "").split("-")[0]
            port = os.environ.get("COORDINATOR_PORT", "12567")
            coordinator_address = f"{head}:{port}"

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is None and os.environ.get("TPU_WORKER_HOSTNAMES"):
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-host or already initialized
    return jax.process_index(), jax.process_count()


def all_gather_objects(obj):
    """Gather one picklable object per process; returns the list ordered by
    process index (the reference's merge path: common_utils.merge_results_dist
    → torch.distributed.all_gather_object, common_utils.py:223-257).

    Single-process: [obj] without touching collectives. Multi-process:
    pickle → uint8 buffer padded to the global max → one
    `multihost_utils.process_allgather` → unpickle per rank.
    """
    import pickle

    import jax
    import numpy as np

    if jax.process_count() == 1:
        return [obj]

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64)
    ).reshape(-1)
    cap = int(sizes.max())
    padded = np.zeros((cap,), np.uint8)
    padded[: payload.size] = payload
    stacked = np.asarray(multihost_utils.process_allgather(padded))
    return [
        pickle.loads(stacked[i, : int(sizes[i])].tobytes())
        for i in range(stacked.shape[0])
    ]
