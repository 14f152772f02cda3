"""Multi-host (pod / multi-slice) initialization.

One chip is available in this environment, but the framework is designed for
pods: call ``initialize_multihost()`` once per process before any jax use on
a multi-host deployment and every host joins the same global device mesh;
``make_mesh`` then sees all global devices and GSPMD routes intra-slice
collectives over ICI and cross-slice traffic over DCN (SURVEY.md §2.3 /
§5 distributed plan — the reference has no distributed backend at all).

Data loading on pods: each host feeds only its local shard of the batch;
``host_local_batch_slice`` computes this process's row range.
"""

from __future__ import annotations

import os


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running under a multi-host launcher.
    Returns True if distributed mode is active. No-ops (False) for
    single-process runs so all entry points work unchanged on one chip."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("WCB_COORDINATOR")
    env_procs = os.environ.get("WCB_NUM_PROCESSES")
    env_pid = os.environ.get("WCB_PROCESS_ID")
    if num_processes is None and env_procs:
        num_processes = int(env_procs)
    if process_id is None and env_pid:
        process_id = int(env_pid)

    if coordinator_address is None and num_processes is None:
        # TPU pod runtimes (GKE/queued resources) are auto-detected by
        # jax.distributed with no arguments; try, but stay quiet on failure
        try:
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:
            return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, stop) rows of the global batch this process should load."""
    import jax

    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    i = jax.process_index()
    return i * per, (i + 1) * per
