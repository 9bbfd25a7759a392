"""Multi-host initialization hook.

The reference is strictly single-host [H per SURVEY.md §2.2]; the rebuild
supports multi-host TPU slices the JAX way: call
`jax.distributed.initialize` before any backend use when launched under a
multi-host launcher. Host-sharded data loading then follows from each
process reading its own slice of the event file (BucketBatcher over a
per-host id range); gradient psums ride ICI/DCN transparently via the
same shard_map code paths.

Activated automatically by the CLI when standard env vars are present
(COORDINATOR_ADDRESS / JAX_COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID)
or under a TPU pod runtime that provides them implicitly.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed from env vars; returns True if done."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr:
        return False
    import jax

    kwargs = {"coordinator_address": addr}
    if os.environ.get("NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["NUM_PROCESSES"])
    if os.environ.get("PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def host_event_range(num_events: int) -> tuple[int, int]:
    """This host's contiguous slice of the event file (multi-host data
    sharding over DCN; single host → the whole range)."""
    try:
        import jax

        pid, nproc = jax.process_index(), jax.process_count()
    except Exception:
        pid, nproc = 0, 1
    per = (num_events + nproc - 1) // nproc
    lo = min(pid * per, num_events)
    return lo, min(lo + per, num_events)
