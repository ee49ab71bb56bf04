"""Multi-host bring-up (SURVEY.md §7 step 6 scaffolding).

The reference is single-node only (hardcoded tcp://localhost:2333
rendezvous, SURVEY.md §2.9.9). The TPU-native design needs no control-plane
RPC at all: every host runs the SAME deterministic scheduler over the same
request stream (seeded sampling is on-device and identical everywhere), and
the data plane is GSPMD collectives over a global mesh spanning all hosts'
devices.

This module is the thin bring-up layer: call `maybe_init_distributed()`
before engine construction on each host of a pod slice (or rely on the
standard JAX env vars / TPU metadata autodetection). The engine's mesh then
builds from `jax.devices()` which spans the slice. Single-process runs are
untouched.

Multi-host execution cannot be exercised in this repo's single-chip CI; the
multi-chip sharding logic itself is validated on a virtual 8-device mesh
(tests/test_sharding.py, __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import os


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when a multi-host environment is
    detected (coordinator address env or TPU pod metadata). Returns True
    if initialization happened."""
    import jax

    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return True
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    num_processes = os.environ.get("JAX_NUM_PROCESSES")
    process_id = os.environ.get("JAX_PROCESS_ID")
    try:
        if coordinator and num_processes and process_id:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=int(num_processes),
                process_id=int(process_id),
            )
            return True
        hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        # Some runtimes set this var to a warning STRING — only trust it
        # when it looks like a comma-separated host list.
        if hostnames and " " not in hostnames and "," in hostnames:
            jax.distributed.initialize()  # TPU pod metadata autodetect
            return True
    except Exception:
        return False
    return False
