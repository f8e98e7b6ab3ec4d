"""Multi-host initialisation (SURVEY.md §5.8).

On a multi-host TPU slice each host runs the same program;
`maybe_initialize_distributed()` wires them into one JAX process group
(DCN for host coordination, ICI for collectives) before `make_mesh()` so
`jax.devices()` spans the full slice. On single-host (or when already
initialised) it is a no-op, so the same entrypoint works everywhere.
"""

import logging
import os

import jax

log = logging.getLogger("distributed")


def maybe_initialize_distributed(
    coordinator_address=None, num_processes=None, process_id=None
):
    """Initialise jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod metadata that jax.distributed auto-detects). Returns True when
    a multi-process group was initialised."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    if coordinator_address is None and num_processes is None:
        # single-host / implicit TPU-pod autodetection not requested
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=int(num_processes) if num_processes else None,
            process_id=int(process_id or os.environ.get("JAX_PROCESS_ID", 0)),
        )
        log.info(
            "jax.distributed initialised: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
        return True
    except RuntimeError as e:  # already initialised
        log.warning("jax.distributed.initialize skipped: %s", e)
        return False
