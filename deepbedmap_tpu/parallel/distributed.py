"""Multi-host (multi-slice) initialisation.

The reference has no distributed runtime (SURVEY.md section 2.8). For TPU
pods, JAX's single-controller-per-host model needs one call before first
device use; after it, every `parallel` API in this package works unchanged —
`make_mesh()` sees the global device set, batch/tile shardings span hosts, and
GSPMD routes collectives over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise jax.distributed (no-op if already initialised or single
    process). On Cloud TPU the arguments auto-detect from the environment."""
    import jax
    from jax._src import xla_bridge

    if (
        xla_bridge.backends_are_initialized()
        and coordinator_address is None
        and (num_processes is None or num_processes == 1)
    ):
        # Backends already up in this process and no multi-process coordinator
        # requested: jax.distributed.initialize() would raise ("must be called
        # before any JAX calls"), but a single-process run needs no
        # coordination service — the documented no-op.
        return

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:
        if "already initialized" not in str(exc):
            raise
    except ValueError as exc:
        # no coordinator given and none auto-detected (not on a managed pod):
        # a single-process run — the documented no-op
        if coordinator_address is not None or "coordinator_address" not in str(exc):
            raise


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0
