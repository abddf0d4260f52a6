"""Multi-host (multi-slice / DCN) initialization helpers.

Single-controller JAX already spans every chip of one TPU slice; crossing
hosts only needs `jax.distributed.initialize()` before any computation, after
which `jax.devices()` is global and the same `make_mesh`/`pjit` programs
scale unchanged — XLA routes intra-slice collectives over ICI and inter-slice
traffic over DCN. The reference has no distributed story at all (in-process
PyO3 FFI + rayon threads is its entire parallelism inventory, SURVEY.md
section 2.4); this module is the whole equivalent layer, by design: there is
no hand-written communication code anywhere in the framework.

Typical multi-host training layout for this workload (small policies, wide
env batches): pure data parallelism — `make_mesh()` over all global devices,
env batch sharded on 'dp', params replicated. Gradient psum crosses DCN once
per iteration; env steps never communicate.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (no-op when single-process).

    With no arguments, relies on the TPU environment's auto-configuration
    (GKE/QR metadata), which covers all standard multi-host TPU deployments.
    Explicit arguments support bring-your-own-cluster setups. Safe to call
    twice with the same arguments (the second call is ignored); a repeat
    call with DIFFERENT explicit arguments raises, since the first
    initialization cannot be undone.
    """
    import jax

    args = (coordinator_address, num_processes, process_id)
    prev = getattr(initialize, "_args", None)
    if prev is not None:
        if args != prev and any(a is not None for a in args):
            if not jax.distributed.is_initialized():
                # the previous call was a single-host no-op — nothing was
                # actually initialized, so honor the explicit request
                pass
            else:
                raise RuntimeError(
                    f"jax.distributed already initialized with {prev}; "
                    f"cannot re-initialize with {args}")
        else:
            return
    if num_processes is None and coordinator_address is None:
        hosts = [h for h in
                 os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
        multi = len(hosts) > 1 or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS")
        if not multi:
            # single-host: nothing to coordinate
            initialize._args = args
            return
    # idempotence via jax's own client state, not exception-text matching
    if jax.distributed.is_initialized():
        initialize._args = args
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    initialize._args = args


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should own logging/checkpoint writes."""
    import jax

    return jax.process_index() == 0
