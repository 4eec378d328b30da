"""Multi-host initialization helpers.

The reference has no distributed runtime at all (SURVEY.md section 2.4);
its only cross-device mechanism is TVM RPC for build-time tuning.  On TPU
pods, multi-host is one `jax.distributed.initialize()` plus the same mesh
code (parallel/tp.py) -- every host runs this identical program and JAX
stitches the global device list over ICI/DCN.

Typical v5e pod-slice launch (one process per host, e.g. via gcloud
`--worker=all` ssh fan-out):

    python -c "from tmac_tpu.parallel.launch import init; init()" ...

or from user code:

    from tmac_tpu.parallel import launch, tp
    launch.init()                      # no-op on single-host
    mesh = tp.make_mesh(tp=4, dp=jax.device_count() // 4)
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    On Cloud TPU VMs all three arguments are auto-detected from the
    metadata server; pass them explicitly elsewhere (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    multi_host = (coordinator_address is not None
                  or num_processes not in (None, 1)
                  or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0)
    if multi_host:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def scaling_efficiency(tokens_per_s: float, baseline_tokens_per_s: float,
                       n_chips: int, baseline_chips: int = 1) -> float:
    """Throughput scaling efficiency vs a smaller config (the >=85%-to-2-hosts
    target from BASELINE.json): 1.0 = perfectly linear."""
    return (tokens_per_s / baseline_tokens_per_s) / (n_chips / baseline_chips)
