"""Multi-host serving topology.

The 66 M model is replicated; scale-out is data parallelism over utterance
batches (SURVEY.md §2.7). Across a pod slice the clean design is one engine
process per host over its local devices — no cross-host collectives in the
request path at all; DCN only carries control (jax.distributed) and request
routing, ICI carries any intra-host model-axis collectives. The helpers here
give each host its slice of a request stream and its local mesh.

For single-controller multi-host pjit (all hosts in one program), build the
mesh over jax.devices() (global) and use jax.experimental.multihost_utils
for host-local data distribution; that path only pays off when a single
batch must span hosts, which the throughput numbers say is unnecessary.
"""

from __future__ import annotations

import jax

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bring-up. No-op without coordinator config; with one,
    failures are raised (a 2-host deployment silently serving single-host is
    worse than crashing — VERDICT r1 weak #7)."""
    from .mesh import initialize_distributed

    kwargs = {}
    if coordinator_address:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    initialize_distributed(**kwargs)


def local_mesh(model_parallel: int = 1):
    """Mesh over THIS host's devices only (per-host engine pattern)."""
    return make_mesh(
        model_parallel=model_parallel, devices=jax.local_devices()
    )


def host_shard(items: list, process_id: int | None = None,
               process_count: int | None = None) -> list:
    """Deterministic round-robin slice of a request list for this host."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    return items[pid::pcount]


def is_egress_host(process_id: int | None = None) -> bool:
    """Single designated egress host (process 0) for aggregated responses —
    per-request waveforms leave from the host that synthesized them."""
    pid = jax.process_index() if process_id is None else process_id
    return pid == 0
