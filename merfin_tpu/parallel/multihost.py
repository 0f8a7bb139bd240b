"""Multi-host launch support (jax.distributed).

The reference scales across nodes by Slurm file-scatter with a full DB
reload per node (scripts/parallel1, SURVEY §2.3).  Here each host joins
one jax.distributed job: the global mesh spans all hosts' devices, the
table shards over the global "t" axis (each host holds only its slice of
HBM), hosts read disjoint sequence subsets, and accumulator merges ride
the same psum collectives as the single-host path.

Usage (per host):

    from merfin_tpu.parallel.multihost import init, host_sequences
    init(coordinator="host0:9876", num_processes=N, process_id=i)
    mesh = make_global_mesh()
    for seq in host_sequences(SeqFile(path)):   # every Nth sequence
        ...
    # partial accumulators -> merge_across_hosts(...)

This module is structured for real slices; in this dev environment only
single-process behavior is exercised (tests use process_count == 1).
"""

from __future__ import annotations

import numpy as np

from merfin_tpu.config import ensure_x64


def init(coordinator: str | None = None, num_processes: int | None = None,
         process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when single-process)."""
    ensure_x64()
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> tuple[int, int]:
    import jax

    return jax.process_index(), jax.process_count()


def make_global_mesh(data: int | None = None):
    """A ("d", "t") mesh over ALL processes' devices."""
    from merfin_tpu.parallel.sharded import make_mesh

    return make_mesh(data=data)


def host_sequences(seq_iter):
    """Stripe sequences across hosts: host i takes every P-th sequence
    (the reference's scaffold striping, scripts/parallel1/merfin.sh:63-86,
    without the per-node DB duplication)."""
    pid, pcount = process_info()
    for i, seq in enumerate(seq_iter):
        if i % pcount == pid:
            yield seq


def merge_scalar_across_hosts(x: float) -> float:
    """Global sum of a host-local scalar (psum over all devices /
    local device count)."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils

    arr = jnp.asarray([x], dtype=jnp.float64)
    out = multihost_utils.process_allgather(arr)
    return float(np.asarray(out).sum())


def merge_array_across_hosts(x: np.ndarray) -> np.ndarray:
    """Elementwise global sum of a host-local accumulator array."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    out = multihost_utils.process_allgather(np.asarray(x)[None])
    return np.asarray(out).sum(axis=0)
