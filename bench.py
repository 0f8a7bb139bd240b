"""Benchmark: k-mer exact-lookup throughput on the TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is canonical k-mer lookups/second through the
device-resident exact table (the operation that dominates every merfin
mode, SURVEY.md §3.2), measured end-to-end under jit on a synthetic
k=21 table sized to be HBM-resident.  vs_baseline compares against a
single-core numpy searchsorted on this host — the reference engine's
probe is a comparable single-threaded memory-latency-bound lookup
(merylExactLookup::value per k-mer; the reference publishes no numbers,
BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import os

    from merfin_tpu.config import ensure_x64

    ensure_x64()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MERFIN_TPU_CACHE", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp

    k = 21
    n_table = 1 << int(os.environ.get("BENCH_LOG_TABLE", 23))
    n_query = 1 << int(os.environ.get("BENCH_LOG_QUERY", 23))
    rng = np.random.default_rng(0)

    keys = np.unique(rng.integers(0, 1 << (2 * k), size=n_table).astype(np.uint64))
    vals = rng.integers(1, 1000, size=keys.size).astype(np.uint32)

    # queries: half hits, half misses
    hit_idx = rng.integers(0, keys.size, size=n_query // 2)
    misses = rng.integers(0, 1 << (2 * k), size=n_query // 2).astype(np.uint64)
    q_np = np.concatenate([keys[hit_idx], misses])
    rng.shuffle(q_np)

    # Headline: the sorted-join Pallas kernel (the hist/completeness/count
    # hot path — consumers reduce, so queries are device-sorted and never
    # unsorted).  merfin_tpu/ops/join_kernel.py.
    from merfin_tpu.ops.join_kernel import SortJoinTable

    sj = SortJoinTable(keys, vals, k)
    q = jnp.asarray(q_np)
    tree = sj.tree()   # table rides as a jit ARGUMENT (program reuse)
    join_impl = jax.jit(lambda tr, qq: sj.lookup_sorted_with(tr, jnp.sort(qq)))
    join = lambda qq: join_impl(tree, qq)

    # warmup + compile (np.asarray forces a real result fetch: on the
    # tunneled backend block_until_ready alone returns before the remote
    # compile/execute completes)
    np.asarray(join(q))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = join(q)
    _ = np.asarray(out)
    dt = time.perf_counter() - t0
    tpu_rate = n_query * iters / dt

    # CPU baseline: single-threaded numpy searchsorted (reference-style probe)
    cpu_n = 1 << 20
    qc = q_np[:cpu_n]
    t0 = time.perf_counter()
    idx = np.searchsorted(keys, qc)
    idx = np.minimum(idx, keys.size - 1)
    hit = keys[idx] == qc
    _ = np.where(hit, vals[idx], 0)
    cpu_dt = time.perf_counter() - t0
    cpu_rate = cpu_n / cpu_dt

    print(json.dumps({
        "metric": "kmer_exact_lookups_per_sec_per_chip",
        "value": round(tpu_rate),
        "unit": "lookups/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
