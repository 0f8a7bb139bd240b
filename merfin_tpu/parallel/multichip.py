"""The full multi-chip -hist/-dump step: data-parallel chunks over the
"d" mesh axis, table-parallel lookups over "t", collective-merged
accumulators — the TPU equivalent of merfin's entire parallel stack
(sweatShop pipeline + OpenMP + Slurm scatter-gather, SURVEY.md §2.3).

Each device holds one table shard and one slice of the chunk batch.
Per-(chunk, kmer) values come from a psum over "t"; per-device partial
histograms/counters then psum over BOTH axes into replicated globals —
exactly the reference's writer-thread merge (merfin-histogram.C:110-124)
as a collective reduction.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from merfin_tpu.modes.engine import NBINS
from merfin_tpu.ops.kmer_ops import kmer_windows, canonical_and_mult
from merfin_tpu.parallel.sharded import ShardedLookup, _local_probe


def make_hist_step(
    mesh,
    read_lookup: ShardedLookup,
    asm_lookup: ShardedLookup,
    k: int,
    value_map,
    bin_table=None,
):
    """Build a jitted step: codes uint8 [B, C + k - 1] (B sharded over
    "d") -> replicated (kasm, kmissing, koverCpy, undr[NBINS], over[NBINS]).

    value_map: merfin_tpu.score.value_map.ValueMap — getK precomputed on
    the host (exact) and gathered on device.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from merfin_tpu.score.bin_table import BinTable

    vcap = value_map.vcap
    rk_host, pr_host = value_map.read_k_host, value_map.prob_host
    bin_table = bin_table or BinTable()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P("t", None), P("t", None),   # read table shard
            P("t", None), P("t", None),   # asm table shard
            P(), P(),                     # value map (replicated)
            P(), P(),                     # bin tables (replicated)
            P("d", None),                 # codes: chunk batch sharded on d
        ),
        out_specs=(P(), P(), P(), P(), P()),
    )
    def step(rk_keys, rk_vals, as_keys, as_vals, rk_map, pr_map,
             undr_t, over_t, codes):
        fmer, rmer, valid = kmer_windows(codes, k)
        canon, mult = canonical_and_mult(fmer, rmer)

        read_v = jax.lax.psum(_local_probe(rk_keys[0], rk_vals[0], canon), "t")
        asm_v = jax.lax.psum(_local_probe(as_keys[0], as_vals[0], canon), "t")
        read_v = (read_v.astype(jnp.uint64) * mult).astype(jnp.int64)
        asm_v = asm_v.astype(jnp.uint64) * mult

        idx = jnp.minimum(read_v, vcap)
        read_k = rk_map[idx]
        prob = pr_map[idx]
        asm_k = asm_v.astype(jnp.float64)
        read_k = jnp.where(valid, read_k, 0.0)
        asm_k = jnp.where(valid, asm_k, 0.0)

        missing = valid & (read_k == 0)
        is_undr = valid & (read_k > 0) & (asm_k > read_k)
        is_over = valid & (read_k > 0) & ~is_undr

        kasm = jnp.sum(valid)
        kmissing = jnp.sum(missing)
        kover = jnp.sum(jnp.where(is_undr, (1.0 - read_k / asm_k) * prob, 0.0))

        undr_idx, over_idx, _ = bin_table.lookup_jnp(
            read_k, asm_k, (undr_t, over_t))
        undr_idx = jnp.where(is_undr, jnp.clip(undr_idx, 0, NBINS - 1), NBINS)
        over_idx = jnp.where(is_over, jnp.clip(over_idx, 0, NBINS - 1), NBINS)
        undr_hist = jnp.bincount(undr_idx.reshape(-1), length=NBINS + 1)[:NBINS]
        over_hist = jnp.bincount(over_idx.reshape(-1), length=NBINS + 1)[:NBINS]

        # Merge the data-parallel partials.  After the value psum over
        # "t", every t-shard of a d-row computed identical partials, so a
        # psum over "d" alone yields the global value, already replicated
        # across "t" (satisfying the replicated out_specs).
        kasm = jax.lax.psum(kasm, "d")
        kmissing = jax.lax.psum(kmissing, "d")
        kover = jax.lax.psum(kover, "d")
        undr_hist = jax.lax.psum(undr_hist, "d")
        over_hist = jax.lax.psum(over_hist, "d")
        return kasm, kmissing, kover, undr_hist, over_hist

    rk_dev = jnp.asarray(rk_host)
    pr_dev = jnp.asarray(pr_host)
    undr_dev, over_dev = bin_table.device_arrays()

    def run(codes):
        return step(
            read_lookup.keys, read_lookup.vals,
            asm_lookup.keys, asm_lookup.vals,
            rk_dev, pr_dev, undr_dev, over_dev,
            codes,
        )

    return jax.jit(run)
