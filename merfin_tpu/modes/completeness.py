"""-completeness mode: k-mer completeness from the two databases.

The reference streams both DBs 64 ways and merge-joins sorted k-mer
streams per slice under OpenMP (merfin-completeness.C:49-143).  On TPU
the merge-join becomes a batched array join: for every read-DB slice, a
vectorized searchsorted of its keys into the assembly slice yields the
assembly value (0 when absent); asm-only k-mers are skipped exactly as in
the reference (merfin-completeness.C:100-109).  Per-slice partial sums
reduce to COMPLETENESS = 1 - undrc/total.

Accumulation is float64 per slice, matching the reference's per-thread
doubles; slice order of the final reduction is fixed (0..63).
"""

from __future__ import annotations

import sys

import numpy as np

from merfin_tpu.config import ensure_x64
from merfin_tpu.io.mkdb import KmerDB, SLICES
from merfin_tpu.score.kstar import ProbTable


def run_completeness(
    read_db: KmerDB,
    asm_db: KmerDB,
    peak: float,
    prob_table: ProbTable | None = None,
    log=sys.stderr,
    block: int = 1 << 22,
    mesh=None,
):
    """-completeness driver; with ``mesh`` the assembly table shards over
    the "t" axis and read-DB row batches ride the "d" axis (the
    reference's 64-way OpenMP merge-join, merfin-completeness.C:65, as
    one collective program)."""
    ensure_x64()
    import jax
    import jax.numpy as jnp

    from merfin_tpu.score.value_map import ValueMap

    max_v = int(np.asarray(read_db.vals).max()) if read_db.distinct else 1
    # max_v is the scanned TRUE maximum (and completeness feeds raw DB
    # values, never palindrome-doubled), so the fallback compiles away
    vmap = ValueMap(peak, prob_table, max_v, exact_max=True)
    vm_arrays = vmap.device_arrays()

    if mesh is not None:
        return _run_completeness_mesh(read_db, asm_db, vmap, mesh,
                                      log=log, block=block)

    from merfin_tpu.parallel import multihost as mh

    multi = mh.is_active()
    pid, pcount = mh.process_info() if multi else (0, 1)

    @jax.jit
    def slice_stats(read_keys, read_vals, read_mask, asm_keys, asm_vals, vm):
        idx = jnp.searchsorted(asm_keys, read_keys)
        idx_c = jnp.minimum(idx, asm_keys.shape[0] - 1)
        hit = asm_keys[idx_c] == read_keys
        asm_v = jnp.where(hit, asm_vals[idx_c], jnp.uint32(0))
        read_k, _, _ = vmap.lookup_jnp(read_vals.astype(jnp.uint64), vm)
        asm_k = asm_v.astype(jnp.float64)
        read_k = jnp.where(read_mask, read_k, 0.0)
        asm_k = jnp.where(read_mask, asm_k, 0.0)
        total = jnp.sum(read_k)
        undrc = jnp.sum(jnp.where(read_k > asm_k, read_k - asm_k, 0.0))
        return total, undrc

    compl_total = np.zeros(SLICES, dtype=np.float64)
    compl_undrc = np.zeros(SLICES, dtype=np.float64)

    for ii in range(SLICES):
        if multi and ii % pcount != pid:
            continue   # slice stripe (reference: OpenMP dynamic over 64)
        r_keys, r_vals = read_db.slice(ii)
        a_keys, a_vals = asm_db.slice(ii)
        a_keys = np.asarray(a_keys, dtype=np.uint64)
        a_vals = np.asarray(a_vals, dtype=np.uint32)
        # Pad the assembly slice to a power of two so at most log2 shapes
        # compile across the 64 slices.  Pad keys are u64::MAX, which no
        # k-mer (<= 2^62 for k <= 31) can equal -> read as absent.
        padded = 1 << max(0, (a_keys.size - 1).bit_length())
        if padded < 1:
            padded = 1
        if a_keys.size < padded:
            a_keys = np.pad(a_keys, (0, padded - a_keys.size),
                            constant_values=np.uint64(0xFFFFFFFFFFFFFFFF))
            a_vals = np.pad(a_vals, (0, padded - a_vals.size))
        for lo in range(0, max(r_keys.shape[0], 1), block):
            rk = np.asarray(r_keys[lo : lo + block], dtype=np.uint64)
            rv = np.asarray(r_vals[lo : lo + block], dtype=np.uint32)
            if rk.size == 0:
                break
            n = rk.size
            if n < block:
                rk = np.pad(rk, (0, block - n))
                rv = np.pad(rv, (0, block - n))
            mask = np.zeros(block, dtype=bool)
            mask[:n] = True
            t, u = slice_stats(rk, rv, mask, a_keys, a_vals, vm_arrays)
            compl_total[ii] += float(t)
            compl_undrc[ii] += float(u)

        c = 1.0 - compl_undrc[ii] / compl_total[ii] if compl_total[ii] else float("nan")
        print(f"thread {ii:2d} total {compl_total[ii]:12.2f} underc "
              f"{compl_undrc[ii]:15.5f} completeness {c:0.8f}", file=log)

    if multi:
        compl_total = mh.merge_array_across_hosts(compl_total)
        compl_undrc = mh.merge_array_across_hosts(compl_undrc)
    return _report(compl_total, compl_undrc, log if pid == 0 else None)


def _report(compl_total: np.ndarray, compl_undrc: np.ndarray, log):
    total = float(np.sum(compl_total))
    undrc = float(np.sum(compl_undrc))
    completeness = 1.0 - undrc / total if total else float("nan")

    if log is not None:   # rank 0 only under multi-host
        print("", file=log)
        print(f"TOTAL readK:   {total:15.2f}", file=log)
        print(f"TOTAL undrcpy:    {undrc:15.5f}", file=log)
        print(f"COMPLETENESS:             {completeness:0.5f}", file=log)

    return {"total": total, "undrc": undrc, "completeness": completeness}


def _run_completeness_mesh(read_db: KmerDB, asm_db: KmerDB, vmap, mesh,
                           log=sys.stderr, block: int = 1 << 20):
    from jax.sharding import PartitionSpec as P

    from merfin_tpu.parallel.multichip import make_completeness_step
    from merfin_tpu.parallel.sharded import (ShardedLookup, mesh_spans_hosts,
                                             put_global)

    # On a host-spanning mesh every process drives the same slices and
    # the psums produce replicated results — only rank 0 reports.
    pid = 0
    if mesh_spans_hosts(mesh):
        import jax

        pid = jax.process_index()

    asm_sharded = ShardedLookup.build(asm_db, mesh)
    step = make_completeness_step(mesh, asm_sharded, vmap)
    D = mesh.shape["d"]
    spec = P("d", None)

    # one compiled shape: per-device block sized to the largest slice
    # (pow2, floor 4096) so small databases don't pay 64 full-size
    # zero-padded dispatches
    max_slice = int(np.max(np.diff(read_db.slice_offsets))) if read_db.distinct else 0
    per_dev = (max_slice + D - 1) // D
    if per_dev:
        block = min(block, max(4096, 1 << (per_dev - 1).bit_length()))

    compl_total = np.zeros(SLICES, dtype=np.float64)
    compl_undrc = np.zeros(SLICES, dtype=np.float64)

    for ii in range(SLICES):
        r_keys, r_vals = read_db.slice(ii)
        n_slice = r_keys.shape[0]
        for lo in range(0, n_slice, D * block):
            rk = np.zeros((D, block), dtype=np.uint64)
            rv = np.zeros((D, block), dtype=np.uint32)
            mask = np.zeros((D, block), dtype=bool)
            piece_k = np.asarray(r_keys[lo: lo + D * block], dtype=np.uint64)
            piece_v = np.asarray(r_vals[lo: lo + D * block], dtype=np.uint32)
            n = piece_k.size
            rk.reshape(-1)[:n] = piece_k
            rv.reshape(-1)[:n] = piece_v
            mask.reshape(-1)[:n] = True
            t, u = step(put_global(rk, mesh, spec), put_global(rv, mesh, spec),
                        put_global(mask, mesh, spec))
            compl_total[ii] += float(t)
            compl_undrc[ii] += float(u)

        if pid == 0:
            c = 1.0 - compl_undrc[ii] / compl_total[ii] if compl_total[ii] else float("nan")
            print(f"thread {ii:2d} total {compl_total[ii]:12.2f} underc "
                  f"{compl_undrc[ii]:15.5f} completeness {c:0.8f}", file=log)

    return _report(compl_total, compl_undrc, log if pid == 0 else None)
