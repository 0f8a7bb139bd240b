import time
import numpy as np
from merfin_tpu.config import ensure_x64
ensure_x64()
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from merfin_tpu.modes.engine import KstarEngine, NBINS
from merfin_tpu.table.lookup import DeviceLookup
from merfin_tpu.ops.kmer_ops import kmer_windows, canonical_and_mult

k = 21
rng = np.random.default_rng(0)
keys = np.unique(rng.integers(0, 1 << (2*k), size=1 << 23).astype(np.uint64))
vals = rng.integers(1, 1000, size=keys.size).astype(np.uint32)
avals = rng.integers(1, 3, size=keys.size).astype(np.uint32)
rl, al = DeviceLookup(keys, vals, k), DeviceLookup(keys, avals, k)
eng = KstarEngine(rl, al, k, peak=12.0, chunk=1 << 19, batch=4)

codes = rng.integers(0, 4, size=(4, (1 << 19) + k - 1)).astype(np.uint8)
vm_arr = eng.value_map.device_arrays()
bins_arr = eng.bin_table.device_arrays()
rtree, atree = rl.tree(), al.tree()

def stage_a(codes):
    fmer, rmer, valid = kmer_windows(codes, k)
    canon, mult = canonical_and_mult(fmer, rmer)
    return canon.sum() + mult.sum() + valid.sum()

def lk(codes, r_tree, a_tree):
    fmer, rmer, valid = kmer_windows(codes, k)
    canon, mult = canonical_and_mult(fmer, rmer)
    read_v = rl.lookup_with(r_tree, canon).astype(np.uint64) * mult
    asm_v = al.lookup_with(a_tree, canon).astype(np.uint64) * mult
    return read_v, asm_v, valid

def stage_b(codes, r_tree, a_tree):
    rv, av, valid = lk(codes, r_tree, a_tree)
    return rv.sum() + av.sum() + valid.sum()

def vmap_part(codes, r_tree, a_tree, vm):
    rv, av, valid = lk(codes, r_tree, a_tree)
    read_k, prob, overflow = eng.value_map.lookup_jnp(rv, vm)
    asm_k = av.astype(jnp.float64)
    read_k = jnp.where(valid, read_k, 0.0)
    asm_k = jnp.where(valid, asm_k, 0.0)
    return read_k, asm_k, prob, valid, overflow

def stage_c(codes, r_tree, a_tree, vm):
    rk, ak, prob, valid, over = vmap_part(codes, r_tree, a_tree, vm)
    return rk.sum() + ak.sum() + prob.sum() + over

def stage_d(codes, r_tree, a_tree, vm, bins):
    rk, ak, prob, valid, over = vmap_part(codes, r_tree, a_tree, vm)
    missing = valid & (rk == 0)
    is_undr = valid & (rk > 0) & (ak > rk)
    is_over = valid & (rk > 0) & ~is_undr
    kover = jnp.sum(jnp.where(is_undr, (1.0 - rk / ak) * prob, 0.0))
    ui, oi, ex = eng.bin_table.lookup_jnp(rk, ak, bins)
    return (kover + jnp.sum(missing) + ui.sum() + oi.sum()
            + ex.sum() + over)

def stage_e(codes, r_tree, a_tree, vm, bins):
    out = eng._hist_chunk(codes, r_tree, a_tree, vm, bins)
    return sum(jnp.sum(o) for o in out)

stages = [("extract", stage_a, (codes,)),
          ("+lookup", stage_b, (codes, rtree, atree)),
          ("+valuemap", stage_c, (codes, rtree, atree, vm_arr)),
          ("+classify+bins", stage_d, (codes, rtree, atree, vm_arr, bins_arr)),
          ("full(+bincount)", stage_e, (codes, rtree, atree, vm_arr, bins_arr))]

for name, fn, args in stages:
    j = jax.jit(fn)
    np.asarray(j(*args))  # compile + fetch
    t0 = time.perf_counter()
    for _ in range(5):
        out = j(*args)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"{name}: {dt*1000:.0f} ms/dispatch", flush=True)
