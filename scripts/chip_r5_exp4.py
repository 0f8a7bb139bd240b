"""Round-5 chip experiment 4: POST-FIX ablation + count/heavy validation.

Times stripped-down variants of the -hist device program on resident
inputs (no host packing, scalar fetches) to attribute the per-dispatch
cost: unpack+windows, canon sort, union join vs two-table join,
classification math, hist+kover sorts.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from merfin_tpu.config import setup_runtime


def emit(name, **kw):
    print(json.dumps({"exp": name, **kw}), flush=True)


def main():
    setup_runtime()
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jax.device_put(np.arange(1024, dtype=np.int32))
    assert int(jnp.sum(x)) == 1024 * 1023 // 2
    emit("probe", backend=jax.default_backend(), secs=round(time.time() - t0, 1))

    from merfin_tpu.modes.engine import KstarEngine, two_hist_by_sort
    from merfin_tpu.ops.kmer_ops import kmer_windows
    from merfin_tpu.score.kover import kover_parts
    from merfin_tpu.table.lookup import DeviceLookup

    k = 21
    rng = np.random.default_rng(0)
    n_table = 1 << 23
    keys = np.unique(rng.integers(0, 1 << (2 * k), size=n_table).astype(np.uint64))
    vals = rng.integers(1, 1000, size=keys.size).astype(np.uint32)
    asm_vals = rng.integers(1, 3, size=keys.size).astype(np.uint32)

    eng_u = KstarEngine(DeviceLookup(keys, vals, k), DeviceLookup(keys, asm_vals, k),
                        k, peak=12.0, chunk=1 << 19, sortjoin=True,
                        max_value=1000, exact_max=True, sortjoin_union=True,
                        asm_max_value=2)
    eng_2 = KstarEngine(DeviceLookup(keys, vals, k), DeviceLookup(keys, asm_vals, k),
                        k, peak=12.0, chunk=1 << 19, sortjoin=True,
                        max_value=1000, exact_max=True, sortjoin_union=False,
                        asm_max_value=2)

    MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)

    def make_prog(eng, mode):
        def prog(planes, vbits, tables, vm, bins):
            codes = eng._unpack(planes, vbits)
            fmer, rmer, valid = kmer_windows(codes, k)
            canon = jnp.where(valid, jnp.minimum(fmer, rmer), MAX)
            if mode == "windows":
                return jnp.sum(canon.astype(jnp.uint32)), jnp.sum(valid)
            qs = jnp.sort(canon.reshape(-1))
            if mode == "sort":
                return jnp.sum(qs.astype(jnp.uint32)), jnp.sum(valid)
            read_v, asm_v = eng._sj_probe(tables, qs)
            if mode == "join":
                return (jnp.sum(read_v.astype(jnp.uint32))
                        + jnp.sum(asm_v.astype(jnp.uint32)), jnp.sum(valid))
            valid_s = qs != MAX
            read_k, prob, overflow = eng.value_map.lookup_jnp(
                read_v.astype(np.uint64), vm)
            asm_k = asm_v.astype(jnp.float64)
            read_k = jnp.where(valid_s, read_k, 0.0)
            asm_k = jnp.where(valid_s, asm_k, 0.0)
            missing = valid_s & (read_k == 0)
            is_undr = valid_s & (read_k > 0) & (asm_k > read_k)
            is_over = valid_s & (read_k > 0) & ~is_undr
            undr_idx, over_idx, bin_exact = eng.bin_table.lookup_jnp(
                read_k, asm_k, bins)
            if mode == "math":
                return (jnp.sum(undr_idx) + jnp.sum(over_idx)
                        + jnp.sum(missing), jnp.sum(is_undr))
            if mode == "histsort":
                uh, oh = two_hist_by_sort(undr_idx, over_idx, is_undr,
                                          is_over, eng.nbins)
                return jnp.sum(uh) + jnp.sum(oh), jnp.sum(missing)
            # full: hist sort + kover parts
            uh, oh = two_hist_by_sort(undr_idx, over_idx, is_undr,
                                      is_over, eng.nbins)
            kc, kn, kr, kfb, kfbc = kover_parts(
                read_v.astype(np.uint64), read_k, asm_k, prob, is_undr,
                eng.kover_vmaxp, eng.bin_table.amax,
                r_max=eng._kover_rmax, a_max=eng._kover_amax)
            return (jnp.sum(uh) + jnp.sum(oh) + jnp.sum(kn) + jnp.sum(kr),
                    jnp.sum(missing))
        return jax.jit(prog)

    # resident inputs: 4 batches pre-placed
    from merfin_tpu.kcore.pack import pack_transfer_np

    rngc = np.random.default_rng(3)
    batches = []
    for _ in range(4):
        codes_b = rngc.integers(0, 4, size=(2, (1 << 19) + k - 1)).astype(np.uint8)
        planes, vbits = pack_transfer_np(codes_b)
        batches.append((jax.device_put(planes), jax.device_put(vbits)))

    n_win = 2 * (1 << 19)
    modes = [("windows", eng_u), ("sort", eng_u), ("join", eng_u),
             ("math", eng_u), ("histsort", eng_u), ("full", eng_u)]
    for name, eng in modes:
        mode = {"join2": "join", "full2": "full"}.get(name, name)
        t0 = time.time()
        try:
            fn = make_prog(eng, mode)
            args = (eng._step_args() + (eng.bin_table.device_arrays(),))
            r = fn(*batches[0], *args)
            jax.block_until_ready(r)
            comp = time.time() - t0
            rs = []
            for _ in range(3):
                t1 = time.perf_counter()
                out = None
                for b in batches * 3:          # 12 dispatches
                    out = fn(*b, *args)
                jax.block_until_ready(out)
                rs.append(12 * n_win / (time.perf_counter() - t1))
            per_dispatch_ms = 1000.0 * n_win / max(rs)
            emit("ablate", mode=name, windows_per_sec=round(max(rs)),
                 ms_per_dispatch=round(per_dispatch_ms, 1),
                 compile_s=round(comp, 1))
        except Exception as e:
            emit("ablate", mode=name, error=repr(e)[:300])

    # count re-measurement after compaction + plane-packed fetch
    import bench

    t0 = time.time()
    try:
        rate = bench._bench_count()
        emit("count4", bases_per_sec=round(rate), secs=round(time.time() - t0, 1))
    except Exception as e:
        emit("count4", error=repr(e)[:300])

    # heavy re-measurement with threaded span dispatch + build overlap
    t0 = time.time()
    try:
        dev, host, ident = bench._bench_variants_heavy()
        emit("heavy4", dev=round(dev, 3), host=round(host, 3),
             identical=bool(ident), secs=round(time.time() - t0, 1))
    except Exception as e:
        emit("heavy4", error=repr(e)[:300])

    emit("done")


if __name__ == "__main__":
    main()
