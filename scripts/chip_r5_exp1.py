"""Round-5 chip experiment 1: hist union A/B, count, heavy, join resident.

One process (remote compiles are per-process on this rig); results print
as one JSON line per experiment so a killed run keeps its partials.
"""

import json
import os
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
    # tunnel probe: tiny put + sum (wedge detector)
    x = jax.device_put(np.arange(1024, dtype=np.int32))
    assert int(jnp.sum(x)) == 1024 * 1023 // 2
    emit("probe", backend=jax.default_backend(), secs=round(time.time() - t0, 1))

    import bench

    k = 21
    rng = np.random.default_rng(0)
    n_table = 1 << 23
    keys = np.unique(rng.integers(0, 1 << (2 * k), size=n_table).astype(np.uint64))
    vals = rng.integers(1, 1000, size=keys.size).astype(np.uint32)
    asm_vals = rng.integers(1, 3, size=keys.size).astype(np.uint32)

    # ---- count (small compiles first; fast feedback) ----
    t0 = time.time()
    try:
        rate = bench._bench_count()
        emit("count", bases_per_sec=round(rate), secs=round(time.time() - t0, 1))
    except Exception as e:
        emit("count", error=repr(e)[:200])

    # ---- hist: union (new default) then two-table (r4 config) ----
    for name, union in (("hist_union", True), ("hist_twotable", False)):
        t0 = time.time()
        try:
            from merfin_tpu.modes.engine import KstarEngine
            from merfin_tpu.table.lookup import DeviceLookup

            engine = KstarEngine(DeviceLookup(keys, vals, k),
                                 DeviceLookup(keys, asm_vals, k),
                                 k, peak=12.0, chunk=1 << 19, sortjoin=True,
                                 sortjoin_union=union)
            n_bases = 1 << 25
            rngh = np.random.default_rng(3)
            codes = rngh.integers(0, 4, size=n_bases).astype(np.uint8)
            engine.hist_sequence(codes[: (1 << 21) + k])   # compile
            rates = []
            for _ in range(3):
                t1 = time.perf_counter()
                engine.hist_sequence(codes)
                rates.append(n_bases / (time.perf_counter() - t1))
            emit(name, bases_per_sec=round(max(rates)),
                 spread=[round(min(rates)), round(max(rates))],
                 secs=round(time.time() - t0, 1))
            del engine
        except Exception as e:
            emit(name, error=repr(e)[:300])

    # ---- join: v4 e2e + resident (+v1) ----
    t0 = time.time()
    try:
        n_query = 1 << 23
        hit_idx = rng.integers(0, keys.size, size=n_query // 2)
        misses = rng.integers(0, 1 << (2 * k), size=n_query // 2).astype(np.uint64)
        q_np = np.concatenate([keys[hit_idx], misses])
        rng.shuffle(q_np)
        out = {}

        def on_kernel(nm, rate, sp):
            out[nm] = (round(rate), [round(sp[0]), round(sp[1])])
            emit("join_partial", kernel=nm, rate=round(rate))

        bench._bench_join(keys, vals, k, q_np, on_kernel=on_kernel)
        emit("join", rates={n: r[0] for n, r in out.items()},
             spreads={n: r[1] for n, r in out.items()},
             secs=round(time.time() - t0, 1))
    except Exception as e:
        emit("join", error=repr(e)[:300])

    # ---- heavy clusters ----
    t0 = time.time()
    try:
        dev, host, ident = bench._bench_variants_heavy()
        emit("heavy", dev=round(dev, 3), host=round(host, 3),
             identical=bool(ident), secs=round(time.time() - t0, 1))
    except Exception as e:
        emit("heavy", error=repr(e)[:300])

    emit("done")


if __name__ == "__main__":
    main()
