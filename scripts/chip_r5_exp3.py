"""Round-5 chip experiment 3: validate the optimized hist program
(compacted-run counting + int-rational fallback bins), the staged
counter, and a wider scorer span."""

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

    import bench

    # ---- hist with the optimized program ----
    k = 21
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << (2 * k), size=1 << 23).astype(np.uint64))
    vals = rng.integers(1, 1000, size=keys.size).astype(np.uint32)
    asm_vals = rng.integers(1, 3, size=keys.size).astype(np.uint32)
    t0 = time.time()
    try:
        run = bench._bench_hist(keys, vals, asm_vals, k)
        rates = [run() for _ in range(3)]
        emit("hist_v2", bases_per_sec=round(max(rates)),
             spread=[round(min(rates)), round(max(rates))],
             secs=round(time.time() - t0, 1))
    except Exception as e:
        emit("hist_v2", error=repr(e)[:300])

    # ---- count after staging/total/u8-fetch fixes ----
    for name, cov in (("count_v2", 8), ("count_v2_cov16", 16)):
        t0 = time.time()
        try:
            rate = bench._bench_count(coverage=cov)
            emit(name, bases_per_sec=round(rate), secs=round(time.time() - t0, 1))
        except Exception as e:
            emit(name, error=repr(e)[:300])

    # ---- heavy with wider spans (union-v4 layout is compact; the r4
    # 2^23 stall was the v1 128x-padded query layout) ----
    t0 = time.time()
    try:
        from merfin_tpu.variants import device_score as ds

        class WideScorer(ds.DeviceScorer):
            def __init__(self, *a, **kw):
                super().__init__(*a, **kw)
                self.MAX_WINDOWS = 1 << 23

        orig = ds.DeviceScorer
        ds.DeviceScorer = WideScorer   # bench's in-function import reads
        try:                           # this module attribute at call time
            dev, host, ident = bench._bench_variants_heavy()
        finally:
            ds.DeviceScorer = orig
        emit("heavy_wide", dev=round(dev, 3), host=round(host, 3),
             identical=bool(ident), secs=round(time.time() - t0, 1))
    except Exception as e:
        emit("heavy_wide", error=repr(e)[:300])

    emit("done")


if __name__ == "__main__":
    main()
