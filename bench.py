"""Benchmark: merfin_tpu throughput on the TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline: canonical k-mer lookups/second through the sorted-join Pallas
table (the operation dominating every merfin mode, SURVEY.md §3.2),
vs a single-core numpy searchsorted baseline (the reference engine's
probe is a comparable single-threaded memory-latency-bound lookup;
the reference publishes no numbers, BASELINE.md).

extra carries the mode-level numbers the VERDICT asked for:
  join_v4_lookups_per_sec        the fence-narrowing kernel, e2e (result
                                 fetched over the wire each round)
  join_v4_resident_lookups_per_sec  same program, output reduced to a
                                 scalar on device — the tunnel-
                                 independent rate (r4 verdict item 6)
  hist_bases_per_sec             end-to-end -hist engine throughput
  variant_clusters_per_sec       end-to-end variant evaluation (host
                                 scorer — comparable across rounds)
  variant_clusters_per_sec_devscore  the CLI's -polish default (fused
                                 device scoring)
  cpu_lookups_per_sec            the baseline probe rate

Env knobs: BENCH_LOG_TABLE/BENCH_LOG_QUERY (default 23), BENCH_SKIP_MODES=1
to print only the headline (fast path for kernel iteration),
BENCH_BUDGET_S global wall-clock budget (default 3000; sections that
don't fit are skipped and recorded, so the artifact always carries
every attempted metric and rc=0).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def _bench_join(keys, vals, k, q_np, iters=8, rounds=2, on_kernel=None):
    """Best-of-``rounds`` per kernel with min/max spread: a single timed
    run cannot separate real regressions from tunnel load on this dev
    link (VERDICT r3 item 3).  v4 (the headline kernel) runs FIRST and
    ``on_kernel(name, rate, spread)`` fires per kernel, so a stalled
    compile of the second kernel can't zero the watchdog's partial
    emit.

    For v4 a RESIDENT rate is also measured (``on_kernel('v4_resident',
    ...)``): the same program with the output reduced to one u64 scalar
    on device, so the timing contains dispatch + execute but NOT the
    32 MB result fetch that rides the ~30-60 MB/s post-dispatch tunnel
    (docs/PERF.md r4).  e2e vs resident in the SAME run separates
    kernel regressions from wire weather — the A/B the r4 verdict asked
    for (the r2-era join config is structurally identical to the
    current one: same iters-deep dispatch queue, device-resident
    queries, one fetch per round; only the fetch exposure differs)."""
    import jax
    import jax.numpy as jnp

    from merfin_tpu.ops.join_kernel import SortJoinTable
    from merfin_tpu.ops.join_kernel4 import SortJoinTableV4

    q = jnp.asarray(q_np)
    rates, spread = {}, {}
    for name, cls in (("v4", SortJoinTableV4), ("v1", SortJoinTable)):
        sj = cls(keys, vals, k)
        tree = sj.tree()   # table rides as a jit ARGUMENT (program reuse)
        impl = jax.jit(lambda tr, qq, s=sj: s.lookup_sorted_with(tr, jnp.sort(qq)))
        np.asarray(impl(tree, q))   # warmup + compile (forces remote fetch)
        rs = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = impl(tree, q)
            _ = np.asarray(out)
            rs.append(q_np.size * iters / (time.perf_counter() - t0))
        rates[name] = max(rs)
        spread[name] = (min(rs), max(rs))
        if on_kernel is not None:
            on_kernel(name, rates[name], spread[name])
        if name == "v4":
            res = jax.jit(lambda tr, qq, s=sj: s.lookup_sorted_with(
                tr, jnp.sort(qq)).astype(jnp.uint64).sum())
            np.asarray(res(tree, q))      # compile (shares the join body)
            rr = []
            for _ in range(rounds):
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = res(tree, q)
                _ = np.asarray(out)       # 8-byte fetch
                rr.append(q_np.size * iters / (time.perf_counter() - t0))
            rates["v4_resident"] = max(rr)
            spread["v4_resident"] = (min(rr), max(rr))
            if on_kernel is not None:
                on_kernel("v4_resident", max(rr), spread["v4_resident"])
    return rates, spread


def _best_of(fn, rounds=3):
    """max / (min, max) of ``rounds`` calls of a rate-returning fn."""
    rs = [fn() for _ in range(rounds)]
    return max(rs), (min(rs), max(rs))


def _bench_hist(keys, read_vals, asm_vals, k, n_bases=1 << 25):
    """End-to-end -hist engine rate (bases/s) on a synthetic chunk set,
    in the CLI's production configuration (sorted-join auto-enabled on
    accelerators for any k since r3, cli.py:make_engine).  Returns a
    closure so the caller can best-of-N it."""
    import jax

    from merfin_tpu.modes.engine import KstarEngine
    from merfin_tpu.table.lookup import DeviceLookup

    sortjoin = jax.default_backend() != "cpu"
    # max_value/exact_max mirror the CLI (cli.py:make_engine): the
    # scanned DB max compiles the value-map overflow fallback away
    engine = KstarEngine(DeviceLookup(keys, read_vals, k),
                         DeviceLookup(keys, asm_vals, k),
                         k, peak=12.0, chunk=1 << 19, sortjoin=sortjoin,
                         max_value=int(read_vals.max()), exact_max=True,
                         asm_max_value=int(asm_vals.max()))
    rng = np.random.default_rng(3)
    # pipelined dispatches: the rate reflects steady-state throughput
    # with transfer/compute overlap, not one dispatch's tunnel round trip
    codes = rng.integers(0, 4, size=n_bases).astype(np.uint8)
    engine.hist_sequence(codes[: (1 << 21) + k])   # warmup/compile

    def run():
        t0 = time.perf_counter()
        engine.hist_sequence(codes)
        return n_bases / (time.perf_counter() - t0)

    return run


def _bench_completeness(keys, read_vals, asm_vals, k):
    """-completeness rate (read-DB k-mers/s): the sorted read stream
    joins the device-resident assembly table through the Pallas sorted-
    join kernels (merfin-completeness.C:49-143 as a sorted-join, no
    device sort — MKDB slices are sorted on disk).  The asm table is
    built once outside the timer (the CLI's per-process load phase,
    like every other mode bench)."""
    import io

    from merfin_tpu.io.mkdb import KmerDB
    from merfin_tpu.modes.completeness import build_asm_table, run_completeness

    import jax

    from merfin_tpu.modes.completeness import (_block_stats_jit,
                                               _slice_bounds)

    with tempfile.TemporaryDirectory() as td:
        rdb = KmerDB.create(os.path.join(td, "r"), k, keys, read_vals)
        adb = KmerDB.create(os.path.join(td, "a"), k, keys, asm_vals)
        table = build_asm_table(adb, k, 1 << 23)
        run_completeness(rdb, adb, peak=12.0, log=io.StringIO(),
                         asm_table=table)  # warm

        def run():
            t0 = time.perf_counter()
            run_completeness(rdb, adb, peak=12.0, log=io.StringIO(),
                             asm_table=table)
            return keys.size / (time.perf_counter() - t0)

        rate, spread = _best_of(run)

        # resident-stream rate: the same block program on device-resident
        # inputs — what a locally-attached chip sees.  The e2e number
        # above is wire-bound on this dev tunnel: host->device transfers
        # run at ~40 MB/s once any program has dispatched (docs/PERF.md
        # r4), a ~2500x artifact vs production PCIe/DMA.
        import jax.numpy as jnp

        B = 1 << 23
        n = keys.size
        k_lo = np.full(B, 0xFFFFFFFF, np.uint32)
        k_hi = np.full(B, 0xFFFF, np.uint16)
        k_lo[:n] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        k_hi[:n] = (keys >> np.uint64(32)).astype(np.uint16)
        qk = np.zeros(B, np.uint8)
        qk[:n] = np.minimum(np.maximum(read_vals // 12, 1), 255)  # readK-like
        lo_d, hi_d, qk_d = map(jax.device_put, (k_lo, k_hi, qk))
        bounds_dev = jnp.asarray(_slice_bounds(k))
        bs_fn = _block_stats_jit(table)
        r = bs_fn(table.tree(), bounds_dev, lo_d, hi_d, qk_d)
        np.asarray(r[0])

        def run_res():
            t0 = time.perf_counter()
            r = bs_fn(table.tree(), bounds_dev, lo_d, hi_d, qk_d)
            np.asarray(r[0]), np.asarray(r[1])
            return n / (time.perf_counter() - t0)

        resident, _ = _best_of(run_res)
    return rate, spread, resident


def _bench_count(k=21, genome_bases=1 << 22, coverage=16, chunk=1 << 23):
    """Device k-mer counting rate (the meryl-count replacement):
    device-RESIDENT accumulation — per-chunk sort+reduce and run
    collapses stay on HBM, only final uniques cross the link.

    The workload is coverage-realistic (a genome read at ``coverage``x
    in 64 kb reads): meryl counts read SETS, where bases >> distinct
    k-mers; counting 1x random bases (the old workload) makes every
    window distinct and measures nothing but the result fetch."""
    from merfin_tpu.count.counter import count_sequences
    from merfin_tpu.io.fasta import CodedSequence

    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, size=genome_bases).astype(np.uint8)
    read_len = 1 << 16
    reads = [CodedSequence(f"r{c}_{o}", genome[o: o + read_len])
             for c in range(coverage)
             for o in range(0, genome_bases, read_len)]
    n_bases = sum(r.codes().shape[0] for r in reads)

    def run():
        t0 = time.perf_counter()
        keys, vals, total = count_sequences(iter(reads), k, chunk=chunk)
        dt = time.perf_counter() - t0
        assert total == sum(r.codes().shape[0] - k + 1 for r in reads)
        assert int(vals.sum()) == total
        return n_bases / dt

    run()                       # warm: compiles chunk/collapse/slice programs
    rate, _ = _best_of(run, rounds=2)
    return rate


def _bench_variants(k=21, n_clusters=1500, spacing=120, devscore=False):
    """End-to-end variant evaluation: clusters/s through run_variants
    (enumeration + scoring + selection, -polish policy).

    devscore=False keeps the host-scorer configuration every prior
    round measured (comparable history).  devscore=True measures the
    CLI's current -polish default (fused device scoring, no -prob):
    on this tunneled rig the 1500-cluster world fits ONE span, so that
    rate is dominated by a single dispatch round trip — at production
    scale a budgeted batch amortizes it over ~18k clusters."""
    import io
    import random

    from merfin_tpu.io.fasta import SeqFile
    from merfin_tpu.io.vcf import VcfFile
    from merfin_tpu.modes.variants import run_variants
    from merfin_tpu.table.lookup import DeviceLookup
    from merfin_tpu.variants.device_score import DeviceScorer
    from merfin_tpu.kcore.pack import kmers_from_codes_np, encode_bases

    rng = random.Random(9)
    alt_of = {"A": "C", "C": "G", "G": "T", "T": "A"}
    n = n_clusters * spacing + 2 * k
    genome = "".join(rng.choice("ACGT") for _ in range(n))
    asm = list(genome)
    positions = [spacing * i + k for i in range(n_clusters)]
    for p in positions:
        asm[p] = alt_of[asm[p]]
    asm = "".join(asm)

    def canon_counts(s, mult):
        codes = encode_bases(s)
        f, r, valid = kmers_from_codes_np(codes, k)
        canon = np.minimum(f, r)[valid]
        ks, cs = np.unique(canon, return_counts=True)
        return ks.astype(np.uint64), (cs * mult).astype(np.uint32)

    rk, rv = canon_counts(genome, 30)
    ak, av = canon_counts(asm, 1)
    read_lookup = DeviceLookup(rk, rv, k)
    asm_lookup = DeviceLookup(ak, av, k)
    scorer = DeviceScorer(read_lookup, asm_lookup, k, 30.0, None,
                          max_value=int(rv.max()), exact_max=True) \
        if devscore else None

    with tempfile.TemporaryDirectory() as td:
        fasta = os.path.join(td, "asm.fasta")
        with open(fasta, "w") as f:
            f.write(">c\n" + asm + "\n")
        vcfp = os.path.join(td, "c.vcf")
        with open(vcfp, "w") as f:
            f.write("##fileformat=VCFv4.2\n##contig=<ID=c>\n"
                    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
            for p in positions:
                f.write(f"c\t{p + 1}\t.\t{asm[p]}\t{genome[p]}\t30\tPASS\t.\tGT\t1/1\n")
        # warmup: one full pass primes every compiled shape the timed
        # pass will dispatch (the timed workload's own padded query
        # sizes, not a subset's) so the rate measures steady-state
        # evaluation, not one-time remote compiles
        wv = VcfFile(vcfp, log=io.StringIO())
        wv.merge_clusters(k, 15, False, log=io.StringIO())
        run_variants("polish", SeqFile(fasta), wv, k,
                     read_lookup.lookup_np, asm_lookup.lookup_np,
                     peak=30.0, prob_table=None,
                     out_name=os.path.join(td, "warm"), log=io.StringIO(),
                     scorer=scorer)

        vcf = VcfFile(vcfp, log=io.StringIO())
        vcf.merge_clusters(k, 15, False, log=io.StringIO())
        n_real = sum(len(v) for v in vcf.by_chrom.values())
        t0 = time.perf_counter()
        res = run_variants("polish", SeqFile(fasta), vcf, k,
                           read_lookup.lookup_np, asm_lookup.lookup_np,
                           peak=30.0, prob_table=None,
                           out_name=os.path.join(td, "out"),
                           log=io.StringIO(), scorer=scorer)
        dt = time.perf_counter() - t0
        assert res["records"] == n_clusters, res
    return n_real / dt


def _bench_variants_heavy(k=21, n_clusters=3, n_vars=15, spacing=8):
    """Heavy variant evaluation: clusters of 15 variants (SNPs,
    multiallelic sites, insertions) merged into ONE cluster each
    (spacing < 2k), enumerating 2^11 x 3^4 = 165,888 candidate paths
    per cluster (~24M k-mer windows each) — past the reference's worst
    case before the -comb split (merfin-globals.H:241,
    merfin-variants.C:213-217).

    Measures -polish clusters/s through run_variants twice on the same
    input: with the fused device scorer (device-reduced num_m/totdk),
    and with the host scorer on all cores (2-cluster subset — it runs
    ~10x longer per cluster).  Output equality is checked on the
    common subset.  Returns (device_rate, host_rate, identical).
    """
    import io
    import random

    from merfin_tpu.io.fasta import SeqFile
    from merfin_tpu.io.vcf import VcfFile
    from merfin_tpu.modes.variants import run_variants
    from merfin_tpu.table.lookup import DeviceLookup
    from merfin_tpu.variants.device_score import DeviceScorer
    from merfin_tpu.kcore.pack import kmers_from_codes_np, encode_bases

    rng = random.Random(17)
    alt_of = {"A": "C", "C": "G", "G": "T", "T": "A"}
    gap = 400                                  # between-cluster spacing > 2k
    n = n_clusters * (n_vars * spacing + gap) + 2 * k
    genome = "".join(rng.choice("ACGT") for _ in range(n))
    asm = list(genome)

    rows = []   # (pos0, REF, ALT-field, GT) in assembly coordinates
    for c in range(n_clusters):
        base = c * (n_vars * spacing + gap) + k
        for v in range(n_vars):
            p = base + v * spacing
            kind = v % 4
            if kind == 0:      # true correction: asm error, ALT = truth
                asm[p] = alt_of[asm[p]]
                rows.append((p, asm[p], genome[p], "1/1"))
            elif kind == 1:    # spurious SNP
                rows.append((p, asm[p], alt_of[asm[p]], "1/1"))
            elif kind == 2:    # multiallelic spurious site (3 alleles)
                a1 = alt_of[asm[p]]
                rows.append((p, asm[p], f"{a1},{alt_of[a1]}", "1/2"))
            else:              # 1-bp insertion (spurious)
                rows.append((p, asm[p], asm[p] + rng.choice("ACGT"), "1/1"))
    asm = "".join(asm)

    def canon_counts(s, mult):
        f, r, valid = kmers_from_codes_np(encode_bases(s), k)
        canon = np.minimum(f, r)[valid]
        ks, cs = np.unique(canon, return_counts=True)
        return ks.astype(np.uint64), (cs * mult).astype(np.uint32)

    rk, rv = canon_counts(genome, 30)
    ak, av = canon_counts(asm, 1)
    read_lookup = DeviceLookup(rk, rv, k)
    asm_lookup = DeviceLookup(ak, av, k)
    scorer = DeviceScorer(read_lookup, asm_lookup, k, 30.0, None,
                          max_value=int(rv.max()), exact_max=True)

    with tempfile.TemporaryDirectory() as td:
        fasta = os.path.join(td, "asm.fasta")
        with open(fasta, "w") as f:
            f.write(">c\n" + asm + "\n")
        vcfp = os.path.join(td, "c.vcf")
        with open(vcfp, "w") as f:
            f.write("##fileformat=VCFv4.2\n##contig=<ID=c>\n"
                    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
            for p, ref, alt, gt in rows:
                f.write(f"c\t{p + 1}\t.\t{ref}\t{alt}\t30\tPASS\t.\tGT\t{gt}\n")

        def once(scorer_arg, out, threads=0):
            vcf = VcfFile(vcfp, log=io.StringIO())
            vcf.merge_clusters(k, 15, False, log=io.StringIO())
            n_real = sum(len(v) for v in vcf.by_chrom.values())
            t0 = time.perf_counter()
            run_variants("polish", SeqFile(fasta), vcf, k,
                         read_lookup.lookup_np, asm_lookup.lookup_np,
                         peak=30.0, prob_table=None,
                         out_name=os.path.join(td, out),
                         log=io.StringIO(), threads=threads,
                         scorer=scorer_arg,
                         query_budget=1 << 22)   # one cluster per dispatch
            return n_real / (time.perf_counter() - t0)

        once(scorer, "warm_dev")                 # compile every shape
        dev_rate = max(once(scorer, "dev"), once(scorer, "devb"))
        once(None, "warm_host")                  # compile host-path shapes
        host_rate = once(None, "host")           # all-cores host scorer
        a = open(os.path.join(td, "dev.polish.vcf"), "rb").read()
        b = open(os.path.join(td, "host.polish.vcf"), "rb").read()
        ident = a == b
    return dev_rate, host_rate, ident


_WATCHDOG = {"deadline": None, "section": "", "emit": None}


def _watchdog_loop():
    """Emit the partial result and hard-exit if a section stalls: the
    axon tunnel can wedge a dispatch/compile indefinitely (docs/PERF.md
    r4 'tunnel transport'); a bench that hangs reports nothing."""
    while True:
        time.sleep(10)
        dl = _WATCHDOG["deadline"]
        if dl is not None and time.time() > dl and _WATCHDOG["emit"]:
            _WATCHDOG["emit"](stalled=_WATCHDOG["section"])
            os._exit(0)


def _section(name: str, seconds: float, fn, extra: dict):
    """Run one bench section under the watchdog; failures/stalls are
    recorded instead of killing the whole bench."""
    import threading

    if not getattr(_section, "_started", False):
        _section._started = True
        threading.Thread(target=_watchdog_loop, daemon=True).start()
    _WATCHDOG["section"] = name
    _WATCHDOG["deadline"] = time.time() + seconds
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — a bench section must not kill the run
        extra[f"{name}_error"] = repr(e)[:200]
    finally:
        _WATCHDOG["deadline"] = None


def main() -> None:
    from merfin_tpu.config import ensure_x64

    ensure_x64()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MERFIN_TPU_CACHE", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    k = 21
    n_table = 1 << int(os.environ.get("BENCH_LOG_TABLE", 23))
    n_query = 1 << int(os.environ.get("BENCH_LOG_QUERY", 23))
    rng = np.random.default_rng(0)

    keys = np.unique(rng.integers(0, 1 << (2 * k), size=n_table).astype(np.uint64))
    vals = rng.integers(1, 1000, size=keys.size).astype(np.uint32)
    asm_vals = rng.integers(1, 3, size=keys.size).astype(np.uint32)

    # queries: half hits, half misses
    hit_idx = rng.integers(0, keys.size, size=n_query // 2)
    misses = rng.integers(0, 1 << (2 * k), size=n_query // 2).astype(np.uint64)
    q_np = np.concatenate([keys[hit_idx], misses])
    rng.shuffle(q_np)

    # CPU baseline: single-threaded numpy searchsorted (reference-style probe)
    cpu_n = 1 << 20
    qc = q_np[:cpu_n]
    t0 = time.perf_counter()
    idx = np.searchsorted(keys, qc)
    idx = np.minimum(idx, keys.size - 1)
    hit = keys[idx] == qc
    _ = np.where(hit, vals[idx], 0)
    cpu_rate = cpu_n / (time.perf_counter() - t0)

    def mm(pair):
        return [round(pair[0]), round(pair[1])]

    extra = {"cpu_lookups_per_sec": round(cpu_rate)}
    # the headline includes the resident rate: it is the chip's real
    # join throughput with the same dispatch queue, minus only the bulk
    # result fetch that rides this rig's throttled tunnel (the verdict's
    # "tunnel-independent headline")
    rates = {"v1": 0.0, "v4": 0.0, "v4_resident": 0.0}

    def emit(stalled=None):
        best = max(rates.values())
        out_extra = dict(extra)
        if stalled:
            out_extra["stalled_section"] = stalled
        print(json.dumps({
            "metric": "kmer_exact_lookups_per_sec_per_chip",
            "value": round(best),
            "unit": "lookups/s",
            "vs_baseline": round(best / cpu_rate, 2),
            "extra": out_extra,
        }), flush=True)

    _WATCHDOG["emit"] = emit

    def sec_join():
        def on_kernel(name, rate, sp):
            if name in rates:
                rates[name] = rate
            extra[f"join_{name}_lookups_per_sec"] = round(rate)
            extra[f"join_{name}_spread"] = mm(sp)

        _bench_join(keys, vals, k, q_np, on_kernel=on_kernel)

    def sec_hist():
        hist_rate, hist_spread = _best_of(_bench_hist(keys, vals, asm_vals, k))
        extra["hist_bases_per_sec"] = round(hist_rate)
        extra["hist_spread"] = mm(hist_spread)

    def sec_hist_even():
        # even-k datapoint (VERDICT r3 item 7): even-k sortjoin carries
        # the palindrome multiplier through the device sort
        k_even = 20
        rng_e = np.random.default_rng(4)
        keys_e = np.unique(rng_e.integers(
            0, 1 << (2 * k_even), size=n_table).astype(np.uint64))
        vals_e = rng_e.integers(1, 1000, size=keys_e.size).astype(np.uint32)
        asm_e = rng_e.integers(1, 3, size=keys_e.size).astype(np.uint32)
        extra["hist_bases_per_sec_even_k"] = round(_bench_hist(
            keys_e, vals_e, asm_e, k_even, n_bases=1 << 24)())

    def sec_variants():
        rate, vspread = _best_of(_bench_variants, rounds=2)
        extra["variant_clusters_per_sec"] = round(rate, 1)
        extra["variant_clusters_spread"] = [round(vspread[0], 1),
                                            round(vspread[1], 1)]
        # the CLI's current -polish default (fused device scoring):
        # this 1500-cluster world fits ONE span, so the rate is
        # dominated by a single dispatch round trip on this rig — a
        # separate labeled datapoint, not the primary
        extra["variant_clusters_per_sec_devscore"] = round(
            _bench_variants(devscore=True), 1)

    def sec_heavy():
        hv_dev, hv_host, hv_ident = _bench_variants_heavy()
        extra["variant_clusters_per_sec_heavy"] = round(hv_dev, 2)
        extra["variant_clusters_per_sec_heavy_hostcores"] = round(hv_host, 2)
        extra["variant_heavy_dev_vs_host"] = round(hv_dev / hv_host, 2)
        extra["variant_heavy_outputs_identical"] = hv_ident

    def sec_count():
        extra["count_bases_per_sec"] = round(_bench_count())

    def sec_completeness():
        compl_rate, compl_spread, compl_res = _bench_completeness(
            keys, vals, asm_vals, k)
        extra["completeness_kmers_per_sec"] = round(compl_rate)
        extra["completeness_spread"] = mm(compl_spread)
        extra["completeness_kmers_per_sec_resident"] = round(compl_res)

    # Emit after EVERY section: the last stdout line is always the most
    # complete result, so a bench killed mid-run (driver budget, tunnel
    # wedge) still reports everything finished so far.
    #
    # The whole run fits a global budget (BENCH_BUDGET_S, default 3000 s)
    # so the driver's own timeout can't truncate the artifact (r4 died
    # rc=124 with heavy/count absent).  Sections run most-important-
    # first; each gets min(its cap, what's left of the budget) on the
    # watchdog, and is SKIPPED (recorded in extra) rather than started
    # when the remaining budget can't plausibly cover its compiles.
    budget = float(os.environ.get("BENCH_BUDGET_S", "3000"))
    t_end = time.time() + budget

    if os.environ.get("BENCH_SKIP_JOIN") == "1":   # CPU smoke-testing:
        extra["join_skipped"] = "BENCH_SKIP_JOIN"  # interpret-mode Pallas
    else:                                          # would wedge the budget
        _section("join", min(1200.0, budget), sec_join, extra)
    emit()
    if os.environ.get("BENCH_SKIP_MODES") != "1":
        for name, cap, need, fn in (
            ("variants_heavy", 900, 240, sec_heavy),
            ("count", 420, 90, sec_count),
            ("completeness", 900, 240, sec_completeness),
            ("hist", 700, 200, sec_hist),
            ("hist_even_k", 500, 150, sec_hist_even),
            ("variants", 600, 150, sec_variants),
        ):
            left = t_end - time.time()
            if left < need:
                extra[f"{name}_skipped"] = f"budget ({round(left)}s left)"
                emit()
                continue
            _section(name, min(float(cap), left), fn, extra)
            emit()


if __name__ == "__main__":
    main()
