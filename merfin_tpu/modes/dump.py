"""-dump mode driver: per-base readK/asmK/K* tracks.

Parity targets (merfin-dump.C:72-104):
  * rows "ident\tpos\treadK\tasmK\tk*" with %.2f floats, skipping
    positions where all three are 0.0,
  * with -skipMissing no output file is opened at all,
  * per-sequence stderr line "ident\tmissing\tcum_missing\tcum_kasm"
    (the last two columns are CUMULATIVE, unlike -hist),
  * sequences emit in input order (the reference forces in-order output
    for dump, merfin.C:384).

Row formatting uses the native C++ formatter when available, fanned
over a thread pool per CHUNK (ctypes + gzip release the GIL) — the
formatter of chunk i runs while chunk i+1 computes on the device, and
the single writer restores order.  For .gz outputs each chunk is its
own gzip member (readers see one stream; resume offsets stay
per-sequence).
"""

from __future__ import annotations

import gzip
import sys

from merfin_tpu.io.fasta import SeqFile
from merfin_tpu.modes.engine import KstarEngine
from merfin_tpu.utils.checkpoint import Checkpoint, truncate_to


def run_dump(
    engine: KstarEngine,
    seq_file: SeqFile,
    out_name: str,
    skip_missing: bool = False,
    log=sys.stderr,
    resume: bool = False,
):
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    from merfin_tpu import native
    from merfin_tpu.parallel import multihost as mh

    g_missing = 0
    g_kasm = 0
    out = None
    fmt_pool = ThreadPoolExecutor(max(2, min(8, _os.cpu_count() or 2)))

    # Multi-host, two shapes (cf. run_hist):
    #  * striped — each process takes its sequence stripe;
    #  * host-spanning mesh (engine.spans_hosts) — every process drives
    #    the same sequences; each host emits only the chunk rows its
    #    devices computed, keyed by global chunk ordinal.
    # Either way rank 0 merges the part files back into the single
    # in-order output (merfin.C:384 contract).
    multi = mh.is_active()
    spans = bool(getattr(engine, "spans_hosts", False))
    part = None
    pid, pcount = 0, 1
    if multi:
        pid, pcount = mh.process_info()

    # Multi-host resume: every rank writes its own part file (striped —
    # its sequence stripe; spans — its devices' chunk rows), so both
    # shapes keep per-rank checkpoints with resumable parts.  In spans
    # mode the loop runs collectives per sequence, so ranks must resume
    # in lockstep: if their checkpoints disagree (killed between a
    # collective and the save), the mode restarts fresh — correct,
    # just unamortized.
    ckpt = Checkpoint(f"{out_name}.rank{pid}" if multi else out_name,
                      "dump", enabled=resume)
    skip = 0
    part_resume = None
    restored_chunk_base = 0
    if resume and (st := ckpt.load()) is not None:
        skip = st["seqs_done"]
        g_missing = st["accum"]["missing"]
        g_kasm = st["accum"]["kasm"]
        restored_chunk_base = st["accum"].get("chunk_base", 0)
        if multi:
            part_resume = (st["accum"].get("n_extents", 0),
                           st["output_offset"])
            from merfin_tpu.utils.partmerge import can_resume_part

            if not skip_missing and not can_resume_part(
                    out_name, pid, *part_resume):
                # torn part/idx state: restart this rank fresh rather
                # than resuming a skip whose rows are gone (in spans
                # mode the consensus below then restarts every rank)
                print("-- Part file state unusable; restarting fresh.",
                      file=log)
                skip = 0
                part_resume = None
                restored_chunk_base = 0
                g_missing = 0
                g_kasm = 0
        elif not skip_missing:
            truncate_to(out_name, st["output_offset"])
        if skip:
            print(f"-- Resuming after {skip} sequences.", file=log)
    if multi and spans and resume:
        skips = mh.allgather_scalar(float(skip))
        if not (skips == skips[0]).all():
            print("-- Rank checkpoints disagree; restarting -dump fresh.",
                  file=log)
            skip = 0
            part_resume = None
            restored_chunk_base = 0
            g_missing = 0
            g_kasm = 0
    if multi and not skip_missing:
        from merfin_tpu.utils.partmerge import PartWriter

        part = PartWriter(out_name, pid, resume_state=part_resume)

    def ckpt_accum() -> dict:
        a = {"missing": g_missing, "kasm": g_kasm}
        if part is not None:
            a["n_extents"] = len(part.extents)
        return a

    is_gz = out_name is not None and out_name.endswith(".gz")
    seq_idx = 0

    def format_block(ident, start, rk, ak, km) -> bytes:
        block = native.format_dump_rows(ident, start, rk, ak, km)
        if block is None:           # pure-Python fallback
            parts = []
            for off in range(rk.shape[0]):
                r, a, m = rk[off], ak[off], km[off]
                if r != 0.0 or a != 0.0 or m != 0.0:
                    parts.append(
                        f"{ident}\t{start + off}\t{r:.2f}\t{a:.2f}\t{m:.2f}\n")
            block = "".join(parts).encode("ascii")
        return block

    def format_and_zip(ident, start, rk, ak, km) -> bytes:
        """Worker task: native row formatting (+ per-chunk gzip member).
        Runs on fmt_pool — both the ctypes formatter and gzip release
        the GIL, so chunks format while the next one computes."""
        data = format_block(ident, start, rk, ak, km)
        return gzip.compress(data, compresslevel=1) if is_gz else data

    def write_seq(idx, blocks: list[bytes]) -> int:
        """Emit one sequence's (pre-compressed) rows; returns offset."""
        nonlocal out
        if skip_missing:
            return 0
        data = b"".join(blocks)
        if part is not None:
            part.write_seq(idx, data)
            if ckpt.enabled:
                part.flush_idx()
            return part.offset
        if out is None:
            out = open(out_name, "ab" if (resume and skip) else "wb")
        out.write(data)
        out.flush()
        return out.tell()

    # Fragmented assemblies: pack many small sequences into one dispatch
    # (engine.dump_group), mirroring run_hist's grouping.
    from merfin_tpu.modes.engine import SEG_MAX

    cap = getattr(engine, "dump_group_capacity",
                  getattr(engine, "group_capacity", 0)) \
        if hasattr(engine, "dump_group") else 0
    group: list = []          # (seq_idx, seq)
    group_pos = 0

    def flush_group():
        nonlocal group, group_pos, g_kasm, g_missing
        if not group:
            return
        results = engine.dump_group([s.codes() for _, s in group])
        # with -skipMissing nothing is written: don't format/compress
        futs = [fmt_pool.submit(format_and_zip, s.ident, 0, rk, ak, km)
                for (_, s), (rk, ak, km, _, _) in zip(group, results)] \
            if not skip_missing else [None] * len(group)
        offset = 0
        for (idx, s), (rk, ak, km, kasm, kmis), fut in zip(group, results,
                                                           futs):
            # per-sequence Processing/Output interleaving (merfin-dump.C)
            print(f"Processing sequence {s.ident} for dumping", file=log)
            print(f"Output sequence {s.ident}", file=log)
            offset = write_seq(idx, [fut.result()] if fut is not None else [])
            g_kasm += kasm
            g_missing += kmis
            print(f"{s.ident}\t{kmis}\t{g_missing}\t{g_kasm}", file=log)
        ckpt.save(group[-1][0], offset, ckpt_accum())
        group = []
        group_pos = 0

    chunk_base = restored_chunk_base   # global chunk ordinal (spans keys)
    try:
        from merfin_tpu.utils.prefetch import prefetch_iter

        for seq in prefetch_iter(seq_file.iter_coded()):
            seq_idx += 1
            if seq_idx <= skip:
                continue
            if multi and not spans and (seq_idx - 1) % pcount != pid:
                continue
            if multi and spans:
                print(f"Processing sequence {seq.ident} for dumping", file=log)
                kasm_l = 0
                mis_l = 0
                for ordinal, start, rk, ak, km, kasm, kmis in \
                        engine.dump_sequence_local(seq.codes()):
                    kasm_l += kasm
                    mis_l += kmis
                    if not skip_missing:
                        part.write_seq(chunk_base + ordinal,
                                       format_and_zip(seq.ident, start,
                                                      rk, ak, km))
                n_pos = max(0, seq.length - engine.k + 1)
                chunk_base += -(-n_pos // engine.chunk)
                print(f"Output sequence {seq.ident}", file=log)
                import numpy as _np

                merged = mh.merge_array_across_hosts(
                    _np.asarray([kasm_l, mis_l], dtype=_np.int64))
                g_kasm += int(merged[0])
                seq_missing = int(merged[1])
                g_missing += seq_missing
                print(f"{seq.ident}\t{seq_missing}\t{g_missing}\t{g_kasm}",
                      file=log)
                if ckpt.enabled:
                    if part is not None:
                        part.flush_idx()
                    acc = ckpt_accum()
                    acc["chunk_base"] = chunk_base
                    ckpt.save(seq_idx,
                              part.offset if part is not None else 0, acc)
                continue
            need = seq.length + engine.k - 1
            if cap and need <= cap:
                if group_pos + need > cap or len(group) >= SEG_MAX:
                    flush_group()
                group.append((seq_idx, seq))
                group_pos += need
                continue
            flush_group()
            print(f"Processing sequence {seq.ident} for dumping", file=log)
            seq_missing = 0
            futs = []
            for start, rk, ak, km, kasm, kmis in engine.dump_sequence(seq.codes()):
                g_kasm += kasm
                seq_missing += kmis
                if skip_missing:
                    continue
                futs.append(fmt_pool.submit(
                    format_and_zip, seq.ident, start, rk, ak, km))
            print(f"Output sequence {seq.ident}", file=log)
            offset = write_seq(seq_idx, [f.result() for f in futs])
            g_missing += seq_missing
            print(f"{seq.ident}\t{seq_missing}\t{g_missing}\t{g_kasm}", file=log)
            ckpt.save(seq_idx, offset, ckpt_accum())
        flush_group()
    finally:
        fmt_pool.shutdown()
        if out is not None:
            out.close()
        if part is not None:
            part.close()

    if multi:
        if not spans:   # spans mode merged per sequence already
            g_missing = int(mh.merge_scalar_across_hosts(g_missing))
            g_kasm = int(mh.merge_scalar_across_hosts(g_kasm))
        mh.barrier("dump-parts")
        # resume window closes here: a crash during the merge re-runs
        # the mode from scratch instead of resuming against consumed
        # part files (utils/checkpoint.py)
        ckpt.done()
        mh.barrier("dump-ckpt-clear")
        if pid == 0 and not skip_missing:
            from merfin_tpu.utils.partmerge import merge_parts

            merge_parts(out_name, pcount)
        mh.barrier("dump-merged")

    ckpt.done()
    return {"missing": g_missing, "kasm": g_kasm}
