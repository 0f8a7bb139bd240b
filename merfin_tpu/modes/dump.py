"""-dump mode driver: per-base readK/asmK/K* tracks.

Parity targets (merfin-dump.C:72-104):
  * rows "ident\tpos\treadK\tasmK\tk*" with %.2f floats, skipping
    positions where all three are 0.0,
  * with -skipMissing no output file is opened at all,
  * per-sequence stderr line "ident\tmissing\tcum_missing\tcum_kasm"
    (the last two columns are CUMULATIVE, unlike -hist),
  * sequences emit in input order (the reference forces in-order output
    for dump, merfin.C:384).
"""

from __future__ import annotations

import sys

from merfin_tpu.io.fasta import SeqFile
from merfin_tpu.modes.engine import KstarEngine


def run_dump(
    engine: KstarEngine,
    seq_file: SeqFile,
    out_name: str,
    skip_missing: bool = False,
    log=sys.stderr,
):
    g_missing = 0
    g_kasm = 0
    out = None

    from merfin_tpu import native
    from merfin_tpu.io.compressed import open_write

    try:
        for seq in seq_file.iter_coded():
            print(f"Processing sequence {seq.ident} for dumping", file=log)
            seq_missing = 0
            rows: list[bytes] = []
            for start, rk, ak, km, kasm, kmis in engine.dump_sequence(seq.codes()):
                g_kasm += kasm
                seq_missing += kmis
                if skip_missing:
                    continue
                block = native.format_dump_rows(seq.ident, start, rk, ak, km)
                if block is None:           # pure-Python fallback
                    parts = []
                    for off in range(rk.shape[0]):
                        r, a, m = rk[off], ak[off], km[off]
                        if r != 0.0 or a != 0.0 or m != 0.0:
                            parts.append(
                                f"{seq.ident}\t{start + off}\t{r:.2f}\t{a:.2f}\t{m:.2f}\n")
                    block = "".join(parts).encode("ascii")
                rows.append(block)
            print(f"Output sequence {seq.ident}", file=log)
            if not skip_missing:
                if out is None:
                    out = open_write(out_name)
                for block in rows:
                    out.write(block)
            g_missing += seq_missing
            print(f"{seq.ident}\t{seq_missing}\t{g_missing}\t{g_kasm}", file=log)
    finally:
        if out is not None:
            out.close()

    return {"missing": g_missing, "kasm": g_kasm}
