#!/usr/bin/env python3
"""Apply a polish VCF to a FASTA — the `bcftools consensus -H 1` step of
the reference pipeline (scripts/parallel1/consensus.sh:20-31), without
the bcftools dependency.

Applies the FIRST ALT of each record (haplotype 1), left to right, with
coordinate shifting for indels.  Records must be non-overlapping in REF
coordinates (merfin emits per-cluster winners, which are).

Usage: consensus.py <asm.fasta> <polished.vcf> <out.fasta>
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from merfin_tpu.io.compressed import open_read_text  # noqa: E402
from merfin_tpu.io.fasta import SeqFile  # noqa: E402


def load_edits(vcf_path):
    edits = {}
    with open_read_text(vcf_path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            if len(fields) < 5:
                continue
            chrom, pos, _, ref, alts = fields[:5]
            alt = alts.split(",")[0]        # haplotype 1
            edits.setdefault(chrom, []).append((int(pos) - 1, ref, alt))
    for v in edits.values():
        v.sort()
    return edits


def main() -> int:
    if len(sys.argv) != 4:
        sys.stderr.write(__doc__)
        return 1
    asm, vcf, out_path = sys.argv[1:4]
    edits = load_edits(vcf)

    applied = mismatched = 0
    with open(out_path, "w") as out:
        for seq in SeqFile(asm):
            s = seq.bases.decode("ascii")
            parts = []
            cursor = 0
            for pos, ref, alt in edits.get(seq.ident, []):
                if pos < cursor:
                    print(f"WARNING: overlapping edit at {seq.ident}:{pos + 1}, skipped",
                          file=sys.stderr)
                    continue
                if s[pos : pos + len(ref)] != ref:
                    mismatched += 1
                    print(f"WARNING: REF mismatch at {seq.ident}:{pos + 1} "
                          f"(expected {ref}, found {s[pos:pos + len(ref)]}), skipped",
                          file=sys.stderr)
                    continue
                parts.append(s[cursor:pos])
                parts.append(alt)
                cursor = pos + len(ref)
                applied += 1
            parts.append(s[cursor:])
            new = "".join(parts)
            out.write(f">{seq.ident}\n")
            for i in range(0, len(new), 60):
                out.write(new[i : i + 60] + "\n")

    print(f"applied {applied} edits ({mismatched} REF mismatches skipped) -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
