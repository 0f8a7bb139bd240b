#!/usr/bin/env python3
"""Reshape an Arrow (GenomicConsensus) VCF for merfin consumption.

Equivalent of scripts/reformat_arrow/reshape_arrow.sh without the
bcftools dependency:
  * commas inside record fields become ';' (Arrow writes multi-valued
    INFO),
  * the INFO "DP=x" is rewritten into FORMAT/SAMPLE columns
    "GT:DP<tab>1/1:x" with INFO=".",
  * FORMAT/IND columns are appended to the #CHROM header line and the
    extra FORMAT header lines are injected
    (scripts/reformat_arrow/extra_header.vcf).

Usage: reshape_arrow.py <in.vcf[.gz]> [out.vcf]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from merfin_tpu.io.compressed import open_read_text, open_write_text  # noqa: E402

EXTRA_HEADERS = [
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
    '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read Depth">',
]


def main() -> int:
    if len(sys.argv) < 2:
        sys.stderr.write(__doc__)
        return 1
    inp = sys.argv[1]
    base = inp[:-3] if inp.endswith(".gz") else inp
    out_path = sys.argv[2] if len(sys.argv) > 2 else base[: -len(".vcf")] + ".reshaped.vcf"

    with open_read_text(inp) as f, open_write_text(out_path) as out:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("##"):
                out.write(line + "\n")
                if line.startswith("##fileformat"):
                    for h in EXTRA_HEADERS:
                        out.write(h + "\n")
                continue
            if line.startswith("#CHROM"):
                out.write(line + "\tFORMAT\tIND\n")
                continue
            fields = line.replace(",", ";").split("\t")
            if len(fields) < 8:
                continue
            info = fields[7]
            dp = "."
            for entry in info.split(";"):
                if entry.startswith("DP="):
                    dp = entry[3:]
            fields[7] = "."
            fields = fields[:8] + ["GT:DP", f"1/1:{dp}"]
            out.write("\t".join(fields) + "\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
