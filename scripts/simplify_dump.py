#!/usr/bin/env python3
"""Pair two -dump tracks for K* correlation analysis.

Equivalent of scripts/cartesian_plot/simplify_dump.sh: takes two -dump
outputs over the same assembly (e.g. from two read sets), pairs their
per-position K* values (readK==0 -> "NA"), and emits
"count<tab>k1<tab>k2" aggregated rows sorted by count descending —
the input for a cartesian K* correlation plot.

Usage: simplify_dump.py <dump1.tsv[.gz]> <dump2.tsv[.gz]>
"""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from merfin_tpu.io.compressed import open_read_text  # noqa: E402


def rows(path):
    with open_read_text(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            # ident pos readK asmK kstar
            yield parts[2], parts[3], parts[4]


def main() -> int:
    if len(sys.argv) != 3:
        sys.stderr.write(__doc__)
        return 1
    pairs = Counter()
    for (r1, _a1, k1), (r2, _a2, k2) in zip(rows(sys.argv[1]), rows(sys.argv[2])):
        a = "NA" if float(r1) == 0 else k1
        b = "NA" if float(r2) == 0 else k2
        pairs[(a, b)] += 1

    def sort_key(item):
        (a, b), n = item
        fa = float("inf") if a == "NA" else float(a)
        return (-n, fa)

    for (a, b), n in sorted(pairs.items(), key=sort_key):
        print(f"{n}\t{a}\t{b}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
