#!/usr/bin/env python3
"""QV via k-mer set algebra — the scripts/qv.sh equivalent.

Reference pipeline (scripts/qv.sh:33-44):
    meryl intersect read asm -> read_and_asm
    meryl divide-round peak read_and_asm -> kr
    meryl subtract asm kr -> ka-extra          (excessive copies in asm)
    QV = -10 log10(1 - (1 - excess/total)^(1/k))

Usage: qv.py <asm.mkdb> <read.mkdb> <peak>
Output: asm.mkdb <tab> excessive <tab> total <tab> qv <tab> error
"""

import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from merfin_tpu.io.mkdb import KmerDB
from merfin_tpu.count import algebra


def qv_of(asm_db: KmerDB, read_db: KmerDB, peak: float) -> dict:
    with tempfile.TemporaryDirectory() as tmp:
        inter = algebra.intersect(os.path.join(tmp, "i"), read_db, asm_db)
        kr = algebra.divide_round(os.path.join(tmp, "kr"), inter, peak)
        extra = algebra.subtract(os.path.join(tmp, "ex"), asm_db, kr)
        asm_only = algebra.statistics(extra)["present"]
    total = algebra.statistics(asm_db)["present"]
    k = asm_db.k
    base = asm_only / total
    inner = 1.0 - (1.0 - base) ** (1.0 / k)
    err = inner
    qv = -10.0 * math.log10(inner) if inner > 0 else math.inf
    return {"excessive": asm_only, "total": total, "qv": qv, "error": err}


def main() -> int:
    if len(sys.argv) < 4:
        sys.stderr.write(__doc__)
        return 1
    asm_path, read_path, peak = sys.argv[1], sys.argv[2], float(sys.argv[3])
    r = qv_of(KmerDB(asm_path), KmerDB(read_path), peak)
    print(f"{asm_path}\t{r['excessive']}\t{r['total']}\t{r['qv']}\t{r['error']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
