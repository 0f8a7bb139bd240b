"""Text interop with meryl databases.

``meryl print <db>`` emits one "KMER<tab>count" line per canonical k-mer.
These helpers convert that text form to/from MKDB so real meryl databases
(built outside this environment) can be imported, and our outputs can be
diffed against meryl's (the reference scripts rely on `meryl print`,
e.g. scripts/qv.sh:41).
"""

from __future__ import annotations

import numpy as np

from merfin_tpu.io.compressed import open_read_text, open_write_text
from merfin_tpu.io.mkdb import KmerDB
from merfin_tpu.kcore.pack import encode_bases

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def decode_kmer(key: int, k: int) -> str:
    out = bytearray(k)
    for i in range(k - 1, -1, -1):
        out[i] = _BASES[key & 3]
        key >>= 2
    return out.decode("ascii")


def encode_kmer(s: str) -> int:
    codes = encode_bases(s)
    assert np.all(codes < 4), f"invalid base in k-mer '{s}'"
    key = 0
    for c in codes:
        key = (key << 2) | int(c)
    return key


def import_text(text_path: str, db_path: str, k: int | None = None, canonicalize: bool = True) -> KmerDB:
    """Build an MKDB from 'KMER<tab>count' lines.

    meryl may use a different canonical convention than ours; when
    ``canonicalize`` we re-canonicalize each k-mer (min of fwd/rc under
    A<C<G<T packing) and re-sort, summing duplicates.
    """
    keys: list[int] = []
    vals: list[int] = []
    with open_read_text(text_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            mer, cnt = parts
            if k is None:
                k = len(mer)
            assert len(mer) == k, "mixed k-mer lengths in input"
            keys.append(encode_kmer(mer))
            vals.append(int(cnt))
    assert k is not None, "empty input"

    karr = np.asarray(keys, dtype=np.uint64)
    varr = np.asarray(vals, dtype=np.uint64)

    if canonicalize and karr.size:
        from merfin_tpu.kcore.pack import revcomp_np

        karr = np.minimum(karr, revcomp_np(karr, k))

    order = np.argsort(karr, kind="stable")
    karr, varr = karr[order], varr[order]
    if karr.size:
        uniq, start = np.unique(karr, return_index=True)
        sums = np.add.reduceat(varr, start)
    else:
        uniq, sums = karr, varr
    return KmerDB.create(db_path, k, uniq, sums.astype(np.uint32), total=int(varr.sum()))


def export_text(db: KmerDB, text_path: str) -> None:
    with open_write_text(text_path) as f:
        for i in range(db.distinct):
            f.write(f"{decode_kmer(int(db.keys[i]), db.k)}\t{int(db.vals[i])}\n")
