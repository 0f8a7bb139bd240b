"""Shared test helpers."""

from __future__ import annotations

import random

import numpy as np

from merfin_tpu.io.mkdb import KmerDB
from merfin_tpu.io.meryl_text import encode_kmer


def random_dna(rng: random.Random, n: int, with_n: float = 0.0) -> str:
    alpha = "ACGT"
    out = []
    for _ in range(n):
        if with_n and rng.random() < with_n:
            out.append("N")
        else:
            out.append(alpha[rng.randrange(4)])
    return "".join(out)


def db_from_dict(counts: dict[str, int], k: int, path: str) -> KmerDB:
    """MKDB from a canonical-string-kmer -> count dict (test oracle form)."""
    items = sorted((encode_kmer(m), v) for m, v in counts.items())
    keys = np.asarray([kv[0] for kv in items], dtype=np.uint64)
    vals = np.asarray([kv[1] for kv in items], dtype=np.uint32)
    return KmerDB.create(path, k, keys, vals)


def dict_lookup_np(db: dict[str, int], k: int):
    """np lookup callable over a string-kmer dict (values for canonical keys)."""
    from merfin_tpu.io.meryl_text import decode_kmer

    def f(q: np.ndarray) -> np.ndarray:
        return np.asarray(
            [db.get(decode_kmer(int(x), k), 0) for x in q.reshape(-1)], dtype=np.uint64
        ).reshape(q.shape)

    return f
