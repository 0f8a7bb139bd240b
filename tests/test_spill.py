"""Out-of-core counting: spilled runs must reproduce the in-memory DB.

VERDICT round 1, item 8: the counter previously held every distinct k-mer
in host RAM.  These tests force tiny accumulator budgets so counting and
text import take the spill + 64-slice out-of-core merge path, and assert
byte-identical databases against the in-memory path.
"""

import gzip
import os

import numpy as np
import pytest

from merfin_tpu.count.counter import count_files
from merfin_tpu.io.mkdb import KmerDB


def _same_db(a: KmerDB, b: KmerDB):
    assert a.k == b.k
    assert a.distinct == b.distinct
    assert a.total == b.total
    assert np.array_equal(np.asarray(a.keys), np.asarray(b.keys))
    assert np.array_equal(np.asarray(a.vals), np.asarray(b.vals))
    assert a.slice_offsets.tolist() == b.slice_offsets.tolist()


@pytest.fixture(scope="module")
def reads(tmp_path_factory):
    d = tmp_path_factory.mktemp("spill_reads")
    rng = np.random.default_rng(11)
    fq = d / "reads.fq.gz"
    with gzip.open(fq, "wt") as f:
        for i in range(300):
            r = "".join(rng.choice(list("ACGT"), int(rng.integers(25, 80))))
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    return str(fq)


def test_spilled_counting_matches_in_memory(reads, tmp_path):
    mem = count_files([reads], 13, str(tmp_path / "mem"), use_device=False)
    # ~KBs budget => many spills; also tiny stream windows
    spilled = count_files([reads], 13, str(tmp_path / "spill"),
                          use_device=False, chunk=1 << 12,
                          memory_gb=32 * 1024 / 1024**3,   # 32 KB
                          window=2048, spill_dir=str(tmp_path / "runs"))
    _same_db(mem, spilled)
    # spill dir provided by caller: run files removed after the merge
    assert os.listdir(tmp_path / "runs") == []


def test_spilled_import_matches_in_memory(reads, tmp_path):
    from merfin_tpu.io import meryl_text

    db = count_files([reads], 9, str(tmp_path / "db"), use_device=False)
    txt = tmp_path / "dump.txt"
    meryl_text.export_text(db, str(txt))

    imp_mem = meryl_text.import_text(str(txt), str(tmp_path / "imp_mem"))
    imp_spill = meryl_text.import_text(
        str(txt), str(tmp_path / "imp_spill"), batch_lines=64,
        memory_gb=16 * 1024 / 1024**3)   # 16 KB budget
    _same_db(imp_mem, imp_spill)
    _same_db(db, imp_spill)


def test_stream_writer_roundtrip(tmp_path):
    """MkdbStreamWriter output is readable by KmerDB and matches create()."""
    from merfin_tpu.count.spill import MkdbStreamWriter, slice_offsets_of

    rng = np.random.default_rng(5)
    k = 15
    keys = np.unique(rng.integers(0, 1 << (2 * k), 5000).astype(np.uint64))
    vals = rng.integers(1, 1000, keys.size).astype(np.uint32)

    ref = KmerDB.create(str(tmp_path / "ref"), k, keys, vals)
    w = MkdbStreamWriter(str(tmp_path / "stream"), k)
    for lo in range(0, keys.size, 700):
        w.append(keys[lo: lo + 700], vals[lo: lo + 700])
    got = w.finish(int(vals.sum()))
    _same_db(ref, got)
    assert got.slice_offsets.tolist() == slice_offsets_of(keys, k).tolist()
