"""Exact-lookup tables: Host and Device vs a dict, plus MKDB round-trips."""

import random

import numpy as np
import pytest

from merfin_tpu.io.mkdb import KmerDB, SLICES
from merfin_tpu.io.meryl_text import import_text, export_text
from merfin_tpu.table.lookup import HostLookup, DeviceLookup, build_lookup
from tests import refmodel
from tests.util import db_from_dict, random_dna


@pytest.fixture()
def small_db(tmp_path):
    rng = random.Random(11)
    k = 13
    seqs = [random_dna(rng, 400) for _ in range(4)]
    counts = refmodel.count_canonical(seqs, k)
    db = db_from_dict(counts, k, str(tmp_path / "db"))
    return db, counts, k, seqs


def test_mkdb_roundtrip(small_db, tmp_path):
    db, counts, k, _ = small_db
    db2 = KmerDB(db.path)
    assert db2.k == k
    assert db2.distinct == len(counts)
    total = sum(counts.values())
    assert db2.total == total
    # slices partition and concatenate sorted
    allk = np.concatenate([db2.slice(i)[0] for i in range(SLICES)])
    np.testing.assert_array_equal(allk, np.asarray(db2.keys))


def test_host_lookup_matches_dict(small_db):
    db, counts, k, seqs = small_db
    hl = build_lookup(db, host=True)
    rng = random.Random(5)
    from merfin_tpu.io.meryl_text import encode_kmer

    queries, expect = [], []
    for _ in range(200):
        if rng.random() < 0.5 and counts:
            m = rng.choice(list(counts))
        else:
            m = random_dna(rng, k)
        queries.append(encode_kmer(m))
        expect.append(counts.get(m, 0))
    got = hl(np.asarray(queries, dtype=np.uint64))
    np.testing.assert_array_equal(got, np.asarray(expect, dtype=np.uint64))


@pytest.mark.parametrize("strategy", ["block", "slice", "bsearch"])
def test_device_lookup_matches_host(small_db, strategy):
    db, counts, k, _ = small_db
    hl = build_lookup(db, host=True)
    dl = DeviceLookup(np.asarray(db.keys), np.asarray(db.vals), k,
                      strategy=strategy)
    assert isinstance(dl, DeviceLookup)
    rng = np.random.default_rng(0)
    q = rng.integers(0, 1 << (2 * k), size=5000).astype(np.uint64)
    # include every present key too
    q = np.concatenate([q, np.asarray(db.keys)])
    np.testing.assert_array_equal(dl.lookup_np(q), hl(q))


def test_default_lookup_is_block(small_db):
    db, _, _, _ = small_db
    dl = build_lookup(db)
    assert dl.strategy == "block" and dl.windowed


def test_min_max_filtering(small_db):
    db, counts, k, _ = small_db
    lo, hi = 2, 3
    hl = build_lookup(db, min_v=lo, max_v=hi, host=True)
    dl = build_lookup(db, min_v=lo, max_v=hi)
    q = np.asarray(db.keys)
    expect = np.where(
        (np.asarray(db.vals) >= lo) & (np.asarray(db.vals) <= hi),
        np.asarray(db.vals), 0,
    ).astype(np.uint64)
    np.testing.assert_array_equal(hl(q), expect)
    np.testing.assert_array_equal(dl.lookup_np(q), expect)


def test_empty_and_tiny_tables():
    for n in (0, 1, 2, 3):
        keys = np.sort(np.unique(np.arange(n, dtype=np.uint64) * 7 + 1))
        vals = (np.arange(keys.size) + 1).astype(np.uint32)
        dl = DeviceLookup(keys, vals, k=5)
        q = np.asarray([0, 1, 8, 15, 1000], dtype=np.uint64)
        hl = HostLookup(keys, vals)
        np.testing.assert_array_equal(dl.lookup_np(q), hl(q))


def test_meryl_text_roundtrip(small_db, tmp_path):
    db, counts, k, _ = small_db
    txt = tmp_path / "dump.txt"
    export_text(db, str(txt))
    db2 = import_text(str(txt), str(tmp_path / "db2"))
    np.testing.assert_array_equal(np.asarray(db.keys), np.asarray(db2.keys))
    np.testing.assert_array_equal(np.asarray(db.vals), np.asarray(db2.vals))
