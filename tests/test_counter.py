"""TPU-native counter vs the string oracle, incl. chunk-boundary packing."""

import random

import numpy as np
import pytest

from merfin_tpu.count.counter import count_sequences, count_files
from merfin_tpu.count import algebra
from merfin_tpu.io.fasta import SeqFile, Sequence
from merfin_tpu.io.meryl_text import decode_kmer
from tests import refmodel
from tests.util import random_dna


def _check(seq_strs, k, chunk, use_device):
    seqs = [Sequence(f"s{i}", s.encode()) for i, s in enumerate(seq_strs)]
    keys, vals, total = count_sequences(iter(seqs), k, chunk=chunk,
                                        use_device=use_device)
    expect = refmodel.count_canonical(seq_strs, k)
    got = {decode_kmer(int(key), k): int(v) for key, v in zip(keys, vals)}
    assert got == expect
    assert total == sum(expect.values())


@pytest.mark.parametrize("use_device", [True, False])
def test_count_many_short_reads(use_device):
    rng = random.Random(1)
    k = 9
    reads = [random_dna(rng, rng.randrange(5, 40)) for _ in range(300)]
    _check(reads, k, chunk=256, use_device=use_device)


@pytest.mark.parametrize("use_device", [True, False])
def test_count_long_sequence_chunked(use_device):
    rng = random.Random(2)
    k = 11
    _check([random_dna(rng, 5000, with_n=0.01)], k, chunk=512, use_device=use_device)


def test_count_mixed_and_files(tmp_path):
    rng = random.Random(3)
    k = 7
    seqs = [random_dna(rng, 900, with_n=0.02), random_dna(rng, 40),
            random_dna(rng, 6), random_dna(rng, 301)]
    p = tmp_path / "in.fasta"
    with open(p, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">q{i}\n{s}\n")
    db = count_files([str(p)], k, str(tmp_path / "db"), chunk=128)
    expect = refmodel.count_canonical(seqs, k)
    got = {decode_kmer(int(key), k): int(v)
           for key, v in zip(np.asarray(db.keys), np.asarray(db.vals))}
    assert got == expect
    st = algebra.statistics(db)
    assert st["present"] == sum(expect.values())
    assert st["distinct"] == len(expect)
