"""Native C++ host layer vs the pure-Python path."""

import math
import random

import numpy as np
import pytest

from merfin_tpu import native
from merfin_tpu.io.fasta import SeqFile
from tests.util import random_dna


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def test_parse_fasta_matches_python(tmp_path):
    rng = random.Random(3)
    seqs = [(f"s{i}", random_dna(rng, rng.randrange(10, 200), with_n=0.05))
            for i in range(5)]
    p = tmp_path / "t.fasta"
    with open(p, "w") as f:
        for name, s in seqs:
            f.write(f">{name} desc here\n")
            for j in range(0, len(s), 37):
                f.write(s[j : j + 37] + "\n")

    sf = SeqFile(str(p))
    py = [(q.ident, q.codes().tolist()) for q in sf]
    nat = [(q.ident, q.codes().tolist()) for q in sf.iter_coded()]
    assert nat == py


def test_parse_fastq_matches_python(tmp_path):
    rng = random.Random(4)
    p = tmp_path / "t.fastq"
    seqs = [(f"r{i}", random_dna(rng, 50)) for i in range(4)]
    with open(p, "w") as f:
        for name, s in seqs:
            f.write(f"@{name} x\n{s}\n+\n{'I' * len(s)}\n")
    sf = SeqFile(str(p))
    py = [(q.ident, q.codes().tolist()) for q in sf]
    nat = [(q.ident, q.codes().tolist()) for q in sf.iter_coded()]
    assert nat == py


def test_format_dump_rows_matches_python():
    rng = np.random.default_rng(0)
    n = 200
    rk = np.where(rng.random(n) < 0.2, 0.0, rng.random(n) * 5)
    ak = np.where(rng.random(n) < 0.2, 0.0, np.round(rng.random(n) * 3))
    km = np.where((rk == 0) & (ak == 0), 0.0, rng.standard_normal(n))
    km[5] = math.inf if n > 5 else 0.0

    got = native.format_dump_rows("chrZ", 1000, rk, ak, km)
    exp = "".join(
        f"chrZ\t{1000 + i}\t{rk[i]:.2f}\t{ak[i]:.2f}\t{km[i]:.2f}\n"
        for i in range(n)
        if rk[i] != 0.0 or ak[i] != 0.0 or km[i] != 0.0
    ).encode()
    assert got == exp
