"""ShardedKstarEngine through run_hist: identical results to the
single-device engine on the 8-device virtual mesh."""

import io
import random

import pytest

from merfin_tpu.io.fasta import SeqFile
from merfin_tpu.modes.engine import KstarEngine
from merfin_tpu.modes.hist import run_hist
from merfin_tpu.parallel.engine import ShardedKstarEngine
from merfin_tpu.parallel.sharded import ShardedLookup, make_mesh
from merfin_tpu.table.lookup import build_lookup
from tests import refmodel
from tests.util import db_from_dict, random_dna

K = 9


def test_sharded_hist_end_to_end(tmp_path):
    rng = random.Random(21)
    scaf = [random_dna(rng, 700, with_n=0.01) for _ in range(3)]
    reads = scaf * 3 + [random_dna(rng, 400)]
    read_db = db_from_dict(refmodel.count_canonical(reads, K), K, str(tmp_path / "r"))
    asm_db = db_from_dict(refmodel.count_canonical(scaf, K), K, str(tmp_path / "a"))
    fasta = tmp_path / "asm.fasta"
    with open(fasta, "w") as f:
        for i, s in enumerate(scaf):
            f.write(f">s{i}\n{s}\n")

    single = KstarEngine(build_lookup(read_db), build_lookup(asm_db), K, 3.0,
                         chunk=256, batch=2)
    res1 = run_hist(single, SeqFile(str(fasta)), str(tmp_path / "one.hist"),
                    log=io.StringIO())

    mesh = make_mesh(8, data=2)
    sharded = ShardedKstarEngine(
        mesh,
        ShardedLookup.build(read_db, mesh),
        ShardedLookup.build(asm_db, mesh),
        K, 3.0, chunk=256,
    )
    res2 = run_hist(sharded, SeqFile(str(fasta)), str(tmp_path / "multi.hist"),
                    log=io.StringIO())

    assert res1 == res2
    assert (tmp_path / "one.hist").read_text() == (tmp_path / "multi.hist").read_text()
