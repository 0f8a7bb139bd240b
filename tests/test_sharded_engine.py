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


def test_sharded_hist_grouped_fragments(tmp_path):
    """Fragmented assembly through the SHARDED engine's packed-group
    path == single-device grouped path (hist file + per-seq results)."""
    rng = random.Random(5)
    seqs = [random_dna(rng, rng.randint(30, 150), with_n=0.02)
            for _ in range(25)]
    read_db = db_from_dict(refmodel.count_canonical(seqs + seqs[:5], K),
                           K, str(tmp_path / "r"))
    asm_db = db_from_dict(refmodel.count_canonical(seqs, K), K,
                          str(tmp_path / "a"))
    fasta = tmp_path / "frag.fasta"
    with open(fasta, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">f{i}\n{s}\n")

    single = KstarEngine(build_lookup(read_db), build_lookup(asm_db),
                         K, 3.0, chunk=512, batch=2)
    log1 = io.StringIO()
    res1 = run_hist(single, SeqFile(str(fasta)), str(tmp_path / "s.hist"),
                    log=log1)

    mesh = make_mesh(8, data=2)
    sharded = ShardedKstarEngine(
        mesh, ShardedLookup.build(read_db, mesh),
        ShardedLookup.build(asm_db, mesh), K, 3.0, chunk=512)
    assert sharded.group_capacity == 2 * 512
    log2 = io.StringIO()
    res2 = run_hist(sharded, SeqFile(str(fasta)), str(tmp_path / "m.hist"),
                    log=log2)

    assert res1 == res2
    assert (tmp_path / "s.hist").read_text() == (tmp_path / "m.hist").read_text()
    l1 = [l for l in log1.getvalue().splitlines() if l.startswith("f") and "\t" in l]
    l2 = [l for l in log2.getvalue().splitlines() if l.startswith("f") and "\t" in l]
    assert l1 == l2 and len(l1) == 25


def test_sharded_hist_bin_growth(tmp_path):
    """A high-copy repeat grows the SHARDED engine's bins (rebuilds the
    mesh programs) and matches the single-device growth path."""
    rng = random.Random(31)
    flank1, flank2 = random_dna(rng, 100), random_dna(rng, 100)
    asm = flank1 + "A" * (9_000 + K - 1) + flank2
    reads = [flank1 + "A" * K + flank2] * 4
    read_db = db_from_dict(refmodel.count_canonical(reads, K), K,
                           str(tmp_path / "r"))
    asm_db = db_from_dict(refmodel.count_canonical([asm], K), K,
                          str(tmp_path / "a"))
    fasta = tmp_path / "asm.fasta"
    fasta.write_text(">chr\n" + asm + "\n")

    single = KstarEngine(build_lookup(read_db), build_lookup(asm_db), K, 3.0,
                         chunk=4096, batch=2)
    res1 = run_hist(single, SeqFile(str(fasta)), str(tmp_path / "one.hist"),
                    log=io.StringIO())
    assert single.nbins > 1 << 14

    mesh = make_mesh(8, data=2)
    sharded = ShardedKstarEngine(
        mesh, ShardedLookup.build(read_db, mesh),
        ShardedLookup.build(asm_db, mesh), K, 3.0, chunk=4096)
    res2 = run_hist(sharded, SeqFile(str(fasta)), str(tmp_path / "mesh.hist"),
                    log=io.StringIO())
    assert sharded.nbins > 1 << 14
    assert res1 == res2
    assert (tmp_path / "one.hist").read_text() == \
        (tmp_path / "mesh.hist").read_text()
