"""Checkpoint/resume: interrupted runs continue to identical outputs."""

import io
import random

import pytest

from merfin_tpu.io.fasta import SeqFile
from merfin_tpu.io.vcf import VcfFile
from merfin_tpu.modes.engine import KstarEngine
from merfin_tpu.modes.hist import run_hist
from merfin_tpu.modes.dump import run_dump
from merfin_tpu.modes.variants import run_variants
from merfin_tpu.table.lookup import build_lookup
from tests import refmodel
from tests.util import db_from_dict, random_dna

K = 9


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    rng = random.Random(77)
    scaf = [random_dna(rng, 300) for _ in range(5)]
    reads = scaf * 2
    read_db = db_from_dict(refmodel.count_canonical(reads, K), K, str(tmp / "r"))
    asm_db = db_from_dict(refmodel.count_canonical(scaf, K), K, str(tmp / "a"))
    fasta = tmp / "asm.fasta"
    with open(fasta, "w") as f:
        for i, s in enumerate(scaf):
            f.write(f">s{i}\n{s}\n")
    vcf = tmp / "v.vcf"
    rows = []
    for i, s in enumerate(scaf):
        alt = {"A": "C", "C": "G", "G": "T", "T": "A"}[s[50]]
        rows.append(f"s{i}\t51\t.\t{s[50]}\t{alt}\t9\tPASS\t.\tGT\t1/1")
    vcf.write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        + "\n".join(rows) + "\n")
    return dict(tmp=tmp, fasta=str(fasta), vcf=str(vcf),
                read_db=read_db, asm_db=asm_db)


def _engine(world):
    return KstarEngine(build_lookup(world["read_db"]), build_lookup(world["asm_db"]),
                       K, 2.0, chunk=128, batch=2)


class StopAfter:
    """SeqFile wrapper that raises after N sequences (simulated crash)."""

    def __init__(self, seq_file, n):
        self.seq_file = seq_file
        self.n = n

    def iter_coded(self):
        for i, s in enumerate(self.seq_file.iter_coded()):
            if i >= self.n:
                raise KeyboardInterrupt
            yield s

    def __iter__(self):
        for i, s in enumerate(self.seq_file):
            if i >= self.n:
                raise KeyboardInterrupt
            yield s


def test_hist_resume(world, tmp_path):
    out_a = tmp_path / "a.hist"
    res_full = run_hist(_engine(world), SeqFile(world["fasta"]), str(out_a),
                        log=io.StringIO())

    out_b = tmp_path / "b.hist"
    with pytest.raises(KeyboardInterrupt):
        run_hist(_engine(world), StopAfter(SeqFile(world["fasta"]), 2), str(out_b),
                 log=io.StringIO(), resume=True)
    assert (tmp_path / "b.hist.ckpt.json").exists()
    res_resumed = run_hist(_engine(world), SeqFile(world["fasta"]), str(out_b),
                           log=io.StringIO(), resume=True)
    assert res_resumed == res_full
    assert out_a.read_text() == out_b.read_text()
    assert not (tmp_path / "b.hist.ckpt.json").exists()


def test_dump_resume(world, tmp_path):
    out_a = tmp_path / "a.tsv"
    run_dump(_engine(world), SeqFile(world["fasta"]), str(out_a), log=io.StringIO())

    out_b = tmp_path / "b.tsv"
    with pytest.raises(KeyboardInterrupt):
        run_dump(_engine(world), StopAfter(SeqFile(world["fasta"]), 3), str(out_b),
                 log=io.StringIO(), resume=True)
    run_dump(_engine(world), SeqFile(world["fasta"]), str(out_b),
             log=io.StringIO(), resume=True)
    assert out_a.read_text() == out_b.read_text()


def test_variants_resume(world, tmp_path):
    def lookups():
        rl = build_lookup(world["read_db"])
        al = build_lookup(world["asm_db"])
        return rl.lookup_np, al.lookup_np

    def load_vcf():
        v = VcfFile(world["vcf"], log=io.StringIO())
        v.merge_clusters(K, 15, False, log=io.StringIO())
        return v

    rlf, alf = lookups()
    out_a = tmp_path / "a"
    run_variants("polish", SeqFile(world["fasta"]), load_vcf(), K, rlf, alf,
                 2.0, None, str(out_a), log=io.StringIO())

    out_b = tmp_path / "b"
    with pytest.raises(KeyboardInterrupt):
        run_variants("polish", StopAfter(SeqFile(world["fasta"]), 3), load_vcf(),
                     K, rlf, alf, 2.0, None, str(out_b), log=io.StringIO(),
                     resume=True)
    run_variants("polish", SeqFile(world["fasta"]), load_vcf(), K, rlf, alf,
                 2.0, None, str(out_b), log=io.StringIO(), resume=True)
    assert (tmp_path / "a.polish.vcf").read_text() == (tmp_path / "b.polish.vcf").read_text()


def test_dump_resume_gz(world, tmp_path):
    import gzip

    out_a = tmp_path / "a.tsv.gz"
    run_dump(_engine(world), SeqFile(world["fasta"]), str(out_a), log=io.StringIO())
    out_b = tmp_path / "b.tsv.gz"
    with pytest.raises(KeyboardInterrupt):
        run_dump(_engine(world), StopAfter(SeqFile(world["fasta"]), 2), str(out_b),
                 log=io.StringIO(), resume=True)
    run_dump(_engine(world), SeqFile(world["fasta"]), str(out_b),
             log=io.StringIO(), resume=True)
    with gzip.open(out_a) as f:
        a = f.read()
    with gzip.open(out_b) as f:
        b = f.read()
    assert a == b
