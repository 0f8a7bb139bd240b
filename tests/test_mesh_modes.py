"""Mesh coverage beyond -hist: completeness + variant modes on the
virtual 8-device mesh match the single-device paths, and -threads
produces identical output to serial (VERDICT round 1, items 2 and 5)."""

import io
import random

import numpy as np
import pytest

from merfin_tpu.io.fasta import SeqFile
from merfin_tpu.io.vcf import VcfFile
from merfin_tpu.modes.completeness import run_completeness
from merfin_tpu.modes.variants import run_variants
from merfin_tpu.parallel.sharded import ShardedLookup, make_mesh
from merfin_tpu.table.lookup import build_lookup
from tests import refmodel
from tests.util import db_from_dict, random_dna

K = 11
ALT_OF = {"A": "C", "C": "G", "G": "T", "T": "A"}


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("meshmodes")
    rng = random.Random(77)
    true_genome = random_dna(rng, 800)
    err_pos = [120, 430, 600]
    asm = list(true_genome)
    for p in err_pos:
        asm[p] = ALT_OF[asm[p]]
    asm = "".join(asm)

    read_db = db_from_dict(refmodel.count_canonical([true_genome] * 25, K),
                           K, str(tmp / "read"))
    asm_db = db_from_dict(refmodel.count_canonical([asm], K), K, str(tmp / "asm"))
    fasta = tmp / "asm.fasta"
    fasta.write_text(">chr1\n" + asm + "\n")

    rows = [(p + 1, asm[p], true_genome[p], 31.5) for p in err_pos]
    rows.append((250, asm[249], ALT_OF[asm[249]], 9.1))
    rows.sort()
    vcf = tmp / "calls.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n##contig=<ID=chr1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        + "".join(f"chr1\t{pos}\t.\t{r}\t{a}\t{q}\tPASS\t.\tGT\t1/1\n"
                  for pos, r, a, q in rows))
    return dict(tmp=tmp, fasta=str(fasta), vcf=str(vcf),
                read_db=read_db, asm_db=asm_db)


def test_mesh_completeness_matches_single(world):
    log1, log2 = io.StringIO(), io.StringIO()
    r1 = run_completeness(world["read_db"], world["asm_db"], 25.0, log=log1)
    mesh = make_mesh(8, data=2)
    r2 = run_completeness(world["read_db"], world["asm_db"], 25.0, log=log2,
                          mesh=mesh, block=64)
    assert r1["total"] == pytest.approx(r2["total"], rel=1e-12)
    assert r1["undrc"] == pytest.approx(r2["undrc"], rel=1e-12)
    # per-slice stderr lines are format-identical (floats agree here)
    assert log1.getvalue() == log2.getvalue()


def _run_variants(world, mode, out, rl, al, threads=1):
    vcf = VcfFile(world["vcf"], log=io.StringIO())
    vcf.merge_clusters(K, comb=15, nosplit=False, log=io.StringIO())
    run_variants(mode, SeqFile(world["fasta"]), vcf, K, rl, al,
                 peak=25.0, prob_table=None, out_name=str(out),
                 log=io.StringIO(), threads=threads)
    suffix = "polish" if mode == "polish" else "filter"
    return (out.parent / f"{out.name}.{suffix}.vcf").read_text()


@pytest.mark.parametrize("mode", ["polish", "filter", "loose"])
def test_mesh_variant_lookups_match_single(world, tmp_path, mode):
    rl = build_lookup(world["read_db"])
    al = build_lookup(world["asm_db"])
    single = _run_variants(world, mode, tmp_path / "single",
                           rl.lookup_np, al.lookup_np)

    mesh = make_mesh(8, data=2)
    srl = ShardedLookup.build(world["read_db"], mesh)
    sal = ShardedLookup.build(world["asm_db"], mesh)
    sharded = _run_variants(world, mode, tmp_path / "mesh",
                            srl.lookup_np, sal.lookup_np)
    assert single == sharded
    if mode == "polish":
        assert sharded.count("\n1/1") or "1/1" in sharded


def test_sharded_lookup_np_values(world):
    mesh = make_mesh(8, data=2)
    srl = ShardedLookup.build(world["read_db"], mesh)
    keys = np.asarray(world["read_db"].keys)
    vals = np.asarray(world["read_db"].vals)
    idx = np.asarray([0, keys.size // 2, keys.size - 1])
    got = srl.lookup_np(keys[idx])
    assert np.array_equal(got, vals[idx].astype(np.uint64))
    # absent key -> 0
    assert srl.lookup_np(np.asarray([0xFFFFFFFF], np.uint64))[0] == 0
    # 2D shape preserved
    q2 = keys[:4].reshape(2, 2)
    assert srl.lookup_np(q2).shape == (2, 2)


def test_threads_output_identical(world, tmp_path):
    rl = build_lookup(world["read_db"])
    al = build_lookup(world["asm_db"])
    serial = _run_variants(world, "polish", tmp_path / "t1",
                           rl.lookup_np, al.lookup_np, threads=1)
    parallel = _run_variants(world, "polish", tmp_path / "t2",
                             rl.lookup_np, al.lookup_np, threads=2)
    assert serial == parallel
    assert len([l for l in serial.splitlines() if not l.startswith("#")]) == 3


def test_hbm_fail_fast_suggests_mesh(world, capsys, monkeypatch):
    """Tables larger than device HBM error out with a -mesh hint instead
    of OOMing at device_put (merfin-globals.C:148-153 semantics)."""
    from merfin_tpu import cli

    monkeypatch.setattr(cli, "_device_hbm_gb", lambda: 1e-6)
    rc = cli.merfin_main([
        "-hist", "-sequence", world["fasta"],
        "-readmers", world["read_db"].path,
        "-seqmers", world["asm_db"].path,
        "-peak", "25", "-output", str(world["tmp"] / "hbm")])
    assert rc == 1
    err = capsys.readouterr().err
    assert "GB per device" in err and "-mesh" in err


def test_cli_devscore_composes_with_mesh(world, tmp_path, capsys):
    """-devscore now rides -mesh (ShardedScorer); the numM-only modes
    default to fused device scoring and outputs stay byte-identical to
    the host scorer."""
    from merfin_tpu.cli import merfin_main

    base = ["-sequence", world["fasta"], "-readmers", world["read_db"].path,
            "-seqmers", world["asm_db"].path, "-peak", "25",
            "-vcf", world["vcf"]]
    assert merfin_main(["-strict"] + base + ["-output", str(tmp_path / "a"),
                                             "-mesh", "2x4"]) == 0
    assert "fused device scoring" in capsys.readouterr().err  # auto-default
    assert merfin_main(["-strict"] + base + ["-output", str(tmp_path / "b"),
                                             "-nodevscore"]) == 0
    assert "fused device scoring" not in capsys.readouterr().err
    a = (tmp_path / "a.filter.vcf").read_bytes()
    b = (tmp_path / "b.filter.vcf").read_bytes()
    assert a == b and b.count(b"\t1/1\n") >= 1


def test_cli_mesh_validation(world, capsys):
    from merfin_tpu.cli import merfin_main

    base = ["-hist", "-sequence", world["fasta"],
            "-readmers", world["read_db"].path,
            "-seqmers", world["asm_db"].path,
            "-peak", "25", "-output", str(world["tmp"] / "h")]
    assert merfin_main(base + ["-mesh", "nonsense"]) == 1
    assert "not DxT" in capsys.readouterr().err
    assert merfin_main(base + ["-mesh", "9x9"]) == 1
    assert "needs 81 devices" in capsys.readouterr().err


def test_mesh_completeness_rec_matches_single(world, monkeypatch):
    """Mesh -completeness over rec-format (sorted-join) asm shards ==
    the single-device run — the accelerator mesh data plane, exercised
    here in Pallas interpret mode."""
    from merfin_tpu.parallel import sharded as sh

    orig = sh.ShardedLookup.build.__func__
    monkeypatch.setattr(
        sh.ShardedLookup, "build",
        classmethod(lambda cls, *a, **kw: orig(cls, *a,
                                               **{**kw, "fmt": "rec"})))
    log1, log2 = io.StringIO(), io.StringIO()
    r1 = run_completeness(world["read_db"], world["asm_db"], 25.0, log=log1)
    mesh = make_mesh(8, data=2)
    r2 = run_completeness(world["read_db"], world["asm_db"], 25.0, log=log2,
                          mesh=mesh, block=64)
    assert r1["total"] == pytest.approx(r2["total"], rel=1e-12)
    assert r1["undrc"] == pytest.approx(r2["undrc"], rel=1e-12)
    assert log1.getvalue() == log2.getvalue()


def test_mesh_completeness_u16_readk_widening(world, tmp_path):
    """Tiny peak pushes readK past u8 on the wire: the mesh data plane
    must widen identically to single-device (r4 wire-dtype edge, now on
    the virtual mesh)."""
    from tests.util import db_from_dict

    k = 5
    kmers = ["ACGTA", "GGATC", "TTACG"]
    canon = [min(s, refmodel.revcomp(s)) for s in kmers]
    rdb = db_from_dict(dict(zip(canon, [50, 100, 7])), k, str(tmp_path / "r"))
    adb = db_from_dict(dict(zip(canon, [1, 1, 1])), k, str(tmp_path / "a"))
    mesh = make_mesh(8, data=2)
    res = run_completeness(rdb, adb, peak=0.1, log=io.StringIO(),
                           mesh=mesh, block=64)
    assert res["total"] == 500 + 1000 + 70
    assert res["undrc"] == 499 + 999 + 69


def test_mesh_completeness_peak_zero_f64_fallback(world, tmp_path):
    """peak=0 inf-readK f64 fallback on the MESH: must not crash and
    must land in the same inf/nan class as the single-device path
    (merfin-globals.C:84-97; r4 verdict item 8)."""
    import math

    from tests.util import db_from_dict

    k = 5
    s = min("ACGTA", refmodel.revcomp("ACGTA"))
    rdb = db_from_dict({s: 9}, k, str(tmp_path / "r"))
    adb = db_from_dict({s: 1}, k, str(tmp_path / "a"))
    single = run_completeness(rdb, adb, peak=0.0, log=io.StringIO())
    mesh = make_mesh(8, data=2)
    res = run_completeness(rdb, adb, peak=0.0, log=io.StringIO(),
                           mesh=mesh, block=64)
    assert math.isinf(res["total"]) or math.isnan(res["total"])
    assert math.isnan(res["completeness"])
    assert math.isnan(single["completeness"])
