"""Variant enumeration + scoring vs the oracle, incl. brute-force checks."""

import itertools
import random

import numpy as np
import pytest

from merfin_tpu.variants.enumerate import enumerate_paths
from merfin_tpu.variants.score import score_paths_np
from merfin_tpu.score.kstar import ProbTable
from tests import refmodel
from tests.util import dict_lookup_np, random_dna


def test_enumerate_matches_oracle_simple():
    # two SNVs, no overlap
    template = "AAACCCGGGTTT"
    paths = enumerate_paths(template, [3, 8], [1, 1], [["C", "T"], ["G", "A"]])
    oracle = refmodel.traverse_paths(template, [3, 8], [1, 1], [["C", "T"], ["G", "A"]])
    assert [(p.seq, p.gt_path, p.idx_path, p.len_path) for p in paths] == oracle
    seqs = {p.seq for p in paths}
    assert seqs == {
        "AAACCCGGGTTT", "AAACCCGGATTT", "AAATCCGGGTTT", "AAATCCGGATTT",
    }


def test_enumerate_indel_shifts():
    # deletion shifts the downstream variant index
    template = "AAACCCGGGTTT"
    ref_idx, ref_len = [2, 8], [3, 1]
    haps = [["ACC", "A"], ["G", "C"]]
    paths = enumerate_paths(template, ref_idx, ref_len, haps)
    oracle = refmodel.traverse_paths(template, ref_idx, ref_len, haps)
    assert [(p.seq, p.gt_path, p.idx_path, p.len_path) for p in paths] == oracle
    # applying both: AAA + "A"(for ACC) shifts the second variant by -2
    assert "AAACGGCTTT" in {p.seq for p in paths}


def test_enumerate_overlap_skipping():
    # ALT at idx 0 covers the variant at idx 2 -> forced REF skip
    template = "ACGTACGT"
    ref_idx, ref_len = [1, 3], [4, 1]
    haps = [["CGTA", "C"], ["T", "G"]]
    paths = enumerate_paths(template, ref_idx, ref_len, haps)
    oracle = refmodel.traverse_paths(template, ref_idx, ref_len, haps)
    assert [(p.seq, p.gt_path, p.idx_path, p.len_path) for p in paths] == oracle


def test_enumerate_empty_hap_list_kills_cluster():
    paths = enumerate_paths("ACGT", [1, 2], [1, 1], [["C", "T"], []])
    assert paths == []


@pytest.mark.parametrize("seed", range(6))
def test_enumerate_random_vs_oracle(seed):
    rng = random.Random(seed)
    n = rng.randrange(1, 5)
    tlen = 40
    template = random_dna(rng, tlen)
    pos = sorted(rng.sample(range(2, tlen - 6), n))
    ref_idx, ref_len, haps = [], [], []
    for p in pos:
        rl = rng.randrange(1, 4)
        ref = template[p : p + rl]
        alts = [ref]
        for _ in range(rng.randrange(1, 3)):
            alts.append(random_dna(rng, rng.randrange(1, 5)))
        ref_idx.append(p)
        ref_len.append(rl)
        haps.append(alts)
    got = enumerate_paths(template, ref_idx, ref_len, haps)
    exp = refmodel.traverse_paths(template, ref_idx, ref_len, haps)
    assert [(p.seq, p.gt_path, p.idx_path, p.len_path) for p in got] == exp


def test_no_overlap_enumeration_is_product():
    # without overlaps/dedup: all combinations present
    rng = random.Random(9)
    template = random_dna(rng, 30)
    ref_idx, ref_len = [5, 15, 25], [1, 1, 1]
    haps = []
    for p in ref_idx:
        ref = template[p]
        alt = {"A": "C", "C": "G", "G": "T", "T": "A"}[ref]
        haps.append([ref, alt])
    paths = enumerate_paths(template, ref_idx, ref_len, haps)
    assert len(paths) == 8
    gt_set = {tuple(p.gt_path) for p in paths}
    assert gt_set == set(itertools.product([0, 1], repeat=3))


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("filter_mode", [False, True])
def test_score_matches_oracle(seed, filter_mode):
    rng = random.Random(seed)
    k = 7
    genome = random_dna(rng, 300)
    read_db = refmodel.count_canonical([genome, genome[50:250]], k)
    asm_db = refmodel.count_canonical([genome], k)
    peak = 1.5
    table = ProbTable(np.asarray([1, 1, 2], np.uint32), np.asarray([0.9, 0.8, 0.7]))

    template = genome[100:140]
    ref_idx, ref_len = [10, 20], [1, 2]
    haps = [
        [template[10], "T" if template[10] != "T" else "A"],
        [template[20:22], "G"],
    ]
    paths = enumerate_paths(template, ref_idx, ref_len, haps)
    scores = score_paths_np(
        paths, k, dict_lookup_np(read_db, k), dict_lookup_np(asm_db, k),
        peak, table, filter_mode=filter_mode,
    )
    for p, s in zip(paths, scores):
        num_m, kstr, dkstr = refmodel.score_path(
            p.seq, p.gt_path, p.idx_path, p.len_path, k, read_db, asm_db,
            peak, [1, 1, 2], [0.9, 0.8, 0.7], filter_mode=filter_mode,
        )
        assert s.num_m == num_m
        if not filter_mode:
            np.testing.assert_allclose(s.kstr, np.asarray(kstr), rtol=0, atol=0)
            np.testing.assert_allclose(s.dkstr, np.asarray(dkstr), rtol=1e-12)


def test_score_uint32_underflow_window():
    # variant at window offset < k-1: the +1 adjustment must NOT apply
    k = 7
    rng = random.Random(1)
    genome = random_dna(rng, 100)
    read_db = refmodel.count_canonical([genome], k)
    asm_db = refmodel.count_canonical([genome], k)
    template = genome[0:20]
    ref = template[2]
    alt = {"A": "C", "C": "G", "G": "T", "T": "A"}[ref]
    paths = enumerate_paths(template, [2], [1], [[ref, alt]])
    scores = score_paths_np(
        paths, k, dict_lookup_np(read_db, k), dict_lookup_np(asm_db, k),
        1.0, None,
    )
    for p, s in zip(paths, scores):
        num_m, kstr, dkstr = refmodel.score_path(
            p.seq, p.gt_path, p.idx_path, p.len_path, k, read_db, asm_db, 1.0, [], [],
        )
        assert s.num_m == num_m
        np.testing.assert_allclose(s.kstr, np.asarray(kstr))
        np.testing.assert_allclose(s.dkstr, np.asarray(dkstr))
