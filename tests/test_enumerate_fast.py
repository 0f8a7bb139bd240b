"""Array-native enumeration (enumerate_fast) vs the scalar oracle:
byte-identical PathBlocks on random and adversarial clusters."""

import random

import numpy as np
import pytest

from merfin_tpu.variants.enumerate import enumerate_paths
from merfin_tpu.variants.enumerate_fast import build_path_block_fast
from merfin_tpu.variants.score import build_path_block

K = 7
BASES = "ACGT"


def assert_blocks_equal(a, b, ctx=""):
    np.testing.assert_array_equal(a.stream, b.stream, err_msg=ctx)
    np.testing.assert_array_equal(a.starts, b.starts, err_msg=ctx)
    np.testing.assert_array_equal(a.nis, b.nis, err_msg=ctx)
    np.testing.assert_array_equal(a.lens, b.lens, err_msg=ctx)
    np.testing.assert_array_equal(a.gtp, b.gtp, err_msg=ctx)
    np.testing.assert_array_equal(a.adjust, b.adjust, err_msg=ctx)


def both(template, ref_idx, ref_len, haps, k=K):
    slow = build_path_block(enumerate_paths(template, ref_idx, ref_len,
                                            haps), k)
    fast = build_path_block_fast(template, ref_idx, ref_len, haps, k)
    return slow, fast


def test_fuzz_random_clusters():
    rng = random.Random(5)
    for trial in range(300):
        L = rng.randint(25, 70)
        template = "".join(rng.choice(BASES) for _ in range(L))
        V = rng.randint(1, 5)
        pos = sorted(rng.sample(range(2, L - 6), V))
        ref_idx, ref_len, haps = [], [], []
        for p in pos:
            rl = rng.randint(1, 4)
            ref = template[p: p + rl]
            alts = []
            for _ in range(rng.randint(1, 3)):
                alen = rng.randint(0, 4)
                alts.append("".join(rng.choice(BASES) for _ in range(alen)))
            ref_idx.append(p)
            ref_len.append(len(ref))
            haps.append([ref] + alts)
        slow, fast = both(template, ref_idx, ref_len, haps)
        assert_blocks_equal(slow, fast, ctx=f"trial {trial}")


def test_overlap_force_skip_and_skip_to_end():
    # deletion spanning the NEXT variant's start (force-skip), incl. the
    # skip running to the cluster end
    t = "ACGTACGTACGTACGTACGTACGT"
    cases = [
        ([5, 8], [5, 1], [[t[5:10], "A"], [t[8], "C"]]),
        ([5, 8, 15], [5, 1, 2], [[t[5:10], "G"], [t[8], "T"],
                                 [t[15:17], "AA", ""]]),
        ([3, 4, 5], [4, 1, 1], [[t[3:7], ""], [t[4], "G"], [t[5], "T"]]),
    ]
    for ref_idx, ref_len, haps in cases:
        slow, fast = both(t, ref_idx, ref_len, haps)
        assert_blocks_equal(slow, fast, ctx=str(ref_idx))


def test_duplicate_seq_first_seen_dedup():
    # two alleles at different variants that produce the SAME string:
    # substituting A->A (ALT == REF text would be deduped upstream), so
    # build duplicates via an indel pair: delete "AC" at 5 vs replace
    # "ACGT" with "GT" at 5 — both yield ...GTACGT...
    t = "TTTTTACGTACGTTTTTTT"
    ref_idx = [5, 5]
    ref_len = [2, 4]
    haps = [[t[5:7], ""], [t[5:9], "GT"]]
    slow, fast = both(t, ref_idx, ref_len, haps)
    assert len({p.seq for p in enumerate_paths(t, ref_idx, ref_len, haps)}) \
        == slow.nis.shape[0]
    assert_blocks_equal(slow, fast, ctx="dup dedup")


def test_empty_allele_list_kills_branches_not_skipped_ones():
    # variant 1 has no alleles: any branch REACHING it dies, but
    # branches where variant 0's deletion force-skips it survive
    t = "AAAACGTTACGTAAAA"
    ref_idx = [4, 7]
    ref_len = [5, 1]
    haps = [[t[4:9], "C"], []]
    slow, fast = both(t, ref_idx, ref_len, haps)
    assert_blocks_equal(slow, fast, ctx="empty haps")
    # the surviving path is the deletion branch (REF branch reaches the
    # empty variant and dies)
    assert slow.nis.shape[0] == fast.nis.shape[0] == 1


def test_all_empty():
    slow, fast = both("ACGTACGTAC", [], [], [])
    assert fast.nis.shape[0] == 0 and fast.starts.tolist() == [0]
