"""Adversarial parity corpus (VERDICT r2 item 6).

Worlds targeting every documented reference quirk, pinned against BOTH
the refmodel oracle AND hand-computed expectations (independent
arithmetic, to break any shared-misreading loop):

  * getK rounding ties at v/peak == x.5 (C round() is half-away-from-
    zero; a numpy-round implementation would round 2.5 -> 2),
  * paths shorter than k-1 (the size_t all-missing rule never excludes
    them, varMer.C:408) driven end-to-end through -polish,
  * negative/fractional quals int-cast toward zero (varMer.C:486),
  * identical duplicate ALT columns deduped (vcf.C:68-86),
  * ./. and 0/0 records invalidated (vcf.C:34-39),
  * uint32 window clamps at both sequence boundaries and the
    PANIC-skip for regions the clamp pushes past the sequence end
    (merfin-variants.C:166-217),
  * -prob tables longer than the max observed count, including 0-copy
    rows that turn present k-mers into "missing" (merfin-globals.C:93).
"""

import io
import random

import numpy as np
import pytest

from merfin_tpu.io.fasta import SeqFile
from merfin_tpu.io.vcf import VcfFile
from merfin_tpu.modes.engine import KstarEngine
from merfin_tpu.modes.hist import run_hist
from merfin_tpu.modes.dump import run_dump
from merfin_tpu.modes.variants import run_variants
from merfin_tpu.score.kstar import ProbTable
from merfin_tpu.table.lookup import build_lookup
from tests import refmodel
from tests.util import db_from_dict, random_dna

ALT_OF = {"A": "C", "C": "G", "G": "T", "T": "A"}


def _canon(w: str) -> str:
    return min(w, refmodel.revcomp(w))


# ---------------------------------------------------------------------
# Rounding ties at v/peak == x.5 (k=5, peak=2: v=5 -> 2.5 -> 3)
# ---------------------------------------------------------------------

SEQ_A = "AAACGGT"          # windows AAACG / AACGG / ACGGT (k=5)


@pytest.fixture(scope="module")
def tie_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ties")
    k = 5
    wins = [SEQ_A[i:i + k] for i in range(3)]
    canons = [_canon(w) for w in wins]
    assert len(set(canons)) == 3          # windows must be independent
    read_counts = dict(zip(canons, [5, 3, 4]))   # ratios 2.5, 1.5, 2.0
    asm_counts = dict.fromkeys(canons, 1)
    read_db = db_from_dict(read_counts, k, str(tmp / "r"))
    asm_db = db_from_dict(asm_counts, k, str(tmp / "a"))
    fasta = tmp / "asm.fasta"
    fasta.write_text(">s0\n" + SEQ_A + "\n")
    return dict(tmp=tmp, k=k, fasta=str(fasta), read_db=read_db,
                asm_db=asm_db, read_counts=read_counts,
                asm_counts=asm_counts)


def _engine(world, prob=None):
    return KstarEngine(build_lookup(world["read_db"]),
                       build_lookup(world["asm_db"]),
                       world["k"], 2.0, prob_table=prob, chunk=64, batch=2)


def test_rounding_ties_dump(tie_world, tmp_path):
    out = tmp_path / "t.dump"
    run_dump(_engine(tie_world), SeqFile(tie_world["fasta"]), str(out),
             log=io.StringIO())
    got = out.read_text()
    # HAND: v=5 / peak 2 = 2.5 rounds AWAY from zero -> readK 3 (banker's
    # rounding would give 2); v=3 -> 1.5 -> 2; v=4 -> 2.0 -> 2.
    assert got == ("s0\t0\t3.00\t1.00\t2.00\n"
                   "s0\t1\t2.00\t1.00\t1.00\n"
                   "s0\t2\t2.00\t1.00\t1.00\n")
    # refmodel cross-check
    rows = refmodel.dump_mode([("s0", SEQ_A)], tie_world["read_counts"],
                              tie_world["asm_counts"], 5, 2.0)
    ref = "".join(f"{c}\t{p}\t{r:.2f}\t{a:.2f}\t{m:.2f}\n"
                  for c, p, r, a, m in rows)
    assert got == ref


def test_rounding_ties_hist(tie_world, tmp_path):
    out = tmp_path / "t.hist"
    log = io.StringIO()
    res = run_hist(_engine(tie_world), SeqFile(tie_world["fasta"]),
                   str(out), log=log)
    # HAND: over-bins trunc((readK/asmK-1+0.1)/0.2):
    #   readK 3 -> 2.1/0.2 = 10.499... -> bin 10 (printed as 2.0)
    #   readK 2 -> 1.1/0.2 = 5.500...1 -> bin 5  (printed as 1.0), twice
    assert out.read_text() == "0.0\t0\n1.0\t2\n2.0\t1\n"
    assert res["missing"] == 0 and res["kasm"] == 3
    # per-sequence QV line: 0 missing of 3 -> QV inf (C %.2f prints inf)
    assert "s0\t0\t0\t3\tinf" in log.getvalue()
    # refmodel cross-check
    _, undr, over, kasm, missing, _ = refmodel.hist_mode(
        [("s0", SEQ_A)], tie_world["read_counts"], tie_world["asm_counts"],
        5, 2.0)
    assert undr == {} and over == {10: 1, 5: 2}
    assert (kasm, missing) == (3, 0)


# ---------------------------------------------------------------------
# -prob table longer than the max observed count, with a 0-copy row
# ---------------------------------------------------------------------

def test_prob_table_longer_than_max_count(tie_world, tmp_path):
    # 100-row table; every observed value (3, 4, 5) is overridden.
    # Row v=3 maps to copy 0: a k-mer PRESENT in reads becomes missing.
    copy_k = np.full(100, 9, np.uint32)
    copy_p = np.full(100, 0.25, np.float64)
    copy_k[2] = 0
    copy_p[2] = 0.5
    prob = ProbTable(copy_k, copy_p)

    out = tmp_path / "p.dump"
    run_dump(_engine(tie_world, prob), SeqFile(tie_world["fasta"]),
             str(out), log=io.StringIO())
    # HAND: v=5 -> table readK 9 (not round(2.5)); v=3 -> 0 (missing, row
    # still printed because asmK != 0); v=4 -> 9.  K* = 9/1-1 = 8.
    assert out.read_text() == ("s0\t0\t9.00\t1.00\t8.00\n"
                               "s0\t1\t0.00\t1.00\t0.00\n"
                               "s0\t2\t9.00\t1.00\t8.00\n")

    hout = tmp_path / "p.hist"
    log = io.StringIO()
    res = run_hist(_engine(tie_world, prob), SeqFile(tie_world["fasta"]),
                   str(hout), log=log)
    # HAND: two k-mers at bin trunc(8.1/0.2 = 40.499...) = 40 -> "8.0";
    # one missing of 3 -> QV = -10*log10(1-(2/3)^(1/5)) = 11.09.
    assert hout.read_text() == "0.0\t0\n8.0\t2\n"
    assert res["missing"] == 1 and res["kasm"] == 3
    assert "s0\t1\t1\t3\t11.09" in log.getvalue()
    # refmodel cross-check
    _, undr, over, kasm, missing, _ = refmodel.hist_mode(
        [("s0", SEQ_A)], tie_world["read_counts"], tie_world["asm_counts"],
        5, 2.0, copy_k=copy_k.tolist(), copy_p=copy_p.tolist())
    assert over == {40: 2} and (kasm, missing) == (3, 1)


# ---------------------------------------------------------------------
# Variant-mode worlds (k=11)
# ---------------------------------------------------------------------

K = 11


def _run_polish(tmp_path, fasta, vcf_path, read_db, asm_db, peak=30.0,
                comb=15):
    log = io.StringIO()
    vcf = VcfFile(vcf_path, log=log)
    vcf.merge_clusters(K, comb=comb, nosplit=False, log=log)
    out = tmp_path / "out"
    run_variants("polish", SeqFile(fasta), vcf, K,
                 build_lookup(read_db).lookup_np,
                 build_lookup(asm_db).lookup_np,
                 peak=peak, prob_table=None, out_name=str(out), log=log)
    text = (tmp_path / "out.polish.vcf").read_text()
    recs = [l for l in text.splitlines() if not l.startswith("#")]
    return recs, log.getvalue()


def _vcf_text(contigs, rows):
    return ("##fileformat=VCFv4.2\n"
            + "".join(f"##contig=<ID={c}>\n" for c in contigs)
            + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
            + "".join("\t".join(str(x) for x in r) + "\n" for r in rows))


def test_negative_fractional_qual_int_cast(tmp_path):
    """Chosen records print qual int-cast TOWARD ZERO: 33.9 -> 33,
    -9.7 -> -9 (varMer.C:486 `(int)qual`)."""
    rng = random.Random(7)
    genome = random_dna(rng, 120)
    asm = list(genome)
    for p in (40, 80):
        asm[p] = ALT_OF[asm[p]]
    asm = "".join(asm)
    read_db = db_from_dict(refmodel.count_canonical([genome] * 30, K), K,
                           str(tmp_path / "r"))
    asm_db = db_from_dict(refmodel.count_canonical([asm], K), K,
                          str(tmp_path / "a"))
    fasta = tmp_path / "asm.fasta"
    fasta.write_text(">chr1\n" + asm + "\n")
    vcf = tmp_path / "c.vcf"
    vcf.write_text(_vcf_text(["chr1"], [
        ("chr1", 41, ".", asm[40], genome[40], 33.9, "PASS", ".", "GT", "1/1"),
        ("chr1", 81, ".", asm[80], genome[80], -9.7, "PASS", ".", "GT", "1/1"),
    ]))
    recs, _ = _run_polish(tmp_path, str(fasta), str(vcf), read_db, asm_db)
    # HAND-pinned output lines (truncation toward zero, NOT floor)
    assert recs == [
        f"chr1\t41\t.\t{asm[40]}\t{genome[40]}\t33\tPASS\t.\tGT\t1/1",
        f"chr1\t81\t.\t{asm[80]}\t{genome[80]}\t-9\tPASS\t.\tGT\t1/1",
    ]
    # refmodel cross-check: the ALT path really has fewer missing k-mers
    win = asm[40 - (K - 1):41 + (K - 1)]
    paths = refmodel.traverse_paths(win, [K - 1], [1],
                                    [[asm[40], genome[40]]])
    nm = [refmodel.score_path(s, g, i, l, K,
                              refmodel.count_canonical([genome] * 30, K),
                              refmodel.count_canonical([asm], K), 30.0)[0]
          for s, g, i, l in paths]
    assert nm[1] < nm[0]


def test_duplicate_alt_and_invalid_gt_records(tmp_path):
    """Duplicate ALT columns ("G,G" with GT 1/2) BOTH survive allele
    extraction (the reference dedups by column pointer, vcf.C:70-75) but
    collapse to one candidate via addSeqPath's sequence dedup
    (varMer.C:38-45); ./. and 0/0 records get EMPTY allele lists
    (vcf.C:34-39) yet are NOT excluded from loading or clustering — the
    merge's removal check tests _gts.size(), which is never 0
    (vcf.C:185-188) — so their clusters enumerate zero paths and emit
    nothing."""
    rng = random.Random(11)
    genome = random_dna(rng, 150)
    asm = list(genome)
    asm[60] = ALT_OF[asm[60]]
    asm = "".join(asm)
    true_base = genome[60]
    read_db = db_from_dict(refmodel.count_canonical([genome] * 30, K), K,
                           str(tmp_path / "r"))
    asm_db = db_from_dict(refmodel.count_canonical([asm], K), K,
                          str(tmp_path / "a"))
    fasta = tmp_path / "asm.fasta"
    fasta.write_text(">chr1\n" + asm + "\n")
    vcf = tmp_path / "c.vcf"
    vcf.write_text(_vcf_text(["chr1"], [
        ("chr1", 30, ".", asm[29], ALT_OF[asm[29]], 5, "PASS", ".", "GT", "./."),
        ("chr1", 61, ".", asm[60], f"{true_base},{true_base}", 17.8, "PASS",
         ".", "GT", "1/2"),
        ("chr1", 100, ".", asm[99], ALT_OF[asm[99]], 5, "PASS", ".", "GT", "0/0"),
    ]))
    recs, log = _run_polish(tmp_path, str(fasta), str(vcf), read_db, asm_db)
    # HAND: only the deduped correction survives, emitted hom with the
    # single deduplicated ALT; the ./. and 0/0 records vanish entirely.
    assert recs == [f"chr1\t61\t.\t{asm[60]}\t{true_base}\t17\tPASS\t.\tGT\t1/1"]
    # HAND: "Excluded" counts only malformed lines (vcf.C:113-117); the
    # ./. and 0/0 records load and remain their own (dead) clusters.
    assert "Excluded 0 invalid records" in log
    assert "Reduced 3 variants down to 3 combinations" in log


def test_invalid_gt_adjacent_to_true_correction_kills_cluster(tmp_path):
    """Reference parity for a destructive quirk: a ./. record within the
    2k merge window of a TRUE correction merges into its cluster; the
    empty-allele position makes traverse() enumerate zero paths, so the
    true correction is silently lost (vcf.C:185-188 + the zero-haplotype
    loop in merfin-variants.C:22-126)."""
    rng = random.Random(23)
    genome = random_dna(rng, 150)
    asm = list(genome)
    asm[60] = ALT_OF[asm[60]]
    asm = "".join(asm)
    read_db = db_from_dict(refmodel.count_canonical([genome] * 30, K), K,
                           str(tmp_path / "r"))
    asm_db = db_from_dict(refmodel.count_canonical([asm], K), K,
                          str(tmp_path / "a"))
    fasta = tmp_path / "asm.fasta"
    fasta.write_text(">chr1\n" + asm + "\n")
    vcf = tmp_path / "c.vcf"
    # ./. at 0-based 49, correction at 0-based 60: 60 < 49+1+2k(22) = 72
    vcf.write_text(_vcf_text(["chr1"], [
        ("chr1", 50, ".", asm[49], ALT_OF[asm[49]], 5, "PASS", ".", "GT", "./."),
        ("chr1", 61, ".", asm[60], genome[60], 17.8, "PASS", ".", "GT", "1/1"),
    ]))
    recs, log = _run_polish(tmp_path, str(fasta), str(vcf), read_db, asm_db)
    assert "Reduced 2 variants down to 1 combinations" in log
    assert recs == []            # the correction is lost, as in the reference


def test_window_clamp_panic_short_sequence(tmp_path):
    """seq_len < k-1 makes (uint32)(seq_len - k + 1) wrap, the pad
    clamp extends r_end past the sequence, and the region copy fails:
    PANIC-skip, not a crash (merfin-variants.C:166-217)."""
    rng = random.Random(13)
    filler = random_dna(rng, 60)
    read_db = db_from_dict(refmodel.count_canonical([filler] * 30, K), K,
                           str(tmp_path / "r"))
    asm_db = db_from_dict(refmodel.count_canonical([filler], K), K,
                          str(tmp_path / "a"))
    fasta = tmp_path / "asm.fasta"
    fasta.write_text(">tiny\nACGTA\n>filler\n" + filler + "\n")
    vcf = tmp_path / "c.vcf"
    vcf.write_text(_vcf_text(["tiny"], [
        ("tiny", 3, ".", "G", "T", 9, "PASS", ".", "GT", "1/1"),
    ]))
    recs, log = _run_polish(tmp_path, str(fasta), str(vcf), read_db, asm_db)
    assert recs == []
    # HAND: k_padd=10; r_start = 2 -> 0; limit = (5-10) mod 2^32 is huge,
    # so r_end = 3+10 = 13 > seq length -> invalid region
    assert "PANIC : Invalid region specified: tiny : 0 - 13" in log


def test_window_clamp_boundaries_still_evaluate(tmp_path):
    """Clamps at both sequence ends (r_start -> 0, r_end -> seq_len,
    including rEnd == seq_len-k_padd exactly) still evaluate and pick
    the true correction."""
    rng = random.Random(17)
    worlds = []
    for name, err in (("sA", 25), ("sB", 19)):
        g = random_dna(rng, 30)
        a = list(g)
        a[err] = ALT_OF[a[err]]
        worlds.append((name, g, "".join(a), err))
    reads = [g for _, g, _, _ in worlds] * 30
    asms = [a for _, _, a, _ in worlds]
    read_db = db_from_dict(refmodel.count_canonical(reads, K), K,
                           str(tmp_path / "r"))
    asm_db = db_from_dict(refmodel.count_canonical(asms, K), K,
                          str(tmp_path / "a"))
    fasta = tmp_path / "asm.fasta"
    fasta.write_text("".join(f">{n}\n{a}\n" for n, _, a, _ in worlds))
    vcf = tmp_path / "c.vcf"
    vcf.write_text(_vcf_text([n for n, _, _, _ in worlds], [
        (n, e + 1, ".", a[e], g[e], 44.2, "PASS", ".", "GT", "1/1")
        for n, g, a, e in worlds
    ]))
    recs, _ = _run_polish(tmp_path, str(fasta), str(vcf), read_db, asm_db)
    # HAND: sA window = [15, 30) (r_end clamped to seq end), sB window =
    # [9, 30) (rEnd 20 == limit 20 -> clamps); both corrections chosen.
    assert recs == [
        f"sA\t26\t.\t{worlds[0][2][25]}\t{worlds[0][1][25]}\t44\tPASS\t.\tGT\t1/1",
        f"sB\t20\t.\t{worlds[1][2][19]}\t{worlds[1][1][19]}\t44\tPASS\t.\tGT\t1/1",
    ]


def test_deletion_path_shorter_than_k_wins_by_size_t_rule(tmp_path):
    """A deletion that shrinks the window below k yields a path with
    ZERO k-mers: numM == 0, and the all-missing exclusion
    `numM == size() - k + 1` can't fire because the right side wraps in
    size_t (varMer.C:408).  The REF path (every k-mer missing from
    reads) IS excluded — the deletion wins."""
    asm = "AGTACGTTCAGCAT"               # 14 bp: REF path has 4 k-mers
    rng = random.Random(19)
    filler = random_dna(rng, 60)
    read_db = db_from_dict(refmodel.count_canonical([filler] * 30, K), K,
                           str(tmp_path / "r"))
    asm_db = db_from_dict(
        refmodel.count_canonical([asm, filler], K), K, str(tmp_path / "a"))
    fasta = tmp_path / "asm.fasta"
    fasta.write_text(">tiny\n" + asm + "\n>filler\n" + filler + "\n")
    vcf = tmp_path / "c.vcf"
    vcf.write_text(_vcf_text(["tiny"], [
        ("tiny", 2, ".", "GTACGT", "G", 12.9, "PASS", ".", "GT", "1/1"),
    ]))
    recs, _ = _run_polish(tmp_path, str(fasta), str(vcf), read_db, asm_db)
    # HAND: ALT path length 9 < k=11 -> 0 k-mers -> numM 0 -> kept; REF
    # path numM 4 == 14-11+1 -> excluded as all-missing; qual 12.9 -> 12
    assert recs == ["tiny\t2\t.\tGTACGT\tG\t12\tPASS\t.\tGT\t1/1"]
    # refmodel cross-check of the two paths' numM
    paths = refmodel.traverse_paths(asm, [1], [6], [["GTACGT", "G"]])
    rd = refmodel.count_canonical([filler] * 30, K)
    ad = refmodel.count_canonical([asm, filler], K)
    nm = [refmodel.score_path(s, g, i, l, K, rd, ad, 30.0)[0]
          for s, g, i, l in paths]
    assert nm == [4, 0]


# ---------------------------------------------------------------------
# -completeness slice accounting: asm-only k-mers are SKIPPED
# (merfin-completeness.C:100-109), read-only contribute readK, ties at
# v/peak = x.5 round half-away.  All totals hand-computed.
# ---------------------------------------------------------------------

def _pack5(s: str) -> int:
    """Independent 2-bit packing (A=0 C=1 G=2 T=3, first base most
    significant) — deliberately re-derived, not imported."""
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    v = 0
    for ch in s:
        v = (v << 2) | code[ch]
    return v


def test_completeness_asm_only_skip_hand_computed(tmp_path):
    import re

    from merfin_tpu.modes.completeness import run_completeness

    k = 5
    both1 = _canon("ACGTA")    # read 5, asm 1: readK round(2.5)=3, undr 2
    both2 = _canon("GGATC")    # read 3, asm 4: readK round(1.5)=2, undr 0
    ronly = _canon("TTACG")    # read 7 only:   readK round(3.5)=4, undr 4
    low = _canon("CATAG")      # read 1, asm 2: v<peak -> readK 1, undr 0
    aonly = _canon("GCGCA")    # asm 9 ONLY: skipped entirely
    kmers = [both1, both2, ronly, low, aonly]
    assert len(set(kmers)) == 5

    read_db = db_from_dict({both1: 5, both2: 3, ronly: 7, low: 1},
                           k, str(tmp_path / "r"))
    asm_db = db_from_dict({both1: 1, both2: 4, low: 2, aonly: 9},
                          k, str(tmp_path / "a"))

    log = io.StringIO()
    res = run_completeness(read_db, asm_db, peak=2.0, log=log)
    # hand arithmetic: total = 3+2+4+1 = 10; undrc = 2+0+4+0 = 6
    assert res["total"] == 10.0
    assert res["undrc"] == 6.0
    assert res["completeness"] == pytest.approx(1.0 - 6.0 / 10.0)

    # per-slice lines: every read k-mer lands in slice key >> (2k-6);
    # the asm-only k-mer contributes to NO slice
    shift = 2 * k - 6
    per_slice = {}
    for km, t, u in ((both1, 3, 2), (both2, 2, 0), (ronly, 4, 4), (low, 1, 0)):
        s = _pack5(km) >> shift
        a, b = per_slice.get(s, (0, 0))
        per_slice[s] = (a + t, b + u)
    lines = {int(m.group(1)): (float(m.group(2)), float(m.group(3)))
             for m in re.finditer(
                 r"thread\s+(\d+) total\s+([\d.]+) underc\s+([\d.]+)",
                 log.getvalue())}
    for s, (t, u) in per_slice.items():
        assert lines[s] == (t, u), (s, lines[s], (t, u))
    aslice = _pack5(aonly) >> shift
    if aslice not in per_slice:      # no read k-mer shares its slice
        assert lines[aslice] == (0.0, 0.0)


# ---------------------------------------------------------------------
# BinOverflow mid-group retry on the PACKED path: a small-scaffold group
# whose middle sequence bins past nbins must grow-and-retry the whole
# group exactly once (increaseArray semantics, merfin-histogram.C:105-124)
# without double-counting.
# ---------------------------------------------------------------------

def test_bin_overflow_mid_group_retry(tmp_path):
    k = 5
    rng = random.Random(77)
    quiet1 = random_dna(rng, 40)
    quiet2 = random_dna(rng, 40)
    hot = "ACGTA" + "T" * 0    # one k-mer; asm count 8 vs readK 1

    counts_r = refmodel.count_canonical([quiet1, quiet2, hot], k)
    counts_a = dict(counts_r)
    counts_a[_canon("ACGTA")] = 8      # ratio (8-1+0.1)/0.2 -> bin 35
    read_db = db_from_dict(counts_r, k, str(tmp_path / "r"))
    asm_db = db_from_dict(counts_a, k, str(tmp_path / "a"))

    fasta = tmp_path / "s.fasta"
    fasta.write_text(f">s1\n{quiet1}\n>hot\n{hot}\n>s2\n{quiet2}\n")

    def run(nbins):
        eng = KstarEngine(build_lookup(read_db), build_lookup(asm_db), k,
                          peak=1.0, chunk=64, batch=2)
        eng.nbins = nbins
        eng._make_jits()
        log = io.StringIO()
        res = run_hist(eng, SeqFile(str(fasta)),
                       str(tmp_path / f"h{nbins}.hist"), log=log)
        return res, log.getvalue(), (tmp_path / f"h{nbins}.hist").read_text()

    res_small, log_small, hist_small = run(32)      # must overflow+retry
    res_big, log_big, hist_big = run(128)           # fits from the start

    assert "-- Growing k* histogram to 64 bins." in log_small
    assert res_small == res_big
    assert hist_small == hist_big
    # the hot k-mer's hand-computed bin: trunc((8/1 - 1 + 0.1)/0.2) = 35
    assert "-7.0\t1\n" in hist_small   # 35 * -0.2
    # per-seq lines identical (no double counting on the retried group)
    small_lines = [l for l in log_small.splitlines() if l.startswith(("s1", "s2", "hot"))]
    big_lines = [l for l in log_big.splitlines() if l.startswith(("s1", "s2", "hot"))]
    assert small_lines == big_lines


# ---------------------------------------------------------------------
# -loose [0]+1 special case (varMer.C:330-333): REF neutral + exactly
# one tying ALT selects the ALT silently; three-way ties warn and pick
# the max-ALT path.  Driven through BOTH the scalar selector and the
# array-native select_block (fused scorer).
# ---------------------------------------------------------------------

def test_loose_ref_neutral_special_case_scalar_and_block(tmp_path):
    from merfin_tpu.variants.device_score import DeviceScorer

    k = 7
    rng = random.Random(31)
    g_a = random_dna(rng, 120)
    p = 60
    alt_b = ALT_OF[g_a[p]]
    alt_c = ALT_OF[alt_b]
    g_b = g_a[:p] + alt_b + g_a[p + 1:]
    g_c = g_a[:p] + alt_c + g_a[p + 1:]

    def world(name, reads, alt_field, gt="1/1"):
        wdir = tmp_path / name
        wdir.mkdir()
        read_db = db_from_dict(refmodel.count_canonical(reads, k), k,
                               str(wdir / "r"))
        asm_db = db_from_dict(refmodel.count_canonical([g_a], k), k,
                              str(wdir / "a"))
        fasta = wdir / "asm.fasta"
        fasta.write_text(f">chr1\n{g_a}\n")
        vcf = wdir / "c.vcf"
        vcf.write_text(
            "##fileformat=VCFv4.2\n##contig=<ID=chr1>\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
            f"chr1\t{p + 1}\t.\t{g_a[p]}\t{alt_field}\t30\tPASS\t.\tGT\t{gt}\n")
        return wdir, read_db, asm_db, str(fasta), str(vcf)

    def run_loose(wdir, read_db, asm_db, fasta, vcf_path, tag, scorer_on):
        rl = build_lookup(read_db)
        al = build_lookup(asm_db)
        vcf = VcfFile(vcf_path, log=io.StringIO())
        vcf.merge_clusters(k, comb=15, nosplit=False, log=io.StringIO())
        scorer = DeviceScorer(rl, al, k, 30.0, None) if scorer_on else None
        log = io.StringIO()
        run_variants("loose", SeqFile(fasta), vcf, k, rl.lookup_np,
                     al.lookup_np, peak=30.0, prob_table=None,
                     out_name=str(wdir / tag), log=log, scorer=scorer)
        body = [l for l in (wdir / f"{tag}.filter.vcf").read_text()
                .splitlines() if not l.startswith("#")]
        return body, log.getvalue()

    # case 1: reads hold A+B haplotypes -> REF and ALT both 0-missing ->
    # idxs == [REF, ALT] -> silent ALT selection ([0]+1 rule)
    w1 = world("two", [g_a] * 20 + [g_b] * 20, alt_b)
    for scorer_on in (False, True):
        body, log_txt = run_loose(*w1, f"t{scorer_on}", scorer_on)
        assert len(body) == 1
        f = body[0].split("\t")
        assert (f[1], f[3], f[4]) == (str(p + 1), g_a[p], alt_b)
        assert f[9].startswith("1/1")
        assert "[ WARNING ]" not in log_txt, "the [0]+1 case is silent"

    # case 2: A+B+C haplotypes with ALT "B,C" -> three neutral paths ->
    # warning + max-ALT selection (count 1 each -> first ALT path wins)
    w2 = world("three", [g_a] * 20 + [g_b] * 20 + [g_c] * 20,
               f"{alt_b},{alt_c}", gt="1/2")
    for scorer_on in (False, True):
        body, log_txt = run_loose(*w2, f"t{scorer_on}", scorer_on)
        assert len(body) == 1
        f = body[0].split("\t")
        assert (f[3], f[4]) == (g_a[p], alt_b), "first tying ALT path wins"
        assert "Multiple (3) alternate pathes" in log_txt
        assert "Max. 1 ALT variants selected" in log_txt


# ---------------------------------------------------------------------
# -polish het branch end-to-end (varMer.C:427-467): two zero-missing
# paths with EQUAL totdK doubles -> het 1/2 record; and the fixed plain
# scan e2e (a zero-missing path must clear pre-zero survivors — the
# round-4 confirmed bug would route selection through stale idxs here).
# ---------------------------------------------------------------------

def test_polish_het_equal_totdk_emits_1_2(tmp_path):
    """Balanced two-haplotype reads at an asm error site: both ALT paths
    score zero missing with symmetric counts -> equal totdK doubles ->
    getHetRecord 1/2 with both alleles, hap order = insertion order
    (equal lengths keep idx1 first, varMer.C:453-459)."""
    rng = random.Random(55)
    g_a = random_dna(rng, 140)
    p = 70
    alt_b = ALT_OF[g_a[p]]
    alt_c = ALT_OF[alt_b]
    g_b = g_a[:p] + alt_b + g_a[p + 1:]
    g_c = g_a[:p] + alt_c + g_a[p + 1:]
    # asm carries A (neither haplotype); reads are a balanced B/C mix
    read_db = db_from_dict(
        refmodel.count_canonical([g_b] * 20 + [g_c] * 20, K), K,
        str(tmp_path / "r"))
    asm_db = db_from_dict(refmodel.count_canonical([g_a], K), K,
                          str(tmp_path / "a"))
    fasta = tmp_path / "asm.fasta"
    fasta.write_text(">chr1\n" + g_a + "\n")
    vcf = tmp_path / "c.vcf"
    vcf.write_text(_vcf_text(["chr1"], [
        ("chr1", p + 1, ".", g_a[p], f"{alt_b},{alt_c}", 44.7, "PASS", ".",
         "GT", "1/2"),
    ]))
    recs, _ = _run_polish(tmp_path, str(fasta), str(vcf), read_db, asm_db)
    assert recs == [f"chr1\t{p + 1}\t.\t{g_a[p]}\t{alt_b},{alt_c}\t44"
                    "\tPASS\t.\tGT\t1/2"]


def test_polish_zero_path_clears_survivors_e2e(tmp_path):
    """Reads hold only haplotype B; ALT field is "B,C" with C spurious.
    Path order is [REF, B, C]: REF scores k missing, B zero, C k
    missing.  The plain bestVariant scan CLEARS the REF survivor when B
    arrives (varMer.C:411-414) -> hom B.  Under the old bestFilter-style
    double-push the stale REF path stayed in idxs and the int-truncated
    multimap could pick it (emitting nothing) — this pins the fix e2e."""
    rng = random.Random(56)
    g_a = random_dna(rng, 140)
    p = 70
    alt_b = ALT_OF[g_a[p]]
    alt_c = ALT_OF[alt_b]
    g_b = g_a[:p] + alt_b + g_a[p + 1:]
    read_db = db_from_dict(refmodel.count_canonical([g_b] * 30, K), K,
                           str(tmp_path / "r"))
    asm_db = db_from_dict(refmodel.count_canonical([g_a], K), K,
                          str(tmp_path / "a"))
    fasta = tmp_path / "asm.fasta"
    fasta.write_text(">chr1\n" + g_a + "\n")
    vcf = tmp_path / "c.vcf"
    vcf.write_text(_vcf_text(["chr1"], [
        ("chr1", p + 1, ".", g_a[p], f"{alt_b},{alt_c}", 31.2, "PASS", ".",
         "GT", "1/2"),
    ]))
    recs, _ = _run_polish(tmp_path, str(fasta), str(vcf), read_db, asm_db)
    assert recs == [f"chr1\t{p + 1}\t.\t{g_a[p]}\t{alt_b}\t31"
                    "\tPASS\t.\tGT\t1/1"]
