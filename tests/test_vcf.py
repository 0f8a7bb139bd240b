"""VCF parsing, allele extraction and cluster merging."""

import io

import pytest

from merfin_tpu.io.vcf import VcfFile, VcfRecord, GtAllele


def _vcf(tmp_path, body: str, name="t.vcf"):
    p = tmp_path / name
    p.write_text(
        "##fileformat=VCFv4.2\n"
        "##contig=<ID=chr1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n" + body
    )
    return str(p)


def _rec(line: str) -> VcfRecord:
    r = VcfRecord.load(line)
    assert r is not None
    return r


def test_record_parsing_and_save():
    r = _rec("chr1\t100\t.\tA\tT,G\t31.5\tPASS\t.\tGT:DP\t1/2:6")
    assert r.chrom == "chr1" and r.pos == 100 and r.ref == "A"
    assert r.alt_list == ["T", "G"]
    assert r.save() == "chr1\t100\t.\tA\tT,G\t31.5\tPASS\t.\tGT:DP\t1/2:6\n"


def test_too_few_columns_rejected():
    assert VcfRecord.load("chr1\t1\t.\tA\tT\t1\tPASS\t.\tGT") is None


def test_gt_allele_extraction():
    gt = GtAllele(_rec("chr1\t10\t.\tAC\tA\t5\tPASS\t.\tGT\t1/1"))
    assert gt.pos == 9 and gt.ref_len == 2
    assert gt.alleles == ["AC", "A"]

    # het keeps the alt (invalidate flag is never read back)
    gt = GtAllele(_rec("chr1\t10\t.\tA\tT\t5\tPASS\t.\tGT\t0/1"))
    assert gt.alleles == ["A", "T"]

    # ./. and 0/0 yield empty allele lists
    for s in ("./.", "0/0"):
        gt = GtAllele(_rec(f"chr1\t10\t.\tA\tT\t5\tPASS\t.\tGT\t{s}"))
        assert gt.alleles == []

    # 1/2 multiallelic
    gt = GtAllele(_rec("chr1\t10\t.\tA\tT,G\t5\tPASS\t.\tGT\t1/2"))
    assert gt.alleles == ["A", "T", "G"]

    # same alt index twice dedups; duplicate STRINGS in different columns survive
    gt = GtAllele(_rec("chr1\t10\t.\tA\tT,T\t5\tPASS\t.\tGT\t1/2"))
    assert gt.alleles == ["A", "T", "T"]

    # alt equal to ref string is dropped
    gt = GtAllele(_rec("chr1\t10\t.\tA\tA,G\t5\tPASS\t.\tGT\t1/2"))
    assert gt.alleles == ["A", "G"]

    # out-of-range alt index is skipped
    gt = GtAllele(_rec("chr1\t10\t.\tA\tT\t5\tPASS\t.\tGT\t1/3"))
    assert gt.alleles == ["A", "T"]

    # phased separator
    gt = GtAllele(_rec("chr1\t10\t.\tA\tT\t5\tPASS\t.\tGT\t1|1"))
    assert gt.alleles == ["A", "T"]


def test_merge_clusters(tmp_path):
    k = 5  # K_OFFSET = 10
    body = (
        "chr1\t10\t.\tA\tT\t1\tPASS\t.\tGT\t1/1\n"      # pos0 9
        "chr1\t15\t.\tC\tG\t1\tPASS\t.\tGT\t1/1\n"      # pos0 14: 14 < 10+10 merge
        "chr1\t40\t.\tG\tC\t1\tPASS\t.\tGT\t1/1\n"      # 39 >= 15+10 -> new
        "chr2\t5\t.\tT\tA\t1\tPASS\t.\tGT\t1/1\n"
    )
    vf = VcfFile(_vcf(tmp_path, body), log=io.StringIO())
    vf.merge_clusters(k, comb=15, nosplit=False, log=io.StringIO())
    c1 = vf.by_chrom["chr1"]
    assert len(c1) == 2
    assert len(c1[0].gts) == 2
    assert c1[0].r_start == 9 and c1[0].r_end == 15
    assert len(vf.by_chrom["chr2"]) == 1


def test_merge_split_at_comb(tmp_path):
    k = 5
    rows = [f"chr1\t{10 + i}\t.\tA\tT\t1\tPASS\t.\tGT\t1/1" for i in range(6)]
    path = _vcf(tmp_path, "\n".join(rows) + "\n")
    vf = VcfFile(path, log=io.StringIO())
    vf.merge_clusters(k, comb=3, nosplit=False, log=io.StringIO())
    sizes = [len(p.gts) for p in vf.by_chrom["chr1"]]
    assert sizes == [3, 3]

    vf2 = VcfFile(path, log=io.StringIO())
    vf2.merge_clusters(k, comb=3, nosplit=True, log=io.StringIO())
    sizes2 = [len(p.gts) for p in vf2.by_chrom["chr1"]]
    assert sizes2 == [6]


def test_headers_counted(tmp_path):
    vf = VcfFile(_vcf(tmp_path, "chr1\t10\t.\tA\tT\t1\tPASS\t.\tGT\t1/1\n"),
                 log=io.StringIO())
    assert len(vf.headers) == 3
    assert vf._num_chr == 1
