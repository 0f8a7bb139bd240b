"""Streaming data plane: windowed parsing parity + bounded memory.

The round-1 data plane read whole files into RAM; genome-scale inputs
require the windowed stream path (VERDICT round 1, item 1).  These tests
drive the native and pure-Python stream parsers over hostile inputs
(multi-line FASTQ, CRLF, truncated records, records spanning windows) and
assert record-level parity plus exact k-mer counting through packed
blocks.
"""

import gzip

import numpy as np
import pytest

from merfin_tpu.io.fasta import PyStreamParser, SeqFile, Sequence
from merfin_tpu.kcore.pack import encode_bases


def _native_parser():
    from merfin_tpu import native

    try:
        return native.StreamParser()
    except Exception:
        pytest.skip("native library unavailable")


def _collect(parser, data: bytes, window: int):
    """Drive a stream parser in windows; return [(name, codes-list)]."""
    recs = []
    for off in range(0, len(data), window):
        block = data[off: off + window]
        final = off + window >= len(data)
        names, codes, offsets, flags = parser.feed(block, is_final=final)
        ni = 0
        for i in range(len(flags)):
            if flags[i]:
                recs.append([names[ni], []])
                ni += 1
            recs[-1][1].extend(codes[offsets[i]: offsets[i + 1]].tolist())
    if not data:
        names, codes, offsets, flags = parser.feed(b"", is_final=True)
        assert len(flags) == 0
    return [(n, c) for n, c in recs]


CASES = {
    "fasta_plain": b">a x\nACGT\n>b\nGGTTAA\n",
    "fasta_multiline": b">s1 desc here\nACGTACGT\nGGGG\nTT\n>s2\nA\n",
    "fasta_crlf": b">a\r\nAC\r\nGT\r\n>b\r\nGG\r\n",
    "fasta_empty_rec": b">a\n>b\nACGT\n>c\n",
    "fasta_no_final_newline": b">a\nACGT\n>b\nGGG",
    "fasta_n_bases": b">a\nACNNGT\nNNN\n",
    "fastq_plain": b"@r1 d\nACGT\n+\nIIII\n@r2\nGGTA\n+xx\n!!!!\n",
    "fastq_multiline": (
        b"@r1\nACGT\nGGAA\n+\nIIII\nIIII\n@r2\nTTTT\n+\nJJJJ\n"
    ),
    "fastq_at_in_qual": b"@r1\nACGT\n+\n@@@@\n@r2\nGGGG\n+\nIIII\n",
    "fastq_crlf": b"@r1\r\nACGT\r\n+\r\nIIII\r\n",
    "fastq_truncated_qual": b"@r1\nACGT\n+\nII",
    "fastq_truncated_seq": b"@r1\nACGT\n+\nIIII\n@r2\nGG",
    "blank_lines": b">a\nACGT\n\n>b\n\nGG\n",
}


def _reference_records(data: bytes):
    """Record-level oracle from the PyStreamParser at window=len(data)."""
    return _collect(PyStreamParser(), data, max(len(data), 1))


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("window", [1, 3, 7, 1 << 20])
def test_native_stream_matches_python(name, window):
    data = CASES[name]
    want = _reference_records(data)
    got = _collect(_native_parser(), data, window)
    assert got == want


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("window", [2, 5])
def test_python_stream_window_invariant(name, window):
    data = CASES[name]
    assert _collect(PyStreamParser(), data, window) == _reference_records(data)


def test_stream_oracle_values():
    recs = _reference_records(CASES["fastq_multiline"])
    assert recs == [
        ("r1", encode_bases(b"ACGTGGAA").tolist()),
        ("r2", encode_bases(b"TTTT").tolist()),
    ]
    recs = _reference_records(CASES["fasta_empty_rec"])
    assert [n for n, _ in recs] == ["a", "b", "c"]
    assert recs[0][1] == [] and recs[2][1] == []
    # truncated quality keeps the bases (dnaSeqFile tolerance, merfin.C:38)
    recs = _reference_records(CASES["fastq_truncated_qual"])
    assert recs == [("r1", encode_bases(b"ACGT").tolist())]


def test_iter_coded_small_windows(tmp_path):
    p = tmp_path / "x.fa"
    p.write_bytes(CASES["fasta_multiline"])
    whole = [(s.ident, s.codes().tolist())
             for s in SeqFile(str(p)).iter_coded()]
    small = [(s.ident, s.codes().tolist())
             for s in SeqFile(str(p)).iter_coded(window=4)]
    assert whole == small == [
        ("s1", encode_bases(b"ACGTACGTGGGGTT").tolist()),
        ("s2", encode_bases(b"A").tolist()),
    ]


def test_iter_bytes_streaming(tmp_path):
    p = tmp_path / "x.fq.gz"
    with gzip.open(p, "wb") as f:
        f.write(CASES["fastq_multiline"])
    seqs = list(SeqFile(str(p)))
    assert [(s.ident, s.bases) for s in seqs] == [
        ("r1", b"ACGTGGAA"), ("r2", b"TTTT")]
    assert seqs[0].copy_region(2, 5) == b"GTG"


def _count_dict(db):
    from merfin_tpu.io.meryl_text import decode_kmer

    return {decode_kmer(int(k), db.k): int(v)
            for k, v in zip(np.asarray(db.keys), np.asarray(db.vals))}


@pytest.mark.parametrize("window", [16, 37, 1 << 20])
def test_iter_packed_counting_exact(tmp_path, window):
    """Counting through tiny packed windows == brute-force k-mer counts."""
    from merfin_tpu.count.counter import count_sequences

    rng = np.random.default_rng(7)
    k = 5
    seqs = []
    for i in range(12):
        n = int(rng.integers(1, 60))
        seqs.append("".join(rng.choice(list("ACGTN"), n,
                                       p=[0.24, 0.24, 0.24, 0.24, 0.04])))
    fa = tmp_path / "r.fa"
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))

    # brute-force canonical counts
    comp = str.maketrans("ACGT", "TGCA")
    want: dict[str, int] = {}
    for s in seqs:
        for j in range(len(s) - k + 1):
            m = s[j: j + k]
            if any(c not in "ACGT" for c in m):
                continue
            rc = m.translate(comp)[::-1]
            c = min(m, rc)
            want[c] = want.get(c, 0) + 1

    blocks = list(SeqFile(str(fa)).iter_packed(k, window=window))
    keys, vals, total = count_sequences(iter(blocks), k, use_device=False)
    from merfin_tpu.io.meryl_text import decode_kmer

    got = {decode_kmer(int(kk), k): int(vv) for kk, vv in zip(keys, vals)}
    assert got == want
    assert total == sum(want.values())


def test_count_files_window_parity(tmp_path):
    """count_files through small stream windows == one-shot counting,
    including a record far larger than the window (bounded memory)."""
    from merfin_tpu.count.counter import count_files

    rng = np.random.default_rng(3)
    big = "".join(rng.choice(list("ACGT"), 5000))
    reads = ["".join(rng.choice(list("ACGT"), 40)) for _ in range(50)]
    fq = tmp_path / "reads.fq.gz"
    with gzip.open(fq, "wt") as f:
        f.write(f"@big\n{big}\n+\n{'I' * len(big)}\n")
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")

    db1 = count_files([str(fq)], 11, str(tmp_path / "db1"), use_device=False)
    # force many windows mid-record: bounded-memory path must agree
    db2 = count_files([str(fq)], 11, str(tmp_path / "db2"),
                      use_device=False, window=256)
    assert np.array_equal(np.asarray(db1.keys), np.asarray(db2.keys))
    assert np.array_equal(np.asarray(db1.vals), np.asarray(db2.vals))
    assert db1.total == db2.total


def test_iter_packed_block_size_bounded(tmp_path):
    """Blocks never exceed the window by more than separators+carry."""
    p = tmp_path / "big.fa"
    rng = np.random.default_rng(1)
    p.write_text(">one\n" + "".join(rng.choice(list("ACGT"), 4000)) + "\n")
    k, window = 21, 512
    blocks = list(SeqFile(str(p)).iter_packed(k, window=window))
    assert len(blocks) > 4
    for b in blocks:
        assert b.codes().shape[0] <= window + 2 * (k - 1) + 1
