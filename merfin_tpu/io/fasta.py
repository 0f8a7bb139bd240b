"""FASTA/FASTQ sequence input.

Equivalent of the reference's dnaSeqFile/dnaSeq (consumed at merfin.C:38,45
and merfin-variants.C:208): sequential sequence loading with transparent
compression, identifiers cut at the first whitespace, and region copy.

A fast C++ parser (merfin_tpu/native) is used when available; this module
is the always-available pure-Python implementation with identical output.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np

from merfin_tpu.io.compressed import open_read
from merfin_tpu.kcore.pack import encode_bases


@dataclasses.dataclass
class Sequence:
    ident: str            # name up to first whitespace (dnaSeq::ident())
    bases: bytes          # raw sequence bytes, original case

    def __len__(self) -> int:
        return len(self.bases)

    @property
    def length(self) -> int:
        return len(self.bases)

    def codes(self) -> np.ndarray:
        """2-bit codes with 4 for non-ACGT."""
        return encode_bases(self.bases)

    def copy_region(self, start: int, end: int) -> bytes | None:
        """dnaSeq::copy(buf, start, end, true): [start, end) slice.

        Returns None when the region is invalid, triggering the caller's
        PANIC-skip (merfin-variants.C:208-211).
        """
        if start >= end or end > len(self.bases):
            return None
        return self.bases[start:end]


@dataclasses.dataclass
class CodedSequence:
    """A sequence already in 2-bit code form (native fast path)."""

    ident: str
    _codes: np.ndarray

    @property
    def length(self) -> int:
        return int(self._codes.shape[0])

    def codes(self) -> np.ndarray:
        return self._codes


class SeqFile:
    """Streaming FASTA/FASTQ reader (gz/bz2/xz transparent)."""

    def __init__(self, path: str):
        self.path = path

    def iter_coded(self):
        """Yield sequences with .ident/.codes() — via the native C++
        parser (merfin_tpu/native) when available, else pure Python."""
        from merfin_tpu import native

        with open_read(self.path) as f:
            data = f.read()
        parsed = native.parse_seqs(data) if data[:1] in (b">", b"@") else None
        if parsed is not None:
            names, codes, offsets = parsed
            for i, name in enumerate(names):
                yield CodedSequence(name, codes[offsets[i] : offsets[i + 1]])
            return
        for seq in self._parse(b"", _Buf(data)):
            yield seq

    def __iter__(self) -> Iterator[Sequence]:
        with open_read(self.path) as f:
            first = f.peek(1)[:1] if hasattr(f, "peek") else b""
            if not first:
                head = f.read(1)
                if not head:
                    return
                yield from self._parse(head, f)
                return
            yield from self._parse(b"", f)

    def _parse(self, head: bytes, f) -> Iterator[Sequence]:
        data = head + f.read()
        if not data:
            return
        if data[:1] == b">":
            yield from _parse_fasta(data)
        elif data[:1] == b"@":
            yield from _parse_fastq(data)
        else:
            raise ValueError(f"{self.path}: not FASTA or FASTQ")


class _Buf:
    def __init__(self, data: bytes):
        self._data = data

    def read(self) -> bytes:
        return self._data


def _parse_fasta(data: bytes) -> Iterator[Sequence]:
    # Split on header lines; tolerate \r\n.
    pos = 0
    n = len(data)
    while pos < n:
        assert data[pos : pos + 1] == b">", "malformed FASTA"
        eol = data.find(b"\n", pos)
        if eol < 0:
            eol = n
        header = data[pos + 1 : eol].rstrip(b"\r")
        ident = header.split()[0].decode("ascii") if header.split() else ""
        nxt = data.find(b">", eol)
        if nxt < 0:
            nxt = n
        seq = data[eol + 1 : nxt] if eol + 1 <= nxt else b""
        seq = seq.replace(b"\n", b"").replace(b"\r", b"")
        yield Sequence(ident, seq)
        pos = nxt


def _parse_fastq(data: bytes) -> Iterator[Sequence]:
    lines = data.split(b"\n")
    i = 0
    while i + 3 < len(lines) or (i < len(lines) and lines[i].startswith(b"@")):
        if i + 1 >= len(lines):
            break
        header = lines[i].rstrip(b"\r")
        if not header.startswith(b"@"):
            i += 1
            continue
        seq = lines[i + 1].rstrip(b"\r")
        ident = header[1:].split()[0].decode("ascii") if header[1:].split() else ""
        yield Sequence(ident, seq)
        i += 4
