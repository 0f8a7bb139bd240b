"""Ordered merge of per-process output shards.

Multi-host -dump/-variants stripe sequences across processes
(parallel/multihost.py); each process writes its rows to a part file with
a sequence-indexed extent table, and rank 0 merges the parts back into
the single ordered output the reference's in-order writer produces
(merfin.C:384).  Replaces the Slurm scripts' `bcftools concat` gather
(scripts/parallel1/consensus.sh:20-31) with an exact, offset-based merge
over the shared filesystem.
"""

from __future__ import annotations

import json
import os


class PartWriter:
    """One process's shard: appended bytes + per-sequence extents."""

    def __init__(self, out_name: str, pid: int):
        self.path = f"{out_name}.part{pid}"
        self._f = open(self.path, "wb")
        self.extents: list[list[int]] = []   # [seq_idx, start, end]

    def write_seq(self, seq_idx: int, data: bytes) -> None:
        start = self._f.tell()
        self._f.write(data)
        self.extents.append([seq_idx, start, self._f.tell()])

    def close(self) -> None:
        self._f.flush()
        self._f.close()
        with open(self.path + ".idx.json", "w") as f:
            json.dump(self.extents, f)


def merge_parts(out_name: str, nparts: int, header: bytes = b"") -> None:
    """Concatenate part files in ascending sequence order into out_name,
    then remove the parts.  Caller must barrier all writers first."""
    rows: list[tuple[int, int, int, int]] = []   # (seq_idx, part, start, end)
    for p in range(nparts):
        idx_path = f"{out_name}.part{p}.idx.json"
        with open(idx_path) as f:
            for seq_idx, start, end in json.load(f):
                rows.append((seq_idx, p, start, end))
    rows.sort()
    handles = [open(f"{out_name}.part{p}", "rb") for p in range(nparts)]
    try:
        with open(out_name, "wb") as out:
            out.write(header)
            for _, p, start, end in rows:
                handles[p].seek(start)
                remaining = end - start
                while remaining > 0:
                    chunk = handles[p].read(min(remaining, 1 << 24))
                    if not chunk:
                        raise IOError(f"short part file {out_name}.part{p}")
                    out.write(chunk)
                    remaining -= len(chunk)
    finally:
        for h in handles:
            h.close()
    for p in range(nparts):
        os.remove(f"{out_name}.part{p}")
        os.remove(f"{out_name}.part{p}.idx.json")
