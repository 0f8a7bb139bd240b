"""Independent naive oracle for merfin semantics.

A deliberately scalar, dict/string-based transcription of the reference
C++ (/root/reference/src/merfin), sharing NO code with merfin_tpu's
engine (string k-mers instead of bit-packed, Python loops instead of
arrays).  Tests compare merfin_tpu's outputs against this model on tiny
synthetic inputs.
"""

from __future__ import annotations

import math

_COMP = str.maketrans("ACGTacgt", "TGCATGCA")
_U32 = 1 << 32
_U64 = 1 << 64


def revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


def is_acgt(s: str) -> bool:
    return all(c in "ACGTacgt" for c in s)


def count_canonical(seqs: list[str], k: int) -> dict[str, int]:
    """meryl-count analog: canonical k-mer counts over sequences."""
    counts: dict[str, int] = {}
    for s in seqs:
        for i in range(len(s) - k + 1):
            w = s[i : i + k].upper()
            if not is_acgt(w):
                continue
            c = min(w, revcomp(w))
            counts[c] = counts.get(c, 0) + 1
    return counts


def lookup_value(db: dict[str, int], mer: str) -> int:
    """merylExactLookup::value — exact (non-canonicalizing) probe."""
    return db.get(mer, 0)


def lookup_oriented(db: dict[str, int], w: str) -> int:
    """value(fmer) + value(rmer) (merfin-globals.C:107-108)."""
    return lookup_value(db, w) + lookup_value(db, revcomp(w))


def get_k(seq_value: int, asm_value: int, peak: float,
          copy_k: list[int], copy_p: list[float]):
    """merfinGlobal::getK (merfin-globals.C:66-98)."""
    asm_k = float(asm_value)
    prob = 1.0
    if seq_value == 0:
        read_k = 0.0
    elif seq_value < peak:
        read_k = 1.0
    else:
        x = seq_value / peak if peak != 0 else math.inf
        # C round() for non-negative x; round(inf) == inf
        read_k = float(math.floor(x + 0.5)) if math.isfinite(x) else x
    if 0 < seq_value <= len(copy_k):
        read_k = float(copy_k[seq_value - 1])
        prob = copy_p[seq_value - 1]
    return read_k, asm_k, prob


def k_metric(read_k: float, asm_k: float) -> float:
    if read_k == 0:
        return 0.0
    if asm_k > read_k:
        return -(asm_k / read_k - 1)
    if asm_k < read_k:
        return (read_k / asm_k - 1) if asm_k != 0 else math.inf
    return 0.0


def histo_qv(kval: float, ktot: float, k: int) -> float:
    base = kval / ktot
    inner = 1.0 - (1.0 - base) ** (1.0 / k)
    if inner <= 0.0:
        return math.inf  # C log10(0) == -inf
    return -10.0 * math.log10(inner)


def hist_mode(seqs: list[tuple[str, str]], read_db, asm_db, k: int, peak: float,
              copy_k=(), copy_p=()):
    """processHistogram over all sequences (merfin-histogram.C:36-92).

    Returns (per_seq, undr, over, kasm, kmissing, kover_cpy)."""
    undr: dict[int, int] = {}
    over: dict[int, int] = {}
    g_kasm = g_missing = 0
    g_kover = 0.0
    per_seq = []
    for _, s in seqs:
        kasm = missing = 0
        kover = 0.0
        for i in range(len(s) - k + 1):
            w = s[i : i + k].upper()
            if not is_acgt(w):
                continue
            kasm += 1
            rv = lookup_oriented(read_db, w)
            av = lookup_oriented(asm_db, w)
            read_k, asm_k, prob = get_k(rv, av, peak, list(copy_k), list(copy_p))
            if read_k == 0:
                missing += 1
                continue
            if asm_k > read_k:
                idx = int((asm_k / read_k - 1 + 0.1) / 0.2)
                undr[idx] = undr.get(idx, 0) + 1
                kover += (1.0 - read_k / asm_k) * prob
            else:
                idx = int((read_k / asm_k - 1 + 0.1) / 0.2)
                over[idx] = over.get(idx, 0) + 1
        per_seq.append((kasm, missing, kover))
        g_kasm += kasm
        g_missing += missing
        g_kover += kover
    return per_seq, undr, over, g_kasm, g_missing, g_kover


def dump_mode(seqs, read_db, asm_db, k: int, peak: float, copy_k=(), copy_p=()):
    """processDump (merfin-dump.C:21-68): rows (ident,pos,readK,asmK,k*)."""
    rows = []
    for ident, s in seqs:
        for i in range(len(s) - k + 1):
            w = s[i : i + k].upper()
            if not is_acgt(w):
                continue
            rv = lookup_oriented(read_db, w)
            av = lookup_oriented(asm_db, w)
            read_k, asm_k, prob = get_k(rv, av, peak, list(copy_k), list(copy_p))
            km = k_metric(read_k, asm_k)
            if read_k != 0.0 or asm_k != 0.0 or km != 0.0:
                rows.append((ident, i, read_k, asm_k, km))
    return rows


def completeness_mode(read_db, asm_db, peak: float, copy_k=(), copy_p=()):
    """computeCompleteness (merfin-completeness.C:49-143)."""
    total = undrc = 0.0
    for mer, rv in read_db.items():
        av = asm_db.get(mer, 0)
        read_k, asm_k, _ = get_k(rv, av, peak, list(copy_k), list(copy_p))
        total += read_k
        if read_k > asm_k:
            undrc += read_k - asm_k
    return total, undrc, (1.0 - undrc / total if total else float("nan"))


# ---- variant scoring (varMer.C) ----

def traverse_paths(template: str, ref_idx: list[int], ref_len: list[int],
                   haps: list[list[str]]):
    """traverse() (merfin-variants.C:22-126) + addSeqPath dedup."""
    out: list[tuple[str, list[int], list[int], list[int]]] = []
    seen: set[str] = set()
    n = len(ref_idx)
    if n == 0:
        return out
    idxs = list(ref_idx)
    path: list[int] = []

    def add(seq, gt, ii, ll):
        if seq not in seen:
            seen.add(seq)
            out.append((seq, list(gt), list(ii), list(ll)))

    def rec(pos: int, lens: list[str], cand: str):
        lens = list(lens)
        orig = lens[pos]
        for j in range(len(haps[pos])):
            path.append(j)
            cur = pos
            replaced = cand
            skipped = 0
            overlaps = False
            delta = 0
            if j > 0:
                lens[pos] = orig
                a = idxs[pos]
                replaced = cand[:a] + haps[pos][j] + cand[a + lens[pos]:]
                delta = len(haps[pos][j]) - lens[pos]
                affected = idxs[pos] + lens[pos]
                lens[pos] = len(haps[pos][j])
                i = cur + 1
                while i < n and idxs[i] < affected:
                    overlaps = True
                    cur += 1
                    path.append(0)
                    skipped += 1
                    i += 1
                if overlaps and cur == n - 1:
                    add(replaced, path, idxs, lens)
                    for _ in range(skipped):
                        path.pop()
                    path.pop()
                    continue
                for i2 in range(cur + 1, n):
                    idxs[i2] += delta
            if cur + 1 < n:
                rec(cur + 1, lens, replaced)
            if cur == n - 1:
                add(replaced, path, idxs, lens)
            for i2 in range(cur + 1, n):
                idxs[i2] -= delta
            for _ in range(skipped):
                path.pop()
            path.pop()

    rec(0, ref_len, template)
    return out


def score_path(seq: str, gt_path, idx_path, len_path, k: int, read_db, asm_db,
               peak: float, copy_k=(), copy_p=(), filter_mode=False):
    """varMer::score for one path (varMer.C:66-144)."""
    num_m = 0
    kstr: list[float] = []
    dkstr: list[float] = []
    prob = 1.0  # stale-prob emulation (C++ leaves it from the previous kmer)
    for idx in range(len(seq) - k + 1):
        w = seq[idx : idx + k].upper()
        read_k = asm_k = 0.0
        if is_acgt(w):
            rv = lookup_oriented(read_db, w)
            av = lookup_oriented(asm_db, w)
            read_k, asm_k, prob = get_k(rv, av, peak, list(copy_k), list(copy_p))
        if read_k == 0:
            num_m += 1
        if filter_mode:
            continue
        o_delta = abs(read_k - asm_k) * prob
        for ip, lp, gp in zip(idx_path, len_path, gt_path):
            lo = (ip + 1 - k) % _U32  # uint32 arithmetic (varMer.C:108)
            if gp > 0 and lo <= idx < ip + lp + k:
                asm_k += 1
                break
        if read_k == 0:
            km = -1.0
        elif read_k > asm_k:
            km = (read_k / asm_k - 1) if asm_k != 0 else math.inf
        else:
            km = asm_k / read_k - 1
        n_delta = abs(read_k - asm_k) * prob
        kstr.append(km)
        dkstr.append(o_delta - n_delta)
    return num_m, kstr, dkstr
