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


# ---- selectors (varMer.C:150-467) ----
#
# Literal scalar transcriptions of the five selection policies, written
# from the C++ alone and operating on plain data (no merfin_tpu types):
#   seqs:     list[str]               (varMer::seqs)
#   num_ms:   list[int]               (varMer::numMs, uint32)
#   gt_paths: list[list[int]]         (varMer::gtPaths)
#   dkstrs:   list[list[float]]       (varMer::dkstrs)
#   gts:      list[(pos0, qual, alleles)]  (posGT::_gts: _pos, _qual, _alleles)
# These are the independent oracle for merfin_tpu/variants/select.py.

UINT32_MAX = 0xFFFFFFFF


def _all_missing_size_t(num_m: int, seq_len: int, k: int) -> bool:
    """numMs.at(ii) == seqs.at(ii).size() - merSize() + 1: the RHS is
    size_t arithmetic, so seq_len < k-1 wraps huge (varMer.C:158,408)."""
    return num_m == (seq_len - k + 1) % _U64


def ref_hom_record(chrom, gts, gt_path) -> str:
    """varMer::getHomRecord (varMer.C:531-550)."""
    records = ""
    for i in range(len(gt_path)):
        alt_idx = gt_path[i]
        if alt_idx > 0:
            pos, qual, alleles = gts[i]
            qual_str = str(int(qual))          # to_string((int)_qual)
            records = (records + chrom + "\t" + str(pos + 1) + "\t.\t" +
                       alleles[0] + "\t" + alleles[alt_idx] + "\t" +
                       qual_str + "\t" + "PASS\t.\tGT\t1/1\n")
    return records


def ref_het_record(chrom, gts, gt1, gt2) -> str:
    """varMer::getHetRecord (varMer.C:472-529)."""
    records = ""
    for i in range(len(gt1)):
        alt1, alt2 = gt1[i], gt2[i]
        if alt1 + alt2 > 0:
            pos, qual, alleles = gts[i]
            qual_str = str(int(qual))
            records = (records + chrom + "\t" + str(pos + 1) + "\t" +
                       "." + "\t" + alleles[0] + "\t")
            if alt1 == alt2:
                records += alleles[alt1] + "\t" + qual_str + "\tPASS\t.\tGT\t1/1\n"
            elif alt1 == 0 and alt2 > 0:
                records += alleles[alt2] + "\t" + qual_str + "\tPASS\t.\tGT\t0/1\n"
            elif alt1 > 0 and alt2 > 0:
                records += (alleles[alt1] + "," + alleles[alt2] + "\t" +
                            qual_str + "\tPASS\t.\tGT\t1/2\n")
            elif alt1 > 0 and alt2 == 0:
                records += alleles[alt1] + "\t" + qual_str + "\tPASS\t.\tGT\t1/0\n"
    return records


def ref_best_filter(seqs, num_ms, gt_paths, k) -> list[int]:
    """varMer::bestFilter (varMer.C:150-199).  Returns the indices of
    the ORIGINAL records to replay (the caller owns record objects)."""
    num_missing = UINT32_MAX
    idxs = []
    for ii in range(len(num_ms)):
        if _all_missing_size_t(num_ms[ii], len(seqs[ii]), k):
            continue
        if num_ms[ii] == 0:                    # the zero double-push block
            idxs.append(ii)                    # (varMer.C:161-163)
            num_missing = 0
        if num_ms[ii] < num_missing:
            num_missing = num_ms[ii]
            idxs = [ii]
        elif num_ms[ii] == num_missing:
            idxs.append(ii)
    if len(idxs) == 0:
        return []
    gt_idxs = []
    for ii in range(len(idxs)):
        idx = idxs[ii]
        for i in range(len(gt_paths[idx])):
            if gt_paths[idx][i] > 0:
                gt_idxs.append(i)
    gt_idxs.sort()                             # list::sort + unique
    out = []
    for v in gt_idxs:
        if not out or out[-1] != v:
            out.append(v)
    return out


def ref_totdk(dkstrs, idx) -> float:
    """varMer::getTotdK (varMer.C:648-659)."""
    s = 0.0
    for v in dkstrs[idx]:
        s += v
    return s


def _multimap_insert_greater_int(mm, key: float, val: int) -> None:
    """multimap<double,int,greater<int>>::insert (varMer.H:72): the
    comparator takes ints, so double keys truncate toward zero when
    compared; insert lands at upper_bound, i.e. AFTER existing
    int-equal keys (insertion order preserved among equals)."""
    pos = len(mm)
    for j in range(len(mm)):
        if int(key) > int(mm[j][0]):           # comp(new, elem)
            pos = j
            break
    mm.insert(pos, (key, val))


def ref_best_variant(seqs, num_ms, gt_paths, dkstrs, chrom, gts, k) -> str:
    """varMer::bestVariant — -polish (varMer.C:400-467).  PLAIN scan:
    no numM==0 block; empty test is numMissing == UINT32_MAX."""
    num_missing = UINT32_MAX
    idxs = []
    for ii in range(len(num_ms)):
        if _all_missing_size_t(num_ms[ii], len(seqs[ii]), k):
            continue
        if num_ms[ii] < num_missing:
            num_missing = num_ms[ii]
            idxs = [ii]
        elif num_ms[ii] == num_missing:
            idxs.append(ii)
    if num_missing == UINT32_MAX:
        return ""
    if len(idxs) == 1:
        return ref_hom_record(chrom, gts, gt_paths[idxs[0]])
    elif len(idxs) > 1:
        avg_ks = []
        for i in range(len(idxs)):
            idx = idxs[i]
            _multimap_insert_greater_int(avg_ks, ref_totdk(dkstrs, idx), idx)
        avg_k1, idx1 = avg_ks[0]
        avg_k2, idx2 = avg_ks[1]
        if avg_k1 == avg_k2:                   # DOUBLE compare (varMer.C:453)
            if len(seqs[idx1]) >= len(seqs[idx2]):
                return ref_het_record(chrom, gts, gt_paths[idx1], gt_paths[idx2])
            else:
                return ref_het_record(chrom, gts, gt_paths[idx2], gt_paths[idx1])
        else:
            return ref_hom_record(chrom, gts, gt_paths[idx1])
    return ""


def _better_strict_scan(num_ms) -> list[int]:
    """Shared loop of betterVariant/strictPolish (varMer.C:216-230,
    271-285): neutral (== refMissing) paths are EXCLUDED."""
    ref_missing = num_ms[0]
    num_missing = ref_missing
    idxs = []
    for ii in range(len(num_ms)):
        if num_ms[ii] < num_missing:
            num_missing = num_ms[ii]
            idxs = [ii]
        elif num_ms[ii] == num_missing and num_ms[ii] < ref_missing:
            idxs.append(ii)
    return idxs


def _longest_seq_pick(seqs, idxs) -> int:
    """Tie-break: longest sequence, strict > replaces (varMer.C:246-254)."""
    idx = idxs[0]
    seq_len_max = len(seqs[idx])
    for ii in range(1, len(idxs)):
        seq_len = len(seqs[idxs[ii]])
        if seq_len > seq_len_max:
            seq_len_max = seq_len
            idx = idxs[ii]
    return idx


def ref_better_variant(seqs, num_ms, gt_paths, chrom, gts) -> str:
    """varMer::betterVariant — -better (varMer.C:204-258)."""
    if len(num_ms) == 0:
        return ""
    idxs = _better_strict_scan(num_ms)
    if len(idxs) == 0:
        return ""
    if len(idxs) == 1:
        return ref_hom_record(chrom, gts, gt_paths[idxs[0]])
    return ref_hom_record(chrom, gts, gt_paths[_longest_seq_pick(seqs, idxs)])


def ref_strict_polish(seqs, num_ms, gt_paths, chrom, gts) -> str:
    """varMer::strictPolish — -strict (varMer.C:260-315): textually a
    separate function in the reference but the identical algorithm."""
    return ref_better_variant(seqs, num_ms, gt_paths, chrom, gts)


def ref_loose_polish(seqs, num_ms, gt_paths, chrom, gts,
                     first_record_save: str, log) -> str:
    """varMer::loosePolish — -loose (varMer.C:317-395): neutral
    (== refMissing) paths INCLUDED, so idxs[0] is the REF path when
    nothing beats it."""
    if len(num_ms) == 0:
        return ""
    ref_missing = num_ms[0]
    num_missing = ref_missing
    idxs = []
    for ii in range(len(num_ms)):
        if num_ms[ii] < num_missing:
            num_missing = num_ms[ii]
            idxs = [ii]
        elif num_ms[ii] == num_missing and num_ms[ii] <= ref_missing:
            idxs.append(ii)
    if len(idxs) == 0:
        return ""
    idx = idxs[0]
    if len(idxs) == 1:
        return ref_hom_record(chrom, gts, gt_paths[idx])
    if idxs[0] == 0 and len(idxs) == 2:        # REF + one tying ALT: silent
        return ref_hom_record(chrom, gts, gt_paths[idxs[1]])
    max_vars = 0
    max_idx = idx
    for ii in range(1, len(idxs)):
        count = 0
        idx = idxs[ii]
        for i in range(len(gt_paths[idx])):
            if gt_paths[idx][i] > 0:
                count += 1
        if count > max_vars:
            max_vars = count
            max_idx = idx
    log.write("[ WARNING ] :: Multiple (%d) alternate pathes detected in a "
              "path beginning with variant : %s" % (len(idxs), first_record_save))
    log.write("[ WARNING ] :: Max. %d ALT variants selected\n" % max_vars)
    return ref_hom_record(chrom, gts, gt_paths[max_idx])
