"""Candidate-path k-mer scoring — varMer::score semantics (varMer.C:49-145).

For every candidate window sequence, walk its k-mers and compute:
  * numM   — count of k-mer positions with readK == 0 (invalid windows,
             i.e. windows containing non-ACGT bases, count as missing:
             readK stays 0 at varMer.C:78-90),
  * kstr   — per-kmer |K*| with -1 for missing (varMer.C:115-124),
  * dkstr  — per-kmer delta multiplicity oDeltak - nDeltak, where each
             delta is |readK - asmK| * prob, and nDeltak uses asmK
             incremented by 1 for k-mers spanning an applied ALT
             (the "new kmer" adjustment, varMer.C:98-132).

The ALT-span test reproduces the reference's uint32 arithmetic: the lower
bound `idxPath + 1 - merSize <= idx` underflows when idxPath + 1 < k,
making the condition false for that variant (varMer.C:108).

Lookups are batched: the pipeline concatenates the canonical-mer queries
of MANY candidate paths (across clusters) into one array, dispatches the
read/asm table lookups once, and scores each path from value slices —
that is the whole point of the TPU design (one big gather instead of a
pointer chase per k-mer).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from merfin_tpu.kcore.pack import encode_bases, kmers_from_codes_np
from merfin_tpu.score.kstar import ProbTable, get_k_np
from merfin_tpu.variants.enumerate import VarPath


@dataclasses.dataclass
class PathScore:
    num_m: int
    kstr: np.ndarray     # float64 [num_kmer_positions]; empty in filter mode
    dkstr: np.ndarray    # float64 [num_kmer_positions]; empty in filter mode


def path_kmer_query(seq: str, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(canonical_mers, palindrome_mult, valid) for one candidate window."""
    codes = encode_bases(seq)
    fmer, rmer, valid = kmers_from_codes_np(codes, k)
    canon = np.minimum(fmer, rmer)
    mult = np.where(fmer == rmer, 2, 1).astype(np.uint64)
    return canon, mult, valid


def score_path_from_values(
    path: VarPath,
    k: int,
    read_v: np.ndarray,
    asm_v: np.ndarray,
    valid: np.ndarray,
    peak: float,
    prob_table: ProbTable | None,
    filter_mode: bool,
) -> PathScore:
    """Score one path given raw summed fmer+rmer DB values per k-mer."""
    n = read_v.shape[0]
    if n == 0:
        return PathScore(0, np.zeros(0), np.zeros(0))

    read_v = np.where(valid, read_v, 0)
    asm_v = np.where(valid, asm_v, 0)
    read_k, asm_k, prob = get_k_np(read_v, asm_v, peak, prob_table)
    read_k = np.where(valid, read_k, 0.0)
    asm_k = np.where(valid, asm_k, 0.0)

    num_m = int(np.count_nonzero(read_k == 0))
    if filter_mode:
        return PathScore(num_m, np.zeros(0), np.zeros(0))

    # The reference's `prob` local is only written by getK on VALID kmers
    # (varMer.C:60,84); invalid positions see the previous valid kmer's
    # prob (uninitialized before the first valid one — we use 1.0 there).
    if not bool(valid.all()):
        vi = np.where(valid, np.arange(n), -1)
        last = np.maximum.accumulate(vi)
        prob = np.where(last >= 0, prob[np.clip(last, 0, None)], 1.0)

    o_delta = np.abs(read_k - asm_k) * prob

    # new-kmer adjustment: +1 to asmK for kmers overlapping an applied ALT
    idx = np.arange(n, dtype=np.int64)
    adjust = np.zeros(n, dtype=bool)
    for idx_path, len_path, gt_path in zip(path.idx_path, path.len_path, path.gt_path):
        if gt_path <= 0:
            continue
        if idx_path + 1 < k:     # uint32 underflow -> condition false
            continue
        lo = idx_path + 1 - k
        hi = idx_path + len_path + k
        adjust |= (idx >= lo) & (idx < hi)
    asm_k = asm_k + adjust.astype(np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        over = read_k / asm_k - 1.0
        under = asm_k / read_k - 1.0
    kstr = np.where(read_k == 0, -1.0, np.where(read_k > asm_k, over, under))
    n_delta = np.abs(read_k - asm_k) * prob
    return PathScore(num_m, kstr, o_delta - n_delta)


def _scores_batched(
    paths: list[VarPath],
    k: int,
    read_v_parts: list[np.ndarray],
    asm_v_parts: list[np.ndarray],
    valid_parts: list[np.ndarray],
    peak: float,
    prob_table: ProbTable | None,
    filter_mode: bool,
    threads: int = 1,
) -> list[PathScore]:
    """Vectorized-across-paths scoring: one padded [P, Lmax] pass instead
    of a numpy call-chain per path (the host hot loop at HG002 scale).
    Semantics identical to score_path_from_values (tested against it).

    ``threads`` > 1 splits the rows into contiguous blocks computed by a
    thread pool — every row is independent and the [P, L] numpy kernels
    release the GIL, so this scales on real cores with zero pickling.
    """
    P = len(paths)
    if threads > 1 and P >= 4 * threads:
        from concurrent.futures import ThreadPoolExecutor

        bounds = [P * t // threads for t in range(threads + 1)]
        with ThreadPoolExecutor(threads) as ex:
            futs = [
                ex.submit(_scores_batched, paths[a:b], k,
                          read_v_parts[a:b], asm_v_parts[a:b],
                          valid_parts[a:b], peak, prob_table, filter_mode)
                for a, b in zip(bounds, bounds[1:]) if b > a
            ]
            out: list[PathScore] = []
            for f in futs:
                out.extend(f.result())
        return out
    lens = np.asarray([v.shape[0] for v in read_v_parts], dtype=np.int64)
    lmax = int(lens.max()) if P else 0
    if lmax == 0:
        return [PathScore(0, np.zeros(0), np.zeros(0)) for _ in paths]

    read_v = np.zeros((P, lmax), np.uint64)
    asm_v = np.zeros((P, lmax), np.uint64)
    valid = np.zeros((P, lmax), bool)
    inside = np.arange(lmax)[None, :] < lens[:, None]
    for i in range(P):
        n = lens[i]
        read_v[i, :n] = np.where(valid_parts[i], read_v_parts[i], 0)
        asm_v[i, :n] = np.where(valid_parts[i], asm_v_parts[i], 0)
        valid[i, :n] = valid_parts[i]

    read_k, asm_k, prob = get_k_np(read_v, asm_v, peak, prob_table)
    read_k = np.where(valid, read_k, 0.0)
    asm_k = np.where(valid, asm_k, 0.0)
    num_m = np.count_nonzero((read_k == 0) & inside, axis=1)

    if filter_mode:
        return [PathScore(int(num_m[i]), np.zeros(0), np.zeros(0))
                for i in range(P)]

    # stale-prob forward fill (see score_path_from_values)
    vi = np.where(valid, np.arange(lmax)[None, :], -1)
    last = np.maximum.accumulate(vi, axis=1)
    rows = np.arange(P)[:, None]
    prob = np.where(last >= 0,
                    prob[rows, np.clip(last, 0, None)], 1.0)

    o_delta = np.abs(read_k - asm_k) * prob

    idx = np.arange(lmax, dtype=np.int64)[None, :]
    adjust = np.zeros((P, lmax), bool)
    for i, p in enumerate(paths):
        for idx_path, len_path, gt_path in zip(p.idx_path, p.len_path, p.gt_path):
            if gt_path <= 0 or idx_path + 1 < k:   # uint32 underflow quirk
                continue
            adjust[i] |= ((idx[0] >= idx_path + 1 - k)
                          & (idx[0] < idx_path + len_path + k))
    asm_k = asm_k + adjust

    with np.errstate(divide="ignore", invalid="ignore"):
        over = read_k / asm_k - 1.0
        under = asm_k / read_k - 1.0
    kstr = np.where(read_k == 0, -1.0, np.where(read_k > asm_k, over, under))
    n_delta = np.abs(read_k - asm_k) * prob
    dkstr = o_delta - n_delta

    return [PathScore(int(num_m[i]), kstr[i, : lens[i]], dkstr[i, : lens[i]])
            for i in range(P)]


def score_path_groups(
    groups: list[list[VarPath]],
    k: int,
    lookup_read,
    lookup_asm,
    peak: float,
    prob_table: ProbTable | None,
    filter_mode: bool = False,
    threads: int = 1,
    scorer=None,
) -> list[list[PathScore]]:
    """Score paths of many clusters with ONE batched lookup dispatch.

    lookup_* map a uint64 canonical-mer numpy array -> uint64 value array
    (0 for absent); they may run on device (DeviceLookup) or host.
    ``threads`` parallelizes the post-lookup scoring math across cores.
    ``scorer`` (a variants.device_score.DeviceScorer) replaces the whole
    lookup + host-math pipeline with one fused device dispatch.
    """
    # Pack every path's bases into ONE code stream with k-1 separators and
    # extract all k-mers in a single vectorized pass (a per-path
    # kmers_from_codes_np call costs ~100us of numpy overhead; at millions
    # of candidate paths that dominated the host side).
    all_paths: list[VarPath] = [p for paths in groups for p in paths]
    sep = np.full(k - 1, 4, np.uint8)
    pieces: list[np.ndarray] = []
    starts = np.zeros(len(all_paths) + 1, dtype=np.int64)
    pos = 0
    for i, p in enumerate(all_paths):
        codes = encode_bases(p.seq)
        pieces.append(codes)
        pieces.append(sep)
        starts[i] = pos
        pos += codes.shape[0] + (k - 1)
    starts[len(all_paths)] = pos

    if scorer is not None:
        flat_scores = _score_with_device(all_paths, starts, pieces, k,
                                         filter_mode, scorer)
        out: list[list[PathScore]] = []
        qi = 0
        for paths in groups:
            out.append(flat_scores[qi: qi + len(paths)])
            qi += len(paths)
        return out

    if all_paths:
        stream = np.concatenate(pieces)
        fmer, rmer, s_valid = kmers_from_codes_np(stream, k)
        canon = np.minimum(fmer, rmer)
        mult_all = np.where(fmer == rmer, 2, 1).astype(np.uint64)
        # Candidate paths overlap heavily (REF/ALT rewrites of the same
        # window share every k-mer away from the edit), so dedup the
        # query stream before the device dispatch: the table probes and
        # the host->device transfer shrink by the redundancy factor
        # (2-10x typical; 2^n-path multiallelic clusters much more).
        if canon.size > 4096:
            uq, inv = np.unique(canon, return_inverse=True)
            read_all = np.asarray(
                lookup_read(uq), dtype=np.uint64)[inv] * mult_all
            asm_all = np.asarray(
                lookup_asm(uq), dtype=np.uint64)[inv] * mult_all
        else:
            read_all = np.asarray(
                lookup_read(canon), dtype=np.uint64) * mult_all
            asm_all = np.asarray(
                lookup_asm(canon), dtype=np.uint64) * mult_all
    else:
        read_all = asm_all = np.zeros(0, np.uint64)
        s_valid = np.zeros(0, bool)

    read_parts, asm_parts, valid_parts = [], [], []
    for i, p in enumerate(all_paths):
        n = max(0, len(p.seq) - k + 1)
        a = starts[i]
        read_parts.append(read_all[a : a + n])
        asm_parts.append(asm_all[a : a + n])
        valid_parts.append(s_valid[a : a + n])

    flat_scores = _scores_batched(
        all_paths, k, read_parts, asm_parts, valid_parts,
        peak, prob_table, filter_mode, threads=threads)

    out: list[list[PathScore]] = []
    qi = 0
    for paths in groups:
        out.append(flat_scores[qi : qi + len(paths)])
        qi += len(paths)
    return out


def _score_with_device(all_paths, starts, pieces, k, filter_mode, scorer):
    """Fused device scoring: build the flat adjust/path-start planes and
    slice per-path results back out (see variants/device_score.py)."""
    if not all_paths:
        return []
    stream = np.concatenate(pieces)
    n_win = max(0, stream.shape[0] - k + 1)
    adjust = np.zeros(n_win, dtype=bool)
    path_start = np.zeros(n_win, dtype=np.int64)
    for i, p in enumerate(all_paths):
        a = int(starts[i])
        ni = max(0, len(p.seq) - k + 1)
        path_start[a: int(starts[i + 1])] = a
        for idx_path, len_path, gt_path in zip(p.idx_path, p.len_path,
                                               p.gt_path):
            if gt_path <= 0 or idx_path + 1 < k:   # uint32 underflow quirk
                continue
            lo = max(0, idx_path + 1 - k)
            hi = min(ni, idx_path + len_path + k)
            if lo < hi:
                adjust[a + lo: a + hi] = True

    kstr_f, dkstr_f = scorer.score_stream(stream, adjust, path_start)
    empty = np.zeros(0)
    out = []
    for i, p in enumerate(all_paths):
        a = int(starts[i])
        ni = max(0, len(p.seq) - k + 1)
        ks = kstr_f[a: a + ni]
        num_m = int(np.count_nonzero(ks == -1.0))
        if filter_mode:
            out.append(PathScore(num_m, empty, empty))
        else:
            out.append(PathScore(num_m, ks, dkstr_f[a: a + ni]))
    return out


def score_paths_np(
    paths: list[VarPath],
    k: int,
    lookup_read,
    lookup_asm,
    peak: float,
    prob_table: ProbTable | None,
    filter_mode: bool = False,
) -> list[PathScore]:
    """Single-cluster convenience wrapper."""
    return score_path_groups([paths], k, lookup_read, lookup_asm, peak,
                             prob_table, filter_mode)[0]
