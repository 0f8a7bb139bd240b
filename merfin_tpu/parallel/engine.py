"""Multi-device K* engine — same driver interface as KstarEngine, but the
table lives sharded across the mesh ("t" axis) and chunk batches ride the
"d" axis.  run_hist()/run_dump() accept either engine unchanged.

Correctness: identical results to the single-device engine including the
hostile edges — ValueMap overflow values take the counted device fallback
and out-of-table histogram bins are counted, with the same NBINS guard
(modes/engine.py:_hist_apply).
"""

from __future__ import annotations

import numpy as np

from merfin_tpu.config import ensure_x64
from merfin_tpu.modes.engine import (NBINS, PAD_CODE, SEG_MAX, BinOverflow,
                                     SeqStats, pack_group)
from merfin_tpu.parallel.multichip import (make_hist_step, make_dump_step,
                                           make_hist_group_step,
                                           zero_hist_state)
from merfin_tpu.parallel.sharded import (ShardedLookup, mesh_spans_hosts,
                                         put_global)
from merfin_tpu.score.kstar import ProbTable
from merfin_tpu.score.value_map import ValueMap


class ShardedKstarEngine:
    def __init__(
        self,
        mesh,
        read_lookup: ShardedLookup,
        asm_lookup: ShardedLookup,
        k: int,
        peak: float,
        prob_table: ProbTable | None = None,
        chunk: int = 1 << 19,
        max_value: int | None = None,
        pack_transfer: bool = True,
        exact_max: bool = False,
        asm_max_value: int | None = None,
    ):
        ensure_x64()
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.k = k
        self.peak = float(peak)
        self.chunk = chunk
        self.data = mesh.shape["d"]
        from merfin_tpu.score.bin_table import BinTable
        from merfin_tpu.score.kover import kover_vmaxp

        self.value_map = ValueMap(peak, prob_table, max_value or (1 << 19),
                                  exact_max=exact_max)
        self.bin_table = BinTable()
        self.prob_table = prob_table
        self.kover_vmaxp = kover_vmaxp(prob_table)
        self.asm_max_value = asm_max_value
        self.overflow_values = 0
        self.bin_fallbacks = 0
        self.kover_fallbacks = 0
        self._read_lookup = read_lookup
        self._asm_lookup = asm_lookup
        # transfer packing (kcore.pack.pack_transfer_np): 2-bit planes +
        # validity bits over the host->device link, unpacked per shard —
        # bit-exact, 2.7x fewer input bytes (10x with group seg planes)
        self.pack_transfer = bool(pack_transfer)
        self._pack_chunk = chunk if self.pack_transfer else None
        self.nbins = NBINS
        self._step = make_hist_step(mesh, read_lookup, asm_lookup, k,
                                    self.value_map,
                                    asm_max_value=asm_max_value,
                                    bin_table=self.bin_table,
                                    pack_chunk=self._pack_chunk,
                                    nbins=self.nbins,
                                    kover_vmaxp=self.kover_vmaxp)
        self._dump_step = None   # built on first dump_sequence call
        self._group_step = None  # built on first hist_group call
        # packed-group capacity: one batch = one chunk row per "d" shard
        self.group_capacity = self.data * self.chunk
        self._spec = P("d", None)
        self._sharding = NamedSharding(mesh, self._spec)
        # True when the mesh spans processes: the table is split across
        # hosts' HBM and every process drives the same sequences together
        # (run_hist/run_completeness skip striping + allgather merges)
        self.spans_hosts = mesh_spans_hosts(mesh)

    def grow_bins(self, min_bins: int) -> None:
        """Grow the k* bin count and rebuild the mesh hist programs
        (same contract as KstarEngine.grow_bins)."""
        self.nbins = max(self.nbins * 2, 1 << (min_bins - 1).bit_length())
        self._step = make_hist_step(self.mesh, self._read_lookup,
                                    self._asm_lookup, self.k,
                                    self.value_map,
                                    asm_max_value=self.asm_max_value,
                                    bin_table=self.bin_table,
                                    pack_chunk=self._pack_chunk,
                                    nbins=self.nbins,
                                    kover_vmaxp=self.kover_vmaxp)
        self._group_step = None   # rebuilt lazily with the new nbins

    def _put(self, batch, _sharding=None):
        return put_global(batch, self.mesh, self._spec)

    def _put_codes(self, batch):
        """Transfer one [B, C + k - 1] code batch, packed when enabled."""
        if not self.pack_transfer:
            return (self._put(batch),)
        from merfin_tpu.kcore.pack import pack_transfer_np

        planes, vbits = pack_transfer_np(batch)
        return (self._put(planes), self._put(vbits))

    def _batches_of(self, codes: np.ndarray):
        """Yield ([B, C + k - 1] batch, row starts) covering every window."""
        C, k, B = self.chunk, self.k, self.data
        n_pos = codes.shape[0] - k + 1
        starts = list(range(0, max(n_pos, 1), C))
        for gi in range(0, len(starts), B):
            batch = np.full((B, C + k - 1), PAD_CODE, dtype=np.uint8)
            group = starts[gi : gi + B]
            for row, start in enumerate(group):
                piece = codes[start : start + C + k - 1]
                batch[row, : piece.shape[0]] = piece
            yield batch, group

    def hist_sequence(self, codes: np.ndarray):
        """Full -hist stats for one sequence's code array (mirrors
        KstarEngine.hist_sequence): device-state accumulation, one host
        fetch per sequence so sharded steps pipeline."""
        stats = SeqStats()
        undr = np.zeros(self.nbins, dtype=np.int64)
        over = np.zeros(self.nbins, dtype=np.int64)
        if codes.shape[0] < self.k:
            return stats, undr, over

        from merfin_tpu.utils.prefetch import prefetch_iter

        def inputs():
            for batch, _ in self._batches_of(codes):
                yield self._put_codes(batch)

        state = zero_hist_state(self.nbins, self.bin_table.amax,
                                self.kover_vmaxp)
        # placement of batch i+1 overlaps batch i's mesh compute
        for inp in prefetch_iter(inputs(), depth=2):
            state = self._step(state, *inp)
        (kasm, kmissing, kover_fb, uh, oh, max_idx,
         overflow, fallbacks, kc, kn, kr, kfbc) = state
        if int(max_idx) >= self.nbins:
            raise BinOverflow(int(max_idx), self.nbins)
        # diagnostics counted only on success (grow-and-retry re-runs
        # the sequence; counting before the raise would double it)
        self.overflow_values += int(overflow)
        self.bin_fallbacks += int(fallbacks)
        stats.kasm = int(kasm)
        stats.kmissing = int(kmissing)
        stats.kover_cpy = self._finish_kover(kover_fb, kc, kn, kr, kfbc)
        undr += np.asarray(uh)
        over += np.asarray(oh)
        return stats, undr, over

    def hist_group_dispatch(self, seqs):
        """Dispatch one packed-group -hist step over the mesh (async);
        modes/hist.py keeps 2 in flight.  Same contract as
        KstarEngine.hist_group_dispatch."""
        if self._group_step is None:
            self._group_step = make_hist_group_step(
                self.mesh, self._read_lookup, self._asm_lookup,
                self.k, self.value_map,
                asm_max_value=self.asm_max_value,
                bin_table=self.bin_table,
                pack_chunk=self._pack_chunk, nbins=self.nbins,
                kover_vmaxp=self.kover_vmaxp)
        if self.pack_transfer:
            from jax.sharding import PartitionSpec as P
            from merfin_tpu.modes.engine import pack_group_transfer

            planes, vbits, marks, base, _ = pack_group_transfer(
                seqs, self.k, self.chunk, self.data, self.group_capacity)
            inputs = (self._put(planes), self._put(vbits),
                      self._put(marks), put_global(base, self.mesh, P("d")))
        else:
            codes_b, seg_b, _ = pack_group(seqs, self.k, self.chunk,
                                           self.data, self.group_capacity)
            inputs = (self._put(codes_b), self._put(seg_b))
        # dispatch-time nbins rides the handle (see KstarEngine.
        # hist_group_dispatch: grow_bins may run while 2 are in flight)
        return len(seqs), self.nbins, self._group_step(*inputs)

    def _finish_kover(self, kover_fb, kc, kn, kr, kfbc) -> float:
        from merfin_tpu.score.kover import finish_kover

        self.kover_fallbacks += int(kfbc)
        return finish_kover(np.asarray(kc), np.asarray(kn), np.asarray(kr),
                            float(kover_fb), self.prob_table,
                            self.kover_vmaxp, self.bin_table.amax)

    def hist_group_finalize(self, handle):
        """Fetch one hist_group_dispatch's results."""
        n_seq, nbins_d, (kasm_seg, kmis_seg, kover_fb, uh, oh, max_idx,
                         overflow, fallbacks, kc, kn, kr, kfbc) = handle
        if int(max_idx) >= nbins_d:
            raise BinOverflow(int(max_idx), nbins_d)
        self.overflow_values += int(overflow)
        self.bin_fallbacks += int(fallbacks)
        kover = self._finish_kover(kover_fb, kc, kn, kr, kfbc)
        kasm_seg = np.asarray(kasm_seg)
        kmis_seg = np.asarray(kmis_seg)
        stats = [SeqStats(kasm=int(kasm_seg[i]), kmissing=int(kmis_seg[i]))
                 for i in range(n_seq)]
        return stats, np.asarray(uh), np.asarray(oh), kover

    def hist_group(self, seqs):
        """-hist for a PACKED group of small sequences over the mesh —
        same contract as KstarEngine.hist_group (run_hist's fragmented-
        assembly packing works identically on the sharded engine)."""
        return self.hist_group_finalize(self.hist_group_dispatch(seqs))

    @staticmethod
    def _local_rows(arr):
        """Rows of a P(\"d\", ...) array OWNED by this process:
        {row_index: np row}.

        The \"t\" axis replicates every d-row across t devices, which may
        live on different processes (e.g. a 1xT mesh over two hosts) —
        only the replica-0 holder owns a row, so each row is emitted by
        exactly one process globally (no duplicated output chunks)."""
        rows = {}
        for sh in arr.addressable_shards:
            if sh.replica_id != 0:
                continue
            idx = sh.index[0] if isinstance(sh.index, tuple) else sh.index
            r0 = idx.start or 0
            data = np.asarray(sh.data)
            for j in range(data.shape[0]):
                rows[r0 + j] = data[j]
        return rows

    def dump_sequence_local(self, codes: np.ndarray):
        """Host-spanning-mesh -dump: yield
        (chunk_ordinal, start, readK, asmK, kmetric, kasm, kmissing)
        for the chunks THIS process's devices computed (each host holds
        its \"d\"-rows; the caller routes rows to part files and merges
        by ordinal).  Every process must iterate the same sequences."""
        from merfin_tpu.score.kstar import k_metric_np

        if codes.shape[0] < self.k:
            return
        if self._dump_step is None:
            self._dump_step = make_dump_step(
                self.mesh, self._read_lookup, self._asm_lookup,
                self.k, self.value_map, pack_chunk=self._pack_chunk)
        n_pos = codes.shape[0] - self.k + 1
        ordinal = 0
        for batch, group in self._batches_of(codes):
            rk, ak, kasm, kmis, overflow = self._dump_step(
                *self._put_codes(batch))
            self.overflow_values += int(overflow)
            rk_rows = self._local_rows(rk)
            ak_rows = self._local_rows(ak)
            kasm_rows = self._local_rows(kasm)
            kmis_rows = self._local_rows(kmis)
            for row, start in enumerate(group):
                if row in rk_rows:
                    n = min(self.chunk, n_pos - start)
                    r = rk_rows[row][:n].astype(np.float64, copy=False)
                    a = ak_rows[row][:n].astype(np.float64, copy=False)
                    yield (ordinal + row, start, r, a, k_metric_np(r, a),
                           int(kasm_rows[row]), int(kmis_rows[row]))
            ordinal += len(group)

    def dump_sequence(self, codes: np.ndarray):
        """Yield (start, readK, asmK, kmetric, kasm, kmissing) per chunk —
        same contract as KstarEngine.dump_sequence, in input order."""
        if codes.shape[0] < self.k:
            return
        if self._dump_step is None:
            self._dump_step = make_dump_step(
                self.mesh, self._read_lookup, self._asm_lookup,
                self.k, self.value_map, pack_chunk=self._pack_chunk)
        from merfin_tpu.score.kstar import k_metric_np

        n_pos = codes.shape[0] - self.k + 1
        for batch, group in self._batches_of(codes):
            rk, ak, kasm, kmis, overflow = self._dump_step(
                *self._put_codes(batch))
            self.overflow_values += int(overflow)
            rk, ak = np.asarray(rk), np.asarray(ak)
            kasm, kmis = np.asarray(kasm), np.asarray(kmis)
            for row, start in enumerate(group):
                n = min(self.chunk, n_pos - start)
                r = rk[row, :n].astype(np.float64, copy=False)
                a = ak[row, :n].astype(np.float64, copy=False)
                yield (start, r, a, k_metric_np(r, a),
                       int(kasm[row]), int(kmis[row]))
