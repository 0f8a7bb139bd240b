"""Multi-device K* engine — same driver interface as KstarEngine, but the
table lives sharded across the mesh ("t" axis) and chunk batches ride the
"d" axis.  run_hist() accepts either engine unchanged.
"""

from __future__ import annotations

import numpy as np

from merfin_tpu.config import ensure_x64
from merfin_tpu.modes.engine import NBINS, PAD_CODE, SeqStats
from merfin_tpu.parallel.multichip import make_hist_step
from merfin_tpu.parallel.sharded import ShardedLookup
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
    ):
        ensure_x64()
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.k = k
        self.peak = float(peak)
        self.chunk = chunk
        self.data = mesh.shape["d"]
        self.value_map = ValueMap(peak, prob_table, max_value or (1 << 19))
        self.overflow_values = 0
        self._step = make_hist_step(mesh, read_lookup, asm_lookup, k, self.value_map)
        self._sharding = NamedSharding(mesh, P("d", None))
        self._put = jax.device_put

    def hist_sequence(self, codes: np.ndarray):
        """Full -hist stats for one sequence's code array (mirrors
        KstarEngine.hist_sequence)."""
        stats = SeqStats()
        undr = np.zeros(NBINS, dtype=np.int64)
        over = np.zeros(NBINS, dtype=np.int64)
        if codes.shape[0] < self.k:
            return stats, undr, over

        C, k, B = self.chunk, self.k, self.data
        n_pos = codes.shape[0] - k + 1
        starts = list(range(0, n_pos, C))
        for gi in range(0, len(starts), B):
            batch = np.full((B, C + k - 1), PAD_CODE, dtype=np.uint8)
            for row, start in enumerate(starts[gi : gi + B]):
                piece = codes[start : start + C + k - 1]
                batch[row, : piece.shape[0]] = piece
            kasm, kmissing, kover, uh, oh = self._step(
                self._put(batch, self._sharding))
            stats.kasm += int(kasm)
            stats.kmissing += int(kmissing)
            stats.kover_cpy += float(kover)
            undr += np.asarray(uh)
            over += np.asarray(oh)
        return stats, undr, over
