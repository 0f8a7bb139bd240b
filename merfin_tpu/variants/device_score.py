"""Device-fused variant-path scoring (opt-in).

The default scorer runs table lookups on device and the per-kmer K*/
delta math on the host in exact f64 (variants/score.py) — selector
tie-breaks compare doubles, and accelerator f64 is emulated, so the
host path is the parity-safe default.  This module fuses the WHOLE
per-kmer pipeline — k-mer extraction, dual exact lookup, getK, the
new-kmer asmK+1 adjustment, |K*| and delta-multiplicity — into one
jitted dispatch over the packed path stream (varMer::score semantics,
varMer.C:76-135, as a flat array program).  Selectors stay on the host.

On CPU backends the results are bit-identical to the host scorer
(tested); on TPU the ratio math may differ in final ulps from host
doubles.  Enable with -devscore.
"""

from __future__ import annotations

import numpy as np

from merfin_tpu.config import ensure_x64
from merfin_tpu.ops.kmer_ops import kmer_windows, canonical_and_mult
from merfin_tpu.score.kstar import ProbTable
from merfin_tpu.score.value_map import ValueMap


class DeviceScorer:
    """Scores packed candidate-path streams in one device dispatch."""

    def __init__(self, read_lookup, asm_lookup, k: int, peak: float,
                 prob_table: ProbTable | None, max_value: int | None = None,
                 exact_max: bool = False):
        ensure_x64()
        import jax

        self.k = k
        self.read_lookup = read_lookup
        self.asm_lookup = asm_lookup
        self.value_map = ValueMap(peak, prob_table, max_value or (1 << 19),
                                  exact_max=exact_max)
        self.overflow_values = 0
        self._impl = jax.jit(self._score_stream, static_argnums=0)

    def _score_stream(self, n, r_tree, a_tree, vm, planes, vbits,
                      adj_bits, mark_bits):
        """Transfer-packed path stream -> (kstr [n], dkstr [n], overflow).

        planes/vbits: 2-bit codes + validity of the packed path stream
        (kcore.pack.pack_transfer_np of codes u8 [n + k - 1], paths
        separated by k-1 invalid bases); adj_bits: new-kmer adjustment
        bitmask [ceil(n/8)]; mark_bits: path-start marks — window i
        starts a path's region.  The flat path_start plane (int64,
        8B/window on the wire) is reconstructed as a device cummax over
        the marks; with the 2-bit codes this is ~16x fewer input bytes.
        Mirrors score._scores_batched exactly (tested on CPU).
        """
        import jax
        import jax.numpy as jnp

        from merfin_tpu.ops.kmer_ops import unpack_transfer

        codes = unpack_transfer(planes, vbits, n + self.k - 1)
        bsh = jnp.arange(8, dtype=jnp.uint8)
        adjust = ((adj_bits[:, None] >> bsh) & jnp.uint8(1)
                  ).reshape(-1)[:n].astype(bool)
        mk = ((mark_bits[:, None] >> bsh) & jnp.uint8(1)).reshape(-1)[:n]
        midx = jnp.arange(n, dtype=jnp.int64)
        # path_start[i] = index of the last mark at or before i; windows
        # in the tail padding (no further marks) inherit the last path's
        # start, but their outputs are sliced off by the caller
        path_start = jax.lax.cummax(jnp.where(mk == 1, midx, jnp.int64(-1)))

        fmer, rmer, valid = kmer_windows(codes, self.k)
        canon, mult = canonical_and_mult(fmer, rmer)
        read_v = self.read_lookup.lookup_with(r_tree, canon).astype(np.uint64) * mult
        asm_v = self.asm_lookup.lookup_with(a_tree, canon).astype(np.uint64) * mult
        read_k, prob, overflow = self.value_map.lookup_jnp(read_v, vm)
        asm_k = asm_v.astype(jnp.float64)
        read_k = jnp.where(valid, read_k, 0.0)
        asm_k = jnp.where(valid, asm_k, 0.0)

        # stale-prob forward fill, reset at path starts (the host
        # scorer's per-row fill, score.py:_scores_batched)
        n = read_k.shape[0]
        idx = jnp.arange(n, dtype=jnp.int64)
        vi = jnp.where(valid, idx, jnp.int64(-1))
        last = jax.lax.cummax(vi)
        prob_f = jnp.where(last >= path_start,
                           prob[jnp.clip(last, 0, None)], 1.0)

        o_delta = jnp.abs(read_k - asm_k) * prob_f
        asm_adj = asm_k + adjust.astype(jnp.float64)
        over = read_k / asm_adj - 1.0
        under = asm_adj / read_k - 1.0
        kstr = jnp.where(read_k == 0, -1.0,
                         jnp.where(read_k > asm_adj, over, under))
        n_delta = jnp.abs(read_k - asm_adj) * prob_f
        return kstr, o_delta - n_delta, overflow

    def score_stream(self, codes: np.ndarray, adjust: np.ndarray,
                     path_start: np.ndarray):
        """Numpy-in/numpy-out; pads to a power of two for shape reuse."""
        from merfin_tpu.kcore.pack import pack_transfer_np

        k = self.k
        n = max(0, codes.shape[0] - k + 1)
        if n == 0:
            return np.zeros(0), np.zeros(0)
        p = max(4096, 1 << (n - 1).bit_length())
        codes_p = np.full(p + k - 1, 4, dtype=np.uint8)
        codes_p[: codes.shape[0]] = codes
        planes, vbits = pack_transfer_np(codes_p)
        adj_p = np.zeros(p, dtype=bool)
        adj_p[:n] = adjust[:n]
        marks = np.zeros(p, dtype=bool)
        marks[:n] = path_start[:n] == np.arange(n, dtype=np.int64)
        kstr, dkstr, overflow = self._impl(
            p, self.read_lookup.tree(), self.asm_lookup.tree(),
            self.value_map.device_arrays(), planes, vbits,
            np.packbits(adj_p, bitorder="little"),
            np.packbits(marks, bitorder="little"))
        self.overflow_values += int(overflow)
        with np.errstate(all="ignore"):
            return (np.asarray(kstr)[:n], np.asarray(dkstr)[:n])
