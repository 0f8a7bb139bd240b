"""Sorted-join lookup kernel v3 — packed segment records + double-buffered DMA.

SUPERSEDED: kept as measured lineage with tests, not on any hot path.
The engine dispatches v1 (small table/query ratios) or v4 (flat table
scaling) — see modes/engine.py kernel selection and docs/PERF.md.

Same join algorithm as v2 (fence narrowing + exact-f32 one-hot MXU row
pull, join_kernel2.py), restructured for DMA efficiency: each table
segment is ONE contiguous record

    [6 x SEG_ROWS key/value planes  |  2 fence rows]  = (386, 128) u32

so a segment costs a single DMA, and segments are double-buffered: the
copy for segment s+1 is in flight while segment s computes.  v2 measured
DMA-latency-bound (3 serialized copies + waits per segment); this is the
classic two-slot pipeline from the TPU playbook.
"""

from __future__ import annotations

import numpy as np

QB = 1024
LANES = 128
SEG_ROWS = 64
SEG = SEG_ROWS * LANES          # 8192 entries
REC_ROWS = 6 * SEG_ROWS + 2     # 386 rows: planes + fence_hi + fence_lo


def _kernel(win_seg0_ref, win_nseg_ref,
            q_hi_a_ref, q_hi_b_ref, q_lo_a_ref, q_lo_b_ref,
            q_fhi_ref, q_flo_ref,              # (1, QB, 1) int32 each
            rec_ref,                           # HBM [n_segs, REC_ROWS, LANES] u32
            out_ref,
            w_rec, sem):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    seg0 = win_seg0_ref[i]
    n_seg = win_nseg_ref[i]

    q_hi_a = q_hi_a_ref[0].astype(jnp.float32)   # (QB, 1)
    q_hi_b = q_hi_b_ref[0].astype(jnp.float32)
    q_lo_a = q_lo_a_ref[0].astype(jnp.float32)
    q_lo_b = q_lo_b_ref[0].astype(jnp.float32)
    q_fhi = q_fhi_ref[0]
    q_flo = q_flo_ref[0]

    def dma(slot, seg_idx):
        return pltpu.make_async_copy(
            rec_ref.at[pl.ds(seg0 + seg_idx, 1)],
            w_rec.at[pl.ds(slot, 1)],
            sem.at[slot],
        )

    dma(np.int32(0), jnp.int32(0)).start()

    def seg_body(s, acc):
        slot = jax.lax.rem(s, np.int32(2))
        next_slot = jax.lax.rem(s + np.int32(1), np.int32(2))

        @pl.when(s + np.int32(1) < n_seg)
        def _():
            dma(next_slot, s + np.int32(1)).start()

        dma(slot, s).wait()
        rec = w_rec[slot]                         # (REC_ROWS, LANES) u32

        fh = pltpu.bitcast(rec[6 * SEG_ROWS : 6 * SEG_ROWS + 1, :], jnp.int32)
        fl = pltpu.bitcast(rec[6 * SEG_ROWS + 1 : 6 * SEG_ROWS + 2, :], jnp.int32)
        le = (fh < q_fhi) | ((fh == q_fhi) & (fl <= q_flo))   # (QB, LANES)
        row_q = (jnp.sum(le.astype(jnp.int32), axis=1, keepdims=True,
                         dtype=jnp.int32) - np.int32(1))
        row_q = jnp.clip(row_q, np.int32(0), np.int32(SEG_ROWS - 1))

        iota = jax.lax.broadcasted_iota(jnp.int32, (QB, SEG_ROWS), 1)
        onehot = (iota == row_q).astype(jnp.float32)          # (QB, 64)

        def pull(p):
            plane = rec[p * SEG_ROWS : (p + 1) * SEG_ROWS, :]
            plane = plane.astype(jnp.int32).astype(jnp.float32)
            return jnp.dot(onehot, plane, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        c_hi_a = pull(0)
        c_hi_b = pull(1)
        c_lo_a = pull(2)
        c_lo_b = pull(3)
        c_v_a = pull(4)
        c_v_b = pull(5)

        eq = ((c_hi_a == q_hi_a) & (c_hi_b == q_hi_b)
              & (c_lo_a == q_lo_a) & (c_lo_b == q_lo_b))      # (QB, 128)
        v_int = (c_v_a.astype(jnp.int32) * np.int32(65536)
                 + c_v_b.astype(jnp.int32))
        val = jnp.where(eq, v_int, np.int32(0))
        return acc + jnp.sum(val, axis=1, keepdims=True, dtype=jnp.int32)

    acc = jax.lax.fori_loop(
        jnp.int32(0), n_seg, seg_body, jnp.zeros((QB, 1), dtype=jnp.int32),
    )
    out_ref[0] = acc.astype(jnp.uint32)


def _split16(x):
    return (x >> 16).astype(np.uint32), (x & 0xFFFF).astype(np.uint32)


class SortJoinTableV3:
    """Device table with packed per-segment records."""

    def __init__(self, keys: np.ndarray, vals: np.ndarray, k: int):
        import jax.numpy as jnp

        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        vals = np.ascontiguousarray(vals, dtype=np.uint32)
        self.k = int(k)
        self.n = int(keys.size)
        pad = ((self.n + SEG - 1) // SEG + 1) * SEG
        pad = max(2 * SEG, 1 << (pad - 1).bit_length())
        # pad-key hi stays positive in int32 (signed fence compares)
        hi = np.full(pad, 0x7FFFFFFF, np.uint32)
        lo = np.full(pad, 0xFFFFFFFF, np.uint32)
        v = np.zeros(pad, np.uint32)
        hi[: self.n] = (keys >> np.uint64(32)).astype(np.uint32)
        lo[: self.n] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        v[: self.n] = vals

        n_segs = pad // SEG
        hi_a, hi_b = _split16(hi)
        lo_a, lo_b = _split16(lo)
        v_a, v_b = _split16(v)

        rec = np.zeros((n_segs, REC_ROWS, LANES), np.uint32)
        for p, plane in enumerate((hi_a, hi_b, lo_a, lo_b, v_a, v_b)):
            rec[:, p * SEG_ROWS : (p + 1) * SEG_ROWS, :] = (
                plane.reshape(n_segs, SEG_ROWS, LANES))
        # fence rows: first key of each 128-row, int32-biased, lane-padded
        rows = pad // LANES
        f_hi = hi.reshape(rows, LANES)[:, 0].view(np.int32)
        f_lo = (lo.reshape(rows, LANES)[:, 0] ^ np.uint32(0x80000000)).view(np.int32)
        fh = np.full((n_segs, LANES), 0x7FFFFFFF, np.int32)
        fl = np.full((n_segs, LANES), 0x7FFFFFFF, np.int32)
        fh[:, :SEG_ROWS] = f_hi.reshape(n_segs, SEG_ROWS)
        fl[:, :SEG_ROWS] = f_lo.reshape(n_segs, SEG_ROWS)
        rec[:, 6 * SEG_ROWS, :] = fh.view(np.uint32)
        rec[:, 6 * SEG_ROWS + 1, :] = fl.view(np.uint32)

        self.rec = jnp.asarray(rec)
        self.keys_u64 = jnp.asarray(keys)
        self.pad = pad
        self.n_segs = n_segs

    def tree(self):
        return (self.rec, self.keys_u64)

    def lookup_sorted(self, q):
        return self.lookup_sorted_with(self.tree(), q)

    def lookup_sorted_with(self, tree, q):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        rec, keys_u64 = tree
        m = q.shape[0]
        assert m % QB == 0
        g = m // QB

        bounds_q = jnp.concatenate([q[::QB], q[-1:]])
        pos = jnp.searchsorted(keys_u64, bounds_q)
        pos_hi = jnp.searchsorted(keys_u64, bounds_q[1:], side="right")
        win_lo = pos[:-1].astype(jnp.int32)
        win_hi = pos_hi.astype(jnp.int32)
        seg0 = jnp.minimum(win_lo // SEG, self.n_segs - 1).astype(jnp.int32)
        nseg = jnp.maximum((win_hi - seg0 * SEG + SEG - 1) // SEG, 1)
        nseg = jnp.minimum(nseg, self.n_segs - seg0).astype(jnp.int32)

        qhi = (q >> np.uint64(32)).astype(jnp.uint32)
        qlo = (q & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        bias = jnp.uint32(0x80000000)
        to_i32 = lambda x: x.astype(jnp.int64).astype(jnp.int32)
        shape = (g, QB, 1)
        q_args = (
            to_i32(qhi >> 16).reshape(shape),
            to_i32(qhi & 0xFFFF).reshape(shape),
            to_i32(qlo >> 16).reshape(shape),
            to_i32(qlo & 0xFFFF).reshape(shape),
            to_i32(qhi).reshape(shape),
            jax.lax.bitcast_convert_type(qlo ^ bias, jnp.int32).reshape(shape),
        )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((1, QB, 1),
                             lambda i, *_: (i, np.int32(0), np.int32(0)))
                for _ in range(6)
            ] + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, QB, 1), lambda i, *_: (i, np.int32(0), np.int32(0))),
            scratch_shapes=[
                pltpu.VMEM((2, REC_ROWS, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        out = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((g, QB, 1), jnp.uint32),
            grid_spec=grid_spec,
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(seg0, nseg, *q_args, rec)
        return out.reshape(-1)


def _interpret() -> bool:
    import jax

    return jax.default_backend() == "cpu"
