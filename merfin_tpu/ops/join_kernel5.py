"""Pallas sorted-join kernel, lane-rolled layout (v5).

v1 (`ops/join_kernel.py`) stores queries as a (QB, 1) column so the
all-pairs equality against a (1, 128) window chunk falls out of a
broadcast.  The price is the HBM-side layout: `u32[g, QB, 1]` tiles to
T(8, 128) with a 128x padding expansion — at batch 16 the XLA program
carries ~12 GB of padded HLO temps (forcing rematerialization), and
batch 32 exceeds a v5e's HBM outright.

v5 keeps queries COMPACT: `[g, QB // 128, 128]` tiles exactly (zero
padding).  The all-pairs compare is recovered with lane rotations
(`pltpu.roll`, the TPU's native circular lane shift): for each shift r
in [0, 128), roll the query tile by r, compare element-wise against the
window chunk rows (each covering lane-aligned pairs (q[l - r], w[l])),
and roll the per-shift contribution back.  Over all 128 shifts every
(query, window-entry) pair is compared exactly once — the same pair
count as v1's broadcast, issued as (8, 128) VPU ops instead of
(1024, 128) broadcasts, so the cycle count is equivalent while the
memory footprint drops ~100x and the batch can scale.

Same contract as v1: exact-match values (0 where absent, duplicates
summed) for a SORTED uint64 query array; table keys pad with u64::MAX
which can never equal a (2k)-bit canonical k-mer.
"""

from __future__ import annotations

import numpy as np

from merfin_tpu.ops.join_kernel import QB, SEG, LANES, SEG_ROWS, _interpret_mode

QBS = QB // LANES     # query sublane rows per block


def _kernel(win_row_ref, win_seg_ref, q_hi_ref, q_lo_ref,
            t_hi_ref, t_lo_ref, t_v_ref, out_ref,
            w_hi, w_lo, w_v, sem):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    row0 = win_row_ref[i]
    n_seg = win_seg_ref[i]

    q_hi = q_hi_ref[0]        # (QBS, LANES)
    q_lo = q_lo_ref[0]

    def seg_body(s, acc):
        r = row0 + s * SEG_ROWS
        z = np.int32(0)
        cp_hi = pltpu.make_async_copy(
            t_hi_ref.at[pl.ds(r, SEG_ROWS), :], w_hi, sem.at[z])
        cp_lo = pltpu.make_async_copy(
            t_lo_ref.at[pl.ds(r, SEG_ROWS), :], w_lo, sem.at[z + 1])
        cp_v = pltpu.make_async_copy(
            t_v_ref.at[pl.ds(r, SEG_ROWS), :], w_v, sem.at[z + 2])
        cp_hi.start()
        cp_lo.start()
        cp_v.start()
        cp_hi.wait()
        cp_lo.wait()
        cp_v.wait()

        def shift_body(_, carry):
            # rolled-frame carry: q AND acc ride the same lane frame, so
            # contributions add directly (no per-shift roll-back) and
            # every roll is a STATIC shift-by-1 (cheap lane rotate).
            # After LANES iterations the frame returns to identity.
            qh_r, ql_r, acc = carry
            contrib = jnp.zeros((QBS, LANES), dtype=jnp.int32)
            for c in range(SEG_ROWS):        # static unroll
                wh = w_hi[c: c + 1, :]       # (1, LANES)
                wl = w_lo[c: c + 1, :]
                wv = w_v[c: c + 1, :]
                eq = (qh_r == wh) & (ql_r == wl)
                contrib = contrib + jnp.where(eq, wv.astype(jnp.int32),
                                              jnp.int32(0))
            one = jnp.int32(1)   # x64 would promote a bare 1 to i64,
            # which tpu.dynamic_rotate rejects
            return (pltpu.roll(qh_r, one, axis=1),
                    pltpu.roll(ql_r, one, axis=1),
                    pltpu.roll(acc + contrib, one, axis=1))

        _, _, acc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(LANES), shift_body,
            (q_hi, q_lo, acc))
        return acc

    acc = jax.lax.fori_loop(
        jnp.int32(0), n_seg, seg_body,
        jnp.zeros((QBS, LANES), dtype=jnp.int32),
    )
    out_ref[0] = acc.astype(jnp.uint32)


class SortJoinTableV5:
    """Device table prepared for the lane-rolled sorted-join kernel.

    Table plane layout is identical to v1 (u32 hi/lo/value planes,
    [rows, 128], SEG-aligned padding with u64::MAX keys); only the
    query-side layout differs.
    """

    def __init__(self, keys: np.ndarray, vals: np.ndarray, k: int):
        from merfin_tpu.ops.join_kernel import SortJoinTable

        base = SortJoinTable(keys, vals, k)
        self.k = base.k
        self.n = base.n
        self.t_hi = base.t_hi
        self.t_lo = base.t_lo
        self.t_v = base.t_v
        self.keys_u64 = base.keys_u64
        self.pad = base.pad
        self.pad_rows = base.pad_rows

    def tree(self):
        return (self.t_hi, self.t_lo, self.t_v, self.keys_u64)

    def lookup_sorted(self, q):
        return self.lookup_sorted_with(self.tree(), q)

    def lookup_sorted_with(self, tree, q):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        t_hi, t_lo, t_v, keys_u64 = tree
        m = q.shape[0]
        assert m % QB == 0, "query length must be a multiple of QB"
        g = m // QB

        # block windows: identical to v1 (segment-aligned [lo, hi) table
        # ranges per sorted query block)
        bounds_q = jnp.concatenate([q[::QB], q[-1:]])
        pos = jnp.searchsorted(keys_u64, bounds_q)
        pos_hi = jnp.searchsorted(keys_u64, bounds_q[1:], side="right")
        win_lo = pos[:-1].astype(jnp.int32)
        win_hi = pos_hi.astype(jnp.int32)
        win_row = jnp.minimum((win_lo // SEG) * SEG_ROWS,
                              self.pad_rows - SEG_ROWS)
        win_seg = jnp.maximum(
            (win_hi - (win_row // SEG_ROWS) * SEG + SEG - 1) // SEG, 1
        ).astype(jnp.int32)
        win_seg = jnp.minimum(win_seg, (self.pad_rows - win_row) // SEG_ROWS)

        # compact tiling: [g, QBS, LANES] pads nothing (vs v1's
        # [g, QB, 1] which expands 128x under T(8, 128))
        q_hi = (q >> np.uint64(32)).astype(jnp.uint32).reshape(g, QBS, LANES)
        q_lo = (q & np.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(
            g, QBS, LANES)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((1, QBS, LANES),
                             lambda i, *_: (i, np.int32(0), np.int32(0))),
                pl.BlockSpec((1, QBS, LANES),
                             lambda i, *_: (i, np.int32(0), np.int32(0))),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, QBS, LANES),
                lambda i, *_: (i, np.int32(0), np.int32(0))),
            scratch_shapes=[
                pltpu.VMEM((SEG_ROWS, LANES), jnp.uint32),
                pltpu.VMEM((SEG_ROWS, LANES), jnp.uint32),
                pltpu.VMEM((SEG_ROWS, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        )

        out = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((g, QBS, LANES), jnp.uint32),
            grid_spec=grid_spec,
            interpret=_interpret_mode(),
        )(win_row, win_seg, q_hi, q_lo, t_hi, t_lo, t_v)
        return out.reshape(-1)
