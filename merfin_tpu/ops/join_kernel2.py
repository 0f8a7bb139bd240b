"""Sorted-join lookup kernel v2 — hierarchical fence narrowing.

SUPERSEDED: kept as measured lineage with tests, not on any hot path.
The engine dispatches v1 (small table/query ratios) or v4 (flat table
scaling) — see modes/engine.py kernel selection and docs/PERF.md.

v1 (join_kernel.py) compares every query in a block against the block's
entire table window: cost QB x window.  v2 adds a narrowing level:

  per 8192-entry segment (64 rows x 128 lanes):
    1. fence keys = first key of each row (64 per segment, precomputed);
    2. each query's candidate row r_q = #(fence <= q) - 1 — a (QB,64)
       broadcast compare + row-sum;
    3. a one-hot (QB,64) @ (64,128) MXU contraction pulls each query's
       candidate row into (QB,128) — keys ride as four exact-in-f32
       16-bit planes, values as two;
    4. one (QB,128) equality + masked sum finishes the join.

  cost per segment: ~6 small matmuls + O(QB x 128) vector ops,
  independent of segment size — a 16x cut vs v1 at SEG=2048 and far
  better on large-table dispatches.

Same contract as v1: exact-match values for SORTED queries.
"""

from __future__ import annotations

import numpy as np

QB = 1024
LANES = 128
SEG_ROWS = 64                 # rows per segment
SEG = SEG_ROWS * LANES        # 8192 entries per segment


def _split16(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """u32 -> (hi16, lo16) as u32 arrays (values < 2^16, exact in f32)."""
    return (x >> 16).astype(np.uint32), (x & 0xFFFF).astype(np.uint32)


def _kernel(win_seg0_ref, win_nseg_ref,
            q_hi_a_ref, q_hi_b_ref, q_lo_a_ref, q_lo_b_ref,
            q_fhi_ref, q_flo_ref,              # (1, QB, 1) int32 each
            t_planes_ref,                      # HBM [6, rows, LANES] u32
            f_hi_ref, f_lo_ref,                # HBM [n_segs, LANES] i32
            out_ref,
            w_planes, w_f_hi, w_f_lo, sem):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    seg0 = win_seg0_ref[i]
    n_seg = win_nseg_ref[i]

    q_hi_a = q_hi_a_ref[0].astype(jnp.float32)   # (QB, 1) key hi16
    q_hi_b = q_hi_b_ref[0].astype(jnp.float32)
    q_lo_a = q_lo_a_ref[0].astype(jnp.float32)
    q_lo_b = q_lo_b_ref[0].astype(jnp.float32)
    # fence-compare pieces: hi fits i32 (keys <= 62 bits); lo is biased by
    # 2^31 at build so signed compare preserves unsigned order
    q_fhi = q_fhi_ref[0]
    q_flo = q_flo_ref[0]

    zero = np.int32(0)

    def seg_body(s, acc):
        # all literals as np.int32: x64 mode promotes bare python ints
        # to i64, which Mosaic rejects
        seg = seg0 + s
        row0 = seg * np.int32(SEG_ROWS)
        cp_t = pltpu.make_async_copy(
            t_planes_ref.at[:, pl.ds(row0, SEG_ROWS), :], w_planes, sem.at[zero])
        cp_fh = pltpu.make_async_copy(
            f_hi_ref.at[pl.ds(seg, 1)], w_f_hi, sem.at[zero + 1])
        cp_fl = pltpu.make_async_copy(
            f_lo_ref.at[pl.ds(seg, 1)], w_f_lo, sem.at[zero + 2])
        cp_t.start()
        cp_fh.start()
        cp_fl.start()
        cp_t.wait()
        cp_fh.wait()
        cp_fl.wait()

        # 1-2: candidate row per query via 64-bit fence compare
        # (fences lane-padded to 128 with int32-max: never counted)
        fh = w_f_hi[0:1, :]                    # (1, LANES) i32
        fl = w_f_lo[0:1, :]
        le = (fh < q_fhi) | ((fh == q_fhi) & (fl <= q_flo))   # (QB, SEG_ROWS)
        row_q = (jnp.sum(le.astype(jnp.int32), axis=1, keepdims=True,
                         dtype=jnp.int32)          # x64 would promote to i64
                 - np.int32(1))
        row_q = jnp.clip(row_q, np.int32(0), np.int32(SEG_ROWS - 1))

        # 3: one-hot contraction pulls each query's row
        iota = jax.lax.broadcasted_iota(jnp.int32, (QB, SEG_ROWS), 1)
        onehot = (iota == row_q).astype(jnp.float32)          # (QB, 64)

        def pull(plane_idx):
            # u32 -> f32 is unsupported in Mosaic; go through i32 (values
            # are 16-bit, exact either way)
            plane = w_planes[plane_idx].astype(jnp.int32).astype(jnp.float32)
            # HIGHEST: exact f32 MXU path — the default bf16 decomposition
            # drops bits of 16-bit plane values (verified on v5e)
            return jnp.dot(onehot, plane, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        c_hi_a = pull(0)
        c_hi_b = pull(1)
        c_lo_a = pull(2)
        c_lo_b = pull(3)
        c_v_a = pull(4)
        c_v_b = pull(5)

        # 4: equality across the candidate row; value reconstructed in
        # int32 (16-bit pieces are exact in f32, full u32 would not be)
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


class SortJoinTableV2:
    """Device table prepared for the v2 hierarchical join kernel."""

    def __init__(self, keys: np.ndarray, vals: np.ndarray, k: int):
        import jax.numpy as jnp

        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        vals = np.ascontiguousarray(vals, dtype=np.uint32)
        self.k = int(k)
        self.n = int(keys.size)
        pad = ((self.n + SEG - 1) // SEG + 1) * SEG
        pad = max(2 * SEG, 1 << (pad - 1).bit_length())
        # pad-key hi word must stay positive in int32 (fence compares are
        # signed); real keys have hi < 2^30, queries' sentinel (u64::MAX)
        # can never equal the pad key either way
        hi = np.full(pad, 0x7FFFFFFF, np.uint32)
        lo = np.full(pad, 0xFFFFFFFF, np.uint32)
        v = np.zeros(pad, np.uint32)
        hi[: self.n] = (keys >> np.uint64(32)).astype(np.uint32)
        lo[: self.n] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        v[: self.n] = vals

        hi_a, hi_b = _split16(hi)
        lo_a, lo_b = _split16(lo)
        v_a, v_b = _split16(v)
        # plane-major [6, rows, LANES]: minor dims tile as (rows, 128)
        planes = np.stack([hi_a, hi_b, lo_a, lo_b, v_a, v_b], axis=0)
        self.t_planes = jnp.asarray(planes.reshape(6, -1, LANES))

        rows = pad // LANES
        f_hi = hi.reshape(rows, LANES)[:, 0]
        f_lo = lo.reshape(rows, LANES)[:, 0]
        # hi < 2^31 always (k <= 31 keys); lo biased for signed compare.
        # Lane-pad each segment's 64 fences to 128 (Mosaic slices must be
        # 128-aligned); pad fences are +max so they never count in `le`.
        n_segs = rows // SEG_ROWS
        fh = np.full((n_segs, LANES), 0x7FFFFFFF, np.int32)
        fl = np.full((n_segs, LANES), 0x7FFFFFFF, np.int32)
        fh[:, :SEG_ROWS] = f_hi.view(np.int32).reshape(n_segs, SEG_ROWS)
        fl[:, :SEG_ROWS] = (
            (f_lo ^ np.uint32(0x80000000)).view(np.int32).reshape(n_segs, SEG_ROWS))
        self.f_hi = jnp.asarray(fh)
        self.f_lo = jnp.asarray(fl)
        self.keys_u64 = jnp.asarray(keys)
        self.pad = pad
        self.n_segs = pad // SEG

    def tree(self):
        return (self.t_planes, self.f_hi, self.f_lo, self.keys_u64)

    def lookup_sorted(self, q):
        return self.lookup_sorted_with(self.tree(), q)

    def lookup_sorted_with(self, tree, q):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        t_planes, f_hi, f_lo, keys_u64 = tree
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
            ] + [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, QB, 1), lambda i, *_: (i, np.int32(0), np.int32(0))),
            scratch_shapes=[
                pltpu.VMEM((6, SEG_ROWS, LANES), jnp.uint32),
                pltpu.VMEM((1, LANES), jnp.int32),
                pltpu.VMEM((1, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((3,)),
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
        )(seg0, nseg, *q_args, t_planes, f_hi, f_lo)
        return out.reshape(-1)


def _interpret() -> bool:
    import jax

    return jax.default_backend() == "cpu"
