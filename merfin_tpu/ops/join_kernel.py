"""Pallas sorted-join exact lookup kernel.

Random HBM gathers on TPU are issue-rate-bound (~10M lookups/s measured
through every XLA gather strategy — see docs/PERF.md).  This kernel
replaces them with sequential streaming: queries are SORTED, so each
block of QB queries covers one contiguous table window, which is DMA-
streamed through VMEM in SEG-entry segments and joined by an equality
compare + masked sum — no gathers anywhere.  Keys travel as u32 hi/lo
planes (no 64-bit vectors on TPU).

Layout notes (Mosaic constraints):
  * queries are stored [g, QB, 1] so a block is a (QB, 1) column —
    broadcasting against a (1, 128) window chunk gives the all-pairs
    (QB, 128) compare without any in-kernel transpose;
  * table planes are [rows, 128] 2-D so segment DMAs are row-aligned.

Contract: lookup_sorted(q) == exact-match values (0 where absent) for a
SORTED uint64 query array.  Reduction-style consumers (hist,
completeness, count) never need to unsort.
"""

from __future__ import annotations

import numpy as np

QB = 1024        # queries per grid block
SEG = 2048       # table entries per DMA segment
LANES = 128
SEG_ROWS = SEG // LANES


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

    q_hi = q_hi_ref[0]        # (QB, 1)
    q_lo = q_lo_ref[0]

    def seg_body(s, acc):
        # s is i32: the fori bounds below are i32 (x64 would give i64,
        # which tpu.memref_slice rejects)
        r = row0 + s * SEG_ROWS
        z = np.int32(0)   # x64 mode promotes bare int literals to i64,
        # which tpu.memref_slice rejects for semaphore indexing
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

        # static unroll over the segment's chunks: no dynamic lane math
        for c in range(SEG_ROWS):
            wh = w_hi[c : c + 1, :]          # (1, LANES)
            wl = w_lo[c : c + 1, :]
            wv = w_v[c : c + 1, :]
            eq = (q_hi == wh) & (q_lo == wl)             # (QB, LANES)
            # Mosaic can't reduce unsigned ints; accumulate as int32
            hit = jnp.where(eq, wv.astype(jnp.int32), jnp.int32(0))
            acc = acc + jnp.sum(hit, axis=1, keepdims=True, dtype=jnp.int32)
        return acc

    acc = jax.lax.fori_loop(
        jnp.int32(0), n_seg, seg_body, jnp.zeros((QB, 1), dtype=jnp.int32),
    )
    out_ref[0] = acc.astype(jnp.uint32)


class SortJoinTable:
    """Device table prepared for the sorted-join kernel."""

    def __init__(self, keys: np.ndarray, vals: np.ndarray, k: int):
        import jax.numpy as jnp

        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        vals = np.ascontiguousarray(vals, dtype=np.uint32)
        self.k = int(k)
        self.n = int(keys.size)
        # pad so any segment DMA stays in bounds; pad keys = u64::MAX.
        # Quantized to a power of two for compiled-program reuse.
        pad = ((self.n + SEG - 1) // SEG + 1) * SEG
        pad = max(2 * SEG, 1 << (pad - 1).bit_length())
        hi = np.full(pad, 0xFFFFFFFF, np.uint32)
        lo = np.full(pad, 0xFFFFFFFF, np.uint32)
        v = np.zeros(pad, np.uint32)
        hi[: self.n] = (keys >> np.uint64(32)).astype(np.uint32)
        lo[: self.n] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        v[: self.n] = vals
        self.t_hi = jnp.asarray(hi.reshape(-1, LANES))
        self.t_lo = jnp.asarray(lo.reshape(-1, LANES))
        self.t_v = jnp.asarray(v.reshape(-1, LANES))
        self.keys_u64 = jnp.asarray(keys)   # for block-bound searchsorted
        self.pad = pad
        self.pad_rows = pad // LANES

    def tree(self):
        """Arrays as a pytree — pass through outer jits as arguments."""
        return (self.t_hi, self.t_lo, self.t_v, self.keys_u64)

    def lookup_sorted(self, q):
        """Values for a SORTED uint64 query array (len multiple of QB)."""
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

        # block windows: [lo_i, hi_i) table ranges per query block
        bounds_q = jnp.concatenate([q[::QB], q[-1:]])
        pos = jnp.searchsorted(keys_u64, bounds_q)
        pos_hi = jnp.searchsorted(keys_u64, bounds_q[1:], side="right")
        win_lo = pos[:-1].astype(jnp.int32)
        win_hi = pos_hi.astype(jnp.int32)
        # segment-align; clamp into the padded planes (row units)
        win_row = jnp.minimum((win_lo // SEG) * SEG_ROWS,
                              self.pad_rows - SEG_ROWS)
        win_seg = jnp.maximum(
            (win_hi - (win_row // SEG_ROWS) * SEG + SEG - 1) // SEG, 1
        ).astype(jnp.int32)
        win_seg = jnp.minimum(win_seg, (self.pad_rows - win_row) // SEG_ROWS)

        q_hi = (q >> np.uint64(32)).astype(jnp.uint32).reshape(g, QB, 1)
        q_lo = (q & np.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(g, QB, 1)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[
                # np.int32 zeros: x64 mode would make the index map
                # return mixed (i32, i64, i64), which Mosaic rejects
                pl.BlockSpec((1, QB, 1), lambda i, *_: (i, np.int32(0), np.int32(0))),
                pl.BlockSpec((1, QB, 1), lambda i, *_: (i, np.int32(0), np.int32(0))),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, QB, 1), lambda i, *_: (i, np.int32(0), np.int32(0))),
            scratch_shapes=[
                pltpu.VMEM((SEG_ROWS, LANES), jnp.uint32),
                pltpu.VMEM((SEG_ROWS, LANES), jnp.uint32),
                pltpu.VMEM((SEG_ROWS, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        )

        import jax

        out = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((g, QB, 1), jnp.uint32),
            grid_spec=grid_spec,
            interpret=_interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                # the unrolled chunk loop keeps several (QB, LANES)
                # intermediates live; default 16M scoped vmem is too
                # small (v5e has 128M)
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(win_row, win_seg, q_hi, q_lo, t_hi, t_lo, t_v)
        return out.reshape(-1)


def _interpret_mode() -> bool:
    import jax

    return jax.default_backend() == "cpu"
