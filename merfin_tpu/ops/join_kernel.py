"""Pallas sorted-join exact lookup kernel.

Random HBM gathers on TPU are issue-rate-bound (~10M/s measured via
XLA's gather for any strategy — bench notes in docs/PERF.md).  This
kernel replaces them with sequential streaming: queries are SORTED, so
each block of QB queries covers one contiguous table window, which is
DMA-streamed through VMEM in SEG-entry segments and joined by equality
compare + masked sum — no gathers anywhere.  Keys are u32 hi/lo planes
(TPU Pallas has no 64-bit vectors).

Contract: `sorted_join_lookup(keys, vals, q_sorted)` == exact-match
values (0 absent), for SORTED q.  Callers that only reduce (hist,
completeness, count) skip unsorting entirely.

Block windows are computed with one small searchsorted over the block
boundary keys (G+1 probes, not M).
"""

from __future__ import annotations

import functools

import numpy as np

QB = 1024       # queries per grid block
SEG = 2048      # table entries per DMA segment


def _kernel(win_lo_ref, win_seg_ref, q_hi_ref, q_lo_ref,
            t_hi_ref, t_lo_ref, t_v_ref, out_ref,
            w_hi, w_lo, w_v, sem):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    lo = win_lo_ref[i]
    n_seg = win_seg_ref[i]

    q_hi = q_hi_ref[0, :].reshape(QB, 1)
    q_lo = q_lo_ref[0, :].reshape(QB, 1)

    out_ref[0, :] = jnp.zeros((QB,), dtype=jnp.uint32)

    def seg_body(s, acc):
        start = lo + s * SEG
        cp_hi = pltpu.make_async_copy(t_hi_ref.at[pl.ds(start, SEG)], w_hi, sem.at[0])
        cp_lo = pltpu.make_async_copy(t_lo_ref.at[pl.ds(start, SEG)], w_lo, sem.at[1])
        cp_v = pltpu.make_async_copy(t_v_ref.at[pl.ds(start, SEG)], w_v, sem.at[2])
        cp_hi.start()
        cp_lo.start()
        cp_v.start()
        cp_hi.wait()
        cp_lo.wait()
        cp_v.wait()

        def chunk_body(c, acc):
            wh = w_hi[pl.ds(c * 128, 128)].reshape(1, 128)
            wl = w_lo[pl.ds(c * 128, 128)].reshape(1, 128)
            wv = w_v[pl.ds(c * 128, 128)].reshape(1, 128)
            eq = (q_hi == wh) & (q_lo == wl)
            return acc + jnp.sum(
                jnp.where(eq, wv, jnp.uint32(0)), axis=1, dtype=jnp.uint32
            )

        return jax.lax.fori_loop(0, SEG // 128, chunk_body, acc)

    acc = jax.lax.fori_loop(
        0, n_seg, seg_body, jnp.zeros((QB,), dtype=jnp.uint32)
    )
    out_ref[0, :] = acc


class SortJoinTable:
    """Device table prepared for the sorted-join kernel."""

    def __init__(self, keys: np.ndarray, vals: np.ndarray, k: int):
        import jax.numpy as jnp

        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        vals = np.ascontiguousarray(vals, dtype=np.uint32)
        self.k = int(k)
        self.n = int(keys.size)
        # pad so any segment DMA stays in bounds; pad keys = u64::MAX
        pad = ((self.n + SEG - 1) // SEG + 1) * SEG
        hi = np.full(pad, 0xFFFFFFFF, np.uint32)
        lo = np.full(pad, 0xFFFFFFFF, np.uint32)
        v = np.zeros(pad, np.uint32)
        hi[: self.n] = (keys >> np.uint64(32)).astype(np.uint32)
        lo[: self.n] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        v[: self.n] = vals
        self.t_hi = jnp.asarray(hi)
        self.t_lo = jnp.asarray(lo)
        self.t_v = jnp.asarray(v)
        self.keys_u64 = jnp.asarray(keys)   # for block-bound searchsorted
        self.pad = pad

    def lookup_sorted(self, q_sorted):
        """Values for a SORTED uint64 query array (len multiple of QB)."""
        return _lookup_sorted(self, q_sorted)


@functools.partial(lambda f: f)
def _lookup_sorted(table: SortJoinTable, q):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = q.shape[0]
    assert m % QB == 0, "query length must be a multiple of QB"
    g = m // QB

    # block windows: [lo_i, hi_i) table ranges per query block
    bounds_q = jnp.concatenate([q[::QB], q[-1:]])
    pos = jnp.searchsorted(table.keys_u64, bounds_q)
    pos_hi = jnp.searchsorted(table.keys_u64, bounds_q[1:], side="right")
    win_lo = pos[:-1].astype(jnp.int32)
    win_hi = pos_hi.astype(jnp.int32)
    # segment-align the window; clamp into the padded array
    win_lo = jnp.minimum((win_lo // SEG) * SEG, table.pad - SEG)
    win_seg = jnp.maximum((win_hi - win_lo + SEG - 1) // SEG, 1).astype(jnp.int32)
    win_seg = jnp.minimum(win_seg, (table.pad - win_lo) // SEG)

    q_hi = (q >> np.uint64(32)).astype(jnp.uint32).reshape(g, QB)
    q_lo = (q & np.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(g, QB)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, QB), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, QB), lambda i, *_: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, QB), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((SEG,), jnp.uint32),
            pltpu.VMEM((SEG,), jnp.uint32),
            pltpu.VMEM((SEG,), jnp.uint32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((g, QB), jnp.uint32),
        grid_spec=grid_spec,
        interpret=_interpret_mode(),
    )(win_lo, win_seg, q_hi, q_lo, table.t_hi, table.t_lo, table.t_v)
    return out.reshape(-1)


def _interpret_mode() -> bool:
    import jax

    return jax.default_backend() == "cpu"
