"""Sorted-join lookup kernel v4 — 8-bit planes on the fast MXU path.

Lineage: v1 streams + equality (join_kernel.py), v2 adds fence narrowing
with one-hot MXU row pulls (v2), v3 packs segments and double-buffers
DMA (v2/v3 removed after being superseded; measurements in docs/PERF.md).  v3 measured MXU-bound: exact f32
one-hot pulls need Precision.HIGHEST (6 bf16 passes) because 16-bit
plane values don't fit bf16.  v4 splits every u32 into FOUR u8 planes —
bf16 represents 0..255 exactly, so DEFAULT (single-pass) matmuls are
exact — trading 6 slow matmuls for 12 fast ones (~3x).

Also:
  * records are u8 [n_segs, REC_ROWS, 128]: 8 key planes + 4 value
    planes + 8 fence piece rows = 12.06 B/key, same as the raw table;
  * block windows come from a searchsorted over SEGMENT FIRST KEYS
    (n/8192 entries) — no per-key u64 copy on device at all.
"""

from __future__ import annotations

import numpy as np

QB = 1024
LANES = 128
SEG_ROWS = 64
SEG = SEG_ROWS * LANES            # 8192 entries
N_KEY_PLANES = 8                  # u64 key as 8 bytes (big-endian pieces)
N_VAL_PLANES = 4                  # u32 value as 4 bytes
REC_PLANE_ROWS = (N_KEY_PLANES + N_VAL_PLANES) * SEG_ROWS
REC_ROWS = REC_PLANE_ROWS + N_KEY_PLANES  # + fence byte rows
PAD_HI = 0x7FFFFFFF               # pad-key hi word (positive in int32)


def _kernel(seg0_ref, nseg_ref,
            q_hi_ref, q_lo_ref,                   # (1, 1, QB) i32 (lo biased)
            rec_ref,                              # HBM [n_segs, REC_ROWS, 128] u8
            out_ref,
            w_rec, sem):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    seg0 = seg0_ref[i]
    n_seg = nseg_ref[i]

    # One relayout per BLOCK (amortized over its segments): rows -> columns,
    # then derive the byte planes with in-kernel shifts.  (Shipping ten
    # pre-split (QB,1) arrays pads 128x in HBM: 2 GB per plane at 4M.)
    q_fhi = q_hi_ref[0].reshape(QB, 1)            # i32, hi < 2^31 (relayout)
    q_flo_b = q_lo_ref[0].reshape(QB, 1)          # i32, biased lo
    bias32 = np.int32(-2147483648)
    q_lo_u = q_flo_b - bias32                     # wraps back to u32 bit pattern
    c255 = np.int32(255)

    def byte_col(x, j):
        return ((x >> np.int32(8 * (3 - j))) & c255).astype(jnp.float32)

    # logical-shift emulation: q_fhi >= 0 so arithmetic shift is fine;
    # q_lo_u may be negative in i32 — mask after shift handles sign bits
    qb = [byte_col(q_fhi, j) for j in range(4)] + \
         [byte_col(q_lo_u, j) for j in range(4)]
    q_flo = q_flo_b

    def dma(slot, seg_idx):
        return pltpu.make_async_copy(
            rec_ref.at[pl.ds(seg0 + seg_idx, 1)],
            w_rec.at[pl.ds(slot, 1)],
            sem.at[slot],
        )

    dma(np.int32(0), jnp.int32(0)).start()

    c256 = np.int32(256)

    def seg_body(s, acc):
        slot = jax.lax.rem(s, np.int32(2))
        next_slot = jax.lax.rem(s + np.int32(1), np.int32(2))

        @pl.when(s + np.int32(1) < n_seg)
        def _():
            dma(next_slot, s + np.int32(1)).start()

        dma(slot, s).wait()
        rec = w_rec[slot]                      # (REC_ROWS, 128) u8

        # fences: reconstruct i32 hi / biased-lo from byte rows
        def fence_row(j):
            return rec[REC_PLANE_ROWS + j : REC_PLANE_ROWS + j + 1, :].astype(jnp.int32)

        fh = ((fence_row(0) * c256 + fence_row(1)) * c256
              + fence_row(2)) * c256 + fence_row(3)
        fl = ((fence_row(4) * c256 + fence_row(5)) * c256
              + fence_row(6)) * c256 + fence_row(7)
        # bias both to preserve unsigned order in signed int32
        bias = np.int32(-2147483648)
        fl = fl + bias
        le = (fh < q_fhi) | ((fh == q_fhi) & (fl <= q_flo))   # (QB, 128)
        row_q = (jnp.sum(le.astype(jnp.int32), axis=1, keepdims=True,
                         dtype=jnp.int32) - np.int32(1))
        row_q = jnp.clip(row_q, np.int32(0), np.int32(SEG_ROWS - 1))

        iota = jax.lax.broadcasted_iota(jnp.int32, (QB, SEG_ROWS), 1)
        onehot = (iota == row_q).astype(jnp.float32)          # (QB, 64)

        def pull(p):
            plane = rec[p * SEG_ROWS : (p + 1) * SEG_ROWS, :]
            plane = plane.astype(jnp.int32).astype(jnp.float32)
            # 0..255 is exact in bf16: single-pass MXU matmul is exact
            return jnp.dot(onehot, plane, preferred_element_type=jnp.float32)

        eq = (pull(0) == qb[0])
        for p in range(1, N_KEY_PLANES):
            eq = eq & (pull(p) == qb[p])                      # (QB, 128)

        v = pull(N_KEY_PLANES).astype(jnp.int32)
        for p in range(1, N_VAL_PLANES):
            v = v * c256 + pull(N_KEY_PLANES + p).astype(jnp.int32)
        val = jnp.where(eq, v, np.int32(0))
        return acc + jnp.sum(val, axis=1, keepdims=True, dtype=jnp.int32)

    acc = jax.lax.fori_loop(
        jnp.int32(0), n_seg, seg_body, jnp.zeros((QB, 1), dtype=jnp.int32),
    )
    out_ref[0] = acc.astype(jnp.uint32).reshape(1, QB)


def build_rec_np(keys: np.ndarray, vals: np.ndarray,
                 pad: int | None = None):
    """Host-side v4 record build: sorted (keys, vals) -> (rec u8
    [n_segs, REC_ROWS, 128], seg_first u64 [n_segs]).  ``pad`` forces the
    padded entry count (pow2 multiple of SEG >= 2*SEG) so independently
    built table shards can share one array shape (parallel/sharded.py);
    default sizes to the table."""
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    vals = np.ascontiguousarray(vals, dtype=np.uint32)
    n = int(keys.size)
    if pad is None:
        pad = ((n + SEG - 1) // SEG + 1) * SEG
        pad = max(2 * SEG, 1 << (pad - 1).bit_length())
    assert pad >= max(2 * SEG, n) and pad % SEG == 0
    hi = np.full(pad, PAD_HI, np.uint32)
    lo = np.full(pad, 0xFFFFFFFF, np.uint32)
    v = np.zeros(pad, np.uint32)
    hi[:n] = (keys >> np.uint64(32)).astype(np.uint32)
    lo[:n] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    v[:n] = vals

    n_segs = pad // SEG

    def bytes_of(x):  # big-endian byte planes of a u32 array
        return [((x >> (8 * (3 - j))) & 0xFF).astype(np.uint8)
                for j in range(4)]

    planes = bytes_of(hi) + bytes_of(lo) + bytes_of(v)
    rec = np.zeros((n_segs, REC_ROWS, LANES), np.uint8)
    for p, plane in enumerate(planes):
        rec[:, p * SEG_ROWS : (p + 1) * SEG_ROWS, :] = (
            plane.reshape(n_segs, SEG_ROWS, LANES))

    # fence byte rows: first key of each 128-row, lane-padded with
    # PAD_HI/0xFFFFFFFF pieces (order-safe after kernel reconstruction)
    rows = pad // LANES
    f_hi = np.full((n_segs, LANES), PAD_HI, np.uint32)
    f_lo = np.full((n_segs, LANES), 0xFFFFFFFF, np.uint32)
    f_hi[:, :SEG_ROWS] = hi.reshape(rows, LANES)[:, 0].reshape(n_segs, SEG_ROWS)
    f_lo[:, :SEG_ROWS] = lo.reshape(rows, LANES)[:, 0].reshape(n_segs, SEG_ROWS)
    for j, b in enumerate(bytes_of(f_hi) + bytes_of(f_lo)):
        rec[:, REC_PLANE_ROWS + j, :] = b

    return rec, seg_first_np(keys, n_segs)


def seg_first_np(keys: np.ndarray, n_segs: int) -> np.ndarray:
    """Segment index: first key of each SEG-entry segment (u64; tiny).
    Pad segments index as u64::MAX (sorts past every real key)."""
    seg_first = np.full(n_segs, 0xFFFFFFFFFFFFFFFF, np.uint64)
    if keys.size:
        real = keys[::SEG][:n_segs]
        seg_first[: real.size] = real
    else:
        seg_first[0] = 0
    return seg_first


def join_sorted_rec(rec, seg_first, q):
    """Standalone v4 sorted-join: values for SORTED uint64 queries ``q``
    (len multiple of QB) against (rec, seg_first) planes from
    build_rec_np.  Usable inside shard_map (everything derives from
    operand shapes)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_segs = rec.shape[0]
    m = q.shape[0]
    assert m % QB == 0
    g = m // QB

    # segment-granular block windows from the tiny segment index:
    # block i covers segments [seg0, seg0+nseg)
    bounds_lo = q[::QB]
    bounds_hi = q[QB - 1 :: QB]
    seg0 = (jnp.searchsorted(seg_first, bounds_lo, side="right")
            .astype(jnp.int32) - 1)
    seg0 = jnp.clip(seg0, 0, max(n_segs - 1, 0))
    seg_end = jnp.searchsorted(seg_first, bounds_hi, side="right").astype(jnp.int32)
    nseg = jnp.clip(seg_end - seg0, 1, n_segs - seg0)

    qhi = (q >> np.uint64(32)).astype(jnp.uint32)
    qlo = (q & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    to_i32 = lambda x: x.astype(jnp.int64).astype(jnp.int32)
    bias = jnp.uint32(0x80000000)
    q_hi_arg = to_i32(qhi).reshape(g, 1, QB)
    q_lo_arg = jax.lax.bitcast_convert_type(qlo ^ bias, jnp.int32).reshape(g, 1, QB)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, QB),
                         lambda i, *_: (i, np.int32(0), np.int32(0))),
            pl.BlockSpec((1, 1, QB),
                         lambda i, *_: (i, np.int32(0), np.int32(0))),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, QB), lambda i, *_: (i, np.int32(0), np.int32(0))),
        scratch_shapes=[
            pltpu.VMEM((2, REC_ROWS, LANES), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((g, 1, QB), jnp.uint32),
        grid_spec=grid_spec,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(seg0, nseg, q_hi_arg, q_lo_arg, rec)
    return out.reshape(-1)


# ---- two-value (union-table) variant ----
#
# Every merfin mode probes the SAME canonical k-mer against BOTH the
# read DB and the assembly DB (merfin-globals.C:101-110: getK sums
# fmer+rmer lookups in each).  Two separate sorted-join passes duplicate
# the query-side work (fence reconstruction, row search, one-hot, 8 key
# pulls) and stream 2 x 12.06 B/key of records.  The union table merges
# both DBs into ONE key-sorted record set with EIGHT value planes
# (read u32 + asm u32): one pass returns both values — 16 pulls + one
# fence pass instead of 24 pulls + two.

N_VAL2_PLANES = 8                 # read u32 + asm u32 as 8 byte planes
REC2_PLANE_ROWS = (N_KEY_PLANES + N_VAL2_PLANES) * SEG_ROWS
REC2_ROWS = REC2_PLANE_ROWS + N_KEY_PLANES  # + fence byte rows


def _kernel2(seg0_ref, nseg_ref, q_hi_ref, q_lo_ref, rec_ref, out_ref,
             w_rec, sem):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    seg0 = seg0_ref[i]
    n_seg = nseg_ref[i]

    q_fhi = q_hi_ref[0].reshape(QB, 1)
    q_flo_b = q_lo_ref[0].reshape(QB, 1)
    bias32 = np.int32(-2147483648)
    q_lo_u = q_flo_b - bias32
    c255 = np.int32(255)

    def byte_col(x, j):
        return ((x >> np.int32(8 * (3 - j))) & c255).astype(jnp.float32)

    qb = [byte_col(q_fhi, j) for j in range(4)] + \
         [byte_col(q_lo_u, j) for j in range(4)]
    q_flo = q_flo_b

    def dma(slot, seg_idx):
        return pltpu.make_async_copy(
            rec_ref.at[pl.ds(seg0 + seg_idx, 1)],
            w_rec.at[pl.ds(slot, 1)],
            sem.at[slot],
        )

    dma(np.int32(0), jnp.int32(0)).start()
    c256 = np.int32(256)

    def seg_body(s, accs):
        acc_a, acc_b = accs
        slot = jax.lax.rem(s, np.int32(2))
        next_slot = jax.lax.rem(s + np.int32(1), np.int32(2))

        @pl.when(s + np.int32(1) < n_seg)
        def _():
            dma(next_slot, s + np.int32(1)).start()

        dma(slot, s).wait()
        rec = w_rec[slot]                      # (REC2_ROWS, 128) u8

        def fence_row(j):
            return rec[REC2_PLANE_ROWS + j : REC2_PLANE_ROWS + j + 1, :].astype(jnp.int32)

        fh = ((fence_row(0) * c256 + fence_row(1)) * c256
              + fence_row(2)) * c256 + fence_row(3)
        fl = ((fence_row(4) * c256 + fence_row(5)) * c256
              + fence_row(6)) * c256 + fence_row(7)
        bias = np.int32(-2147483648)
        fl = fl + bias
        le = (fh < q_fhi) | ((fh == q_fhi) & (fl <= q_flo))   # (QB, 128)
        row_q = (jnp.sum(le.astype(jnp.int32), axis=1, keepdims=True,
                         dtype=jnp.int32) - np.int32(1))
        row_q = jnp.clip(row_q, np.int32(0), np.int32(SEG_ROWS - 1))

        iota = jax.lax.broadcasted_iota(jnp.int32, (QB, SEG_ROWS), 1)
        onehot = (iota == row_q).astype(jnp.float32)          # (QB, 64)

        def pull(p):
            plane = rec[p * SEG_ROWS : (p + 1) * SEG_ROWS, :]
            plane = plane.astype(jnp.int32).astype(jnp.float32)
            return jnp.dot(onehot, plane, preferred_element_type=jnp.float32)

        eq = (pull(0) == qb[0])
        for p in range(1, N_KEY_PLANES):
            eq = eq & (pull(p) == qb[p])                      # (QB, 128)

        def val(p0):
            v = pull(p0).astype(jnp.int32)
            for p in range(1, 4):
                v = v * c256 + pull(p0 + p).astype(jnp.int32)
            return jnp.where(eq, v, np.int32(0))

        va = val(N_KEY_PLANES)
        vb = val(N_KEY_PLANES + 4)
        return (acc_a + jnp.sum(va, axis=1, keepdims=True, dtype=jnp.int32),
                acc_b + jnp.sum(vb, axis=1, keepdims=True, dtype=jnp.int32))

    z = jnp.zeros((QB, 1), dtype=jnp.int32)
    acc_a, acc_b = jax.lax.fori_loop(jnp.int32(0), n_seg, seg_body, (z, z))
    out_ref[0] = jnp.concatenate(
        [acc_a.reshape(1, QB), acc_b.reshape(1, QB)],
        axis=0).astype(jnp.uint32)


def build_rec2_np(keys: np.ndarray, vals_a: np.ndarray, vals_b: np.ndarray,
                  pad: int | None = None):
    """Host-side union record build: sorted unique keys + two aligned
    value columns -> (rec u8 [n_segs, REC2_ROWS, 128], seg_first u64)."""
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    va = np.ascontiguousarray(vals_a, dtype=np.uint32)
    vb = np.ascontiguousarray(vals_b, dtype=np.uint32)
    n = int(keys.size)
    if pad is None:
        pad = ((n + SEG - 1) // SEG + 1) * SEG
        pad = max(2 * SEG, 1 << (pad - 1).bit_length())
    assert pad >= max(2 * SEG, n) and pad % SEG == 0
    hi = np.full(pad, PAD_HI, np.uint32)
    lo = np.full(pad, 0xFFFFFFFF, np.uint32)
    a = np.zeros(pad, np.uint32)
    b = np.zeros(pad, np.uint32)
    hi[:n] = (keys >> np.uint64(32)).astype(np.uint32)
    lo[:n] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    a[:n] = va
    b[:n] = vb

    n_segs = pad // SEG

    def bytes_of(x):
        return [((x >> (8 * (3 - j))) & 0xFF).astype(np.uint8)
                for j in range(4)]

    planes = bytes_of(hi) + bytes_of(lo) + bytes_of(a) + bytes_of(b)
    rec = np.zeros((n_segs, REC2_ROWS, LANES), np.uint8)
    for p, plane in enumerate(planes):
        rec[:, p * SEG_ROWS : (p + 1) * SEG_ROWS, :] = (
            plane.reshape(n_segs, SEG_ROWS, LANES))

    rows = pad // LANES
    f_hi = np.full((n_segs, LANES), PAD_HI, np.uint32)
    f_lo = np.full((n_segs, LANES), 0xFFFFFFFF, np.uint32)
    f_hi[:, :SEG_ROWS] = hi.reshape(rows, LANES)[:, 0].reshape(n_segs, SEG_ROWS)
    f_lo[:, :SEG_ROWS] = lo.reshape(rows, LANES)[:, 0].reshape(n_segs, SEG_ROWS)
    for j, byte in enumerate(bytes_of(f_hi) + bytes_of(f_lo)):
        rec[:, REC2_PLANE_ROWS + j, :] = byte

    return rec, seg_first_np(keys, n_segs)


def join_sorted_rec2(rec, seg_first, q):
    """Two-value v4 sorted-join: (vals_a, vals_b) u32 for SORTED uint64
    queries against a union record set from build_rec2_np."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_segs = rec.shape[0]
    m = q.shape[0]
    assert m % QB == 0
    g = m // QB

    bounds_lo = q[::QB]
    bounds_hi = q[QB - 1 :: QB]
    seg0 = (jnp.searchsorted(seg_first, bounds_lo, side="right")
            .astype(jnp.int32) - 1)
    seg0 = jnp.clip(seg0, 0, max(n_segs - 1, 0))
    seg_end = jnp.searchsorted(seg_first, bounds_hi, side="right").astype(jnp.int32)
    nseg = jnp.clip(seg_end - seg0, 1, n_segs - seg0)

    qhi = (q >> np.uint64(32)).astype(jnp.uint32)
    qlo = (q & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    to_i32 = lambda x: x.astype(jnp.int64).astype(jnp.int32)
    bias = jnp.uint32(0x80000000)
    q_hi_arg = to_i32(qhi).reshape(g, 1, QB)
    q_lo_arg = jax.lax.bitcast_convert_type(qlo ^ bias, jnp.int32).reshape(g, 1, QB)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, QB),
                         lambda i, *_: (i, np.int32(0), np.int32(0))),
            pl.BlockSpec((1, 1, QB),
                         lambda i, *_: (i, np.int32(0), np.int32(0))),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, QB), lambda i, *_: (i, np.int32(0), np.int32(0))),
        scratch_shapes=[
            pltpu.VMEM((2, REC2_ROWS, LANES), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        _kernel2,
        out_shape=jax.ShapeDtypeStruct((g, 2, QB), jnp.uint32),
        grid_spec=grid_spec,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(seg0, nseg, q_hi_arg, q_lo_arg, rec)
    return out[:, 0, :].reshape(-1), out[:, 1, :].reshape(-1)


def union_merge_np(keys_a, vals_a, keys_b, vals_b):
    """Merge two sorted-unique (keys, vals) DBs into union keys + two
    aligned value columns (0 where a DB lacks the key)."""
    keys_a = np.asarray(keys_a, np.uint64)
    keys_b = np.asarray(keys_b, np.uint64)
    keys = np.union1d(keys_a, keys_b)
    va = np.zeros(keys.size, np.uint32)
    vb = np.zeros(keys.size, np.uint32)
    va[np.searchsorted(keys, keys_a)] = np.asarray(vals_a, np.uint32)
    vb[np.searchsorted(keys, keys_b)] = np.asarray(vals_b, np.uint32)
    return keys, va, vb


class SortJoinUnionV4:
    """Union device table: u8 plane records with two value columns."""

    def __init__(self, keys_a, vals_a, keys_b, vals_b, k: int):
        import jax.numpy as jnp

        self.k = int(k)
        keys, va, vb = union_merge_np(keys_a, vals_a, keys_b, vals_b)
        self.n = int(keys.size)
        rec, seg_first = build_rec2_np(keys, va, vb)
        self.rec = jnp.asarray(rec)
        self.seg_first = jnp.asarray(seg_first)
        self.pad = rec.shape[0] * SEG
        self.n_segs = rec.shape[0]

    def tree(self):
        return (self.rec, self.seg_first)

    def lookup2_sorted(self, q):
        return self.lookup2_sorted_with(self.tree(), q)

    def lookup2_sorted_with(self, tree, q):
        rec, seg_first = tree
        return join_sorted_rec2(rec, seg_first, q)


class SortJoinTableV4:
    """Device table with u8 plane records + segment-key index."""

    def __init__(self, keys: np.ndarray, vals: np.ndarray, k: int):
        import jax.numpy as jnp

        self.k = int(k)
        self.n = int(np.asarray(keys).size)
        rec, seg_first = build_rec_np(keys, vals)
        self.rec = jnp.asarray(rec)
        self.seg_first = jnp.asarray(seg_first)
        self.pad = rec.shape[0] * SEG
        self.n_segs = rec.shape[0]

    def tree(self):
        return (self.rec, self.seg_first)

    def lookup_sorted(self, q):
        return self.lookup_sorted_with(self.tree(), q)

    def lookup_sorted_with(self, tree, q):
        rec, seg_first = tree
        return join_sorted_rec(rec, seg_first, q)


def _interpret() -> bool:
    import jax

    return jax.default_backend() == "cpu"
