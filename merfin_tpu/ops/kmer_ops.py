"""Device-side k-mer extraction.

Vectorized replacement for the reference's rolling kmerIterator
(kmers.H via merfin-histogram.C:54-63): every window position of a code
array produces a packed forward mer, reverse-complement mer and validity
flag in one fused elementwise program.  k is static, so the k-step roll
unrolls into shift/or chains that XLA fuses into a single pass.

Codes are uint8: 0..3 = ACGT, >=4 = invalid (N etc.).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def kmer_windows(codes, k: int):
    """All k-mer windows along the last axis.

    codes: uint8 [..., L] with L >= k.
    Returns (fmer, rmer, valid): uint64/uint64/bool arrays [..., L - k + 1].
    """
    L = codes.shape[-1]
    n = L - k + 1
    assert n >= 1, "codes shorter than k"

    good = codes < 4
    c = jnp.where(good, codes, 0).astype(jnp.uint64)

    fmer = jnp.zeros(codes.shape[:-1] + (n,), dtype=jnp.uint64)
    rmer = jnp.zeros_like(fmer)
    bad_any = jnp.zeros(codes.shape[:-1] + (n,), dtype=bool)
    three = np.uint64(3)
    for j in range(k):
        cj = c[..., j : j + n]
        fmer = (fmer << np.uint64(2)) | cj
        rmer = rmer | ((three - cj) << np.uint64(2 * j))
        bad_any = bad_any | (~good[..., j : j + n])
    return fmer, rmer, ~bad_any


def unpack_transfer(planes, vbits, L: int):
    """Device inverse of kcore.pack.pack_transfer_np.

    planes: uint8 [..., ceil(L/4)] (4 bases/byte, LSB-first);
    vbits: uint8 [..., ceil(L/8)] (1 validity bit/base, LSB-first).
    Returns codes uint8 [..., L] with invalid bases restored to 4 —
    bit-exact with the unpacked transfer, just 2.7x fewer input bytes
    over the host->device link.
    """
    csh = jnp.arange(4, dtype=jnp.uint8) * jnp.uint8(2)
    c = (planes[..., :, None] >> csh) & jnp.uint8(3)
    c = c.reshape(planes.shape[:-1] + (planes.shape[-1] * 4,))[..., :L]
    vsh = jnp.arange(8, dtype=jnp.uint8)
    v = (vbits[..., :, None] >> vsh) & jnp.uint8(1)
    v = v.reshape(vbits.shape[:-1] + (vbits.shape[-1] * 8,))[..., :L]
    return jnp.where(v == 1, c, jnp.uint8(4))


def seg_from_marks(marks_bits, base, C: int):
    """Reconstruct per-window segment ids from boundary marks.

    marks_bits: uint8 [..., ceil(C/8)] — bit p set when a sequence's
    first window sits at window-position p of the row; base: int32 [...]
    — number of marks in earlier rows (the flat-stream cumsum offset).
    Returns seg int32 [..., C]: the id of the last sequence started at or
    before each position.  Valid windows always lie inside a sequence, so
    masking by the k-mer validity plane yields exactly the seg plane
    pack_group builds — at 1/32 the transfer bytes.
    """
    vsh = jnp.arange(8, dtype=jnp.uint8)
    m = (marks_bits[..., :, None] >> vsh) & jnp.uint8(1)
    m = m.reshape(marks_bits.shape[:-1] + (marks_bits.shape[-1] * 8,))[..., :C]
    return base[..., None] + jnp.cumsum(m.astype(jnp.int32), axis=-1) - 1


def canonical_and_mult(fmer, rmer):
    """Canonical mer and the fmer+rmer lookup multiplier.

    merfin looks up BOTH orientations and sums (merfin-globals.C:107-108);
    against a canonical database that equals value(canonical) doubled for
    palindromic mers (fmer == rmer, possible only for even k).
    """
    canon = jnp.minimum(fmer, rmer)
    mult = jnp.where(fmer == rmer, jnp.uint64(2), jnp.uint64(1))
    return canon, mult
