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


def canonical_and_mult(fmer, rmer):
    """Canonical mer and the fmer+rmer lookup multiplier.

    merfin looks up BOTH orientations and sums (merfin-globals.C:107-108);
    against a canonical database that equals value(canonical) doubled for
    palindromic mers (fmer == rmer, possible only for even k).
    """
    canon = jnp.minimum(fmer, rmer)
    mult = jnp.where(fmer == rmer, jnp.uint64(2), jnp.uint64(1))
    return canon, mult
