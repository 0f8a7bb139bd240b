"""k-mer packing: numpy and device paths vs the string oracle."""

import random

import numpy as np
import pytest

from merfin_tpu.kcore.pack import encode_bases, kmers_from_codes_np, revcomp_np
from merfin_tpu.io.meryl_text import encode_kmer, decode_kmer
from tests import refmodel
from tests.util import random_dna


@pytest.mark.parametrize("k", [3, 5, 21, 31])
def test_kmers_vs_strings(k):
    rng = random.Random(k)
    s = random_dna(rng, 300, with_n=0.03)
    codes = encode_bases(s)
    fmer, rmer, valid = kmers_from_codes_np(codes, k)
    assert fmer.shape[0] == len(s) - k + 1
    for i in range(len(s) - k + 1):
        w = s[i : i + k]
        ok = refmodel.is_acgt(w)
        assert bool(valid[i]) == ok
        if ok:
            assert int(fmer[i]) == encode_kmer(w)
            assert int(rmer[i]) == encode_kmer(refmodel.revcomp(w))


def test_revcomp_np():
    k = 11
    rng = random.Random(0)
    mers = [random_dna(rng, k) for _ in range(50)]
    keys = np.asarray([encode_kmer(m) for m in mers], dtype=np.uint64)
    rc = revcomp_np(keys, k)
    for m, r in zip(mers, rc):
        assert decode_kmer(int(r), k) == refmodel.revcomp(m)


def test_encode_decode_roundtrip():
    rng = random.Random(1)
    for k in (1, 7, 31):
        m = random_dna(rng, k)
        assert decode_kmer(encode_kmer(m), k) == m


@pytest.mark.parametrize("k", [4, 21])
def test_device_kmer_windows_match_np(k):
    import jax.numpy as jnp

    from merfin_tpu.ops.kmer_ops import kmer_windows

    rng = random.Random(k)
    s = random_dna(rng, 257, with_n=0.05)
    codes = encode_bases(s)
    f_np, r_np, v_np = kmers_from_codes_np(codes, k)
    f_d, r_d, v_d = kmer_windows(jnp.asarray(codes), k)
    np.testing.assert_array_equal(np.asarray(f_d), f_np)
    np.testing.assert_array_equal(np.asarray(r_d), r_np)
    np.testing.assert_array_equal(np.asarray(v_d), v_np)
