"""Transfer packing: 2-bit planes + validity bits (and boundary-mark seg
bitmasks for packed groups) must be BIT-EXACT with the unpacked u8 path —
the packing only shrinks the host->device link, never the math.
"""

import numpy as np
import pytest

from merfin_tpu.kcore.pack import pack_transfer_np
from merfin_tpu.modes.engine import KstarEngine, pack_group, pack_group_transfer
from merfin_tpu.table.lookup import DeviceLookup
from merfin_tpu.kcore.pack import kmers_from_codes_np

K = 11


def _codes(rng, n, n_frac=0.02):
    c = rng.integers(0, 4, size=n).astype(np.uint8)
    bad = rng.random(n) < n_frac
    c[bad] = 4
    return c


def _tables(rng, codes):
    f, r, valid = kmers_from_codes_np(codes, K)
    canon = np.minimum(f, r)[valid]
    ks, cs = np.unique(canon, return_counts=True)
    read = DeviceLookup(ks.astype(np.uint64), (cs * 7).astype(np.uint32), K)
    asm = DeviceLookup(ks.astype(np.uint64), cs.astype(np.uint32), K)
    return read, asm


def test_roundtrip_unpack():
    import jax.numpy as jnp

    from merfin_tpu.ops.kmer_ops import unpack_transfer

    rng = np.random.default_rng(0)
    for L in (1, 3, 8, 33, 1024):
        codes = _codes(rng, 2 * L, n_frac=0.3).reshape(2, L)
        planes, vbits = pack_transfer_np(codes)
        assert planes.shape[-1] == (L + 3) // 4
        assert vbits.shape[-1] == (L + 7) // 8
        out = np.asarray(unpack_transfer(jnp.asarray(planes),
                                         jnp.asarray(vbits), L))
        # invalid codes all collapse to 4 on the wire
        want = np.where(codes < 4, codes, 4).astype(np.uint8)
        np.testing.assert_array_equal(out, want)


def test_seg_from_marks_matches_pack_group():
    import jax.numpy as jnp

    from merfin_tpu.ops.kmer_ops import seg_from_marks, kmer_windows

    rng = np.random.default_rng(1)
    chunk, rows = 64, 8
    seqs = [_codes(rng, int(n)) for n in rng.integers(5, 40, size=9)]
    seqs.append(_codes(rng, 3))            # shorter than k: zero windows
    codes_b, seg_b, _ = pack_group(seqs, K, chunk, rows, rows * chunk)
    planes, vbits, marks, base, _ = pack_group_transfer(
        seqs, K, chunk, rows, rows * chunk)
    seg = np.asarray(seg_from_marks(jnp.asarray(marks),
                                    jnp.asarray(base), chunk))
    # equality is only contractual on VALID windows (pack_group labels
    # separator-gap windows SEG_MAX; the mark-cumsum labels them with the
    # previous sequence — both are masked out by the validity plane)
    _, _, valid = kmer_windows(jnp.asarray(codes_b), K)
    valid = np.asarray(valid)
    np.testing.assert_array_equal(seg[valid], seg_b[valid])


@pytest.mark.parametrize("mode", ["hist", "dump"])
def test_engine_packed_vs_unpacked(mode):
    rng = np.random.default_rng(2)
    codes = _codes(rng, 5000)
    read, asm = _tables(rng, codes)
    kw = dict(k=K, peak=7.0, chunk=512, batch=2)
    e_ref = KstarEngine(read, asm, pack_transfer=False, **kw)
    e_pk = KstarEngine(read, asm, pack_transfer=True, **kw)

    if mode == "hist":
        s_r, u_r, o_r = e_ref.hist_sequence(codes)
        s_p, u_p, o_p = e_pk.hist_sequence(codes)
        assert (s_r.kasm, s_r.kmissing) == (s_p.kasm, s_p.kmissing)
        assert s_r.kover_cpy == s_p.kover_cpy
        np.testing.assert_array_equal(u_r, u_p)
        np.testing.assert_array_equal(o_r, o_p)
    else:
        for (st_r, rk_r, ak_r, km_r, ka_r, ks_r), \
            (st_p, rk_p, ak_p, km_p, ka_p, ks_p) in zip(
                e_ref.dump_sequence(codes), e_pk.dump_sequence(codes)):
            assert st_r == st_p and ka_r == ka_p and ks_r == ks_p
            np.testing.assert_array_equal(rk_r, rk_p)
            np.testing.assert_array_equal(ak_r, ak_p)
            np.testing.assert_array_equal(km_r, km_p)


def test_engine_group_packed_vs_unpacked():
    rng = np.random.default_rng(3)
    seqs = [_codes(rng, int(n)) for n in rng.integers(K, 200, size=40)]
    read, asm = _tables(rng, np.concatenate(seqs))
    kw = dict(k=K, peak=7.0, chunk=2048, batch=4)
    e_ref = KstarEngine(read, asm, pack_transfer=False, **kw)
    e_pk = KstarEngine(read, asm, pack_transfer=True, **kw)

    st_r, u_r, o_r, kv_r = e_ref.hist_group(seqs)
    st_p, u_p, o_p, kv_p = e_pk.hist_group(seqs)
    assert kv_r == kv_p
    np.testing.assert_array_equal(u_r, u_p)
    np.testing.assert_array_equal(o_r, o_p)
    for a, b in zip(st_r, st_p):
        assert (a.kasm, a.kmissing) == (b.kasm, b.kmissing)

    for (rk_r, ak_r, km_r, ka_r, ks_r), (rk_p, ak_p, km_p, ka_p, ks_p) in zip(
            e_ref.dump_group(seqs), e_pk.dump_group(seqs)):
        assert ka_r == ka_p and ks_r == ks_p
        np.testing.assert_array_equal(rk_r, rk_p)
        np.testing.assert_array_equal(ak_r, ak_p)
        np.testing.assert_array_equal(km_r, km_p)
