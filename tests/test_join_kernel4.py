"""v4 u8-plane/double-buffered sorted-join kernel vs HostLookup."""

import numpy as np
import pytest

from merfin_tpu.ops.join_kernel4 import SortJoinTableV4, QB, SEG
from merfin_tpu.table.lookup import HostLookup


@pytest.mark.parametrize("n_table,m", [
    (5000, QB), (60000, 4 * QB), (SEG * 3 + 17, 2 * QB), (100, QB),
])
def test_v4_matches_host(n_table, m):
    import jax.numpy as jnp

    k = 21
    rng = np.random.default_rng(n_table)
    keys = np.unique(rng.integers(0, 1 << (2 * k), size=n_table).astype(np.uint64))
    vals = rng.integers(1, 70000, size=keys.size).astype(np.uint32)

    q = np.sort(np.concatenate([
        keys[rng.integers(0, keys.size, size=m // 2)],
        rng.integers(0, 1 << (2 * k), size=m - m // 2).astype(np.uint64),
    ]))
    table = SortJoinTableV4(keys, vals, k)
    got = np.asarray(table.lookup_sorted(jnp.asarray(q)))
    expect = HostLookup(keys, vals)(q)
    np.testing.assert_array_equal(got.astype(np.uint64), expect)


def test_v4_sentinels():
    import jax.numpy as jnp

    k = 15
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << (2 * k), size=3000).astype(np.uint64))
    vals = rng.integers(1, 9, size=keys.size).astype(np.uint32)
    q = np.sort(np.concatenate([
        keys[: QB // 2], np.full(QB // 2, 0xFFFFFFFFFFFFFFFF, np.uint64),
    ]))
    table = SortJoinTableV4(keys, vals, k)
    got = np.asarray(table.lookup_sorted(jnp.asarray(q)))
    expect = HostLookup(keys, vals)(q[: QB // 2])
    np.testing.assert_array_equal(got[: QB // 2].astype(np.uint64), expect)
    assert (got[QB // 2:] == 0).all()


# ---- two-value union-table variant ----

@pytest.mark.parametrize("n_read,n_asm,m", [
    (5000, 3000, QB), (60000, 2000, 4 * QB), (SEG * 3 + 17, SEG + 5, 2 * QB),
    (100, 80, QB),
])
def test_union_v4_matches_two_hosts(n_read, n_asm, m):
    import jax.numpy as jnp

    from merfin_tpu.ops.join_kernel4 import SortJoinUnionV4

    k = 21
    rng = np.random.default_rng(n_read * 7 + n_asm)
    rk = np.unique(rng.integers(0, 1 << (2 * k), size=n_read).astype(np.uint64))
    rv = rng.integers(1, 70000, size=rk.size).astype(np.uint32)
    ak = np.unique(rng.integers(0, 1 << (2 * k), size=n_asm).astype(np.uint64))
    av = rng.integers(1, 9, size=ak.size).astype(np.uint32)

    q = np.sort(np.concatenate([
        rk[rng.integers(0, rk.size, size=m // 3)],
        ak[rng.integers(0, ak.size, size=m // 3)],
        rng.integers(0, 1 << (2 * k), size=m - 2 * (m // 3)).astype(np.uint64),
    ]))
    table = SortJoinUnionV4(rk, rv, ak, av, k)
    got_r, got_a = table.lookup2_sorted(jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(got_r).astype(np.uint64),
                                  HostLookup(rk, rv)(q))
    np.testing.assert_array_equal(np.asarray(got_a).astype(np.uint64),
                                  HostLookup(ak, av)(q))


def test_union_v4_sentinels():
    import jax.numpy as jnp

    from merfin_tpu.ops.join_kernel4 import SortJoinUnionV4

    k = 15
    rng = np.random.default_rng(2)
    rk = np.unique(rng.integers(0, 1 << (2 * k), size=3000).astype(np.uint64))
    rv = rng.integers(1, 9, size=rk.size).astype(np.uint32)
    q = np.sort(np.concatenate([
        rk[: QB // 2], np.full(QB // 2, 0xFFFFFFFFFFFFFFFF, np.uint64),
    ]))
    table = SortJoinUnionV4(rk, rv, rk, rv + 1, k)
    got_r, got_a = table.lookup2_sorted(jnp.asarray(q))
    np.testing.assert_array_equal(
        np.asarray(got_r)[: QB // 2].astype(np.uint64), HostLookup(rk, rv)(q[: QB // 2]))
    assert (np.asarray(got_r)[QB // 2:] == 0).all()
    assert (np.asarray(got_a)[QB // 2:] == 0).all()


@pytest.mark.parametrize("k", [21, 20])
def test_engine_union_matches_two_table_sortjoin(k):
    """-hist through the union sortjoin path == the two-table path
    (odd and even k; even k exercises the palindrome multiplier on the
    union probe)."""
    from merfin_tpu.modes.engine import KstarEngine
    from merfin_tpu.table.lookup import DeviceLookup

    rng = np.random.default_rng(k)
    keys = np.unique(rng.integers(0, 1 << (2 * k), size=4000).astype(np.uint64))
    rv = rng.integers(1, 60, size=keys.size).astype(np.uint32)
    # asm keys: a subset + extras, so the union has one-sided keys
    ak = np.unique(np.concatenate([
        keys[:: 2],
        rng.integers(0, 1 << (2 * k), size=500).astype(np.uint64)]))
    av = rng.integers(1, 3, size=ak.size).astype(np.uint32)

    kw = dict(k=k, peak=12.0, chunk=512, batch=2, sortjoin=True)
    e_two = KstarEngine(DeviceLookup(keys, rv, k), DeviceLookup(ak, av, k),
                        sortjoin_union=False, **kw)
    e_uni = KstarEngine(DeviceLookup(keys, rv, k), DeviceLookup(ak, av, k),
                        sortjoin_union=True, **kw)
    codes = rng.integers(0, 5, size=4096).astype(np.uint8)  # incl. N codes
    s2, u2, o2 = e_two.hist_sequence(codes)
    s1, u1, o1 = e_uni.hist_sequence(codes)
    assert (s1.kasm, s1.kmissing, s1.kover_cpy) == (s2.kasm, s2.kmissing,
                                                    s2.kover_cpy)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(o1, o2)


def test_union_merge_np_fuzz():
    """union_merge_np == dict-based union construction on random DBs."""
    from merfin_tpu.ops.join_kernel4 import union_merge_np

    rng = np.random.default_rng(99)
    for _ in range(50):
        na, nb = rng.integers(0, 200, size=2)
        ka = np.unique(rng.integers(0, 500, size=na).astype(np.uint64))
        kb = np.unique(rng.integers(0, 500, size=nb).astype(np.uint64))
        va = rng.integers(1, 1000, size=ka.size).astype(np.uint32)
        vb = rng.integers(1, 1000, size=kb.size).astype(np.uint32)
        keys, ua, ub = union_merge_np(ka, va, kb, vb)
        da = dict(zip(ka.tolist(), va.tolist()))
        db = dict(zip(kb.tolist(), vb.tolist()))
        want = sorted(set(da) | set(db))
        assert keys.tolist() == want
        assert ua.tolist() == [da.get(k, 0) for k in want]
        assert ub.tolist() == [db.get(k, 0) for k in want]
