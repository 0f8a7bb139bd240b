"""Lane-rolled sorted-join kernel (v5) vs HostLookup (interpret mode)."""

import numpy as np
import pytest

from merfin_tpu.ops.join_kernel import QB
from merfin_tpu.ops.join_kernel5 import SortJoinTableV5
from merfin_tpu.table.lookup import HostLookup


@pytest.mark.parametrize("n_table,m", [(5000, QB), (40000, 4 * QB), (100, 2 * QB)])
def test_rolled_join_matches_host(n_table, m):
    import jax.numpy as jnp

    k = 21
    rng = np.random.default_rng(n_table)
    keys = np.unique(rng.integers(0, 1 << (2 * k), size=n_table).astype(np.uint64))
    vals = rng.integers(1, 1000, size=keys.size).astype(np.uint32)

    q = np.concatenate([
        keys[rng.integers(0, keys.size, size=m // 2)],
        rng.integers(0, 1 << (2 * k), size=m - m // 2).astype(np.uint64),
    ])
    q = np.sort(q)

    table = SortJoinTableV5(keys, vals, k)
    got = np.asarray(table.lookup_sorted(jnp.asarray(q)))
    expect = HostLookup(keys, vals)(q)
    np.testing.assert_array_equal(got.astype(np.uint64), expect)


def test_rolled_join_sentinels_read_zero():
    import jax.numpy as jnp

    k = 15
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << (2 * k), size=3000).astype(np.uint64))
    vals = rng.integers(1, 9, size=keys.size).astype(np.uint32)
    q = np.sort(np.concatenate([
        keys[: QB // 2],
        np.full(QB // 2, 0xFFFFFFFFFFFFFFFF, np.uint64),
    ]))
    table = SortJoinTableV5(keys, vals, k)
    got = np.asarray(table.lookup_sorted(jnp.asarray(q)))
    expect = HostLookup(keys, vals)(q[: QB // 2])
    np.testing.assert_array_equal(got[: QB // 2].astype(np.uint64), expect)
    assert (got[QB // 2:] == 0).all()


def test_rolled_join_matches_v1():
    """v5 must agree with v1 on identical inputs (same table planes)."""
    import jax.numpy as jnp

    from merfin_tpu.ops.join_kernel import SortJoinTable

    k = 17
    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, 1 << (2 * k), size=20000).astype(np.uint64))
    vals = rng.integers(1, 100, size=keys.size).astype(np.uint32)
    q = np.sort(keys[rng.integers(0, keys.size, size=2 * QB)])
    v1 = SortJoinTable(keys, vals, k)
    v5 = SortJoinTableV5(keys, vals, k)
    a = np.asarray(v1.lookup_sorted(jnp.asarray(q)))
    b = np.asarray(v5.lookup_sorted(jnp.asarray(q)))
    np.testing.assert_array_equal(a, b)
