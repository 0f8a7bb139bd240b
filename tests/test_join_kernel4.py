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
