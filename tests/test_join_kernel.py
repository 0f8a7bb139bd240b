"""Sorted-join lookup kernel vs HostLookup (interpret mode on CPU)."""

import numpy as np
import pytest

from merfin_tpu.ops.join_kernel import SortJoinTable, QB
from merfin_tpu.table.lookup import HostLookup


@pytest.mark.parametrize("n_table,m", [(5000, QB), (40000, 4 * QB), (100, 2 * QB)])
def test_sorted_join_matches_host(n_table, m):
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

    table = SortJoinTable(keys, vals, k)
    got = np.asarray(table.lookup_sorted(jnp.asarray(q)))
    expect = HostLookup(keys, vals)(q)
    np.testing.assert_array_equal(got.astype(np.uint64), expect)


def test_sorted_join_with_sentinel_queries():
    """Invalid kmers are encoded as u64::MAX and must read as absent...
    they collide with pad keys, which carry value 0, so they still read 0."""
    import jax.numpy as jnp

    k = 15
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << (2 * k), size=3000).astype(np.uint64))
    vals = rng.integers(1, 9, size=keys.size).astype(np.uint32)
    q = np.sort(np.concatenate([
        keys[: QB // 2],
        np.full(QB // 2, 0xFFFFFFFFFFFFFFFF, np.uint64),
    ]))
    table = SortJoinTable(keys, vals, k)
    got = np.asarray(table.lookup_sorted(jnp.asarray(q)))
    expect = HostLookup(keys, vals)(q[: QB // 2])
    np.testing.assert_array_equal(got[: QB // 2].astype(np.uint64), expect)
    assert (got[QB // 2:] == 0).all()
