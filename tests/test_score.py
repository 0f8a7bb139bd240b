"""K*/QV math: numpy + jnp vs the scalar oracle."""

import math
import random

import numpy as np
import pytest

from merfin_tpu.score.kstar import (
    ProbTable, get_k_np, k_metric_np, histo_qv, hist_bin_np, kover_cpy_np,
)
from tests import refmodel


def _rand_values(rng, n):
    vals = []
    for _ in range(n):
        r = rng.random()
        if r < 0.2:
            vals.append(0)
        elif r < 0.8:
            vals.append(rng.randrange(1, 30))
        else:
            vals.append(rng.randrange(30, 500))
    return np.asarray(vals, dtype=np.uint64)


@pytest.mark.parametrize("peak", [0.0, 1.0, 7.5, 12.0])
@pytest.mark.parametrize("with_table", [False, True])
def test_get_k_matches_oracle(peak, with_table):
    rng = random.Random(int(peak * 10) + with_table)
    sv = _rand_values(rng, 500)
    av = _rand_values(rng, 500)
    if with_table:
        copy_k = [rng.randrange(0, 5) for _ in range(10)]
        copy_p = [rng.random() for _ in range(10)]
        table = ProbTable(np.asarray(copy_k, np.uint32), np.asarray(copy_p))
    else:
        copy_k, copy_p = [], []
        table = None

    rk, ak, pr = get_k_np(sv, av, peak, table)
    for i in range(len(sv)):
        erk, eak, epr = refmodel.get_k(int(sv[i]), int(av[i]), peak, copy_k, copy_p)
        assert rk[i] == erk, (i, sv[i], peak)
        assert ak[i] == eak
        assert pr[i] == epr


def test_get_k_jnp_matches_np():
    import jax.numpy as jnp

    from merfin_tpu.ops.score_ops import get_k_jnp, prob_table_arrays

    rng = random.Random(7)
    sv = _rand_values(rng, 300)
    av = _rand_values(rng, 300)
    table = ProbTable(
        np.asarray([rng.randrange(0, 5) for _ in range(8)], np.uint32),
        np.asarray([rng.random() for _ in range(8)]),
    )
    for peak in (0.0, 4.4, 30.0):
        for t in (None, table):
            ck, cp, tl = prob_table_arrays(t)
            rk_d, ak_d, pr_d = get_k_jnp(jnp.asarray(sv), jnp.asarray(av), peak, ck, cp, tl)
            rk_n, ak_n, pr_n = get_k_np(sv, av, peak, t)
            np.testing.assert_array_equal(np.asarray(rk_d), rk_n)
            np.testing.assert_array_equal(np.asarray(ak_d), ak_n)
            np.testing.assert_array_equal(np.asarray(pr_d), pr_n)


def test_k_metric_matches_oracle():
    cases = [(0, 0), (0, 5), (3, 0), (3, 3), (2, 6), (6, 2), (1, 4), (5, 1)]
    rk = np.asarray([c[0] for c in cases], dtype=np.float64)
    ak = np.asarray([c[1] for c in cases], dtype=np.float64)
    got = k_metric_np(rk, ak)
    for i, (r, a) in enumerate(cases):
        assert got[i] == refmodel.k_metric(float(r), float(a))


def test_histo_qv():
    assert math.isclose(histo_qv(10, 1000, 21), refmodel.histo_qv(10, 1000, 21))
    assert math.isclose(histo_qv(0.5, 100.0, 21), refmodel.histo_qv(0.5, 100.0, 21))


def test_hist_bins_match_oracle():
    rng = random.Random(3)
    rk = np.asarray([rng.choice([0, 1, 1, 2, 3, 5]) for _ in range(300)], np.float64)
    ak = np.asarray([rng.choice([0, 1, 1, 2, 3, 9]) for _ in range(300)], np.float64)
    missing, undr_idx, over_idx = hist_bin_np(rk, ak)
    for i in range(300):
        r, a = float(rk[i]), float(ak[i])
        if r == 0:
            assert missing[i]
        elif a > r:
            assert undr_idx[i] == int((a / r - 1 + 0.1) / 0.2)
            assert over_idx[i] == -1
        else:
            assert over_idx[i] == int((r / a - 1 + 0.1) / 0.2) if a != 0 else True
            assert undr_idx[i] == -1


def test_kover_cpy():
    rk = np.asarray([2.0, 0.0, 3.0, 1.0])
    ak = np.asarray([4.0, 5.0, 3.0, 0.5])
    pr = np.asarray([0.5, 1.0, 1.0, 1.0])
    out = kover_cpy_np(rk, ak, pr)
    assert out[0] == (1 - 2 / 4) * 0.5
    assert out[1] == 0.0 and out[2] == 0.0 and out[3] == 0.0


def test_value_map_int_path_matches_f64():
    """The i32 readK map + skipped prob gather (device_arrays) computes
    the same (readK, prob) as the plain f64 maps on every raw value."""
    import numpy as np
    import jax.numpy as jnp

    from merfin_tpu.score.kstar import ProbTable
    from merfin_tpu.score.value_map import ValueMap

    prob = ProbTable(np.asarray([1, 1, 2], np.uint32),
                     np.asarray([0.9, 0.8, 0.7]))
    for pt in (None, prob):
        for exact in (False, True):
            vm = ValueMap(12.0, pt, 500, exact_max=exact)
            arrays = (jnp.asarray(vm.read_k_host.astype(np.int32)),
                      jnp.asarray(vm.prob_host))
            v = jnp.asarray(np.arange(0, 1300, dtype=np.uint64))
            rk, pr, over = vm.lookup_jnp(v, arrays)
            f64 = (jnp.asarray(vm.read_k_host), jnp.asarray(vm.prob_host))
            rk2, pr2, over2 = vm.lookup_jnp(v, f64)
            np.testing.assert_array_equal(np.asarray(rk), np.asarray(rk2))
            np.testing.assert_array_equal(
                np.broadcast_to(np.asarray(pr), v.shape),
                np.broadcast_to(np.asarray(pr2), v.shape))
            assert int(over) == int(over2)
