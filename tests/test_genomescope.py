"""GenomeScope-style fit: recover parameters from a synthetic NB mixture
histogram and produce a sane -prob lookup table."""

import numpy as np
import pytest

from merfin_tpu.tools.genomescope import (
    dnbinom, model_4peak, fit_histogram, lookup_table, write_lookup_table,
)
from merfin_tpu.io.prob import load_prob_table


def test_dnbinom_matches_closed_form():
    # NB(size, mu): pmf(0) = (size/(size+mu))^size
    size, mu = 5.0, 30.0
    p0 = dnbinom(np.asarray([0.0]), size, mu)[0]
    assert p0 == pytest.approx((size / (size + mu)) ** size, rel=1e-12)
    # sums to ~1 over a wide range
    xs = np.arange(0, 2000)
    assert dnbinom(xs, size, mu).sum() == pytest.approx(1.0, abs=1e-9)


@pytest.fixture(scope="module")
def synthetic():
    # diploid genome: kcov=30, het=0.4%, d=5%, bias=0.6, length=2e6
    true = dict(d=0.05, r=0.004, kmercov=30.0, bias=0.6, length=2e6)
    k = 21
    x = np.arange(1, 300, dtype=np.float64)
    y, _ = model_4peak(x, true["d"], true["r"], true["kmercov"],
                       true["bias"], true["length"], k)
    # sequencing-error kmers at low multiplicity
    y = y + 3e6 * np.exp(-x / 1.5)
    hist = np.stack([x, np.round(y)], axis=1)
    # append an overflow row (the loader drops the last row)
    hist = np.vstack([hist, [300.0, 12345.0]])
    return hist, k, true


def test_fit_recovers_parameters(synthetic):
    hist, k, true = synthetic
    fit = fit_histogram(hist, k, ploidy=2, log=_Null())
    assert fit is not None
    assert fit.kmercov == pytest.approx(true["kmercov"], rel=0.05)
    assert fit.length == pytest.approx(true["length"], rel=0.15)
    assert fit.d == pytest.approx(true["d"], abs=0.05)


def test_lookup_table_shape_and_semantics(synthetic, tmp_path):
    hist, k, true = synthetic
    fit = fit_histogram(hist, k, ploidy=2, log=_Null())
    rows = lookup_table(hist, fit)
    assert len(rows) == int(fit.kmercov * 5) - 1
    # low multiplicity -> copy 0 (error) with high prob
    assert rows[0][0] == 0 and rows[0][1] > 0.9
    # at kcov*2 (homozygous peak) -> copy 1... no: copy index: comps are
    # 1x..4x coverage; multiplicity ~2*kcov is the 2x component = readK 2
    at_2x = rows[int(2 * true["kmercov"]) - 1]
    assert at_2x[0] == 2
    # near kcov -> readK 1
    at_1x = rows[int(true["kmercov"]) - 1]
    assert at_1x[0] == 1

    # file round-trips through the merfin -prob loader
    p = tmp_path / "lut.txt"
    write_lookup_table(str(p), rows)
    table = load_prob_table(str(p), log=_Null())
    assert len(table) == len(rows)
    assert int(table.copy_k[int(true["kmercov"]) - 1]) == 1


class _Null:
    def write(self, *_):
        pass

    def flush(self):
        pass
