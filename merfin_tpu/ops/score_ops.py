"""Device-side K*/QV scoring math — jnp twin of merfin_tpu.score.kstar.

Float64 throughout so accumulations track the reference's C++ doubles.
Tests assert numpy/jnp agreement on randomized inputs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from merfin_tpu.score.kstar import ProbTable


def prob_table_arrays(prob_table: ProbTable | None):
    """Device-constant arrays for the -prob override (padded to >=1)."""
    if prob_table is None or len(prob_table) == 0:
        return (jnp.zeros(1, jnp.uint64), jnp.ones(1, jnp.float64), 0)
    return (
        jnp.asarray(prob_table.copy_k.astype(np.uint64)),
        jnp.asarray(prob_table.copy_p),
        len(prob_table),
    )


def get_k_jnp(seq_value, asm_value, peak: float, copy_k, copy_p, table_len: int):
    """getK (merfin-globals.C:66-98), elementwise on device.

    seq_value/asm_value: uint64 raw DB values.
    Returns (readK, asmK, prob) float64.
    """
    v = seq_value.astype(jnp.float64)
    asm_k = asm_value.astype(jnp.float64)

    if peak != 0:
        ratio = v / peak
    else:
        ratio = jnp.where(v > 0, jnp.inf, 0.0)
    read_k = jnp.floor(ratio + 0.5)          # C round(): half away from zero, v>=0
    read_k = jnp.where(v < peak, 1.0, read_k)
    read_k = jnp.where(v == 0, 0.0, read_k)
    prob = jnp.ones_like(read_k)

    if table_len > 0:
        iv = seq_value.astype(jnp.int64)
        in_table = (iv > 0) & (iv <= table_len)
        idx = jnp.clip(iv - 1, 0, table_len - 1)
        read_k = jnp.where(in_table, copy_k[idx].astype(jnp.float64), read_k)
        prob = jnp.where(in_table, copy_p[idx], prob)
    return read_k, asm_k, prob


def k_metric_jnp(read_k, asm_k):
    """getKmetric (merfin-globals.H:248-261)."""
    under = -(asm_k / read_k - 1.0)
    over = read_k / asm_k - 1.0
    out = jnp.where(asm_k > read_k, under, jnp.where(asm_k < read_k, over, 0.0))
    return jnp.where(read_k == 0, 0.0, out)
