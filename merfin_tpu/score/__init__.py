from merfin_tpu.score.kstar import (  # noqa: F401
    ProbTable,
    get_k_np,
    k_metric_np,
    histo_qv,
    hist_bin_np,
)
