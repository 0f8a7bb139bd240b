from merfin_tpu.ops.kmer_ops import kmer_windows  # noqa: F401
from merfin_tpu.ops.score_ops import get_k_jnp, k_metric_jnp  # noqa: F401
