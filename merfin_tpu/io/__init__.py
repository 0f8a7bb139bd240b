from merfin_tpu.io.fasta import SeqFile, Sequence  # noqa: F401
from merfin_tpu.io.prob import load_prob_table  # noqa: F401
from merfin_tpu.io.mkdb import KmerDB  # noqa: F401
