from merfin_tpu.kcore.pack import (  # noqa: F401
    encode_bases,
    kmers_from_codes_np,
    canonical_np,
    revcomp_np,
)
