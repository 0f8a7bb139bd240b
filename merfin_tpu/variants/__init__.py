from merfin_tpu.variants.enumerate import enumerate_paths, VarPath  # noqa: F401
