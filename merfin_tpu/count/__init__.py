from merfin_tpu.count.counter import count_sequences, count_files  # noqa: F401
