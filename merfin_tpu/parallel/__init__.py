from merfin_tpu.parallel.sharded import ShardedLookup, make_mesh  # noqa: F401
