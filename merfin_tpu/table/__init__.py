from merfin_tpu.table.lookup import DeviceLookup, HostLookup, build_lookup  # noqa: F401
