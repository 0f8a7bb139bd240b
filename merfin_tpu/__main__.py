from merfin_tpu.cli import main

# __main__ guard required: -threads uses spawned worker processes, which
# re-import this module under a different __name__
if __name__ == "__main__":
    raise SystemExit(main())
