from merfin_tpu.cli import main

raise SystemExit(main())
