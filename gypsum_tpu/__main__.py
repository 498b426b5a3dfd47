from gypsum_tpu.cli import main

raise SystemExit(main())
