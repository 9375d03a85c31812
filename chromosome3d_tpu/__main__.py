from chromosome3d_tpu.cli import main

raise SystemExit(main())
