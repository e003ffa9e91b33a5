from svt_av1_psy_tpu.app.cli import main

raise SystemExit(main())
