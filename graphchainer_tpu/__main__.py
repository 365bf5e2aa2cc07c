from graphchainer_tpu.cli import main

raise SystemExit(main())
