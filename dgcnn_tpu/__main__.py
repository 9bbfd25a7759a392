from dgcnn_tpu.cli import main

raise SystemExit(main())
