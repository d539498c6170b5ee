from cyberether_tpu.cli import main

raise SystemExit(main())
