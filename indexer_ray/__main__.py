from indexer_ray.cli import main

raise SystemExit(main())
