from mcpvectordb_spark.cli import main

raise SystemExit(main())
