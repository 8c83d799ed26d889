from dudb_spark.cli import main

raise SystemExit(main())
