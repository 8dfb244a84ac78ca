from fuel_spark.cli import main

raise SystemExit(main())
