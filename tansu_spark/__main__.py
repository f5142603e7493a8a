from tansu_spark.cli import main

raise SystemExit(main())
