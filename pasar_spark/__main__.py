import sys

from pasar_spark.cli import main

sys.exit(main())
