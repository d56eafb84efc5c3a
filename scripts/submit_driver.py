"""spark-submit entry point: the engine CLI under a submitted master.

Usage (see scripts/submit_demo.sh):

    spark-submit --master local-cluster[2,4,4096] \
        --py-files pasar_spark.zip scripts/submit_driver.py \
        ingest --table /lake/transcripts --wal /wal

The session factory detects the submit gateway and inherits the
submitted --master/--conf instead of forcing a local one.
"""

import sys

from pasar_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
