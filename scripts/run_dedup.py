#!/usr/bin/env python
"""spark-submit driver shim — the file you pass to spark-submit (the code
itself ships via --py-files lsh_qd_spark.zip):

    spark-submit --py-files lsh_qd_spark.zip scripts/run_dedup.py --help
"""

from lsh_qd_spark.cli import main

if __name__ == "__main__":
    main()
