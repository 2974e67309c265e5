"""Run the full oracle comparison under a VANILLA SparkSession —
no data_frame_spark session defaults — simulating the driver's own
session (ANSI on, host timezone). Catches any query whose result
depends on our session configuration.

    python tools/check_vanilla.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import tools.check_oracle as chk


def main():
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("vanilla-check")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # monkey-patch get_spark so check_oracle uses the vanilla session
    chk.get_spark = lambda *a, **k: spark
    chk.main(sys.argv[1:])


if __name__ == "__main__":
    main()
