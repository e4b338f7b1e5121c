import sys

from cdc_lite_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
