#!/usr/bin/env python
"""spark-submit entrypoint: the package arrives via --py-files, so this
file only parses args and delegates (the reference CLI equivalent for the
cluster job, SURVEY.md §2a)."""

import sys

from go_readability_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(["extract", *sys.argv[1:]]))
