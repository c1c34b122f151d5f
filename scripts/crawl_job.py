"""The ``spark-submit`` job entry point (north-rule shipping shape).

    spark-submit --master <cluster> \
        --py-files sparkcrawler.zip \
        scripts/crawl_job.py <seed-url> --out /path/state [...]

Everything the job needs lives in the zip: this file only parses args
and delegates to :func:`sparkcrawler.cli.main`, proving the engine is
importable from ``--py-files`` alone on driver and executors (the
pandas/Arrow UDF bodies deserialize inside executor python workers,
which resolve ``sparkcrawler.*`` from the shipped zip). In cluster
deploy-mode the same invocation works unchanged — there is no
repo-checkout dependency.

Build the zip with ``python scripts/make_pyfiles.py``.
"""

import sys

from sparkcrawler.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
