"""spark-submit entry point for the crawl (north-rule launch shape).

The engine ships to executors as a zip via ``--py-files`` — no
install step on the cluster:

    cd <repo> && zip -qr /tmp/cuphic_spark.zip cuphic_spark
    spark-submit --master local[8] \\
        --py-files /tmp/cuphic_spark.zip \\
        scripts/submit_crawl.py --universe 100000 --seeds 64 \\
        --waves 3 --checkpoint-dir /tmp/crawl_submit

On a real cluster swap ``--master`` for YARN/K8s; everything else is
identical (the session factory only sets master when none is
configured). Smoke-tested by tests/test_submit.py.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    # Executors resolve cuphic_spark from the --py-files zip; the
    # driver resolves it from the zip too (spark-submit prepends it
    # to sys.path), so this script has no repo-path assumptions.
    from cuphic_spark.frontier.crawl import _main

    _main()


if __name__ == "__main__":
    main()
