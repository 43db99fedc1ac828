"""Steady-state per-query profiler: prewarm the shared scratch tables,
then time every registered query once at the given SF and print a
sorted table. The bench (bench.py) is the gate; this is the hot-spot
hunt behind it (BASELINE.md perf notes reference its output).

Usage: python scripts/profile_queries.py [sf_dir] [top_n]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from lakeview_spark.plans import QUERIES  # noqa: E402
from lakeview_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    spark = get_spark("lakeview-profile", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    from lakeview_spark.pipeline import prewarm_scratch

    prewarm_scratch(spark, sf_dir, include_clusters=True)

    times: dict[str, object] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
            times[name] = round(time.time() - t0, 2)
        except Exception as exc:  # noqa: BLE001
            times[name] = f"ERR {type(exc).__name__}: {exc}"[:100]

    ordered = sorted(
        times.items(),
        key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 999.0),
    )
    if top_n:
        ordered = ordered[:top_n]
    for name, t in ordered:
        print(f"{t:>8}  {name}")
    errs = [n for n, t in times.items() if not isinstance(t, float)]
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
