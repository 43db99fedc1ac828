"""Pinned steady-state timing protocol (r9 VERDICT next-3): N
alternating readings of one or more queries in ONE session, after the
exact prewarm bench.py's extended section uses, printed individually —
never a single cherry-picked A/B.

The r9 dedup_semdedup dispute was a reproducibility gap: BASELINE.md
recorded 2.0-2.5 s from a two-reading A/B while the judge's two
readings were 3.4-4.1 s. The protocol differences that can explain a
~1.5x spread, all controlled here:

- host quiet or not (CLAUDE.md: the first bench after heavy work reads
  +20%; canary queries below give the same contention signal bench.py
  readings are adjudicated with);
- what shares the session (the r9 trained-PQ scratch etc.): this
  script prewarms exactly like bench.py (prewarm_scratch with
  include_clusters=True) and runs NOTHING else;
- single-reading luck: N>=5 alternating readings per query, all
  recorded; the BAND is [min, max] of the readings, the steady claim
  is the MEDIAN.

Usage: python scripts/steady_readings.py [sf_dir] [N] [query ...]
Defaults: /root/testdata/sf0.1, N=6, dedup_semdedup alternated with
the two contention canaries (text_token_count, multimodal_metadata).
Prints one JSON line with every reading in order.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from lakeview_spark import get_spark
    from lakeview_spark.pipeline import prewarm_scratch
    from lakeview_spark.plans import QUERIES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    names = sys.argv[3:] or ["dedup_semdedup"]
    canaries = ["text_token_count", "multimodal_metadata"]

    spark = get_spark("steady-readings", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["pricing_summary"](spark, sf_dir).count()  # JVM/footer warm
    prewarm_scratch(spark, sf_dir, include_clusters=True)

    readings: dict[str, list[float]] = {q: [] for q in names + canaries}
    for i in range(n):
        # alternate: canaries between target readings, same order each
        # round, so every target reading sees the same neighborhood
        for q in names + canaries:
            t0 = time.time()
            QUERIES[q](spark, sf_dir).count()
            readings[q].append(round(time.time() - t0, 3))
    med = {q: sorted(v)[len(v) // 2] for q, v in readings.items()}
    print(
        json.dumps(
            {
                "protocol": "steady_readings",
                "sf_dir": sf_dir,
                "n": n,
                "readings": readings,
                "median": med,
                "band": {q: [min(v), max(v)] for q, v in readings.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
