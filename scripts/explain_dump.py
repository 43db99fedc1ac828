"""Dump .explain("formatted") for the named queries to plans/r{N}/
<query>_<tag>.txt — the judge-checkable plan evidence for an
optimization round (the OPTIMIZATION_r{N}.md deliverable).

Usage: python scripts/explain_dump.py <round> <tag> <query> [query ...]
e.g.   python scripts/explain_dump.py 14 before kmeans_train eval_pq_recall

Runs at sf0.1 by default (SPARK_GRAFT_SF_DIR overrides) with the same
session shape as bench.py, prewarm untimed so the plan reflects the
steady (scratch-backed) lineage the bench measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    rnd = sys.argv[1]
    tag = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from lakeview_spark.plans import QUERIES
    from lakeview_spark.session import get_spark

    spark = get_spark("lakeview-explain", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    from lakeview_spark.pipeline import prewarm_scratch

    prewarm_scratch(spark, sf_dir, include_clusters=True)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain(formatted) at {sf_dir} [{tag}]\n")
            fh.write(txt)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
