"""Per-step wall-clock profile of the gANN derived-corpus audit chains
(the three first-toucher builds the bench charges to the r14 cohort:
eval_graph_ann_recall_clustered, similarity_ann_graph_upsert,
eval_graph_upsert_recall). Each step is a materialized scratch build or
a driver cache fill; timing them in dependency order in a fresh session
attributes the audit's first-execution seconds to its components
(optimization guide §1 — measure before touching).

Usage: python scripts/gann_build_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from lakeview_spark import get_spark
    from lakeview_spark.plans import QUERIES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("gann-profile", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["pricing_summary"](spark, sf_dir).count()  # JVM warm

    from lakeview_spark.operators.materialize import materialized
    from lakeview_spark.pipeline import similarity as S

    steps: dict[str, float] = {}

    def step(name, fn):
        t0 = time.time()
        out = fn()
        steps[name] = round(time.time() - t0, 3)
        print(f"{steps[name]:7.3f}  {name}", flush=True)
        return out

    # ---- clustered audit chain ----
    cdir = step("clustered: derive+write corpus", lambda: S._clustered_corpus_dir(spark, sf_dir))
    step("clustered: corpus_n", lambda: S.corpus_n(spark, cdir))
    step("clustered: planes", lambda: S._plane_vectors(spark, cdir))
    step("clustered: lsh_bucketed", lambda: S._lsh_bucketed(spark, cdir).count())
    step(
        "clustered: coarse parts",
        lambda: S._ivfpq_coarse_parts(spark, cdir, S._pq_emb(spark, cdir))[1].count(),
    )
    step(
        "clustered: gann_edges",
        lambda: materialized(spark, "gann_edges", cdir, S._gann_edges).count(),
    )
    step("clustered: final beam (entries+rounds+rerank)", lambda: S._gann_final_beam(spark, cdir).count())
    step(
        "clustered: recall audit (truth+join)",
        lambda: QUERIES["eval_graph_ann_recall_clustered"](spark, sf_dir).count(),
    )

    # ---- upsert attach chain ----
    bdir = step("upsert: base corpus write", lambda: S._gann_base_dir(spark, sf_dir))
    step("upsert: base lsh_bucketed", lambda: S._lsh_bucketed(spark, bdir).count())
    step(
        "upsert: base coarse parts",
        lambda: S._ivfpq_coarse_parts(spark, bdir, S._pq_emb(spark, bdir))[1].count(),
    )
    step("upsert: attach edges", lambda: QUERIES["similarity_ann_graph_upsert"](spark, sf_dir).count())
    step("upsert: base gann_edges", lambda: materialized(spark, "gann_edges", bdir, S._gann_edges).count())
    step("upsert: recall (gplus+search+truth)", lambda: QUERIES["eval_graph_upsert_recall"](spark, sf_dir).count())

    print(json.dumps({"sf_dir": sf_dir, "steps": steps, "total": round(sum(steps.values()), 3)}))


if __name__ == "__main__":
    main()
