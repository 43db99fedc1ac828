"""Driver-checkable twins of the streaming ingestion operators.

The streaming layer (streaming/pipeline_stream.py) was the only operator
family without driver CORRECTNESS rows — its tests are batch-equivalence
pytest assertions only (VERDICT r03 §next-8). These registry entries run
the REAL Structured Streaming operators (same functions, not batch
re-implementations) to completion with Trigger.AvailableNow into a
memory sink and return the result as a batch DataFrame, so the driver
can hash-compare them against a DuckDB oracle like any other query.

Determinism notes (why these are oracle-exact):
- each testdata table is ONE parquet file, so AvailableNow processes it
  as ONE micro-batch: no cross-batch watermark races, no late drops.
  (Under a multi-file layout — bench --split-files — the source streams
  the table DIRECTORY via _table_stream; all parts still land in one
  micro-batch because AvailableNow takes every available file when no
  maxFilesPerTrigger is set. Correctness rows always run the
  single-file driver layout.)
- session_window emission under AvailableNow is deterministic: the
  post-data no-data batch advances the watermark to max(ts) - delay and
  flushes every session with end <= watermark (verified empirically,
  including the end == watermark tie, which IS emitted).
- dropDuplicatesWithinWatermark keeps an arbitrary FIRST row per key,
  so its twin projects to the key column only — the surviving key SET
  is deterministic even though the surviving row is not.
- windowed counts/sums of integers are order-independent.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeview_spark.plans.registry import events_ts_us, register, t
from lakeview_spark.streaming.pipeline_stream import (
    stream_classifier_gate,
    stream_curation_funnel,
    stream_document_dedup,
    stream_event_sessions,
    stream_embedding_neardup,
    stream_interval_join,
    stream_quality_filter,
    stream_token_stats,
)

_SINK_IDS = itertools.count()

# ingest_ts synthesis for the documents table (which has no event-time
# column): BASE + (doc_id % 120) minutes — a deterministic 2-hour spread
# aligned to the 10-minute window grid. 2026-03-01T00:00:00Z in micros.
_BASE_US = 1772323200000000
_BASE_SQL = "epoch_us(TIMESTAMP '2026-03-01 00:00:00')"
_SPREAD_MIN = 120


# State-store partition count for the AvailableNow twins. Streaming
# state is HASH-PARTITIONED BY KEY, so results are partition-count
# independent — but every stateful operator materializes one state
# store (checkpoint dir + provider + commit) PER partition PER
# micro-batch, so the single-micro-batch twins pay pure overhead for
# partitions beyond the key cardinality. Measured at sf0.1 (r10):
# stream_interval_join 16.2 s at the batch session's 32 partitions vs
# 3.2 s at 8 / 2.2 s at 4; outputs bit-identical (the oracle gate).
# On a real cluster this is the number you SIZE to state volume; 8
# keeps local runs honest without starving multi-operator chains.
_STREAM_SHUFFLE_PARTITIONS = "8"


def _run_available_now(result: DataFrame, output_mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a
    memory sink and return the sink contents as a batch DataFrame. The
    sink name is unique per call so repeated runs in one session (parity
    test + driver + bench) never collide. The session's shuffle
    partitions are pinned to _STREAM_SHUFFLE_PARTITIONS for the
    (synchronous) run and restored after — the twins run to completion
    inside this call, so the batch session never plans under the
    override."""
    spark = result.sparkSession
    name = f"stream_twin_sink_{next(_SINK_IDS)}"
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _STREAM_SHUFFLE_PARTITIONS)
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    return spark.table(name)


def _table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``<name>.parquet`` as a file-source stream (schema borrowed from
    the batch read). The file source wants a DIRECTORY, and the table
    ships in two layouts:

    - single file ``<sf_dir>/<name>.parquet`` (driver testdata):
      stream ``sf_dir`` with a pathGlobFilter on the leaf name;
    - directory of part files (bench --split-files rewrites, real
      deployments): stream the directory itself — pathGlobFilter
      matches LEAF file names only, so the single-file glob would
      match ZERO part files and silently time an empty stream
      (r7 ADVICE, verified empirically).

    The dispatch is a local os.path check because the testdata/bench
    layouts are local; on an object store a deployment streams the
    table directory directly (the second branch)."""
    import os

    schema = t(spark, sf_dir, name).schema
    path = os.path.join(sf_dir, f"{name}.parquet")
    reader = spark.readStream.schema(schema)
    if os.path.isdir(path):
        return reader.parquet(path)
    return reader.option("pathGlobFilter", f"{name}.parquet").parquet(sf_dir)


def _doc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a file-source stream with synthesized
    event time."""
    stream = _table_stream(spark, sf_dir, "documents")
    return stream.withColumn(
        "ingest_ts",
        F.timestamp_micros(
            F.lit(_BASE_US) + (F.col("doc_id") % _SPREAD_MIN) * F.lit(60_000_000)
        ),
    )


@register(
    "stream_event_sessions",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
    mx AS (SELECT max(ts_us) AS max_us FROM e),
    lagged AS (
      SELECT user_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                  > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    sess AS (
      SELECT user_id, ts_us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagged
    ),
    agg AS (
      SELECT user_id, sid, min(ts_us) AS session_start_us,
             max(ts_us) + 1800000000 AS session_end_us,
             count(*) AS events
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, session_start_us,
           session_end_us - session_start_us AS span_us, events
    FROM agg, mx WHERE session_end_us <= max_us - 3600000000
    """,
)
def stream_event_sessions_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window over the events stream (gap 30 min,
    watermark 1 h), run to completion with AvailableNow. Emitted
    sessions are exactly those whose end (last event + gap) is <= the
    final watermark (max ts - 1 h) — the oracle derives the same
    sessions with lag + running sum, which is also how the batch twin
    `events_sessionization` works (plans/tpch_extra.py)."""
    stream = _table_stream(spark, sf_dir, "events")
    e = stream.select(
        "user_id", F.timestamp_micros(events_ts_us(stream)).alias("ts")
    )
    sess = stream_event_sessions(e, gap="30 minutes", watermark_delay="1 hour")
    out = _run_available_now(sess, "append")
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        "span_us",
        "events",
    )


@register(
    "stream_doc_dedup",
    oracle="SELECT DISTINCT md5(text) AS text_hash FROM documents",
)
def stream_doc_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at ingestion (dropDuplicatesWithinWatermark on the
    text hash) run to completion. WHICH duplicate survives depends on
    arrival order, so the twin projects to the surviving key set —
    deterministically the distinct text hashes."""
    deduped = stream_document_dedup(_doc_stream(spark, sf_dir), "1 hour")
    out = _run_available_now(deduped, "append")
    return out.select("text_hash")


@register(
    "stream_token_stats",
    oracle=f"""
    SELECT lang,
           {_BASE_SQL} + ((doc_id % {_SPREAD_MIN}) * 60000000 // 600000000)
             * 600000000 AS window_start_us,
           count(*) AS docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
    FROM documents
    GROUP BY lang, window_start_us
    """,
)
def stream_token_stats_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (10 min) per-lang doc/token telemetry with a
    5-min watermark, update mode: one batch -> every open window emits
    exactly once, and integer counts/sums are order-independent, so the
    oracle is a plain GROUP BY on the synthesized window grid."""
    stats = stream_token_stats(_doc_stream(spark, sf_dir), "10 minutes", "5 minutes")
    out = _run_available_now(stats, "update")
    return out.select(
        "lang",
        F.unix_micros("window_start").alias("window_start_us"),
        "docs",
        "tokens",
    )


@register(
    "stream_quality_filter",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE len(string_split(text, ' ')) BETWEEN 40 AND 400
      AND len(list_filter(string_split(lower(text), ' '),
              x -> x IN ('the','and','of','to','a','in','is','it','for','on'))) >= 1
      AND len(list_distinct(string_split(lower(text), ' '))) * 3
            >= len(string_split(lower(text), ' '))
    """,
)
def stream_quality_filter_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless streaming curation stages (token range, stopword
    presence, distinct-token ratio) at ingestion — same predicates as
    `quality_filter_funnel` stages 1-3, so the oracle reuses its
    formulations."""
    filtered = stream_quality_filter(_doc_stream(spark, sf_dir))
    out = _run_available_now(filtered, "append")
    return out.select("doc_id", "lang")


def _bloom_prune_stream_oracle() -> str:
    """DuckDB replay of the streaming Bloom prune: the
    dedup_bloom_prune filter build + membership verdicts (same md5 +
    integer bit math), binned on the stream_token_stats window grid."""
    from lakeview_spark.pipeline.sketch import (
        _BLOOM_BITS_PER_DOC,
        _BLOOM_K,
        _BLOOM_MIN_BITS,
        _BLOOM_WORD,
    )

    half = "(SELECT count(*) // 2 FROM documents)"
    m = (
        f"(SELECT GREATEST({_BLOOM_MIN_BITS}, "
        f"{_BLOOM_BITS_PER_DOC} * (count(*) // 2)) FROM documents)"
    )
    pos = f"(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || fp), 1, 8))::BIGINT % {m})"
    return f"""
    WITH d AS (SELECT doc_id, lang, md5(text) AS fp FROM documents),
    seen AS (SELECT fp FROM d WHERE doc_id < {half}),
    positions AS (
      SELECT {pos} AS pos
      FROM seen, (SELECT unnest(range(0, {_BLOOM_K})) AS i)
    ),
    bits AS (
      SELECT pos // {_BLOOM_WORD} AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % {_BLOOM_WORD} AS INT)) AS bset
      FROM positions GROUP BY pos // {_BLOOM_WORD}
    ),
    inc AS (SELECT doc_id, lang, fp FROM d WHERE doc_id >= {half}),
    probes AS (
      SELECT doc_id, {pos} AS pos
      FROM inc, (SELECT unnest(range(0, {_BLOOM_K})) AS i)
    ),
    hits AS (
      SELECT p.doc_id, count(*) AS n_hit
      FROM probes p JOIN bits b ON b.word = p.pos // {_BLOOM_WORD}
      WHERE (b.bset & (CAST(1 AS BIGINT) << CAST(p.pos % {_BLOOM_WORD} AS INT))) <> 0
      GROUP BY p.doc_id
    ),
    verdicts AS (
      SELECT i.doc_id, i.lang,
             CASE WHEN coalesce(h.n_hit, 0) = {_BLOOM_K} THEN 1 ELSE 0 END
               AS maybe_seen
      FROM inc i LEFT JOIN hits h USING (doc_id)
    )
    SELECT lang,
           {_BASE_SQL} + ((doc_id % {_SPREAD_MIN}) * 60000000 // 600000000)
             * 600000000 AS window_start_us,
           CAST(count(*) AS BIGINT) AS n_incoming,
           CAST(sum(maybe_seen) AS BIGINT) AS n_maybe_seen,
           CAST(count(*) - sum(maybe_seen) AS BIGINT) AS n_definitely_new
    FROM verdicts GROUP BY lang, window_start_us
    """


@register("stream_bloom_prune", oracle=_bloom_prune_stream_oracle())
def stream_bloom_prune_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch stream-static composition (r9): batch-build
    the Bloom filter over the already-ingested half of the corpus
    (doc_id < n/2 — the dedup_bloom_prune framing), collect its m/32
    bit_or-packed words (sketch-sized driver state: 2 bytes per seen
    doc), then run the REAL streaming operator over the arriving half —
    per-row membership verdicts against the broadcast word array, live
    (window, lang) bins of maybe-seen vs definitely-new in update mode
    (one batch -> every open window emits exactly once; integer counts
    are order-independent)."""
    from lakeview_spark.pipeline.similarity import corpus_n
    from lakeview_spark.pipeline.sketch import (
        _BLOOM_BITS_PER_DOC,
        _BLOOM_K,
        _BLOOM_MIN_BITS,
        _BLOOM_WORD,
        _bloom_pos_spark,
    )
    from lakeview_spark.streaming.pipeline_stream import stream_bloom_prune

    n = corpus_n(spark, sf_dir, "documents")
    half = n // 2
    m = max(_BLOOM_MIN_BITS, _BLOOM_BITS_PER_DOC * half)
    seen = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < half)
        .select(F.md5("text").alias("fp"))
    )
    rows = (
        seen.select(
            F.explode(
                F.array(
                    *[_bloom_pos_spark(i, F.col("fp"), m) for i in range(_BLOOM_K)]
                )
            ).alias("pos")
        )
        .groupBy(F.expr(f"pos div {_BLOOM_WORD}").alias("word"))
        .agg(
            F.expr(
                f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BLOOM_WORD} AS INT)))"
            ).alias("bset")
        )
        .collect()
    )
    words = [0] * ((m + _BLOOM_WORD - 1) // _BLOOM_WORD)
    for r in rows:
        words[r.word] = r.bset
    inc = _doc_stream(spark, sf_dir).filter(F.col("doc_id") >= half)
    binned = stream_bloom_prune(inc, words, m)
    out = _run_available_now(binned, "update")
    return out.select(
        "lang",
        F.unix_micros("window_start").alias("window_start_us"),
        "n_incoming",
        "n_maybe_seen",
        "n_definitely_new",
    )


# the streaming delta: every 20th vector "re-arrives" and is checked
# against the full persisted index
_DELTA_MOD = 20


def _neardup_oracle() -> str:
    from lakeview_spark.pipeline.similarity import (
        _DOT_SQL,
        _NEAR_DUP_COSINE,
        _NORM_SQL,
        _PLANES_SQL,
    )

    cos = (
        _DOT_SQL.format(a="a.embedding", b="b.embedding")
        + f" / ({_NORM_SQL.format(a='a.embedding')} * {_NORM_SQL.format(a='b.embedding')})"
    )
    return f"""
    WITH planes AS ({_PLANES_SQL}),
    bits AS (
      SELECT e.vec_id, e.embedding, p.plane_id,
             CASE WHEN {_DOT_SQL.format(a="e.embedding", b="p.pe")} > 0 THEN 1 ELSE 0 END AS bit
      FROM embeddings e, planes p
    ),
    bucketed AS (
      SELECT vec_id, any_value(embedding) AS embedding,
             CAST(sum(bit * (1 << (plane_id - 1))) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id
    )
    SELECT a.vec_id AS delta_vec, b.vec_id AS index_vec, {cos} AS cosine
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    WHERE a.vec_id % {_DELTA_MOD} = 0 AND {cos} >= {_NEAR_DUP_COSINE}
    """


@register("stream_embedding_neardup", oracle=_neardup_oracle())
def stream_embedding_neardup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static near-dup: arriving embeddings (every 20th vector
    as the delta stream) bucket-joined against the persisted LSH index
    (`_lsh_bucketed` materialized parquet) and cosine-verified — the
    incremental-ingest twin of `dedup_embedding_cosine`, exercised
    through the real stream-static join. The delta computes its bucket
    with the SAME literal-plane expression the index used, so the two
    sides agree bit-for-bit and the oracle replays the batch bucket
    CTE with a delta-side filter."""
    from lakeview_spark.pipeline.similarity import (
        _NEAR_DUP_COSINE,
        _lsh_bucketed,
        _plane_vectors,
    )

    stream = _table_stream(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % _DELTA_MOD == 0
    )
    indexed = _lsh_bucketed(spark, sf_dir)
    planes = _plane_vectors(spark, sf_dir)
    pairs = stream_embedding_neardup(
        stream, indexed, planes, threshold=_NEAR_DUP_COSINE
    ).filter(F.col("delta_vec") != F.col("index_vec"))
    return _run_available_now(pairs, "append")


def _proximity_oracle() -> str:
    # the twin verifies against the BATCH query's exact oracle — one
    # shared definition, so the two can never drift
    from lakeview_spark.plans.tpch_extra import PROXIMITY_ORACLE_SQL

    return PROXIMITY_ORACLE_SQL


@register("stream_error_proximity", oracle=_proximity_oracle())
def stream_error_proximity_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded range join under Structured Streaming: errors arrive
    as a stream and are banded-joined (stream-static, stateless) against
    the static click/view candidates; the emitted pair stream is then
    aggregated in batch to the same per-error shape — and the SAME
    oracle — as the batch `events_error_proximity`. Zero-match errors
    are restored with a batch left join, exactly like the batch twin.
    Proves the range-join template survives the ingestion path, not
    just the backfill."""
    from lakeview_spark.plans.tpch_extra import _PROX_US

    batch = t(spark, sf_dir, "events")
    stream = _table_stream(spark, sf_dir, "events")
    err_stream = stream.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        events_ts_us(stream).alias("err_us"),
    )
    cand = (
        batch.filter(F.col("event_type").isin("click", "view"))
        .select(
            "user_id",
            events_ts_us(batch).alias("cand_us"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .withColumn("band", F.expr(f"cand_us div {_PROX_US}"))
    )
    from lakeview_spark.streaming.pipeline_stream import stream_error_proximity

    pairs = stream_error_proximity(err_stream, cand, _PROX_US)
    sink = _run_available_now(pairs, "append")
    agg = sink.groupBy("err_id").agg(
        F.count("*").alias("n_nearby"), F.sum("v").alias("sum_v")
    )
    # distinct for the same duplicated-event_id reason as the batch
    # query: the oracle GROUPs BY event_id
    errors = (
        batch.filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("err_id"))
        .distinct()
    )
    return errors.join(agg, "err_id", "left").select(
        F.col("err_id").alias("event_id"),
        F.coalesce(F.col("n_nearby"), F.lit(0)).cast("bigint").alias("n_nearby"),
        F.coalesce(F.col("sum_v").cast("double"), F.lit(0.0)).alias("nearby_value"),
    )


# CUSUM reference distribution: the production operator closes over
# batch-published per-type (mean, std) moments; the twin PINS them to
# one published constant pair so the oracle is a pure ordered fold with
# no float mean/stddev computation anywhere (sums of doubles are
# order-dependent; constants are not). (50, 50) is the corpus's rough
# per-type scale, so z-scores are O(1) and alerts fire on genuine
# high-value runs rather than on every row.
_CUSUM_TYPES = ("click", "error", "purchase", "signup", "view")
_CUSUM_MEAN = 50.0
_CUSUM_SD = 50.0


def _cusum_oracle() -> str:
    from lakeview_spark.streaming.stateful import CUSUM_H, CUSUM_K

    types = ", ".join(f"'{t}'" for t in _CUSUM_TYPES)
    # Field order inside the fold struct is load-bearing: DuckDB's
    # list_reduce rebinds struct fields SEQUENTIALLY, so a field
    # expression written after `s_pos := ...` that mentions `acc.s_pos`
    # sees the NEW value, not the accumulator's (observed on 1.0.0 —
    # the alerts counter read the post-update chart and over-fired).
    # Ordering the fields so every acc.* reference precedes that
    # field's own rebinding (alerts first, then s_pos/s_neg, then the
    # no-acc fields) is correct under BOTH sequential and simultaneous
    # lambda semantics.
    zero = (
        "struct_pack(alerts := CAST(0 AS BIGINT), "
        "s_pos := CAST(0 AS DOUBLE), s_neg := CAST(0 AS DOUBLE), "
        "n := CAST(0 AS BIGINT), z := CAST(0 AS DOUBLE))"
    )
    # raw chart values before the reset-on-alarm; greatest/add/sub/div
    # are IEEE-exact given identical inputs, and the fold order (event
    # time, then event_id) is the exact replay order the stateful
    # operator sorts each micro-batch into. Every float field is CAST
    # to DOUBLE explicitly: a bare 0.0 literal is DECIMAL(2,1) in
    # DuckDB and the accumulator coerces to the element struct type,
    # which silently quantized the chart state until the casts.
    raw_pos = f"greatest(CAST(0 AS DOUBLE), acc.s_pos + x.z - {CUSUM_K})"
    raw_neg = f"greatest(CAST(0 AS DOUBLE), acc.s_neg - x.z - {CUSUM_K})"
    return f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS ts_us, event_id, value
      FROM events WHERE event_type IN ({types})
    ),
    lst AS (
      SELECT event_type,
             list(struct_pack(
                    alerts := CAST(0 AS BIGINT),
                    s_pos := CAST(0 AS DOUBLE), s_neg := CAST(0 AS DOUBLE),
                    n := CAST(0 AS BIGINT),
                    z := (value - CAST({_CUSUM_MEAN} AS DOUBLE))
                         / CAST({_CUSUM_SD} AS DOUBLE))
                  ORDER BY ts_us, event_id) AS xs
      FROM ev GROUP BY event_type
    ),
    folded AS (
      SELECT event_type,
             list_reduce(
               list_prepend({zero}, xs),
               (acc, x) -> struct_pack(
                  alerts := acc.alerts
                    + CASE WHEN {raw_pos} > {CUSUM_H} THEN 1 ELSE 0 END
                    + CASE WHEN {raw_neg} > {CUSUM_H} THEN 1 ELSE 0 END,
                  s_pos := CASE WHEN {raw_pos} > {CUSUM_H}
                                THEN CAST(0 AS DOUBLE) ELSE {raw_pos} END,
                  s_neg := CASE WHEN {raw_neg} > {CUSUM_H}
                                THEN CAST(0 AS DOUBLE) ELSE {raw_neg} END,
                  n := acc.n + 1,
                  z := x.z
               )) AS st
      FROM lst
    )
    SELECT event_type, st.s_pos AS s_pos, st.s_neg AS s_neg,
           st.n AS n_seen, st.alerts AS alerts_in_batch
    FROM folded
    """


@register("stream_value_cusum", oracle=_cusum_oracle())
def stream_value_cusum_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful CUSUM drift detector (applyInPandasWithState,
    streaming/stateful.py stream_value_cusum) run to completion under
    AvailableNow — the last streaming operator without a driver row
    (r6 verdict next-6). One micro-batch (single-file source), so the
    output is one end-of-batch chart state per event type, and the
    oracle replays the identical per-type fold in DuckDB: an explicit
    left fold (list_reduce over a struct accumulator, the Spark
    `aggregate` twin device from the cosine kernels) over z-scores in
    the operator's own replay order (ts, then event_id). Every step is
    IEEE-exact — subtract/divide/add/max with a pinned reference
    distribution — so the float chart state hashes identically; a
    data-derived mean/std would NOT be (double sums are
    order-dependent), which is why the twin pins the moments."""
    from lakeview_spark.streaming.stateful import stream_value_cusum

    stream = _table_stream(spark, sf_dir, "events")
    e = stream.filter(F.col("event_type").isin(*_CUSUM_TYPES)).select(
        "event_id",
        events_ts_us(stream).alias("ts_us"),
        "event_type",
        "value",
    )
    moments = {typ: (_CUSUM_MEAN, _CUSUM_SD) for typ in _CUSUM_TYPES}
    out = stream_value_cusum(e, moments)
    res = _run_available_now(out, "update")
    return res.select(
        "event_type",
        "s_pos",
        "s_neg",
        F.col("n_seen").cast("bigint").alias("n_seen"),
        F.col("alerts_in_batch").cast("bigint").alias("alerts_in_batch"),
    )


# pinned sketch geometry for the streaming histogram (see
# stream_value_histogram: a one-pass stream cannot derive min/max
# before binning, so edges are versioned constants — [0, 512) in
# width-4 bins covers the synthetic value range with clamp headroom)
_SVH_WIDTH = 4.0
_SVH_BINS = 128
_SVH_WIN_US = 6 * 3600 * 1000000  # 6-hour tumbling windows


@register(
    "stream_quantile_sketch",
    oracle=f"""
    WITH binned AS (
      SELECT epoch_us(ts) // {_SVH_WIN_US} * {_SVH_WIN_US} AS window_start_us,
             event_type,
             LEAST({_SVH_BINS - 1},
                   CAST(floor(value / {_SVH_WIDTH!r}) AS INT)) AS bin
      FROM events
    ),
    counts AS (
      SELECT window_start_us, event_type, bin, count(*) AS bin_count
      FROM binned GROUP BY window_start_us, event_type, bin
    ),
    cum AS (
      SELECT window_start_us, event_type, bin,
             sum(bin_count) OVER (PARTITION BY window_start_us, event_type
                                  ORDER BY bin ROWS UNBOUNDED PRECEDING)
               AS cum_count,
             sum(bin_count) OVER (PARTITION BY window_start_us, event_type)
               AS n_events
      FROM counts
    ),
    hit AS (
      SELECT window_start_us, event_type, bin, n_events,
             row_number() OVER (PARTITION BY window_start_us, event_type
                                ORDER BY bin) AS rn
      FROM cum WHERE cum_count * 2 >= n_events
    )
    SELECT window_start_us, event_type,
           CAST(n_events AS BIGINT) AS n_events,
           bin AS p50_bin,
           bin * {_SVH_WIDTH!r} AS p50_est
    FROM hit WHERE rn = 1
    """,
)
def stream_quantile_sketch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming histogram sketch run to completion (update mode:
    one micro-batch -> every open window emits once), then the p50
    readout as a batch post-pass over the sink — exactly how a live
    dashboard consumes the sketch table. The median rule is the
    integer-exact `2 * cum >= n` form (no doubles in the threshold), so
    the chosen bin is engine-identical; the estimate is the bin's lower
    edge on the PINNED grid."""
    from lakeview_spark.streaming.pipeline_stream import stream_value_histogram

    stream = _table_stream(spark, sf_dir, "events")
    e = stream.select(
        "event_type",
        "value",
        F.timestamp_micros(events_ts_us(stream)).alias("ts"),
    )
    hist = stream_value_histogram(
        e, "6 hours", "1 hour", bin_width=_SVH_WIDTH, n_bins=_SVH_BINS
    )
    out = _run_available_now(hist, "update")
    from pyspark.sql import Window as _W

    wcum = (
        _W.partitionBy("window_start", "event_type")
        .orderBy("bin")
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    wall = _W.partitionBy("window_start", "event_type")
    cum = out.withColumn("cum_count", F.sum("bin_count").over(wcum)).withColumn(
        "n_events", F.sum("bin_count").over(wall)
    )
    hit = cum.filter(F.col("cum_count") * 2 >= F.col("n_events"))
    wpick = _W.partitionBy("window_start", "event_type").orderBy("bin")
    return (
        hit.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            F.unix_micros("window_start").alias("window_start_us"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("bin").alias("p50_bin"),
            (F.col("bin") * F.lit(_SVH_WIDTH)).alias("p50_est"),
        )
    )


@register(
    "stream_interval_join",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
    )
    SELECT v.event_id AS view_id, c.event_id AS click_id,
           v.user_id, c.ts_us - v.ts_us AS gap_us
    FROM e v JOIN e c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts_us >= v.ts_us
     AND c.ts_us <= v.ts_us + CAST(21600000000 AS BIGINT)
    """,
)
def stream_interval_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real STREAM-STREAM interval join (view->click attribution
    within 6 h, watermarks on both sides) run to completion under
    AvailableNow. Both sides read the same events file stream; inner
    join in append mode emits every matched pair exactly once, and with
    the whole table in one micro-batch no pair is watermark-dropped, so
    the emitted set equals the batch interval join — which is exactly
    the oracle. gap_us is integer micros (exact in both engines)."""
    stream = _table_stream(spark, sf_dir, "events")
    base = stream.select(
        "event_id",
        "user_id",
        F.timestamp_micros(events_ts_us(stream)).alias("ts"),
        "event_type",
    )
    views = base.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    clicks = base.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    joined = stream_interval_join(
        views, clicks, max_gap="6 hours", watermark_delay="1 hour"
    )
    out = _run_available_now(joined, "append")
    return out.select(
        "view_id",
        "click_id",
        F.col("view_user").alias("user_id"),
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


@register(
    "stream_interval_join_outer",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
    ),
    v AS (SELECT event_id AS view_id, user_id, ts_us FROM e WHERE event_type = 'view'),
    c AS (SELECT event_id AS click_id, user_id, ts_us FROM e WHERE event_type = 'click'),
    wm AS (
      -- an EMPTY side pins Spark's global watermark at zero (its
      -- watermark node never advances), so no outer row ever emits;
      -- DuckDB's least() would IGNORE the NULL max, so guard both
      -- sides explicitly (probed empirically r9: 0 rows on a
      -- clicks-empty stream)
      SELECT CASE WHEN (SELECT count(*) FROM v) > 0
                   AND (SELECT count(*) FROM c) > 0
             THEN least((SELECT max(ts_us) FROM v), (SELECT max(ts_us) FROM c))
                  - CAST(3600000000 AS BIGINT) END AS w
    ),
    m AS (
      SELECT v.view_id, v.user_id, c.click_id, c.ts_us - v.ts_us AS gap_us
      FROM v JOIN c
        ON v.user_id = c.user_id
       AND c.ts_us >= v.ts_us
       AND c.ts_us <= v.ts_us + CAST(21600000000 AS BIGINT)
    )
    SELECT view_id, user_id, click_id, gap_us FROM m
    UNION ALL
    SELECT v.view_id, v.user_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM v, wm
    WHERE v.ts_us + CAST(21600000000 AS BIGINT) < w
      AND NOT EXISTS (SELECT 1 FROM m WHERE m.view_id = v.view_id)
    """,
)
def stream_interval_join_outer_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: everything the inner twin
    emits PLUS one NULL-click row per never-clicked view whose join
    state expired — the outer results are WATERMARK-TIMED, the distinct
    semantics this twin exists to prove. The oracle encodes the
    empirically pinned emission rule (see stream_interval_join's
    docstring): NULL rows are exactly the unmatched views with
    view_ts + 6h strictly below the final watermark (min of the two
    sides' max event time, minus the 1 h delay); unmatched views whose
    window is still open at query end never emit."""
    stream = _table_stream(spark, sf_dir, "events")
    base = stream.select(
        "event_id",
        "user_id",
        F.timestamp_micros(events_ts_us(stream)).alias("ts"),
        "event_type",
    )
    views = base.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    clicks = base.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    joined = stream_interval_join(
        views, clicks, max_gap="6 hours", watermark_delay="1 hour", how="leftOuter"
    )
    out = _run_available_now(joined, "append")
    return out.select(
        "view_id",
        F.col("view_user").alias("user_id"),
        "click_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


@register(
    "stream_session_daily_rollup",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
    mx AS (SELECT max(ts_us) AS max_us FROM e),
    lagged AS (
      SELECT user_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                  > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    sess AS (
      SELECT user_id, ts_us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagged
    ),
    agg AS (
      SELECT user_id, sid, min(ts_us) AS s_start,
             max(ts_us) + 1800000000 AS s_end, count(*) AS events
      FROM sess GROUP BY user_id, sid
    ),
    flushed AS (
      SELECT * FROM agg, mx WHERE s_end <= max_us - 3600000000
    ),
    daily AS (
      SELECT (s_end // 86400000000) * 86400000000 AS day_start_us,
             CAST(count(*) AS BIGINT) AS sessions,
             CAST(sum(events) AS BIGINT) AS tot_events
      FROM flushed GROUP BY 1
    )
    SELECT day_start_us, sessions, tot_events FROM daily, mx
    WHERE day_start_us + 86400000000 <= max_us - 3600000000
    """,
)
def stream_session_daily_rollup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chained-stateful pipeline (session_window -> daily window)
    run to completion under AvailableNow. Emitted rows are the daily
    buckets whose end passed the final watermark, each counting exactly
    the sessions that FLUSHED (session end + gap <= watermark) whose
    session END falls in that day — `window(win, bucket)` assigns a
    window-struct input by its END, not its start (pinned empirically
    r9: end-bucketing reproduces the stream bit-for-bit, start-
    bucketing differs on every midnight-crossing session). The oracle
    replays both closure rules on the batch lag/running-sum
    sessionization."""
    from lakeview_spark.streaming.pipeline_stream import stream_session_rollup

    stream = _table_stream(spark, sf_dir, "events")
    e = stream.select(
        "user_id", F.timestamp_micros(events_ts_us(stream)).alias("ts")
    )
    daily = stream_session_rollup(
        e, gap="30 minutes", watermark_delay="1 hour", bucket="1 day"
    )
    out = _run_available_now(daily, "append")
    return out.select(
        F.unix_micros(F.col("w.start")).alias("day_start_us"),
        F.col("sessions").cast("bigint").alias("sessions"),
        F.col("tot_events").cast("bigint").alias("tot_events"),
    )


# Funnel-oracle constants, LITERAL on purpose: streaming_twins must not
# import pipeline.curation/dedup at module level — a Python WORKER
# enters the library through pipeline/__init__ -> dedup ->
# plans.registry -> plans/__init__ -> this module, and a module-level
# import of curation here re-enters the HALF-INITIALIZED dedup module
# (ImportError in every mapInPandas worker; broke all six multimodal
# queries when the r10 funnel twin first imported curation at
# decoration time). test_registry_hygiene.py pins these literals equal
# to the curation/dedup constants, so the no-drift guarantee moves
# from a shared import to a shared TEST.
_FUNNEL_PROBE_MOD = 29
_FUNNEL_EN_STOP = "'the','and','of','to','a','in','is','it','for','on'"
_FUNNEL_SHINGLES_SQL = """
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
"""


def _curation_funnel_oracle() -> str:
    return f"""
    WITH s AS ({_FUNNEL_SHINGLES_SQL}),
    probe AS (SELECT DISTINCT unnest(shingles) AS shingle FROM s
              WHERE doc_id % {_FUNNEL_PROBE_MOD} = 0),
    m AS (
      SELECT c.doc_id, count(*) AS matched
      FROM (SELECT doc_id, unnest(shingles) AS shingle FROM s
            WHERE doc_id % {_FUNNEL_PROBE_MOD} <> 0) c
      JOIN probe USING (shingle) GROUP BY c.doc_id
    ),
    dropped AS (
      SELECT s.doc_id
      FROM s LEFT JOIN m ON m.doc_id = s.doc_id
      WHERE s.doc_id % {_FUNNEL_PROBE_MOD} <> 0 AND len(s.shingles) > 0
        AND 10 * COALESCE(m.matched, 0) >= len(s.shingles)
    ),
    q AS (
      SELECT doc_id, lang, text FROM documents
      WHERE len(string_split(text, ' ')) BETWEEN 40 AND 400
        AND len(list_filter(string_split(lower(text), ' '),
                x -> x IN ({_FUNNEL_EN_STOP}))) >= 1
        AND len(list_distinct(string_split(lower(text), ' '))) * 3
              >= len(string_split(lower(text), ' '))
        AND doc_id % {_FUNNEL_PROBE_MOD} <> 0
        AND doc_id NOT IN (SELECT doc_id FROM dropped)
    ),
    ded AS (
      SELECT DISTINCT lang, md5(text) AS text_hash,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      FROM q
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS docs_kept,
           CAST(sum(ntok) AS BIGINT) AS tokens_kept
    FROM ded GROUP BY lang
    """


@register("stream_curation_funnel", oracle=_curation_funnel_oracle())
def stream_curation_funnel_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The live curation funnel (streaming/pipeline_stream.py
    stream_curation_funnel) run to completion under AvailableNow:
    quality screen -> probe-doc drop + stream-static anti join against
    the batch decontamination verdict -> dropDuplicatesWithinWatermark
    on (lang, text_hash) — the streaming twin of pipeline_train_set's
    screening stages, rolled up per language. Survivor ROWS are
    arrival-order dependent but the surviving (lang, hash) KEY SET —
    and the token count each key carries (identical texts) — is not,
    so the per-lang rollup hash-checks (the stream_doc_dedup
    determinism rule with the lang dimension carried through). The
    static side is the same 10%-integer-rule contaminated-id list the
    batch detect pass publishes, so stream and batch decontamination
    can never disagree."""
    from lakeview_spark.pipeline.curation import contamination_ngram_overlap

    det = contamination_ngram_overlap(spark, sf_dir)
    contaminated = det.filter(
        10 * F.col("matched_shingles") >= F.col("n_shingles")
    ).select("doc_id")
    funnel = stream_curation_funnel(
        _doc_stream(spark, sf_dir),
        contaminated,
        probe_mod=_FUNNEL_PROBE_MOD,
        watermark_delay="1 hour",
    )
    out = _run_available_now(funnel, "append")
    return (
        out.select(
            "lang",
            "text_hash",
            F.size(F.split("text", " ")).cast("bigint").alias("ntok"),
        )
        .distinct()
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("docs_kept"),
            F.sum("ntok").cast("bigint").alias("tokens_kept"),
        )
    )


def _pack_oracle() -> str:
    # the batch prefix sum (pipeline/packing.py _CUM_SQL literal twin —
    # streaming_twins cannot import pipeline modules at module level,
    # the r10 circular-import rule; the literal is pinned against the
    # shared constants by tests/test_registry_hygiene.py kin
    # tests/test_stateful_streaming.py::test_pack_oracle_literals_match)
    # restricted to COMPLETE sequences: a sequence flushes exactly when
    # some later doc of the same lang starts past it, i.e. seq_id <
    # max(seq_id) over the lang.
    from lakeview_spark.pipeline.packing import SEQ_BUDGET

    return f"""
    WITH c AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(COALESCE(sum(len(string_split(text, ' ')))
                    OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum_before
      FROM documents
    ),
    s AS (
      SELECT lang, cum_before // {SEQ_BUDGET} AS seq_id,
             CAST(count(*) AS BIGINT) AS docs_starting,
             CAST(sum(n_tokens) AS BIGINT) AS tokens_starting,
             CAST(min(cum_before % {SEQ_BUDGET}) AS BIGINT) AS first_offset
      FROM c GROUP BY lang, seq_id
    ),
    mx AS (SELECT lang, max(seq_id) AS m FROM s GROUP BY lang)
    SELECT s.lang, CAST(s.seq_id AS BIGINT) AS seq_id, docs_starting,
           tokens_starting, first_offset
    FROM s JOIN mx ON mx.lang = s.lang WHERE s.seq_id < mx.m
    """


@register("stream_sequence_pack", oracle=_pack_oracle())
def stream_sequence_pack_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming sequence packer (applyInPandasWithState,
    streaming/stateful.py stream_sequence_pack) run to completion under
    AvailableNow — the one batch op without a streaming twin that a
    live pipeline genuinely needs (VERDICT r10 next-4): arriving docs
    pack into SEQ_BUDGET-token training sequences with per-lang carry
    state, and only COMPLETED sequences emit (the open tail stays in
    state). The oracle is the BATCH packer's closed form
    (pack_sequence_stats's cum_before div/mod) restricted to the
    flushed prefix — sequences with seq_id < the lang's max started
    seq_id — so the streaming walk and the batch prefix sum can never
    disagree on a flushed sequence. Replay order inside the batch is
    doc_id (the CUSUM mergesort device); cross-batch carry is pinned by
    the two-micro-batch boundary-spanning pytest
    (tests/test_stateful_streaming.py)."""
    from lakeview_spark.pipeline.packing import SEQ_BUDGET
    from lakeview_spark.streaming.stateful import stream_sequence_pack

    stream = _table_stream(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    out = stream_sequence_pack(stream, SEQ_BUDGET)
    res = _run_available_now(out, "update")
    return res.select(
        "lang",
        F.col("seq_id").cast("bigint").alias("seq_id"),
        F.col("docs_starting").cast("bigint").alias("docs_starting"),
        F.col("tokens_starting").cast("bigint").alias("tokens_starting"),
        F.col("first_offset").cast("bigint").alias("first_offset"),
    )


def _clf_gate_oracle() -> str:
    # the batch classifier's shared CTE block scores every doc with
    # the same trained weights the gate consumes (import inside the
    # builder — the _pack_oracle precedent; registration runs after
    # pipeline is fully initialized), binned on the stream_token_stats
    # window grid; update mode -> every open window emits once.
    from lakeview_spark.pipeline.classifier import _CLF_BLOCK

    return f"""
    WITH {_CLF_BLOCK}
    SELECT lang,
           {_BASE_SQL} + ((CAST(doc_id AS BIGINT) % {_SPREAD_MIN})
             * 60000000 // 600000000) * 600000000 AS window_start_us,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_docs,
           CAST(sum(score) AS BIGINT) AS total_score
    FROM scored
    GROUP BY lang, window_start_us
    """


@register("stream_classifier_gate", oracle=_clf_gate_oracle())
def stream_classifier_gate_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gating at ingestion (streaming/
    pipeline_stream.py stream_classifier_gate) run to completion: the
    BATCH-trained hashed linear model (classifier_quality_apply's
    weights, published as a <= CLF_BUCKETS-row table) scores every
    arriving document row-locally — distinct hashed feature buckets,
    one fold against the broadcast weights map — and the windowed
    rollup counts kept (score >= 0) docs per (window, lang). The
    oracle replays the identical score via the batch classifier's
    shared CTE block, so the live gate and the batch apply query can
    never disagree on a verdict (the stream_curation_funnel
    stream-static device, applied to trained weights)."""
    from lakeview_spark.pipeline.classifier import CLF_BUCKETS, classifier_weights

    wts = classifier_weights(spark, sf_dir)
    gate = stream_classifier_gate(
        _doc_stream(spark, sf_dir), wts, buckets=CLF_BUCKETS
    )
    out = _run_available_now(gate, "update")
    return out.select(
        "lang",
        F.unix_micros("window_start").alias("window_start_us"),
        F.col("docs").cast("bigint").alias("docs"),
        F.col("kept_docs").cast("bigint").alias("kept_docs"),
        F.col("total_score").cast("bigint").alias("total_score"),
    )


# LITERAL copy of pipeline.corpus.DRIFT_BUCKETS (pinned by
# tests/test_corpus_laws.py): importing corpus at registration time
# would re-enter the half-initialized dedup module on a Python
# worker's import path (the r10 circular-import incident — corpus
# imports dedup at module level; the funnel twin uses the same
# literal device for its shared constants).
_DRIFT_BUCKETS_TWIN = 16


def _drift_oracle() -> str:
    # replays the fixed-width md5 bucket histogram per (window, lang)
    # against the whole-corpus reference; the TV sum iterates the
    # reference support, which covers every window bucket (window docs
    # are a subset of the corpus), and absent window buckets enter as
    # c = 0 — exactly the engine's zip over the full fixed-slot arrays
    # (slots with r = 0 and c = 0 contribute 0 on both sides).
    DRIFT_BUCKETS = _DRIFT_BUCKETS_TWIN

    return f"""
    WITH tok AS (
      SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
             unnest(list_transform(string_split(lower(text), ' '),
                    t -> ('0x' || substr(md5(t), 1, 8))::BIGINT
                         % {DRIFT_BUCKETS})) AS b
      FROM documents
    ),
    ref AS (
      SELECT lang, b, CAST(count(*) AS BIGINT) AS r FROM tok GROUP BY lang, b
    ),
    nref AS (SELECT lang, CAST(sum(r) AS BIGINT) AS n_ref FROM ref GROUP BY lang),
    win AS (
      SELECT lang,
             {_BASE_SQL} + ((doc_id % {_SPREAD_MIN})
               * 60000000 // 600000000) * 600000000 AS window_start_us,
             b
      FROM tok
    ),
    wc AS (
      SELECT lang, window_start_us, b, CAST(count(*) AS BIGINT) AS c
      FROM win GROUP BY 1, 2, 3
    ),
    nwin AS (
      SELECT lang, window_start_us, CAST(sum(c) AS BIGINT) AS n_win
      FROM wc GROUP BY 1, 2
    ),
    tvj AS (
      SELECT nw.lang, nw.window_start_us, nw.n_win, nr.n_ref,
             coalesce(wc.c, 0) AS c, r.r
      FROM nwin nw
      JOIN ref r ON r.lang = nw.lang
      JOIN nref nr ON nr.lang = nw.lang
      LEFT JOIN wc ON wc.lang = nw.lang
                  AND wc.window_start_us = nw.window_start_us
                  AND wc.b = r.b
    ),
    tv AS (
      SELECT lang, window_start_us,
             any_value(n_win) AS n_win, any_value(n_ref) AS n_ref,
             CAST(sum(abs(c * n_ref - r * n_win)) AS BIGINT) AS tv_num
      FROM tvj GROUP BY lang, window_start_us
    )
    SELECT lang, window_start_us, n_win, n_ref, tv_num,
           CASE WHEN n_win > 0 AND n_ref > 0
                THEN CAST(tv_num AS DOUBLE) / (2.0 * n_win * n_ref)
           END AS tv_distance
    FROM tv
    """


@register("stream_drift_monitor", oracle=_drift_oracle())
def stream_drift_monitor_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The live distribution-drift monitor (streaming/
    pipeline_stream.py stream_drift_monitor) run to completion under
    AvailableNow: each window's arriving token stream collapses to a
    16-slot md5 bucket histogram (per-window state = 16 integers, the
    sketch that makes drift a legal streaming statistic) and is scored
    by exact total-variation distance against the batch-published
    reference distribution (pipeline/corpus.py drift_reference — the
    stream-static publish pattern of stream_classifier_gate, so live
    and batch drift math cannot disagree). The oracle replays bucket
    counts on the synthesized window grid and the cross-multiplied
    BIGINT TV numerator; one guarded edge division."""
    from lakeview_spark.pipeline.corpus import drift_reference
    from lakeview_spark.streaming.pipeline_stream import stream_drift_monitor

    ref = drift_reference(spark, sf_dir, buckets=_DRIFT_BUCKETS_TWIN)
    mon = stream_drift_monitor(
        _doc_stream(spark, sf_dir), ref, buckets=_DRIFT_BUCKETS_TWIN
    )
    out = _run_available_now(mon, "update")
    return out.select(
        "lang",
        F.unix_micros("window_start").alias("window_start_us"),
        F.col("n_win").cast("bigint").alias("n_win"),
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("tv_num").cast("bigint").alias("tv_num"),
        "tv_distance",
    )


# the r12 per-source admission-cap twin shares the BATCH operator's
# correctness statement — under one AvailableNow batch the admitted set
# is the batch selection exactly. The oracle is a LITERAL copy of
# mix_source_caps' (the funnel-twin literal-constant device: reading
# the registry or importing pipeline.mixing at module scope re-enters
# half-initialized pipeline on the `import lakeview_spark.pipeline`
# path — the r11 lesson, re-hit and re-fixed here); the pin test
# tests/test_corpus_laws.py asserts the two strings stay IDENTICAL.
_SRC_CAPS_ORACLE_TWIN = """
    WITH binned AS (
      SELECT doc_id, lang, source,
             CAST(list_reduce(list_transform(range(1, 16), i -> CAST(strpos('0123456789abcdef', substr(md5('scap:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)), (acc, x) -> acc * 16 + x) AS BIGINT) AS hkey,
             CAST(list_reduce(list_transform(range(1, 16), i -> CAST(strpos('0123456789abcdef', substr(md5('scap:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)), (acc, x) -> acc * 16 + x) AS BIGINT) % 256 AS bin
      FROM documents
    ),
    hist AS (SELECT source, bin, count(*) AS c FROM binned GROUP BY 1, 2),
    cum AS (
      SELECT source, bin, c, (greatest(1, (SELECT count(*) FROM documents) // (2 * (SELECT count(DISTINCT source) FROM documents)))) AS cap,
             sum(c) OVER (PARTITION BY source ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM hist
    ),
    thr AS (
      SELECT source, min(CASE WHEN cum >= cap THEN bin END) AS tbin
      FROM cum GROUP BY source
    ),
    quota AS (
      SELECT c2.source, CAST(c2.cap - (c2.cum - c2.c) AS BIGINT) AS quota
      FROM cum c2 JOIN thr ON thr.source = c2.source AND c2.bin = thr.tbin
    )
    SELECT b.doc_id, b.lang, b.source
    FROM binned b JOIN thr ON thr.source = b.source
    WHERE thr.tbin IS NULL OR b.bin < thr.tbin
    UNION ALL
    SELECT doc_id, lang, source FROM (
      SELECT b.doc_id, b.lang, b.source, q.quota,
             row_number() OVER (PARTITION BY b.source
                                ORDER BY b.hkey, b.doc_id) AS rn
      FROM binned b
      JOIN thr ON thr.source = b.source
      JOIN quota q ON q.source = b.source
      WHERE b.bin = thr.tbin)
    WHERE rn <= quota
    """


@register("stream_source_caps", oracle=_SRC_CAPS_ORACLE_TWIN)
def stream_source_caps_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The live per-source document cap (streaming/stateful.py
    stream_source_caps) run to completion under AvailableNow: admit at
    most cap = greatest(1, total // (2 * n_sources)) documents per
    source, selected by the SAME md5 (bin, hkey, doc_id) total order
    as the batch mix_source_caps — whose oracle this twin reuses
    VERBATIM, because one micro-batch covering the corpus admits the
    batch selection byte-identically. The cap is BATCH-PUBLISHED (one
    corpus count, the stream_classifier_gate published-parameter
    pattern). State per source is ONE integer; emitted rows are
    append-once admissions."""
    from lakeview_spark.streaming.stateful import stream_source_caps

    docs = t(spark, sf_dir, "documents")
    row = docs.agg(
        F.count("*").alias("n"), F.countDistinct("source").alias("s")
    ).collect()[0]
    cap = max(1, int(row.n) // (2 * max(1, int(row.s))))
    out = stream_source_caps(_doc_stream(spark, sf_dir), cap)
    return _run_available_now(out, "update").select("doc_id", "lang", "source")


def _para_gate_oracle() -> str:
    # replays the live gate's per-paragraph verdicts via the batch LM +
    # tercile-threshold CTE blocks (imports inside the builder — the
    # _pack_oracle precedent: registration runs after pipeline is fully
    # initialized), binned on the synthesized ingest grid. The gate
    # emits one row per SCORED paragraph (< 2-token paragraphs carry no
    # bigram evidence; the batch apply keeps them trivially), with the
    # IDENTICAL s <= t2 verdict rule as text_paragraph_apply, so the
    # live gate and the batch apply can never disagree.
    from lakeview_spark.pipeline.text import _PARA_SCORED_CTES, _PPL_LM_CTES

    return f"""
    WITH {_PPL_LM_CTES},
    {_PARA_SCORED_CTES}
    SELECT lang,
           {_BASE_SQL} + ((CAST(doc_id AS BIGINT) % {_SPREAD_MIN})
             * 60000000 // 600000000) * 600000000 AS window_start_us,
           doc_id, para_idx, n_bigrams, total_qbits, s,
           s <= thr.t2 AS kept
    FROM pq, thr
    """


@register("stream_paragraph_gate", oracle=_para_gate_oracle())
def stream_paragraph_gate_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live CCNet paragraph gating (streaming/pipeline_stream.py
    stream_paragraph_gate) run to completion: the BATCH-trained bigram
    LM attaches to the exploded paragraph-pair stream via broadcast
    equi joins and the batch-published tercile threshold decides each
    scored paragraph's keep/drop — one verdict row per (window, doc,
    paragraph). The oracle replays the identical verdicts via the
    batch LM + threshold CTE blocks (text_paragraph_ppl's pq
    derivation), so the live gate and the batch apply query cannot
    drift — the stream_classifier_gate device, applied to a trained
    LM."""
    from lakeview_spark.operators.materialize import materialized
    from lakeview_spark.pipeline.text import (
        _PARA_TOKENS,
        _PARA_QSCALE,
        _para_thresholds,
        _ppl_model_build,
        _ppl_prices_build,
    )
    from lakeview_spark.streaming.pipeline_stream import stream_paragraph_gate

    prices = materialized(spark, "ppl_prices", sf_dir, _ppl_prices_build)
    model = materialized(spark, "ppl_model", sf_dir, _ppl_model_build)
    thr = _para_thresholds(spark, sf_dir)
    gate = stream_paragraph_gate(
        _doc_stream(spark, sf_dir),
        prices,
        model,
        thr,
        para_tokens=_PARA_TOKENS,
        qscale=_PARA_QSCALE,
    )
    out = _run_available_now(gate, "update")
    return out.select(
        "lang",
        F.unix_micros("window_start").alias("window_start_us"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("para_idx").cast("bigint").alias("para_idx"),
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.col("total_qbits").cast("bigint").alias("total_qbits"),
        F.col("s").cast("bigint").alias("s"),
        "kept",
    )
