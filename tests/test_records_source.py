"""JSONL/CSV record formats: explicit-schema round trips, corrupt-line
containment, and output-file bounding."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakeview_spark.sources.records import (
    corrupt_record_stats,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)

SF_DIR = "/root/testdata/sf0.001"

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_jsonl_round_trip(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, partitions=4)
    back = read_jsonl(spark, out, DOC_SCHEMA)
    assert back.schema == DOC_SCHEMA
    assert back.count() == docs.count()
    # value-level equality via anti-joins both ways
    assert back.exceptAll(docs).count() == 0
    assert docs.exceptAll(back).count() == 0
    # coalesce bounded the file count
    assert len(glob.glob(os.path.join(out, "part-*"))) <= 4


def test_csv_round_trip_skips_text(spark, tmp_path):
    """CSV round-trips the non-freetext columns (the text column holds
    spaces/commas — escaping round-trips too, but the schema-contract
    point is made on the metadata projection)."""
    meta = _docs(spark).select("doc_id", "lang", "source", "n_chars")
    schema = StructType([f for f in DOC_SCHEMA.fields if f.name != "text"])
    out = str(tmp_path / "docs_csv")
    write_csv(meta, out, partitions=2)
    back = read_csv(spark, out, schema)
    assert back.schema == schema
    assert back.exceptAll(meta).count() == 0
    assert meta.exceptAll(back).count() == 0


def test_jsonl_corrupt_lines_are_contained(spark, tmp_path):
    """A malformed line must surface as a countable corrupt row, not a
    crashed stage; clean reads drop the audit column."""
    d = tmp_path / "mixed"
    d.mkdir()
    good = [{"doc_id": 1, "text": "a b", "lang": "en", "source": "s", "n_chars": 3}]
    with open(d / "part-0.jsonl", "w") as f:
        for row in good:
            f.write(json.dumps(row) + "\n")
        f.write("{this is not json\n")
    stats = corrupt_record_stats(spark, str(d), DOC_SCHEMA).collect()[0]
    assert stats.n_rows == 2
    assert stats.n_corrupt == 1
    assert abs(stats.corrupt_share - 0.5) < 1e-12
    # row-level inspection path: the corrupt line's raw text is retained
    # alongside the data columns
    audited = read_jsonl(spark, str(d), DOC_SCHEMA, keep_corrupt=True)
    bad = audited.filter(F.col("doc_id").isNull()).collect()
    assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith("{this")
    clean = read_jsonl(spark, str(d), DOC_SCHEMA)
    assert "_corrupt_record" not in clean.columns
    assert clean.filter(F.col("doc_id").isNotNull()).count() == 1


def test_blank_lines_count_as_corrupt(spark, tmp_path):
    """`from_json` yields a NULL struct (no corrupt-column payload) for
    empty and whitespace-only lines — the audit must still count them
    as corrupt, not clean (r5 ADVICE finding: the corrupt-column check
    alone misses them)."""
    d = tmp_path / "blanks"
    d.mkdir()
    with open(d / "part-0.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "a", "lang": "en",
                            "source": "s", "n_chars": 1}) + "\n")
        f.write("\n")          # empty line
        f.write("   \n")       # whitespace-only line
        f.write("{broken\n")   # classic malformed line
    stats = corrupt_record_stats(spark, str(d), DOC_SCHEMA).collect()[0]
    assert stats.n_rows == 4
    assert stats.n_corrupt == 3
    assert abs(stats.corrupt_share - 0.75) < 1e-12


def test_csv_corrupt_lines_are_contained(spark, tmp_path):
    """A malformed CSV line (wrong arity / bad types) surfaces as a
    null-field row with the raw line retained when asked for, same
    contract as JSONL."""
    d = tmp_path / "csv_mixed"
    d.mkdir()
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    with open(d / "part-0.csv", "w") as f:
        f.write("doc_id,lang,n_chars\n")
        f.write("1,en,10\n")
        f.write("not_a_number,fr,oops\n")
    audited = read_csv(spark, str(d), schema, keep_corrupt=True)
    rows = audited.collect()
    assert len(rows) == 2
    bad = [r for r in rows if r["doc_id"] is None]
    assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith("not_a_number")
    clean = read_csv(spark, str(d), schema)
    assert "_corrupt_record" not in clean.columns
