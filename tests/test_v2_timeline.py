"""V2 (Hudi 1.x / LSM) timeline: manifest-driven archived processing and
timeline/ active dir layout."""

from __future__ import annotations

import json
import os

from lakeview_spark.config import load_config
from lakeview_spark.functions.ids import uuid3_from_uri
from lakeview_spark.operators.checkpoints import CheckpointStore
from lakeview_spark.runner import run_once


def make_v2_table(root, name, active_files, manifest_files, version=1):
    tdir = os.path.join(root, name)
    hoodie = os.path.join(tdir, ".hoodie")
    timeline = os.path.join(hoodie, "timeline")
    history = os.path.join(timeline, "history")
    os.makedirs(history, exist_ok=True)
    with open(os.path.join(hoodie, "hoodie.properties"), "w") as f:
        f.write(
            f"hoodie.table.name={name}\nhoodie.table.type=MERGE_ON_READ\n"
            "hoodie.table.version=8\nhoodie.timeline.layout.version=2\n"
        )
    for fn in active_files:
        with open(os.path.join(timeline, fn), "w") as f:
            f.write("x")
    with open(os.path.join(history, "_version_"), "w") as f:
        f.write(str(version))
    with open(os.path.join(history, f"manifest_{version}"), "w") as f:
        json.dump({"files": [{"fileName": fn, "fileLen": 1} for fn in manifest_files]}, f)
    for fn in manifest_files:
        with open(os.path.join(history, fn), "w") as f:
            f.write("x")
    return tdir


def test_v2_manifest_incremental(spark, tmp_path):
    root = str(tmp_path / "lake")
    os.makedirs(root)
    make_v2_table(
        root,
        "v2tbl",
        active_files=["100.commit.requested", "100.inflight", "100.commit"],
        manifest_files=["20260101_20260115_0.parquet"],
        version=1,
    )
    cfg = load_config(
        {
            "version": "V1",
            "metadataExtractorConfig": {
                "jobRunMode": "ONCE",
                "uploadStrategy": "BLOCK_ON_INCOMPLETE_COMMIT",
                "parserConfig": [
                    {"lake": "l", "databases": [{"name": "d", "basePaths": [root]}]}
                ],
            },
        }
    )
    state = str(tmp_path / "state")
    mirror = str(tmp_path / "mirror")
    m1 = run_once(spark, cfg, state, mirror)
    assert m1["v2_tables"] == 1
    assert m1["v2_files_uploaded"] == 1

    tid = uuid3_from_uri(f"{root}/v2tbl")
    store = CheckpointStore(spark, os.path.join(state, "checkpoints"))
    ck = {r.table_id: r for r in store.load().collect()}[tid]
    assert ck.archived_commits_processed
    assert ck.last_archived_manifest_version == 1
    assert os.path.exists(
        os.path.join(mirror, tid, "archived", "20260101_20260115_0.parquet")
    )
    # active timeline (under .hoodie/timeline/) mirrored too
    active = os.listdir(os.path.join(mirror, tid, "active"))
    assert "100.commit" in active and "hoodie.properties" in active

    # second run: no manifest change -> nothing re-uploaded
    m2 = run_once(spark, cfg, state, mirror)
    assert m2["v2_files_uploaded"] == 0

    # manifest advances to version 2 with one new file -> diff uploads 1
    hist = os.path.join(root, "v2tbl", ".hoodie", "timeline", "history")
    with open(os.path.join(hist, "_version_"), "w") as f:
        f.write("2")
    with open(os.path.join(hist, "manifest_2"), "w") as f:
        json.dump(
            {
                "files": [
                    {"fileName": "20260101_20260115_0.parquet", "fileLen": 1},
                    {"fileName": "20260116_20260131_0.parquet", "fileLen": 1},
                ]
            },
            f,
        )
    with open(os.path.join(hist, "20260116_20260131_0.parquet"), "w") as f:
        f.write("x")
    # leave manifest_1 in place: it is the 'previous snapshot' to diff against
    m3 = run_once(spark, cfg, state, mirror)
    assert m3["v2_files_uploaded"] == 1
    ck3 = {r.table_id: r for r in store.load().collect()}[tid]
    assert ck3.last_archived_manifest_version == 2
    assert os.path.exists(
        os.path.join(mirror, tid, "archived", "20260116_20260131_0.parquet")
    )
