"""sync_table: single-table SyncTool/Glue-equivalent entry point."""

from __future__ import annotations

import os

from lakeview_spark.functions.ids import uuid3_from_uri
from lakeview_spark.runner import sync_table
from tests.test_dataflow import make_table


def test_sync_table_single_path(spark, tmp_path):
    root = str(tmp_path / "lake")
    os.makedirs(root)
    tdir = make_table(
        root, "solo", files=["100.commit.requested", "100.inflight", "100.commit"]
    )
    state = str(tmp_path / "state")
    mirror = str(tmp_path / "mirror")
    m = sync_table(spark, tdir, state, mirror)
    assert m["tables_discovered"] == 1
    tid = uuid3_from_uri(tdir)
    active = os.listdir(os.path.join(mirror, tid, "active"))
    assert "100.commit" in active and "hoodie.properties" in active
