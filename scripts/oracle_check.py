"""Targeted oracle check: run the NAMED queries against their DuckDB
oracles at the given SF — the per-change verification loop of an
optimization round (full-registry sweeps stay scripts/oracle_sweep.py).

Usage: python scripts/oracle_check.py <sf_dir> <query> [query ...]
Prints one line per query; exits non-zero on any mismatch.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from lakeview_spark.plans import QUERIES, ORACLES  # noqa: E402
from lakeview_spark.session import get_spark  # noqa: E402
from tests.oracle_util import compare, duck_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    duck = duck_connection(sf_dir)
    failures = 0
    for name in names:
        if name not in ORACLES:
            print(f"no-oracle {name} (rows-only query — use a rows diff)", flush=True)
            continue
        t0 = time.time()
        try:
            issues = compare(QUERIES[name](spark, sf_dir), duck, ORACLES[name])
        except Exception as exc:  # noqa: BLE001
            issues = [f"EXCEPTION: {exc}"]
        dt = time.time() - t0
        if issues:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): {issues[:3]}", flush=True)
        else:
            print(f"ok {name} ({dt:.1f}s)", flush=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
