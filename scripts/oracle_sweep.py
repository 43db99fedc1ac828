"""Driver-twin correctness sweep: run every registered query against its
DuckDB oracle at the driver's correctness scale (sf0.01 by default).

Usage: python scripts/oracle_sweep.py [sf_dir]
Prints one line per query and exits non-zero on any mismatch.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from lakeview_spark.plans import QUERIES, ORACLES  # noqa: E402
from lakeview_spark.session import get_spark  # noqa: E402
from tests.oracle_util import compare, duck_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    duck = duck_connection(sf_dir)
    failures = 0
    no_oracle = []
    for name in sorted(QUERIES):
        if name not in ORACLES:
            no_oracle.append(name)
            continue
        t0 = time.time()
        try:
            issues = compare(QUERIES[name](spark, sf_dir), duck, ORACLES[name])
        except Exception as exc:  # noqa: BLE001
            issues = [f"EXCEPTION: {exc}"]
        dt = time.time() - t0
        if issues:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(issues)[:500])
        else:
            print(f"ok   {name} ({dt:.1f}s)")
    for name in no_oracle:
        print(f"rows-only {name} (no oracle)")
    print(f"\n{len(ORACLES) - failures}/{len(ORACLES)} oracle queries match; "
          f"{len(no_oracle)} rows-only")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
