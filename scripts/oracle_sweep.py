"""Driver-twin correctness sweep: run every registered query against its
DuckDB oracle at the driver's correctness scale (sf0.01 by default).

Usage: python scripts/oracle_sweep.py [sf_dir] [oracle_timeout_sec]
Prints one line per query and exits non-zero on any mismatch.

`oracle_timeout_sec` (optional) interrupts the DUCKDB side of a query
after that many seconds and records it as `oracle-timeout` instead of
hanging the sweep — for sweeps at larger scale factors where a few
oracles are super-linear in DuckDB (the recursive-CTE transitive
closure over millions of pairs, the brute-force all-pairs truths).
An oracle timeout is an ORACLE-side cost statement, not an engine
failure; the engine side still ran. Timeouts do not fail the sweep.
"""

from __future__ import annotations

import sys
import threading
import time

sys.path.insert(0, ".")

from lakeview_spark.plans import QUERIES, ORACLES  # noqa: E402
from lakeview_spark.session import get_spark  # noqa: E402
from tests.oracle_util import compare, duck_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    timeout = float(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_spark()
    duck = duck_connection(sf_dir)
    failures = 0
    timeouts = []
    no_oracle = []
    for name in sorted(QUERIES):
        if name not in ORACLES:
            no_oracle.append(name)
            continue
        t0 = time.time()
        timer = None
        fired = threading.Event()
        if timeout:
            def _interrupt():
                fired.set()
                duck.interrupt()
            timer = threading.Timer(timeout, _interrupt)
            timer.start()
        try:
            issues = compare(QUERIES[name](spark, sf_dir), duck, ORACLES[name])
        except Exception as exc:  # noqa: BLE001
            issues = [f"EXCEPTION: {exc}"]
        finally:
            if timer:
                timer.cancel()
        dt = time.time() - t0
        if fired.is_set():
            timeouts.append(name)
            print(f"oracle-timeout {name} (>{timeout:.0f}s in DuckDB)")
        elif issues:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(issues)[:500])
        else:
            print(f"ok   {name} ({dt:.1f}s)")
        sys.stdout.flush()
    for name in no_oracle:
        print(f"rows-only {name} (no oracle)")
    checked = len(ORACLES) - len(timeouts)
    print(f"\n{checked - failures}/{checked} oracle queries match"
          f" ({len(timeouts)} oracle-timeouts excluded); "
          f"{len(no_oracle)} rows-only")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
