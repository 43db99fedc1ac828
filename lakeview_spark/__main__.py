"""CLI entry point: ``python -m lakeview_spark -p config.yaml``.

Mirrors the reference's launch surface — cli_parser/CliParser.java:19-63
(mutually exclusive ``-p``/``--path`` and ``-c``/``--config``, plus
``-h``/``--help``) and Main.java:45-69 (parse args -> load config ->
run the job). Mode routing follows ``jobRunMode``: ONCE -> run_once,
CONTINUOUS -> run_continuous (with per-round config re-read from the
original source, the ConfigRefresher equivalent) or, with
``--dual-cadence``, run_continuous_dual (the reference's two
independent discovery/upload schedules, TableDiscoveryAndUploadJob
.java:66-82), ONCE_WITH_RETRY -> run_once_with_retry. The run's
metrics print as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="lakeview_spark",
        description="LakeView-equivalent PySpark metadata extractor",
    )
    src = ap.add_mutually_exclusive_group()
    src.add_argument("-p", "--path", help="file path to the configuration file")
    src.add_argument("-c", "--config", help="YAML configuration string")
    ap.add_argument(
        "--state-dir",
        default="./lakeview-state",
        help="checkpoint-store directory (parquet)",
    )
    ap.add_argument("--mirror-dir", default=None, help="mirror sink root (optional)")
    ap.add_argument(
        "--interval",
        type=float,
        default=300.0,
        help="CONTINUOUS mode: seconds between rounds",
    )
    ap.add_argument(
        "--max-rounds",
        type=int,
        default=None,
        help="CONTINUOUS mode: stop after N rounds (default: run forever)",
    )
    ap.add_argument(
        "--dual-cadence",
        action="store_true",
        help=(
            "CONTINUOUS mode: run discovery and the upload poll on the "
            "reference's two independent schedules "
            "(tableDiscoveryIntervalMinutes / "
            "processTableMetadataSyncDurationSeconds gated to "
            "tableMetadataUploadIntervalMinutes) instead of one fused "
            "round per --interval; --max-rounds bounds emitted events"
        ),
    )
    ap.add_argument("--master", default=None, help="Spark master override")
    return ap


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = build_parser()
    args = ap.parse_args(argv)
    if args.path is None and args.config is None:
        # CliParser requires a config source outside of -h (Main.java:56-63)
        ap.error("one of -p/--path or -c/--config is required")

    from lakeview_spark import runner
    from lakeview_spark.config import load_config
    from lakeview_spark.session import get_spark

    source = args.path if args.path is not None else args.config
    config = load_config(source)
    if spark is None:
        spark = get_spark("lakeview-spark", master=args.master)

    if config.job_run_mode == "CONTINUOUS" and args.dual_cadence:
        out = runner.run_continuous_dual(
            spark,
            config,
            args.state_dir,
            args.mirror_dir,
            max_events=args.max_rounds if args.max_rounds is not None else 20,
            base_config_source=source,
        )
    elif config.job_run_mode == "CONTINUOUS":
        out = runner.run_continuous(
            spark,
            config,
            args.state_dir,
            args.mirror_dir,
            interval_s=args.interval,
            max_rounds=args.max_rounds,
            base_config_source=source,
        )
    elif config.job_run_mode == "ONCE_WITH_RETRY":
        out = runner.run_once_with_retry(spark, config, args.state_dir, args.mirror_dir)
    else:
        out = runner.run_once(spark, config, args.state_dir, args.mirror_dir)
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
