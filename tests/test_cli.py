"""CLI entry-point tests (reference CliParserTest.java + Main.java):
-p path, -c yaml string, -h help, and the invalid-arg error paths."""

from __future__ import annotations

import json

import pytest

from lakeview_spark.__main__ import main
from tests.test_dataflow import PARSER_CFG, lake  # noqa: F401 (fixture)


def _yaml(lake_root: str, mode: str = "ONCE") -> str:
    return json.dumps(  # JSON is a YAML subset — no PyYAML quoting pitfalls
        {
            "version": "V1",
            "metadataExtractorConfig": {
                "jobRunMode": mode,
                "uploadStrategy": "BLOCK_ON_INCOMPLETE_COMMIT",
                "parserConfig": PARSER_CFG(lake_root),
            },
        }
    )


def test_cli_with_config_path(spark, lake, tmp_path, capsys):  # noqa: F811
    cfg = tmp_path / "conf.yaml"
    cfg.write_text(_yaml(lake))
    rc = main(
        ["-p", str(cfg), "--state-dir", str(tmp_path / "state")], spark=spark
    )
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out)
    assert metrics["tables_discovered"] >= 2


def test_cli_with_yaml_string_and_retry_mode(spark, lake, tmp_path, capsys):  # noqa: F811
    rc = main(
        ["-c", _yaml(lake, "ONCE_WITH_RETRY"), "--state-dir", str(tmp_path / "s")],
        spark=spark,
    )
    assert rc == 0
    attempts = json.loads(capsys.readouterr().out)
    assert isinstance(attempts, list) and attempts[0]["succeeded"] is True


def test_cli_continuous_mode_bounded_rounds(spark, lake, tmp_path, capsys):  # noqa: F811
    cfg = tmp_path / "conf.yml"
    cfg.write_text(_yaml(lake, "CONTINUOUS"))
    rc = main(
        [
            "-p",
            str(cfg),
            "--state-dir",
            str(tmp_path / "s"),
            "--max-rounds",
            "1",
        ],
        spark=spark,
    )
    assert rc == 0
    rounds = json.loads(capsys.readouterr().out)
    assert isinstance(rounds, list) and len(rounds) == 1


def test_cli_help_exits_zero(capsys):
    with pytest.raises(SystemExit) as exc:
        main(["-h"])
    assert exc.value.code == 0
    assert "--config" in capsys.readouterr().out


def test_cli_rejects_both_path_and_config(capsys):
    # CliParser.java:52-54 — "Cannot specify both file path and config string."
    with pytest.raises(SystemExit) as exc:
        main(["-p", "a.yaml", "-c", "version: V1"])
    assert exc.value.code == 2


def test_cli_requires_a_config_source(capsys):
    with pytest.raises(SystemExit) as exc:
        main([])
    assert exc.value.code == 2
    assert "required" in capsys.readouterr().err
