"""End-to-end CLI runner tests: run_app.main() driven in-process.

Covers the reference binary's surface (run_eventflux.rs:20-42): SQL file +
YAML config + --set conf overrides + -e extension plugins, plus the three
batch output sinks. Uses the active test SparkSession (get_spark returns
the existing session, so --master/conf overrides are no-ops here — the
wiring under test is argument parsing → registration → compile → sink).
"""

from __future__ import annotations

import json
import os
import sys

import run_app

SF = "/root/testdata/sf0.001"


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


APP_SQL = """
CREATE STREAM events (ts TIMESTAMP, user_id BIGINT, event_id BIGINT,
                      event_type VARCHAR, value DOUBLE);
INSERT INTO Out SELECT user_id, value FROM events WHERE value > 4;
"""


def test_cli_console_and_count(spark, tmp_path, capsys):
    sql = _write(tmp_path, "app.sql", APP_SQL)
    assert run_app.main(stop=False, argv=[sql, "--register", f"events={SF}/events.parquet:ts"]) == 0
    out = capsys.readouterr().out
    assert "[Out]" in out and "user_id" in out

    cfg = _write(tmp_path, "cfg.yaml", "output: count\n")
    assert run_app.main(
        stop=False,
        argv=[sql, "-c", cfg, "--register", f"events={SF}/events.parquet:ts"],
    ) == 0
    out = capsys.readouterr().out
    assert "rows" in out


def test_cli_parquet_and_filequeue_sinks(spark, tmp_path):
    sql = _write(tmp_path, "app.sql", APP_SQL)
    cfg = _write(tmp_path, "cfg.yaml", f"output: parquet:{tmp_path}/pq\n")
    assert run_app.main(
        stop=False,
        argv=[sql, "-c", cfg, "--register", f"events={SF}/events.parquet:ts"],
    ) == 0
    got = spark.read.parquet(f"{tmp_path}/pq/Out")
    assert got.count() > 0 and set(got.columns) == {"user_id", "value"}

    cfg2 = _write(tmp_path, "cfg2.yaml", f"output: filequeue:{tmp_path}/fq\n")
    assert run_app.main(
        stop=False,
        argv=[sql, "-c", cfg2, "--register", f"events={SF}/events.parquet:ts"],
    ) == 0
    # batch runs use their own 'batch-' namespace so a later STREAMING
    # run on the same root cannot mistake them for its own epochs
    seg_root = f"{tmp_path}/fq/Out/segments/batch-0000000000"
    rows = [
        json.loads(line)
        for f in os.listdir(seg_root)
        if f.startswith("part-") and f.endswith(".json")
        for line in open(os.path.join(seg_root, f))
    ]
    assert len(rows) == got.count()
    assert all(r["value"] > 4 for r in rows)

    # a SECOND batch run appends epoch 1 (no silent no-op on rerun)
    assert run_app.main(
        stop=False,
        argv=[sql, "-c", cfg2, "--register", f"events={SF}/events.parquet:ts"],
    ) == 0
    assert os.path.isdir(f"{tmp_path}/fq/Out/segments/batch-0000000001")


def test_cli_yaml_streams_and_extension(spark, tmp_path, capsys):
    sql = _write(tmp_path, "app.sql", APP_SQL)
    cfg = _write(
        tmp_path,
        "cfg.yaml",
        "streams:\n"
        f"  events: {{path: {SF}/events.parquet, ts_col: ts}}\n"
        "output: count\n",
    )
    ext_dir = tmp_path / "ext"
    ext_dir.mkdir()
    (ext_dir / "myext.py").write_text(
        "CALLED = []\n\ndef register():\n    CALLED.append(1)\n"
    )
    sys.path.insert(0, str(ext_dir))
    try:
        assert run_app.main(stop=False, argv=[sql, "-c", cfg, "-e", "myext"]) == 0
        import myext

        assert myext.CALLED == [1]
    finally:
        sys.path.remove(str(ext_dir))
        sys.modules.pop("myext", None)
    assert "rows" in capsys.readouterr().out
