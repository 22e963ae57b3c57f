"""CLI dispatch smoke tests (the spark-submit ops path)."""

from __future__ import annotations

import json
import os


def test_cli_query(spark, tmp_path, capsys):
    from liblevenshtein_rust_spark.cli import main

    d = tmp_path / "dict.txt"
    d.write_text("table\nstream\njoin\nwindow\n")
    rc = main(["query", "--dict", str(d), "--term", "tble", "--max-distance", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "table\t1" in out


def test_cli_pipeline(spark, tmp_path, capsys):
    from liblevenshtein_rust_spark.cli import main
    from liblevenshtein_rust_spark.sources.transcripts import synth_transcripts

    tdf, _ = synth_transcripts(spark, 200, seed=7)
    inp = str(tmp_path / "turns")
    tdf.write.parquet(inp)
    ck = str(tmp_path / "ckpt")
    rc = main(["pipeline", "--input", inp, "--checkpoint-dir", ck,
               "--run-id", "cli1", "--max-distance", "1"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "clusters" in info
    assert os.path.exists(os.path.join(ck, "cli1", "turn_entities", "_SUCCESS"))
