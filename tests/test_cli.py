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


def test_cli_query_prefix_and_substring(spark, tmp_path, capsys):
    from liblevenshtein_rust_spark.cli import main

    d = tmp_path / "dict.txt"
    d.write_text("table\nstable\nturntable\nscan\n")
    rc = main(["query", "--dict", str(d), "--term", "tabl",
               "--max-distance", "1", "--prefix"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "table\t0" in out and "stable\t1" in out

    rc = main(["query", "--dict", str(d), "--term", "tble",
               "--max-distance", "1", "--substring"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "turntable\t1\t5" in out and "table\t1\t1" in out


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
