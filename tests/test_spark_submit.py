"""Real ``spark-submit --py-files`` run of the pipeline (north-rule ops
path): package zipped, job script submitted as a subprocess, imports
resolved from the zip only, checkpoint outputs verified."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark
    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_py_files_pipeline(spark, tmp_path):
    submit = _spark_submit()
    assert submit, "spark-submit not found"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # input corpus (made with the session fixture; the submitted job gets
    # its own JVM)
    from liblevenshtein_rust_spark.sources.transcripts import synth_transcripts
    tdf, _ = synth_transcripts(spark, 120, seed=3)
    inp = str(tmp_path / "turns")
    tdf.write.mode("overwrite").parquet(inp)

    # package zip — the ONLY way the job can import the package
    zpath = str(tmp_path / "lls.zip")
    pkg = os.path.join(repo, "liblevenshtein_rust_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))

    ckpt = str(tmp_path / "ckpt")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [submit, "--master", "local[2]", "--py-files", zpath,
         os.path.join(repo, "scripts", "submit_pipeline.py"),
         "--input", inp, "--checkpoint-dir", ckpt, "--run-id", "s1",
         "--max-distance", "1"],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo root: no implicit source imports
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    info = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert info, proc.stdout
    stages = json.loads(info[-1])
    assert stages["turn_entities"]["rows"] == 120
    out = spark.read.parquet(os.path.join(ckpt, "s1", "turn_entities"))
    assert out.count() == 120 and "entity_id" in out.columns


def test_spark_submit_master_is_not_overridden(tmp_path):
    """ADVICE r3 (high): in a fresh spark-submit python driver, SparkConf()
    is an empty local dict (no JVM yet), so the old guard could not see the
    submitted --master and silently forced local[*]. get_spark() must honor
    the submitted master — PYSPARK_GATEWAY_PORT marks the external gateway."""
    submit = _spark_submit()
    assert submit, "spark-submit not found"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    zpath = str(tmp_path / "lls.zip")
    pkg = os.path.join(repo, "liblevenshtein_rust_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))

    job = tmp_path / "print_master.py"
    job.write_text(
        "import json\n"
        "from liblevenshtein_rust_spark.session import get_spark\n"
        "spark = get_spark('master-probe')\n"
        "print(json.dumps({'master': spark.sparkContext.master}))\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    # local[3] is distinguishable from both the local[*] default and the
    # SPARK_GRAFT_CPUS test settings
    proc = subprocess.run(
        [submit, "--master", "local[3]", "--py-files", zpath, str(job)],
        capture_output=True, text=True, timeout=240,
        cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout
    assert json.loads(lines[-1])["master"] == "local[3]"
