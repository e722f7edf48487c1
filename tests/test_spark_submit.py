"""The north rule's deployment surface: `spark-submit --py-files crawlspark.zip`.

The sandbox has no multi-node cluster, but the *shipping* mechanics are
identical in local mode: `--py-files` distributes the zipped package to the
driver and every Python worker via PYTHONPATH/SparkFiles, exactly as it would
to 1000 executors. This test proves the package is actually self-contained
under that mechanism — it runs the crawl bench from a temp directory with
PYTHONPATH stripped, so `import crawlspark` (driver side) and the Arrow-UDF
workers (executor side) can only resolve the code from the shipped zip.
Reference parity: scrapemate ships as a single Go binary
(/root/reference/README.md quickstart); the PySpark-native equivalent of
"one deployable artifact" is the --py-files zip.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(dest: str) -> str:
    """Zip the crawlspark package with package-rooted arcnames (the layout
    --py-files expects: the zip root is a sys.path entry)."""
    zip_path = os.path.join(dest, "crawlspark.zip")
    pkg = os.path.join(REPO, "crawlspark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                arc = os.path.relpath(full, REPO)
                z.write(full, arc)
    return zip_path


def test_spark_submit_pyfiles_self_contained(tmp_path):
    dest = str(tmp_path)
    zip_path = _build_zip(dest)
    # the driver script is shipped alongside; its own sys.path fallback
    # (dirname(dirname(__file__))) points at tmp's parent, which does NOT
    # contain crawlspark — the zip is the only way the import can succeed
    script = os.path.join(dest, "run_crawl.py")
    shutil.copy(os.path.join(REPO, "bench", "run_crawl.py"), script)

    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    res = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.driver.memory=4g",
            "--py-files", zip_path,
            script,
            "--scale", "small", "--wave-budget", "300", "--max-waves", "2",
        ],
        capture_output=True, text=True, cwd=dest, env=env, timeout=600,
    )
    assert res.returncode == 0, f"spark-submit failed:\n{res.stderr[-4000:]}"
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON result line in stdout:\n{res.stdout[-2000:]}"
    out = json.loads(lines[-1])
    # the small world is seed-deterministic: same engine, same counters as an
    # in-process run — positive work on every ledger proves the full BSP loop
    # (politeness, dedup, image validation UDFs) executed out of the zip
    assert out["master"] == "local[2]"
    assert out["waves"] == 2
    assert out["scheduled"] > 0
    assert out["new_urls"] > 0
    assert out["deduped"] >= 0
    assert out["urls_per_sec"] > 0
