"""True spark-submit --py-files parity on a multi-executor master.

The north rule runs the crawl "via spark-submit --py-files on a
multi-executor cluster". Every other test uses local[N] (one JVM,
threads); this one launches the REAL submission path the rule names:

- ``spark-submit --master local-cluster[2,2,1200]`` — Spark's
  pseudo-cluster master spawns two SEPARATE executor JVMs with their own
  Python workers (the closest a single sandbox box gets to a cluster);
- ``--py-files mcs.zip`` is the ONLY way the package reaches those
  workers: the subprocess runs from a neutral CWD with the repo scrubbed
  from PYTHONPATH, so a worker-side import that ship_package/--py-files
  does not cover fails loudly here instead of on a user's cluster;
- the submitted driver runs real crawl rounds (plans/run_crawl.main on
  a self-generated fixture corpus) and prints the executor count taken
  from the Spark scheduler, which the test asserts is multi-executor.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark

    path = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if not os.path.exists(path):
        pytest.skip("spark-submit launcher not present in this pyspark install")
    return path


def _build_zip(path: str) -> None:
    # the SAME builder ship_package uses, so this test ships the
    # identical artifact shape the production addPyFile path does
    from metadata_crawler_spark.session import build_pyfiles_zip

    build_pyfiles_zip(path)


_SHIM = """\
import json
import sys

from metadata_crawler_spark.plans.run_crawl import main
from pyspark.sql import SparkSession

# keep the session alive across main()'s spark.stop() so the probe reads
# the SAME context the crawl ran on (not a fresh one)
_orig_stop = SparkSession.stop
SparkSession.stop = lambda self: None
rc = main(sys.argv[1:])
spark = SparkSession.getActiveSession()
sc = spark.sparkContext
print(json.dumps({
    "probe": "cluster",
    "master": sc.master,
    # driver + one entry per live executor JVM
    "n_executors": sc._jsc.sc().getExecutorMemoryStatus().size() - 1,
}))
SparkSession.stop = _orig_stop
spark.stop()
sys.exit(rc)
"""


def test_spark_submit_pyfiles_local_cluster(tmp_path):
    submit = _spark_submit()
    zpath = str(tmp_path / "mcs.zip")
    _build_zip(zpath)
    shim = tmp_path / "driver_shim.py"
    shim.write_text(_SHIM)

    env = dict(os.environ)
    # the zip must be the ONLY route to the package
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # --master must be the ONLY route to the master: with
    # SPARK_GRAFT_MASTER exported, get_spark would take its explicit
    # override branch and the gateway-honoring branch this test pins
    # (don't clobber a submitted --master with local[N]) would go
    # untested — a reintroduced clobber would still pass.
    env.pop("SPARK_GRAFT_MASTER", None)
    # keep the pseudo-cluster modest: fixture corpus, few shuffle parts
    ck = str(tmp_path / "ck")
    proc = subprocess.run(
        [
            submit,
            "--master", "local-cluster[2,2,1200]",
            "--conf", "spark.executor.memory=1g",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            str(shim),
            "--fixtures", "400",
            "--rounds", "2",
            "--cores", "4",
            "--checkpoint", ck,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # neutral CWD: repo not importable implicitly
        timeout=840,
    )
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [
        json.loads(ln)
        for ln in proc.stdout.splitlines()
        if ln.startswith("{")
    ]
    rounds = [d for d in lines if "scheduled" in d and "round" in d]
    probe = [d for d in lines if d.get("probe") == "cluster"]
    assert probe, f"no cluster probe line in: {proc.stdout[-2000:]}"
    assert probe[0]["master"].startswith("local-cluster"), probe[0]
    assert probe[0]["n_executors"] >= 2, probe[0]
    assert len(rounds) >= 2, f"expected 2 round summaries: {lines}"
    # the crawl actually progressed on the pseudo-cluster
    assert rounds[0]["scheduled"] > 0, rounds
