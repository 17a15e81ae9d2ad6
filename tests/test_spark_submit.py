"""North-rule deployment smoke: the engine runs via ``spark-submit
--py-files iscc_search_spark.zip`` with NO repo on the python path.

The north rule requires the job to run "via spark-submit --py-files on a
multi-executor cluster"; the sandbox has no cluster, but the packaging
contract is testable: zip the package exactly as the README documents,
strip PYTHONPATH, and drive a real ``spark-submit`` subprocess that
builds an index and answers a BM25 query through the CLI entry points.
The launcher asserts the package actually resolved from inside the zip
(driver side), and Arrow python workers get it via the same zip through
``session.get_spark``'s PYTHONPATH export (the zip path IS the package
parent when imported from a zip).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAUNCHER = '''
import json
import iscc_search_spark
from iscc_search_spark.cli import main
from iscc_search_spark.session import get_spark

# pre-create the session so both CLI invocations share one JVM
spark = get_spark(app_name="submit-smoke", cores=4, shuffle_partitions=8)
print(json.dumps({"pkg_file": iscc_search_spark.__file__}), flush=True)
rc = main(["build", "--pages", PAGES, "--index", INDEX,
           "--parts", "8", "--shards", "8", "--group-size", "4"])
assert rc == 0
rc = main(["search", "--index", INDEX, "--query", QUERY, "-k", "5"])
assert rc == 0
spark.stop()
'''


def _make_zip(zpath: str) -> None:
    pkg = os.path.join(REPO, "iscc_search_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_build_and_search(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    zpath = str(tmp_path / "iscc_search_spark.zip")
    _make_zip(zpath)

    from iscc_search_spark import corpus

    pages = str(tmp_path / "pages.parquet")
    corpus.write_pages(pages, n_docs=300, seed=7)
    query = corpus.generate_queries(12, seed=7)[0]
    index = str(tmp_path / "index")

    launcher = tmp_path / "job.py"
    launcher.write_text(
        "PAGES = %r\nINDEX = %r\nQUERY = %r\n" % (pages, index, query)
        + LAUNCHER
    )

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--py-files", zpath, str(launcher),
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    rows = [
        json.loads(line)
        for line in r.stdout.splitlines()
        if line.startswith("{")
    ]
    # the package resolved from inside the shipped zip, not a repo checkout
    pkg_file = next(x for x in rows if "pkg_file" in x)["pkg_file"]
    assert "iscc_search_spark.zip" in pkg_file, pkg_file
    build = next(x for x in rows if "n_docs" in x)
    parts_built = build["parts_built"]
    if isinstance(parts_built, list):
        parts_built = len(parts_built)
    assert build["n_docs"] == 300 and parts_built >= 1
    hits = [x for x in rows if "score" in x]
    assert len(hits) == 5
    assert all(h["score"] > 0 for h in hits)
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)
