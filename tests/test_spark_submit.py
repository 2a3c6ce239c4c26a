"""Ship-path integration: the north rule's delivery vehicle is
`spark-submit --py-files slowspark.zip <job.py>`. This test proves the
packaged zip is SELF-SUFFICIENT: it builds dist/slowspark.zip with
scripts/make_pyfiles.py, copies job.py to a temp dir (so the repo
checkout is not importable as a sibling package), and spark-submits
from there with only the zip on --py-files — the census must equal the
analytic expectation, same as the in-repo CLI smoke."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on host"
)
def test_spark_submit_pyfiles_zip_is_self_sufficient(tmp_path):
    # 1. package
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "make_pyfiles.py")],
        capture_output=True, text=True, cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr
    zip_path = os.path.join(ROOT, "dist", "slowspark.zip")
    assert os.path.exists(zip_path)

    # 2. stage the entry file OUTSIDE the repo; the package must come
    # from the zip alone
    entry = tmp_path / "job_entry.py"
    shutil.copy(os.path.join(ROOT, "slowspark", "job.py"), entry)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)
    }
    wh = tmp_path / "wh"
    n_pages = 100
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--py-files", zip_path,
            str(entry),
            "--n-pages", str(n_pages),
            "--warehouse", str(wh),
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    # 3. the census line matches the analytic expectation
    census = None
    for line in r.stdout.replace("\r", "\n").splitlines():
        line = line.strip()
        if line.startswith("{"):
            census = json.loads(line)["kind_census"]
    assert census is not None, r.stdout[-2000:]
    sys.path.insert(0, ROOT)
    from slowspark.gen import expected_kind_counts

    assert census == expected_kind_counts(n_pages)
    # 4. the warehouse landed its fan-out sinks + manifests
    assert (wh / "_manifests").exists()
    assert any(p.name.startswith("sql_statements") for p in wh.iterdir())
