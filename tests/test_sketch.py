"""sketch: Count-Min build/query/merge properties."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from slowspark.sketch import (
    build_cms,
    cms_heavy_hitters,
    cms_params,
    cms_query,
    merge_cms,
)


def test_cms_params_textbook():
    d, w = cms_params(0.01, 0.01)
    assert d == math.ceil(math.log(100))  # 5
    assert w == math.ceil(math.e / 0.01)  # 272
    with pytest.raises(ValueError, match="epsilon"):
        cms_params(0, 0.1)
    with pytest.raises(ValueError, match="delta"):
        cms_params(0.1, 1.0)


@pytest.fixture(scope="module")
def stream(spark):
    # zipf-ish: value v{i} appears (50 - i) times
    rows = [(f"v{i}",) for i in range(50) for _ in range(50 - i)]
    return spark.createDataFrame(rows, "term string")


def test_cms_never_underestimates(spark, stream):
    d, w = 4, 64  # deliberately narrow: collisions guaranteed
    cms = build_cms(stream, "term", d, w)
    truth = Counter(r["term"] for r in stream.collect())
    est = {
        r["term"]: r["cms_est"]
        for r in cms_query(
            stream.select("term").distinct(), cms, "term", d, w
        ).collect()
    }
    assert set(est) == set(truth)
    assert all(est[t] >= c for t, c in truth.items())
    # and at sane width the top value is estimated exactly or near it
    n = sum(truth.values())
    assert est["v0"] - truth["v0"] <= n  # trivial sanity at tiny width


def test_cms_exact_at_generous_width(spark, stream):
    d, w = 5, 4096  # wide enough that collisions are improbable
    cms = build_cms(stream, "term", d, w)
    out = cms_heavy_hitters(
        stream, "term", cms, stream.select("term").distinct(), d, w
    ).collect()
    assert len(out) == 50
    assert all(r["cms_est"] == r["exact"] for r in out)


def test_cms_merge_equals_whole(spark, stream):
    d, w = 4, 256
    rows = [r["term"] for r in stream.collect()]
    a = rows[:600]
    b = rows[600:]
    df_a = spark.createDataFrame([(t,) for t in a], "term string")
    df_b = spark.createDataFrame([(t,) for t in b], "term string")
    merged = merge_cms(
        build_cms(df_a, "term", d, w), build_cms(df_b, "term", d, w)
    )
    whole = build_cms(stream, "term", d, w)
    got = {(r["j"], r["col"]): r["c"] for r in merged.collect()}
    want = {(r["j"], r["col"]): r["c"] for r in whole.collect()}
    assert got == want


def test_cms_cell_bound(spark, stream):
    d, w = 3, 32
    cells = build_cms(stream, "term", d, w).collect()
    assert len(cells) <= d * w
    assert all(0 <= r["col"] < w and 0 <= r["j"] < d for r in cells)


def test_cms_weighted_build(spark):
    df = spark.createDataFrame(
        [("x", 10), ("x", 5), ("y", 2)], "term string, n long"
    )
    d, w = 4, 1024
    cms = build_cms(df, "term", d, w, weight_col="n")
    est = {
        r["term"]: r["cms_est"]
        for r in cms_query(
            df.select("term").distinct(), cms, "term", d, w
        ).collect()
    }
    assert est["x"] == 15 and est["y"] == 2
