"""Randomized differential tests: the distributed implementations of the
two new algorithmic cores (single-link min-label components, gap
sessionization) against trivially-correct pure-Python oracles on seeded
random inputs. Seeded generators, not wall-clock — failures reproduce."""

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from slowspark.aggregate import session_windows
from slowspark.textops import connected_min_labels


def _union_find_min_labels(edges):
    """Oracle: classic union-find, then component min."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min = {}
    for node in list(parent):
        root = find(node)
        comp_min[root] = min(comp_min.get(root, node), node)
    return {node: comp_min[find(node)] for node in parent}


def test_connected_min_labels_random_graphs(spark):
    rng = random.Random(1234)
    for trial in range(4):
        n_nodes = rng.randint(4, 40)
        n_edges = rng.randint(1, 60)
        edges = sorted({
            tuple(sorted(rng.sample(range(n_nodes * 3), 2)))
            for _ in range(n_edges)
        })
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["id"]: r["label"] for r in connected_min_labels(pairs).collect()}
        want = _union_find_min_labels(edges)
        assert got == want, f"trial {trial}: {edges}"


def _py_sessionize(rows, gap_s):
    """Oracle: sort per key, split on gap, number sessions 1..k in start
    order (matching the running-sum ids), aggregate."""
    by_key = {}
    for key, ts in rows:
        by_key.setdefault(key, []).append(ts)
    for key, tss in by_key.items():
        tss.sort()
        seq = 0
        start = last = tss[0]
        n = 0
        for t in tss:
            if n > 0 and (t - last).total_seconds() > gap_s:
                seq += 1
                yield (key, seq, start, last, n)
                start, n = t, 0
            last = t
            n += 1
        seq += 1
        yield (key, seq, start, last, n)


def test_session_windows_random_timestamps(spark):
    rng = random.Random(99)
    base = datetime(2020, 1, 1)
    rows = []
    for key in ("u1", "u2", "u3"):
        t = base + timedelta(seconds=rng.randint(0, 100))
        for _ in range(rng.randint(1, 60)):
            t = t + timedelta(seconds=rng.randint(0, 300))
            rows.append((key, t))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        (r["user_id"], r["session_seq"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_windows(df, ["user_id"], "ts", gap_minutes=1).collect()
    }
    want = set(_py_sessionize(rows, 60))
    assert got == want


def test_group_quantiles_matches_python(spark):
    import math

    from slowspark.aggregate import group_quantiles

    vals = {"fp_a": [5.0, 1.0, 3.0, 2.0, 4.0, 9.0, 7.0],
            "fp_b": [10.0, 20.0],
            "fp_c": [42.0]}
    rows = [
        (g, i * 100 + j, v)
        for i, (g, vs) in enumerate(sorted(vals.items()))
        for j, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "fingerprint string, entry_id long, query_time double")
    got = {
        r["fingerprint"]: (r["n"], r["q50"], r["q95"], r["q99"])
        for r in group_quantiles(df, "query_time").collect()
    }
    for g, vs in vals.items():
        s = sorted(vs)
        n = len(s)
        want = tuple(s[math.ceil(p * n) - 1] for p in (0.5, 0.95, 0.99))
        assert got[g] == (n,) + want, g


def test_group_quantiles_partition_invariant_and_validates(spark):
    import pytest as _pytest

    from slowspark.aggregate import group_quantiles

    rows = [("g", i, float((i * 37) % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, "fingerprint string, entry_id long, query_time double")
    a = group_quantiles(df.repartition(1), "query_time").collect()[0]
    b = group_quantiles(df.repartition(13), "query_time").collect()[0]
    assert a.asDict() == b.asDict()
    with _pytest.raises(ValueError, match="ps must be in"):
        group_quantiles(df, "query_time", ps=(0.0,))
