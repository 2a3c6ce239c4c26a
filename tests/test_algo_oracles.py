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
