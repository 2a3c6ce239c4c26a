#!/usr/bin/env python3
"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "pages_per_sec": ..., "cpus": ...}

--scaling mode: evidence for the north-rule two-cluster-size criterion in a
single-host sandbox — run the SAME pipeline job on the SAME input at
local[8] and local[32] via subprocesses, report throughput at both plus
efficiency = T32 / (4 * T8), and write BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def _n_pages_for_bench(spark, sf_dir: str) -> int:
    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    return max(1000, n_li // 20)  # sf0.1 -> 30k pages, ~90k entries


def run_pipeline_bench(spark, sf_dir: str) -> dict:
    """parse -> enrich -> route census -> fingerprint rollup on generated
    pages; returns {seconds, n_pages, n_entries, pages_per_sec}."""
    from pyspark.sql import functions as F

    from slowspark.aggregate import fingerprint_rollup, kind_census
    from slowspark.enrich import enrich
    from slowspark.gen import gen_pages, host_dc_dim, lang_locale_dim
    from slowspark.parse import parse_pages

    n_pages = _n_pages_for_bench(spark, sf_dir)
    pages = gen_pages(spark, n_pages)
    pages.write.mode("overwrite").parquet("/tmp/slowspark_bench_pages")
    pages_on_disk = spark.read.parquet("/tmp/slowspark_bench_pages")

    def once() -> tuple[float, dict, int]:
        t0 = time.perf_counter()
        entries = parse_pages(pages_on_disk)
        enriched = enrich(entries, host_dc_dim(spark), lang_locale_dim(spark)).persist()
        census = {r["entry_kind"]: r["n"] for r in kind_census(enriched).collect()}
        n_fp = fingerprint_rollup(enriched).count()
        dt = time.perf_counter() - t0
        enriched.unpersist()
        return dt, census, n_fp

    # min of 2: the first run pays Python-worker startup + codegen compile
    r1 = once()
    r2 = once()
    elapsed, census, n_fp = min(r1, r2, key=lambda r: r[0])
    n_entries = sum(census.values())
    return {
        "seconds": elapsed,
        "n_pages": n_pages,
        "n_entries": n_entries,
        "n_fingerprints": n_fp,
        "pages_per_sec": n_pages / elapsed,
        "census": census,
    }


def run_query_bench(spark, sf_dir: str) -> dict[str, float]:
    """Time each driver-contract query (collect() to force full execution)."""
    import __spark_entry__ as contract

    timings: dict[str, float] = {}
    for name, fn in contract.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        # operators like minhash_dedup cache intermediates; don't let one
        # query's cache skew the next query's memory budget
        spark.catalog.clearCache()
    return timings


def _fresh_session(cpus: int):
    from slowspark.session import get_spark

    spark = get_spark("slowspark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main_single(sf_dir: str, cpus: int, pipeline_only: bool) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # two fresh sessions: a long-lived local JVM degrades (codegen class
    # accumulation + GC) and this host shows heavy steal time — keep the
    # pipeline measurement isolated from the query sweep
    spark = _fresh_session(cpus)
    try:
        pipe = run_pipeline_bench(spark, sf_dir)
    finally:
        spark.stop()

    spark = _fresh_session(cpus)
    try:
        queries = {} if pipeline_only else run_query_bench(spark, sf_dir)
        queries["pipeline_parse_route_agg"] = round(pipe["seconds"], 3)
        total = round(sum(queries.values()), 3)
        return {
            "metric": "parse->route->aggregate throughput (pages/sec) + headline query latencies",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": _sf_from_dir(sf_dir),
            "cpus": cpus,
            "pages_per_sec": round(pipe["pages_per_sec"], 1),
            "n_pages": pipe["n_pages"],
            "n_entries": pipe["n_entries"],
        }
    finally:
        spark.stop()


def main_scaling(sf_dir: str) -> dict:
    """Same job, same input, two parallelism levels (N=8, 4N=32)."""
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus),
             "--pipeline-only", "--sf-dir", sf_dir],
            capture_output=True, text=True, timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["pages_per_sec"]
    t32 = results[32]["pages_per_sec"]
    eff = t32 / (4 * t8)
    report = {
        "throughput_pages_per_sec": {"local[8]": t8, "local[32]": t32},
        "seconds": {
            "local[8]": results[8]["queries"]["pipeline_parse_route_agg"],
            "local[32]": results[32]["queries"]["pipeline_parse_route_agg"],
        },
        "scaling_efficiency_8_to_32": round(eff, 3),
        "n_pages": results[8]["n_pages"],
        "sf": results[8]["sf"],
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — scaling evidence (north_rule two-cluster-size criterion)\n\n"
            "Same pipeline job (parse -> enrich -> route census -> fingerprint\n"
            "rollup) on the SAME on-disk pages input at two parallelism levels\n"
            "(sandbox stand-in for N vs 4N executors).\n\n"
            f"| parallelism | seconds | pages/sec |\n|---|---|---|\n"
            f"| local[8]  | {report['seconds']['local[8]']} | {t8} |\n"
            f"| local[32] | {report['seconds']['local[32]']} | {t32} |\n\n"
            f"**Scaling efficiency** T32 / (4 x T8) = **{report['scaling_efficiency_8_to_32']}**\n"
            f"(criterion: >= 0.8) over {report['n_pages']} pages (sf={report['sf']}).\n"
        )
    return report


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    p.add_argument("--pipeline-only", action="store_true")
    p.add_argument("--scaling", action="store_true")
    args = p.parse_args()
    if args.scaling:
        print(json.dumps(main_scaling(args.sf_dir)))
    else:
        print(json.dumps(main_single(args.sf_dir, args.cpus, args.pipeline_only)))
