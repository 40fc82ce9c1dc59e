"""Round-6 optimization side-bench (bench.py is FROZEN for measurement;
this file exists so optimization work can be measured per-query without
touching the driver's harness — guide §1.1/§1.4).

Mirrors bench.py's query methodology exactly (cold `.collect()` then
min-of-3 warm) for any subset of the timed queries, and can addition-
ally time the pure computation via the noop sink (guide §1.4) so the
orderBy/collect tail is separable from the map work.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      [query ...]            # default: the full bench.py query list
Env:
  SPARK_GRAFT_CPUS   core count (default 32)
  BENCH_EXTRA_NOOP=1 also time df.write.format("noop") per query
  BENCH_EXTRA_PLANS=plans/r06/suffix  dump explain("formatted") per
                     query to <dir>_<query>.txt (suffix "before"/"after")

Prints one JSON line: {"sf": ..., "queries": {name: cold, name_warm: w,
name_noop: n?, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "extract_fast", "extract_spans", "dedup_exact", "minhash_signatures",
    "token_counts", "ann_topk", "substring_dedup", "hll_host_distinct",
    "cms_token_freq",
]


def _dump_plan(df, spark, dest: str) -> None:
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with open(dest, "w") as f:
        f.write(plan)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    do_noop = os.environ.get("BENCH_EXTRA_NOOP", "0") == "1"
    plan_prefix = os.environ.get("BENCH_EXTRA_PLANS", "")
    names = sys.argv[1:] or BENCH_QUERIES
    sf_name = os.path.basename(sf_dir.rstrip("/"))

    from zpdfspark.spark.session import get_spark

    spark = get_spark(cpus, "bench-extra", shuffle_partitions=cpus)
    out: dict[str, float] = {}
    try:
        import __spark_entry__ as entry_mod

        entry_mod._corpus_path(sf_dir)  # materialize outside timing
        qs = entry_mod.queries()
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            if name == "ann_pq_adc":
                # bench.py times query CONSTRUCTION (PQ training jobs)
                # + collect together for this one
                t0 = time.perf_counter()
                entry_mod._q_ann_pq_adc(spark, sf_dir, topn=100).collect()
                out[name] = round(time.perf_counter() - t0, 3)
                continue
            if name == "ann_ivf":
                df = qs[name](spark, sf_dir)
                t0 = time.perf_counter()
                df.collect()
                out[name] = round(time.perf_counter() - t0, 3)
                continue
            if name == "cc_chain_star":
                import pyspark.sql.functions as F

                from zpdfspark.spark.cc import connected_components

                chain_n, n_stars, spokes, base = 50_000, 50, 1_000, 1_000_000
                chain = spark.range(chain_n).select(
                    F.col("id").alias("src"),
                    (F.col("id") + 1).alias("dst"))
                stars = spark.range(n_stars * spokes).select(
                    (F.lit(base) + (F.col("id") / spokes).cast("long")
                     * (spokes + 1)).alias("src"),
                    (F.lit(base) + (F.col("id") / spokes).cast("long")
                     * (spokes + 1) + 1 + F.col("id") % spokes).alias("dst"))
                rc: list = []
                t0 = time.perf_counter()
                n_comp = (connected_components(
                    chain.unionByName(stars), _round_counter=rc)
                    .select("rep").distinct().count())
                out[name] = round(time.perf_counter() - t0, 3)
                out[name + "_rounds"] = rc[0]
                assert n_comp == 1 + n_stars
                continue
            if name == "wet_export":
                import shutil
                import tempfile

                from zpdfspark.spark.warc_sink import write_wet

                wet_dir = tempfile.mkdtemp(prefix="bench_extra_wet_")
                try:
                    corpus_df = spark.read.parquet(
                        entry_mod._corpus_path(sf_dir))
                    t0 = time.perf_counter()
                    n_wet = sum(r["n_records"] for r in write_wet(
                        corpus_df, wet_dir, partitions=cpus).collect())
                    out[name] = round(time.perf_counter() - t0, 3)
                    out["wet_docs_per_sec"] = round(n_wet / out[name], 1)
                finally:
                    shutil.rmtree(wet_dir, ignore_errors=True)
                continue
            df = qs[name](spark, sf_dir)
            if plan_prefix:
                _dump_plan(df, spark, f"{plan_prefix}_{name}.txt")
            t0 = time.perf_counter()
            df.collect()
            out[name] = round(time.perf_counter() - t0, 3)
            warm = []
            for _ in range(3):
                t0 = time.perf_counter()
                df.collect()
                warm.append(time.perf_counter() - t0)
            out[name + "_warm"] = round(min(warm), 3)
            if do_noop:
                df2 = qs[name](spark, sf_dir)
                t0 = time.perf_counter()
                df2.write.format("noop").mode("overwrite").save()
                out[name + "_noop"] = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
    finally:
        spark.stop()
    print(json.dumps({"sf": sf_name, "cpus": cpus, "queries": out}))


if __name__ == "__main__":
    main()
