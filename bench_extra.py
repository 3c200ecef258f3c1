#!/usr/bin/env python
"""Supplementary benchmarks (r6). bench.py is FROZEN for measurement, so
everything diagnostic or additive lives here:

  python bench_extra.py queries [repeat]   noop-sink isolation of the 7
                                           headline queries (guide §1.4),
                                           min + all samples per query
  python bench_extra.py crawl [trials]     crawl-rounds phase breakdown
                                           (per-round phase_walls from the
                                           round loop's own timers)
  python bench_extra.py sweeps [trials]    VERDICT r5 item 6: the crawl
                                           with the periodic production
                                           sweeps FIRING mid-crawl
                                           (blocklist + trap + pagerank on
                                           round 1) — urls/s comparable to
                                           the plain crawl number

Same env contract as bench.py: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS.
Prints one JSON line per mode.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.environ.get("MCS_BENCH_CACHE", os.path.join(HERE, ".bench_cache"))


def _sf() -> float:
    name = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _spark():
    from metadata_crawler_spark.session import get_spark

    return get_spark(f"mcs-bench-extra-{CPUS}", cores=CPUS, shuffle_partitions=CPUS)


def _fixtures():
    from metadata_crawler_spark.sources.fixtures import write_fixtures

    n_pages = max(20_000, int(1_200_000 * _sf()))
    fx_dir = os.path.join(CACHE, f"pages_{n_pages}")
    return write_fixtures(fx_dir, n_pages), n_pages


def queries_mode(repeat: int) -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(HERE, "__spark_entry__.py")
    )
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)
    spark = _spark()
    out = {}
    for name in (
        "q01_frontier_schedule", "q06_lookup_join", "q13_counters",
        "q16_text_metrics", "q21_minhash_signatures", "q25_cosine_topk",
        "q38_sessionize",
    ):
        fn = entry_mod.queries()[name]
        samples = []
        for _ in range(repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
    spark.stop()
    print(json.dumps({"mode": "queries", "sf": _sf(), "queries": out}))


def _run_crawl(spark, fx_paths, config, rounds: int = 2) -> dict:
    from pyspark.sql import functions as F

    from metadata_crawler_spark.plans.round_loop import Crawler

    ckpt = tempfile.mkdtemp(prefix="mcs_bx_ck_")
    try:
        pages = spark.read.parquet(fx_paths["pages"])
        seeds = (
            pages.select("url")
            .withColumn("depth", F.lit(0))
            .withColumn("priority", F.lit(1.0))
        )
        crawler = Crawler(
            spark=spark,
            pages_path=fx_paths["pages"],
            robots=spark.read.parquet(fx_paths["robots"]),
            hosts=spark.read.parquet(fx_paths["hosts"]),
            checkpoint_dir=ckpt,
            config=config,
        )
        t0 = time.time()
        results = crawler.run(seeds, rounds=rounds)
        wall = time.time() - t0
        processed = sum(r["frontier_in"] for r in results)
        return {
            "wall_s": round(wall, 3),
            "frontier_urls": processed,
            "urls_per_sec": round(processed / wall, 1),
            "rounds": [
                {
                    "round": r["round"],
                    "wall_s": r["wall_s"],
                    "phase_walls": r.get("phase_walls"),
                }
                for r in results
            ],
        }
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def crawl_mode(trials: int, with_sweeps: bool) -> None:
    from metadata_crawler_spark.plans.round_loop import CrawlConfig

    fx_paths, n_pages = _fixtures()
    spark = _spark()
    if with_sweeps:
        # sweep rounds FIRE mid-crawl: host-quality blocklist mining,
        # trap mining and the PageRank frontier re-score all run in the
        # measured wall (rounds 0 and 2 of 4 at cadence 2) — the
        # production loop with its periodic work amortized over the
        # cadence, not the plain rounds and not the every-round stress
        # case (that one: pass every=1 by editing here; measured 8.5k
        # urls/s vs 23k plain at the r6 bench corpus)
        config = CrawlConfig(
            n_shards=CPUS, salt_parts=8,
            blocklist_every=2, trap_every=2, pagerank_every=2,
        )
        n_rounds = 4
    else:
        config = CrawlConfig(n_shards=CPUS, salt_parts=8)
        n_rounds = 2
    best = None
    runs = []
    for _ in range(trials):
        r = _run_crawl(spark, fx_paths, config, rounds=n_rounds)
        runs.append({"urls_per_sec": r["urls_per_sec"], "wall_s": r["wall_s"]})
        if best is None or r["urls_per_sec"] > best["urls_per_sec"]:
            best = r
    spark.stop()
    print(
        json.dumps(
            {
                "mode": "sweeps" if with_sweeps else "crawl",
                "sf": _sf(),
                "n_pages": n_pages,
                "best": best,
                "runs": runs,
            }
        )
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    arg = int(sys.argv[2]) if len(sys.argv) > 2 else None
    if mode == "queries":
        queries_mode(arg or 3)
    elif mode == "crawl":
        crawl_mode(arg or 3, with_sweeps=False)
    elif mode == "sweeps":
        crawl_mode(arg or 3, with_sweeps=True)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
