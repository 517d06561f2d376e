"""Benchmark runner (driver contract): one JSON line to stdout.

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:
  * index-build throughput over the documents table AND over a larger
    deterministic synthetic web corpus (the engine's true target shape)
  * per-query latency for the headline query set (__spark_entry__)

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., plus informative extras}.

Measurement protocol (r4 VERDICT Wrong #4): this VM's vCPU steal makes
identical deterministic runs vary 2-8x BETWEEN full passes even at
min-of-3 back-to-back reps (back-to-back reps share a steal burst).
So query entries are timed as the per-entry MIN across >=PASSES FULL
PASSES over the whole suite, and each pass starts with a pure-compute
CONTROL op (fixed numpy workload, zero Spark) whose reading calibrates
how contended that pass was; if the best two passes' controls disagree
by >1.5x an extra pass runs (bounded at MAX_PASSES). Builds stay
single-shot (they dominate wall time and are one-shot by nature) except
blocks_build, which is a pure overwrite and gets min-of-2.

The full record is written to bench_out.json BEFORE anything is printed;
stdout carries exactly ONE compact JSON line (bulky diagnostics live
only in the file) so a bounded stdout tail always contains the complete
line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_DOCS = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "50000"))
# within-pass repetitions per entry (min taken), as before
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
# full passes over the query suite (per-entry min across passes)
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
MAX_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_PASSES", "3"))


def control_op() -> float:
    """Pure-compute, Spark-free calibration workload: a fixed-seed
    800x800 float64 matmul chain. Deterministic FLOPs; wall time moves
    only with vCPU steal / memory-bandwidth contention. Calibrated band
    on an idle VM: ~0.15-0.35 s (recorded per pass so a contended pass
    is visible in the shipped record)."""
    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.standard_normal((800, 800))
    t0 = time.time()
    b = a
    for _ in range(6):
        b = b @ a
        b /= np.abs(b).max()
    return round(time.time() - t0, 3)


def timed_min(fn) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("orama-spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from orama_spark.build.indexer import IndexBuilder
    from orama_spark.config import IndexConfig
    from orama_spark.kernel.tokenizer import TokenizerConfig
    from orama_spark.sources.webpages import corpus_df

    timings: dict[str, float] = {}
    extras: dict = {"cpus": CPUS, "synth_docs": SYNTH_DOCS, "reps": REPS,
                    "n_driver_queries": len(entry_mod.queries())}

    # --- index build over the sf documents table (fresh, no resume)
    entry_idx_dir = os.path.join(
        "/dev/shm/orama_spark_entry_idx", os.path.basename(os.path.normpath(SF_DIR))
    )
    shutil.rmtree(entry_idx_dir, ignore_errors=True)
    t0 = time.time()
    idx = entry_mod._get_index(spark, SF_DIR)
    timings["index_build_documents"] = time.time() - t0
    n_docs = idx.stats["docs_count"]
    extras["documents_rows"] = n_docs
    extras["documents_build_docs_per_sec"] = round(
        n_docs / timings["index_build_documents"], 1
    )

    # --- index build over the synthetic web corpus (engine target shape:
    # full profile = stemming + stopwords, en-filtered, Zipf skew)
    web_cfg = IndexConfig(
        schema={"text": "string", "lang": "enum"},
        tokenizer=TokenizerConfig.full(),
        docid_col="doc_id",
    )
    web_dir = "/dev/shm/orama_spark_bench_webidx"
    shutil.rmtree(web_dir, ignore_errors=True)
    t0 = time.time()
    web = corpus_df(spark, SYNTH_DOCS, partitions=CPUS * 2).select(
        "doc_id", "text", "lang"
    )
    IndexBuilder(web_cfg, postings_partitions=CPUS * 2, docs_already_sorted=True).build(
        web, web_dir, input_id=f"bench-{SYNTH_DOCS}"
    )
    timings["index_build_web_synth"] = time.time() - t0
    extras["web_build_docs_per_sec"] = round(
        SYNTH_DOCS / timings["index_build_web_synth"], 1
    )

    # --- index build over a dense synthetic Japanese corpus: exercises
    # the dictionary segmenter (the ja/zh build bottleneck; vectorized
    # batch kernel in kernel/cjk_vec since r5).  Deterministic docs of
    # real cjdict words + punctuation, ~300 chars each.
    import random as _random

    from orama_spark.kernel.cjk_dict import _load as _cjdict_load

    _words = sorted(_cjdict_load().keys())
    _rng = _random.Random(1234)
    _ja_docs = []
    for _i in range(6000):
        _parts, _run = [], 0
        while sum(len(p) for p in _parts) < 300:
            _parts.append(_words[_rng.randrange(len(_words))])
            _run += 1
            if _run >= _rng.randint(4, 12):
                _parts.append("、。！？"[_rng.randrange(4)])
                _run = 0
        _ja_docs.append((_i, "".join(_parts)))
    _ja_chars = sum(len(t) for _, t in _ja_docs)
    ja_cfg = IndexConfig(
        schema={"text": "string"},
        tokenizer=TokenizerConfig(language="japanese"),
        docid_col="docid",
    )
    ja_dir = "/dev/shm/orama_spark_bench_jaidx"
    shutil.rmtree(ja_dir, ignore_errors=True)
    t0 = time.time()
    ja_df = spark.createDataFrame(_ja_docs, "docid long, text string").repartition(CPUS)
    IndexBuilder(ja_cfg, postings_partitions=CPUS).build(
        ja_df, ja_dir, input_id="bench-ja-6000"
    )
    timings["index_build_cjk_ja"] = round(time.time() - t0, 3)
    extras["cjk_ja_chars"] = _ja_chars
    extras["cjk_ja_chars_per_sec"] = round(
        _ja_chars / timings["index_build_cjk_ja"], 1
    )

    # --- headline queries (driver-contract set). Round 1-3 excluded the
    # pairwise-self-join dedup queries as too slow for the bench budget;
    # after the round-3 Arrow shingle kernel they measure 3-8 s each at
    # sf0.1, so the full driver set is timed — no silent coverage caps.
    queries = dict(entry_mod.queries())
    # warmup: parquet footers + codegen caches (not part of query cost)
    queries["flt_single"](spark, SF_DIR).collect()
    # auxiliary index builds (tags/string[], German, PT15, QPS) happen
    # once here and are reported as builds, not inside query timings
    for aux, fn in {
        "aux_build_tags": lambda: entry_mod._get_tags_index(spark, SF_DIR),
        "aux_build_de": lambda: entry_mod._get_de_index(spark, SF_DIR),
        "aux_build_pt15": lambda: entry_mod._get_alt_index(spark, SF_DIR, "pt15"),
        "aux_build_qps": lambda: entry_mod._get_alt_index(spark, SF_DIR, "qps"),
        "aux_build_removed": lambda: entry_mod._get_removed_index(spark, SF_DIR),
        "aux_build_tr": lambda: entry_mod._get_tr_index(spark, SF_DIR),
        "aux_build_tagsrm": lambda: entry_mod._get_tags_removed_index(spark, SF_DIR),
        "aux_build_stream": lambda: entry_mod._get_streamed_index(spark, SF_DIR),
    }.items():
        t0 = time.time()
        fn()
        timings[aux] = round(time.time() - t0, 3)

    # --- web-profile query latency + WAND setup (shared across passes)
    from pyspark.sql import functions as F

    from orama_spark.query.engine import SearchIndex
    from orama_spark.query.wand import BlockIndex

    widx = SearchIndex.load(spark, web_dir, web_cfg)
    web_queries = {
        "web_q_or": dict(term="search engine index"),
        "web_q_and": dict(term="distributed computing", threshold=0.0),
        "web_q_prefix": dict(term="optimiz"),
        "web_q_fuzzy": dict(term="serch", tolerance=1),
    }

    # blocks_build is rebuildable (pure overwrite of blocks/+champions/),
    # so unlike the one-shot index builds it gets min-of-2 — round 3's
    # single-rep number (40.7 s vs 16.3+4.3 s standalone) was
    # burst-dominated on this VM.
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        bidx = BlockIndex.build(spark, web_dir, web_cfg)
        best = min(best, time.time() - t0)
    timings["blocks_build"] = round(best, 3)
    extras["blocks_build_protocol"] = "min of 2 full rebuilds"

    _batch6 = {
        "q0": "search engine index",
        "q1": "distributed computing analysis",
        "q2": "web page content",
        "q3": "data processing system",
        "q4": "query language model",
        "q5": "open source software",
    }

    def query_pass() -> dict[str, float]:
        """One full pass over every repeatable query entry."""
        t: dict[str, float] = {}
        for name, fn in queries.items():
            t[name] = timed_min(lambda: fn(spark, SF_DIR).collect())
        for name, kw in web_queries.items():
            t[name] = timed_min(lambda: widx.search(**kw).top_df().collect())
        t["web_q_wand"] = timed_min(
            lambda: bidx.wand_topk("search engine index", k=10).collect()
        )
        t["web_q_wand2"] = timed_min(
            lambda: bidx.wand_topk("distributed computing analysis", k=10).collect()
        )
        t["web_q_wand_batch6"] = timed_min(
            lambda: bidx.wand_topk_many(_batch6, k=10).collect()
        )
        return t

    # --- the multi-pass protocol (module docstring): per-entry min
    # across full passes, each pass tagged with its control reading
    controls: list[float] = []
    pass_mins: dict[str, float] = {}
    n_pass = 0
    while n_pass < PASSES or (
        n_pass < MAX_PASSES
        and len(controls) >= 2
        and sorted(controls)[1] > 1.5 * sorted(controls)[0]
    ):
        controls.append(control_op())
        t = query_pass()
        for kname, v in t.items():
            pass_mins[kname] = min(pass_mins.get(kname, float("inf")), v)
        n_pass += 1
        print(f"  pass {n_pass}: control={controls[-1]}s "
              f"total={round(sum(t.values()), 1)}s", file=sys.stderr, flush=True)
    timings.update(pass_mins)
    extras["control_op_sec"] = controls
    extras["passes"] = n_pass
    extras["protocol"] = (
        f"per-entry min of {REPS} reps x {n_pass} full passes; "
        "control = 800x800 float64 matmul chain, idle band 0.15-0.35 s"
    )

    extras["wand_pruning"] = bidx.pruning_stats("search engine index", k=10)
    extras["wand_pruning_2"] = bidx.pruning_stats(
        "distributed computing analysis", k=10
    )
    bstats = bidx.blocks.agg(
        F.sum("n").alias("postings"),
        (F.sum(F.length("docid_deltas")) + F.sum(F.length("field_lens"))).alias("bytes"),
    ).collect()[0]
    extras["block_bytes_per_posting"] = round(
        bstats["bytes"] / max(bstats["postings"], 1), 2
    )

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "index-build + BM25 query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR,
        "extra": extras,
    }
    # bench_out.json carries the FULL record and is written before any
    # stdout output; stdout gets one COMPACT line (slim extras only) so
    # a bounded tail capture cannot truncate mid-line (r3+r4 records
    # both lost the head of one large line).
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_out.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    slim = dict(out)
    slim["extra"] = {
        k: extras[k]
        for k in ("cpus", "reps", "passes", "control_op_sec",
                  "documents_build_docs_per_sec", "web_build_docs_per_sec",
                  "block_bytes_per_posting")
        if k in extras
    }
    print(json.dumps(slim), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
