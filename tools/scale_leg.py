"""Data-scale evidence leg (round-4 top ask): everything measured so
far was sf0.1 / 50k docs, where planner overhead dominates; this runs
the SAME jobs at 10x the data on the same parallelism (local[32]) so
per-query growth can be compared against data volume.

Two legs:

  A. web-corpus scale: 50k -> 500k -> 2M docs (deterministic synthetic
     web corpus, full tokenizer profile), corpus PRE-MATERIALIZED to
     parquet per the BASELINE.md protocol (generation excluded from
     build time). Measures index build (docs/s), BlockIndex build,
     plain vs WAND top-k latency (min-of-reps) and pruning stats at
     each scale — the WAND-vs-plain crossover appears where the plain
     scan outgrows WAND's fixed per-query orchestration (~2-3 s on
     this box: 3 driver jobs + ~5 stages).

  B. driver-query scale: the ENTIRE __spark_entry__.queries() batch at
     sf0.1 (documents=5k rows) and at a synthesized 10x directory
     (documents=50k, embeddings=20k — same schema/vocab/shape,
     deterministic seed), so every operator family (search, facets,
     geo, dedup self-joins, ANN, text kernels) gets a growth ratio
     against the 10x data ratio. Super-linear growth is the failure
     signal — the round-4 before-run caught exactly that (pair joins
     AQE-coalesced to one task; fixed by dedup._pin_pair_join, see
     SCALE_r04.json's before/after records). Reps are adaptive (a
     first rep over 60 s stands alone) and partials are persisted
     after every query.

Writes SCALE_r05.json by default ($SCALE_OUT overrides). Run on an otherwise-idle box:
this VM's vCPU steal contaminates concurrent measurements.

Usage: python tools/scale_leg.py [--leg A|B|all]
           [--web-scales 50000,500000,2000000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

WEB_SCALES = [50_000, 500_000]
QUERY_REPS = 3
OUT_PATH = os.path.join(REPO, os.environ.get("SCALE_OUT", "SCALE_r05.json"))
SF01 = "/root/testdata/sf0.1"
SF1_DIR = "/dev/shm/orama_spark_sf1"


def _spark(cpus: int = 32):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("orama-spark-scale-leg")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def timed_min(fn, reps: int = QUERY_REPS) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


# ------------------------------------------------------------- leg A

def leg_a(spark) -> dict:
    from pyspark.sql import functions as F

    from orama_spark.build.indexer import IndexBuilder
    from orama_spark.config import IndexConfig
    from orama_spark.kernel.tokenizer import TokenizerConfig
    from orama_spark.query.engine import SearchIndex
    from orama_spark.query.wand import BlockIndex
    from orama_spark.sources.webpages import corpus_df

    cfg = IndexConfig(
        schema={"text": "string", "lang": "enum"},
        tokenizer=TokenizerConfig.full(),
        docid_col="doc_id",
    )
    headline = "search engine index"
    second = "distributed computing analysis"
    out: dict = {}
    for n in WEB_SCALES:
        leg: dict = {"n_docs": n}
        corpus_pq = f"/dev/shm/orama_spark_scale_corpus_{n}"
        if not os.path.exists(os.path.join(corpus_pq, "_SUCCESS")):
            shutil.rmtree(corpus_pq, ignore_errors=True)
            t0 = time.time()
            corpus_df(spark, n, partitions=64).select(
                "doc_id", "text", "lang"
            ).write.mode("overwrite").parquet(corpus_pq)
            leg["corpus_materialize_s"] = round(time.time() - t0, 3)
        web = spark.read.parquet(corpus_pq)

        idx_dir = f"/dev/shm/orama_spark_scale_idx_{n}"
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        IndexBuilder(cfg, postings_partitions=64, docs_already_sorted=True).build(
            web, idx_dir, input_id=f"scale-{n}"
        )
        leg["index_build_s"] = round(time.time() - t0, 3)
        leg["build_docs_per_sec"] = round(n / leg["index_build_s"], 1)

        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            bidx = BlockIndex.build(spark, idx_dir, cfg)
            best = min(best, time.time() - t0)
        leg["blocks_build_s"] = round(best, 3)

        widx = SearchIndex.load(spark, idx_dir, cfg)
        leg["q_plain_or"] = timed_min(
            lambda: widx.search(term=headline).top_df().collect()
        )
        leg["q_plain_and"] = timed_min(
            lambda: widx.search(term="distributed computing", threshold=0.0)
            .top_df().collect()
        )
        leg["q_plain_prefix"] = timed_min(
            lambda: widx.search(term="optimiz").top_df().collect()
        )
        leg["q_plain_fuzzy"] = timed_min(
            lambda: widx.search(term="serch", tolerance=1).top_df().collect()
        )
        leg["q_wand"] = timed_min(lambda: bidx.wand_topk(headline, k=10).collect())
        leg["q_wand_2"] = timed_min(lambda: bidx.wand_topk(second, k=10).collect())
        leg["wand_pruning"] = bidx.pruning_stats(headline, k=10)
        leg["wand_pruning_2"] = bidx.pruning_stats(second, k=10)
        leg["wand_vs_plain_ratio"] = round(leg["q_wand"] / leg["q_plain_or"], 3)
        # rank identity spot-check at this scale
        p = [(r["docid"], round(r["score"], 9))
             for r in widx.search(term=headline).top_df().collect()]
        w = [(r["docid"], round(r["score"], 9))
             for r in bidx.wand_topk(headline, k=10).collect()]
        leg["rank_identical"] = p == w
        bstats = bidx.blocks.agg(
            F.sum("n").alias("postings"),
            (F.sum(F.length("docid_deltas")) + F.sum(F.length("field_lens"))
             + F.sum(F.length("tfns"))).alias("bytes"),
        ).collect()[0]
        leg["block_bytes_per_posting"] = round(
            bstats["bytes"] / max(bstats["postings"], 1), 2
        )
        leg["postings"] = int(bstats["postings"])
        out[str(n)] = leg
        print(json.dumps({f"legA_{n}": leg}), flush=True)
    if len(WEB_SCALES) >= 2:
        a, b = out[str(WEB_SCALES[0])], out[str(WEB_SCALES[-1])]
        out["summary"] = {
            "data_ratio": WEB_SCALES[-1] / WEB_SCALES[0],
            "build_throughput_ratio": round(
                b["build_docs_per_sec"] / a["build_docs_per_sec"], 3
            ),
            "crossover": {
                "small_wand_over_plain": a["wand_vs_plain_ratio"],
                "large_wand_over_plain": b["wand_vs_plain_ratio"],
                "wand_wins_at_large": b["q_wand"] < b["q_plain_or"],
            },
            "query_growth": {
                k: round(b[k] / a[k], 2)
                for k in ("q_plain_or", "q_plain_and", "q_plain_prefix",
                          "q_plain_fuzzy", "q_wand", "q_wand_2")
            },
        }
    return out


# ------------------------------------------------------------- leg B

_TWIN_VERSION = "v3-events"


def synth_sf1(spark) -> None:
    """Synthesize a 10x driver-table directory: same schemas, vocab and
    shape as /root/testdata/sf0.1 (documents 5k -> 50k rows, embeddings
    2k -> 20k rows), deterministic (seed 42); testdata itself is
    read-only so the scaled twin lives in /dev/shm.

    Each table is written as a DIRECTORY of part files (16 doc parts /
    8 embedding parts): r4's single-file twin had one row group, so
    every scan was one partition and whole explode/join chains ran in
    one task — map-only ops looked 10-13x superlinear on 32 idle cores
    (r4 VERDICT Wrong; the real cause was the input shape, not the
    operators). Spark reads a *.parquet directory transparently."""
    import duckdb

    done = os.path.join(SF1_DIR, "_DONE")
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == _TWIN_VERSION:
                return
    shutil.rmtree(SF1_DIR, ignore_errors=True)
    os.makedirs(SF1_DIR)
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) "
            f"FROM '{SF01}/documents.parquet'"
        ).fetchall()
        if r[0]
    ]
    vocab = np.array(sorted(vocab), dtype=object)
    langs = np.array(
        sorted(r[0] for r in con.sql(
            f"SELECT DISTINCT lang FROM '{SF01}/documents.parquet'"
        ).fetchall()),
        dtype=object,
    )
    rng = np.random.default_rng(42)
    n_docs = 50_000
    n_words = rng.integers(8, 110, size=n_docs)
    texts = []
    for i in range(n_docs):
        words = vocab[rng.integers(0, len(vocab), size=n_words[i])]
        texts.append(" ".join(words))
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": langs[rng.integers(0, len(langs), size=n_docs)],
            "source": np.array(
                [f"src{i}" for i in rng.integers(0, 20, size=n_docs)], dtype=object
            ),
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype(np.int64)
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Exact testdata schemas (pyarrow, not duckdb inference: embeddings
    # must stay list<float>, not double[]).
    docs_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    doc_table = pa.Table.from_pandas(
        docs, schema=docs_schema, preserve_index=False
    )
    docs_dir = os.path.join(SF1_DIR, "documents.parquet")
    os.makedirs(docs_dir)
    n_parts = 16
    step = -(-n_docs // n_parts)
    for p in range(n_parts):
        pq.write_table(
            doc_table.slice(p * step, step),
            os.path.join(docs_dir, f"part-{p:05d}.parquet"),
        )
    n_emb = 20_000
    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    emb_table = pa.table(
        {
            "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1)), 64
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n_emb).astype(np.int32)),
        }
    )
    emb_dir = os.path.join(SF1_DIR, "embeddings.parquet")
    os.makedirs(emb_dir)
    estep = -(-n_emb // 8)
    for p in range(8):
        pq.write_table(
            emb_table.slice(p * estep, estep),
            os.path.join(emb_dir, f"part-{p:05d}.parquet"),
        )
    # events 100k -> 1M rows over the same 30-day span (10x density),
    # same schema as testdata (naive timestamps, json-ish props)
    n_ev = 1_000_000
    base_us = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z in µs
    span_us = np.int64(30 * 24 * 3600) * 1_000_000
    ts_us = np.sort(base_us + (rng.random(n_ev) * span_us).astype(np.int64))
    etypes = np.array(["click", "error", "purchase", "signup", "view"], dtype=object)
    ev_table = pa.table(
        {
            "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 15_000, size=n_ev)),
            "event_type": pa.array(etypes[rng.integers(0, 5, size=n_ev)]),
            "value": pa.array(np.round(rng.random(n_ev) * 560.0, 2)),
            "props": pa.array(
                np.char.add(
                    np.char.add(
                        '{"k": ',
                        rng.integers(0, 100, size=n_ev).astype(str)
                    ),
                    "}",
                ).astype(object)
            ),
        }
    )
    ev_dir = os.path.join(SF1_DIR, "events.parquet")
    os.makedirs(ev_dir)
    vstep = -(-n_ev // 8)
    for p in range(8):
        pq.write_table(
            ev_table.slice(p * vstep, vstep),
            os.path.join(ev_dir, f"part-{p:05d}.parquet"),
        )
    with open(os.path.join(SF1_DIR, "_DONE"), "w") as f:
        f.write(_TWIN_VERSION)


def leg_b(spark) -> dict:
    import __spark_entry__ as entry_mod

    synth_sf1(spark)
    out: dict = {}
    for label, sf_dir in (("sf0.1", SF01), ("sf1.0", SF1_DIR)):
        timings: dict = {}
        qs = entry_mod.queries()
        # warm parquet footers/codegen like bench.py, then time builds
        # (the _get_* caches are per sf_dir)
        t0 = time.time()
        qs["flt_single"](spark, sf_dir).collect()
        timings["_warmup_and_main_build"] = round(time.time() - t0, 3)
        for name, fn in qs.items():
            try:
                # adaptive reps: min-of-2 for ordinary queries; a first
                # rep over 60 s IS the number (re-running a multi-minute
                # pairwise join doubles leg cost for no extra signal)
                t0 = time.time()
                fn(spark, sf_dir).collect()
                first = time.time() - t0
                if first <= 60:
                    t0 = time.time()
                    fn(spark, sf_dir).collect()
                    timings[name] = round(min(first, time.time() - t0), 3)
                else:
                    timings[name] = round(first, 3)
            except Exception as e:  # record, don't abort the leg
                timings[name] = f"ERR {type(e).__name__}"
            print(f"  [{label}] {name}: {timings[name]}", file=sys.stderr,
                  flush=True)
            # crash-safe: persist partials after every query
            with open(OUT_PATH + ".partial", "w") as f:
                json.dump({**out, label: timings}, f)
        out[label] = timings
    growth = {}
    for name, small in out["sf0.1"].items():
        big = out["sf1.0"].get(name)
        if isinstance(small, float) and isinstance(big, float) and small > 0:
            growth[name] = round(big / small, 2)
    out["growth_ratio_10x_data"] = growth
    out["superlinear"] = {k: v for k, v in growth.items() if v > 10.0}
    return out


def main() -> None:
    global WEB_SCALES
    leg = "all"
    if "--leg" in sys.argv:
        leg = sys.argv[sys.argv.index("--leg") + 1]
    if "--web-scales" in sys.argv:
        WEB_SCALES = [
            int(x) for x in
            sys.argv[sys.argv.index("--web-scales") + 1].split(",")
        ]
    spark = _spark()
    result: dict = {"protocol": {
        "parallelism": "local[32]",
        "query_reps": QUERY_REPS,
        "note": "min-of-reps; corpus pre-materialized to parquet",
    }}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            try:
                result.update(json.load(f))
            except Exception:
                pass
    if leg in ("A", "all"):
        prior = result.get("web_corpus_scale", {})
        prior.update(leg_a(spark))
        result["web_corpus_scale"] = prior
    if leg in ("B", "all"):
        result["driver_query_scale"] = leg_b(spark)
    with open(OUT_PATH, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
