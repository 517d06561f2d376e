"""spark-submit entry point (north rule: ships via spark-submit
--py-files on a multi-executor cluster).

    python tools/package.py
    spark-submit --master <cluster> --py-files dist/engine.zip \
        bench/run_bench.py [--docs 1000000] [--out /path/index]

Builds the inverted index over the deterministic synthetic web corpus
(or over --input parquet with (url, warc_ts, html, text, lang)), runs
the query batch, prints JSON metrics. On a real cluster the session
comes from spark-submit; no master is hardcoded here.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--input", default=None, help="parquet of web pages (else synthetic)")
    ap.add_argument("--out", default="/tmp/orama_spark_index")
    ap.add_argument("--queries", type=int, default=3, help="repeats of the query batch")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("orama-spark-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from orama_spark.build.indexer import IndexBuilder
    from orama_spark.config import IndexConfig
    from orama_spark.kernel.tokenizer import TokenizerConfig
    from orama_spark.query.engine import SearchIndex
    from orama_spark.sources.webpages import corpus_df, extract_text

    cfg = IndexConfig(
        schema={"text": "string", "lang": "enum", "url": "enum"},
        tokenizer=TokenizerConfig.full(),
        docid_col="doc_id",
    )

    t0 = time.time()
    if args.input:
        df = spark.read.parquet(args.input)
        if "doc_id" not in df.columns:
            # deterministic global doc ordering: sorted url (SURVEY §1.3)
            from pyspark.sql import Window

            df = df.withColumn(
                "doc_id",
                F.row_number().over(Window.orderBy("url")).cast("long") - 1,
            )
    else:
        df = corpus_df(spark, args.docs)
    # the engine indexes extracted text; assert the extraction invariant
    # on a sample (byte-identical text per url)
    sample = df.select("html", "text").limit(100).collect()
    for r in sample:
        assert extract_text(bytes(r["html"])) == r["text"], "extraction invariant"
    df = df.select("doc_id", "text", "lang", "url")
    IndexBuilder(cfg, docs_already_sorted=args.input is None).build(
        df, args.out, input_id=args.input or f"synth-{args.docs}"
    )
    t_build = time.time() - t0

    idx = SearchIndex.load(spark, args.out, cfg)
    queries = [
        dict(term="search engine index"),
        dict(term="distributed computing", threshold=0.0),
        dict(term="optimiz"),
        dict(term="serch", tolerance=1),
        dict(term="fox", where={"lang": {"eq": "en"}}),
    ]
    lat = []
    for _ in range(args.queries):
        for q in queries:
            tq = time.time()
            idx.search(**q).top_df().collect()
            lat.append(time.time() - tq)
    lat.sort()
    print(
        json.dumps(
            {
                "docs": args.docs,
                "build_sec": round(t_build, 2),
                "docs_per_sec": round(args.docs / t_build, 1),
                "query_p50_sec": round(lat[len(lat) // 2], 3),
                "query_p95_sec": round(lat[int(len(lat) * 0.95) - 1], 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
