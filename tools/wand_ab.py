"""Standalone A/B: wand_topk vs plain path on the 50k web corpus.

Usage: python tools/wand_ab.py [n_docs] — builds (or reuses) the bench
web index in /dev/shm, times both paths 3 reps, prints pruning_stats
and rank-identity check.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
QUERY = "search engine index"

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .appName("wand-ab")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

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
web_dir = f"/dev/shm/orama_spark_wand_ab_{N_DOCS}"
if not os.path.exists(os.path.join(web_dir, "stats.json")):
    shutil.rmtree(web_dir, ignore_errors=True)
    web = corpus_df(spark, N_DOCS, partitions=64).select("doc_id", "text", "lang")
    IndexBuilder(cfg, postings_partitions=64, docs_already_sorted=True).build(
        web, web_dir, input_id=f"ab-{N_DOCS}"
    )

t0 = time.time()
if not os.path.exists(os.path.join(web_dir, "blocks")):
    bidx = BlockIndex.build(spark, web_dir, cfg)
    print(f"blocks_build: {time.time()-t0:.2f}s")
else:
    bidx = BlockIndex.load(spark, web_dir, cfg)
widx = SearchIndex.load(spark, web_dir, cfg)

plain, wand = [], []
for rep in range(3):
    t0 = time.time()
    p_rows = widx.search(term=QUERY).top_df().collect()
    plain.append(time.time() - t0)
    t0 = time.time()
    w_rows = bidx.wand_topk(QUERY, k=10).collect()
    wand.append(time.time() - t0)

stats = bidx.pruning_stats(QUERY, k=10)
p_ids = [(r["docid"], round(r["score"], 9)) for r in p_rows]
w_ids = [(r["docid"], round(r["score"], 9)) for r in w_rows]
print(json.dumps({
    "n_docs": N_DOCS, "query": QUERY,
    "plain_s": [round(x, 3) for x in plain],
    "wand_s": [round(x, 3) for x in wand],
    "plain_min": round(min(plain), 3), "wand_min": round(min(wand), 3),
    "ratio_min": round(min(wand) / min(plain), 2),
    "pruning": stats,
    "rank_identical": p_ids == w_ids,
}, indent=2))
spark.stop()
