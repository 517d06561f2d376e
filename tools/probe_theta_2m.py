"""One-off: report θ + pruning + rank identity at 2M for the two
scale-leg queries, loading the just-built posting-level-champion
blocks. Expected: θ(headline) ≈ 6.113007090613646 (the posting-level
pooled 10th sum probed via DuckDB), up from 3.7239 block-level."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from orama_spark.config import IndexConfig
from orama_spark.kernel.tokenizer import TokenizerConfig
from orama_spark.query.engine import SearchIndex
from orama_spark.query.wand import BlockIndex

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .appName("probe-theta-2m")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

cfg = IndexConfig(
    schema={"text": "string", "lang": "enum"},
    tokenizer=TokenizerConfig.full(),
    docid_col="doc_id",
)
idx_dir = "/dev/shm/orama_spark_scale_idx_2000000"
bidx = BlockIndex.load(spark, idx_dir, cfg)
widx = SearchIndex.load(spark, idx_dir, cfg)

out = {}
for name, q in (("headline", "search engine index"),
                ("second", "distributed computing analysis")):
    out[name] = bidx.pruning_stats(q, k=10)
    t0 = time.time()
    wand_rows = bidx.wand_topk(q, k=10).collect()
    out[name]["q_wand_s"] = round(time.time() - t0, 3)
    plain = [
        (r["docid"], round(r["score"], 9))
        for r in widx.search(term=q).top_df().collect()
    ]
    wand = [(r["docid"], round(r["score"], 9)) for r in wand_rows]
    out[name]["rank_identical"] = plain == wand
print("PROBE_RESULT " + json.dumps(out))
