"""Block-max WAND top-k over the compressed posting-block layout
(SURVEY §4 item 2 — the custom query-side pruning Catalyst can't do).

Distributed two-phase MaxScore/BM-WAND hybrid, exact w.r.t. the plain
path (rank-identical top-k, proof sketch in ``wand_topk``):

  phase 0  seed θ: fully score the single highest-upper-bound term
           (usually the rarest); θ = k-th best partial score. Partial
           scores only grow, so θ lower-bounds the true k-th score.
  phase 1  prune blocks: block b of term t survives iff
           ub(b) + Σ_{t'≠t} global_ub(t') >= θ.
           Candidates = docids decoded from surviving blocks only.
  phase 2  exact scores: decode every block whose [first_docid,
           last_docid] range intersects a candidate (range join against
           the broadcast candidate list), restrict to candidates, full
           BM25 sum per doc, TakeOrdered k.

Soundness: a doc d outside the candidate set has, for any term t
containing it, score(d) <= ub(block_t(d)) + Σ_{t'≠t} global_ub(t') < θ,
and the seed phase exhibits k docs with true score >= θ (their seed
blocks necessarily survive pruning since their seed contribution alone
reaches θ). Hence no pruned doc can enter the top-k, and survivors get
exact scores in phase 2.

Scope: exact-term queries with threshold=1 and no filters (prefix/fuzzy
expansion makes per-token upper bounds additive across matched words and
destroys pruning power; those queries use the plain path).
"""

from __future__ import annotations

import math
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..build.blocks import (
    BLOCKS_SCHEMA, build_blocks, decode_blocks_to_postings,
)
from ..config import IndexConfig
from ..kernel.tokenizer import Tokenizer

_DECODED_SCHEMA = "field string, term string, docid long, field_len long"


class BlockIndex:
    def __init__(self, spark: SparkSession, config: IndexConfig,
                 blocks: DataFrame, dictionary: DataFrame, stats: dict):
        self.spark = spark
        self.config = config
        self.blocks = blocks
        self.dictionary = dictionary
        self.stats = stats
        self.tokenizer = Tokenizer(config.tokenizer)

    # ------------------------------------------------------------ build
    @classmethod
    def build(cls, spark: SparkSession, index_dir: str, config: IndexConfig) -> "BlockIndex":
        """Materialize index_dir/blocks from postings+dictionary+stats.
        The encode runs narrow (no shuffle): postings partitions are
        already sorted by (field, term, docid); hot terms simply emit
        blocks from several tasks."""
        import json

        if config.tokenizer.allow_duplicates or any(
            config.schema[f_] == "string[]" for f_ in config.searchable_fields
        ):
            raise NotImplementedError(
                "BlockIndex assumes the deduplicating tokenizer identity "
                "tf == 1/field_len (blocks store only field_len); "
                "allow_duplicates or string[] postings must use the "
                "plain path"
            )
        cls._check_not_stale(index_dir)
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)
        postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        dictionary = spark.read.parquet(os.path.join(index_dir, "dictionary"))
        blocks = build_blocks(postings, dictionary, stats, config.bm25)
        blocks.write.mode("overwrite").parquet(os.path.join(index_dir, "blocks"))
        return cls.load(spark, index_dir, config)

    @staticmethod
    def _check_not_stale(index_dir: str) -> None:
        """Block max_score bounds embed the build-time (df, avgfl, N):
        pending tombstones / dictionary deltas would let true scores
        exceed the stored bounds (df shrinks -> idf grows), making the
        pruning UNSOUND. Refuse, pointing at the safe path."""
        for pending in ("tombstones", "dictionary_delta"):
            if os.path.exists(os.path.join(index_dir, pending)):
                raise ValueError(
                    f"index has pending incremental {pending}; run "
                    "build.maintenance.compact() and rebuild blocks "
                    "(BlockIndex.build) before block-max WAND queries"
                )

    @classmethod
    def load(cls, spark: SparkSession, index_dir: str, config: IndexConfig) -> "BlockIndex":
        import json

        cls._check_not_stale(index_dir)
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)
        return cls(
            spark,
            config,
            blocks=spark.read.parquet(os.path.join(index_dir, "blocks")),
            dictionary=spark.read.parquet(os.path.join(index_dir, "dictionary")),
            stats=stats,
        )

    # ----------------------------------------------------------- search
    def _bm25_expr(self):
        bm = self.config.bm25
        n_docs = float(self.stats["docs_count"])
        avg_expr = F.lit(0.0)
        for f_, v in self.stats["fields"].items():
            avg_expr = F.when(
                F.col("field") == f_, F.lit(float(v["avg_field_length"]))
            ).otherwise(avg_expr)
        tf = F.lit(1.0) / F.col("field_len")
        idf = F.log(
            F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        return (idf * (F.lit(bm.d) + tf * F.lit(bm.k + 1.0))) / (
            tf + F.lit(bm.k) * (F.lit(1.0 - bm.b) + F.lit(bm.b) * F.col("field_len") / avg_expr)
        )

    def wand_topk(self, term: str, k: int = 10,
                  keep_ids: Optional[DataFrame] = None) -> DataFrame:
        """Exact-term BM25 top-k via block-max pruning. Returns
        (docid, score) rank-identical with the plain engine path.

        ``keep_ids`` (one column ``docid``): a pre-computed doc filter
        (where-clause mask or the exact-mode case-sensitive post-filter,
        search-fulltext.ts:88-115). It is applied to the seed scoring —
        so θ lower-bounds the k-th FILTERED score — and to phase 2; the
        pruning proof is unchanged since filtering only removes docs."""
        tokens = self.tokenizer.tokenize(term)
        if not tokens:
            return self.spark.createDataFrame([], "docid long, score double")
        fields = self.config.searchable_fields
        meta = self.blocks.where(
            F.col("term").isin(tokens) & F.col("field").isin(fields)
        ).persist()

        # global per-(field, term) upper bounds (tiny collect)
        ubs = {
            (r["field"], r["term"]): r["ub"]
            for r in meta.groupBy("field", "term").agg(F.max("max_score").alias("ub")).collect()
        }
        if not ubs:
            meta.unpersist()
            return self.spark.createDataFrame([], "docid long, score double")
        total_ub = sum(ubs.values())

        # phase 0: seed with the highest-ub (field, term)
        seed_f, seed_t = max(ubs, key=ubs.get)
        dfq = F.broadcast(self.dictionary.where(F.col("term").isin(tokens)))
        seed_posts = meta.where(
            (F.col("field") == seed_f) & (F.col("term") == seed_t)
        ).mapInPandas(lambda it: map(decode_blocks_to_postings, it), _DECODED_SCHEMA)
        if keep_ids is not None:
            seed_posts = seed_posts.join(keep_ids, "docid", "left_semi")
        seed_posts = seed_posts.join(dfq, ["field", "term"]).select(
            "docid", self._bm25_expr().alias("s")
        )
        seed_top = seed_posts.orderBy(F.desc("s")).limit(k).collect()
        theta = seed_top[-1]["s"] if len(seed_top) >= k else 0.0

        # phase 1: surviving blocks and their candidate docids
        others_ub = F.lit(total_ub) - F.coalesce(
            *[
                F.when((F.col("field") == f_) & (F.col("term") == t_), F.lit(u))
                for (f_, t_), u in ubs.items()
            ]
        )
        kept = meta.where(F.col("max_score") + others_ub >= F.lit(theta))
        candidates = (
            kept.mapInPandas(lambda it: map(decode_blocks_to_postings, it), _DECODED_SCHEMA)
            .select("docid")
            .distinct()
        )

        # phase 2: decode blocks overlapping any candidate, exact scores
        cand = F.broadcast(candidates)
        overlapping = (
            meta.alias("b")
            .join(
                cand.alias("c"),
                (F.col("c.docid") >= F.col("b.first_docid"))
                & (F.col("c.docid") <= F.col("b.last_docid")),
                "left_semi",
            )
        )
        scored = (
            overlapping.mapInPandas(lambda it: map(decode_blocks_to_postings, it), _DECODED_SCHEMA)
            .join(cand, "docid", "left_semi")
        )
        if keep_ids is not None:
            scored = scored.join(keep_ids, "docid", "left_semi")
        scored = (
            scored.join(dfq, ["field", "term"])
            .select("docid", self._bm25_expr().alias("s"))
            .groupBy("docid")
            .agg(F.sum("s").alias("score"))
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )
        out = scored
        meta.unpersist()
        return out

    def pruning_stats(self, term: str, k: int = 10) -> dict:
        """Diagnostics: how many blocks the θ bound eliminates."""
        tokens = self.tokenizer.tokenize(term)
        meta = self.blocks.where(F.col("term").isin(tokens))
        total = meta.count()
        ubs = {
            (r["field"], r["term"]): r["ub"]
            for r in meta.groupBy("field", "term").agg(F.max("max_score").alias("ub")).collect()
        }
        if not ubs:
            return {"blocks_total": 0, "blocks_kept": 0}
        total_ub = sum(ubs.values())
        seed_f, seed_t = max(ubs, key=ubs.get)
        dfq = F.broadcast(self.dictionary.where(F.col("term").isin(tokens)))
        seed_top = (
            meta.where((F.col("field") == seed_f) & (F.col("term") == seed_t))
            .mapInPandas(lambda it: map(decode_blocks_to_postings, it), _DECODED_SCHEMA)
            .join(dfq, ["field", "term"])
            .select("docid", self._bm25_expr().alias("s"))
            .orderBy(F.desc("s"))
            .limit(k)
            .collect()
        )
        theta = seed_top[-1]["s"] if len(seed_top) >= k else 0.0
        others_ub = F.lit(total_ub) - F.coalesce(
            *[
                F.when((F.col("field") == f_) & (F.col("term") == t_), F.lit(u))
                for (f_, t_), u in ubs.items()
            ]
        )
        kept = meta.where(F.col("max_score") + others_ub >= F.lit(theta)).count()
        return {"blocks_total": total, "blocks_kept": kept, "theta": theta}
