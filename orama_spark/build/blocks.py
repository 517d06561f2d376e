"""Posting-block physical layout: length-ordered docid reassignment +
docid-delta varint compressed blocks with per-block max-score bounds
(the custom data modeling Catalyst doesn't provide — SURVEY §4 item 1).

Two ideas from the published inverted-index literature compose here:

* **Docid reassignment** (document reordering): the block index assigns
  its own *internal* docid = rank of the document by ascending total
  field length. BM25 with the deduplicating-tokenizer identity
  tf = 1/field_len is strictly decreasing in field_len, so per-block
  max-score bounds now DECAY along the internal-docid axis instead of
  being flat — which is what makes docid-aligned block-max pruning
  (query/wand.py) actually eliminate blocks. Reassignment is a pure
  permutation: original docids are stored alongside, scores and
  tie-breaks always use the original docid, so results are
  rank-identical with the plain path for ANY permutation.

* **Delta + varint compression**: internal docids are delta+varint
  encoded (~1-2 B/posting), field lengths varint (small ints), original
  docids varint (the price of reordering — they are no longer sorted
  within a block, so no delta; ~2-4 B at these scales).

Block table schema (one row per <=BLOCK_SIZE postings of one term):
  field string, term string, block_id int, n int,
  first_docid long, last_docid long,   -- INTERNAL id range (disjoint
                                        -- per term, sorted)
  docid_deltas binary (varint of internal deltas),
  orig_docids binary (varint),
  field_lens binary (varint),
  tfns binary,      -- varint of per-posting tf NUMERATORS
                    -- (tf = tfn/field_len); b"" means all-ones — the
                    -- deduplicating-tokenizer identity, which costs
                    -- zero bytes. Non-trivial tfns cover
                    -- allow_duplicates (tfn = occurrence count) and
                    -- string[] fields (tfn = last-element occurrences,
                    -- possibly 0 — index.ts:90,107).
  max_score double, -- BM25 upper bound for any posting in the block
  min_score double, -- BM25 lower bound — needed because df counts
                    -- OCCURRENCES (index.ts:113-118): a term repeating
                    -- more often than there are docs gets df > N, a
                    -- NEGATIVE idf and negative scores, and the WAND θ
                    -- seed must then be lowered by the possible missing
                    -- negative contributions (query/wand.py)
  df long           -- denormalized per-(field,term) document frequency,
                    -- so queries score without a dictionary join

``max_score`` is the max of the EXACT per-posting BM25 scores of the
block (computed at build time with the final (N, avgfl, df) statistics)
— an ACHIEVED bound by construction, for every tfn shape. For the
all-ones identity this equals the old analytic bound score(min fl):
BM25 with tf=1/fl is strictly decreasing in fl.

Encoding runs inside mapInPandas over partitions range-partitioned and
sorted by (field, term, internal) — each task streams through its slice
emitting blocks, never materializing a per-term group. A hot term spans
several tasks; each emits blocks over a disjoint internal range, so
(field, term, first_docid) is a unique block key (skew-proof: no task
ever holds a whole hot term).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from ..kernel.bm25 import BM25Params

BLOCK_SIZE = 128

BLOCKS_SCHEMA = StructType(
    [
        StructField("field", StringType(), False),
        StructField("term", StringType(), False),
        StructField("block_id", IntegerType(), False),
        StructField("n", IntegerType(), False),
        StructField("first_docid", LongType(), False),
        StructField("last_docid", LongType(), False),
        StructField("docid_deltas", BinaryType(), False),
        StructField("orig_docids", BinaryType(), False),
        StructField("field_lens", BinaryType(), False),
        StructField("tfns", BinaryType(), False),
        StructField("max_score", DoubleType(), False),
        StructField("min_score", DoubleType(), False),
        StructField("df", LongType(), False),
        # per-ENCODER-FRAGMENT champion-candidate mark (>0 = candidate;
        # 0 = not). Candidates are the UNION of (a) the fragment's top
        # champion_blocks blocks by (max_score desc, first_docid asc)
        # and (b) the fragment's FIRST champion_blocks blocks in
        # internal order — the internal axis is length-ordered, so
        # scores decay along it and the first blocks hold each term's
        # top-scoring postings (exactly so for single-field trivial-tf
        # indexes; approximately otherwise, which is why (a) is kept).
        # A term split across range partitions gets marks per fragment,
        # so this is a SUPERSET prefilter under BOTH orderings: the
        # global winners are always contained in rows with champ_rk > 0,
        # and the (small) exact windows at champion-build time re-rank
        # them at posting level.
        StructField("champ_rk", IntegerType(), False),
    ]
)


def _varint_nb(a: np.ndarray) -> np.ndarray:
    """Per-value encoded byte counts for LEB128 varints."""
    nb = np.ones(len(a), dtype=np.int64)
    for shift in range(7, 64, 7):
        nb += (a >= (np.uint64(1) << np.uint64(shift))).astype(np.int64)
    return nb


def varint_encode(arr: np.ndarray) -> bytes:
    """LEB128 varint encode of a uint64 array, vectorized by byte slot."""
    a = arr.astype(np.uint64)
    n = len(a)
    if n == 0:
        return b""
    # bytes needed per value: 1 + one per 7-bit group above the first
    nb = _varint_nb(a)
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum(nb)[:-1]))
    rem = a.copy()
    live = np.ones(n, dtype=bool)
    for i in range(10):
        if not live.any():
            break
        idx = np.nonzero(live)[0]
        byte = (rem[idx] & np.uint64(0x7F)).astype(np.uint8)
        more = rem[idx] >= np.uint64(0x80)
        out[offsets[idx] + i] = byte | (more.astype(np.uint8) << 7)
        rem[idx] = rem[idx] >> np.uint64(7)
        live[idx] = more
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of varint_encode — vectorized boundary scan + shifts."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.nonzero(b < 0x80)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    n = len(ends)
    vals = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max())
    for i in range(max_len):
        mask = lengths > i
        idx = starts[mask] + i
        vals[mask] |= (b[idx].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * i)
    return vals


def bm25_for_fl(fl: np.ndarray, df: float, n_docs: float, avgfl: float,
                p: BM25Params, tfn: np.ndarray | None = None) -> np.ndarray:
    """BM25 with tf = tfn/fl; tfn=None means the all-ones identity of the
    deduplicating tokenizer (tf = 1/fl)."""
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    tf = (1.0 if tfn is None else tfn) / fl
    return (idf * (p.d + tf * (p.k + 1))) / (tf + p.k * (1 - p.b + (p.b * fl) / avgfl))


def assign_internal_ids(postings: DataFrame) -> DataFrame:
    """(docid) -> (docid, internal): internal = 0-based rank of the doc by
    (total field length asc, docid asc).

    Distributed rank — no single-partition window: range-partition by the
    sort key, collect the P per-partition counts (P rows, driver-tiny),
    broadcast offsets, assign offset+arange inside each sorted partition.
    This is the standard global-order-index pattern and survives any N.
    """
    from pyspark import TaskContext

    doclen = (
        postings.select("field", "docid", "field_len")
        .dropDuplicates(["field", "docid"])
        .groupBy("docid")
        .agg(F.sum("field_len").alias("dl"))
    )
    ranked = doclen.repartitionByRange("dl", "docid").sortWithinPartitions(
        "dl", "docid"
    )
    sizes = (
        ranked.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = {r["pid"]: r["count"] for r in sizes}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        start = offsets.get(pid, 0)
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "docid": pdf["docid"].values,
                    "internal": np.arange(start, start + n, dtype=np.int64),
                }
            )
            start += n

    return ranked.mapInPandas(assign, "docid long, internal long")


def build_blocks(
    postings: DataFrame,
    dictionary: DataFrame,
    stats: dict,
    bm25: BM25Params,
    block_size: int = BLOCK_SIZE,
    champion_blocks: int = 8,
) -> DataFrame:
    """postings -> compressed blocks in length-ordered internal docid space.

    Internal ids are assigned (one docmap shuffle + one postings join,
    both build-time), the stream is range-partitioned + sorted by
    (field, term, internal), then each task cuts blocks at term
    boundaries or every ``block_size`` rows — narrow after the one sort,
    skew split by internal range.
    """
    n_docs = float(stats["docs_count"])
    avgs = {f_: float(v["avg_field_length"]) for f_, v in stats["fields"].items()}
    docmap = assign_internal_ids(postings)
    # docmap is two longs per DOC (not per posting). Under ~4M docs
    # (≤ ~64 MB) broadcasting it turns the postings-side sort-merge
    # join — a full postings shuffle, ~20 s of the 104 s build at the
    # 2M-doc/76.5M-posting scale point — into a map-side hash join.
    # Past the threshold the SMJ IS the right plan: a 10^9-doc docmap
    # cannot live on the driver, and the shuffle amortizes across the
    # cluster. docs_count is exact (build-time stats), so the switch is
    # deterministic, not a sampled estimate.
    dm = F.broadcast(docmap) if n_docs <= 4_000_000 else docmap
    p = (
        postings.join(dm, "docid")
        .join(F.broadcast(dictionary), ["field", "term"])
        .select(
            "field", "term", "docid", "internal", "field_len", "df",
            # tf numerator: postings store tf = tfn/field_len as a
            # double; tfn is an exact small integer for every posting
            # shape (1 for dedup, occ for allow_duplicates, last-element
            # occurrences — possibly 0 — for string[]), so round()
            # recovers it exactly
            F.round(F.col("tf") * F.col("field_len")).cast("long").alias("tfn"),
        )
        .repartitionByRange("field", "term", "internal")
        .sortWithinPartitions("field", "term", "internal")
    )

    params = bm25
    import pyarrow as pa

    # Arrow mirror of BLOCKS_SCHEMA (same names, order, types) for the
    # mapInArrow output batches.
    pa_blocks = pa.schema([
        ("field", pa.string()), ("term", pa.string()),
        ("block_id", pa.int32()), ("n", pa.int32()),
        ("first_docid", pa.int64()), ("last_docid", pa.int64()),
        ("docid_deltas", pa.binary()), ("orig_docids", pa.binary()),
        ("field_lens", pa.binary()), ("tfns", pa.binary()),
        ("max_score", pa.float64()), ("min_score", pa.float64()),
        ("df", pa.int64()), ("champ_rk", pa.int32()),
    ])

    def encode(batches) -> Iterator["pa.RecordBatch"]:
        # mapInArrow, not mapInPandas: the 76.5M-row Arrow->pandas
        # conversion materialized two PYTHON STRING columns per posting
        # (~20 s of the 2M-doc build); Arrow string arrays stay in C++
        # and only ONE field/term scalar per (field, term) run is ever
        # converted. Numeric columns come out as zero-copy numpy views.
        import pyarrow.compute as pc

        carry: dict | None = None
        out_rows: list[dict] = []
        num_cols = ("internal", "docid", "field_len", "df", "tfn")

        def flush_group(field: str, term: str, df_val: float,
                        internals: np.ndarray, origs: np.ndarray,
                        fls: np.ndarray, tfns: np.ndarray):
            # Group-wide vectorization: one bm25 + one varint encode per
            # ARRAY for the whole (field, term) run, blocks carved out
            # of the shared byte stream by per-value length offsets —
            # per-block numpy-call overhead dominated the 2M-doc build
            # (600k blocks x ~4 small kernel calls).
            avgfl = avgs[field]
            trivial_tfn = bool((tfns == 1).all())
            n = len(internals)
            bstarts = np.arange(0, n, block_size, dtype=np.int64)
            bends = np.minimum(bstarts + block_size, n)
            # block-local docid deltas: global diff, reset at block starts
            deltas = np.empty(n, dtype=np.uint64)
            if n:
                deltas[0] = 0
                np.subtract(internals[1:], internals[:-1], out=deltas[1:],
                            casting="unsafe")
            deltas[bstarts] = 0
            # ACHIEVED bounds: max/min of the exact per-posting scores
            sc = bm25_for_fl(
                fls.astype(np.float64), df_val, n_docs, avgfl, params,
                tfn=None if trivial_tfn else tfns.astype(np.float64),
            )
            ubs = np.maximum.reduceat(sc, bstarts)
            lbs = np.minimum.reduceat(sc, bstarts)

            def enc_stream(a: np.ndarray):
                buf = varint_encode(a)
                cuts = np.concatenate(([0], np.cumsum(_varint_nb(a))))
                return buf, cuts

            # fragment-local champion candidates (see BLOCKS_SCHEMA):
            # union of top-nc by (max_score desc, internal asc) and the
            # first nc blocks of the run (score decays along the
            # length-ordered internal axis, so these hold the term's
            # top-scoring postings — the multi-term-overlap docs that
            # max_score ranking alone misses)
            order = np.lexsort((internals[bstarts], -ubs))
            nc = min(champion_blocks, len(bstarts))
            champ = np.zeros(len(bstarts), dtype=np.int64)
            champ[order[:nc]] = np.arange(1, nc + 1)
            head = np.arange(nc)
            champ[head] = np.where(
                champ[head] > 0, champ[head],
                champion_blocks + 1 + head,
            )
            buf_d, cut_d = enc_stream(deltas)
            buf_o, cut_o = enc_stream(origs.astype(np.uint64))
            buf_f, cut_f = enc_stream(fls.astype(np.uint64))
            if not trivial_tfn:
                buf_t, cut_t = enc_stream(tfns.astype(np.uint64))
            for bi in range(len(bstarts)):
                s, e = int(bstarts[bi]), int(bends[bi])
                out_rows.append(
                    {
                        "field": field,
                        "term": term,
                        "block_id": bi,
                        "n": e - s,
                        "first_docid": int(internals[s]),
                        "last_docid": int(internals[e - 1]),
                        "docid_deltas": buf_d[cut_d[s]:cut_d[e]],
                        "orig_docids": buf_o[cut_o[s]:cut_o[e]],
                        "field_lens": buf_f[cut_f[s]:cut_f[e]],
                        "tfns": b"" if trivial_tfn else buf_t[cut_t[s]:cut_t[e]],
                        "max_score": float(ubs[bi]),
                        "min_score": float(lbs[bi]),
                        # df rides on the block row so the query path can
                        # score without a dictionary join (it is constant
                        # per (field, term) — denormalized metadata)
                        "df": int(df_val),
                        "champ_rk": int(champ[bi]),
                    }
                )

        for rb in batches:
            if rb.num_rows == 0:
                continue
            cols = {nm: rb.column(i) for i, nm in enumerate(rb.schema.names)}
            f_a, t_a = cols["field"], cols["term"]
            num = {
                k: cols[k].to_numpy(zero_copy_only=False) for k in num_cols
            }
            if carry is not None:
                f_a = pa.concat_arrays([carry["f"], f_a])
                t_a = pa.concat_arrays([carry["t"], t_a])
                num = {k: np.concatenate([carry[k], num[k]]) for k in num_cols}
                carry = None
            n = len(f_a)
            # group by (field, term) preserving sorted order — boundary
            # mask computed on the Arrow string arrays (C++ kernels)
            neq = pc.or_(
                pc.not_equal(f_a.slice(1), f_a.slice(0, n - 1)),
                pc.not_equal(t_a.slice(1), t_a.slice(0, n - 1)),
            ).to_numpy(zero_copy_only=False)
            boundaries = np.nonzero(neq)[0] + 1
            starts = np.concatenate(([0], boundaries))
            ends = np.concatenate((boundaries, [n]))
            # hold back the last group: it may continue in the next batch
            for s, e in zip(starts[:-1], ends[:-1]):
                flush_group(
                    f_a[int(s)].as_py(),
                    t_a[int(s)].as_py(),
                    float(num["df"][s]),
                    num["internal"][s:e].astype(np.int64),
                    num["docid"][s:e].astype(np.int64),
                    num["field_len"][s:e].astype(np.int64),
                    num["tfn"][s:e].astype(np.int64),
                )
            s0 = int(starts[-1])
            carry = {
                "f": f_a.slice(s0), "t": t_a.slice(s0),
                **{k: num[k][s0:].copy() for k in num_cols},
            }
            if out_rows:
                tbl = pa.Table.from_pylist(out_rows, schema=pa_blocks)
                out_rows = []
                for ob in tbl.to_batches():
                    yield ob
        if carry is not None and len(carry["f"]):
            flush_group(
                carry["f"][0].as_py(),
                carry["t"][0].as_py(),
                float(carry["df"][0]),
                carry["internal"].astype(np.int64),
                carry["docid"].astype(np.int64),
                carry["field_len"].astype(np.int64),
                carry["tfn"].astype(np.int64),
            )
        if out_rows:
            tbl = pa.Table.from_pylist(out_rows, schema=pa_blocks)
            for ob in tbl.to_batches():
                yield ob

    return p.mapInArrow(encode, BLOCKS_SCHEMA)


def decode_blocks_to_postings(blocks_pdf: pd.DataFrame) -> pd.DataFrame:
    """blocks rows -> exploded (field, term, docid, internal, field_len)
    pandas — the query-side decode kernel (runs inside an Arrow batch).
    ``docid`` is the ORIGINAL id (scoring + tie-breaks); ``internal`` the
    length-ordered id (block-range arithmetic only)."""
    fields, terms, internals, origs, fls, tfns = [], [], [], [], [], []
    for r in blocks_pdf.itertuples(index=False):
        deltas = varint_decode(bytes(r.docid_deltas)).astype(np.int64)
        d = r.first_docid + np.concatenate(([0], np.cumsum(deltas[1:])))
        o = varint_decode(bytes(r.orig_docids)).astype(np.int64)
        f_ = varint_decode(bytes(r.field_lens)).astype(np.int64)
        raw_t = bytes(getattr(r, "tfns", b"") or b"")
        t_ = (
            varint_decode(raw_t).astype(np.int64)
            if raw_t
            else np.ones(len(d), dtype=np.int64)
        )
        fields.append(np.full(len(d), r.field, dtype=object))
        terms.append(np.full(len(d), r.term, dtype=object))
        internals.append(d)
        origs.append(o)
        fls.append(f_)
        tfns.append(t_)
    if not internals:
        return pd.DataFrame(
            {"field": [], "term": [], "docid": [], "internal": [],
             "field_len": [], "tfn": []}
        )
    return pd.DataFrame(
        {
            "field": np.concatenate(fields),
            "term": np.concatenate(terms),
            "docid": np.concatenate(origs),
            "internal": np.concatenate(internals),
            "field_len": np.concatenate(fls),
            "tfn": np.concatenate(tfns),
        }
    )
