"""Streaming analytics: watermarked windowed term counts, streaming
exact dedup (bounded state), applyInPandasWithState running df —
each asserted equivalent to its batch twin over a 2-micro-batch file
stream (maxFilesPerTrigger=1)."""

import datetime
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from orama_spark.config import IndexConfig
from orama_spark.kernel.tokenizer import Tokenizer, TokenizerConfig

CFG = IndexConfig(schema={"text": "string"})

T0 = datetime.datetime(2026, 1, 1, 10, 0, 0)


def _rows():
    # two files = two micro-batches; duplicate text spans batches
    f1 = [
        (1, "spark merge stream", T0),
        (2, "merge fast", T0 + datetime.timedelta(minutes=1)),
        (3, "spark merge stream", T0 + datetime.timedelta(minutes=2)),  # dup of 1
    ]
    f2 = [
        (4, "stream window state", T0 + datetime.timedelta(minutes=3)),
        (5, "merge fast", T0 + datetime.timedelta(minutes=4)),          # dup of 2
        (6, "fresh text here", T0 + datetime.timedelta(minutes=20)),    # closes window 0
    ]
    return f1, f2


@pytest.fixture()
def stream_src(spark):
    d = tempfile.mkdtemp(prefix="orama_stream_src_")
    f1, f2 = _rows()
    schema = "doc_id long, text string, event_ts timestamp"
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(d + "/p1")
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(d + "/p2")
    # flatten the part files into one dir for the file stream
    src = d + "/src"
    os.makedirs(src)
    n = 0
    for sub in ("p1", "p2"):
        for fn in sorted(os.listdir(f"{d}/{sub}")):
            if fn.endswith(".parquet"):
                dst = f"{src}/{n:03d}.parquet"
                shutil.copy(f"{d}/{sub}/{fn}", dst)
                # the file source orders batches by modification time:
                # make it deterministic (p1 strictly older than p2)
                os.utime(dst, (1700000000 + n * 60, 1700000000 + n * 60))
                n += 1
    yield spark, src, schema
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, src, schema, transform, out_name, output_mode="append"):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {out_name}")


def test_windowed_term_counts_match_batch(stream_src):
    from orama_spark.streaming.windows import windowed_term_counts

    spark, src, schema = stream_src
    got = _run_stream(
        spark, src, schema,
        lambda s: windowed_term_counts(s, CFG, window="10 minutes", watermark="5 minutes"),
        "wtc", output_mode="append",
    )
    # append mode only emits windows the watermark has CLOSED: the
    # first window [10:00,10:10) closes once 10:12 + lateness passes
    rows = {(r["window"]["start"].minute, r["term"]): r["n_docs"] for r in got.collect()}
    f1, f2 = _rows()
    batch = {}
    tok = Tokenizer(TokenizerConfig())
    for _, text, ts in f1 + f2:
        if ts < T0 + datetime.timedelta(minutes=10):
            for t in tok.tokenize(text):
                batch[(0, t)] = batch.get((0, t), 0) + 1
    assert rows == batch
    assert rows[(0, "merge")] == 4 and rows[(0, "spark")] == 2


def test_streaming_exact_dedup(stream_src):
    from orama_spark.streaming.windows import streaming_exact_dedup

    spark, src, schema = stream_src
    got = _run_stream(
        spark, src, schema,
        lambda s: streaming_exact_dedup(s, watermark="30 minutes"),
        "sdedup", output_mode="append",
    )
    ids = sorted(r["doc_id"] for r in got.collect())
    # doc 3 duplicates doc 1 (same batch window), doc 5 duplicates doc 2
    # (ACROSS micro-batches — state carried by the dedup operator)
    assert ids == [1, 2, 4, 6]


def test_running_term_df_stateful(stream_src):
    from orama_spark.streaming.windows import running_term_df

    spark, src, schema = stream_src
    got = _run_stream(
        spark, src, schema,
        lambda s: running_term_df(s, CFG),
        "rdf", output_mode="update",
    )
    # update stream: take the LAST emitted df per term = final cumulative
    final = {}
    for r in got.collect():
        final[r["term"]] = max(final.get(r["term"], 0), r["df"])
    # batch twin
    tok = Tokenizer(TokenizerConfig())
    f1, f2 = _rows()
    batch = {}
    for _, text, _ts in f1 + f2:
        for t in tok.tokenize(text):
            batch[t] = batch.get(t, 0) + 1
    assert final == batch
    assert final["merge"] == 4  # docs 1,2,3,5 — accumulated ACROSS batches
