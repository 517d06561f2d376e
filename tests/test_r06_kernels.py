"""Round-6 optimization pins: the batch-vectorized kernels must be
bit-identical to the straightforward per-document formulations they
replaced. Each reference below is the pre-optimization algorithm,
re-implemented directly from its definition (not imported), evaluated
per doc on edge-case texts: empty, whitespace-only, \\x0b, None,
non-ASCII, boundary lengths, repetitive."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from orama_spark.datapipe import dedup
from orama_spark.datapipe.portable_hash import kgram_hashes, token_hashes

EDGE_TEXTS = [
    "",
    " ",
    "\x0b\x0b\x0b",
    None,
    "abc",
    "ab",
    "日本語のテキストです、これはテスト",
    "a" * 100,
    "\t x\ny ",
    "zzzzzzzzz",
    "abécdefghij",
    "the quick brown fox jumps over the lazy dog",
    "one two three one two three one two three",
    "word " * 30,
]


@pytest.fixture(scope="module")
def edge_df(spark):
    rows = [(i, t) for i, t in enumerate(EDGE_TEXTS)]
    return spark.createDataFrame(rows, "doc_id long, text string")


WS = re.compile(r"[\t\n\f\r ]+")
WS_JAVA = re.compile(r"[ \t\n\x0b\f\r]+")


class TestMinhashBatchKernel:
    def test_matches_per_doc_reference(self, edge_df):
        k = 9
        coeffs = dedup._minhash_coeffs(64)

        def ref_one(t):
            if t is None:
                return [int(dedup._P)] * 64
            canon = WS.sub(" ", t.strip(" "))
            hs = kgram_hashes(canon, k)
            if len(hs) == 0:
                return [int(dedup._P)] * 64
            x = np.unique(hs & np.int64(dedup._MASK32)).astype(np.uint64)
            out = []
            for a, b in coeffs:
                y = (np.uint64(a) * x + np.uint64(b)) % np.uint64(dedup._P)
                out.append(int(np.int64(y.min().astype(np.uint64))))
            return out

        got = {
            r["id"]: r["sig"]
            for r in dedup.minhash_signatures(edge_df, shingle_k=k).collect()
        }
        for i, t in enumerate(EDGE_TEXTS):
            assert got[i] == ref_one(t), f"doc {i}: {t!r}"


class TestSimhashBatchKernel:
    def test_matches_per_doc_reference(self, edge_df):
        def ref_one(t):
            if t is None:
                return 0
            canon = WS.sub(" ", t.strip(" "))
            toks = canon.split(" ") if canon else []
            if not toks:
                return 0
            hs = token_hashes(toks).view(np.uint64)
            shifts = np.arange(64, dtype=np.uint64)
            bits = ((hs[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
            pos = (2 * bits) > len(toks)
            val = int((pos.astype(np.uint64) << shifts).sum(dtype=np.uint64))
            return val - (1 << 64) if val >= (1 << 63) else val

        got = {r["id"]: r["simhash"] for r in dedup.simhash64(edge_df).collect()}
        for i, t in enumerate(EDGE_TEXTS):
            assert got[i] == ref_one(t), f"doc {i}: {t!r}"


class TestWinnowingBatchKernel:
    def test_matches_per_doc_reference(self, edge_df):
        from orama_spark.datapipe.text_quality import winnowing_fingerprints

        k, window = 5, 4

        def ref_one(t):
            if t is None:
                return []
            canon = WS.sub(" ", t.strip(" "))
            hs = kgram_hashes(canon, k)
            if len(hs) < window:
                return []
            sw = np.lib.stride_tricks.sliding_window_view(hs, window)
            return np.unique(sw.min(axis=1)).tolist()

        got = {
            r["id"]: r["fingerprints"]
            for r in winnowing_fingerprints(edge_df).collect()
        }
        for i, t in enumerate(EDGE_TEXTS):
            assert got[i] == ref_one(t), f"doc {i}: {t!r}"


class TestShingleHashRows:
    """ngram_jaccard_pairs / ngram_contamination over the hashed-shingle
    kernel must reproduce the string-shingle semantics exactly."""

    def _ref_shingles(self, t, n):
        if t is None:
            return set()
        toks = WS_JAVA.sub(" ", t.strip(" ")).split(" ")
        if len(toks) - (n - 1) < 1:
            return set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    def test_jaccard_edge_pairs(self, spark, edge_df):
        n, thr = 3, 0.2
        got = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in dedup.ngram_jaccard_pairs(
                edge_df, n=n, threshold=thr, max_shingle_df=None
            ).collect()
        }
        want = {}
        for i in range(len(EDGE_TEXTS)):
            for j in range(i + 1, len(EDGE_TEXTS)):
                A = self._ref_shingles(EDGE_TEXTS[i], n)
                B = self._ref_shingles(EDGE_TEXTS[j], n)
                if not A or not B:
                    continue
                sh = len(A & B)
                if sh == 0:
                    continue
                jc = sh / (len(A) + len(B) - sh)
                if jc >= thr:
                    want[(i, j)] = round(jc, 9)
        assert got == want

    def test_jaccard_with_df_cap(self, spark):
        texts = ["a b c d e", "a b c d e", "a b c x y", "a b c", "p q r s"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        n, cap, thr = 2, 2, 0.01
        from collections import Counter

        shs = {i: self._ref_shingles(t, n) for i, t in enumerate(texts)}
        cnt = Counter()
        for s in shs.values():
            cnt.update(s)
        keep = {g for g, c in cnt.items() if c <= cap}
        want = {}
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                sh = len((shs[i] & shs[j]) & keep)
                jc = sh / (len(shs[i]) + len(shs[j]) - sh)
                if jc >= thr:
                    want[(i, j)] = round(jc, 9)
        got = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in dedup.ngram_jaccard_pairs(
                df, n=n, threshold=thr, max_shingle_df=cap
            ).collect()
        }
        assert got == want

    def test_contamination_matches_reference(self, spark, edge_df):
        ev = spark.createDataFrame(
            [(100, EDGE_TEXTS[11]), (101, "one two three")],
            "eval_id long, text string",
        )
        got = {
            (r["train_doc_id"], r["eval_doc_id"]): r["n_shared_ngrams"]
            for r in dedup.ngram_contamination(edge_df, ev, n=3).collect()
        }
        ev_sh = {
            100: self._ref_shingles(EDGE_TEXTS[11], 3),
            101: self._ref_shingles("one two three", 3),
        }
        want = {}
        for i, t in enumerate(EDGE_TEXTS):
            A = self._ref_shingles(t, 3)
            for e, B in ev_sh.items():
                sh = len(A & B)
                if sh >= 1:
                    want[(i, e)] = sh
        assert got == want


class TestPiiGuards:
    def test_guarded_equals_unguarded(self, spark):
        from orama_spark.datapipe import pii

        rows = [
            (0, "no pii here at all"),
            (1, "mail me at a.b+c@ex-ample.co.uk now"),
            (2, "at sign only @ but no address"),
            (3, "ip 10.0.0.7 and phone 555-123-4567"),
            (4, ""),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["id"]: (r["n_email"], r["n_ipv4"], r["n_phone"], r["redacted"])
            for r in pii.pii_stats(df).collect()
        }
        # unguarded reference: plain regex on the python side
        for i, t in rows:
            t0 = t or ""
            ref = (
                len(re.findall(pii.EMAIL_RE, t0)),
                len(re.findall(pii.IPV4_RE, t0)),
                len(re.findall(pii.PHONE_RE, t0)),
            )
            red = re.sub(pii.EMAIL_RE, "<EMAIL>", t0)
            red = re.sub(pii.IPV4_RE, "<IP>", red)
            red = re.sub(pii.PHONE_RE, "<PHONE>", red)
            assert out[i] == (*ref, red), f"doc {i}"
