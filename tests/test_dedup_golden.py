"""Golden tests: the Spark MinHash/SimHash implementations against
independent pure-Python reference implementations (same md5 spec) —
the correctness backstop for the oracle-less rows-only catalog
entries (simhash_near_dups, cosine_topk_lsh)."""

from __future__ import annotations

import hashlib
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import dedup, similarity
from module8_movies_etl_spark.sources import read_table

SF = "/root/testdata/sf0.001"


def _words(text: str) -> list[str]:
    # array_distinct(split(trim(text), '\s+')) keeps first-seen order
    seen, out = set(), []
    for w in text.strip().split():
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def py_simhash(text: str) -> int:
    votes = [0] * 60
    for w in _words(text):
        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        for i in range(60):
            votes[i] += 1 if (h >> i) & 1 else -1
    sh = 0
    for i in range(60):
        if votes[i] > 0:
            sh |= 1 << i
    return sh


def py_minhash(text: str, n_hashes: int = 8) -> list[str]:
    ws = _words(text)
    return [
        min(hashlib.md5(f"{w}:{i}".encode()).hexdigest() for w in ws)
        for i in range(n_hashes)
    ]


@pytest.fixture(scope="module")
def docs(spark):
    return {
        r.doc_id: r.text
        for r in read_table(spark, SF, "documents").limit(80).collect()
    }


def test_simhash_matches_python_reference(spark, docs):
    d = read_table(spark, SF, "documents").filter(F.col("doc_id") < 80)
    got = {
        r.doc_id: r.sh
        for r in dedup.simhash_signatures(d, "doc_id", "text").collect()
    }
    want = {i: py_simhash(t) for i, t in docs.items()}
    assert got == want


def test_simhash_near_pairs_golden(spark, docs):
    d = read_table(spark, SF, "documents").filter(F.col("doc_id") < 80)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_pairs(d, "doc_id", "text", max_hamming=12).collect()
    }
    # python reference: chunk-blocked candidates, hamming <= 12
    sh = {i: py_simhash(t) for i, t in docs.items()}
    want = {}
    for a, b in combinations(sorted(sh), 2):
        x = sh[a] ^ sh[b]
        shares_chunk = any(
            ((sh[a] >> (15 * c)) & 0x7FFF) == ((sh[b] >> (15 * c)) & 0x7FFF)
            for c in range(4)
        )
        if shares_chunk and bin(x).count("1") <= 12:
            want[(a, b)] = bin(x).count("1")
    assert got == want and len(want) > 0


def test_minhash_signature_matches_python_reference(spark, docs):
    d = read_table(spark, SF, "documents").filter(F.col("doc_id") < 80)
    postings = d.select("doc_id", F.explode(
        F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))).alias("w"))
    sig = postings.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.col("w"), F.lit(f":{i}")))).alias(f"mh{i}")
          for i in range(8)]
    )
    got = {r.doc_id: [r[f"mh{i}"] for i in range(8)] for r in sig.collect()}
    want = {i: py_minhash(t) for i, t in docs.items()}
    assert got == want


def test_lsh_candidates_superset_of_high_jaccard(spark):
    """LSH recall sanity: every pair with very high word-set Jaccard
    must surface as a band candidate (8 hashes, 4 bands × 2: a pair
    sharing all words collides in every band)."""
    d = read_table(spark, SF, "documents").filter(F.col("doc_id") < 200)
    cands = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(d, "doc_id", "text").collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_similar_pairs(
            d.withColumn("_all", F.lit(1)), "doc_id", "text", ["_all"], threshold=0.999
        ).collect()
    }
    assert exact, "fixture should contain at least one identical word-set pair"
    assert exact <= cands


def test_cosine_lsh_recall_vs_bruteforce(spark):
    """ANN recall: bucketed top-5 should recover a reasonable fraction
    of the exact top-5 (single-probe LSH, 6 planes → recall well below
    1 but far above random)."""
    emb = read_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_lsh(emb, q, k=5, n_planes=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall {recall} suspiciously low"
