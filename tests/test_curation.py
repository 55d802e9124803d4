"""Curation operators (decontamination, quota sampling, repetition
flags, TF-IDF, random projection) — behavior and plan-shape tests.
Oracle parity for each catalog entry is covered by test_oracle_parity.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import curation, similarity
from module8_movies_etl_spark.plans import benchmark_queries as bq

SF = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


# --- quota sampling -------------------------------------------------------


def test_quota_sample_stable_under_repartitioning(spark):
    """The kept set depends only on md5(doc_id) within each source —
    not on physical partitioning (the property RNG sampling lacks)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = curation.quota_sample(d, "source", "doc_id", 10).select("doc_id")
    b = curation.quota_sample(d.repartition(13), "source", "doc_id", 10).select(
        "doc_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_quota_sample_respects_quota_and_nests(spark):
    """≤ quota rows per group, and the quota-5 set is a prefix of the
    quota-10 set (hash order is a fixed permutation per group)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    q10 = curation.quota_sample(d, "source", "doc_id", 10)
    per = q10.groupBy("source").count().agg(F.max("count")).first()[0]
    assert per <= 10
    q5 = curation.quota_sample(d, "source", "doc_id", 5).select("doc_id")
    assert q5.exceptAll(q10.select("doc_id")).count() == 0


def test_quota_sample_plan_uses_window_group_limit(spark):
    """The rank filter must compile to WindowGroupLimit: each map task
    keeps only its local top-quota rows BEFORE the group-key exchange,
    so the shuffle moves O(groups x quota) rows — the property that
    makes per-domain quotas viable on a 100 TB crawl."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(spark, curation.quota_sample(d, "source", "doc_id", 10))
    assert "WindowGroupLimit" in plan


# --- decontamination ------------------------------------------------------


def test_contamination_benchmark_side_is_broadcast(spark):
    """The benchmark shingle set must broadcast — the corpus posting
    stream joins map-side with no corpus-gram shuffle."""
    plan = _plan(spark, bq.QUERIES["decontaminate_ngram"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_contamination_flags_a_planted_leak(spark):
    """A corpus doc containing a verbatim benchmark 4-gram is flagged
    with the right distinct-hit count; clean docs are absent."""
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "x alpha beta gamma delta y"),      # one leaked 4-gram window x2
            (2, "alpha beta gamma delta epsilon"),  # full overlap: two 4-grams
            (3, "totally clean text with no overlap here"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in curation.contamination_hits(
            corpus, bench, "doc_id", "text", ngram=4
        ).collect()
    }
    assert got == {1: 1, 2: 2}


# --- repetition flags -----------------------------------------------------


def test_repetition_stats_on_crafted_docs(spark):
    """A degenerate repeated-word doc fails every gate; a diverse doc
    passes; metrics match hand computation."""
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in curation.repetition_stats(docs, "doc_id", "text").collect()}
    assert rows[1]["keep"] == 0 and rows[2]["keep"] == 1
    assert rows[1]["n_words"] == 10 and rows[1]["n_distinct"] == 1
    assert rows[1]["top_word_frac"] == 1.0 and rows[1]["top_bigram_frac"] == 1.0
    assert rows[2]["uniq_ratio"] == 1.0 and rows[2]["top_word_frac"] == 0.1
    # all-distinct 10-word doc: every bigram unique -> top mass 1/9
    assert rows[2]["top_bigram_frac"] == 0.1111
    assert rows[2]["mean_word_len"] == 3.9  # 39 chars / 10 words


def test_repetition_flags_split_the_corpus(spark):
    """Thresholds must populate BOTH classes on the real corpus — a
    gate that keeps (or drops) everything tests nothing."""
    out = bq.QUERIES["repetition_quality_flags"](spark, SF)
    counts = dict(out.groupBy("keep").count().collect())
    assert set(counts) == {0, 1} and min(counts.values()) > 20


# --- TF-IDF ---------------------------------------------------------------


def test_tfidf_rare_term_outranks_common(spark):
    """A term unique to one doc outscores corpus-wide terms there."""
    docs = spark.createDataFrame(
        [
            (1, "common common common unique"),
            (2, "common common other other"),
            (3, "common other filler filler"),
        ],
        ["doc_id", "text"],
    )
    top = {
        r["doc_id"]: r["term"]
        for r in curation.tfidf_top_terms(docs, "doc_id", "text", k=1).collect()
    }
    assert top[1] == "unique"
    # doc 2: 'other' (df=2) beats 'common' (df=3) despite equal counts
    assert top[2] == "other"


def test_tfidf_score_matches_formula(spark):
    """score = c * (N - df + 0.5) / (df + 0.5), rounded to 4."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], ["doc_id", "text"]
    )
    rows = curation.tfidf_top_terms(docs, "doc_id", "text", k=3).collect()
    got = {(r["doc_id"], r["term"]): r["tfidf"] for r in rows}
    # doc 1 / 'a': c=2, df=2, N=2 -> 2*(2-2+0.5)/2.5 = 0.4
    assert got[(1, "a")] == round(2 * (2 - 2 + 0.5) / (2 + 0.5), 4)
    # doc 1 / 'b': c=1, df=1 -> 1*(2-1+0.5)/1.5 = 1.0
    assert got[(1, "b")] == round(1 * (2 - 1 + 0.5) / (1 + 0.5), 4)


# --- random projection ----------------------------------------------------


def test_random_project_preserves_relative_distance(spark):
    """JL sanity: projected cosine correlates with the 64-d truth.

    At out_dim=8 the JL noise floor is ~1/sqrt(8) ≈ 0.35 while these
    near-isotropic embeddings spread true cosines by only ~1/sqrt(64),
    so the expected Pearson r is ≈ 0.33 — measured 0.299 over 1,770
    pairs (deterministic planes + fixed data → not flaky). The floor
    0.2 is > 8 sigma above the no-signal null (1/sqrt(1770) ≈ 0.024).
    """
    import itertools

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 60
    )
    proj = emb.select(
        "vec_id", *similarity.random_project(F.col("embedding"), 8, 64, 31)
    )
    pv = {r["vec_id"]: [r[f"p{j}"] for j in range(8)] for r in proj.collect()}
    ev = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))

    xs, ys = [], []
    for a, b in itertools.combinations(sorted(pv), 2):
        xs.append(cos(ev[a], ev[b]))
        ys.append(cos(pv[a], pv[b]))
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    r = cov / math.sqrt(
        sum((x - mx) ** 2 for x in xs) * sum((y - my) ** 2 for y in ys)
    )
    assert r > 0.2, f"projected-cosine correlation {r:.3f} at/below noise"


def test_random_project_is_exact_linear_map(spark):
    """Each coordinate is the signed sum of the input — verify one
    vector against a driver-side replay of the same fold."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") == 7
    )
    row = emb.select(
        "embedding", *similarity.random_project(F.col("embedding"), 8, 64, 31)
    ).first()
    planes = similarity.plane_weights(8, 64, 31)
    v = [float(x) for x in row["embedding"]]
    for j in range(8):
        acc = 0.0
        for x, w in zip(v, planes[j]):
            acc = acc + x * w
        assert row[f"p{j}"] == acc
