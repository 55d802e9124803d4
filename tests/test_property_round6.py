"""Property-based tests for the round-6 families: PII redaction and
bigram extraction against Python ``re``/list models, salted join
against the plain join, SCD2 islands against a brute-force model,
chunk dedup against a dict model.

Same conventions as the earlier property suites: bounded example
counts, no deadline, one Spark job per example.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import cdc, dedup, joins, text

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Text alphabet deliberately includes PII-ish fragments, digits,
# separators, and whitespace so redaction and tokenization get
# adversarial compositions.
_FRAGMENTS = st.sampled_from(
    [
        "word", "x1", "a@b.co", "no@", "@nope", "1.2.3.4", "10.0.0.256",
        "+1-555-123-4567", "12-34", "9-1", " ", "\t", "\n", ".", "-",
        "u.v+w@d.org", "3.14", "777", "a-b-c",
    ]
)
_TEXTS = st.lists(_FRAGMENTS, min_size=0, max_size=12).map("".join)


def _redact_model(s: str) -> str:
    for _, pat, tag in text.PII_PATTERNS:
        s = re.sub(pat, tag, s)
    return s


@given(texts=st.lists(_TEXTS, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_redact_pii_matches_re_model(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["r"]
        for r in df.select("i", text.redact_pii(F.col("t")).alias("r")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _redact_model(t), (t, got[i], _redact_model(t))


def _bigram_model(s: str) -> list[str]:
    toks = s.split()
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


@given(texts=st.lists(_TEXTS, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_bigrams_match_split_model(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["b"]
        for r in df.select("i", text.bigrams_array(F.col("t")).alias("b")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _bigram_model(t), (t, got[i])


@given(
    fact=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000)), min_size=0, max_size=40
    ),
    dim=st.dictionaries(st.integers(0, 5), st.text("ab", min_size=1, max_size=2), max_size=6),
    salt=st.integers(1, 5),
)
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, fact, dim, salt):
    fdf = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(fact)], "pk int, k int, v int"
    )
    ddf = spark.createDataFrame(list(dim.items()) or [(None, None)], "k int, attr string")
    if not dim:
        ddf = ddf.filter(F.lit(False))
    plain = sorted(
        map(tuple, fdf.join(ddf, "k", "left").select("pk", "k", "v", "attr").collect())
    )
    salted = sorted(
        map(
            tuple,
            joins.salted_join(fdf, ddf, on="k", spread_col="pk", salt=salt, how="left")
            .select("pk", "k", "v", "attr")
            .collect(),
        )
    )
    assert plain == salted


def _scd2_model(rows):
    # rows: (key, state, ts, tie); returns set of islands
    out = []
    bykey = {}
    for k, s, t, i in rows:
        bykey.setdefault(k, []).append((t, i, s))
    for k, items in bykey.items():
        items.sort()
        islands = []
        for t, i, s in items:
            if not islands or islands[-1]["s"] != s:
                islands.append({"s": s, "from": t, "n": 0})
            islands[-1]["n"] += 1
        for idx, isl in enumerate(islands):
            to = islands[idx + 1]["from"] if idx + 1 < len(islands) else None
            out.append((k, idx + 1, isl["s"], isl["from"], to, isl["n"]))
    return sorted(out)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),            # key
            st.sampled_from("AB"),        # state
            st.integers(0, 50),           # ts
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: (r[0], r[2]),  # unique (key, ts): tie via ts itself
    )
)
@settings(**SETTINGS)
def test_scd2_matches_model(spark, rows):
    data = [(k, s, t, t) for k, s, t in rows]
    df = spark.createDataFrame(data, "k int, s string, t int, i int")
    got = sorted(
        (r.k, r.seg, r.s, r.valid_from, r.valid_to, r.n_events)
        for r in cdc.scd2_history(df, "k", "s", "t", "i").collect()
    )
    assert got == _scd2_model(data)


def _chunk_model(docs, width):
    seen = {}
    stats = {}
    flat = []
    for doc_id, t in sorted(docs):
        toks = t.split()
        chunks = [
            " ".join(toks[i : i + width]) for i in range(0, len(toks), width)
        ]
        for pos, ch in enumerate(chunks):
            flat.append((ch, doc_id, pos))
    for ch, doc_id, pos in sorted(flat, key=lambda x: (x[0], x[1], x[2])):
        if ch not in seen:
            seen[ch] = (doc_id, pos)
    for doc_id, t in docs:
        toks = t.split()
        n = (len(toks) + width - 1) // width
        kept = sum(
            1
            for pos in range(n)
            if seen[" ".join(toks[pos * width : pos * width + width])]
            == (doc_id, pos)
        )
        ratio = round(kept / n, 4) if n else 1.0
        stats[doc_id] = (n, kept, ratio)
    return stats


@given(
    docs=st.lists(_TEXTS, min_size=1, max_size=15),
    width=st.integers(1, 5),
)
@settings(**SETTINGS)
def test_chunk_dedup_matches_model(spark, docs, width):
    data = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(data, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_ratio)
        for r in dedup.chunk_dedup_stats(df, "doc_id", "text", chunk_tokens=width).collect()
    }
    assert got == _chunk_model(data, width)
