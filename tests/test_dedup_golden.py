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


def test_jaccard_prefix_filter_matches_bruteforce(spark):
    """Prefix filtering is EXACT: on a stop-word-saturated corpus the
    prefix-filtered inverted index must return the brute-force O(n²)
    pair set — including a pair whose intersection is ONLY stop-words,
    the case a naive document-frequency *cap* would silently drop."""
    stop = "the of and"
    rows = []
    for k in range(15):
        rows.append((2 * k, f"{stop} u{k} v{k} p{k}"))
        rows.append((2 * k + 1, f"{stop} u{k} v{k} q{k}"))
    # intersection = the 3 stop-words only; J = 3/5 = 0.6 >= 0.5
    rows.append((100, f"{stop} x100"))
    rows.append((101, f"{stop} y101"))
    # vocab = 3 + 60 + 2 = 65 distinct words > 64 → auto picks 'prefix'
    df = spark.createDataFrame(rows, "doc_id int, text string").withColumn(
        "_b", F.lit(1)
    )
    texts = dict(rows)
    want = {}
    for a, b in combinations(sorted(texts), 2):
        A, B = set(_words(texts[a])), set(_words(texts[b]))
        j = len(A & B) / len(A | B)
        if j >= 0.5:
            want[(a, b)] = j
    for strategy in ("auto", "prefix"):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in dedup.jaccard_similar_pairs(
                df, "doc_id", "text", ["_b"], threshold=0.5, strategy=strategy
            ).collect()
        }
        assert set(got) == set(want), strategy
        for k in got:
            assert got[k] == pytest.approx(want[k])
        assert (100, 101) in got, "stop-word-only intersection pair must survive"
    # explicit 'bitset' on a 65-word vocab must RAISE, not silently
    # wrap bit 65 onto bit 1 (shiftleft shifts mod 64)
    with pytest.raises(ValueError, match="bitset strategy requires"):
        dedup.jaccard_similar_pairs(
            df, "doc_id", "text", ["_b"], threshold=0.5, strategy="bitset"
        )


def test_jaccard_bitset_path_matches_bruteforce(spark):
    """Dense-vocabulary fast path: vocab ≤ 64 words → masks + popcount.
    Must equal brute force, and agree with the prefix path."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.sample(vocab, rng.randint(5, 25))), rng.choice(["en", "fr"]))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    want = {}
    for (a, ta, la), (b, tb, lb) in combinations(rows, 2):
        if la != lb:
            continue
        A, B = set(_words(ta)), set(_words(tb))
        j = len(A & B) / len(A | B)
        if j >= 0.5:
            want[tuple(sorted((a, b)))] = j
    for strategy in ("auto", "bitset", "prefix"):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in dedup.jaccard_similar_pairs(
                df, "doc_id", "text", ["lang"], threshold=0.5, strategy=strategy
            ).collect()
        }
        assert set(got) == set(want), strategy
        for k in got:
            assert got[k] == pytest.approx(want[k])
    assert want, "fixture should produce at least one qualifying pair"


def test_cosine_lsh_recall_vs_bruteforce(spark):
    """ANN recall: multi-table (6) multi-probe (hamming-2) LSH top-5
    must recover ≥0.8 of the exact top-5 from the oracle-verified
    brute force (measured 0.975 at sf0.001 with the default config —
    the floor pins the round-3 recall fix against regression)."""
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
    assert recall >= 0.8, f"LSH recall {recall} below the 0.8 target"


def test_bucket_batch_matches_expression(spark):
    """The Arrow-matmul bucket table must agree with the expression
    form for EVERY vector and every table config the catalog uses
    (6 tables x 6 planes for ANN; 12 planes for near-dups). BLAS
    sums in a different order than the fold, so this pins that no
    projection in the test corpus sits close enough to zero for the
    sign to flip."""
    emb = read_table(spark, SF, "embeddings")
    for n_planes, tables in ((6, (0, 1, 2, 3, 4, 5)), (12, (0,))):
        batch = similarity.hyperplane_bucket_table(
            emb, "vec_id", "embedding", n_planes, 64, tables=tables
        )
        expr = emb.select(
            "vec_id",
            *[
                similarity.hyperplane_bucket(
                    F.col("embedding"), n_planes, 64, table=t
                ).alias(f"_e{t}")
                for t in tables
            ],
        )
        joined = batch.join(expr, "vec_id")
        mismatches = joined.filter(
            " OR ".join(f"_b{t} <> _e{t}" for t in tables)
        ).count()
        assert mismatches == 0
        assert batch.count() == emb.count()


def test_ngram_postings_match_token_array(spark):
    """The lead-window shingle postings (the codegen'd fast path) must
    equal exploding the _distinct_tokens array for every doc."""
    d = read_table(spark, SF, "documents")
    for n in (2, 3):
        fast = dedup._word_postings(d, "doc_id", "text", ngram=n)
        slow = d.select(
            "doc_id", F.explode(dedup._distinct_tokens("text", n)).alias("w")
        )
        assert fast.exceptAll(slow).count() == 0
        assert slow.exceptAll(fast).count() == 0


def test_cosine_ivf_recall_vs_bruteforce(spark):
    """IVF ANN recall floor. On isotropic synthetic vectors coarse
    quantization is intrinsically weaker than multi-table LSH (cells
    barely correlate with top neighbors in 64-dim; measured 0.6 at
    nprobe=4/16, only 0.775 probing HALF the cells) - IVF earns its
    keep on clustered real-world embeddings and via partition-pruned
    scans. The floor pins the pipeline against breakage, not quality."""
    emb = read_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_ivf(
            emb, q, k=5, n_centroids=16, n_probe=4
        ).collect()
    }
    assert len(exact & ivf) / len(exact) >= 0.5


def py_winnow(text: str, k: int = 3, window: int = 4) -> set[str]:
    toks = text.strip().split()
    hs = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(len(toks) - k + 1)
    ]
    if not hs:
        return set()
    return {
        min(hs[p : p + window]) for p in range(max(len(hs) - window, 0) + 1)
    }


def test_winnow_fingerprints_match_python_reference(spark, docs):
    d = read_table(spark, SF, "documents").filter(F.col("doc_id") < 80)
    got: dict[int, set[str]] = {}
    for r in dedup.winnow_fingerprints(d, "doc_id", "text").collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    want = {i: py_winnow(t) for i, t in docs.items() if py_winnow(t)}
    assert got == want and len(want) > 0


def test_winnow_shared_run_guarantee(spark):
    """Winnowing's coverage guarantee: two docs sharing a run of
    window + k - 1 = 6 consecutive words share >= 1 fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, f"one two {shared} three four"),
        (1, f"{shared} five six seven"),
        (2, "unrelated words only here nothing common"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.winnow_similar_pairs(
            df, "doc_id", "text", min_shared=1
        ).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_connected_components_match_union_find(spark):
    """Min-label propagation equals a pure-Python union-find over the
    same pair graph, including isolated nodes and a multi-hop chain."""
    d = read_table(spark, SF, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.jaccard_similar_pairs(
        d, "doc_id", "text", block_cols=["lang"], threshold=0.5
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(pairs, d, id_col="doc_id").collect()
    }

    parent: dict[int, int] = {r.doc_id: r.doc_id for r in d.select("doc_id").collect()}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.collect():
        ra, rb = find(r.id_a), find(r.id_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want and len(got) == 200
    # sanity: at least one non-trivial cluster and one isolated node
    assert any(v != k for k, v in want.items())
    assert any(v == k for k, v in want.items())


def test_connected_components_chain(spark):
    """A 5-node path (diameter 4) needs multiple propagation rounds —
    pins the fixpoint loop, not just one-hop merging."""
    nodes = spark.createDataFrame([(i,) for i in range(10, 15)] + [(99,)], "id int")
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 14)], "id_a int, id_b int"
    )
    got = {
        r.id: r.cluster_id
        for r in dedup.connected_components(pairs, nodes, id_col="id").collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 99: 99}


def test_cosine_pq_recall_vs_bruteforce(spark):
    """PQ-ADC recall floor vs the oracle-verified brute force: the
    catalog config (8 subspaces × 64 codes, 64-id shortlist) measured
    0.975 @ top-5 at sf0.001 on these isotropic synthetic vectors
    (4-bit codes measured 0.575 — the 6-bit codebook is what earns
    the recall). The floor pins codes, ADC scoring, and re-rank
    against regression."""
    emb = read_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_pq(emb, q, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"PQ recall {recall} below the 0.8 floor"


def test_repeated_span_intervals_hand_check(spark):
    """ExactSubstr spans: two docs share 'a b c d e' (two overlapping
    4-grams -> ONE merged [start, end) island per doc); unique text
    yields no span; a within-doc-only repeat does not count."""
    from module8_movies_etl_spark.operators.dedup import repeated_span_intervals

    docs = spark.createDataFrame(
        [
            (1, "x y a b c d e q r s"),          # shared run at words 2..6
            (2, "a b c d e t u v w"),            # shared run at words 0..4
            (3, "unique words only here now"),   # no cross-doc 4-gram
            (4, "m n o p z m n o p z"),          # 'm n o p' repeats ONLY here
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["n_words"])
        for r in repeated_span_intervals(docs, "doc_id", "text", gram_len=4).collect()
    }
    # doc 1: grams at p=2 ('a b c d') and p=3 ('b c d e') merge -> [2, 7)
    # doc 2: grams at p=0,1 merge -> [0, 5)
    assert out == {(1, 2): (7, 5), (2, 0): (5, 5)}
