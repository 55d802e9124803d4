"""Training-data curation operators (SURVEY.md §2.13 north-star set).

These are the corpus-hygiene steps a 100 TB LLM data pipeline runs
between ingest and tokenization, beyond the dedup family in
``operators/dedup.py``:

- **benchmark decontamination** (``contamination_hits``): flag corpus
  documents that share any word n-gram with a held-out benchmark set,
  the standard eval-leakage guard. The benchmark side is small by
  definition, so its shingle set broadcasts; the corpus side is one
  posting pass — the same single-shuffle shape as the dedup postings.
- **per-group quota sampling** (``quota_sample``): cap documents per
  source/domain, the "don't let one crawl dominate" rebalancer. Hash
  order makes the decision deterministic and repartition-stable (same
  md5 trick as ``operators/sampling.py``).
- **repetition quality flags** (``repetition_stats``): Gopher-style
  intra-document repetition metrics (unique-word ratio, top-word and
  top-bigram mass, mean word length) with a composite keep flag.
- **TF-IDF top terms** (``tfidf_top_terms``): per-document keyword
  extraction over exact corpus document frequencies. The idf is the
  BM25 rational form ``(N - df + 0.5) / (df + 0.5)`` — pure
  +,*,/ on exactly-representable doubles, so scores (and therefore
  ranks) replay bit-for-bit in any IEEE engine; a log-based idf
  would tie ranks to the host libm's last ulp.

All word/gram machinery matches ``operators/dedup.py``'s conventions:
``ws_trim``-then-``\\s+`` split, posexplode + lead-window grams (flat
codegen'd concat — measured faster than higher-order-function arrays,
see ``dedup._word_postings``), aggregation keyed on the document id so
the gram window's shuffle is reused by the following groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .text import ws_trim


def _words_flat(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _p, _w): one row per word occurrence with its position.

    Empty/whitespace-only text contributes NO rows: split of the
    trimmed-empty string is [""], and without the filter an empty doc
    would count one phantom "" word (n_words=1, uniq_ratio=1.0, a ""
    TF-IDF term) through every consumer."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(ws_trim(F.col(text_col)), r"\s+")).alias("_p", "_w"),
    ).filter(F.col("_w") != "")


def word_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w, c): per-document word occurrence counts.

    Unlike ``dedup._word_postings`` this keeps multiplicity — the
    repetition and TF-IDF operators need counts, not membership.
    One explode + one hash aggregation on (id, word).
    """
    return (
        _words_flat(df, id_col, text_col)
        .groupBy(F.col(id_col), F.col("_w").alias("w"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def gram_counts(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 2
) -> DataFrame:
    """(id, g, c): per-document word n-gram occurrence counts
    (order-preserving, multiplicity kept).

    Grams come from posexplode + lead() windows — flat codegen'd
    string concat (see ``dedup._word_postings`` for the measured
    rationale). The window's doc-id shuffle is reused by the count
    aggregation and by any downstream per-doc rollup.
    """
    flat = _words_flat(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy("_p")
    gram = F.concat_ws(
        " ", F.col("_w"), *[F.lead("_w", k).over(w) for k in range(1, ngram)]
    )
    return (
        flat.select(
            F.col(id_col),
            gram.alias("g"),
            # concat_ws skips NULLs → tail positions would emit SHORT
            # grams instead of none; drop rows whose last member is
            # past the end of the document
            F.lead("_w", ngram - 1).over(w).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .groupBy(F.col(id_col), "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style per-document repetition metrics + keep flag.

    Columns: n_words, n_distinct, uniq_ratio, top_word_frac (mass of
    the most frequent word), top_bigram_frac (mass of the most
    frequent bigram; 0 for one-word docs), mean_word_len, and
    ``keep`` — 1 iff the document clears all repetition gates.

    Scale shape: two posting aggregations (words keyed (id, w),
    bigrams keyed (id, g)) each rolled up to the doc id, then a
    doc-id join — every stage is keyed on or under the doc id, so
    AQE coalesces rather than re-shuffles. No driver state, no
    collect; thresholds are plan-time literals.
    """
    wc = word_counts(df, id_col, text_col)
    words = wc.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("_top_w"),
        F.sum(F.length("w") * F.col("c")).alias("_len_sum"),
    )
    grams = (
        gram_counts(df, id_col, text_col, ngram=2)
        .groupBy(id_col)
        .agg(F.max("c").alias("_top_g"), F.sum("c").alias("_n_grams"))
    )
    j = words.join(grams, id_col, "left")
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    uniq = dbl("n_distinct") / dbl("n_words")
    top_w = dbl("_top_w") / dbl("n_words")
    top_g = F.coalesce(dbl("_top_g") / dbl("_n_grams"), F.lit(0.0))
    mean_len = dbl("_len_sum") / dbl("n_words")
    # thresholds: uniq/top-word straddle the corpus medians (the gates
    # that split real data); top-bigram uses Gopher's published 0.2 —
    # a short all-distinct doc has top_g = 1/(n-1), so a tight bound
    # would reject diverse short documents
    keep = (uniq >= 0.45) & (top_w <= 0.11) & (top_g <= 0.2)
    return j.select(
        F.col(id_col),
        F.col("n_words"),
        F.col("n_distinct"),
        F.round(uniq, 4).alias("uniq_ratio"),
        F.round(top_w, 4).alias("top_word_frac"),
        F.round(top_g, 4).alias("top_bigram_frac"),
        F.round(mean_len, 4).alias("mean_word_len"),
        keep.cast("int").alias("keep"),
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 5,
) -> DataFrame:
    """(id, n_hits): corpus documents sharing ≥1 word ``ngram``-gram
    with the benchmark set, with the count of distinct shared grams.

    The decontamination guard: any document that can leak a benchmark
    item verbatim (here: any 5-word overlap) is flagged for removal
    before training. The benchmark side is small by definition —
    its distinct shingle set is broadcast, so the corpus-side posting
    stream joins map-side with NO shuffle of corpus grams; the only
    corpus shuffle is the gram window + final per-doc count, both
    keyed on the doc id. At 100 TB the corpus side streams once.
    """
    from .dedup import _word_postings

    bench_grams = (
        _word_postings(benchmark, id_col, text_col, ngram=ngram)
        .select("w")
        .distinct()
    )
    corpus_grams = _word_postings(corpus, id_col, text_col, ngram=ngram)
    return (
        corpus_grams.join(broadcast(bench_grams), "w")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def quota_sample(
    df: DataFrame, group_col: str, key_col: str, quota: int
) -> DataFrame:
    """Keep at most ``quota`` rows per group, chosen deterministically
    by md5(key) order (ties by key) — adds an ``rk`` rank column.

    The per-domain/per-source rebalancer: because the order is a
    uniform hash of the key, the kept subset is an unbiased sample of
    each group, reproducible across engines and stable under
    repartitioning (unlike RNG sampling — see ``operators/sampling``).
    PRECONDITION: ``key_col`` must be unique within each group — two
    rows sharing a key value hash identically and tie-break by
    partition-arrival order, so a quota boundary falling between them
    would pick a run-dependent survivor. Pass a row id, not a payload
    column.
    Scale shape: one hash shuffle on the group key; the rank-limit
    filter compiles to ``WindowGroupLimit``, so each map task keeps
    only its local top-``quota`` before the exchange — the shuffle
    moves O(groups × quota) rows, not the whole table.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return df.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= F.lit(int(quota))
    )


def fuzzy_name_matches(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col,
    max_distance: int = 4,
) -> DataFrame:
    """(id_a, id_b, distance): within-block name pairs with
    Levenshtein distance ≤ ``max_distance`` — the reference's
    title-reconciliation step (matching wiki/Kaggle movie titles,
    Data Cleaning.ipynb cells 91-93) as a set-returning operator.

    ``block_col`` is a Column expression bounding the quadratic cell
    (block on a cheap canopy: a type word, a sorted-token key, a
    phonetic code).

    The edit distance runs on the DISTINCT-NAME dictionary, not on
    row pairs: real entity columns repeat names heavily (here 20,000
    parts share 64 names), so matching rows directly re-evaluates the
    same O(len²) DP millions of times — measured 48 s at sf0.1 vs ~2 s
    for dictionary matching + hash-join expansion back to id pairs,
    identical output. Two lossless pre-filters guard the DP:
    ``|len(a) − len(b)| ≤ d`` (length difference lower-bounds edit
    distance), and the block equi-join itself. The name-pair
    dictionary keeps SAME-name pairs (distance 0), so ids sharing one
    spelling still pair; ``id_a < id_b`` dedups at expansion. The
    dictionary broadcasts (it is quadratic only in distinct names);
    the expansion joins shuffle on (block, name) — the 100 TB shape,
    since row-pair output is the caller's intrinsic cost.
    """
    side = df.select(F.col(id_col), F.col(name_col), block_col.alias("_blk"))
    d = F.lit(int(max_distance))
    names = side.select(F.col(name_col).alias("_na"), "_blk").distinct()
    if int(max_distance) == 1:
        # SymSpell deletion-neighborhood candidates — LOSSLESS for
        # d=1: lev(a,b) ≤ 1 ⟺ ({a} ∪ del1(a)) ∩ ({b} ∪ del1(b)) ≠ ∅
        # (equal → a itself; substitution at i → both i-deletions
        # agree; insert/delete → the shorter IS a deletion of the
        # longer). The block-quadratic name-pair join collapses to a
        # key equi-join of ~len(name) keys per distinct name, and the
        # full DP runs only on candidates that share a key (false
        # positives like ab/ba exist, hence the verify) — measured
        # 7.0 s → ~1 s on the sf0.1 customer table, identical pairs.
        # The key join yields both orders of every pair, matching the
        # quadratic path's contract; DISTINCT before the verify stops
        # multi-key collisions from multiplying id pairs downstream.
        dels = F.when(
            F.length("_na") == 0, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length("_na")),
                lambda i: F.concat(
                    F.substring(F.col("_na"), F.lit(1), i - 1),
                    F.substring(F.col("_na"), i + 1, F.length("_na")),
                ),
            )
        )
        # array_distinct before the explode (r12): deletion keys
        # repeat whenever a name has equal adjacent characters
        # (deleting either char of a "00" run yields the same key),
        # and duplicate (name, key) rows multiply the key join
        # QUADRATICALLY per shared key. Identical candidates — a
        # duplicate key value adds no new match.
        keys = names.select(
            "_blk",
            "_na",
            F.explode(
                F.array_distinct(F.concat(F.array(F.col("_na")), dels))
            ).alias("_k"),
        )
        # Canonical orientation through the expensive middle (r12):
        # the key join, the candidate distinct and the Levenshtein DP
        # all process each unordered name pair ONCE (``_na < _nb``,
        # STRICT — the diagonal is every name × its own key set, the
        # bulk of the raw join output, and its answer is known:
        # distance 0); the mirrored orientation the expansion
        # contract needs is re-emitted from the verified survivors
        # (~17k rows at sf0.1) and the same-name pairs from ``names``
        # directly, instead of riding the full candidate volume
        # through the distinct and the DP in both orders.
        half = (
            keys.join(
                keys.select(
                    F.col("_na").alias("_nb"), "_blk", "_k"
                ),
                ["_blk", "_k"],
            )
            .filter(F.col("_na") < F.col("_nb"))
            .select("_blk", "_na", "_nb")
            .distinct()
            # Threshold-bounded DP (r12): levenshtein(a, b, k) bails
            # out once the distance provably exceeds k — O(k·len)
            # cells instead of O(len²) per candidate, and the bulk of
            # candidates are rejects. Returns -1 above the threshold
            # and the exact distance (identical to the unbounded
            # form) at or below it, so the kept rows are unchanged.
            .withColumn(
                "distance", F.levenshtein("_na", "_nb", int(max_distance))
            )
            .filter(F.col("distance") >= 0)
        )
        # The union consumes ``half`` twice; the candidate distinct's
        # exchange is reused across both branches, so only the cheap
        # post-dedup tail (one DP per surviving candidate) runs per
        # branch. (An eager localCheckpoint of ``half`` was measured
        # SLOWER here — 3.0 → 4.0 s end-to-end: the materialization
        # pass cost more than the re-run tail it saved.) The diagonal
        # (same-name pairs, distance 0) comes straight from the name
        # dictionary — no join, no DP.
        diag = names.select(
            "_blk",
            "_na",
            F.col("_na").alias("_nb"),
            F.lit(0).alias("distance"),
        )
        name_pairs = diag.unionByName(half).unionByName(
            half.select(
                "_blk",
                F.col("_nb").alias("_na"),
                F.col("_na").alias("_nb"),
                "distance",
            )
        )
    else:
        name_pairs = (
            names.join(names.select(F.col("_na").alias("_nb"), "_blk"), "_blk")
            .filter(F.abs(F.length("_na") - F.length("_nb")) <= d)
            # threshold-bounded DP — see the d=1 branch (r12)
            .withColumn(
                "distance", F.levenshtein("_na", "_nb", int(max_distance))
            )
            .filter(F.col("distance") >= 0)
        )
    a = side.select(
        F.col(id_col).alias("id_a"), F.col(name_col).alias("_na"), "_blk"
    )
    b = side.select(
        F.col(id_col).alias("id_b"), F.col(name_col).alias("_nb"), "_blk"
    )
    return (
        a.join(broadcast(name_pairs), ["_blk", "_na"])
        .join(b, ["_blk", "_nb"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "distance")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stream_col: str,
    budget_tokens: int = 1024,
) -> DataFrame:
    """(id, stream, n_tokens, pack_id): greedy sequence packing — the
    tokenizer-feeding step that concatenates documents into
    fixed-budget training sequences.

    Documents are packed in deterministic (id) order WITHIN each
    stream (language/source shard): pack_id = floor(preceding
    cumulative tokens / budget), i.e. a document starts a new pack
    when the running total crosses the budget. Packing per-stream
    rather than globally is the 100 TB shape: a global order would
    serialize into one partition, while per-stream cumsums are one
    hash shuffle + streaming window, and training shards are
    per-stream anyway. Pure integer arithmetic → exact oracle.
    """
    from .text import token_count

    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = token_count(F.col(text_col))
    return (
        df.select(F.col(id_col), F.col(stream_col), toks.alias("n_tokens"))
        .withColumn(
            "pack_id",
            (
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
                / F.lit(int(budget_tokens))
            ).cast("long"),
        )
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(id, term, rk, tfidf): top-``k`` terms per document by TF-IDF
    with exact corpus document frequencies.

    score = c · (N − df + 0.5) / (df + 0.5) — term count times the
    BM25 rational idf. All inputs are exactly-representable doubles
    and the ops are IEEE +,*,/ — so the scores, and hence the ranks,
    are bit-reproducible in any engine (a ``ln``-based idf would
    differ in the last ulp across libms and flip ties).

    Scale shape: one (id, word) count aggregation; document
    frequencies from a word-keyed rollup of those counts (map-side
    partial); N via a broadcast one-row aggregate; ranking is a
    WindowGroupLimit top-k keyed on the doc id.
    """
    wc = word_counts(df, id_col, text_col)
    dfreq = wc.groupBy("w").agg(F.count(F.lit(1)).alias("_df"))
    total = df.select(F.count(F.lit(1)).alias("_n_docs"))
    scored = (
        wc.join(dfreq, "w")
        .crossJoin(broadcast(total))
        .withColumn(
            "_score",
            (
                F.col("c").cast("double")
                * (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
            )
            / (F.col("_df") + F.lit(0.5)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_score"), F.col("w"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.lit(int(k)))
        .select(
            F.col(id_col),
            F.col("w").alias("term"),
            F.col("rk"),
            F.round("_score", 4).alias("tfidf"),
        )
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score): BM25 relevance of each document for a fixed term
    set — the keyword-search counterpart to the ANN family (lexical
    retrieval over exact corpus statistics).

    Engine-portable determinism, same policy as ``tfidf_top_terms``:
    the idf is the rational BM25 form (N − df + 0.5)/(df + 0.5) (no
    log → no libm), every factor is an IEEE +,*,/ chain in fixed
    shape, and the per-document score adds the per-TERM partial
    scores in FIXED order via conditional aggregation (a plain
    ``sum`` over term rows would re-associate doubles differently per
    partitioning). avgdl is one broadcast scalar aggregate.

    Scale shape: the corpus token stream is counted ONCE — the
    (id, word) counts are SNAPSHOT at the stage boundary and the term
    postings, document lengths, and document frequencies all derive
    from the materialized counts (Spark has no common-subplan reuse
    below the exchange, so two lazy ``word_counts`` consumers would
    each re-run the full explode+aggregate over the corpus); then one
    id-keyed conditional aggregation.
    """
    from ..sources.scratch import snapshot

    wc_full = snapshot(word_counts(df, id_col, text_col), prefix="bm25_wc_")
    wc = wc_full.filter(F.col("w").isin(*terms))
    lens = wc_full.groupBy(id_col).agg(F.sum("c").alias("_dl"))
    avgdl = lens.agg(
        (F.sum("_dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "_avgdl"
        )
    )
    n_docs = df.select(F.count(F.lit(1)).alias("_n_docs"))
    dfreq = wc.groupBy("w").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        wc.join(dfreq, "w")
        .crossJoin(broadcast(n_docs))
        .crossJoin(broadcast(avgdl))
        .join(lens, id_col)
    )
    idf = (F.col("_n_docs") - F.col("_df") + F.lit(0.5)) / (
        F.col("_df") + F.lit(0.5)
    )
    tf = (F.col("c").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("c").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col("_dl").cast("double") / F.col("_avgdl"))
        )
    )
    per_term = scored.withColumn("_s", idf * tf)
    agg = per_term.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("w") == t, F.col("_s"))).alias(f"_s{i}")
            for i, t in enumerate(terms)
        ]
    )
    total = F.lit(0.0)
    for i in range(len(terms)):
        total = total + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    return agg.select(F.col(id_col), total.alias("score"))


def negative_samples(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int = 4,
) -> DataFrame:
    """Deterministic NEGATIVE SAMPLING for contrastive training: for
    every document, ``k`` negatives drawn from the same group by
    RANK-SHIFT — shuffle-free pseudo-randomness with no RNG and no
    quadratic join.

    Each doc gets a per-group rank in md5 order (a deterministic
    permutation); negative j is the doc at rank ``(r + j·stride) mod
    n`` with ``stride = max(1, n // (k+1))`` — k distinct, roughly
    equi-spaced positions in the permutation, so negatives are
    hash-uniform over the group but reproducible anywhere, stable as
    long as the group membership is (growing corpora should pin the
    permutation to a snapshot id in the hash salt).

    Shape: one rank window per group + one equi-join back on (group,
    rank) — both keyed on the group; the join's build side is the
    ranked table itself (no fan-out beyond k rows per doc).

    Returns (id, neg_idx 1..k, neg_id); docs whose group has ≤ k
    members get the distinct positions available (self-rank excluded).
    """
    from pyspark.sql import Window

    ranked = df.select(
        F.col(id_col).alias("_id"), F.col(group_col).alias("_g")
    ).withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy("_g").orderBy(
                F.md5(F.col("_id").cast("string")), F.col("_id")
            )
        )
        - 1,
    )
    counts = ranked.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    base = ranked.join(F.broadcast(counts), "_g")
    stride = F.greatest(F.lit(1), F.floor(F.col("_n") / F.lit(k + 1)))
    fan = base.select(
        "_g",
        "_id",
        "_r",
        "_n",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_idx"),
    ).select(
        "_g",
        "_id",
        "neg_idx",
        F.pmod(F.col("_r") + F.col("neg_idx") * stride, F.col("_n")).alias(
            "_cand"
        ),
        "_r",
    )
    # a candidate that wraps onto the doc itself is dropped (tiny
    # groups), keeping the contract "negatives are never the anchor";
    # when k·stride >= n the modular positions repeat, so duplicate
    # candidates per anchor collapse to the lowest neg_idx — the
    # "k distinct negatives" contract holds for small groups too.
    fan = (
        fan.filter(F.col("_cand") != F.col("_r"))
        .groupBy("_g", "_id", "_cand")
        .agg(F.min("neg_idx").alias("neg_idx"))
    )
    neg = ranked.select(
        F.col("_g"), F.col("_r").alias("_cand"), F.col("_id").alias("neg_id")
    )
    return (
        fan.join(neg, ["_g", "_cand"])
        .select(
            F.col("_id").alias(id_col),
            F.col("neg_idx").cast("int").alias("neg_idx"),
            "neg_id",
        )
    )


def mixture_rebalance(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_count_col,
    budget_frac: float = 0.5,
) -> DataFrame:
    """DATA MIXING to a token budget: keep a deterministic sample of
    each group such that every group contributes ~equal tokens toward
    ``budget_frac`` of the corpus — the mixture-rebalancing step of a
    training-data pipeline (upweight scarce languages, downsample
    dominant ones).

    Per group: ``rate = min(1, target_tokens / group_tokens)`` with
    ``target_tokens = budget_frac · total_tokens / n_groups``; a doc
    survives iff its md5-U(0,1) (salted ``mix:``) falls under the
    group's rate. Everything derives from exact integer token counts
    — the rates are identical doubles in any engine, so membership is
    hash-verifiable, repartition-stable, and never relabels a doc as
    the corpus grows (same id ⇒ same draw; only the rate moves).

    Shape: one group aggregate (broadcast back — group cardinality is
    languages/sources, not documents), one scalar total (1-row
    broadcast), one codegen filter on the scan. No driver fetch.

    Returns the kept docs: (id, group, n_tokens, rate).
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        token_count_col.cast("long").alias("_t"),
    )
    per_g = toks.groupBy("_g").agg(F.sum("_t").alias("_gt"))
    total = per_g.groupBy().agg(
        F.sum("_gt").alias("_tt"), F.count(F.lit(1)).alias("_ng")
    )
    rate = F.least(
        F.lit(1.0),
        (F.lit(budget_frac) * F.col("_tt") / F.col("_ng")) / F.col("_gt"),
    )
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("mix:"), F.col("_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("double") / F.lit(float(1 << 60))
    return (
        toks.join(F.broadcast(per_g), "_g")
        .crossJoin(F.broadcast(total))
        .withColumn("rate", F.round(rate, 6))
        .filter(u < F.col("rate"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_g").alias(group_col),
            F.col("_t").alias("n_tokens"),
            "rate",
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_chars: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Sliding-window document CHUNKING with overlap — the
    long-document → training-sample fan-out every context-bounded
    trainer needs (stride < chunk_chars ⇒ consecutive chunks overlap
    by chunk_chars − stride characters, so no span is ever split
    across a boundary without also appearing whole in one chunk).

    Window starts are 1, 1+stride, 1+2·stride, … while the start is
    inside the text; the final chunk may be short; an empty document
    emits ONE empty chunk (so every doc survives the fan-out and
    downstream joins need no outer legs).

    Shape: pure narrow codegen — a bounded ``sequence`` fan-out
    (≤ len/stride rows per doc) exploded and sliced with
    ``substring``; no shuffle anywhere. Chunk payloads travel as
    (length, md5) so the fan-out's shuffle-free property is not
    traded for wide rows downstream.

    Returns (id, chunk_idx 0-based, chunk_start 1-based, chunk_len,
    chunk_md5).
    """
    n = F.length(F.col(text_col))
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n), F.lit(stride)
    )
    fan = df.select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        F.posexplode(starts).alias("chunk_idx", "_s"),
    )
    piece = F.substring(F.col("_t"), F.col("_s"), chunk_chars)
    return fan.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("_s").cast("long").alias("chunk_start"),
        F.length(piece).cast("long").alias("chunk_len"),
        F.md5(piece).alias("chunk_md5"),
    )


def mixture_temperature_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-based multinomial MIXTURE WEIGHTS: sample group i
    with p_i ∝ (n_i/N)^α — the α-sampling rule multilingual trainers
    use to up-weight scarce languages without flattening the mixture
    entirely (α=1 is proportional, α=0 uniform; 0.3 is the common
    default). The boost column (p_α/p_raw) is the per-group up/down
    sampling factor a pipeline feeds to its sampler (e.g.
    ``mixture_rebalance``'s rates).

    Shape: one group aggregate (group cardinality = languages/sources,
    tiny) + one 1-row scalar broadcast; nothing per-document after the
    count. Cross-engine parity: both engines compute pow() on the same
    doubles and results are rounded to 6 dp — the same tolerance
    pattern as the PageRank oracle.

    Returns (group, n_docs, p_raw, p_samp, boost), rounded 6 dp.
    """
    counts = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    powed = counts.select(
        "_g", "_n", F.pow(F.col("_n").cast("double"), F.lit(alpha)).alias("_pw")
    )
    tot = powed.groupBy().agg(
        F.sum("_n").alias("_tn"), F.sum("_pw").alias("_tpw")
    )
    return (
        powed.crossJoin(broadcast(tot))
        .select(
            F.col("_g").alias(group_col),
            F.col("_n").cast("long").alias("n_docs"),
            F.round(F.col("_n") / F.col("_tn"), 6).alias("p_raw"),
            F.round(F.col("_pw") / F.col("_tpw"), 6).alias("p_samp"),
            F.round(
                (F.col("_pw") / F.col("_tpw")) / (F.col("_n") / F.col("_tn")),
                6,
            ).alias("boost"),
        )
    )
