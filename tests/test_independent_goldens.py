"""Independently-derived goldens for the replay-seeded families, plus
the precondition guards on the bounded global-order windows.

The catalog verifies BPE and k-means by replaying the SAME Python
routine (``text.bpe_merges_py`` / centroid literals) inside the DuckDB
oracle — parity, not independence: a bug shared by the Spark loop and
the Python routine would pass (exactly how the round-4 histogram-
quantile defect survived until audited). These tests close that hole
with goldens derived OUTSIDE both implementations:

- BPE: the textbook Sennrich (2016, §3) corpus {low:5, lower:2,
  newest:6, widest:3}, adapted to this package's documented semantics
  (no end-of-word marker, overlapping pair counts, ties to the lowest
  (lhs, rhs) pair). The 8-merge sequence below was computed BY HAND
  from those rules — every round's pair-score table written out on
  paper — and is embedded as a literal, never produced by the code
  under test.
- k-means: 12 points in two well-separated planar clusters, k=2,
  n_rounds=2. Seed order (smallest md5(str(id))) comes from hashlib,
  the centroid update from hand integer arithmetic: sum=1000, n=6 →
  (2·1000+6)//12 = 167 and sum=601000, n=6 → 100167, so the final
  centroids are (167,167) and (100167,100167) and every expected
  dist_q below is a hand-squared literal.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import clustering, robust, stats, text

# Hand-computed merge table for {low:5, lower:2, newest:6, widest:3}
# under no-marker/overlapping/lowest-pair-tie semantics:
#   round 1: (e,s)=9 ties (s,t)=9 -> lowest pair 'e','s'
#   round 2: (es,t)=9
#   round 3: (l,o)=7 ties (o,w)=7 -> 'l','o'
#   round 4: (lo,w)=7
#   round 5: (n,e)=(e,w)=(w,est)=6 -> 'e','w'
#   round 6: (ew,est)=6 ties (n,ew)=6 -> 'ew','est' ('ew' < 'n')
#   round 7: (n,ewest)=6
#   round 8: (d,est)=(i,d)=(w,i)=3 -> 'd','est'
SENNRICH_FREQS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
SENNRICH_MERGES = [
    (1, "e", "s", "es", 9),
    (2, "es", "t", "est", 9),
    (3, "l", "o", "lo", 7),
    (4, "lo", "w", "low", 7),
    (5, "e", "w", "ew", 6),
    (6, "ew", "est", "ewest", 6),
    (7, "n", "ewest", "newest", 6),
    (8, "d", "est", "dest", 3),
]


def test_bpe_python_replay_matches_sennrich_hand_golden():
    assert text.bpe_merges_py(SENNRICH_FREQS, n_merges=8) == SENNRICH_MERGES


def test_bpe_spark_loop_matches_sennrich_hand_golden(spark):
    rows = [(w,) for w, n in SENNRICH_FREQS for _ in range(n)]
    df = spark.createDataFrame(rows, "text string")
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["merged"], r["score"])
        for r in text.bpe_learn(df, "text", top_words=10, n_merges=8)
        .orderBy("rank")
        .collect()
    ]
    assert got == SENNRICH_MERGES


def test_bpe_segment_matches_hand_golden():
    merges = [(a, b) for _, a, b, _, _ in SENNRICH_MERGES]
    assert text.bpe_segment_py("newest", merges) == ["newest"]
    assert text.bpe_segment_py("lowest", merges) == ["low", "est"]
    assert text.bpe_segment_py("slower", merges) == ["s", "low", "e", "r"]
    assert text.bpe_segment_py("wildest", merges) == ["w", "i", "l", "dest"]


# --------------------------------------------------------------- k-means

# ids 1-6 cluster near the origin, 7-12 near (10, 10); quantization is
# round(x * 10^4).
KMEANS_POINTS = {
    1: (0.0, 0.0),
    2: (0.1, 0.0),
    3: (0.0, 0.1),
    4: (0.1, 0.1),
    5: (-0.1, 0.0),
    6: (0.0, -0.1),
    7: (10.0, 10.0),
    8: (10.1, 10.0),
    9: (10.0, 10.1),
    10: (9.9, 10.0),
    11: (10.0, 9.9),
    12: (10.1, 10.1),
}
# Final centroids by hand: (167, 167) and (100167, 100167); per-point
# squared distances are literal integer arithmetic.
KMEANS_EXPECTED = {
    1: (0, 167**2 * 2),                    # 55778
    2: (0, 833**2 + 167**2),               # 721778
    3: (0, 167**2 + 833**2),
    4: (0, 833**2 * 2),                    # 1387778
    5: (0, 1167**2 + 167**2),              # 1389778
    6: (0, 167**2 + 1167**2),
    7: (1, 167**2 * 2),
    8: (1, 833**2 + 167**2),
    9: (1, 167**2 + 833**2),
    10: (1, 1167**2 + 167**2),
    11: (1, 167**2 + 1167**2),
    12: (1, 833**2 * 2),
}


def test_kmeans_seed_order_assumption():
    # The hand derivation assumes the two smallest-md5 ids are 6 (a
    # cluster-A point, seed index 0) and 9 (cluster-B, seed index 1);
    # pin that with hashlib so a fixture edit can't silently invalidate
    # the golden.
    order = sorted(
        KMEANS_POINTS, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )
    assert order[:2] == [6, 9]


def test_kmeans_matches_hand_golden(spark):
    df = spark.createDataFrame(
        [(i, list(v)) for i, v in KMEANS_POINTS.items()],
        "vec_id int, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["cluster"], r["dist_q"])
        for r in clustering.kmeans_assign(df, k=2, n_rounds=2).collect()
    }
    assert got == KMEANS_EXPECTED


# ------------------------------------------------- precondition guards


def test_quantile_buckets_distributed_matches_ntile_window(spark):
    # The distributed rank (range shuffle + partition offsets) must
    # reproduce single-partition NTILE exactly — including the floor
    # group-size split when n does not divide N — for every row, at
    # any partition count, with no input-size guard.
    from pyspark.sql import Window

    df = spark.range(1003).select(
        F.col("id").alias("k"), (F.col("id") * 37 % 501).alias("v")
    )
    for n, parts in [(4, 3), (10, 32), (7, 64)]:
        got = robust.quantile_buckets(
            df, "v", "k", n=n, num_partitions=parts
        )
        ref = df.withColumn(
            "bucket",
            F.ntile(n)
            .over(Window.orderBy(F.desc("v"), F.asc("k")))
            .cast("long"),
        )
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0


def test_rank_stat_guards_raise_on_unbounded_value_domain(spark):
    df = spark.range(500).select(
        F.when(F.col("id") % 2 == 0, F.lit("a")).otherwise(F.lit("b"))
        .alias("g"),
        (F.col("id").cast("double") / 7.0).alias("v"),
    )
    with pytest.raises(ValueError, match="max_values"):
        stats.mannwhitney_u(df, "g", "v", "a", "b", max_values=100)
    with pytest.raises(ValueError, match="max_values"):
        stats.ks_two_sample(df, "g", "v", "a", "b", max_values=100)
    # under the bound both still compute
    assert stats.mannwhitney_u(df, "g", "v", "a", "b").count() == 1
    assert stats.ks_two_sample(df, "g", "v", "a", "b").count() == 1


# ------------------------------------------ SymSpell d=1 path equivalence


def test_fuzzy_name_matches_d1_equals_quadratic_reference(spark):
    """The SymSpell deletion-neighborhood path (max_distance=1) must
    emit EXACTLY the pairs of the block-quadratic DP it replaces —
    verified against an in-test reference built from a plain blocked
    cross join + levenshtein, on names exercising substitution,
    insertion, deletion, equal-name id pairs and the ab/ba false-
    positive that the verify step must kill."""
    from module8_movies_etl_spark.operators import curation

    rows = [
        (1, "cold widget"),
        (2, "bold widget"),   # substitution
        (3, "cold widgets"),  # insertion at end
        (4, "old widget"),    # deletion at front of first token
        (5, "cold widget"),   # duplicate spelling of id 1
        (6, "ab widget"),
        (7, "ba widget"),     # shares deletion keys with ab, distance 2
        (8, "cold bolt"),     # other block
    ]
    df = spark.createDataFrame(rows, ["pid", "name"])
    blk = F.regexp_extract("name", r"(\S+)$", 1)
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in curation.fuzzy_name_matches(
            df, "pid", "name", block_col=blk, max_distance=1
        ).collect()
    }
    side = df.select("pid", "name", blk.alias("b"))
    ref = {
        (r["id_a"], r["id_b"]): r["d"]
        for r in side.alias("x")
        .join(side.alias("y"), "b")
        .select(
            F.col("x.pid").alias("id_a"),
            F.col("y.pid").alias("id_b"),
            F.levenshtein("x.name", "y.name").alias("d"),
        )
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("d") <= 1))
        .collect()
    }
    assert got == ref
    assert (6, 7) not in got and (1, 5) in got


def test_lloyd_l2_matches_hand_golden():
    # PQ sub-codebook trainer (similarity.lloyd_l2): 6 points, k=2.
    # Init is every floor(n/k)-th sample: c0=[0,0], c1=[10,10]. Both
    # iterations assign {first 3} -> c0, {last 3} -> c1, so the hand
    # centroids are the two cluster means: [1/3, 1] and [31/3, 11].
    from module8_movies_etl_spark.operators.similarity import lloyd_l2

    pts = [[0.0, 0.0], [0.0, 2.0], [1.0, 1.0],
           [10.0, 10.0], [10.0, 12.0], [11.0, 11.0]]
    got = lloyd_l2(pts, 2, iters=2)
    want = [[1.0 / 3.0, 1.0], [31.0 / 3.0, 11.0]]
    for g, w in zip(got, want):
        for a, b in zip(g, w):
            assert abs(a - b) < 1e-12, (got, want)


def test_lloyd_l2_tie_breaks_to_lowest_index():
    # point [1] is equidistant from centroids [0] and [2]; the
    # documented stable-argmin contract sends it to index 0, so the
    # fit is [[0.5], [2.0]] — a different tie rule would give
    # [[0.0], [1.5]] and break Spark/oracle codebook parity.
    from module8_movies_etl_spark.operators.similarity import lloyd_l2

    got = lloyd_l2([[0.0], [2.0], [1.0]], 2, iters=1)
    assert got == [[0.5], [2.0]], got


# --- real BMP/WAV codecs: goldens derived OUTSIDE the code under test


def test_decode_bmp_hand_built_literal():
    # A 2x1 24-bpp BMP assembled BY HAND from the spec (14-byte file
    # header, 40-byte info header, one row of two BGR pixels + 2 pad
    # bytes to the 4-byte stride) — nothing from make_bmp. Pixels
    # (10,20,30) and (40,50,60): byte sum 210 over 6 channel bytes.
    import struct

    from module8_movies_etl_spark.operators import multimodal as mm

    px = bytes([10, 20, 30, 40, 50, 60, 0, 0])
    blob = (
        struct.pack("<2sIHHI", b"BM", 54 + 8, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, 8, 0, 0, 0, 0)
        + px
    )
    got = mm.decode_bmp(blob)
    assert got == {
        "width": 2,
        "height": 1,
        "n_channels": 3,
        "mean_luma": 210 / (6 * 255.0),
    }
    # padding bytes must NOT leak into the mean: corrupt them and the
    # result must not move
    noisy = blob[:-2] + b"\xff\xff"
    assert mm.decode_bmp(noisy) == got


def test_decode_bmp_top_down_and_rejects():
    import struct

    from module8_movies_etl_spark.operators import multimodal as mm

    # negative height = top-down row order; same byte sum either way
    px = bytes([10, 20, 30, 40, 50, 60, 0, 0])
    blob = (
        struct.pack("<2sIHHI", b"BM", 54 + 8, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 24, 0, 8, 0, 0, 0, 0)
        + px
    )
    assert mm.decode_bmp(blob)["height"] == 1
    with pytest.raises(ValueError):
        mm.decode_bmp(b"PNG....")
    bad_bpp = (
        struct.pack("<2sIHHI", b"BM", 54 + 8, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 8, 0, 8, 0, 0, 0, 0)
        + px
    )
    with pytest.raises(ValueError):
        mm.decode_bmp(bad_bpp)


def test_resize_bmp_half_hand_built_literal():
    # A 3x3 bottom-up 24-bpp BMP assembled BY HAND (stride 12 = 9
    # channel bytes + 3 pad bytes per row); pixel values chosen so
    # every kernel step is checkable on paper. Display order (top row
    # first) reverses the stored rows, the 2x2 window covers display
    # rows 0-1 / cols 0-1, and the odd third row/column must be
    # CROPPED — their bytes (and the stride padding) must not leak.
    import struct

    from module8_movies_etl_spark.operators import multimodal as mm

    # stored bottom-up: row0 = display row2 (cropped), row2 = display
    # row0. Display rows 0,1 / cols 0,1 carry per-channel values:
    #   ch0: 1, 5 / 9, 13   -> floor(28/4) = 7
    #   ch1: 2, 6 / 10, 14  -> floor(32/4) = 8
    #   ch2: 3, 7 / 11, 15  -> floor(36/4) = 9
    disp_rows = [
        bytes([1, 2, 3, 5, 6, 7, 99, 99, 99]),  # display row 0
        bytes([9, 10, 11, 13, 14, 15, 99, 99, 99]),  # display row 1
        bytes([99] * 9),  # display row 2 (cropped by the resize)
    ]
    pad = b"\xee\xee\xee"  # stride padding: must never be averaged
    body = b"".join(r + pad for r in reversed(disp_rows))  # bottom-up
    blob = (
        struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, 3, 3, 1, 24, 0, len(body), 0, 0, 0, 0
        )
        + body
    )
    got = mm.resize_bmp_half(blob)
    assert got == {
        "out_width": 1,
        "out_height": 1,
        "ds_checksum": 7 + 8 + 9,
        "ds_mean_luma": 24 / (3 * 255.0),
    }
    # flooring, not rounding: bump one source byte so a block sum
    # becomes 29 -> floor gives 7, round-half-up would give 7 too, so
    # use 31 -> floor 7 vs round 8
    bumped = bytearray(blob)
    row0_start = 54 + 2 * 12  # stored row 2 = display row 0
    bumped[row0_start] = 4  # ch0 block sum 1+5+9+13 -> 4+5+9+13 = 31
    got2 = mm.resize_bmp_half(bytes(bumped))
    assert got2["ds_checksum"] == 7 + 8 + 9  # floor(31/4)=7, not 8


def test_downsample_wav_half_hand_built_literal():
    # A 5-frame mono PCM-16 WAV assembled BY HAND (RIFF header, fmt
    # chunk, data chunk) — nothing from make_wav. Samples
    # [100, -301, 7, 8, 999]: pair 0 -> floor(-201/2) = -101 (floor,
    # NOT truncate-toward-zero -100), pair 1 -> floor(15/2) = 7, the
    # odd 5th frame is cropped. Rate 8000 -> 4000.
    import math
    import struct

    from module8_movies_etl_spark.operators import multimodal as mm

    frames = struct.pack("<5h", 100, -301, 7, 8, 999)
    fmt_chunk = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16
    )
    data_chunk = b"data" + struct.pack("<I", len(frames)) + frames
    body = b"WAVE" + fmt_chunk + data_chunk
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    got = mm.downsample_wav_half(blob)
    assert got == {
        "out_rate": 4000,
        "out_n": 2,
        "ds_sum": -101 + 7,
        "ds_rms": math.sqrt((101 * 101 + 7 * 7) / 2) / 32768.0,
    }
    # stereo must raise into the stub slot, not silently mis-pair
    stereo_fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16
    )
    body2 = b"WAVE" + stereo_fmt + data_chunk
    with pytest.raises(ValueError):
        mm.downsample_wav_half(b"RIFF" + struct.pack("<I", len(body2)) + body2)


def test_make_wav_parses_with_stdlib_wave_module():
    # Python's stdlib `wave` is a fully independent RIFF parser: if it
    # reads our container, the header layout is genuinely spec-shaped.
    import io
    import wave

    from module8_movies_etl_spark.operators import multimodal as mm

    for did in (0, 1, 2, 3, 456, 4999):
        wf = wave.open(io.BytesIO(mm.make_wav(did)))
        assert wf.getnchannels() == 1
        assert wf.getsampwidth() == 2
        assert wf.getframerate() == (8000, 16000, 22050, 44100)[did % 4]
        assert wf.getnframes() == 100 + did % 157
        got = mm.decode_wav(mm.make_wav(did))
        assert got["sample_rate"] == wf.getframerate()
        assert got["n_samples"] == wf.getnframes()


def test_decode_wav_stereo_and_pad_byte():
    # Hand-built stereo PCM-16 WAV with an ODD-sized junk chunk before
    # data (spec: chunks are word-aligned, so a pad byte follows) —
    # exercises the chunk walker and per-channel frame math.
    import math
    import struct

    from module8_movies_etl_spark.operators import multimodal as mm

    frames = struct.pack("<6h", 100, -200, 300, -400, 500, -600)  # 3 frames x 2ch
    fmt_chunk = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
    junk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # odd size + pad
    data_chunk = b"data" + struct.pack("<I", len(frames)) + frames
    body = b"WAVE" + fmt_chunk + junk + data_chunk
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    got = mm.decode_wav(blob)
    sumsq = sum(s * s for s in (100, -200, 300, -400, 500, -600))
    assert got["n_samples"] == 3
    assert got["sample_rate"] == 8000
    assert got["duration_s"] == 3 / 8000
    assert got["rms"] == math.sqrt(sumsq / 6) / 32768.0


def test_quality_model_score_matches_python_replay(spark, tmp_path):
    # Independent ground truth for the model-inference query: ten
    # LITERAL documents written to a scratch documents.parquet, scored
    # by a from-the-docstring Python reimplementation (re.split
    # tokenizer, set() for uniques, str.isdigit for digit density —
    # none of the Spark expression tree), then compared to the catalog
    # query's output. The catalog oracle replays the same formula in
    # SQL, so engine-vs-oracle hash parity alone cannot catch a wrong
    # shared formula (the round-6 jackknife episode); this can.
    import re

    from module8_movies_etl_spark.plans.benchmark_queries import (
        _QMODEL_STOPS,
        QUERIES,
    )

    docs = [
        ("en", "a a a a"),                      # all-stopword, low uniq
        ("en", "the quick brown fox jumps"),    # 1 stopword, all uniq
        ("en", "1234 5678 91011"),              # digit-heavy
        ("en", "x " * 600 + "y"),               # long doc, len term capped
        ("de", "der igel lacht und lacht und lacht"),
        ("de", "zahl 42 und zahl 7"),
        ("fr", "le chat le chat le chat le chat"),
        ("fr", "un deux trois quatre cinq six sept"),
        ("en", "mixed 99 bag of of words 11 to count on"),
        ("en", "one-token"),
    ]
    spark.createDataFrame(docs, "lang string, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    def score(text: str) -> float:
        ws = re.split(r"\s+", text.strip())
        n_w = float(len(ws))
        uniq = len(set(ws)) / n_w
        n_chars = float(len(text))
        digits = sum(c.isdigit() for c in text) / n_chars
        stop = sum(w in _QMODEL_STOPS for w in ws) / n_w
        # mirror the Spark expression's left-to-right association so
        # IEEE rounding points coincide; the FORMULA is re-derived
        # from the docstring, not imported
        z = -1.5 + 2.0 * uniq - 4.0 * digits + 3.0 * stop + 0.5 * min(
            n_chars / 1000.0, 1.0
        )
        return 0.5 + z / (2.0 * (1.0 + abs(z)))

    import math

    cells: dict[tuple[str, int], list[int]] = {}
    for lang, text in docs:
        p = score(text)
        cells.setdefault((lang, int(math.floor(p * 10))), []).append(
            int(math.floor(p * 1_000_000))
        )
    expected = sorted(
        (lang, b, len(p6s), (sum(p6s) // len(p6s)) / 1_000_000.0)
        for (lang, b), p6s in cells.items()
    )
    # anchor a couple of buckets by hand: "a a a a" has uniq=1/4,
    # stop=4/4, digits=0, len 7 -> z ~= 2.0035, p ~= 0.8335 -> bucket 8;
    # "1234 5678 91011" is digit-dominated -> z < -1 -> p < 0.3
    assert ("en", 8) in cells
    assert any(lang == "en" and b <= 3 for (lang, b) in cells)

    got = sorted(
        (r["lang"], r["bucket"], r["n_docs"], r["mean_score"])
        for r in QUERIES["quality_model_score"](
            spark, str(tmp_path)
        ).collect()
    )
    assert got == expected


def test_tpch_q11_threshold_matches_python_replay(spark, tmp_path):
    # Independent ground truth for the Q11 mean-relative HAVING: nine
    # literal lineitem rows over two suppliers (one inside the nation
    # group, one outside), with part values engineered to straddle
    # the 1.2x-floored-mean boundary — including one part EXACTLY at
    # it (strict > must exclude it). The replay recomputes the
    # threshold with plain Python ints, none of the Spark/SQL tree.
    from module8_movies_etl_spark.plans.benchmark_queries import QUERIES

    # supplier 1 is in nations (3,7,11); supplier 2 is not
    spark.createDataFrame(
        [(1, 3), (2, 4)], "s_suppkey long, s_nationkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "supplier.parquet")
    )
    # in-group part values (cents): 10000/20000/30000/40000/50000
    # (p5 split across two lines to exercise the rollup) ->
    # S=150000, n=5, mean_floor=30000; threshold 5*val > 180000
    # -> val > 36000: p4 and p5 qualify, p3 (= the mean exactly,
    # 150000 < 180000) does not.
    li = [
        (1, 1, 100.00),
        (2, 1, 200.00),
        (3, 1, 300.00),
        (4, 1, 400.00),
        (5, 1, 250.00),
        (5, 1, 250.00),
        # supplier 2's lines must not count at all
        (1, 2, 9999.00),
        (5, 2, 9999.00),
        (6, 2, 9999.00),
    ]
    # recompute expectation in plain Python (no shared formula)
    vals: dict[int, int] = {}
    for pk, sk, price in li:
        if sk == 1:
            vals[pk] = vals.get(pk, 0) + round(price * 100)
    S = sum(vals.values())
    n = len(vals)
    mean_floor = S // n
    assert (S, n, mean_floor) == (150000, 5, 30000)
    expected = sorted(
        (pk, v / 100.0) for pk, v in vals.items() if 5 * v > 6 * mean_floor
    )
    assert expected == [(4, 400.0), (5, 500.0)]
    spark.createDataFrame(
        li, "l_partkey long, l_suppkey long, l_extendedprice double"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = sorted(
        (r["l_partkey"], r["value"])
        for r in QUERIES["tpch_q11_important_value"](
            spark, str(tmp_path)
        ).collect()
    )
    assert got == expected
    assert (3, 300.0) not in got and (1, 100.0) not in got


def test_tpch_q22_threshold_matches_python_replay(spark, tmp_path):
    # Independent ground truth for Q22's scalar-avg threshold + anti
    # join: literal customers where one candidate sits EXACTLY at the
    # positive-balance mean (cents*n == sum -> strict > excludes it),
    # one is above-mean but has a recent order (anti join drops it),
    # and one is above-mean and idle (the single survivor).
    from module8_movies_etl_spark.plans.benchmark_queries import QUERIES
    import datetime as dt

    customers = [
        # (custkey, nationkey, acctbal) — odd nations only are pooled
        (1, 1, 100.00),   # below mean
        (2, 3, 225.00),   # candidate boundary case
        (3, 5, 300.00),   # above mean, recent order -> dropped
        (4, 7, 275.00),   # above mean, idle -> survivor
        (5, 2, 999.00),   # even nation: excluded from pool
        (6, 9, -50.00),   # negative: pooled but not in avg stats
    ]
    # positives: 100+225+300+275 = 900.00 -> sum 90000 cents, n=4,
    # cents*4 > 90000 <-> cents > 22500: customer 2 (22500) is
    # EXACTLY equal -> excluded by strict >
    spark.createDataFrame(
        customers, "c_custkey long, c_nationkey long, c_acctbal double"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    orders = [
        (100, 3, dt.datetime(2001, 5, 1)),   # recent -> customer 3 dropped
        (101, 4, dt.datetime(1999, 12, 31)), # old -> customer 4 stays idle
        (102, 1, dt.datetime(2000, 6, 1)),   # recent, but cust 1 is below mean anyway
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    got = sorted(
        (r["c_nationkey"], r["numcust"], r["totacctbal"])
        for r in QUERIES["tpch_q22_idle_customers"](
            spark, str(tmp_path)
        ).collect()
    )
    assert got == [(7, 1, 275.0)]


def test_retrieval_mrr_matches_hand_ranking(spark, tmp_path):
    # Independent ground truth for the MRR audit: 8 literal 2-d
    # vectors with hand-computed cosine order; the single query (id 0
    # = the only id % 97 == 0) has its first same-label neighbor at
    # rank 3 and a second at rank 5, so MRR = floor(1e6/3)/1e6 and
    # precision@10 = 2/10 — no Spark/SQL arithmetic reused.
    from module8_movies_etl_spark.plans.benchmark_queries import QUERIES

    rows = [
        (0, [1.0, 0.0], "q"),    # the query
        (1, [3.0, 1.0], "x"),    # cos ~.949 -> rank 1
        (2, [2.0, 1.0], "y"),    # cos ~.894 -> rank 2
        (3, [1.0, 1.0], "q"),    # cos ~.707 -> rank 3  (first relevant)
        (4, [1.0, 2.0], "x"),    # cos ~.447 -> rank 4
        (5, [0.0, 1.0], "q"),    # cos  0    -> rank 5  (second relevant)
        (6, [-1.0, 1.0], "y"),   # cos ~-.707 -> rank 6
        (7, [-1.0, 0.0], "x"),   # cos -1    -> rank 7
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    [r] = QUERIES["retrieval_mrr_audit"](spark, str(tmp_path)).collect()
    assert r["n_queries"] == 1
    assert r["n_hit"] == 1
    assert r["mrr"] == 333333 / 1_000_000.0
    assert r["precision_at_10"] == 0.2


def test_png_decoder_on_hand_built_literal():
    # A PNG built BY HAND in this test (2x2 RGB, filter 0 rows,
    # literal pixel bytes) — no shared generator code — must decode
    # to exactly the stated features; and the generator's stream must
    # genuinely exercise ALL FIVE filter types for a tall image.
    import struct
    import zlib

    from module8_movies_etl_spark.operators.multimodal import (
        decode_png,
        make_png,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # rows: (10,20,30)(40,50,60) / (70,80,90)(100,110,120)
    row0 = bytes([0, 10, 20, 30, 40, 50, 60])
    row1 = bytes([0, 70, 80, 90, 100, 110, 120])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(row0 + row1))
        + chunk(b"IEND", b"")
    )
    f = decode_png(png)
    assert (f["width"], f["height"], f["n_channels"]) == (2, 2, 3)
    assert f["mean_luma"] == sum(range(10, 130, 10)) / (12 * 255.0)

    # the catalog generator must hit every filter type: doc_id 9 ->
    # h = 3 + 9 % 7 = 5 rows -> filters 0,1,2,3,4
    blob = make_png(9)
    pos = 8
    idat = bytearray()
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
    stream = zlib.decompress(bytes(idat))
    w = 4 + 9 % 13
    rowbytes = 3 * w
    filters = [stream[r * (rowbytes + 1)] for r in range(5)]
    assert filters == [0, 1, 2, 3, 4]
