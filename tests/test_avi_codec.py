"""The pure-stdlib AVI/MJPEG video rung — container demux composed
with the real baseline-JPEG decoder (the codec ladder's last honest
rung; only inter-frame codecs remain library-gated).

Independence layers, mirroring the BMP/PNG/JPEG/GIF rungs: a
hand-built LITERAL AVI (struct literals, no shared generator code)
wrapping hand-built literal JPEGs must demux and decode to stated
features; the generator round-trips byte-exactly and against a
plain-Python replay of the closed form; frame ORDER is pinned
byte-for-byte; malformed containers raise rather than guess.
"""

from __future__ import annotations

import hashlib
import struct

import pytest

from module8_movies_etl_spark.operators.multimodal import (
    avi_frame_sampler,
    decode_avi_video,
    decode_jpeg,
    demux_avi_mjpeg,
    make_avi_mjpeg,
    make_jpeg,
)


def _literal_gray_jpeg(dc_bits: str) -> bytes:
    """The same hand-built single-component 8x8 JPEG as
    tests/test_jpeg_codec.py's literal golden (duplicated on purpose:
    each codec rung's literal test stays self-contained): DC Huffman
    table with one symbol (category 3, code '0'), AC table with EOB
    only, quant 1 — entropy segment '0' + 3 DC value bits + '0'."""
    out = bytearray(b"\xff\xd8")
    dqt = bytes([0]) + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls, tid, bits, vals):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, [1] + [0] * 15, [3])
    out += dht(1, 0, [1] + [0] * 15, [0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    bits = "0" + dc_bits + "0"
    bits += "1" * (-len(bits) % 8)
    out += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out += b"\xff\xd9"
    return bytes(out)


def _literal_avi(frames: list[bytes], w: int, h: int) -> bytes:
    """A LITERAL AVI written by hand with struct packs — no shared
    code with make_avi_mjpeg (this is the independence layer)."""

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    nf = len(frames)
    avih = struct.pack("<14I", 200000, 0, 0, 0, nf, 0, 1, 512, w, h, 0, 0, 0, 0)
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 5, 0, nf, 512, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3,
                       0, 0, 0, 0)
    hdrl = chunk(
        b"LIST",
        b"hdrl"
        + chunk(b"avih", avih)
        + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_hand_built_literal_avi_decodes_to_stated_features():
    # frame 0: DC bits '101' = +5 -> every pixel 129 -> rgb 3*64*129
    # frame 1: DC bits '010' = -5 -> every pixel 127 -> rgb 3*64*127
    f0, f1 = _literal_gray_jpeg("101"), _literal_gray_jpeg("010")
    blob = _literal_avi([f0, f1], 8, 8)
    info = demux_avi_mjpeg(blob)
    assert info["n_frames"] == 2
    assert (info["width"], info["height"]) == (8, 8)
    assert info["fps"] == 5.0
    assert info["frames"] == [f0, f1]
    feats = decode_avi_video(blob)
    r0, r1 = 3 * 64 * 129, 3 * 64 * 127
    assert feats["rgb_sum_total"] == r0 + r1
    assert feats["rgb_sum_ordered"] == 1 * r0 + 2 * r1  # order pinned
    assert feats["mean_luma"] == (r0 + r1) / ((2 * 3 * 8 * 8) * 255.0)


def test_generator_round_trips_byte_exactly_in_order():
    odd_seen = False
    for doc_id in range(40):
        info = demux_avi_mjpeg(make_avi_mjpeg(doc_id))
        nf = 2 + doc_id % 4
        assert info["n_frames"] == nf
        assert info["width"] == 9 + doc_id % 16
        assert info["height"] == 9 + doc_id % 8
        for f in range(nf):
            # byte-exact AND order-exact: a demux that drops the RIFF
            # pad byte, miscounts a chunk size, or reorders frames
            # fails here
            assert info["frames"][f] == make_jpeg(doc_id + 128 * f)
            odd_seen = odd_seen or len(info["frames"][f]) % 2 == 1
    # the word-alignment path must actually be exercised
    assert odd_seen, "no odd-sized frame in 40 docs; padding untested"


def test_features_match_plain_python_closed_form():
    import math

    for doc_id in range(64):
        nf = 2 + doc_id % 4
        w, h = 9 + doc_id % 16, 9 + doc_id % 8
        cr = 2 * ((doc_id % 4) * 4 - 4)
        cb = 2 * (((doc_id // 4) % 4) * 4 - 4)
        total = ordered = 0
        for f in range(nf):
            eid = doc_id + 128 * f
            y_total = 0
            for by in range(2):
                for bx in range(3):
                    if 8 * bx < w and 8 * by < h:
                        ow, oh = min(w - 8 * bx, 8), min(h - 8 * by, 8)
                        dcq = ((eid * 3 + 5 * bx + 7 * by) % 33) - 16
                        y_total += ow * oh * (128 + 2 * dcq)
            frgb = 3 * y_total + w * h * (
                math.floor(1.402 * cr + 0.5)
                + math.floor((-0.344136 * cb) + (-0.714136 * cr) + 0.5)
                + math.floor(1.772 * cb + 0.5)
            )
            total += frgb
            ordered += (f + 1) * frgb
        feats = decode_avi_video(make_avi_mjpeg(doc_id))
        assert feats["n_frames"] == nf and feats["width"] == w
        assert feats["rgb_sum_total"] == total, doc_id
        assert feats["rgb_sum_ordered"] == ordered, doc_id
        assert feats["mean_luma"] == total / ((nf * 3 * w * h) * 255.0)


def test_luma_pattern_actually_varies_across_frames():
    # the anti-fake-demux property the generator promises: frames of
    # one video share dims but differ in decoded content, so decoding
    # frame 0 and multiplying by n_frames cannot reproduce the oracle
    for doc_id in (0, 7, 33):
        sums = [
            decode_jpeg(f)["rgb_sum"]
            for f in demux_avi_mjpeg(make_avi_mjpeg(doc_id))["frames"]
        ]
        assert len(set(sums)) > 1, (doc_id, sums)


def test_avi_frame_sampler_returns_real_jpegs():
    blob = make_avi_mjpeg(5)
    frames = avi_frame_sampler(blob)
    assert len(frames) == 2 + 5 % 4
    for f, frame in enumerate(frames):
        assert frame == make_jpeg(5 + 128 * f)
        assert frame[:2] == b"\xff\xd8" and frame[-2:] == b"\xff\xd9"


def _patch(blob: bytes, marker: bytes, rel_off: int, value: int) -> bytes:
    pos = blob.index(marker)
    return (
        blob[: pos + rel_off]
        + struct.pack("<I", value)
        + blob[pos + rel_off + 4 :]
    )


def test_demux_rejects_what_it_cannot_honestly_demux():
    good = make_avi_mjpeg(3)

    with pytest.raises(ValueError, match="not a RIFF"):
        demux_avi_mjpeg(b"JFIF" + good[4:])
    with pytest.raises(ValueError, match="not an AVI RIFF form"):
        demux_avi_mjpeg(good[:8] + b"WAVE" + good[12:])
    with pytest.raises(ValueError, match="truncated"):
        demux_avi_mjpeg(good[:40])
    # avih.dwTotalFrames is at avih-chunk data offset 16 (fourcc+size
    # = 8 bytes, then 4 DWORDs) — declare one frame too many
    nf = 2 + 3 % 4
    with pytest.raises(ValueError, match="frame count mismatch"):
        demux_avi_mjpeg(_patch(good, b"avih", 8 + 16, nf + 1))
    # avih.dwWidth at data offset 32 — disagree with strf
    with pytest.raises(ValueError, match="disagree on frame dimensions"):
        demux_avi_mjpeg(_patch(good, b"avih", 8 + 32, 999))
    # an inter-frame handler must be refused, not guessed at
    with pytest.raises(ValueError, match="inter-frame codecs need ffmpeg"):
        demux_avi_mjpeg(good.replace(b"vidsMJPG", b"vidsH264", 1))
    # a chunk whose declared size overruns its parent
    with pytest.raises(ValueError, match="overruns"):
        demux_avi_mjpeg(_patch(good, b"00dc", 4, 1 << 24))
    # frame dims disagreeing with the container (decode-stage check):
    # wrong-dimension JPEG swapped in for a frame of doc 3's size
    w, h = 9 + 3 % 16, 9 + 3 % 8
    alien = make_jpeg(4)  # 13x13, container says 12x12
    frames = demux_avi_mjpeg(good)["frames"]
    blob = _literal_avi([alien] + frames[1:], w, h)
    with pytest.raises(ValueError, match="container declares"):
        decode_avi_video(blob)


def test_sample_frames_stage_is_real_for_mjpeg_avi(spark):
    # the one-to-many mapInPandas stage over REAL video bytes: each
    # emitted (doc_id, frame_idx, frame_sha) must hash the genuine
    # per-frame JPEG
    from module8_movies_etl_spark.operators.multimodal import (
        sample_frames,
        synthesize_media_payloads,
    )

    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    blobs = synthesize_media_payloads(docs, maker=make_avi_mjpeg)
    rows = (
        sample_frames(blobs, sampler=avi_frame_sampler)
        .orderBy("doc_id", "frame_idx")
        .collect()
    )
    expected = [
        (d, f, hashlib.sha256(make_jpeg(d + 128 * f)).hexdigest())
        for d in range(6)
        for f in range(2 + d % 4)
    ]
    assert [(r.doc_id, r.frame_idx, r.frame_sha) for r in rows] == expected
