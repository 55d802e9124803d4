"""The pure-stdlib baseline JPEG codec (VERDICT r8 task #1).

Three independence layers, mirroring the PNG rung's test strategy:
a hand-built LITERAL JPEG (grayscale, minimal tables, bytes written
in this file — no shared generator code) must decode to stated
pixels; the generator's files must decode to hand-computed PIXEL
values (not just aggregate features); and the feature dict must
match a plain-Python replay of the closed form the DuckDB oracle
states. Error paths (progressive SOF2, restart intervals, truncated
streams) must raise rather than guess.
"""

from __future__ import annotations

import math
import struct

import pytest

from module8_movies_etl_spark.operators.multimodal import (
    _JPEG_ZZ,
    _parse_jpeg,
    decode_jpeg,
    make_jpeg,
)


def test_zigzag_order_matches_spec_landmarks():
    # spec landmarks: index 10 = (4,0), 14 = (0,4), 39 = (4,4),
    # 63 = (7,7); the walk must be a permutation of 0..63
    assert _JPEG_ZZ[0] == 0
    assert _JPEG_ZZ[1] == 1 and _JPEG_ZZ[2] == 8
    assert _JPEG_ZZ[10] == 32  # row 4, col 0
    assert _JPEG_ZZ[14] == 4   # row 0, col 4
    assert _JPEG_ZZ[39] == 36  # row 4, col 4
    assert _JPEG_ZZ[63] == 63
    assert sorted(_JPEG_ZZ) == list(range(64))


def test_generated_file_is_structurally_valid_jpeg():
    blob = make_jpeg(7)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    # walk the marker stream independently of the decoder
    seen = []
    pos = 2
    while pos < len(blob) - 2:
        assert blob[pos] == 0xFF, f"marker expected at {pos}"
        m = blob[pos + 1]
        seen.append(m)
        (ln,) = struct.unpack_from(">H", blob, pos + 2)
        pos += 2 + ln
        if m == 0xDA:
            break
    assert seen.count(0xE0) == 1  # APP0/JFIF
    assert seen.count(0xDB) == 1  # DQT
    assert seen.count(0xC0) == 1  # SOF0 (baseline)
    assert seen.count(0xC4) == 4  # four DHT tables
    assert seen[-1] == 0xDA       # SOS last
    # no bare marker may appear inside the entropy segment: every
    # 0xFF before EOI must be stuffed
    scan = blob[pos:-2]
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00, "unstuffed 0xFF in entropy data"
            i += 1
        i += 1


def test_decoder_pixels_match_hand_computation_doc0():
    # doc 0: w=h=9, two block rows/cols. Hand-derived (flat Q=16,
    # pixel = 128 + 2*dcq ± 2*acq on the ±√2/2 cosine bases):
    #   block (0,0): dcq=-16 -> base 96; shape 0 -> AC at zz14
    #     (basis (0,4), acq=1): columns alternate +2/-2 as
    #     [+,-,-,+,+,-,-,+] -> row = [98,94,94,98,98,94,94,98]
    #   block (1,0) (right edge, partial): dcq=-11, DC only -> 106
    #   block (0,1): dcq=-9 -> 110; shape 1 -> AC at zz39 (basis
    #     (4,4), acq2=4): corner (local 0,0) sign + -> 110+8=118
    #   block (1,1): dcq=-4, DC only -> 120
    #   chroma: cbq=crq=-4 -> both planes constant 120
    w, h, (y, cb, cr) = _parse_jpeg(make_jpeg(0))
    assert (w, h) == (9, 9)
    assert list(y[0][:9]) == [98, 94, 94, 98, 98, 94, 94, 98, 106]
    assert y[8][0] == 118
    assert y[8][8] == 120
    assert cb.min() == cb.max() == 120
    assert cr.min() == cr.max() == 120


def test_features_match_plain_python_closed_form():
    # the same closed form the DuckDB oracle states, replayed in
    # plain Python — per-block DC sums (AC bases cancel over full
    # rows) plus the constant chroma RGB offsets
    def expected(doc_id: int) -> dict:
        w = 9 + doc_id % 16
        h = 9 + doc_id % 8
        cr_off = 2 * ((doc_id % 4) * 4 - 4)
        cb_off = 2 * (((doc_id // 4) % 4) * 4 - 4)
        y_total = 0
        for by in range((h + 7) // 8):
            for bx in range((w + 7) // 8):
                ow, oh = min(w - 8 * bx, 8), min(h - 8 * by, 8)
                dc = ((doc_id * 3 + 5 * bx + 7 * by) % 33) - 16
                y_total += ow * oh * (128 + 2 * dc)
        off = (
            math.floor(1.402 * cr_off + 0.5)
            + math.floor((-0.344136 * cb_off) + (-0.714136 * cr_off) + 0.5)
            + math.floor(1.772 * cb_off + 0.5)
        )
        rgb = 3 * y_total + w * h * off
        return {
            "width": w, "height": h, "n_channels": 3, "rgb_sum": rgb,
            "mean_luma": rgb / (3 * w * h * 255.0),
        }

    for doc_id in range(96):  # covers all (w, h, chroma, shape) cycles
        assert decode_jpeg(make_jpeg(doc_id)) == expected(doc_id), doc_id


def _minimal_gray_jpeg(dc_bits: str, quant: int = 1) -> bytes:
    """A LITERAL single-component 8x8 JPEG written by hand: custom
    1-entry Huffman tables (DC: symbol=category 3, code '0'; AC: EOB,
    code '0'), so the entropy segment is '0' + 3 DC value bits + '0'
    padded with ones."""
    out = bytearray(b"\xff\xd8")
    dqt = bytes([0]) + bytes([quant] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls, tid, bits, vals):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, [1] + [0] * 15, [3])   # DC: category 3, code '0'
    out += dht(1, 0, [1] + [0] * 15, [0x00])  # AC: EOB, code '0'
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    bits = "0" + dc_bits + "0"
    bits += "1" * (-len(bits) % 8)
    out += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_built_literal_grayscale_jpeg():
    # DC category 3, value bits '101' = +5; Q[0]=1 -> dequantized
    # DC=5 -> every pixel floor(5/8 + 128.5) = 129; grayscale ->
    # R=G=B=Y -> rgb_sum = 3*64*129
    f = decode_jpeg(_minimal_gray_jpeg("101"))
    assert (f["width"], f["height"], f["n_channels"]) == (8, 8, 1)
    assert f["rgb_sum"] == 3 * 64 * 129
    assert f["mean_luma"] == (3 * 64 * 129) / (3 * 64 * 255.0)
    # value bits '010' decode through EXTEND's negative branch:
    # 010 < 100 -> v = 2 - 7 = -5 -> pixel floor(-5/8 + 128.5) = 127
    f = decode_jpeg(_minimal_gray_jpeg("010"))
    assert f["rgb_sum"] == 3 * 64 * 127


def test_decoder_rejects_what_it_cannot_honestly_decode():
    blob = bytearray(make_jpeg(3))
    # progressive: flip SOF0 (0xC0) to SOF2 (0xC2)
    i = blob.index(b"\xff\xc0")
    prog = blob[:i] + b"\xff\xc2" + blob[i + 2:]
    with pytest.raises(ValueError, match="baseline"):
        _parse_jpeg(bytes(prog))
    # restart intervals: inject a DRI segment before SOS
    j = blob.index(b"\xff\xda")
    dri = blob[:j] + b"\xff\xdd\x00\x04\x00\x08" + blob[j:]
    with pytest.raises(ValueError, match="estart"):
        _parse_jpeg(bytes(dri))
    # truncated entropy stream
    with pytest.raises((ValueError, IndexError)):
        _parse_jpeg(bytes(blob[: j + 6]))
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        _parse_jpeg(b"BM" + b"\x00" * 64)


def test_generator_cycles_every_entropy_code_path():
    # across doc_ids the entropy data must exercise: EOB-only blocks,
    # the run-13 symbol (zz14), double-ZRL + run-6 (zz39 alone),
    # single-ZRL + run-8 (both ACs), and negative DC diffs — verified
    # on the generator's COEFFICIENT plan, then decoded back to prove
    # the decoder consumes each path
    from module8_movies_etl_spark.operators.multimodal import (
        _jpeg_block_coefs,
    )

    shapes = set()
    for doc_id in range(12):
        w = 9 + doc_id % 16
        for by in range(2):
            for bx in range((w + 7) // 8):
                dc, ac14, ac39 = _jpeg_block_coefs(doc_id, bx, by, w)
                shapes.add((ac14 > 0, ac39 > 0))
    assert shapes == {(False, False), (True, False), (False, True),
                      (True, True)}
    for doc_id in range(12):
        decode_jpeg(make_jpeg(doc_id))  # every path must round-trip
