"""The pure-stdlib GIF/LZW codec — the DICTIONARY-coding rung of the
codec ladder (beside PNG's DEFLATE and JPEG's Huffman/DCT).

Same independence layers as the PNG/JPEG rungs: a hand-built LITERAL
GIF with hand-packed LZW bits (no shared generator code) must decode
to stated features; the generator round-trips against a plain-Python
replay of the closed form over EVERY (width, height, palette) cycle
(561 combos — this sweep is what catches encoder/decoder width-sync
bugs at the EOI boundary); and malformed inputs raise rather than
guess.
"""

from __future__ import annotations

import struct

import pytest

from module8_movies_etl_spark.operators.multimodal import (
    _gif_palette,
    _gif_pixel_index,
    decode_gif,
    make_gif,
)


def _expected(doc_id: int) -> dict:
    w = 16 + doc_id % 17
    h = 12 + doc_id % 11
    nc = 1 << (2 + doc_id % 3)
    pal = _gif_palette(doc_id, nc)
    rgb = sum(
        sum(pal[_gif_pixel_index(doc_id, p, nc)]) for p in range(w * h)
    )
    return {
        "width": w, "height": h, "n_colors": nc, "rgb_sum": rgb,
        "mean_rgb": rgb / (3 * w * h * 255.0),
    }


def test_round_trip_over_every_parameter_cycle():
    # lcm(17, 11, 3) = 561 covers every (w, h, n_colors) combination;
    # any LZW width-sync bug (the EOI-boundary class) trips here
    for doc_id in range(561):
        assert decode_gif(make_gif(doc_id)) == _expected(doc_id), doc_id


def test_generated_stream_exercises_framing_and_width_growth():
    # at least one doc must span multiple 255-byte sub-blocks (the
    # hash-mixed pixel pattern exists to guarantee this)
    multi = 0
    for doc_id in range(40):
        blob = make_gif(doc_id)
        nc = 1 << (2 + doc_id % 3)
        pos = 13 + 3 * nc + 10 + 1  # header+LSD+GCT+imgdesc+mincode
        blocks = 0
        while blob[pos] != 0:
            blocks += 1
            pos += 1 + blob[pos]
        if blocks > 1:
            multi += 1
        assert blob[:6] == b"GIF87a" and blob[-1] == 0x3B
    assert multi > 0, "no GIF spans multiple sub-blocks — pattern too compressible"


def test_hand_built_literal_gif():
    # 2x2, 4 colors, indices [1, 0, 3, 2]; LZW hand-packed LSB-first:
    # clear(4)@3b, 1@3b, 0@3b, 3@3b, 2@4b (width grew: after defining
    # entry 8 the next code exceeds 3 bits), eoi(5)@4b
    # -> payload bytes [12, 38, 5]
    palette = bytes(
        [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    )
    gif = (
        b"GIF87a"
        + struct.pack("<HHBBB", 2, 2, 0x80 | (1 << 4) | 1, 0, 0)
        + palette
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])                     # LZW min code size
        + bytes([3, 12, 38, 5])          # one 3-byte sub-block
        + b"\x00\x3b"
    )
    f = decode_gif(gif)
    assert (f["width"], f["height"], f["n_colors"]) == (2, 2, 4)
    # indices 1,0,3,2 -> (40+50+60)+(10+20+30)+(100+110+120)+(70+80+90)
    assert f["rgb_sum"] == 780
    assert f["mean_rgb"] == 780 / (12 * 255.0)


def test_decoder_skips_gif89a_extensions():
    # inject a graphics-control extension (0x21 0xF9, 4-byte block)
    # before the image descriptor; an extension-unaware walk misreads
    # everything after it
    blob = bytearray(make_gif(7))
    i = blob.index(b"\x2c")
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = b"GIF89a" + bytes(blob[6:i]) + ext + bytes(blob[i:])
    assert decode_gif(patched) == _expected(7)


def test_decoder_rejects_what_it_cannot_honestly_decode():
    blob = bytearray(make_gif(3))
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + bytes(blob[6:]))
    # interlace flag on the image descriptor
    i = blob.index(b"\x2c")
    bad = bytearray(blob)
    bad[i + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(bad))
    # truncated LZW stream: drop the last sub-block's tail
    with pytest.raises(ValueError, match="truncated|indices"):
        decode_gif(bytes(blob[: i + 14]) + b"\x00\x3b")
    # trailer with no image data
    with pytest.raises(ValueError, match="no image"):
        decode_gif(bytes(blob[:i]) + b"\x3b")


def test_deferred_clear_table_freeze_past_4096():
    # A 12-bit LZW table holds at most 4096 entries; per the spec's
    # deferred-clear behavior an encoder that never sends a mid-stream
    # clear simply FREEZES the table and keeps emitting existing
    # codes. An encoder or decoder that keeps defining entries past
    # 4095 desynchronizes on exactly these streams (codes would no
    # longer fit the 12-bit width). Build a stream large and
    # PRNG-mixed enough to genuinely fill the table, frame it into a
    # real GIF, and round-trip.
    from module8_movies_etl_spark.operators.multimodal import (
        _gif_lzw_encode,
    )

    w, h, nc, min_code = 160, 120, 16, 4
    indices = [_gif_pixel_index(99991, p, nc) for p in range(w * h)]
    payload, final_next_code = _gif_lzw_encode(indices, min_code)
    assert final_next_code == 4096, (
        "test stream must actually fill the 12-bit table; got "
        f"{final_next_code}"
    )

    pal = _gif_palette(7, nc)
    blob = bytearray(b"GIF87a")
    blob += struct.pack("<HHBBB", w, h, 0x80 | (3 << 4) | 3, 0, 0)
    for r, g, b in pal:
        blob += bytes((r, g, b))
    blob += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    blob.append(min_code)
    for i in range(0, len(payload), 255):
        block = payload[i : i + 255]
        blob.append(len(block))
        blob += block
    blob += b"\x00\x3b"

    feats = decode_gif(bytes(blob))
    expected_rgb = sum(sum(pal[i]) for i in indices)
    assert feats["width"] == w and feats["height"] == h
    assert feats["n_colors"] == nc
    assert feats["rgb_sum"] == expected_rgb
