"""Real PCM WAV decode (operators/multimodal.py round 5): the synthesized
containers must be genuine RIFF/WAVE (the stdlib ``wave`` module — a
third-party-free reference decoder — parses them), the mapInPandas
decoder must agree with it, and corrupt payloads must fail loudly."""

from __future__ import annotations

import io
import wave

import pytest
from pyspark.sql import functions as F

from etl_cortex_spark.operators import multimodal as MM
from etl_cortex_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_wav_payloads_are_genuine_riff(spark):
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10)
    rows = MM.synthesize_wav_assets(docs).collect()
    assert rows
    for r in rows:
        with wave.open(io.BytesIO(bytes(r["payload"]))) as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == MM.WAV_RATE
            assert w.getnframes() == MM._wav_n_samples(r["asset_id"])
            frames = w.readframes(w.getnframes())
        # first decoded sample agrees with the closed form
        first = int.from_bytes(frames[:2], "little", signed=True)
        assert first == MM._wav_sample(r["asset_id"], 0)


def test_wav_decode_matches_stdlib_reference(spark):
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10)
    assets = MM.synthesize_wav_assets(docs)
    got = {r["asset_id"]: r for r in MM.decode_wav_features(assets).collect()}
    for r in assets.collect():
        with wave.open(io.BytesIO(bytes(r["payload"]))) as w:
            d = got[r["asset_id"]]
            assert d["n_samples"] == w.getnframes()
            assert d["sample_rate"] == w.getframerate()
            assert d["n_channels"] == w.getnchannels()
            assert d["duration_s"] == pytest.approx(
                w.getnframes() / w.getframerate()
            )


def test_wav_decode_rejects_corrupt_payload(spark):
    bad = spark.createDataFrame(
        [(1, bytearray(b"NOTAWAVE" + b"\x00" * 64))],
        "asset_id long, payload binary",
    )
    with pytest.raises(Exception, match="RIFF|WAVE"):
        MM.decode_wav_features(bad).collect()


# --- BMP twin (round 6): real 24-bpp decode, no codec library ---------------


def test_bmp_payload_structure_and_closed_form(spark):
    """The synthesized BMPs are structurally valid: BM magic, correct
    file/pixel offsets, bottom-up 24-bpp header, 4-byte-padded rows,
    and pixel (0,0) (image coords → LAST stored row) matches the
    closed form."""
    import struct

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10)
    for r in MM.synthesize_bmp_assets(docs).collect():
        d = int(r["asset_id"])
        w, h = MM._bmp_dims(d)
        buf = bytes(r["payload"])
        assert buf[:2] == b"BM"
        size, _, _, off = struct.unpack("<IHHI", buf[2:14])
        assert size == len(buf) and off == 54
        hdr, bw, bh, planes, bpp = struct.unpack("<IiiHH", buf[14:30])
        assert (hdr, bw, bh, planes, bpp) == (40, w, h, 1, 24)
        stride = (w * 3 + 3) // 4 * 4
        assert stride != w * 3, "widths must exercise row padding"
        assert len(buf) == off + h * stride
        # stored row h-1 = image row 0; first 3 bytes are B,G,R of (0,0)
        p = off + (h - 1) * stride
        assert buf[p] == (d * 31) % 256       # b(0,0)
        assert buf[p + 1] == (d * 17) % 256   # g(0,0)
        assert buf[p + 2] == (d * 23) % 256   # r(0,0)


def test_bmp_decode_orientation_sensitive(spark):
    """topleft_lum must read the LAST stored row (bottom-up format): a
    payload with its stored rows flipped decodes to a DIFFERENT
    topleft_lum whenever the closed form differs across rows."""
    import struct

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") == 1)
    [r] = MM.synthesize_bmp_assets(docs).collect()
    buf = bytes(r["payload"])
    off = 54
    w, h = MM._bmp_dims(1)
    stride = (w * 3 + 3) // 4 * 4
    rows = [buf[off + i * stride : off + (i + 1) * stride] for i in range(h)]
    flipped = buf[:off] + b"".join(reversed(rows))
    both = spark.createDataFrame(
        [(1, bytearray(buf)), (2, bytearray(flipped))],
        "asset_id long, payload binary",
    )
    got = {x["asset_id"]: x for x in MM.decode_bmp_features(both).collect()}
    assert got[1]["topleft_lum"] == (31 % 256) + (17 % 256) + (23 % 256)
    assert got[1]["topleft_lum"] != got[2]["topleft_lum"]
    # means are orientation-invariant — same bytes, same sums
    assert got[1]["mean_r"] == got[2]["mean_r"]


def test_bmp_decode_rejects_corrupt_payload(spark):
    bad = spark.createDataFrame(
        [(1, bytearray(b"XX" + b"\x00" * 64))],
        "asset_id long, payload binary",
    )
    with pytest.raises(Exception, match="BMP"):
        MM.decode_bmp_features(bad).collect()

# --- PNG twin (round 9: registers the round-8 decoder) ----------------------


def test_png_payload_structure_and_filter_coverage(spark):
    """The synthesized PNGs are structurally valid (signature, IHDR
    geometry from _png_dims, two IDAT chunks, valid CRCs end-to-end)
    and every asset taller than 4 rows carries ALL FIVE filter types,
    so the decoder cannot pass while skipping any unfilter path."""
    import struct
    import zlib

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10)
    rows = MM.synthesize_png_assets(docs).collect()
    assert rows
    for r in rows:
        d = int(r["asset_id"])
        w, h = MM._png_dims(d)
        buf = bytes(r["payload"])
        assert buf[:8] == b"\x89PNG\r\n\x1a\n"
        pos, chunks, idat = 8, [], b""
        while pos < len(buf):
            (n,) = struct.unpack(">I", buf[pos : pos + 4])
            ctype = buf[pos + 4 : pos + 8]
            data = buf[pos + 8 : pos + 8 + n]
            (crc,) = struct.unpack(">I", buf[pos + 8 + n : pos + 12 + n])
            assert zlib.crc32(ctype + data) & 0xFFFFFFFF == crc
            chunks.append(ctype)
            if ctype == b"IHDR":
                assert struct.unpack(">IIBBBBB", data) == (w, h, 8, 2, 0, 0, 0)
            elif ctype == b"IDAT":
                idat += data
            pos += 12 + n
        assert chunks == [b"IHDR", b"IDAT", b"IDAT", b"IEND"]
        lines = zlib.decompress(idat)
        assert len(lines) == h * (w * 3 + 1)
        filters = {lines[y * (w * 3 + 1)] for y in range(h)}
        assert filters == {0, 1, 2, 3, 4}, f"asset {d}: filters {filters}"


def test_png_decode_roundtrip_and_orientation(spark):
    """decode(synthesize) reproduces the closed form exactly —
    including topleft_lum from the FIRST stored row (PNG is top-down:
    the opposite orientation proof from bottom-up BMP)."""
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10)
    assets = MM.synthesize_png_assets(docs)
    for r in MM.decode_png_features(assets).collect():
        d = int(r["asset_id"])
        w, h = MM._png_dims(d)
        n = w * h
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, n)
        sums = [0, 0, 0]
        for y in range(h):
            for x in range(w):
                sums[0] += (d * 23 + x * 3 + y * 19) % 256
                sums[1] += (d * 17 + x * 5 + y * 11) % 256
                sums[2] += (d * 31 + x * 7 + y * 13) % 256
        assert r["mean_r"] == sums[0] / n
        assert r["mean_g"] == sums[1] / n
        assert r["mean_b"] == sums[2] / n
        assert r["topleft_lum"] == (d * 23) % 256 + (d * 17) % 256 + (d * 31) % 256


def test_png_decode_rejects_corrupt_payloads(spark):
    """Loud failure on a non-PNG payload AND on a bit-flip inside a
    chunk (the CRC walk must catch in-stream corruption, not just a
    bad magic)."""
    import pytest as _pytest

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") == 1)
    [r] = MM.synthesize_png_assets(docs).collect()
    buf = bytearray(bytes(r["payload"]))
    buf[40] ^= 0xFF  # flip a byte inside IHDR/IDAT territory
    bad = spark.createDataFrame(
        [(1, bytearray(b"XX" + b"\x00" * 64)), (2, buf)],
        "asset_id long, payload binary",
    )
    with _pytest.raises(Exception, match="PNG|CRC"):
        MM.decode_png_features(bad.filter(F.col("asset_id") == 1)).collect()
    with _pytest.raises(Exception, match="CRC"):
        MM.decode_png_features(bad.filter(F.col("asset_id") == 2)).collect()
