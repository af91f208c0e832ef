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


def test_jpeg_payload_structure(spark):
    """The synthesized JPEGs follow T.81's segment grammar: SOI, DQT
    (65-byte 8-bit table, q[0]=8), SOF0 with _jpeg_dims geometry and
    one 1x1-sampled component, two DHT segments (9-symbol DC table,
    single-EOB AC table), SOS, entropy data with no bare 0xFF except
    markers, EOI. Dimensions are MCU-aligned multiples of 8."""
    import struct

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 12)
    rows = MM.synthesize_jpeg_assets(docs).collect()
    assert rows
    for r in rows:
        d = int(r["asset_id"])
        w, h = MM._jpeg_dims(d)
        assert w % 8 == 0 and h % 8 == 0
        buf = bytes(r["payload"])
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        pos, seen = 2, []
        while pos < len(buf) - 2:
            assert buf[pos] == 0xFF, f"asset {d}: expected marker at {pos}"
            m = buf[pos + 1]
            (ln,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
            seg = buf[pos + 4 : pos + 2 + ln]
            seen.append(m)
            if m == 0xDB:
                assert ln == 67 and seg[0] == 0x00 and seg[1] == 8
            elif m == 0xC0:
                prec, hh, ww, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
                assert (prec, hh, ww, nc) == (8, h, w, 1)
                assert seg[7] == 0x11  # 1x1 sampling
            elif m == 0xC4:
                tc = seg[0] >> 4
                nvals = sum(seg[1:17])
                assert (tc, nvals) in ((0, 9), (1, 1))
            pos += 2 + ln
            if m == 0xDA:
                # entropy data: every 0xFF must be stuffed until EOI
                p = pos
                while p < len(buf) - 2:
                    if buf[p] == 0xFF:
                        assert buf[p + 1] == 0x00, f"asset {d}: bare 0xFF at {p}"
                        p += 2
                    else:
                        p += 1
                break
        assert seen == [0xDB, 0xC0, 0xC4, 0xC4, 0xDA]


def test_jpeg_decode_roundtrip_closed_form(spark):
    """decode(synthesize) reproduces the DC closed form exactly: every
    8x8 block decodes to the uniform value 128 + qDC (q[0]=8 cancels
    the IDCT's /8), so mean_lum equals the block-value mean and
    topleft_lum is block (0,0)'s value."""
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 12)
    assets = MM.synthesize_jpeg_assets(docs)
    for r in MM.decode_jpeg_features(assets).collect():
        d = int(r["asset_id"])
        w, h = MM._jpeg_dims(d)
        nbx, nby = w // 8, h // 8
        vals = [
            128 + ((d * 7 + bx * 5 + by * 3) % 160 - 80)
            for by in range(nby)
            for bx in range(nbx)
        ]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["mean_lum"] == sum(vals) / len(vals)
        assert r["topleft_lum"] == 128 + ((d * 7) % 160 - 80)


def test_jpeg_decoder_is_general_not_dc_only(spark):
    """The decoder must run the REAL baseline path, not a DC shortcut:
    hand-build a JPEG whose single block carries a nonzero AC
    coefficient (via a custom DHT that can encode it) and check the
    decoded block is NON-uniform and matches an independent IDCT."""
    import math
    import struct

    import numpy as np

    # encode one 8x8 block with qDC=0 and AC zigzag[1] = 3, using a
    # DC table {sizes 0..8 @ 4 bits} and an AC table {EOB, 0x01} where
    # 0x01 = run 0 / size 1 (canonical codes: EOB="0", 0x01="10").
    q = bytes([8] + [16] * 63)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    bits_dc = bytearray(16); bits_dc[3] = 9
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 9) + b"\x00" + bytes(bits_dc) + bytes(range(9))
    bits_ac = bytearray(16); bits_ac[0] = 1; bits_ac[1] = 1
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 2) + b"\x10" + bytes(bits_ac) + bytes([0x00, 0x01])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    # bits: DC size 0 -> "0000"; AC(0x01)="10" + amplitude "1" (=+1... use 3? size1 encodes ±1)
    # 0000 | 10 | 1 | EOB "0" -> 00001010 padded with 1s -> byte 0x0A? wait: 0000 101 0 = 0x0A exactly 8 bits
    out += bytes([0b00001010])
    out += b"\xff\xd9"
    df = spark.createDataFrame([(7, bytearray(bytes(out)))], "asset_id long, payload binary")
    [r] = MM.decode_jpeg_features(df).collect()
    # independent reference: F[zigzag 1] = 1 * 16 (quant), IDCT
    Fm = np.zeros((8, 8))
    Fm[0, 1] = 16.0  # zigzag index 1 -> row 0, col 1
    M = np.array([
        [((1 / math.sqrt(2)) if u == 0 else 1.0) / 2.0
         * math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)
    ])
    block = np.clip(np.rint(M.T @ Fm @ M).astype(int) + 128, 0, 255)
    assert block.min() != block.max()  # non-uniform: AC path exercised
    assert r["mean_lum"] == float(block.sum()) / 64
    assert r["topleft_lum"] == int(block[0, 0])


def test_jpeg_decode_rejects_corrupt_and_unsupported(spark):
    """Loud failure on non-JPEG bytes and on unsupported shapes (the
    documented contract: multi-component / progressive raise)."""
    import pytest as _pytest
    import struct

    bad_magic = spark.createDataFrame(
        [(1, bytearray(b"not a jpeg at all" + b"\x00" * 16))],
        "asset_id long, payload binary",
    )
    with _pytest.raises(Exception, match="JPEG|SOI"):
        MM.decode_jpeg_features(bad_magic).collect()

    # progressive SOF2 must raise, not mis-decode
    prog = bytearray(b"\xff\xd8")
    prog += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    prog += b"\xff\xd9"
    df = spark.createDataFrame([(2, bytearray(bytes(prog)))], "asset_id long, payload binary")
    with _pytest.raises(Exception, match="baseline|SOF"):
        MM.decode_jpeg_features(df).collect()


def test_color_jpeg_payload_structure(spark):
    """The synthesized COLOR JPEGs follow T.81: SOI, one DQT carrying
    both 8-bit tables, SOF0 with 3 components (Y 2x2/tq0, Cb,Cr
    1x1/tq1 — the 4:2:0 layout), FOUR DHT segments (DC/AC x luma/
    chroma), SOS mapping Y->(0,0) and chroma->(1,1), stuffed entropy
    data, EOI. Dimensions are MCU-aligned multiples of 16."""
    import struct

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 12)
    rows = MM.synthesize_color_jpeg_assets(docs).collect()
    assert rows
    for r in rows:
        d = int(r["asset_id"])
        w, h = MM._color_jpeg_dims(d)
        assert w % 16 == 0 and h % 16 == 0
        buf = bytes(r["payload"])
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        pos, seen = 2, []
        while pos < len(buf) - 2:
            assert buf[pos] == 0xFF, f"asset {d}: expected marker at {pos}"
            m = buf[pos + 1]
            (ln,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
            seg = buf[pos + 4 : pos + 2 + ln]
            seen.append(m)
            if m == 0xDB:
                assert ln == 2 + 65 + 65
                assert seg[0] == 0x00 and seg[1] == 8      # luma table, q[0]=8
                assert seg[65] == 0x01 and seg[66] == 8    # chroma table
            elif m == 0xC0:
                prec, hh, ww, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
                assert (prec, hh, ww, nc) == (8, h, w, 3)
                assert seg[6:9] == bytes([1, 0x22, 0])     # Y: 2x2, tq 0
                assert seg[9:12] == bytes([2, 0x11, 1])    # Cb: 1x1, tq 1
                assert seg[12:15] == bytes([3, 0x11, 1])   # Cr: 1x1, tq 1
            elif m == 0xC4:
                tc, th = seg[0] >> 4, seg[0] & 0xF
                nvals = sum(seg[1:17])
                assert (tc, nvals) in ((0, 9), (1, 1)) and th in (0, 1)
            elif m == 0xDA:
                assert seg[0] == 3
                assert seg[1:7] == bytes([1, 0x00, 2, 0x11, 3, 0x11])
            pos += 2 + ln
            if m == 0xDA:
                p = pos
                while p < len(buf) - 2:
                    if buf[p] == 0xFF:
                        assert buf[p + 1] == 0x00, f"asset {d}: bare 0xFF at {p}"
                        p += 2
                    else:
                        p += 1
                break
        assert seen == [0xDB, 0xC0, 0xC4, 0xC4, 0xC4, 0xC4, 0xDA]


def test_color_jpeg_decode_roundtrip_closed_form(spark):
    """decode(synthesize) reproduces every closed form: per-plane
    means, and the block-uniform RGB conversion at (0,0)."""
    import math

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 12)
    assets = MM.synthesize_color_jpeg_assets(docs)
    for r in MM.decode_color_jpeg_features(assets).collect():
        d = int(r["asset_id"])
        w, h = MM._color_jpeg_dims(d)
        nbx, nby, nmx, nmy = w // 8, h // 8, w // 16, h // 16
        ys = [128 + ((d * 7 + bx * 5 + by * 3) % 160 - 80)
              for by in range(nby) for bx in range(nbx)]
        cbs = [128 + ((d * 11 + mx * 5 + my * 3) % 120 - 60)
               for my in range(nmy) for mx in range(nmx)]
        crs = [128 + ((d * 13 + mx * 3 + my * 7) % 120 - 60)
               for my in range(nmy) for mx in range(nmx)]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["mean_y"] == sum(ys) / len(ys)
        assert r["mean_cb"] == sum(cbs) / len(cbs)
        assert r["mean_cr"] == sum(crs) / len(crs)
        yv = 128 + ((d * 7) % 160 - 80)
        cbd = (d * 11) % 120 - 60
        crd = (d * 13) % 120 - 60
        assert r["topleft_r"] == min(max(math.floor(yv + 1.402 * crd + 0.5), 0), 255)
        assert r["topleft_g"] == min(
            max(math.floor(yv - 0.344136 * cbd - 0.714136 * crd + 0.5), 0), 255
        )
        assert r["topleft_b"] == min(max(math.floor(yv + 1.772 * cbd + 0.5), 0), 255)


def test_color_jpeg_decoder_general_ac_and_upsampling(spark):
    """The color decoder must run the REAL path on every component:
    hand-build a one-MCU 4:2:0 file whose Cb block carries a nonzero
    AC coefficient — the decoded chroma is NON-uniform, exercises the
    AC loop + dezigzag + IDCT on a chroma component, the x2 nearest
    upsample, and the conversion — and must match an independent
    numpy reference exactly."""
    import math
    import struct

    import numpy as np

    q = bytes([8] + [16] * 63)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 132) + b"\x00" + q + b"\x01" + q
    out += (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    bits_dc = bytearray(16); bits_dc[3] = 9
    for th in (0x00, 0x01):
        out += (b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 9)
                + bytes([th]) + bytes(bits_dc) + bytes(range(9)))
    bits_ac = bytearray(16); bits_ac[0] = 1; bits_ac[1] = 1
    for th in (0x10, 0x11):
        out += (b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 2)
                + bytes([th]) + bytes(bits_ac) + bytes([0x00, 0x01]))
    out += (b"\xff\xda" + struct.pack(">HB", 12, 3)
            + bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    # scan: 4x Y (DC size0 "0000" + EOB "0"), Cb (DC "0000" + AC 0x01
    # "10" + amp "1" + EOB "0"), Cr ("0000"+"0") = 33 bits, 1-padded
    bits = "00000" * 4 + "0000" + "10" + "1" + "0" + "00000"
    bits += "1" * (-len(bits) % 8)
    out += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out += b"\xff\xd9"

    df = spark.createDataFrame(
        [(3, bytearray(bytes(out)))], "asset_id long, payload binary"
    )
    [r] = MM.decode_color_jpeg_features(df).collect()
    M = np.array([
        [((1 / math.sqrt(2)) if u == 0 else 1.0) / 2.0
         * math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)
    ])
    Fm = np.zeros((8, 8)); Fm[0, 1] = 16.0  # zigzag 1 -> (0,1), quant 16
    cb_blk = np.clip(np.floor(M.T @ Fm @ M + 0.5).astype(int) + 128, 0, 255)
    assert cb_blk.min() != cb_blk.max()  # chroma AC path exercised
    cb_full = cb_blk.repeat(2, axis=0).repeat(2, axis=1)  # x2 upsample
    yv = np.full((16, 16), 128.0)
    cbd = cb_full.astype(float) - 128.0
    rr = np.clip(np.floor(yv + 1.402 * 0.0 + 0.5), 0, 255)
    bb = np.clip(np.floor(yv + 1.772 * cbd + 0.5), 0, 255)
    gg = np.clip(np.floor(yv - 0.344136 * cbd - 0.714136 * 0.0 + 0.5), 0, 255)
    assert r["mean_y"] == 128.0
    assert r["mean_cb"] == float(cb_full.sum()) / 256
    assert r["mean_cr"] == 128.0
    assert r["mean_r"] == float(rr.sum()) / 256
    assert r["topleft_r"] == int(rr[0, 0])
    assert r["topleft_g"] == int(gg[0, 0])
    assert r["topleft_b"] == int(bb[0, 0])


def test_color_jpeg_decode_rejects_and_grayscale_passthrough(spark):
    """Unsupported shapes raise loudly (progressive SOF2, 3x1
    sampling); a single-component payload decodes through the SAME
    kernel with NULL chroma/RGB features."""
    import struct

    import pytest as _pytest

    prog = bytearray(b"\xff\xd8")
    prog += (b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
             + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
    prog += b"\xff\xd9"
    df = spark.createDataFrame(
        [(2, bytearray(bytes(prog)))], "asset_id long, payload binary"
    )
    with _pytest.raises(Exception, match="baseline|SOF"):
        MM.decode_color_jpeg_features(df).collect()

    wide = bytearray(b"\xff\xd8")
    wide += (b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 48, 3)
             + bytes([1, 0x31, 0, 2, 0x11, 1, 3, 0x11, 1]))
    wide += b"\xff\xd9"
    df = spark.createDataFrame(
        [(4, bytearray(bytes(wide)))], "asset_id long, payload binary"
    )
    with _pytest.raises(Exception, match="sampling"):
        MM.decode_color_jpeg_features(df).collect()

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 4)
    gray = MM.synthesize_jpeg_assets(docs)
    for r in MM.decode_color_jpeg_features(gray).collect():
        d = int(r["asset_id"])
        w, h = MM._jpeg_dims(d)
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_cb"] is None and r["topleft_r"] is None
        assert r["mean_y"] is not None


def test_avi_container_structure_and_padding(spark):
    """Synthesized AVIs follow the RIFF grammar (magic, exact RIFF
    size, hdrl/movi lists) and — by construction — include ODD-sized
    frame chunks, so the walker's even-byte padding rule is genuinely
    exercised; the parse must agree with the closed forms."""
    import struct

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 16)
    rows = MM.synthesize_avi_assets(docs).collect()
    assert rows
    saw_odd = False
    for r in rows:
        d = int(r["asset_id"])
        buf = bytes(r["payload"])
        assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
        (sz,) = struct.unpack("<I", buf[4:8])
        assert sz == len(buf) - 8
        n = 10 + d % 16
        sizes = [64 + ((d * 31 + i * 17) % 128) for i in range(n)]
        saw_odd = saw_odd or any(s % 2 for s in sizes)
    assert saw_odd, "no odd frame sizes — padding rule untested"
    feats = {int(r["asset_id"]): r for r in MM.parse_avi_features(
        MM.synthesize_avi_assets(docs)).collect()}
    for d, r in feats.items():
        rate, scale = (24, 1) if d % 2 == 0 else (30000, 1001)
        n = 10 + d % 16
        assert (r["width"], r["height"]) == (160 + (d % 4) * 80, 120 + (d % 3) * 60)
        assert r["n_frames"] == n
        assert r["fps"] == rate / scale
        assert r["duration_s"] == (n * scale) / rate
        assert r["movi_bytes"] == sum(64 + ((d * 31 + i * 17) % 128) for i in range(n))
        assert r["first_frame_byte"] == d % 256


def test_avi_parse_rejects_corrupt_and_truncated(spark):
    """Loud failure on non-AVI bytes and on header/movi frame-count
    disagreement (the truncated-upload defect)."""
    import struct

    import pytest as _pytest

    bad = spark.createDataFrame(
        [(1, bytearray(b"RIFX" + b"\x00" * 64))], "asset_id long, payload binary"
    )
    with _pytest.raises(Exception, match="RIFF AVI"):
        MM.parse_avi_features(bad).collect()

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") == 3)
    [r] = MM.synthesize_avi_assets(docs).collect()
    buf = bytearray(bytes(r["payload"]))
    # drop the last movi frame chunk: rewrite the RIFF/LIST sizes so the
    # container stays well-formed but header counts disagree
    last_dc = buf.rfind(b"00dc")
    (frame_sz,) = struct.unpack("<I", buf[last_dc + 4 : last_dc + 8])
    cut = frame_sz + 8 + (frame_sz & 1)
    truncated = buf[:last_dc]
    (riff_sz,) = struct.unpack("<I", buf[4:8])
    struct.pack_into("<I", truncated, 4, riff_sz - cut)
    movi_list = truncated.rfind(b"LIST")
    (movi_sz,) = struct.unpack("<I", truncated[movi_list + 4 : movi_list + 8])
    struct.pack_into("<I", truncated, movi_list + 4, movi_sz - cut)
    df = spark.createDataFrame(
        [(3, bytearray(bytes(truncated)))], "asset_id long, payload binary"
    )
    with _pytest.raises(Exception, match="frame-count mismatch"):
        MM.parse_avi_features(df).collect()


def test_mp3_walk_closed_form_and_id3_skip(spark):
    """Synthesized MP3s start with a genuine ID3v2.4 tag (syncsafe
    size) and the walk must agree with every closed form."""
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 16)
    rows = MM.synthesize_mp3_assets(docs).collect()
    assert rows
    for r in rows:
        buf = bytes(r["payload"])
        assert buf[:3] == b"ID3" and not any(b & 0x80 for b in buf[6:10])
    feats = {int(r["asset_id"]): r for r in MM.parse_mp3_features(
        MM.synthesize_mp3_assets(docs)).collect()}
    brs = MM._MP3_BITRATES
    for d, r in feats.items():
        sr = MM._MP3_RATES[d % 3]
        n = 20 + d % 30
        kbps = [brs[((d * 7 + i * 13) % 14)] for i in range(n)]
        pads = [(d + i) % 2 for i in range(n)]
        assert r["n_frames"] == n and r["samplerate"] == sr
        assert r["duration_s"] == (n * 1152) / sr
        assert r["total_bytes"] == sum(
            144000 * k // sr + p for k, p in zip(kbps, pads)
        )
        assert r["avg_bitrate_kbps"] == sum(kbps) / n
        assert r["n_padded"] == sum(pads)


def test_mp3_walk_rejects_desync_and_truncation(spark):
    """A corrupt byte mid-stream or a cut tail must raise (lost sync /
    truncated frame), never silently under-count."""
    import pytest as _pytest

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") == 5)
    [r] = MM.synthesize_mp3_assets(docs).collect()
    buf = bytes(r["payload"])

    cut = spark.createDataFrame(
        [(5, bytearray(buf[:-7]))], "asset_id long, payload binary"
    )
    with _pytest.raises(Exception, match="truncated"):
        MM.parse_mp3_features(cut).collect()

    # corrupt the SECOND frame's sync byte: first frame ends after the
    # ID3 tag + frame-0 length, computable from the closed forms
    d = 5
    sr = MM._MP3_RATES[d % 3]
    tag_end = 10 + (37 + d % 64)
    f0 = 144000 * MM._MP3_BITRATES[(d * 7) % 14] // sr + (d % 2)
    bad = bytearray(buf)
    bad[tag_end + f0] = 0x00
    df = spark.createDataFrame(
        [(5, bytearray(bytes(bad)))], "asset_id long, payload binary"
    )
    with _pytest.raises(Exception, match="sync"):
        MM.parse_mp3_features(df).collect()


def test_tar_manifest_offsets_enable_range_reads(spark):
    """The manifest's whole point: (offset, size) must slice the exact
    member payload out of the shard bytes — verified against the
    closed-form content. Also: checksum tampering raises."""
    import pytest as _pytest

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 8)
    shards = {int(r["asset_id"]): bytes(r["payload"])
              for r in MM.synthesize_tar_shards(docs).collect()}
    rows = MM.tar_shard_manifest(MM.synthesize_tar_shards(docs)).collect()
    assert rows
    by_asset = {}
    for r in rows:
        by_asset.setdefault(int(r["asset_id"]), []).append(r)
    for d, members in by_asset.items():
        assert len(members) == 2 * (4 + d % 6)
        for r in members:
            i = int(r["member_name"][:6])
            payload = shards[d][r["data_offset"] : r["data_offset"] + r["size"]]
            assert payload == bytes((d + i + j) % 256 for j in range(r["size"])), (
                d, r["member_name"])
    # corrupt one checksum byte -> loud failure
    buf = bytearray(shards[1])
    buf[150] = (buf[150] + 1) % 256
    df = spark.createDataFrame(
        [(1, bytearray(bytes(buf)))], "asset_id long, payload binary"
    )
    with _pytest.raises(Exception, match="checksum"):
        MM.tar_shard_manifest(df).collect()


def test_progressive_jpeg_roundtrip_and_scan_structure(spark):
    """Synthesized files are genuine SOF2 with THREE SOS scans (DC
    first, DC refinement, AC first) and decode to the closed form —
    i.e. the successive-approximation split reconstructs qDC exactly."""
    import struct

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 12)
    rows = MM.synthesize_progressive_jpeg_assets(docs).collect()
    assert rows
    for r in rows:
        buf = bytes(r["payload"])
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf  # SOF2, no SOF0
        # three scans with the expected (Ss, Se, Ah/Al) headers
        scans = []
        p = 0
        while True:
            p = buf.find(b"\xff\xda", p)
            if p < 0:
                break
            (ln,) = struct.unpack(">H", buf[p + 2 : p + 4])
            seg = buf[p + 4 : p + 2 + ln]
            scans.append((seg[3], seg[4], seg[5] >> 4, seg[5] & 0xF))
            p += 2 + ln
        assert scans == [(0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 0)], scans
    feats = {int(r["asset_id"]): r for r in MM.decode_progressive_jpeg_features(
        MM.synthesize_progressive_jpeg_assets(docs)).collect()}
    for d, r in feats.items():
        w, h = MM._prog_jpeg_dims(d)
        vals = [128 + ((d * 7 + bx * 5 + by * 3) % 160 - 80)
                for by in range(h // 8) for bx in range(w // 8)]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_lum"] == sum(vals) / len(vals)
        assert r["topleft_lum"] == 128 + ((d * 7) % 160 - 80)


def test_progressive_jpeg_decoder_handles_ac_scan_data(spark):
    """The AC first-pass path must be the real EOBn/coefficient loop:
    a hand-built progressive file whose AC scan carries a nonzero
    coefficient (2-symbol AC table) must decode to the exact IDCT —
    and an AC-refinement scan (Ah>0) must raise, per the documented
    subset."""
    import math
    import struct

    import numpy as np
    import pytest as _pytest

    def headers(sof_marker=b"\xff\xc2"):
        q = bytes([8] + [16] * 63)
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
        out += sof_marker + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
        bits_dc = bytearray(16); bits_dc[3] = 9
        out += (b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 9) + b"\x00"
                + bytes(bits_dc) + bytes(range(9)))
        bits_ac = bytearray(16); bits_ac[0] = 1; bits_ac[1] = 1
        out += (b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 2) + b"\x10"
                + bytes(bits_ac) + bytes([0x00, 0x01]))
        return out

    def sos(ss, se, ah, al):
        return (b"\xff\xda" + struct.pack(">HB", 8, 1)
                + bytes([1, 0x00, ss, se, (ah << 4) | al]))

    out = headers()
    out += sos(0, 0, 0, 0) + bytes([0b00001111])   # DC first: size 0 -> qDC 0
    # AC first pass: symbol 0x01 ("10") + amp bit "1" -> coef zz1 = +1, EOB "0"
    out += sos(1, 63, 0, 0) + bytes([0b10100111])
    out += b"\xff\xd9"
    df = spark.createDataFrame(
        [(9, bytearray(bytes(out)))], "asset_id long, payload binary"
    )
    [r] = MM.decode_progressive_jpeg_features(df).collect()
    M = np.array([
        [((1 / math.sqrt(2)) if u == 0 else 1.0) / 2.0
         * math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)
    ])
    Fm = np.zeros((8, 8)); Fm[0, 1] = 16.0
    block = np.clip(np.floor(M.T @ Fm @ M + 0.5).astype(int) + 128, 0, 255)
    assert block.min() != block.max()
    assert r["mean_lum"] == float(block.sum()) / 64
    assert r["topleft_lum"] == int(block[0, 0])

    base = headers(sof_marker=b"\xff\xc0")  # baseline SOF0 -> wrong decoder
    base += b"\xff\xd9"
    df = spark.createDataFrame(
        [(11, bytearray(bytes(base)))], "asset_id long, payload binary"
    )
    with _pytest.raises(Exception, match="SOF0|baseline"):
        MM.decode_progressive_jpeg_features(df).collect()


def test_progressive_jpeg_ac_refinement_scan(spark):
    """The AC successive-approximation REFINEMENT path (T.81 G.1.2.3),
    retired from the contract in round 11: a hand-built file refines
    one coefficient with a correction bit (-4 -> -5) AND makes a
    second newly significant (+1 at Al=0) in the same scan — the
    decoder must read the sign bit, then the correction bit inside
    the advance loop, and the final IDCT must match numpy exactly."""
    import math
    import struct

    import numpy as np

    q = bytes([8] + [16] * 63)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    bits_dc = bytearray(16); bits_dc[3] = 9
    out += (b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 9) + b"\x00"
            + bytes(bits_dc) + bytes(range(9)))
    bits_ac = bytearray(16); bits_ac[0] = 1; bits_ac[1] = 1; bits_ac[2] = 1
    out += (b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 3) + b"\x10"
            + bytes(bits_ac) + bytes([0x00, 0x01, 0x02]))

    def sos(ss, se, ah, al):
        return (b"\xff\xda" + struct.pack(">HB", 8, 1)
                + bytes([1, 0x00, ss, se, (ah << 4) | al]))

    # scan 1: DC first, Al=0, qDC=0 -> size 0 ('0000')
    out += sos(0, 0, 0, 0) + bytes([0b00001111])
    # scan 2: AC first at Al=1 — zz1 coded as -2 (true -5 >> 1 toward 0
    # on magnitude): symbol 0x02 '110' + amp '01' (extend -> -2), EOB '0'
    out += sos(1, 63, 0, 1) + bytes([0b11001011])
    # scan 3: AC refinement Ah=1, Al=0 — zz2 newly significant +1
    # (symbol 0x01 '10' + sign '1'), zz1 correction bit '1' (read in the
    # advance loop while skipping to zz2: -4 -> -5), then EOB '0'
    out += sos(1, 63, 1, 0) + bytes([0b10110111])
    out += b"\xff\xd9"

    df = spark.createDataFrame(
        [(21, bytearray(bytes(out)))], "asset_id long, payload binary"
    )
    [r] = MM.decode_progressive_jpeg_features(df).collect()
    M = np.array([
        [((1 / math.sqrt(2)) if u == 0 else 1.0) / 2.0
         * math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)
    ])
    Fm = np.zeros((8, 8))
    Fm[0, 1] = -5 * 16.0  # zigzag 1, refined value
    Fm[1, 0] = 1 * 16.0   # zigzag 2, newly significant
    block = np.clip(np.floor(M.T @ Fm @ M + 0.5).astype(int) + 128, 0, 255)
    assert r["mean_lum"] == float(block.sum()) / 64
    assert r["topleft_lum"] == int(block[0, 0])

    # EOB-run correction path: a refinement scan that is ONE EOB over
    # the whole band still reads a correction bit for the nonzero zz1
    out2 = bytearray(bytes(out[: out.rfind(b"\xff\xda")]))
    # EOB '0' + correction bit '1' for zz1 -> '01' padded '01111111'
    out2 += sos(1, 63, 1, 0) + bytes([0b01111111]) + b"\xff\xd9"
    df2 = spark.createDataFrame(
        [(22, bytearray(bytes(out2)))], "asset_id long, payload binary"
    )
    [r2] = MM.decode_progressive_jpeg_features(df2).collect()
    Fm2 = np.zeros((8, 8))
    Fm2[0, 1] = -5 * 16.0  # -4 corrected to -5 under the EOB run
    block2 = np.clip(np.floor(M.T @ Fm2 @ M + 0.5).astype(int) + 128, 0, 255)
    assert r2["mean_lum"] == float(block2.sum()) / 64
    assert r2["topleft_lum"] == int(block2[0, 0])


def test_bmp_resize_nearest_exact_and_reencoded_valid(spark):
    """resize_bmp_nearest (round 11): the resized payload is itself a
    valid BMP (decode_bmp_features accepts it), every resized pixel
    equals the source pixel at (x*w//ow, y*h//oh), and a non-BMP
    payload raises."""
    import struct

    import pytest as _pytest

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10)
    src = {int(r["asset_id"]): bytes(r["payload"])
           for r in MM.synthesize_bmp_assets(docs).collect()}
    resized = MM.resize_bmp_nearest(MM.synthesize_bmp_assets(docs), max_side=8)
    for r in resized.collect():
        d = int(r["asset_id"])
        w, h = MM._bmp_dims(d)
        m = max(w, h)
        ow, oh = min(w, max(w * 8 // m, 1)), min(h, max(h * 8 // m, 1))
        assert (r["width"], r["height"]) == (ow, oh)
        buf = bytes(r["payload"])
        assert buf[:2] == b"BM"
        (off,) = struct.unpack("<I", buf[10:14])
        stride = (ow * 3 + 3) // 4 * 4
        # stored bottom-up: image row 0 = last stored row; check ALL pixels
        for y in range(oh):
            p = off + (oh - 1 - y) * stride
            for x in range(ow):
                sx, sy = x * w // ow, y * h // oh
                b_, g_, r_ = buf[p + 3 * x : p + 3 * x + 3]
                assert b_ == (d * 31 + sx * 7 + sy * 13) % 256
                assert g_ == (d * 17 + sx * 5 + sy * 11) % 256
                assert r_ == (d * 23 + sx * 3 + sy * 19) % 256

    bad = spark.createDataFrame(
        [(1, bytearray(b"XX" + b"\x00" * 64))], "asset_id long, payload binary"
    )
    with _pytest.raises(Exception, match="BMP"):
        MM.resize_bmp_nearest(bad).collect()


def test_bmp_resize_small_image_passes_through(spark):
    """Round-12 ADVICE fix: an image already smaller than max_side
    passes through at ORIGINAL size (the unclamped integer formula
    would upscale a 4x4 to 8x8) and the payload pixels are unchanged."""
    import struct

    w = h = 4
    stride = (w * 3 + 3) // 4 * 4
    pix = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up row order
        row = bytearray(stride)
        for x in range(w):
            row[3 * x : 3 * x + 3] = bytes(
                [(x * 7 + y * 13) % 256, (x * 5 + y * 11) % 256, (x * 3 + y * 19) % 256]
            )
        pix += row
    hoff = 54
    buf = (
        b"BM"
        + struct.pack("<IHHI", hoff + len(pix), 0, 0, hoff)
        + struct.pack("<IiiHH", 40, w, h, 1, 24)
        + struct.pack("<6I", 0, 0, 0, 0, 0, 0)
        + bytes(pix)
    )
    df = spark.createDataFrame(
        [(7, bytearray(buf))], "asset_id long, payload binary"
    )
    [r] = MM.resize_bmp_nearest(df, max_side=8).collect()
    assert (r["width"], r["height"]) == (4, 4)
    out = bytes(r["payload"])
    (ooff,) = struct.unpack("<I", out[10:14])
    assert out[ooff : ooff + len(pix)] == bytes(pix)


def test_avi_dib_frame_decode_exact_pixels(spark):
    """decode_avi_frame_features (round 12): every frame of the
    uncompressed-DIB AVIs decodes to the closed-form pixel ramps —
    exact channel means, top-left pixel, and the stride-padding +
    bottom-up handling proven by direct pixel checks on a payload."""
    import struct

    import numpy as np

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 12)
    rows = MM.decode_avi_frame_features(
        MM.synthesize_dib_avi_assets(docs)
    ).collect()
    assert rows
    seen = set()
    for r in rows:
        d, f = int(r["asset_id"]), int(r["frame_idx"])
        seen.add(d)
        w, h = 6 + (d % 3) * 5, 5 + (d % 2) * 4
        assert (r["width"], r["height"]) == (w, h)
        xs = np.arange(w, dtype=np.int64)[None, :]
        ys = np.arange(h, dtype=np.int64)[:, None]
        mr = float(((d * 23 + xs * 3 + ys * 19 + f * 37) % 256).sum()) / (w * h)
        mg = float(((d * 17 + xs * 5 + ys * 11 + f * 23) % 256).sum()) / (w * h)
        mb = float(((d * 31 + xs * 7 + ys * 13 + f * 29) % 256).sum()) / (w * h)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (mr, mg, mb)
        assert r["topleft_r"] == (d * 23 + f * 37) % 256
        assert r["topleft_g"] == (d * 17 + f * 23) % 256
        assert r["topleft_b"] == (d * 31 + f * 29) % 256
    # widths 6 and 11 carry real stride padding (w*3 % 4 != 0)
    assert any(6 + (d % 3) * 5 in (6, 11) for d in seen)
    # frame counts per asset match the closed form
    from collections import Counter

    per = Counter(int(r["asset_id"]) for r in rows)
    for d, n in per.items():
        assert n == 3 + d % 4


def test_avi_dib_decode_rejects_compressed_and_truncated(spark):
    """The codec boundary stays honest: biCompression != 0 raises
    NotImplementedError (compressed codecs are the remaining stub) and
    a frame chunk whose size disagrees with h*stride raises."""
    import struct

    import pytest as _pytest

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") == 4)
    [r] = MM.synthesize_dib_avi_assets(docs).collect()
    buf = bytearray(bytes(r["payload"]))

    # flip biCompression in strf to 0x30323449 ('I420') -> NotImplementedError
    strf = buf.find(b"strf")
    compressed = bytearray(buf)
    struct.pack_into("<I", compressed, strf + 8 + 16, 0x30323449)
    df = spark.createDataFrame(
        [(4, bytearray(bytes(compressed)))], "asset_id long, payload binary"
    )
    with _pytest.raises(Exception, match="compressed video codec"):
        MM.decode_avi_frame_features(df).collect()

    # shrink the first frame chunk's declared size -> DIB size mismatch
    first_db = buf.find(b"00db")
    broken = bytearray(buf)
    (sz,) = struct.unpack("<I", broken[first_db + 4 : first_db + 8])
    struct.pack_into("<I", broken, first_db + 4, sz - 4)
    df2 = spark.createDataFrame(
        [(4, bytearray(bytes(broken)))], "asset_id long, payload binary"
    )
    with _pytest.raises(Exception, match="DIB size mismatch|overruns|mismatch"):
        MM.decode_avi_frame_features(df2).collect()


# --- MJPEG frame decode (round 13) ----------------------------------------------


def test_mjpeg_frames_decode_exact_pixels(spark):
    """Every MJPG frame decodes through the shared T.81 kernel to the
    exact closed-form block values, with the frame index advancing the
    DC pattern."""
    docs = spark.createDataFrame([(5,)], "doc_id long")
    assets = MM.synthesize_mjpeg_avi_assets(docs)
    rows = sorted(
        MM.decode_mjpeg_frame_features(assets).collect(),
        key=lambda r: r.frame_idx,
    )
    d = 5
    w, h, nf = 16 + (d % 3) * 8, 8 + (d % 4) * 8, 2 + d % 3
    assert len(rows) == nf
    for r in rows:
        assert (r.width, r.height) == (w, h)
        total = 0
        for by in range(h // 8):
            for bx in range(w // 8):
                total += 128 + ((d * 7 + bx * 5 + by * 3 + r.frame_idx * 11) % 160 - 80)
        assert r.mean_lum == total / ((w // 8) * (h // 8))
        assert r.topleft_lum == 128 + ((d * 7 + r.frame_idx * 11) % 160 - 80)


def test_mjpeg_codec_routing_and_truncation(spark):
    """BI_RGB payloads are routed to the uncompressed path (raise), an
    unknown codec raises NotImplementedError naming the boundary, and
    a truncated RIFF body desyncs loudly."""
    import pandas as pd
    import pytest

    docs = spark.createDataFrame([(1,)], "doc_id long")
    dib = MM.synthesize_dib_avi_assets(docs)
    with pytest.raises(Exception, match="BI_RGB payload"):
        MM.decode_mjpeg_frame_features(dib).collect()

    mjpg = MM.synthesize_mjpeg_avi_assets(docs)
    payload = bytes(mjpg.collect()[0].payload)

    def swap(p: bytes):
        def gen(it):
            for _ in it:
                yield pd.DataFrame({"asset_id": [1], "payload": [p]})
        return mjpg.mapInPandas(gen, schema="asset_id bigint, payload binary")

    # corrupt biCompression to a fake codec fourcc
    i = payload.index(b"strf") + 8 + 16
    fake = payload[:i] + b"XVID" + payload[i + 4 :]
    with pytest.raises(Exception, match="reference libraries"):
        MM.decode_mjpeg_frame_features(swap(fake)).collect()
    with pytest.raises(Exception, match="truncated RIFF body"):
        MM.decode_mjpeg_frame_features(swap(payload[:60])).collect()


# --- RLE8 inter-frame decode (round 13) ------------------------------------------


def test_rle8_delta_carries_previous_frame_pixels(spark):
    """The inter-frame law, hand-verified: frame f repaints ONLY row
    rb(f); every other row carries the last value that painted it."""
    docs = spark.createDataFrame([(4,)], "doc_id long")
    d = 4
    w, h, nf = 8 + (d % 3) * 4, 6 + (d % 2) * 3, 3 + d % 3
    assets = MM.synthesize_rle8_avi_assets(docs)
    rows = sorted(
        MM.decode_rle8_frame_features(assets).collect(),
        key=lambda r: r.frame_idx,
    )
    assert len(rows) == nf

    vals = {y: (d * 13 + y * 7) % 256 for y in range(h)}  # frame-0 rows
    for r in rows:
        f = r.frame_idx
        if f > 0:
            vals = dict(vals)
            vals[(d + f * 5) % h] = (d * 11 + f * 17) % 256
        assert r.mean_gray == sum(vals.values()) * w / (w * h)
        assert r.topleft_gray == vals[h - 1]


def test_rle8_absolute_mode_and_errors(spark):
    """Absolute mode (00 n>=3 + word-padded raw indices) decodes, and
    the loud error paths fire: non-RLE8 codec, run overflow, missing
    EOS."""
    import struct

    import pandas as pd
    import pytest

    docs = spark.createDataFrame([(1,)], "doc_id long")
    base = bytes(MM.synthesize_rle8_avi_assets(docs).collect()[0].payload)

    def with_frames(frames: list[bytes], payload: bytes = base) -> bytes:
        # rebuild the movi LIST with replacement frames
        i = payload.index(b"LIST", payload.index(b"movi") - 8)
        head = payload[:i]
        body = b"movi" + b"".join(
            b"00dc" + struct.pack("<I", len(fb)) + fb + (b"\x00" if len(fb) % 2 else b"")
            for fb in frames
        )
        movi = b"LIST" + struct.pack("<I", len(body)) + body
        out = head + movi
        return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]

    def decode(payload: bytes):
        assets = MM.synthesize_rle8_avi_assets(docs)

        def gen(it):
            for _ in it:
                yield pd.DataFrame({"asset_id": [1], "payload": [payload]})

        df = assets.mapInPandas(gen, schema="asset_id bigint, payload binary")
        return MM.decode_rle8_frame_features(df).collect()

    w = 8 + (1 % 3) * 4  # 12
    # one frame: absolute run of 4 explicit indices then a run, per row 0 only
    fb = bytes([0x00, 4, 10, 20, 30, 40]) + bytes([w - 4, 7]) + b"\x00\x01"
    [r] = decode(with_frames([fb]))
    # bottom row: 10+20+30+40 + 7*(w-4); rows 1..h-1 stay zero
    h = 6 + (1 % 2) * 3
    assert r.mean_gray == (10 + 20 + 30 + 40 + 7 * (w - 4)) / (w * h)
    assert r.topleft_gray == 0  # top image row untouched

    with pytest.raises(Exception, match="run overflows row"):
        decode(with_frames([bytes([255, 9]) + b"\x00\x01"]))
    with pytest.raises(Exception, match="missing EOS"):
        decode(with_frames([bytes([4, 9])]))
    # flip biCompression to 2 (RLE4): NotImplementedError boundary
    i = base.index(b"strf") + 8 + 16
    bad = base[:i] + struct.pack("<I", 2) + base[i + 4 :]
    with pytest.raises(Exception, match="BI_RLE8 only"):
        decode_payload = bad
        assets = MM.synthesize_rle8_avi_assets(docs)

        def gen2(it):
            for _ in it:
                yield pd.DataFrame({"asset_id": [1], "payload": [decode_payload]})

        MM.decode_rle8_frame_features(
            assets.mapInPandas(gen2, schema="asset_id bigint, payload binary")
        ).collect()


def test_warc_roundtrip_recovers_exact_text_and_rejects_malformed(spark):
    """WARC ingest: the parser recovers each document's text
    BYTE-EXACTLY (md5 vs the source column), keeps only response
    records (one per archive — the warcinfo record is walked past via
    its gzip member, not skipped by luck), and raises loudly on bad
    gzip magic, a truncated member, and broken record framing."""
    import gzip
    import hashlib

    import pytest as _pytest

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 8)
    src = {int(r["doc_id"]): r["text"] for r in docs.collect()}
    rows = MM.parse_warc_responses(MM.synthesize_warc_assets(docs)).collect()
    assert len(rows) == len(src)  # exactly one response per archive
    for r in rows:
        d = int(r["asset_id"])
        assert r["target_uri"] == f"http://example.com/doc/{d}"
        assert r["http_status"] == 200
        assert r["text_md5"] == hashlib.md5(src[d].encode("utf-8")).hexdigest()
        assert r["content_length"] == 45 + len(src[d].encode("utf-8"))

    shard = bytes(
        MM.synthesize_warc_assets(docs.filter(F.col("doc_id") == 1))
        .collect()[0]["payload"]
    )

    def df_of(buf: bytes):
        return spark.createDataFrame(
            [(1, bytearray(buf))], "asset_id long, payload binary"
        )

    with _pytest.raises(Exception, match="gzip magic"):
        MM.parse_warc_responses(df_of(b"XX" + shard[2:])).collect()
    with _pytest.raises(Exception, match="truncated"):
        MM.parse_warc_responses(df_of(shard[:-10])).collect()
    # un-gzipped WARC record: the member walk must refuse, not guess
    raw = gzip.decompress(shard)  # first member only
    with _pytest.raises(Exception, match="gzip magic"):
        MM.parse_warc_responses(df_of(raw)).collect()


def test_gif_decode_public_fixture_and_errors(spark):
    """GIF decoder pinned against the CLASSIC public 1×1 GIF byte
    string (white pixel, 2-entry palette) — a fixture our own encoder
    never produced, so a matched encoder/decoder bug pair cannot pass;
    plus the loud-failure contract: interlace flag, truncated LZW
    stream, and bad magic all raise."""
    import pytest as _pytest

    one_px = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00"
        b"\xff\xff\xff\x00\x00\x00"
        b",\x00\x00\x00\x00\x01\x00\x01\x00\x00"
        b"\x02\x02D\x01\x00;"
    )

    def df_of(buf: bytes):
        return spark.createDataFrame(
            [(1, bytearray(buf))], "asset_id long, payload binary"
        )

    row = MM.decode_gif_features(df_of(one_px)).collect()[0]
    assert (row["width"], row["height"], row["n_pixels"]) == (1, 1, 1)
    assert (row["mean_r"], row["mean_g"], row["mean_b"]) == (255.0, 255.0, 255.0)
    assert row["topleft_lum"] == 765

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 6)
    shard = bytes(
        MM.synthesize_gif_assets(docs.filter(F.col("doc_id") == 3))
        .collect()[0]["payload"]
    )
    # flip the interlace bit in the image descriptor (after header+LSD+
    # GCT+GCE: locate 0x2C and offset 9 past it)
    i = shard.index(b",", 6)
    tampered = bytearray(shard)
    tampered[i + 9] |= 0x40
    with _pytest.raises(Exception, match="interlaced"):
        MM.decode_gif_features(df_of(bytes(tampered))).collect()
    with _pytest.raises(Exception, match="not a GIF"):
        MM.decode_gif_features(df_of(b"NOPE" + shard[4:])).collect()
    # truncate inside the LZW data: ended-before-EOI must raise
    from etl_cortex_spark.operators.multimodal import gif_lzw_decode

    with _pytest.raises(ValueError, match="before EOI"):
        gif_lzw_decode(b"\x44", 2, 4)


def test_gif_lzw_kwkwk_and_roundtrip(spark):
    """The LZW KwKwK corner (a code one past the table end) decodes as
    prev + prev[0]: a run-heavy index stream forces it; the full
    decode equals the closed-form pixel grid for every synthesized
    asset checked."""
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 12)
    rows = MM.decode_gif_features(MM.synthesize_gif_assets(docs)).collect()
    assert len(rows) == 12
    for r in rows:
        d = int(r["asset_id"])
        w, h = 10 + (d % 4) * 5, 8 + (d % 3) * 4
        P = 1 << (2 + d % 3)
        n = w * h
        rs = sum(
            (d * 5 + ((d * 7 + x * 3 + y * 5) % P) * 11) % 256
            for y in range(h) for x in range(w)
        )
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, n)
        assert abs(r["mean_r"] - rs / n) < 1e-12
    # explicit KwKwK: 'aaaa' with a 2-bit alphabet — encoder emits
    # (clear, 0, <first assigned code>=6, EOI) and 6 IS the KwKwK code
    from etl_cortex_spark.operators.multimodal import gif_lzw_decode

    # hand-pack: width 3, LSB-first: 4 (clear), 0, 6, 5 (EOI)
    acc = 4 | (0 << 3) | (6 << 6) | (5 << 9)
    data = bytes((acc & 0xFF, (acc >> 8) & 0xFF))
    assert gif_lzw_decode(data, 2, 3) == [0, 0, 0]


def test_mp3_scalefactor_scfsi_reuse_and_errors(spark):
    """Layer III part2 decode: granule 1's scfsi-selected bands carry
    granule 0's VALUES (verified per band against the closed forms),
    a part2_3_length smaller than the scalefactor bit count raises,
    and a nonzero big_values (spectrum present) raises with the stated
    3-B.7 boundary message rather than mis-decoding."""
    import pytest as _pytest

    from etl_cortex_spark.operators.multimodal import (
        _MP3_SLEN1,
        _MP3_SLEN2,
    )

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10)
    rows = MM.decode_mp3_scalefactors(
        MM.synthesize_mp3_scf_assets(docs)
    ).collect()
    assert len(rows) == 10
    for r in rows:
        d = int(r["asset_id"])
        exp_sf = exp_reused = exp_p2 = 0
        mx = 0
        for i in range(6 + d % 5):
            scfsi = (d + i) % 16
            vals0 = {}
            for g in range(2):
                sc = (d + 2 * i + g) % 16
                for b in range(21):
                    slen = _MP3_SLEN1[sc] if b <= 10 else _MP3_SLEN2[sc]
                    grp = 0 if b <= 5 else 1 if b <= 10 else 2 if b <= 15 else 3
                    if g == 1 and ((scfsi >> (3 - grp)) & 1):
                        v = vals0[b]
                        exp_reused += 1
                    else:
                        v = (3 * d + 5 * i + 7 * g + 11 * b) % (1 << slen) if slen else 0
                        exp_p2 += slen
                    if g == 0:
                        vals0[b] = v
                    exp_sf += v
                    mx = max(mx, v)
        assert r["sum_scalefac"] == exp_sf
        assert r["n_reused_bands"] == exp_reused
        assert r["sum_part2_bits"] == exp_p2
        assert r["sum_part3_bits"] == 0
        assert r["max_scalefac"] == mx

    shard = bytearray(
        bytes(
            MM.synthesize_mp3_scf_assets(docs.filter(F.col("doc_id") == 7))
            .collect()[0]["payload"]
        )
    )

    def df_of(buf):
        return spark.createDataFrame(
            [(7, bytearray(bytes(buf)))], "asset_id long, payload binary"
        )

    # zero out granule 0's part2_3_length (bits 18-29 of side info =
    # bytes 4+2.. : part2_3_length starts at side-info bit 18)
    tampered = bytearray(shard)
    tampered[4 + 2] &= 0xC0  # clears side-info bits 16..21
    tampered[4 + 3] = 0      # bits 24..31 (covers the rest of the field)
    with _pytest.raises(Exception, match="part2"):
        MM.decode_mp3_scalefactors(df_of(tampered)).collect()
    # set a nonzero big_values: boundary raises, never mis-decodes
    tampered2 = bytearray(shard)
    tampered2[4 + 3] |= 0x02  # a bit inside big_values (bits 30-38)
    with _pytest.raises(Exception, match="3-B.7"):
        MM.decode_mp3_scalefactors(df_of(tampered2)).collect()


def test_rice_decode_bit_exact_and_errors(spark):
    """Rice/fixed-predictor decode: reconstruction is BIT-EXACT per
    sample against the closed signal form (lossless coding's whole
    contract), and bad magic / truncation / unsupported predictor
    order raise loudly."""
    import struct

    import pytest as _pytest

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 6)
    rows = MM.decode_rice_audio_features(
        MM.synthesize_rice_audio_assets(docs)
    ).collect()
    assert len(rows) == 6
    for r in rows:
        d = int(r["asset_id"])
        n = 64 + d % 64
        s = [100 + 3 * i + ((7 * d + 11 * i) % 5) for i in range(n)]
        assert r["n_samples"] == n and r["k"] == 2 + d % 3
        assert r["sum_samples"] == sum(s)
        assert r["max_sample"] == max(s)
        es = [s[i] - 2 * s[i - 1] + s[i - 2] for i in range(2, n)]
        assert r["sum_abs_residual"] == sum(abs(e) for e in es)
        assert r["max_abs_residual"] == max(abs(e) for e in es)

    shard = bytes(
        MM.synthesize_rice_audio_assets(docs.filter(F.col("doc_id") == 3))
        .collect()[0]["payload"]
    )

    def df_of(buf):
        return spark.createDataFrame(
            [(3, bytearray(bytes(buf)))], "asset_id long, payload binary"
        )

    with _pytest.raises(Exception, match="not a RICE"):
        MM.decode_rice_audio_features(df_of(b"NOPE" + shard[4:])).collect()
    with _pytest.raises(Exception, match="overrun"):
        MM.decode_rice_audio_features(df_of(shard[:-3])).collect()
    bad_order = bytearray(shard)
    struct.pack_into("<B", bad_order, 6, 3)
    with _pytest.raises(Exception, match="order-2"):
        MM.decode_rice_audio_features(df_of(bytes(bad_order))).collect()
