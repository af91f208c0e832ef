"""MPEG-1 Layer III side-information decode (round 14) — pytest twins
for what the driver oracle can't isolate: a HAND-BUILT frame whose
side-info bits were serialized by an independent bit-writer (so the
decoder's field offsets are checked against the spec layout, not
against the fixture closed form), the bit-reservoir accounting law on
chosen values, and the loud-failure paths.

The reference app has no audio surface (app.py); this is the tier-D
multimodal mandate (SURVEY §2), public-spec parity (ISO 11172-3
2.4.1.7).
"""

from __future__ import annotations

import pytest

from etl_cortex_spark.operators import multimodal as MM


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> "_BitWriter":
        for k in range(n - 1, -1, -1):
            self.bits.append((value >> k) & 1)
        return self

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _frame(mdb, gr0, gr1, br_idx=9, sr_idx=1, pad=0):
    """One mono Layer III frame: 4-byte header + 17 hand-serialized
    side-info bytes + zero filler to the declared size. Each granule is
    (part23, big_values, global_gain, scalefac_compress, wsf,
    block_type)."""
    w = _BitWriter()
    w.put(mdb, 9).put(0, 5).put(0, 4)  # main_data_begin, private, scfsi
    for p23, bv, gg, sfc, wsf, bt in (gr0, gr1):
        w.put(p23, 12).put(bv, 9).put(gg, 8).put(sfc, 4).put(wsf, 1)
        if wsf:
            w.put(bt, 2).put(0, 1).put(0, 10).put(0, 9)
        else:
            w.put(0, 15).put(0, 4).put(0, 3)
        w.put(0, 3)  # preflag, scalefac_scale, count1table_select
    si = w.bytes()
    assert len(si) == 17
    kbps = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)[
        br_idx - 1
    ]
    sr = (44100, 48000, 32000)[sr_idx]
    size = 144000 * kbps // sr + pad
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2) | (pad << 1), 0xC0])
    return hdr + si + bytes(size - 4 - 17), size


def _decode_payload(spark, payload: bytes):
    assets = spark.createDataFrame(
        [(1, bytearray(payload))], "asset_id long, payload binary"
    )
    return MM.parse_mp3_sideinfo(assets).collect()[0]


def test_sideinfo_hand_built_fields(spark):
    """Field offsets against an independent serializer: chosen values
    for every census column, including a short-block granule (wsf=1,
    block_type=2) and a reserved one (wsf=1, block_type=0)."""
    f1, size1 = _frame(
        0,
        (1234, 288, 210, 7, 0, 0),  # long-block granule
        (500, 100, 99, 3, 1, 2),  # short-block granule
    )
    donated1 = size1 - 21
    f2, _ = _frame(
        donated1,  # exactly the donated capacity: NOT a violation
        (4095, 511, 255, 15, 1, 0),  # reserved block_type census
        (1, 0, 1, 0, 0, 0),
    )
    r = _decode_payload(spark, f1 + f2)
    assert r.n_frames == 2
    assert r.sum_main_data_begin == donated1
    assert r.n_reservoir_violations == 0
    assert r.sum_part23 == 1234 + 500 + 4095 + 1
    assert r.sum_big_values == 288 + 100 + 511 + 0
    assert r.sum_global_gain == 210 + 99 + 255 + 1
    assert r.n_window_switching == 2
    assert r.n_short_blocks == 1
    assert r.n_reserved_block_type == 1


def test_sideinfo_reservoir_violation_law(spark):
    """Frame 0 claiming ANY reservoir is a violation (nothing donated
    yet); frame 1 claiming one byte more than frame 0 donated is too;
    a claim exactly at capacity is not."""
    g = (0, 0, 0, 0, 0, 0)
    f0, size0 = _frame(1, g, g)  # violates: donated = 0
    f1, _ = _frame(size0 - 21 + 1, g, g)  # violates: one over capacity
    r = _decode_payload(spark, f0 + f1)
    assert r.n_reservoir_violations == 2
    f0b, size0b = _frame(0, g, g)
    f1b, _ = _frame(size0b - 21, g, g)  # exactly at capacity: legal
    r2 = _decode_payload(spark, f0b + f1b)
    assert r2.n_reservoir_violations == 0


def test_sideinfo_rejects_stereo_and_truncation(spark):
    g = (0, 0, 0, 0, 0, 0)
    frame, _ = _frame(0, g, g)
    stereo = bytearray(frame)
    stereo[3] = 0x00  # mode = stereo — side-info layout differs; loud
    with pytest.raises(Exception, match="single_channel"):
        _decode_payload(spark, bytes(stereo))
    with pytest.raises(Exception, match="truncated"):
        _decode_payload(spark, frame[:-10])
