"""MPEG-1 Layer II subband-sample decode (round 13) — pytest twins for
the corners the driver oracle can't isolate: the requantization algebra
on hand-computed values, grouped digit unpacking, scfsi sharing, and
the loud-failure error paths.

The reference app has no audio surface (app.py); this is the tier-D
multimodal mandate (SURVEY §2 D5n), public-spec parity (ISO 11172-3).
"""

from __future__ import annotations

import pytest

from etl_cortex_spark.operators import multimodal as MM

SF_SMOKE = "/root/testdata/sf0.001"


def _decode(spark, doc_ids):
    docs = spark.createDataFrame([(d,) for d in doc_ids], "doc_id long")
    assets = MM.synthesize_mp2_assets(docs)
    return {
        r.asset_id: r
        for r in MM.decode_mp2_subband_features(assets).collect()
    }


def test_mp2_requantization_hand_computed(spark):
    """doc_id = 0, frame 0, granule 0 — every value derivable by hand:
    sb0 codes (0,1,2): s' = 2·(c−7)/15·sf with scfsi(0)=0, part-0
    sfidx = 0 → sf = 2. First sample: 2·(0−7)/15·2 = −28/15."""
    rows = _decode(spark, [0])
    r = rows[0]
    assert r.n_frames == 3 and r.samplerate == 48000 and r.sblimit == 8
    assert r.n_alloc_slots == 3 * 108
    assert r.first_sample == pytest.approx(2.0 * (0 - 7) / 15 * 2.0, abs=0)
    # sum_scaled_x60 must be the exact integer the independent pure-
    # python fold computes (the fixture family is dyadic by design)
    total = 0.0
    for fr in range(3):
        eff = {}
        for sb in (0, 1, 2):
            scfsi = sb % 4
            trans = [3 * ((sb + t) % 4) for t in range((3, 2, 1, 2)[scfsi])]
            tmap = {0: (0, 1, 2), 1: (0, 0, 1), 2: (0, 0, 0), 3: (0, 1, 1)}[scfsi]
            eff[sb] = [2.0 ** (1 - trans[t] // 3) for t in tmap]
        for g in range(12):
            for sb in (0, 1, 2):
                sf = eff[sb][g // 4]
                for k in range(3):
                    if sb == 0:
                        total += 60.0 * (2.0 * ((fr * 5 + g * 3 + k) % 15 - 7) / 15 * sf)
                    elif sb == 1:
                        total += 60.0 * (2.0 * ((fr + g + k) % 3 - 1) / 3 * sf)
                    else:
                        total += 60.0 * (2.0 * ((fr + g * 2 + k) % 5 - 2) / 5 * sf)
    assert r.sum_scaled_x60 == int(round(total))


def test_mp2_grouped_digit_unpack_values(spark):
    """The grouped requantization ladder is exactly the ISO Table 3-B.4
    rationals: 3 steps → {−2/3, 0, +2/3}, 5 steps → {−0.8, −0.4, 0,
    0.4, 0.8} (verified through the class helpers the decoder uses)."""
    for steps, nb, want in (
        (3, 2, [-2 / 3, 0.0, 2 / 3]),
        (5, 3, [-0.8, -0.4, 0.0, 0.4, 0.8]),
        (9, 4, [2 * (d - 4) / 9 for d in range(9)]),
    ):
        got_steps, bits, grouped = MM._mp2_class(
            MM._MP2_STEPS_CD.index(steps) + 1
        )
        assert got_steps == steps and grouped
        assert bits == MM._MP2_GROUP_BITS[steps]
        for d, w in enumerate(want):
            s = 2.0 * (d - (1 << (steps.bit_length() - 2))) / steps
            assert s == pytest.approx(w, abs=1e-12)


def test_mp2_scalefactor_table(spark):
    """sf(idx) = 2·2^(−idx/3): exact powers of two at multiples of 3,
    monotone decreasing, and the cube-root intermediates sit strictly
    between their neighbors."""
    assert MM._mp2_scalefactor(0) == 2.0
    assert MM._mp2_scalefactor(3) == 1.0
    assert MM._mp2_scalefactor(6) == 0.5
    vals = [MM._mp2_scalefactor(i) for i in range(12)]
    assert all(a > b for a, b in zip(vals, vals[1:]))
    assert vals[1] == pytest.approx(2.0 * 2 ** (-1 / 3), rel=1e-12)


def test_mp2_nonzero_spectrum(spark):
    """The verdict's 'nonzero-spectrum payload' requirement: the
    fixtures carry non-zero subband samples in every allocated band
    (not a silence fixture) — at least one asset has a nonzero scaled
    sum AND every asset has a nonzero first sample or nonzero sum."""
    rows = _decode(spark, list(range(6)))
    assert any(r.sum_scaled_x60 != 0 for r in rows.values())
    assert all(
        r.sum_scaled_x60 != 0 or r.first_sample != 0.0 for r in rows.values()
    )


def test_mp2_error_paths(spark):
    """Loud desync on corrupt input: bad sync, a Layer III header where
    Layer II is required, truncation, and the high-rate table family."""
    import pandas as pd

    def run(payload: bytes):
        docs = spark.createDataFrame([(1,)], "doc_id long")
        assets = MM.synthesize_mp2_assets(docs)

        def swap(it):
            for pdf in it:
                yield pd.DataFrame({"asset_id": [1], "payload": [payload]})

        df = assets.mapInPandas(swap, schema="asset_id bigint, payload binary")
        return MM.decode_mp2_subband_features(df).collect()

    def expect_error(payload: bytes, pattern: str):
        # The decode MUST fail — that part never retries. The MESSAGE
        # check retries: under heavy host load Spark's first-surfaced
        # exception is occasionally the stage-cancellation artifact
        # ("TaskKilled ...") instead of the worker's ValueError text
        # (round-15 sweep flake — one occurrence in ~700 tests), and
        # the worker text is what identifies WHICH guard fired.
        import re

        last = None
        for _ in range(3):
            try:
                run(payload)
            except Exception as e:  # noqa: BLE001 — message inspected
                if re.search(pattern, str(e)):
                    return
                last = e
                continue
            raise AssertionError("corrupt payload decoded without error")
        raise AssertionError(f"error text never matched {pattern!r}: {last}")

    good = bytes([0xFF, 0xFD, (2 << 4) | (1 << 2), 0xC0]) + b"\x00" * 140
    run(good)  # all-zero allocation: decodes to an empty subband grid
    expect_error(b"\x00\x00" + good, "lost frame sync")
    expect_error(bytes([0xFF, 0xFB, 0x24, 0xC0]) + b"\x00" * 140, "not Layer II")
    expect_error(good[:80], "truncated frame")
    # bitrate index 4 → 64 kbps/ch → high-rate table family
    expect_error(
        bytes([0xFF, 0xFD, (4 << 4) | (1 << 2), 0xC0]) + b"\x00" * 188,
        "3-B.2a/b",
    )


def test_mp2_id3_skip_and_multiframe(spark):
    """The ID3v2 syncsafe skip and frame-count arithmetic hold for the
    whole fixture family (n_frames = 3 + id % 4)."""
    rows = _decode(spark, [0, 1, 2, 3, 4, 5, 6, 7])
    for d, r in rows.items():
        assert r.n_frames == 3 + d % 4
        assert r.n_alloc_slots == r.n_frames * 108
