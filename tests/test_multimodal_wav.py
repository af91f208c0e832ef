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
