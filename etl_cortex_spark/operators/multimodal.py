"""Multimodal (binary) column plumbing (tier D / BASELINE.json:
"multimodal columns").

Design: media payloads are opaque ``binary`` columns carried next to a
typed metadata struct — the lakehouse-native layout (parquet stores the
bytes; column pruning means metadata-only queries never touch them).
Real ingestion uses ``spark.read.format("binaryFile")``; here payloads
are synthesized deterministically from the documents table so the
plumbing (schema, batching, partitioning, UDF signatures) is exercised
end-to-end without media libraries.

Four decode legs are REAL, stdlib-only: PCM-WAV (RIFF parse), 24-bpp
BMP, DEFLATE-compressed PNG (CRC walk + inflate + all five filters),
and baseline-sequential grayscale JPEG (canonical Huffman from DHT +
dezigzag + dequant + full 2-D IDCT, round 10). The residual stub is
``decode_image``'s NotImplementedError contract for codecs that
genuinely need an external library (color/subsampled/progressive
JPEG, mp3, video); ``extract_features`` runs the real ``mapInPandas``
pipeline with a deterministic fake decoder for those. The Spark-side
shape — Arrow batches in, Arrow batches out, fixed output schema, no
driver collection — is identical either way; only the kernel changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id bigint, modality string, byte_len bigint, "
    "width int, height int, mean_byte double, feature_crc string"
)


def synthesize_assets(docs: DataFrame) -> DataFrame:
    """Deterministic fake media assets: payload = repeated sha2 bytes of
    the text; metadata struct carries (modality, width, height)."""
    payload = F.to_binary(
        F.repeat(F.sha2(F.col("text").cast("binary"), 256), 4), F.lit("hex")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        payload.alias("payload"),
        F.struct(
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("modality"),
            ((F.col("doc_id") % 8 + 1) * 64).cast("int").alias("width"),
            ((F.col("doc_id") % 4 + 1) * 64).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decoder contract for codecs that genuinely need an external
    library — by round 13 that is only: MP3 (LAYER III) sample decode,
    the Layer I/II subband→PCM synthesis WINDOW, and MOTION-COMPENSATED
    video codec decode. The narrowing trail: the full image family
    (progressive AC refinement included) decodes for real,
    UNCOMPRESSED BI_RGB video frames decode for real
    (``decode_avi_frame_features``), and as of round 13 MPEG-1
    LAYER II audio decodes for real down to requantized subband
    samples (``decode_mp2_subband_features`` — allocation, scfsi,
    scalefactors, grouped/ungrouped requantization) AND two
    COMPRESSED video codecs decode for real: MOTION-JPEG (every 00dc
    frame a complete baseline JPEG through the shared T.81 kernel,
    ``decode_mjpeg_frame_features``) and Microsoft BI_RLE8 with its
    INTER-FRAME delta-carry semantics (``decode_rle8_frame_features``
    keeps a mutable frame buffer across chunks). What keeps the
    remaining three behind the stub is spec TABLE DATA and reference
    libraries, not machinery: the synthesis window is ISO 11172-3
    Table 3-B.3 (512 numerically designed coefficients, no closed
    form), Layer III's SPECTRUM needs the Huffman code Tables 3-B.7
    (the frame structure itself — side info, window switching, the
    bit reservoir — decodes for real in ``parse_mp3_sideinfo``, round
    14, and as of round 15 the MAIN DATA's scalefactor part2 decodes
    for real too, including the scfsi cross-granule reuse rule and the
    part2/part3 budget split, ``decode_mp3_scalefactors`` — so the
    Layer III boundary is now exactly the 3-B.7 codeword data), and
    motion-compensated codecs (H.26x/VPx/AV1) need motion
    search + arithmetic coders from their reference implementations —
    none reconstructible offline without copying material this build
    does not ship. PCM-WAV
    (``decode_wav_features``),
    24-bpp BMP (``decode_bmp_features``), DEFLATE-compressed PNG
    (``decode_png_features``), baseline-sequential grayscale JPEG
    (``decode_jpeg_features`` — Huffman + full IDCT), baseline COLOR
    4:2:0 YCbCr JPEG (``decode_color_jpeg_features`` — interleaved
    MCUs, chroma upsampling, JFIF color conversion), RIFF-AVI
    container metadata (``parse_avi_features``) and MPEG-1 Layer III
    frame-header walks (``parse_mp3_features`` — ID3v2 skip, VBR
    census), progressive multi-scan JPEG
    (``decode_progressive_jpeg_features`` — DC successive
    approximation + AC spectral selection with EOBn runs), and
    WebDataset tar manifests (``tar_shard_manifest``) are all real
    stdlib parsing. A production build plugs
    Pillow/libvips/ffmpeg here; everything around it (schema,
    batching, partitioning) is already real.

    ROUND-16 DECISION — THIS BOUNDARY IS FINAL. Fifteen codec entries
    narrowed the stub to exactly (a) ISO 11172-3 Tables 3-B.7 (Layer
    III Huffman codewords) and 3-B.3 (the 512-coefficient synthesis
    window) and (b) motion-compensated video reference code. All
    three are DATA, not machinery — every decoding mechanism around
    them (bit reservoir, side info, scalefactors + scfsi, subband
    requantization, the T.81 entropy/IDCT kernel, LZW, Rice) decodes
    for real — and the build's standing rule is that spec tables are
    never reconstructed from memory (they would be unverifiable
    guesses) nor copied from reference decoders (material this build
    does not ship). The codec family is therefore CLOSED: no further
    rounds spend on it; a production deployment supplies the tables
    via Pillow/ffmpeg exactly at this seam, with zero change to any
    Spark-side schema, batching, or partitioning.
    """
    raise NotImplementedError(
        "Layer-III sample, Layer-I/II PCM-synthesis-window, and "
        "motion-compensated video-codec decoders are not available in "
        "this environment (ISO tables 3-B.3/3-B.7 and codec reference "
        "libraries not shipped)"
    )


def resize_images(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize over binary payloads — the Spark plumbing is real
    (Arrow batches through ``mapInPandas``, fixed output schema, bytes
    never touch the driver); the pixel kernel is a deterministic stub
    because no codec ships in this container. A production build swaps
    ``_resize_stub`` for a Pillow/libvips call — nothing else changes.

    Scale note: payload rows are large, so the op preserves the input
    partitioning (no shuffle) and emits scaled dimensions + payload
    untouched; re-encoding happens where the decoder does.
    """
    out_schema = "asset_id bigint, payload binary, width int, height int"

    def _resize_stub(w: int, h: int) -> tuple[int, int]:
        scale = max(w, h) / max_side
        return (max(int(w / scale), 1), max(int(h / scale), 1)) if scale > 1 else (w, h)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [_resize_stub(m["width"], m["height"]) for m in pdf["meta"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": pdf["payload"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return assets.mapInPandas(batches, schema=out_schema)


def sample_frames(assets: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    'frame' (stub: every ``every_n_bytes``-th byte offset), exploded
    executor-side via ``mapInPandas`` — the 1→N row fan-out shape a
    real ffmpeg-based sampler uses, with per-frame byte slices standing
    in for decoded frames."""
    out_schema = "asset_id bigint, frame_no int, offset bigint, frame_crc string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = {"asset_id": [], "frame_no": [], "offset": [], "frame_crc": []}
            for aid, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["modality"] != "video":
                    continue
                buf = bytes(payload)
                for i, off in enumerate(range(0, len(buf), every_n_bytes)):
                    rows["asset_id"].append(aid)
                    rows["frame_no"].append(i)
                    rows["offset"].append(off)
                    rows["frame_crc"].append(
                        hashlib.md5(buf[off : off + every_n_bytes]).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — per-partition, zero driver involvement. The
    'features' are deterministic byte statistics standing in for a
    decoded-media feature vector."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            meta = pdf["meta"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": [m["modality"] for m in meta],
                    "byte_len": payloads.map(len).astype("int64"),
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "mean_byte": [
                        float(sum(p)) / max(len(p), 1) for p in payloads
                    ],
                    "feature_crc": [
                        hashlib.md5(bytes(p)).hexdigest() for p in payloads
                    ],
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def plan_frame_samples(
    assets: DataFrame,
    *,
    every_s: float = 2.0,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame-sampling PLAN: given per-asset (duration_s, fps)
    metadata, emit the frame indices a decoder should extract — one
    frame every ``every_s`` seconds, capped at ``max_frames``,
    timestamps back-computed from the index. Pure column arithmetic +
    one ``sequence`` explode: the planning half of frame extraction is
    engine work (and oracle-checkable); only the pixel half needs a
    codec.

    At 100 TB the plan joins back to the binary table so each executor
    decodes only its own assets' chosen frames — the plan IS the work
    manifest.
    """
    n_frames = F.least(
        F.lit(max_frames),
        F.greatest(F.lit(1), F.floor(F.col("duration_s") / every_s).cast("int")),
    )
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("sample_idx")
    out = assets.select("asset_id", "duration_s", "fps", idx)
    frame_no = F.floor(F.col("sample_idx") * every_s * F.col("fps")).cast("long")
    return out.select(
        "asset_id",
        F.col("sample_idx").cast("int").alias("sample_idx"),
        frame_no.alias("frame_no"),
        (F.col("sample_idx") * F.lit(every_s)).alias("t_offset_s"),
    )


def plan_audio_chunks(
    assets: DataFrame,
    *,
    window_s: int = 5,
    sample_rate: int = 16_000,
    bytes_per_sample: int = 2,
) -> DataFrame:
    """Audio chunking PLAN: byte ranges for ``window_s``-second PCM
    windows given (n_samples) metadata — (chunk_id, byte_start,
    byte_end, n_samples) per chunk, last chunk truncated. The decoder
    slices the binary payload by these offsets; the offset math is
    pure engine arithmetic, verified against the SQL oracle.
    """
    samples_per_chunk = window_s * sample_rate
    n_chunks = F.ceil(F.col("n_samples") / samples_per_chunk).cast("int")
    cid = F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))).alias(
        "chunk_id"
    )
    out = assets.select("asset_id", "n_samples", cid)
    start_sample = F.col("chunk_id").cast("long") * samples_per_chunk
    end_sample = F.least(start_sample + samples_per_chunk, F.col("n_samples"))
    return out.select(
        "asset_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        (start_sample * bytes_per_sample).alias("byte_start"),
        (end_sample * bytes_per_sample).alias("byte_end"),
        (end_sample - start_sample).alias("chunk_samples"),
    )


# --- real PCM WAV decode (stdlib-only codec) ----------------------------------

WAV_RATE = 16_000


def _wav_n_samples(doc_id: int) -> int:
    return 800 + (doc_id % 5) * 400


def _wav_sample(doc_id, i):
    """Closed-form PCM16 sample — integer LCG, NO transcendentals, so
    the DuckDB oracle can regenerate every sample bit-exactly (a sine
    generator would hang the cross-check on libm ULP differences)."""
    return (doc_id * 7919 + i * 104729) % 65536 - 32768


def synthesize_wav_assets(docs: DataFrame) -> DataFrame:
    """REAL RIFF/WAVE PCM16-mono payloads, one per document, samples
    from the closed-form generator above — ``wave.open`` parses them
    (pinned in tests). Unlike ``synthesize_assets``' opaque bytes,
    these exercise an actual decoder end-to-end with no codec library:
    PCM WAV is a stdlib-parseable container."""
    out_schema = "asset_id bigint, payload binary"
    rate = WAV_RATE  # bind the VALUE: the closure must not reference
    # this module (workers in a vanilla session can't import it — the
    # same rule every other mapInPandas body here follows)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 800 + (d % 5) * 400  # keep in sync with _wav_n_samples
                i = np.arange(n, dtype=np.int64)
                pcm = ((d * 7919 + i * 104729) % 65536 - 32768).astype(
                    "<i2"
                ).tobytes()
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(pcm))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                    + b"data"
                    + struct.pack("<I", len(pcm))
                )
                payloads.append(hdr + pcm)
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def decode_wav_features(assets: DataFrame) -> DataFrame:
    """REAL audio decode via ``mapInPandas`` — no stub: parse the RIFF
    container (magics validated, fmt chunk unpacked), decode the PCM16
    frames with numpy, and emit per-asset audio features. ``rms`` is
    emitted UNROUNDED: every arithmetic step (integer sums of squares
    exact in double, correctly-rounded sqrt) is bit-identical across
    engines, so the oracle matches on the raw double while a rounding
    step could flip its last decimal. Compressed codecs (mp3/aac/...)
    still need an external library — that, and only that, remains the
    documented NotImplementedError contract (``decode_image``)."""
    out_schema = (
        "asset_id bigint, sample_rate int, n_channels int, n_samples bigint, "
        "duration_s double, rms double, peak int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = {k: [] for k in (
                "asset_id", "sample_rate", "n_channels", "n_samples",
                "duration_s", "rms", "peak",
            )}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
                    raise ValueError(f"asset {aid}: not a RIFF/WAVE payload")
                if buf[12:16] != b"fmt ":
                    raise ValueError(f"asset {aid}: missing fmt chunk")
                (fmt_len, audio_fmt, n_ch, rate, _br, _ba, bits) = struct.unpack(
                    "<IHHIIHH", buf[16:36]
                )
                if audio_fmt != 1 or bits != 16:
                    raise ValueError(f"asset {aid}: only PCM16 is supported")
                data_off = 20 + fmt_len
                if buf[data_off : data_off + 4] != b"data":
                    raise ValueError(f"asset {aid}: missing data chunk")
                (data_len,) = struct.unpack(
                    "<I", buf[data_off + 4 : data_off + 8]
                )
                pcm = np.frombuffer(
                    buf, dtype="<i2", count=data_len // 2, offset=data_off + 8
                ).astype(np.int64)
                n = len(pcm) // n_ch
                rows["asset_id"].append(aid)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(n_ch)
                rows["n_samples"].append(n)
                rows["duration_s"].append(n / rate)
                rows["rms"].append(
                    float(np.sqrt(float((pcm * pcm).sum()) / max(len(pcm), 1)))
                )
                rows["peak"].append(int(np.abs(pcm).max()) if n else 0)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


def _bmp_dims(doc_id: int) -> tuple[int, int]:
    """Closed-form per-asset dimensions. Widths 15/23/31/39: w*3 is
    never a multiple of 4, so every asset exercises the BMP row-padding
    path (16/24/32/40 would all pad to zero bytes — untested padding)."""
    return 15 + (doc_id % 4) * 8, 12 + (doc_id % 3) * 4


def synthesize_bmp_assets(docs: DataFrame) -> DataFrame:
    """REAL 24-bpp BMP payloads, one per document — the image leg of
    the d05-WAV proof pattern (round-5 verdict stretch #8): PCM WAV
    showed the audio plumbing is real; uncompressed BMP is the other
    container a decoder can parse with zero codec libraries. Full
    BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, BGR byte
    order, rows padded to 4 bytes — every quirk a real BMP reader must
    handle. Pixels come from integer closed forms (per channel, in
    TOP-DOWN image coordinates) so the DuckDB oracle can regenerate
    every pixel without ever seeing the bytes:

        b(x,y) = (id*31 + x*7  + y*13) % 256
        g(x,y) = (id*17 + x*5  + y*11) % 256
        r(x,y) = (id*23 + x*3  + y*19) % 256
    """
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 15 + (d % 4) * 8, 12 + (d % 3) * 4
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]  # image row (top-down)
                bgr = np.stack(
                    [
                        (d * 31 + x * 7 + y * 13) % 256,
                        (d * 17 + x * 5 + y * 11) % 256,
                        (d * 23 + x * 3 + y * 19) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)  # (h, w, 3) in B,G,R order
                stride = (w * 3 + 3) // 4 * 4
                rows = np.zeros((h, stride), dtype=np.uint8)
                rows[:, : w * 3] = bgr.reshape(h, w * 3)
                # BMP stores rows bottom-up: stored row 0 = image row h-1
                pix = rows[::-1].tobytes()
                off = 14 + 40
                hdr = (
                    b"BM"
                    + struct.pack("<IHHI", off + len(pix), 0, 0, off)
                    + struct.pack(
                        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
                    )
                )
                payloads.append(hdr + pix)
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def decode_bmp_features(assets: DataFrame) -> DataFrame:
    """REAL image decode via ``mapInPandas`` — no stub, no codec
    library: validate the BM magic, unpack both headers, undo the
    4-byte row padding and the bottom-up row order with numpy, split
    the BGR interleave, and emit per-asset features. ``mean_*`` are
    exact integer sums divided once (bit-identical across engines,
    emitted unrounded); ``topleft_lum`` is r+g+b of pixel (0,0) in
    IMAGE coordinates — which lives in the LAST stored row of a
    bottom-up BMP, so a decoder that ignores orientation fails the
    oracle. Compressed codecs (jpeg/png/...) still need an external
    library — that remains the documented NotImplementedError
    contract (``decode_image``)."""
    out_schema = (
        "asset_id bigint, width int, height int, n_pixels bigint, "
        "mean_r double, mean_g double, mean_b double, topleft_lum int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = {k: [] for k in (
                "asset_id", "width", "height", "n_pixels",
                "mean_r", "mean_g", "mean_b", "topleft_lum",
            )}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:2] != b"BM":
                    raise ValueError(f"asset {aid}: not a BMP payload")
                (off,) = struct.unpack("<I", buf[10:14])
                hdr_size, w, h, _planes, bpp = struct.unpack("<IiiHH", buf[14:30])
                if hdr_size != 40 or bpp != 24 or h <= 0:
                    raise ValueError(
                        f"asset {aid}: only 24-bpp bottom-up BITMAPINFOHEADER"
                    )
                stride = (w * 3 + 3) // 4 * 4
                stored = np.frombuffer(
                    buf, dtype=np.uint8, count=h * stride, offset=off
                ).reshape(h, stride)[:, : w * 3]
                img = stored[::-1].astype(np.int64)  # top-down image rows
                b = img[:, 0::3]
                g = img[:, 1::3]
                r = img[:, 2::3]
                n = w * h
                rows["asset_id"].append(aid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(n)
                rows["mean_r"].append(float(r.sum()) / n)
                rows["mean_g"].append(float(g.sum()) / n)
                rows["mean_b"].append(float(b.sum()) / n)
                rows["topleft_lum"].append(int(r[0, 0] + g[0, 0] + b[0, 0]))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


def _png_dims(doc_id: int) -> tuple[int, int]:
    """Closed-form per-asset dimensions (distinct from the BMP set so
    the two image entries never share byte layouts). Driver-side
    reference for tests and the d05 oracle; the executor closure in
    ``synthesize_png_assets`` inlines the same formula (it must ship
    by value) and ``test_png_payload_structure`` pins the two
    together."""
    return 17 + (doc_id % 4) * 8, 9 + (doc_id % 3) * 5


def synthesize_png_assets(docs: DataFrame) -> DataFrame:
    """REAL PNG payloads, one per document — the COMPRESSED-container
    leg of the d05 proof family (round-7 verdict #6): WAV proved audio,
    BMP proved uncompressed images, and PNG is the codec stdlib zlib
    fully covers, because PNG's only compression is DEFLATE. Each
    payload is a genuine non-interlaced 8-bit RGB (color type 2) PNG:
    signature, IHDR, IDAT (zlib stream of filtered scanlines — split
    into TWO IDAT chunks so decoders must concatenate), IEND, every
    chunk carrying its real CRC-32. Row ``y`` is written with filter
    type ``(doc_id + y) % 5``, so all five PNG filters (None/Sub/Up/
    Average/Paeth) appear in every asset taller than 4 rows and the
    decoder cannot skip unfiltering. Pixels come from integer closed
    forms in image coordinates (shared with the oracle, which never
    sees the bytes):

        r(x,y) = (id*23 + x*3  + y*19) % 256
        g(x,y) = (id*17 + x*5  + y*11) % 256
        b(x,y) = (id*31 + x*7  + y*13) % 256
    """
    out_schema = "asset_id bigint, payload binary"

    def _paeth(a, b, c):
        import numpy as np

        p = a.astype(np.int64) + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def chunk(ctype: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                # inlined _png_dims: this closure ships to executors by
                # VALUE (cloudpickle) — naming the module-level helper
                # here would make workers import etl_cortex_spark, which
                # vanilla sessions can't (the DataSource-factory gotcha).
                # test_png_payload_structure pins this to _png_dims.
                w, h = 17 + (d % 4) * 8, 9 + (d % 3) * 5
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                rgb = np.stack(
                    [
                        (d * 23 + x * 3 + y * 19) % 256,
                        (d * 17 + x * 5 + y * 11) % 256,
                        (d * 31 + x * 7 + y * 13) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)  # (h, w, 3) top-down RGB
                raw = rgb.reshape(h, w * 3).astype(np.int64)
                # encode filters from RAW neighbors (vectorizable; only
                # DECODING is sequential) — left is the same channel 3
                # bytes back, up is the previous raw row.
                left = np.zeros_like(raw)
                left[:, 3:] = raw[:, :-3]
                up = np.zeros_like(raw)
                up[1:] = raw[:-1]
                upleft = np.zeros_like(raw)
                upleft[1:, 3:] = raw[:-1, :-3]
                filtered = np.empty((h, w * 3 + 1), dtype=np.uint8)
                for yy in range(h):
                    ft = (d + yy) % 5
                    if ft == 0:
                        out = raw[yy]
                    elif ft == 1:
                        out = raw[yy] - left[yy]
                    elif ft == 2:
                        out = raw[yy] - up[yy]
                    elif ft == 3:
                        out = raw[yy] - (left[yy] + up[yy]) // 2
                    else:
                        out = raw[yy] - _paeth(left[yy], up[yy], upleft[yy])
                    filtered[yy, 0] = ft
                    filtered[yy, 1:] = (out % 256).astype(np.uint8)
                z = zlib.compress(filtered.tobytes(), 6)
                half = max(1, len(z) // 2)
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                payloads.append(
                    b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", z[:half])
                    + chunk(b"IDAT", z[half:])
                    + chunk(b"IEND", b"")
                )
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def decode_png_features(assets: DataFrame) -> DataFrame:
    """REAL compressed-image decode via ``mapInPandas`` — stdlib only:
    walk the chunk stream (verifying every CRC-32), parse IHDR,
    concatenate the IDAT payloads, ``zlib.decompress`` the DEFLATE
    stream, and reconstruct each scanline through the five PNG filters
    (None/Sub/Up/Average/Paeth — Sub/Average/Paeth are inherently
    sequential along the row, done byte-wise exactly as the spec
    defines; rows here are ≤ 41 px so the Python inner loop is bounded
    per asset, and a production build swaps this kernel for Pillow
    without touching the Spark plumbing). Feature schema matches the
    BMP twin; ``topleft_lum`` reads pixel (0,0), which in PNG is the
    FIRST stored row — the opposite orientation proof from bottom-up
    BMP. With this, the only remaining decode stubs are the codecs
    that genuinely need external libraries (jpeg/mp3/video)."""
    out_schema = (
        "asset_id bigint, width int, height int, n_pixels bigint, "
        "mean_r double, mean_g double, mean_b double, topleft_lum int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def paeth(a: int, b: int, c: int) -> int:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                return a
            return b if pb <= pc else c

        for pdf in it:
            rows = {k: [] for k in (
                "asset_id", "width", "height", "n_pixels",
                "mean_r", "mean_g", "mean_b", "topleft_lum",
            )}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:8] != b"\x89PNG\r\n\x1a\n":
                    raise ValueError(f"asset {aid}: not a PNG payload")
                pos, idat, ihdr = 8, b"", None
                while pos < len(buf):
                    (n,) = struct.unpack(">I", buf[pos : pos + 4])
                    ctype = buf[pos + 4 : pos + 8]
                    data = buf[pos + 8 : pos + 8 + n]
                    (crc,) = struct.unpack(">I", buf[pos + 8 + n : pos + 12 + n])
                    if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                        raise ValueError(f"asset {aid}: bad CRC in {ctype!r}")
                    if ctype == b"IHDR":
                        ihdr = struct.unpack(">IIBBBBB", data)
                    elif ctype == b"IDAT":
                        idat += data
                    elif ctype == b"IEND":
                        break
                    pos += 12 + n
                if ihdr is None:
                    raise ValueError(f"asset {aid}: missing IHDR")
                w, h, depth, ctype_i, comp, filt, inter = ihdr
                if (depth, ctype_i, comp, filt, inter) != (8, 2, 0, 0, 0):
                    raise ValueError(
                        f"asset {aid}: only 8-bit RGB non-interlaced supported"
                    )
                stride = w * 3
                flat = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
                lines = flat.reshape(h, stride + 1)
                recon = np.zeros((h, stride), dtype=np.int64)
                for yy in range(h):
                    ft = int(lines[yy, 0])
                    f_row = lines[yy, 1:].astype(np.int64)
                    prev = recon[yy - 1] if yy else np.zeros(stride, dtype=np.int64)
                    if ft == 0:
                        recon[yy] = f_row
                    elif ft == 2:
                        recon[yy] = (f_row + prev) % 256
                    else:  # Sub / Average / Paeth: sequential in x
                        r_row = recon[yy]
                        for i in range(stride):
                            a = r_row[i - 3] if i >= 3 else 0
                            b = prev[i]
                            c = prev[i - 3] if i >= 3 else 0
                            if ft == 1:
                                pred = a
                            elif ft == 3:
                                pred = (a + b) // 2
                            elif ft == 4:
                                pred = paeth(int(a), int(b), int(c))
                            else:
                                raise ValueError(
                                    f"asset {aid}: unknown filter {ft}"
                                )
                            r_row[i] = (f_row[i] + pred) % 256
                r = recon[:, 0::3]
                g = recon[:, 1::3]
                b_ = recon[:, 2::3]
                n = w * h
                rows["asset_id"].append(aid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(n)
                rows["mean_r"].append(float(r.sum()) / n)
                rows["mean_g"].append(float(g.sum()) / n)
                rows["mean_b"].append(float(b_.sum()) / n)
                rows["topleft_lum"].append(int(r[0, 0] + g[0, 0] + b_[0, 0]))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


def plan_image_tiles(
    assets: DataFrame,
    *,
    tile: int = 512,
) -> DataFrame:
    """Image tiling PLAN (the ViT-style patch grid / deep-zoom
    manifest): given per-asset (width, height) metadata, emit every
    ``tile``×``tile`` tile's (tile_x, tile_y, x0, y0, tw, th), edge
    tiles truncated — the third member of the decode-plan family next
    to frame sampling (D5b) and audio chunking (D5c). Two sequence
    explodes of pure column arithmetic; at scale the plan joins back
    to the binary table so each executor crops only its own assets'
    tiles.
    """
    nx = F.ceil(F.col("width") / tile).cast("int")
    ny = F.ceil(F.col("height") / tile).cast("int")
    tx = F.explode(F.sequence(F.lit(0), F.greatest(nx - 1, F.lit(0)))).alias("tile_x")
    # Degenerate assets (width or height ≤ 0) emit ZERO tiles, not one
    # zero-size crop rect — greatest(n-1, 0) would otherwise floor the
    # grid at one column/row for them.
    assets = assets.filter((F.col("width") > 0) & (F.col("height") > 0))
    out = assets.select("asset_id", "width", "height", tx, ny.alias("__ny"))
    ty = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col("__ny") - 1, F.lit(0)))
    ).alias("tile_y")
    out = out.select("asset_id", "width", "height", "tile_x", ty)
    x0 = F.col("tile_x").cast("long") * tile
    y0 = F.col("tile_y").cast("long") * tile
    return out.select(
        "asset_id",
        F.col("tile_x").cast("int").alias("tile_x"),
        F.col("tile_y").cast("int").alias("tile_y"),
        x0.alias("x0"),
        y0.alias("y0"),
        (F.least(x0 + tile, F.col("width")) - x0).alias("tw"),
        (F.least(y0 + tile, F.col("height")) - y0).alias("th"),
    )


# --- D5f: REAL entropy-coded image decode (baseline JPEG, round 10) -----------


def _jpeg_dims(doc_id: int) -> tuple[int, int]:
    """Closed-form per-asset dimensions for the JPEG leg (distinct
    from the BMP and PNG sets so no two image entries share byte
    layouts). Multiples of 8 BY DESIGN: baseline JPEG pads partial
    MCUs, and keeping every asset MCU-aligned keeps the closed-form
    oracle exact without a crop step. Driver-side reference for tests
    and the d05 oracle; the executor closures inline the same formula
    (they ship by value) and ``test_jpeg_payload_structure`` pins the
    two together."""
    return 16 + (doc_id % 3) * 8, 8 + (doc_id % 4) * 8


#: zigzag index -> row-major position, shared by encoder and decoder
#: (ITU T.81 Figure A.6).
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def synthesize_jpeg_assets(docs: DataFrame) -> DataFrame:
    """REAL baseline-JPEG payloads, one per document — the ENTROPY-
    CODED container leg of the d05 proof family (round-9 verdict #7):
    WAV proved audio, BMP proved uncompressed images, PNG proved
    DEFLATE, and JPEG is the Huffman+DCT codec, written here stdlib-
    only. Each payload is a genuine single-component (grayscale)
    baseline sequential JPEG per ITU T.81: SOI, DQT (64 zigzag-order
    entries, q[0]=8), SOF0 (8-bit, 1 component, 1×1 sampling), two
    DHT segments (canonical Huffman: a 9-symbol DC-size table at code
    length 4 and a single-symbol AC table whose 1-bit code is EOB —
    custom tables are legal JPEG and keep the file self-describing),
    SOS, the entropy-coded scan (DC diffs as size-category + amplitude
    bits, every block closed by EOB, 0xFF bytes stuffed with 0x00,
    final byte 1-padded), EOI.

    The payloads are DC-ONLY by design: a block whose AC coefficients
    are all zero decodes to a uniform 8×8 block of exactly
    ``128 + F00/8`` — and with q[0]=8 the dequantized F00 is 8·qDC, so
    every decoded pixel is the exact integer ``128 + qDC`` and the
    oracle needs no trigonometry. The DECODER still runs the full
    general baseline path (Huffman table construction from DHT, the
    AC run-length loop, dezigzag, dequantize, complete 2-D IDCT over
    all 64 coefficients); DC-only is a property of these assets, not
    of the decoder. Block DC closed form (shared with the oracle,
    which never sees the bytes):

        qDC(bx, by) = (id*7 + bx*5 + by*3) % 160 - 80
        pixel(block bx,by) = 128 + qDC   ∈ [48, 207] — never clamped

    DC diffs therefore span [-159, 159] → size categories ≤ 8, inside
    the 9-symbol DC table. No external JPEG decoder exists in this
    container to cross-validate against; conformance rests on the
    encoder following T.81's segment grammar exactly (pinned
    structurally in tests) and the independent decoder below agreeing
    with the closed form."""
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def encode_one(d: int) -> bytes:
            # inlined _jpeg_dims (closures ship by value — the
            # vanilla-session gotcha, same as the PNG leg)
            w, h = 16 + (d % 3) * 8, 8 + (d % 4) * 8
            nbx, nby = w // 8, h // 8
            q = bytes([8] + [16] * 63)
            out = bytearray(b"\xff\xd8")
            out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
            out += (
                b"\xff\xc0"
                + struct.pack(">HBHHB", 11, 8, h, w, 1)
                + bytes([1, 0x11, 0])
            )
            bits_dc = bytearray(16)
            bits_dc[3] = 9  # nine 4-bit codes: sizes 0..8
            out += (
                b"\xff\xc4"
                + struct.pack(">H", 2 + 1 + 16 + 9)
                + b"\x00"
                + bytes(bits_dc)
                + bytes(range(9))
            )
            bits_ac = bytearray(16)
            bits_ac[0] = 1  # one 1-bit code: EOB (run/size 0x00)
            out += (
                b"\xff\xc4"
                + struct.pack(">H", 2 + 1 + 16 + 1)
                + b"\x10"
                + bytes(bits_ac)
                + bytes([0x00])
            )
            out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
            data = bytearray()
            bitbuf = nbits = 0

            def put(code: int, ln: int) -> None:
                nonlocal bitbuf, nbits
                bitbuf = (bitbuf << ln) | code
                nbits += ln
                while nbits >= 8:
                    byte = (bitbuf >> (nbits - 8)) & 0xFF
                    data.append(byte)
                    if byte == 0xFF:
                        data.append(0x00)  # byte stuffing
                    nbits -= 8
                    bitbuf &= (1 << nbits) - 1

            prev = 0
            for by in range(nby):
                for bx in range(nbx):
                    dc = (d * 7 + bx * 5 + by * 3) % 160 - 80
                    diff = dc - prev
                    prev = dc
                    s = diff.bit_length()
                    put(s, 4)  # canonical code of symbol s IS s at length 4
                    if s:
                        amp = diff if diff > 0 else diff + (1 << s) - 1
                        put(amp & ((1 << s) - 1), s)
                    put(0, 1)  # EOB
            if nbits:
                pad = 8 - nbits
                byte = ((bitbuf << pad) | ((1 << pad) - 1)) & 0xFF
                data.append(byte)
                if byte == 0xFF:
                    data.append(0x00)
            out += data + b"\xff\xd9"
            return bytes(out)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def _jpeg_build_huff(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman decode table exactly as T.81 Annex C defines:
    (length, code) → symbol. Shared by the still-image and MJPEG
    decode paths (round 13 refactor — ONE kernel, two containers)."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def baseline_jpeg_pixels(aid, buf: bytes):
    """General BASELINE SEQUENTIAL grayscale JPEG decode (ITU T.81) →
    (width, height, pixel ndarray). The full entropy-coded path:
    marker walk (APPn/COM skipped), DQT, DHT → canonical Huffman,
    SOF0 (8-bit, 1 component, 1×1), SOS, per-MCU DC size+amplitude
    with the Annex F EXTEND rule, the AC run-length loop (EOB/ZRL/
    run-size), dezigzag, dequantize, complete 2-D IDCT, +128 shift,
    clamp. Module-level since round 13 so the still-image leg
    (``decode_jpeg_features``) and the MJPEG video leg
    (``decode_mjpeg_frame_features``) decode through the SAME kernel.
    Raises ValueError on anything non-baseline — loud desync, never
    silent skips."""
    import math
    import struct

    import numpy as np

    zigzag = _JPEG_ZIGZAG
    M = np.array(
        [
            [
                ((1 / math.sqrt(2)) if u == 0 else 1.0)
                / 2.0
                * math.cos((2 * x + 1) * u * math.pi / 16)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    if buf[:2] != b"\xff\xd8":
        raise ValueError(f"asset {aid}: not a JPEG (no SOI)")
    pos, qt, huff, sof = 2, {}, {}, None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"asset {aid}: expected marker at {pos}")
        m = buf[pos + 1]
        pos += 2
        if m == 0xD9:
            raise ValueError(f"asset {aid}: EOI before SOS")
        (ln,) = struct.unpack(">H", buf[pos : pos + 2])
        seg = buf[pos + 2 : pos + ln]
        pos += ln
        if 0xE0 <= m <= 0xEF or m == 0xFE:
            continue  # APPn / COM
        if m == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError(f"asset {aid}: 16-bit DQT unsupported")
                qt[tq] = np.frombuffer(
                    seg[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif m == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                huff[(tc, th)] = _jpeg_build_huff(
                    bits, list(seg[i + 17 : i + 17 + nv])
                )
                i += 17 + nv
        elif m == 0xC0:
            prec = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if prec != 8 or nc != 1:
                raise ValueError(
                    f"asset {aid}: only 8-bit single-component "
                    f"baseline supported (got prec={prec}, nc={nc})"
                )
            if seg[7] != 0x11:
                raise ValueError(f"asset {aid}: subsampling unsupported")
            sof = (w, h, seg[8])
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(f"asset {aid}: non-baseline SOF{m & 0xF}")
        elif m == 0xDD:
            raise ValueError(f"asset {aid}: restart intervals unsupported")
        elif m == 0xDA:
            if sof is None:
                raise ValueError(f"asset {aid}: SOS before SOF0")
            w, h, tq0 = sof
            tbl = seg[2]
            dc_t, ac_t = huff[(0, tbl >> 4)], huff[(1, tbl & 0xF)]
            q = qt[tq0]
            # un-stuff entropy bytes up to the next real marker
            data = bytearray()
            p = pos
            while p + 1 < len(buf):
                if buf[p] == 0xFF:
                    if buf[p + 1] == 0x00:
                        data.append(0xFF)
                        p += 2
                        continue
                    break
                data.append(buf[p])
                p += 1
            bitpos = 0

            def getbit() -> int:
                nonlocal bitpos
                byte = data[bitpos >> 3]
                bit = (byte >> (7 - (bitpos & 7))) & 1
                bitpos += 1
                return bit

            def read_huff(tab: dict) -> int:
                code = ln2 = 0
                while ln2 <= 16:
                    code = (code << 1) | getbit()
                    ln2 += 1
                    sym = tab.get((ln2, code))
                    if sym is not None:
                        return sym
                raise ValueError(f"asset {aid}: invalid Huffman code")

            def receive_extend(s: int) -> int:
                v = 0
                for _ in range(s):
                    v = (v << 1) | getbit()
                return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

            nbx, nby = w // 8, h // 8
            px = np.zeros((h, w), dtype=np.int64)
            prev = 0
            for by in range(nby):
                for bx in range(nbx):
                    s = read_huff(dc_t)
                    prev += receive_extend(s) if s else 0
                    czz = np.zeros(64, dtype=np.int64)
                    czz[0] = prev
                    k = 1
                    while k < 64:
                        rs = read_huff(ac_t)
                        if rs == 0x00:
                            break  # EOB
                        if rs == 0xF0:
                            k += 16  # ZRL
                            continue
                        k += rs >> 4
                        czz[k] = receive_extend(rs & 0xF)
                        k += 1
                    Fm = np.zeros(64, dtype=np.float64)
                    Fm[list(zigzag)] = czz * q
                    block = M.T @ Fm.reshape(8, 8) @ M
                    px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                        np.rint(block).astype(np.int64) + 128, 0, 255
                    )
            return w, h, px
        else:
            raise ValueError(f"asset {aid}: unexpected marker 0x{m:02x}")
    raise ValueError(f"asset {aid}: no SOS segment")


def decode_jpeg_features(assets: DataFrame) -> DataFrame:
    """REAL entropy-coded image decode via ``mapInPandas`` — stdlib +
    numpy only, a general BASELINE SEQUENTIAL grayscale JPEG decoder
    (ITU T.81): marker walk (APPn/COM skipped), DQT (8-bit tables),
    DHT → canonical Huffman decoder built from the (bits, values)
    lists exactly as Annex C defines, SOF0 (8-bit, 1 component, 1×1
    sampling), SOS, then per MCU: Huffman DC size + amplitude bits
    with the Annex F EXTEND sign rule, the full AC run-length loop
    (EOB, ZRL 0xF0, run/size), dezigzag, dequantize, and a complete
    2-D IDCT (separable orthonormal basis-matrix product, numpy),
    +128 level shift, clamp. Not supported (raise, by contract):
    multi-component scans, chroma subsampling, progressive mode, and
    restart intervals — the color path needs exactly this kernel
    applied per component plus YCbCr conversion, and a production
    build swaps in libjpeg via Pillow without touching the Spark
    plumbing. Per-asset work is bounded (the inner loops are per 8×8
    block); the plumbing is the same Arrow-batched shape as the
    WAV/BMP/PNG legs. Output: (asset_id, width, height, n_pixels,
    mean_lum, topleft_lum) with mean_lum = exact integer pixel sum /
    count, emitted unrounded."""
    out_schema = (
        "asset_id bigint, width int, height int, n_pixels bigint, "
        "mean_lum double, topleft_lum int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in it:
            rows = {
                k: []
                for k in (
                    "asset_id", "width", "height", "n_pixels",
                    "mean_lum", "topleft_lum",
                )
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = baseline_jpeg_pixels(aid, bytes(payload))
                n = w * h
                rows["asset_id"].append(aid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(n)
                rows["mean_lum"].append(float(px.sum()) / n)
                rows["topleft_lum"].append(int(px[0, 0]))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5g: REAL COLOR image decode (baseline 4:2:0 YCbCr JPEG, round 11) --------


def _color_jpeg_dims(doc_id: int) -> tuple[int, int]:
    """Closed-form dimensions for the COLOR JPEG leg — multiples of 16
    BY DESIGN: a 4:2:0 MCU covers 16×16 luma pixels (four Y blocks +
    one Cb + one Cr), and MCU alignment keeps the closed-form oracle
    exact without a crop step. Distinct from every other asset
    family's dims."""
    return 16 + (doc_id % 3) * 16, 16 + (doc_id % 2) * 16


def synthesize_color_jpeg_assets(docs: DataFrame) -> DataFrame:
    """REAL baseline-sequential COLOR JPEG payloads (ITU T.81 +
    JFIF-convention YCbCr), one per document — round-10 verdict #7,
    retiring "color" from the NotImplementedError contract. Each
    payload is a genuine 3-component 4:2:0 file: SOI; one DQT segment
    carrying BOTH 8-bit tables (luma id 0, chroma id 1, q[0]=8 each);
    SOF0 with component 1 sampling 2×2/tq 0 and components 2-3
    sampling 1×1/tq 1 (the standard 4:2:0 layout); FOUR DHT segments
    (DC/AC × luma/chroma ids — the chroma tables are structurally
    identical canonical tables under their own ids, so the decoder's
    per-component table SELECTION is genuinely exercised); SOS mapping
    Y→(DC0,AC0), Cb/Cr→(DC1,AC1); the interleaved entropy scan (per
    MCU: Y00 Y01 Y10 Y11 Cb Cr, each component with its OWN DC
    predictor, 0xFF bytes stuffed, final byte 1-padded); EOI.

    All three components are DC-only (the decoder still runs the full
    general path) with q[0]=8 so each decoded plane is exactly
    ``128 + qDC`` per block. Closed forms shared with the oracle:

        Y  qDC(bx, by) = (id*7  + bx*5 + by*3) % 160 - 80   (8×8 luma blocks)
        Cb qDC(mx, my) = (id*11 + mx*5 + my*3) % 120 - 60   (16×16 MCUs)
        Cr qDC(mx, my) = (id*13 + mx*3 + my*7) % 120 - 60

    DC diffs span ±159 (Y) / ±119 (chroma) → size categories ≤ 8,
    inside the 9-symbol DC tables."""
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def encode_one(d: int) -> bytes:
            w, h = 16 + (d % 3) * 16, 16 + (d % 2) * 16  # inlined _color_jpeg_dims
            nmx, nmy = w // 16, h // 16
            q = bytes([8] + [16] * 63)
            out = bytearray(b"\xff\xd8")
            # one DQT segment, two tables (Pq=0, Tq=0 and 1)
            out += b"\xff\xdb" + struct.pack(">H", 2 + 65 + 65)
            out += b"\x00" + q + b"\x01" + q
            # SOF0: 3 components, Y 2x2 tq0; Cb,Cr 1x1 tq1
            out += (
                b"\xff\xc0"
                + struct.pack(">HBHHB", 8 + 3 * 3, 8, h, w, 3)
                + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
            )
            bits_dc = bytearray(16)
            bits_dc[3] = 9  # nine 4-bit codes: sizes 0..8
            bits_ac = bytearray(16)
            bits_ac[0] = 1  # one 1-bit code: EOB
            for tc_th in (0x00, 0x01):  # DC tables, luma + chroma ids
                out += (
                    b"\xff\xc4"
                    + struct.pack(">H", 2 + 1 + 16 + 9)
                    + bytes([tc_th])
                    + bytes(bits_dc)
                    + bytes(range(9))
                )
            for tc_th in (0x10, 0x11):  # AC tables, luma + chroma ids
                out += (
                    b"\xff\xc4"
                    + struct.pack(">H", 2 + 1 + 16 + 1)
                    + bytes([tc_th])
                    + bytes(bits_ac)
                    + bytes([0x00])
                )
            out += (
                b"\xff\xda"
                + struct.pack(">HB", 6 + 2 * 3, 3)
                + bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
            )
            data = bytearray()
            bitbuf = nbits = 0

            def put(code: int, ln: int) -> None:
                nonlocal bitbuf, nbits
                bitbuf = (bitbuf << ln) | code
                nbits += ln
                while nbits >= 8:
                    byte = (bitbuf >> (nbits - 8)) & 0xFF
                    data.append(byte)
                    if byte == 0xFF:
                        data.append(0x00)  # byte stuffing
                    nbits -= 8
                    bitbuf &= (1 << nbits) - 1

            def put_dc(diff: int) -> None:
                s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
                put(s, 4)  # canonical code of symbol s IS s at length 4
                if s:
                    amp = diff if diff > 0 else diff + (1 << s) - 1
                    put(amp & ((1 << s) - 1), s)
                put(0, 1)  # EOB closes the (DC-only) block

            prev = {"y": 0, "cb": 0, "cr": 0}
            for my in range(nmy):
                for mx in range(nmx):
                    for vy in range(2):  # four Y blocks, raster order
                        for vx in range(2):
                            bx, by = 2 * mx + vx, 2 * my + vy
                            dc = (d * 7 + bx * 5 + by * 3) % 160 - 80
                            put_dc(dc - prev["y"])
                            prev["y"] = dc
                    cb = (d * 11 + mx * 5 + my * 3) % 120 - 60
                    put_dc(cb - prev["cb"])
                    prev["cb"] = cb
                    cr = (d * 13 + mx * 3 + my * 7) % 120 - 60
                    put_dc(cr - prev["cr"])
                    prev["cr"] = cr
            if nbits:
                pad = 8 - nbits
                byte = ((bitbuf << pad) | ((1 << pad) - 1)) & 0xFF
                data.append(byte)
                if byte == 0xFF:
                    data.append(0x00)
            out += data + b"\xff\xd9"
            return bytes(out)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def decode_color_jpeg_features(assets: DataFrame) -> DataFrame:
    """REAL color image decode via ``mapInPandas`` — stdlib + numpy
    only, a general baseline-sequential MULTI-COMPONENT JPEG decoder
    (ITU T.81): everything the grayscale leg does (DHT-driven
    canonical Huffman, Annex-F EXTEND, full AC run-length loop,
    dezigzag, per-table dequantize, complete 2-D IDCT) plus the
    interleaved-MCU scan — per-component sampling factors from SOF0
    (up to 2×2), per-component quant/Huffman table selection from
    DQT/SOF0/SOS, one DC predictor per component, per-component
    planes assembled at their native subsampled resolution, nearest-
    neighbor chroma upsampling to full resolution, and the JFIF
    YCbCr→RGB conversion (R = Y + 1.402·(Cr−128), G = Y −
    0.344136·(Cb−128) − 0.714136·(Cr−128), B = Y + 1.772·(Cb−128)),
    rounded with floor(x + 0.5) — NOT banker's rint — so the oracle
    can replay the identical IEEE expression in SQL, then clamped to
    [0, 255]. Grayscale (nc=1) payloads also decode (the conversion
    is skipped; chroma features NULL) — one kernel, both layouts.
    Not supported (raise, by contract): progressive mode, restart
    intervals, 16-bit quant tables, sampling factors beyond 2.

    Output: (asset_id, width, height, n_pixels, mean_y, mean_cb,
    mean_cr, mean_r, topleft_r, topleft_g, topleft_b); means are
    exact-integer-sum / count over the FULL-RESOLUTION planes,
    emitted unrounded."""
    out_schema = (
        "asset_id bigint, width int, height int, n_pixels bigint, "
        "mean_y double, mean_cb double, mean_cr double, mean_r double, "
        "topleft_r int, topleft_g int, topleft_b int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        import struct

        import numpy as np
        import pandas as pd

        zigzag = (
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
            35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
            58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
        )
        M = np.array(
            [
                [
                    ((1 / math.sqrt(2)) if u == 0 else 1.0)
                    / 2.0
                    * math.cos((2 * x + 1) * u * math.pi / 16)
                    for x in range(8)
                ]
                for u in range(8)
            ]
        )

        def build_huff(bits: list[int], vals: list[int]) -> dict:
            table, code, k = {}, 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    table[(ln, code)] = vals[k]
                    k += 1
                    code += 1
                code <<= 1
            return table

        def decode_one(aid, buf: bytes):
            if buf[:2] != b"\xff\xd8":
                raise ValueError(f"asset {aid}: not a JPEG (no SOI)")
            pos, qt, huff, sof = 2, {}, {}, None
            while pos < len(buf):
                if buf[pos] != 0xFF:
                    raise ValueError(f"asset {aid}: expected marker at {pos}")
                m = buf[pos + 1]
                pos += 2
                if m == 0xD9:
                    raise ValueError(f"asset {aid}: EOI before SOS")
                (ln,) = struct.unpack(">H", buf[pos : pos + 2])
                seg = buf[pos + 2 : pos + ln]
                pos += ln
                if 0xE0 <= m <= 0xEF or m == 0xFE:
                    continue  # APPn / COM
                if m == 0xDB:
                    i = 0
                    while i < len(seg):
                        pq, tq = seg[i] >> 4, seg[i] & 0xF
                        if pq != 0:
                            raise ValueError(f"asset {aid}: 16-bit DQT unsupported")
                        qt[tq] = np.frombuffer(
                            seg[i + 1 : i + 65], dtype=np.uint8
                        ).astype(np.int64)
                        i += 65
                elif m == 0xC4:
                    i = 0
                    while i < len(seg):
                        tc, th = seg[i] >> 4, seg[i] & 0xF
                        bits = list(seg[i + 1 : i + 17])
                        nv = sum(bits)
                        huff[(tc, th)] = build_huff(
                            bits, list(seg[i + 17 : i + 17 + nv])
                        )
                        i += 17 + nv
                elif m == 0xC0:
                    prec = seg[0]
                    h, w = struct.unpack(">HH", seg[1:5])
                    nc = seg[5]
                    if prec != 8 or nc not in (1, 3):
                        raise ValueError(
                            f"asset {aid}: only 8-bit 1- or 3-component "
                            f"baseline supported (got prec={prec}, nc={nc})"
                        )
                    comps = []
                    for c in range(nc):
                        cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                        hi, vi = samp >> 4, samp & 0xF
                        if not (1 <= hi <= 2 and 1 <= vi <= 2):
                            raise ValueError(
                                f"asset {aid}: sampling {hi}x{vi} unsupported"
                            )
                        comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
                    sof = (w, h, comps)
                elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
                    raise ValueError(f"asset {aid}: non-baseline SOF{m & 0xF}")
                elif m == 0xDD:
                    raise ValueError(f"asset {aid}: restart intervals unsupported")
                elif m == 0xDA:
                    if sof is None:
                        raise ValueError(f"asset {aid}: SOS before SOF0")
                    w, h, comps = sof
                    ns = seg[0]
                    if ns != len(comps):
                        raise ValueError(f"asset {aid}: partial scan unsupported")
                    by_id = {c["id"]: c for c in comps}
                    for c in range(ns):
                        cid, tbl = seg[1 + 2 * c : 3 + 2 * c]
                        by_id[cid]["dc"] = huff[(0, tbl >> 4)]
                        by_id[cid]["ac"] = huff[(1, tbl & 0xF)]
                    data = bytearray()
                    p = pos
                    while p + 1 < len(buf):
                        if buf[p] == 0xFF:
                            if buf[p + 1] == 0x00:
                                data.append(0xFF)
                                p += 2
                                continue
                            break
                        data.append(buf[p])
                        p += 1
                    bitpos = 0

                    def getbit() -> int:
                        nonlocal bitpos
                        byte = data[bitpos >> 3]
                        bit = (byte >> (7 - (bitpos & 7))) & 1
                        bitpos += 1
                        return bit

                    def read_huff(tab: dict) -> int:
                        code = ln2 = 0
                        while ln2 <= 16:
                            code = (code << 1) | getbit()
                            ln2 += 1
                            sym = tab.get((ln2, code))
                            if sym is not None:
                                return sym
                        raise ValueError(f"asset {aid}: invalid Huffman code")

                    def receive_extend(s: int) -> int:
                        v = 0
                        for _ in range(s):
                            v = (v << 1) | getbit()
                        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

                    def read_block(comp) -> np.ndarray:
                        s = read_huff(comp["dc"])
                        comp["pred"] += receive_extend(s) if s else 0
                        czz = np.zeros(64, dtype=np.int64)
                        czz[0] = comp["pred"]
                        k = 1
                        while k < 64:
                            rs = read_huff(comp["ac"])
                            if rs == 0x00:
                                break  # EOB
                            if rs == 0xF0:
                                k += 16  # ZRL
                                continue
                            k += rs >> 4
                            czz[k] = receive_extend(rs & 0xF)
                            k += 1
                        Fm = np.zeros(64, dtype=np.float64)
                        Fm[list(zigzag)] = czz * qt[comp["tq"]]
                        block = M.T @ Fm.reshape(8, 8) @ M
                        return np.clip(
                            np.floor(block + 0.5).astype(np.int64) + 128, 0, 255
                        )

                    hmax = max(c["h"] for c in comps)
                    vmax = max(c["v"] for c in comps)
                    nmx = -(-w // (8 * hmax))
                    nmy = -(-h // (8 * vmax))
                    for c in comps:
                        c["plane"] = np.zeros(
                            (nmy * c["v"] * 8, nmx * c["h"] * 8), dtype=np.int64
                        )
                        c["pred"] = 0
                    for my in range(nmy):
                        for mx in range(nmx):
                            for c in comps:
                                for vy in range(c["v"]):
                                    for vx in range(c["h"]):
                                        blk = read_block(c)
                                        y0 = (my * c["v"] + vy) * 8
                                        x0 = (mx * c["h"] + vx) * 8
                                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk
                    # upsample each plane to full resolution (nearest) + crop
                    full = []
                    for c in comps:
                        ry, rx = vmax // c["v"], hmax // c["h"]
                        pl = c["plane"].repeat(ry, axis=0).repeat(rx, axis=1)
                        full.append(pl[:h, :w])
                    return w, h, full

                else:
                    raise ValueError(f"asset {aid}: unexpected marker 0x{m:02x}")
            raise ValueError(f"asset {aid}: no SOS segment")

        def convert(yp, cbp, crp):
            cbd = cbp.astype(np.float64) - 128.0
            crd = crp.astype(np.float64) - 128.0
            yv = yp.astype(np.float64)
            r = np.clip(np.floor(yv + 1.402 * crd + 0.5), 0, 255).astype(np.int64)
            g = np.clip(
                np.floor(yv - 0.344136 * cbd - 0.714136 * crd + 0.5), 0, 255
            ).astype(np.int64)
            b = np.clip(np.floor(yv + 1.772 * cbd + 0.5), 0, 255).astype(np.int64)
            return r, g, b

        for pdf in it:
            cols = (
                "asset_id", "width", "height", "n_pixels", "mean_y", "mean_cb",
                "mean_cr", "mean_r", "topleft_r", "topleft_g", "topleft_b",
            )
            rows = {k: [] for k in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, planes = decode_one(aid, bytes(payload))
                n = w * h
                rows["asset_id"].append(aid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(n)
                rows["mean_y"].append(float(planes[0].sum()) / n)
                if len(planes) == 3:
                    r, g, b = convert(*planes)
                    rows["mean_cb"].append(float(planes[1].sum()) / n)
                    rows["mean_cr"].append(float(planes[2].sum()) / n)
                    rows["mean_r"].append(float(r.sum()) / n)
                    rows["topleft_r"].append(int(r[0, 0]))
                    rows["topleft_g"].append(int(g[0, 0]))
                    rows["topleft_b"].append(int(b[0, 0]))
                else:
                    for k in ("mean_cb", "mean_cr", "mean_r",
                              "topleft_r", "topleft_g", "topleft_b"):
                        rows[k].append(None)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5h: REAL video CONTAINER parse (RIFF AVI, round 11) ----------------------


def synthesize_avi_assets(docs: DataFrame) -> DataFrame:
    """REAL RIFF-AVI container payloads, one per document — the VIDEO
    half of the proof family moves from "stub" to "container parsed
    for real, codec decode stubbed" (the honest production split: a
    100 TB video pipeline shards, samples, and budgets on CONTAINER
    metadata — dimensions, fps, frame count, per-frame byte offsets —
    long before any codec touches pixels). Each payload is a genuine
    minimal AVI per the RIFF grammar: ``RIFF('AVI ')`` containing
    ``LIST('hdrl')`` with a 56-byte ``avih`` MainAVIHeader and one
    ``LIST('strl')`` ('vids' ``strh`` with scale/rate/length + 40-byte
    BITMAPINFOHEADER ``strf``), then ``LIST('movi')`` with one
    ``00dc`` chunk per frame (deterministic fake pixel bytes — the
    codec boundary), odd-sized chunks pad to even exactly as RIFF
    requires (the synthesized sizes are deliberately odd half the
    time so the walker's padding handling is genuinely exercised).

    Closed forms shared with the oracle:
        width  = 160 + (id % 4) * 80;  height = 120 + (id % 3) * 60
        (rate, scale) = (24, 1) if id even else (30000, 1001)  # 29.97 NTSC
        n_frames = 10 + id % 16
        frame i size = 64 + ((id*31 + i*17) % 128) bytes,
        frame i first byte = (id + i) % 256
    """
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd

        def chunk(fourcc: bytes, body: bytes) -> bytes:
            pad = b"\x00" if len(body) % 2 else b""
            return fourcc + struct.pack("<I", len(body)) + body + pad

        def lst(kind: bytes, body: bytes) -> bytes:
            return chunk(b"LIST", kind + body)

        def encode_one(d: int) -> bytes:
            w, h = 160 + (d % 4) * 80, 120 + (d % 3) * 60
            rate, scale = (24, 1) if d % 2 == 0 else (30000, 1001)
            n = 10 + d % 16
            avih = struct.pack(
                "<14I",
                int(1_000_000 * scale // rate), 0, 0, 0x10, n, 0, 1, 0, w, h,
                0, 0, 0, 0,
            )
            strh = (
                b"vids" + b"DIB " + struct.pack("<I2H8I", 0, 0, 0, 0, scale, rate,
                                                0, n, 0, 0, 0)
                + struct.pack("<4h", 0, 0, w, h)
            )
            strf = struct.pack("<I2i2H6I", 40, w, h, 1, 24, 0, w * h * 3, 0, 0, 0, 0)
            hdrl = lst(
                b"hdrl",
                chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
            )
            def frame_body(i: int) -> bytes:
                # numpy byte-ramp instead of a per-byte Python generator
                # (round 11: synthesis dominated the sf1 probe wall)
                size = 64 + ((d * 31 + i * 17) % 128)
                arr = (np.arange(size, dtype=np.int64) + d * 3 + i * 7) % 256
                arr[0] = (d + i) % 256
                return arr.astype(np.uint8).tobytes()

            frames = b"".join(chunk(b"00dc", frame_body(i)) for i in range(n))
            movi = lst(b"movi", frames)
            riff_body = b"AVI " + hdrl + movi
            return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def parse_avi_features(assets: DataFrame) -> DataFrame:
    """REAL video-container parse via ``mapInPandas`` — a general RIFF
    walker (stdlib struct only): verifies the RIFF/'AVI ' magic, walks
    the chunk tree honoring the even-byte padding rule, reads the
    ``avih`` MainAVIHeader (width/height/total frames), the 'vids'
    ``strh`` (scale/rate/length), and walks every ``00dc``/``00db``
    chunk in ``LIST('movi')`` counting frames and payload bytes —
    raising loudly when header claims and the movi walk disagree
    (truncated uploads, the #1 real-world video-corpus defect). The
    codec boundary is explicit: frame PAYLOADS are opaque (decode
    stays behind ``decode_image``'s documented stub); everything a
    sharding/sampling/budgeting pipeline needs is parsed from bytes.
    Output: (asset_id, width, height, n_frames, fps, duration_s,
    movi_bytes, first_frame_byte); fps = rate/scale and duration_s =
    n_frames·scale/rate as exact integer-operand double divisions —
    bit-identical on any engine."""
    out_schema = (
        "asset_id bigint, width int, height int, n_frames int, fps double, "
        "duration_s double, movi_bytes bigint, first_frame_byte int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def parse_one(aid, buf: bytes):
            if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
                raise ValueError(f"asset {aid}: not a RIFF AVI")
            (riff_sz,) = struct.unpack("<I", buf[4:8])
            if riff_sz != len(buf) - 8:
                raise ValueError(f"asset {aid}: RIFF size mismatch")
            avih = strh = None
            movi_frames = 0
            movi_bytes = 0
            first_byte = None

            def walk(pos: int, end: int) -> None:
                nonlocal avih, strh, movi_frames, movi_bytes, first_byte
                while pos + 8 <= end:
                    fourcc = buf[pos : pos + 4]
                    (sz,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                    body_start = pos + 8
                    body_end = body_start + sz
                    if body_end > end:
                        raise ValueError(f"asset {aid}: chunk overruns parent")
                    if fourcc == b"LIST":
                        walk(body_start + 4, body_end)  # skip the list kind
                    elif fourcc == b"avih":
                        vals = struct.unpack("<14I", buf[body_start : body_start + 56])
                        avih = {"n": vals[4], "w": vals[8], "h": vals[9]}
                    elif fourcc == b"strh":
                        if buf[body_start : body_start + 4] == b"vids":
                            vals = struct.unpack(
                                "<I2H8I", buf[body_start + 8 : body_start + 48]
                            )
                            strh = {"scale": vals[4], "rate": vals[5], "len": vals[7]}
                    elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                        movi_frames += 1
                        movi_bytes += sz
                        if first_byte is None and sz:
                            first_byte = buf[body_start]
                    pos = body_end + (sz & 1)  # RIFF even-byte padding

            walk(12, 8 + riff_sz)
            if avih is None or strh is None:
                raise ValueError(f"asset {aid}: missing avih/strh header")
            if not (avih["n"] == strh["len"] == movi_frames):
                raise ValueError(
                    f"asset {aid}: frame-count mismatch (avih {avih['n']}, "
                    f"strh {strh['len']}, movi walk {movi_frames})"
                )
            fps = float(strh["rate"]) / strh["scale"]
            duration = float(movi_frames * strh["scale"]) / strh["rate"]
            return (
                avih["w"], avih["h"], movi_frames, fps, duration,
                movi_bytes, first_byte,
            )

        for pdf in it:
            cols = (
                "asset_id", "width", "height", "n_frames", "fps",
                "duration_s", "movi_bytes", "first_frame_byte",
            )
            rows = {k: [] for k in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, n, fps, dur, mb, fb = parse_one(aid, bytes(payload))
                for k, v in zip(cols, (aid, w, h, n, fps, dur, mb, fb)):
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5m: REAL uncompressed-DIB AVI frame decode (round 12) --------------------


def synthesize_dib_avi_assets(docs: DataFrame) -> DataFrame:
    """RIFF-AVI payloads whose frames are UNCOMPRESSED bottom-up
    24-bpp BI_RGB DIBs (round 12 — the video-codec stub retired for
    the uncompressed case): same genuine container grammar as
    ``synthesize_avi_assets`` (hdrl/avih + vids strh/strf + movi),
    but fourcc 'DIB ', strf biCompression=0, and each ``00db`` chunk
    body is exactly the frame's pixel rows — stride-padded to 4 bytes,
    bottom-up, BGR — so a decoder must handle the real DIB layout, not
    just count chunks. Widths are chosen so 2 of 3 classes carry real
    stride padding (w·3 % 4 ≠ 0).

    Closed forms shared with the oracle:
        width  = 6 + (id % 3) * 5      # 6, 11, 16 → strides 20, 36, 48
        height = 5 + (id % 2) * 4      # 5, 9
        (rate, scale) = (24, 1) if id even else (30000, 1001)
        n_frames = 3 + id % 4
        frame f, pixel (x, y):  B = (id·31 + x·7 + y·13 + f·29) % 256
                                G = (id·17 + x·5 + y·11 + f·23) % 256
                                R = (id·23 + x·3 + y·19 + f·37) % 256
    """
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd

        def chunk(fourcc: bytes, body: bytes) -> bytes:
            pad = b"\x00" if len(body) % 2 else b""
            return fourcc + struct.pack("<I", len(body)) + body + pad

        def lst(kind: bytes, body: bytes) -> bytes:
            return chunk(b"LIST", kind + body)

        def encode_one(d: int) -> bytes:
            w, h = 6 + (d % 3) * 5, 5 + (d % 2) * 4
            rate, scale = (24, 1) if d % 2 == 0 else (30000, 1001)
            n = 3 + d % 4
            stride = (w * 3 + 3) // 4 * 4
            avih = struct.pack(
                "<14I",
                int(1_000_000 * scale // rate), 0, 0, 0x10, n, 0, 1, 0, w, h,
                0, 0, 0, 0,
            )
            strh = (
                b"vids" + b"DIB " + struct.pack("<I2H8I", 0, 0, 0, 0, scale,
                                                rate, 0, n, 0, 0, 0)
                + struct.pack("<4h", 0, 0, w, h)
            )
            strf = struct.pack(
                "<I2i2H6I", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
            )
            hdrl = lst(
                b"hdrl",
                chunk(b"avih", avih)
                + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
            )
            xs = np.arange(w, dtype=np.int64)
            ys = np.arange(h, dtype=np.int64)

            def frame_body(f: int) -> bytes:
                # top-down image computed vectorized, then flipped to the
                # DIB's bottom-up row order with stride padding
                b_ = (d * 31 + xs[None, :] * 7 + ys[:, None] * 13 + f * 29) % 256
                g_ = (d * 17 + xs[None, :] * 5 + ys[:, None] * 11 + f * 23) % 256
                r_ = (d * 23 + xs[None, :] * 3 + ys[:, None] * 19 + f * 37) % 256
                img = np.stack([b_, g_, r_], axis=2).astype(np.uint8)  # BGR
                rows = np.zeros((h, stride), dtype=np.uint8)
                rows[:, : w * 3] = img.reshape(h, w * 3)
                return rows[::-1].tobytes()  # bottom-up

            frames = b"".join(chunk(b"00db", frame_body(f)) for f in range(n))
            movi = lst(b"movi", frames)
            riff_body = b"AVI " + hdrl + movi
            return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def decode_avi_frame_features(assets: DataFrame) -> DataFrame:
    """REAL video FRAME-PIXEL decode for the uncompressed case (round
    12): walk the RIFF container exactly like ``parse_avi_features``
    (magic/size validation, padded tree walk, header extraction), read
    biCompression from ``strf``, and for BI_RGB (0) decode EVERY
    ``00db`` frame's pixels through the BMP row kernel — stride
    un-pad, bottom-up flip, BGR split — emitting one row per frame
    with exact per-channel means (integer sums exact in double →
    bit-identical across engines) and the top-left pixel. A non-zero
    biCompression raises ``NotImplementedError`` — the documented
    codec boundary, now narrowed to COMPRESSED codecs only; a frame
    chunk whose size disagrees with h·stride raises ``ValueError``
    (truncation/desync, the container walk's posture).

    Scale note: per-asset work is O(total pixels) and payload rows
    never shuffle (mapInPandas preserves input partitioning) — the
    same scale-out contract as every codec kernel in this module."""
    out_schema = (
        "asset_id bigint, frame_idx int, width int, height int, "
        "mean_r double, mean_g double, mean_b double, "
        "topleft_r int, topleft_g int, topleft_b int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd

        def parse_one(aid, buf: bytes):
            if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
                raise ValueError(f"asset {aid}: not a RIFF AVI")
            (riff_sz,) = struct.unpack("<I", buf[4:8])
            if riff_sz != len(buf) - 8:
                raise ValueError(f"asset {aid}: RIFF size mismatch")
            dims = None
            compression = None
            frames: list[tuple[int, int]] = []  # (body_start, size)

            def walk(pos: int, end: int) -> None:
                nonlocal dims, compression
                while pos + 8 <= end:
                    fourcc = buf[pos : pos + 4]
                    (sz,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                    body_start = pos + 8
                    body_end = body_start + sz
                    if body_end > end:
                        raise ValueError(f"asset {aid}: chunk overruns parent")
                    if fourcc == b"LIST":
                        walk(body_start + 4, body_end)
                    elif fourcc == b"strf":
                        hdr_sz, w, h, planes, bpp, comp = struct.unpack(
                            "<I2i2HI", buf[body_start : body_start + 20]
                        )
                        if bpp != 24 or h <= 0:
                            raise ValueError(
                                f"asset {aid}: only bottom-up 24-bpp DIB "
                                "streams supported"
                            )
                        dims = (w, h)
                        compression = comp
                    elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                        frames.append((body_start, sz))
                    pos = body_end + (sz & 1)

            walk(12, 8 + riff_sz)
            if dims is None:
                raise ValueError(f"asset {aid}: missing vids strf header")
            if compression != 0:
                raise NotImplementedError(
                    f"asset {aid}: compressed video codec "
                    f"(biCompression={compression}) is not available in "
                    "this environment; only BI_RGB frames decode"
                )
            w, h = dims
            stride = (w * 3 + 3) // 4 * 4
            out = []
            for f, (start, sz) in enumerate(frames):
                if sz != stride * h:
                    raise ValueError(
                        f"asset {aid} frame {f}: DIB size mismatch "
                        f"(chunk {sz}, expected {stride * h})"
                    )
                rows = np.frombuffer(
                    buf[start : start + sz], dtype=np.uint8
                ).reshape(h, stride)
                img = rows[::-1, : w * 3].reshape(h, w, 3)  # top-down BGR
                npx = w * h
                sums = img.astype(np.int64).sum(axis=(0, 1))  # B, G, R
                out.append(
                    (
                        f, w, h,
                        float(sums[2]) / npx, float(sums[1]) / npx,
                        float(sums[0]) / npx,
                        int(img[0, 0, 2]), int(img[0, 0, 1]),
                        int(img[0, 0, 0]),
                    )
                )
            return out

        cols = (
            "asset_id", "frame_idx", "width", "height",
            "mean_r", "mean_g", "mean_b",
            "topleft_r", "topleft_g", "topleft_b",
        )
        for pdf in it:
            rows = {k: [] for k in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for rec in parse_one(aid, bytes(payload)):
                    for k, v in zip(cols, (aid, *rec)):
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5i: REAL MP3 frame-header walk (round 11) --------------------------------

#: MPEG-1 Layer III bitrate table (kbps), index 1..14 (0 = free, 15 = bad).
_MP3_BITRATES = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
#: MPEG-1 sample rates by 2-bit index (3 = reserved).
_MP3_RATES = (44100, 48000, 32000)


def synthesize_mp3_assets(docs: DataFrame) -> DataFrame:
    """REAL MPEG-1 Layer III frame sequences, one per document — the
    AUDIO twin of the AVI split: an audio corpus pipeline computes
    duration, bitrate histograms, and chunk offsets from FRAME HEADERS
    without ever running a DCT, so the header walk is real and only
    the sample decode stays behind the documented stub. Each payload
    is a genuine ID3v2.4 tag (10-byte header with a SYNCSAFE size —
    the classic parsing trap — plus that many junk bytes) followed by
    ``n_frames`` valid frames: 4-byte header (0xFFFB sync/MPEG-1/
    Layer-III/no-CRC, a VBR bitrate index, the asset's sample-rate
    index, a padding bit) and ``144000·kbps/rate // 1 + pad − 4``
    deterministic filler bytes, exactly the length the header
    declares. Closed forms shared with the oracle:

        samplerate idx = id % 3  (44100 / 48000 / 32000)
        n_frames       = 20 + id % 30
        frame i: bitrate idx = 1 + ((id*7 + i*13) % 14)   # VBR
                 padding     = (id + i) % 2
                 size        = 144000·kbps // rate + padding
    """
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        bitrates = _MP3_BITRATES
        rates = _MP3_RATES

        def encode_one(d: int) -> bytes:
            sr_idx = d % 3
            sr = rates[sr_idx]
            n = 20 + d % 30
            tag_body = 37 + d % 64
            out = bytearray(b"ID3\x04\x00\x00")
            # syncsafe 28-bit size: 7 bits per byte, high bit clear
            out += bytes(
                [(tag_body >> 21) & 0x7F, (tag_body >> 14) & 0x7F,
                 (tag_body >> 7) & 0x7F, tag_body & 0x7F]
            )
            out += (
                ((np.arange(tag_body, dtype=np.int64) + d) % 128)
                .astype(np.uint8)
                .tobytes()
            )
            for i in range(n):
                br_idx = 1 + ((d * 7 + i * 13) % 14)
                pad = (d + i) % 2
                kbps = bitrates[br_idx - 1]
                size = 144000 * kbps // sr + pad
                hdr = bytes(
                    [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2) | (pad << 1),
                     0xC0]
                )
                out += hdr + (
                    ((np.arange(size - 4, dtype=np.int64) + d * 5 + i * 11) % 256)
                    .astype(np.uint8)
                    .tobytes()
                )
            return bytes(out)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def parse_mp3_features(assets: DataFrame) -> DataFrame:
    """REAL MP3 frame-header walk via ``mapInPandas`` (stdlib only): an
    optional ID3v2 tag is skipped by its SYNCSAFE size, then every
    frame header is validated (11-bit sync, MPEG-1, Layer III;
    bitrate index 0/15 and sample-rate index 3 raise — they are
    free/reserved) and the walk advances by the length the header
    declares (144000·kbps // rate + padding), so a single corrupt or
    truncated frame desynchronizes loudly instead of mis-counting.
    The sample payloads are never decoded (the documented codec
    stub); everything a corpus pipeline budgets on — duration,
    VBR average bitrate, padding census — comes from the headers.
    Output: (asset_id, n_frames, samplerate, duration_s,
    total_bytes, avg_bitrate_kbps, n_padded); duration_s =
    n_frames·1152/samplerate and avg_bitrate are exact integer-
    operand divisions, bit-identical across engines."""
    out_schema = (
        "asset_id bigint, n_frames int, samplerate int, duration_s double, "
        "total_bytes bigint, avg_bitrate_kbps double, n_padded int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        bitrates = _MP3_BITRATES
        rates = _MP3_RATES

        def parse_one(aid, buf: bytes):
            pos = 0
            if buf[:3] == b"ID3":
                if len(buf) < 10 or any(b & 0x80 for b in buf[6:10]):
                    raise ValueError(f"asset {aid}: bad ID3v2 syncsafe size")
                pos = 10 + (
                    (buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7) | buf[9]
                )
            n = total = kbps_sum = padded = 0
            sr = None
            while pos < len(buf):
                if pos + 4 > len(buf):
                    raise ValueError(f"asset {aid}: truncated header at {pos}")
                b0, b1, b2 = buf[pos], buf[pos + 1], buf[pos + 2]
                if b0 != 0xFF or (b1 & 0xFE) != 0xFA:
                    raise ValueError(
                        f"asset {aid}: lost frame sync at {pos} "
                        f"(0x{b0:02x}{b1:02x})"
                    )
                if (b1 & 0x18) != 0x18 or (b1 & 0x06) != 0x02:
                    raise ValueError(f"asset {aid}: not MPEG-1 Layer III at {pos}")
                br_idx, sr_idx, pad = b2 >> 4, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1
                if br_idx in (0, 15):
                    raise ValueError(f"asset {aid}: free/bad bitrate index at {pos}")
                if sr_idx == 3:
                    raise ValueError(f"asset {aid}: reserved sample rate at {pos}")
                if sr is None:
                    sr = rates[sr_idx]
                elif sr != rates[sr_idx]:
                    raise ValueError(f"asset {aid}: sample rate changed mid-stream")
                kbps = bitrates[br_idx - 1]
                size = 144000 * kbps // sr + pad
                if pos + size > len(buf):
                    raise ValueError(f"asset {aid}: truncated frame at {pos}")
                n += 1
                total += size
                kbps_sum += kbps
                padded += pad
                pos += size
            if n == 0 or sr is None:
                raise ValueError(f"asset {aid}: no MPEG frames")
            return (
                n, sr, float(n * 1152) / sr, total, float(kbps_sum) / n, padded
            )

        for pdf in it:
            cols = (
                "asset_id", "n_frames", "samplerate", "duration_s",
                "total_bytes", "avg_bitrate_kbps", "n_padded",
            )
            rows = {k: [] for k in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n, sr, dur, total, avg, padded = parse_one(aid, bytes(payload))
                for k, v in zip(cols, (aid, n, sr, dur, total, avg, padded)):
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


def parse_mp3_sideinfo(assets: DataFrame) -> DataFrame:
    """REAL MPEG-1 Layer III SIDE-INFORMATION decode + BIT-RESERVOIR
    accounting (round 14 — the boundary moves again): everything
    STRUCTURAL in a Layer III frame is now decoded for real; only the
    Huffman-coded spectrum (ISO 11172-3 Tables 3-B.7) and the
    synthesis filterbank window (Table 3-B.3) remain behind the
    documented stub, and both are tabulated spec data, not machinery.

    Per frame (mono, so 17 side-info bytes right after the 4-byte
    header — no CRC in the fixture stream), the full 2.4.1.7 field
    walk: main_data_begin (9 bits — the bit-reservoir back-pointer),
    private_bits (5), scfsi (4), then per granule part2_3_length (12),
    big_values (9), global_gain (8), scalefac_compress (4),
    window_switching_flag (1), and the 22-bit branch (block_type /
    mixed_block_flag / 2×table_select / 3×subblock_gain when
    switching; 3×table_select / region0_count / region1_count
    otherwise — both arms are exactly 22 bits, which is why mono
    side-info is a fixed 136-bit layout), closing with preflag /
    scalefac_scale / count1table_select.

    The RESERVOIR check is the real decoder obligation this surfaces:
    frame i's main data may begin up to main_data_begin bytes BEFORE
    its own side info, but only within bytes donated by previous
    frames — a frame violates when main_data_begin exceeds the
    cumulative donated capacity sum_{k<i}(size_k − header − sideinfo)
    (and frame 0 must carry 0). Decoders that skip this check crash on
    the first cut stream; corpus pipelines count violations to triage
    re-encodes. Output per asset: frame count plus exact integer
    censuses (sums of main_data_begin / part2_3_length / big_values /
    global_gain, window-switching, short-block, reserved-block-type,
    and reservoir-violation counts) — order-free integers, so the
    closed-form fixture oracle replays every field from the same fixed
    bit offsets. (Reference intent: app.py's pipeline treats media as
    opaque; this is the Spark-first audio-metadata leg at 100 TB —
    per-asset Python in mapInPandas, embarrassingly parallel.)"""
    out_schema = (
        "asset_id bigint, n_frames int, sum_main_data_begin bigint, "
        "n_reservoir_violations int, sum_part23 bigint, "
        "sum_big_values bigint, sum_global_gain bigint, "
        "n_window_switching int, n_short_blocks int, "
        "n_reserved_block_type int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        bitrates = _MP3_BITRATES
        rates = _MP3_RATES

        def parse_one(aid, buf: bytes):
            pos = 0
            if buf[:3] == b"ID3":
                if len(buf) < 10 or any(b & 0x80 for b in buf[6:10]):
                    raise ValueError(f"asset {aid}: bad ID3v2 syncsafe size")
                pos = 10 + (
                    (buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7) | buf[9]
                )
            n = s_mdb = viol = s_p23 = s_bv = s_gg = n_wsf = n_short = 0
            n_resv = 0
            donated = 0  # cumulative reservoir capacity from past frames
            while pos < len(buf):
                if pos + 4 > len(buf):
                    raise ValueError(f"asset {aid}: truncated header at {pos}")
                b0, b1, b2, b3 = buf[pos : pos + 4]
                if b0 != 0xFF or (b1 & 0xFE) != 0xFA:
                    raise ValueError(f"asset {aid}: lost frame sync at {pos}")
                if not (b1 & 0x01):
                    raise ValueError(f"asset {aid}: CRC frames unsupported")
                br_idx, sr_idx, pad = b2 >> 4, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1
                if br_idx in (0, 15) or sr_idx == 3:
                    raise ValueError(f"asset {aid}: bad indices at {pos}")
                if (b3 >> 6) != 3:
                    raise ValueError(f"asset {aid}: only single_channel")
                size = 144000 * bitrates[br_idx - 1] // rates[sr_idx] + pad
                if pos + size > len(buf) or size < 4 + 17:
                    raise ValueError(f"asset {aid}: truncated frame at {pos}")
                r = _BitReader(buf[pos + 4 : pos + 4 + 17])
                mdb = r.get(9)
                r.get(5)  # private_bits (mono)
                r.get(4)  # scfsi
                for _g in range(2):
                    s_p23 += r.get(12)
                    s_bv += r.get(9)
                    s_gg += r.get(8)
                    r.get(4)  # scalefac_compress
                    wsf = r.get(1)
                    if wsf:
                        n_wsf += 1
                        block_type = r.get(2)
                        if block_type == 2:
                            n_short += 1
                        elif block_type == 0:
                            # reserved when switching (2.4.1.7) — a
                            # census, not an abort: the walk stays
                            # structural over arbitrary main data
                            n_resv += 1
                        r.get(1)  # mixed_block_flag
                        r.get(10)  # 2 × table_select
                        r.get(9)  # 3 × subblock_gain
                    else:
                        r.get(15)  # 3 × table_select
                        r.get(4)  # region0_count
                        r.get(3)  # region1_count
                    r.get(3)  # preflag, scalefac_scale, count1table_select
                s_mdb += mdb
                if mdb > donated:
                    viol += 1
                donated += size - 4 - 17
                n += 1
                pos += size
            if n == 0:
                raise ValueError(f"asset {aid}: no MPEG frames")
            return (n, s_mdb, viol, s_p23, s_bv, s_gg, n_wsf, n_short, n_resv)

        for pdf in it:
            cols = (
                "asset_id", "n_frames", "sum_main_data_begin",
                "n_reservoir_violations", "sum_part23", "sum_big_values",
                "sum_global_gain", "n_window_switching", "n_short_blocks",
                "n_reserved_block_type",
            )
            rows = {k: [] for k in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                vals = parse_one(aid, bytes(payload))
                for k, v in zip(cols, (aid, *vals)):
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5o: REAL MJPEG (compressed-video) frame decode (round 13) ----------------


def synthesize_mjpeg_avi_assets(docs: DataFrame) -> DataFrame:
    """REAL MOTION-JPEG AVIs, one per document — the first COMPRESSED
    video codec to decode for real (round 13): same genuine RIFF
    grammar as ``synthesize_dib_avi_assets`` (hdrl/avih + vids
    strh/strf + movi), but fourcc 'MJPG', strf biCompression = 'MJPG',
    and each ``00dc`` chunk body is a COMPLETE baseline JPEG built by
    the same DC-only encoder as ``synthesize_jpeg_assets`` — real
    Huffman entropy coding, byte stuffing, per-frame DC prediction —
    with the frame index folded into the closed form:

        width  = 16 + (id % 3) * 8,  height = 8 + (id % 4) * 8
        n_frames = 2 + id % 3
        qDC(f, bx, by) = (id·7 + bx·5 + by·3 + f·11) % 160 − 80
        pixel(frame f, block bx,by) = 128 + qDC   (DC-only ⇒ uniform)

    MJPEG is exactly what its name says — every frame an independent
    JPEG, no inter-frame prediction — which is why the existing T.81
    kernel retires this codec with zero new decode machinery; the
    remaining video stub is the INTER-FRAME codec family (H.26x/VPx/
    AV1: motion compensation + arithmetic/entropy coders needing
    reference libraries)."""
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def chunk(fourcc: bytes, body: bytes) -> bytes:
            pad = b"\x00" if len(body) % 2 else b""
            return fourcc + struct.pack("<I", len(body)) + body + pad

        def lst(kind: bytes, body: bytes) -> bytes:
            return chunk(b"LIST", kind + body)

        def encode_jpeg(d: int, f: int, w: int, h: int) -> bytes:
            nbx, nby = w // 8, h // 8
            q = bytes([8] + [16] * 63)
            out = bytearray(b"\xff\xd8")
            out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
            out += (
                b"\xff\xc0"
                + struct.pack(">HBHHB", 11, 8, h, w, 1)
                + bytes([1, 0x11, 0])
            )
            bits_dc = bytearray(16)
            bits_dc[3] = 9
            out += (
                b"\xff\xc4"
                + struct.pack(">H", 2 + 1 + 16 + 9)
                + b"\x00"
                + bytes(bits_dc)
                + bytes(range(9))
            )
            bits_ac = bytearray(16)
            bits_ac[0] = 1
            out += (
                b"\xff\xc4"
                + struct.pack(">H", 2 + 1 + 16 + 1)
                + b"\x10"
                + bytes(bits_ac)
                + bytes([0x00])
            )
            out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
            data = bytearray()
            bitbuf = nbits = 0

            def put(code: int, ln: int) -> None:
                nonlocal bitbuf, nbits
                bitbuf = (bitbuf << ln) | code
                nbits += ln
                while nbits >= 8:
                    byte = (bitbuf >> (nbits - 8)) & 0xFF
                    data.append(byte)
                    if byte == 0xFF:
                        data.append(0x00)
                    nbits -= 8
                    bitbuf &= (1 << nbits) - 1

            prev = 0
            for by in range(nby):
                for bx in range(nbx):
                    dc = (d * 7 + bx * 5 + by * 3 + f * 11) % 160 - 80
                    diff = dc - prev
                    prev = dc
                    s = diff.bit_length()
                    put(s, 4)
                    if s:
                        amp = diff if diff > 0 else diff + (1 << s) - 1
                        put(amp & ((1 << s) - 1), s)
                    put(0, 1)  # EOB
            if nbits:
                pad = 8 - nbits
                byte = ((bitbuf << pad) | ((1 << pad) - 1)) & 0xFF
                data.append(byte)
                if byte == 0xFF:
                    data.append(0x00)
            out += data + b"\xff\xd9"
            return bytes(out)

        def encode_one(d: int) -> bytes:
            w, h = 16 + (d % 3) * 8, 8 + (d % 4) * 8
            n = 2 + d % 3
            avih = struct.pack(
                "<14I", 41666, 0, 0, 0x10, n, 0, 1, 0, w, h, 0, 0, 0, 0
            )
            strh = (
                b"vids" + b"MJPG" + struct.pack("<I2H8I", 0, 0, 0, 0, 1,
                                                24, 0, n, 0, 0, 0)
                + struct.pack("<4h", 0, 0, w, h)
            )
            strf = struct.pack(
                "<I2i2H6I", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0
            )
            hdrl = lst(
                b"hdrl",
                chunk(b"avih", avih)
                + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
            )
            frames = b"".join(
                chunk(b"00dc", encode_jpeg(d, f, w, h)) for f in range(n)
            )
            movi = lst(b"movi", frames)
            riff_body = b"AVI " + hdrl + movi
            return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def decode_mjpeg_frame_features(assets: DataFrame) -> DataFrame:
    """REAL COMPRESSED-video frame decode (round 13 — the first member
    of the compressed-codec family retired from the stub): walk the
    RIFF container, read strf.biCompression, and for 'MJPG' decode
    EVERY ``00dc`` chunk as a complete baseline JPEG through the SAME
    module-level T.81 kernel the still-image leg uses
    (``baseline_jpeg_pixels`` — Huffman tables from DHT, AC run-length
    loop, dezigzag, dequantize, full 2-D IDCT). One output row per
    frame: (asset_id, frame_idx, width, height, mean_lum,
    topleft_lum), means exact integer-sum / count. BI_RGB payloads are
    routed to ``decode_avi_frame_features``'s path by contract
    (raise); any OTHER biCompression raises NotImplementedError — the
    remaining honest boundary is inter-frame codecs (motion
    compensation + arithmetic coding need their reference libraries).
    Truncated or desynced chunks raise loudly like every container
    walk in this module."""
    out_schema = (
        "asset_id bigint, frame_idx int, width int, height int, "
        "mean_lum double, topleft_lum int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def parse_one(aid, buf: bytes):
            if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
                raise ValueError(f"asset {aid}: not a RIFF/AVI")
            (riff_len,) = struct.unpack("<I", buf[4:8])
            if 8 + riff_len > len(buf):
                raise ValueError(f"asset {aid}: truncated RIFF body")
            frames: list[bytes] = []
            compression = None

            def walk(pos: int, end: int) -> None:
                nonlocal compression
                while pos + 8 <= end:
                    fourcc = buf[pos : pos + 4]
                    (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                    body_end = pos + 8 + ln
                    if body_end > end:
                        raise ValueError(
                            f"asset {aid}: chunk {fourcc!r} overruns parent"
                        )
                    if fourcc == b"LIST":
                        walk(pos + 12, body_end)
                    elif fourcc == b"strf":
                        compression = struct.unpack(
                            "<I", buf[pos + 8 + 16 : pos + 8 + 20]
                        )[0]
                    elif fourcc == b"00dc":
                        frames.append(buf[pos + 8 : body_end])
                    pos = body_end + (ln & 1)

            walk(12, 8 + riff_len)
            if compression is None:
                raise ValueError(f"asset {aid}: no strf header")
            if compression == 0:
                raise ValueError(
                    f"asset {aid}: BI_RGB payload — use "
                    "decode_avi_frame_features for the uncompressed path"
                )
            if compression != 0x47504A4D:  # 'MJPG'
                raise NotImplementedError(
                    f"asset {aid}: biCompression 0x{compression:08x} — "
                    "inter-frame codecs need their reference libraries"
                )
            if not frames:
                raise ValueError(f"asset {aid}: MJPG stream with no 00dc frames")
            out = []
            for f, jpg in enumerate(frames):
                w, h, px = baseline_jpeg_pixels(aid, jpg)
                out.append(
                    (f, w, h, float(px.sum()) / (w * h), int(px[0, 0]))
                )
            return out

        for pdf in it:
            cols = (
                "asset_id", "frame_idx", "width", "height",
                "mean_lum", "topleft_lum",
            )
            rows = {k: [] for k in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for f, w, h, mean, tl in parse_one(aid, bytes(payload)):
                    for k, v in zip(cols, (aid, f, w, h, mean, tl)):
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5p: REAL INTER-FRAME video decode, Microsoft RLE8 (round 13) -------------


def synthesize_rle8_avi_assets(docs: DataFrame) -> DataFrame:
    """REAL BI_RLE8 AVIs, one per document — the first INTER-FRAME
    video payloads in the proof family: Microsoft RLE8 (biCompression
    = 1, the documented Windows codec) encodes runs of 8-bit palette
    indices with escape codes, and its DELTA escape (00 02 dx dy)
    moves the raster position WITHOUT writing — pixels it skips are
    CARRIED FROM THE PREVIOUS FRAME, so a correct decoder must keep
    mutable frame-buffer state across frames. Frame 0 paints every
    (bottom-up) row with a full-width run; each later frame f delta-
    skips straight to ONE row and repaints only it. The strf carries a
    real 256-entry identity-grayscale RGBQUAD palette the decoder must
    actually read.

    Closed forms shared with the oracle:
        width  = 8 + (id % 3) * 4,  height = 6 + (id % 2) * 3
        n_frames = 3 + id % 3
        rb(f)   = (id + f·5) % height      # the row frame f repaints
        v0(y)   = (id·13 + y·7) % 256      # frame-0 row values
        u(f)    = (id·11 + f·17) % 256     # repaint values
        pixel(row y, frame F) = u(f*) for the LAST f* ≤ F repainting y,
                                else v0(y)  — the carry-over law
    """
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def chunk(fourcc: bytes, body: bytes) -> bytes:
            pad = b"\x00" if len(body) % 2 else b""
            return fourcc + struct.pack("<I", len(body)) + body + pad

        def lst(kind: bytes, body: bytes) -> bytes:
            return chunk(b"LIST", kind + body)

        def encode_one(d: int) -> bytes:
            w, h = 8 + (d % 3) * 4, 6 + (d % 2) * 3
            n = 3 + d % 3
            avih = struct.pack(
                "<14I", 41666, 0, 0, 0x10, n, 0, 1, 0, w, h, 0, 0, 0, 0
            )
            strh = (
                b"vids" + b"MRLE" + struct.pack("<I2H8I", 0, 0, 0, 0, 1,
                                                24, 0, n, 0, 0, 0)
                + struct.pack("<4h", 0, 0, w, h)
            )
            palette = b"".join(
                bytes([i, i, i, 0]) for i in range(256)
            )  # RGBQUAD: B G R reserved — identity grayscale
            strf = struct.pack(
                "<I2i2H6I", 40, w, h, 1, 8, 1, w * h, 0, 0, 256, 0
            ) + palette
            hdrl = lst(
                b"hdrl",
                chunk(b"avih", avih)
                + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
            )

            def frame_body(f: int) -> bytes:
                body = bytearray()
                if f == 0:
                    for y in range(h):  # bottom-up rows
                        body += bytes([w, (d * 13 + y * 7) % 256])
                        if y < h - 1:
                            body += b"\x00\x00"  # EOL
                else:
                    rb = (d + f * 5) % h
                    if rb:
                        body += bytes([0x00, 0x02, 0, rb])  # DELTA up rb rows
                    body += bytes([w, (d * 11 + f * 17) % 256])
                body += b"\x00\x01"  # EOS
                return bytes(body)

            frames = b"".join(chunk(b"00dc", frame_body(f)) for f in range(n))
            movi = lst(b"movi", frames)
            riff_body = b"AVI " + hdrl + movi
            return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def decode_rle8_frame_features(assets: DataFrame) -> DataFrame:
    """REAL INTER-FRAME video decode (round 13 — Microsoft RLE8, the
    delta-escape half of the video-codec family): walk the RIFF
    container, require biCompression = 1 / 8 bpp, read the REAL
    RGBQUAD palette, and decode every ``00dc`` chunk as BI_RLE8 —
    encoded runs, absolute mode (00 n≥3 + word-padded raw indices),
    EOL (00 00), EOS (00 01), and the DELTA escape (00 02 dx dy) that
    skips raster positions so they CARRY the previous frame's pixels:
    the frame buffer is mutable cross-frame state, which is what makes
    this the first genuinely inter-frame decode in the family (MJPEG
    frames are independent; RLE8 deltas are not). Grayness comes from
    the palette the file actually carries ((R+G+B)//3 per index), not
    an assumed identity. Output one row per frame: (asset_id,
    frame_idx, width, height, mean_gray, topleft_gray) — exact integer
    sums / count. Out-of-bounds runs, bad escapes, truncation, or a
    non-RLE8 biCompression raise loudly; the remaining video stub
    after this round is the motion-compensated family (H.26x/VPx/AV1)."""
    out_schema = (
        "asset_id bigint, frame_idx int, width int, height int, "
        "mean_gray double, topleft_gray int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd

        def parse_one(aid, buf: bytes):
            if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
                raise ValueError(f"asset {aid}: not a RIFF/AVI")
            (riff_len,) = struct.unpack("<I", buf[4:8])
            if 8 + riff_len > len(buf):
                raise ValueError(f"asset {aid}: truncated RIFF body")
            frames: list[bytes] = []
            strf_body = None

            def walk(pos: int, end: int) -> None:
                nonlocal strf_body
                while pos + 8 <= end:
                    fourcc = buf[pos : pos + 4]
                    (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                    body_end = pos + 8 + ln
                    if body_end > end:
                        raise ValueError(
                            f"asset {aid}: chunk {fourcc!r} overruns parent"
                        )
                    if fourcc == b"LIST":
                        walk(pos + 12, body_end)
                    elif fourcc == b"strf":
                        strf_body = buf[pos + 8 : body_end]
                    elif fourcc == b"00dc":
                        frames.append(buf[pos + 8 : body_end])
                    pos = body_end + (ln & 1)

            walk(12, 8 + riff_len)
            if strf_body is None:
                raise ValueError(f"asset {aid}: no strf header")
            w, h = struct.unpack("<2i", strf_body[4:12])
            bpp, compression = (
                struct.unpack("<H", strf_body[14:16])[0],
                struct.unpack("<I", strf_body[16:20])[0],
            )
            if compression != 1 or bpp != 8:
                raise NotImplementedError(
                    f"asset {aid}: biCompression {compression}/{bpp}bpp — "
                    "this path decodes BI_RLE8 only"
                )
            pal_raw = strf_body[40:]
            n_colors = len(pal_raw) // 4
            if n_colors < 256:
                raise ValueError(f"asset {aid}: palette truncated ({n_colors})")
            gray = np.array(
                [
                    (pal_raw[i * 4] + pal_raw[i * 4 + 1] + pal_raw[i * 4 + 2]) // 3
                    for i in range(256)
                ],
                dtype=np.int64,
            )
            if not frames:
                raise ValueError(f"asset {aid}: RLE8 stream with no 00dc frames")
            buf2 = np.zeros((h, w), dtype=np.int64)  # bottom-up rows
            out = []
            for fi, fb in enumerate(frames):
                x = y = 0
                p = 0
                done = False
                while p < len(fb):
                    b0 = fb[p]
                    if b0 > 0:
                        idx = fb[p + 1]
                        if y >= h or x + b0 > w:
                            raise ValueError(
                                f"asset {aid}: run overflows row at frame {fi}"
                            )
                        buf2[y, x : x + b0] = idx
                        x += b0
                        p += 2
                    else:
                        esc = fb[p + 1]
                        if esc == 0:  # EOL
                            x, y = 0, y + 1
                            p += 2
                        elif esc == 1:  # EOS
                            done = True
                            p += 2
                            break
                        elif esc == 2:  # DELTA — carry skipped pixels
                            x += fb[p + 2]
                            y += fb[p + 3]
                            p += 4
                        else:  # absolute mode
                            n = esc
                            raw = fb[p + 2 : p + 2 + n]
                            if y >= h or x + n > w or len(raw) < n:
                                raise ValueError(
                                    f"asset {aid}: absolute run overflows "
                                    f"at frame {fi}"
                                )
                            buf2[y, x : x + n] = np.frombuffer(
                                raw, dtype=np.uint8
                            ).astype(np.int64)
                            x += n
                            p += 2 + n + (n & 1)  # word-aligned
                    if y > h or x > w:
                        raise ValueError(
                            f"asset {aid}: raster out of bounds at frame {fi}"
                        )
                if not done:
                    raise ValueError(f"asset {aid}: frame {fi} missing EOS")
                g = gray[buf2]
                out.append(
                    (
                        fi, w, h,
                        float(g.sum()) / (w * h),
                        int(g[h - 1, 0]),  # image top-left = bottom-up row h-1
                    )
                )
            return out

        for pdf in it:
            cols = (
                "asset_id", "frame_idx", "width", "height",
                "mean_gray", "topleft_gray",
            )
            rows = {k: [] for k in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for fi, w, h, mean, tl in parse_one(aid, bytes(payload)):
                    for k, v in zip(cols, (aid, fi, w, h, mean, tl)):
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5n: REAL MPEG-1 Layer II subband-sample decode (round 13) ----------------

#: MPEG-1 Layer II bitrate table (kbps), index 1..14 (0 = free, 15 = bad).
_MP2_BITRATES = (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)

#: Low-rate bit-allocation tables (ISO 11172-3 Tables 3-B.2c / 3-B.2d):
#: nbal = 4 bits for every subband, sblimit 8 (C) / 12 (D), and the
#: quantization classes are the natural ladder — allocation index i ≥ 1
#: selects steps = (3, 5, 9, 15, 31, 63, ..., 32767)[i-1]. The
#: high-rate tables 3-B.2a/b (56–192 kbps/ch) carry per-subband
#: irregular class lists — spec TABLE DATA this offline build does not
#: ship; decode of those configurations raises, see decode_image.
_MP2_STEPS_CD = (3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767)
#: grouped classes pack 3 consecutive samples into one base-steps code
_MP2_GROUP_BITS = {3: 5, 5: 7, 9: 10}


def _mp2_class(alloc_idx: int) -> tuple[int, int, bool]:
    """(steps, code bits, grouped) for a table-C/D allocation index."""
    steps = _MP2_STEPS_CD[alloc_idx - 1]
    if steps in _MP2_GROUP_BITS:
        return steps, _MP2_GROUP_BITS[steps], True
    return steps, (steps + 1).bit_length() - 1, False


def _mp2_scalefactor(idx: int) -> float:
    """ISO Table 3-B.1: sf(idx) = 2 · 2^(−idx/3). Exactly a power of
    two when idx is a multiple of 3 (the fixture family); the cube-root
    intermediates otherwise."""
    return 2.0 ** (1 - idx // 3) * (1.0, 2.0 ** (-1.0 / 3.0), 2.0 ** (-2.0 / 3.0))[idx % 3]


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def bytes_padded(self, total: int) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.nbits = 0
        if len(self.buf) > total:
            raise ValueError("mp2 frame body overflows declared size")
        return bytes(self.buf) + b"\x00" * (total - len(self.buf))


class _BitReader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0  # bit position

    def get(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.buf[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def synthesize_mp2_assets(docs: DataFrame) -> DataFrame:
    """REAL MPEG-1 LAYER II streams, one per document — mono, 48 kHz,
    48 kbps (bitrate index 2 → the low-rate Table 3-B.2c allocation
    family, frame size exactly 144000·48/48000 = 144 bytes, padding
    never fires). Each payload is an ID3v2.4 tag (syncsafe size, the
    parse_mp3_features trap) followed by ``3 + id % 4`` frames whose
    side info + subband codes all come from closed forms shared with
    the oracle:

        frame: alloc sb0=4 (15 steps), sb1=1 (3 steps, grouped),
               sb2=2 (5 steps, grouped), sb3..7 = 0
        scfsi(sb)          = (id + sb) % 4
        sfidx(sb, t)       = 3·((id + sb + t) % 4)   # powers of two
        sb0 code(fr,g,k)   = (id·7 + fr·5 + g·3 + k) % 15
        sb1 digit(fr,g,k)  = (id + fr + g + k) % 3
        sb2 digit(fr,g,k)  = (id·3 + fr + g·2 + k) % 5

    The scalefactor indices are multiples of 3 BY CONSTRUCTION, so
    every requantized sample is a dyadic rational and the decode
    features are exact integers — the audio twin of the DC-only JPEG
    fixture trick (decoder general, payload chosen so the output has
    a trig-free closed form)."""
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        def encode_one(d: int) -> bytes:
            n_frames = 3 + d % 4
            tag_body = 21 + d % 32
            out = bytearray(b"ID3\x04\x00\x00")
            out += bytes(
                [(tag_body >> 21) & 0x7F, (tag_body >> 14) & 0x7F,
                 (tag_body >> 7) & 0x7F, tag_body & 0x7F]
            )
            out += bytes((i + d) % 128 for i in range(tag_body))
            allocs = [4, 1, 2] + [0] * 5  # table-C indices per subband
            for fr in range(n_frames):
                # header: sync/MPEG-1/Layer II/no CRC; br_idx 2 (48k),
                # sr_idx 1 (48 kHz), no padding; mono
                out += bytes([0xFF, 0xFD, (2 << 4) | (1 << 2), 0xC0])
                w = _BitWriter()
                for a in allocs:
                    w.put(a, 4)
                for sb, a in enumerate(allocs):
                    if a:
                        w.put((d + sb) % 4, 2)
                for sb, a in enumerate(allocs):
                    if not a:
                        continue
                    scfsi = (d + sb) % 4
                    ntrans = (3, 2, 1, 2)[scfsi]
                    for t in range(ntrans):
                        w.put(3 * ((d + sb + t) % 4), 6)
                for g in range(12):
                    for sb, a in enumerate(allocs):
                        if not a:
                            continue
                        steps, nbits, grouped = _mp2_class(a)
                        if grouped:
                            if steps == 3:
                                digs = [(d + fr + g + k) % 3 for k in range(3)]
                            else:
                                digs = [(d * 3 + fr + g * 2 + k) % 5 for k in range(3)]
                            w.put(
                                digs[0] + steps * digs[1] + steps * steps * digs[2],
                                nbits,
                            )
                        else:
                            for k in range(3):
                                w.put((d * 7 + fr * 5 + g * 3 + k) % 15, nbits)
                out += w.bytes_padded(144 - 4)
            return bytes(out)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def decode_mp2_subband_features(assets: DataFrame) -> DataFrame:
    """REAL MPEG-1 Layer II SAMPLE decode via ``mapInPandas`` (stdlib
    only) — the audio-codec leg the NotImplementedError contract
    carried since round 10, now real down to requantized subband
    samples: header validation (sync/MPEG-1/Layer II, bitrate and
    sample-rate indices), low-rate bit-allocation read (Tables
    3-B.2c/d: nbal=4, natural step ladder — selected for bitrate/ch
    ≤ 48 kbps; the high-rate 3-B.2a/b per-subband class lists are spec
    table data this offline build does not ship and raise loudly),
    scfsi + scalefactor-sharing across the frame's three parts,
    GROUPED requantization (3/5/9-step triplets unpacked base-steps
    from one 5/7/10-bit code) and ungrouped codes with the all-ones
    pattern excluded, and the unified ISO requantization algebra

        s'' = C·(s''' + D),  C = 2^nb/steps,
        s''' = code·2^(1−nb) − 1,
        D = 0.5 (grouped) | 2^(1−nb) (ungrouped)
        ⇒ s'' = 2·(code + 1 − 2^(nb−1))/steps   (ungrouped)
          s'' = 2·(digit − 2^(nb−2))/steps      (grouped)

    then s' = scalefactor · s''. What stays stubbed (decode_image):
    the final subband→PCM synthesis filterbank, whose 512-coefficient
    prototype window is ISO Table 3-B.3 TABULATED data (designed
    numerically, no closed form, unavailable offline) — and Layer III,
    whose Huffman tables (3-B.7) are the same class of spec data.
    Everything decode-algorithmic is real and general; a production
    build adds two spec tables, not new machinery.

    Output (exact integers + one closed-form double, the oracle-safe
    projection of the subband grid): ``sum_scaled_x60`` is
    Σ 60·s' — an exact integer whenever 120·sf·code/steps is integral,
    which the fixture family guarantees (sf a power of two ≥ 1/4,
    steps ∈ {3,5,15} dividing 120) so the sum is order-free;
    ``sum_sfidx`` pins the scfsi→transmitted-scalefactor count logic;
    ``first_sample`` is the bitstream-first requantized sample as a
    double (identical single-division arithmetic on both engines).

    Cites reference behavior: app.py has no audio surface; this is
    tier-D mandate (SURVEY §2 D5), public-spec parity like T.81/RIFF.
    """
    out_schema = (
        "asset_id bigint, n_frames int, samplerate int, sblimit int, "
        "n_alloc_slots bigint, sum_scaled_x60 bigint, sum_sfidx bigint, "
        "first_sample double"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        rates = _MP3_RATES
        bitrates = _MP2_BITRATES

        def decode_one(aid, buf: bytes):
            pos = 0
            if buf[:3] == b"ID3":
                if len(buf) < 10 or any(b & 0x80 for b in buf[6:10]):
                    raise ValueError(f"asset {aid}: bad ID3v2 syncsafe size")
                pos = 10 + ((buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7) | buf[9])
            n_frames = 0
            sr = None
            sblimit = None
            n_alloc_slots = 0
            sum_scaled_x60 = 0.0
            sum_sfidx = 0
            first_sample = None
            while pos < len(buf):
                if pos + 4 > len(buf):
                    raise ValueError(f"asset {aid}: truncated header at {pos}")
                b0, b1, b2 = buf[pos], buf[pos + 1], buf[pos + 2]
                if b0 != 0xFF or (b1 & 0xF8) != 0xF8:
                    raise ValueError(f"asset {aid}: lost frame sync at {pos}")
                if (b1 & 0x18) != 0x18:
                    raise ValueError(f"asset {aid}: not MPEG-1 at {pos}")
                if (b1 & 0x06) != 0x04:
                    raise ValueError(f"asset {aid}: not Layer II at {pos}")
                if not (b1 & 0x01):
                    raise ValueError(f"asset {aid}: CRC frames unsupported")
                br_idx, sr_idx, pad = b2 >> 4, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1
                if br_idx in (0, 15):
                    raise ValueError(f"asset {aid}: free/bad bitrate index")
                if sr_idx == 3:
                    raise ValueError(f"asset {aid}: reserved sample rate")
                mode = buf[pos + 3] >> 6
                if mode != 3:
                    raise ValueError(
                        f"asset {aid}: only single_channel implemented"
                    )
                kbps = bitrates[br_idx - 1]
                rate = rates[sr_idx]
                if sr is None:
                    sr = rate
                elif sr != rate:
                    raise ValueError(f"asset {aid}: sample rate changed")
                if kbps > 48:
                    raise ValueError(
                        f"asset {aid}: {kbps} kbps/ch selects bit-allocation "
                        "table 3-B.2a/b — spec table data not shipped offline"
                    )
                # ISO 11172-3 low-rate table selection: 48 kHz ->
                # 3-B.2c (sblimit 8); 44.1 kHz AND 32 kHz -> 3-B.2d
                # (sblimit 12). sr_idx order is (44.1, 48, 32).
                sblimit = 8 if sr_idx == 1 else 12  # B.2c / B.2d
                size = 144000 * kbps // rate + pad
                if pos + size > len(buf):
                    raise ValueError(f"asset {aid}: truncated frame at {pos}")
                r = _BitReader(buf[pos + 4 : pos + size])
                allocs = [r.get(4) for _ in range(sblimit)]
                scfsi = {
                    sb: r.get(2) for sb, a in enumerate(allocs) if a
                }
                sf_eff: dict[int, list[float]] = {}
                for sb, a in enumerate(allocs):
                    if not a:
                        continue
                    ntrans = (3, 2, 1, 2)[scfsi[sb]]
                    trans = [r.get(6) for _ in range(ntrans)]
                    sum_sfidx += sum(trans)
                    tmap = {
                        0: (0, 1, 2),
                        1: (0, 0, 1),
                        2: (0, 0, 0),
                        3: (0, 1, 1),
                    }[scfsi[sb]]
                    sf_eff[sb] = [_mp2_scalefactor(trans[t]) for t in tmap]
                for g in range(12):
                    part = g // 4
                    for sb, a in enumerate(allocs):
                        if not a:
                            continue
                        steps, nbits, grouped = _mp2_class(a)
                        sf = sf_eff[sb][part]
                        if grouped:
                            code = r.get(nbits)
                            if code >= steps * steps * steps:
                                raise ValueError(
                                    f"asset {aid}: grouped code {code} out of "
                                    f"range for {steps}^3"
                                )
                            # digit → sample: s'' = 2·(d − 2^(nb−2))/steps
                            # with nb the width of one digit
                            dnb = steps.bit_length()  # 3→2, 5→3, 9→4
                            samples = [
                                2.0 * ((code // steps**k) % steps - (1 << (dnb - 2))) / steps * sf
                                for k in range(3)
                            ]
                        else:
                            codes = [r.get(nbits) for _ in range(3)]
                            if any(c == (1 << nbits) - 1 for c in codes):
                                raise ValueError(
                                    f"asset {aid}: forbidden all-ones code"
                                )
                            samples = [
                                2.0 * (c + 1 - (1 << (nbits - 1))) / steps * sf
                                for c in codes
                            ]
                        for s in samples:
                            if first_sample is None:
                                first_sample = s
                            sum_scaled_x60 += 60.0 * s
                        n_alloc_slots += 3
                n_frames += 1
                pos += size
            if n_frames == 0 or sr is None:
                raise ValueError(f"asset {aid}: no MPEG frames")
            total = round(sum_scaled_x60)
            if abs(sum_scaled_x60 - total) > 1e-6:
                raise ValueError(
                    f"asset {aid}: non-integral scaled sum {sum_scaled_x60} "
                    "(payload outside the exact fixture family)"
                )
            return (
                n_frames, sr, sblimit, n_alloc_slots, int(total),
                sum_sfidx, first_sample,
            )

        for pdf in it:
            cols = (
                "asset_id", "n_frames", "samplerate", "sblimit",
                "n_alloc_slots", "sum_scaled_x60", "sum_sfidx",
                "first_sample",
            )
            rows = {k: [] for k in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                vals = decode_one(aid, bytes(payload))
                for k, v in zip(cols, (aid, *vals)):
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5j: REAL tar shard manifest (WebDataset layout, round 11) ----------------


def synthesize_tar_shards(docs: DataFrame) -> DataFrame:
    """REAL ustar archives in the WebDataset layout, one shard per
    document — multimodal training corpora ship as tar shards of
    (sample.jpg, sample.json) member pairs, and the shard READER's
    first job is the member manifest: names, sizes, byte offsets, so
    it can range-read samples without extracting. The shards here are
    written by the stdlib ``tarfile`` writer (USTAR_FORMAT,
    deterministic zeroed mtime/uid/gid), so the walker below is
    exercised against independently-produced conformant bytes, not
    our own serializer. Closed forms shared with the oracle:

        n_samples      = 4 + id % 6
        sample i: {i:06d}.jpg  of 400 + ((id*13 + i*29) % 600) bytes
                  {i:06d}.json of  80 + ((id*7  + i*11) %  90) bytes
        member order: 000000.jpg, 000000.json, 000001.jpg, ...
    """
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import tarfile

        import numpy as np
        import pandas as pd

        def encode_one(d: int) -> bytes:
            bio = io.BytesIO()
            with tarfile.open(
                fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT
            ) as tf:
                for i in range(4 + d % 6):
                    for ext, size in (
                        ("jpg", 400 + ((d * 13 + i * 29) % 600)),
                        ("json", 80 + ((d * 7 + i * 11) % 90)),
                    ):
                        info = tarfile.TarInfo(name=f"{i:06d}.{ext}")
                        info.size = size
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        tf.addfile(
                            info,
                            io.BytesIO(
                                ((np.arange(size, dtype=np.int64) + d + i) % 256)
                                .astype(np.uint8)
                                .tobytes()
                            ),
                        )
            return bio.getvalue()

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def tar_shard_manifest(assets: DataFrame) -> DataFrame:
    """REAL tar walking via ``mapInPandas`` — a hand-written ustar
    header walker (stdlib struct-free: fixed 512-byte blocks, octal
    size fields, and the HEADER CHECKSUM verified with the
    chksum-field-as-spaces rule), deliberately NOT ``tarfile``, so the
    parse is independent of the writer. Emits the shard reader's
    manifest: one row per member with its payload size and the exact
    byte offset of its data (header offset + 512) — what a
    WebDataset-style loader range-reads samples by. Walk ends at the
    end-of-archive zero block; a corrupt checksum or a size field
    overrunning the archive raises loudly. The member payloads are
    never materialized — manifest only, O(members) work per shard.
    Output: (asset_id, member_name, size, data_offset)."""
    out_schema = "asset_id bigint, member_name string, size bigint, data_offset bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        def walk_one(aid, buf: bytes):
            out = []
            pos = 0
            while pos + 512 <= len(buf):
                hdr = buf[pos : pos + 512]
                if hdr == b"\x00" * 512:
                    break  # end-of-archive
                if hdr[257:262] != b"ustar":
                    raise ValueError(f"asset {aid}: bad ustar magic at {pos}")
                try:
                    stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
                except ValueError:
                    # a non-octal chksum field IS checksum corruption
                    raise ValueError(
                        f"asset {aid}: header checksum mismatch at {pos}"
                    ) from None
                summed = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
                if stored != summed:
                    raise ValueError(f"asset {aid}: header checksum mismatch at {pos}")
                name = hdr[0:100].split(b"\x00")[0].decode("utf-8")
                size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
                data_off = pos + 512
                if data_off + size > len(buf):
                    raise ValueError(f"asset {aid}: member overruns archive at {pos}")
                out.append((name, size, data_off))
                pos = data_off + ((size + 511) // 512) * 512
            if not out:
                raise ValueError(f"asset {aid}: no tar members")
            return out

        for pdf in it:
            rows = {"asset_id": [], "member_name": [], "size": [], "data_offset": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for name, size, off in walk_one(aid, bytes(payload)):
                    rows["asset_id"].append(aid)
                    rows["member_name"].append(name)
                    rows["size"].append(size)
                    rows["data_offset"].append(off)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5k: REAL PROGRESSIVE JPEG decode (multi-scan, round 11) ------------------


def _prog_jpeg_dims(doc_id: int) -> tuple[int, int]:
    """Closed-form dims for the progressive leg (distinct from the
    baseline-grayscale and color families). Multiples of 8: MCU-
    aligned so the closed-form oracle needs no crop."""
    return 24 + (doc_id % 2) * 8, 16 + (doc_id % 3) * 8


def synthesize_progressive_jpeg_assets(docs: DataFrame) -> DataFrame:
    """REAL PROGRESSIVE (SOF2) JPEG payloads — the last image entry of
    the NotImplementedError contract, retired round 11. Progressive
    JPEG splits the coefficient data across MULTIPLE SCANS; these
    payloads exercise the three scan kinds a progressive decoder must
    dispatch on:

      scan 1: DC first pass   (Ss=0, Se=0, Ah=0, Al=1) — Huffman DC
              diffs of (qDC >> 1), the successive-approximation
              high bits (arithmetic shift: negatives floor, per G.1)
      scan 2: DC refinement   (Ss=0, Se=0, Ah=1, Al=0) — ONE RAW BIT
              per block (no Huffman), the low bit of qDC
      scan 3: AC first pass   (Ss=1, Se=63, Ah=0, Al=0) — the 1-63
              spectral band; all-zero here, closed per block with the
              1-bit EOB code (an EOB-run of 1 — the EOBn machinery's
              r=0 case)

    so the decoder must accumulate coefficients across scans and IDCT
    only at EOI. Assets are DC-only (the decoder path is general —
    pytest feeds it a nonzero-AC progressive file); q[0]=8 keeps every
    decoded pixel the exact integer 128 + qDC with the same closed
    form as the baseline leg:

        qDC(bx, by) = (id*7 + bx*5 + by*3) % 160 - 80
    """
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def encode_one(d: int) -> bytes:
            w, h = 24 + (d % 2) * 8, 16 + (d % 3) * 8  # inlined _prog_jpeg_dims
            nbx, nby = w // 8, h // 8
            qdc = [
                (d * 7 + bx * 5 + by * 3) % 160 - 80
                for by in range(nby)
                for bx in range(nbx)
            ]
            q = bytes([8] + [16] * 63)
            out = bytearray(b"\xff\xd8")
            out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
            out += (
                b"\xff\xc2"  # SOF2: progressive
                + struct.pack(">HBHHB", 11, 8, h, w, 1)
                + bytes([1, 0x11, 0])
            )
            bits_dc = bytearray(16)
            bits_dc[3] = 9
            out += (
                b"\xff\xc4"
                + struct.pack(">H", 2 + 1 + 16 + 9)
                + b"\x00"
                + bytes(bits_dc)
                + bytes(range(9))
            )
            bits_ac = bytearray(16)
            bits_ac[0] = 1
            out += (
                b"\xff\xc4"
                + struct.pack(">H", 2 + 1 + 16 + 1)
                + b"\x10"
                + bytes(bits_ac)
                + bytes([0x00])
            )

            class BitW:
                def __init__(self):
                    self.data = bytearray()
                    self.buf = self.n = 0

                def put(self, code: int, ln: int) -> None:
                    self.buf = (self.buf << ln) | code
                    self.n += ln
                    while self.n >= 8:
                        byte = (self.buf >> (self.n - 8)) & 0xFF
                        self.data.append(byte)
                        if byte == 0xFF:
                            self.data.append(0x00)
                        self.n -= 8
                        self.buf &= (1 << self.n) - 1

                def flush(self) -> bytes:
                    if self.n:
                        pad = 8 - self.n
                        byte = ((self.buf << pad) | ((1 << pad) - 1)) & 0xFF
                        self.data.append(byte)
                        if byte == 0xFF:
                            self.data.append(0x00)
                        self.buf = self.n = 0
                    return bytes(self.data)

            def sos(ss: int, se: int, ah: int, al: int) -> bytes:
                return (
                    b"\xff\xda"
                    + struct.pack(">HB", 8, 1)
                    + bytes([1, 0x00, ss, se, (ah << 4) | al])
                )

            # scan 1: DC first pass, values >> 1 (arithmetic), Huffman diffs
            out += sos(0, 0, 0, 1)
            bw = BitW()
            prev = 0
            for v in qdc:
                hi = v >> 1
                diff = hi - prev
                prev = hi
                s = diff.bit_length()
                bw.put(s, 4)
                if s:
                    amp = diff if diff > 0 else diff + (1 << s) - 1
                    bw.put(amp & ((1 << s) - 1), s)
            out += bw.flush()
            # scan 2: DC refinement — one raw bit per block
            out += sos(0, 0, 1, 0)
            bw = BitW()
            for v in qdc:
                bw.put(v & 1, 1)
            out += bw.flush()
            # scan 3: AC first pass 1-63 — EOB per block (1-bit code)
            out += sos(1, 63, 0, 0)
            bw = BitW()
            for _ in qdc:
                bw.put(0, 1)
            out += bw.flush()
            out += b"\xff\xd9"
            return bytes(out)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def decode_progressive_jpeg_features(assets: DataFrame) -> DataFrame:
    """REAL progressive-JPEG decode via ``mapInPandas`` — stdlib +
    numpy, a MULTI-SCAN grayscale decoder (ITU T.81 Annex G): SOF2,
    per-scan dispatch on (Ss, Se, Ah, Al) — DC first pass (Huffman
    diffs shifted up by Al), DC refinement (one raw bit per block
    OR-ed in at Al), AC first pass over any spectral band with the
    full EOBn run machinery (symbol (r,0): EOBRUN = 2^r − 1 +
    r extra bits, skipping whole blocks) and ZRL — coefficients
    ACCUMULATE across scans and the IDCT runs once at EOI — plus AC
    successive-approximation REFINEMENT scans (G.1.2.3: per-
    coefficient correction bits toward the sign, newly-significant
    insertions, EOBn runs that still read correction bits for the
    nonzero coefficients they skip; the refinement EOBn counts the
    current block, whose band remainder is processed under it).
    Grayscale only; multi-component progressive would compose this
    kernel per component exactly as the baseline color path does.
    Output contract
    matches the baseline leg: (asset_id, width, height, n_pixels,
    mean_lum, topleft_lum)."""
    out_schema = (
        "asset_id bigint, width int, height int, n_pixels bigint, "
        "mean_lum double, topleft_lum int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        import struct

        import numpy as np
        import pandas as pd

        zigzag = (
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
            35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
            58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
        )
        M = np.array(
            [
                [
                    ((1 / math.sqrt(2)) if u == 0 else 1.0)
                    / 2.0
                    * math.cos((2 * x + 1) * u * math.pi / 16)
                    for x in range(8)
                ]
                for u in range(8)
            ]
        )

        def build_huff(bits, vals):
            table, code, k = {}, 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    table[(ln, code)] = vals[k]
                    k += 1
                    code += 1
                code <<= 1
            return table

        def decode_one(aid, buf: bytes):
            if buf[:2] != b"\xff\xd8":
                raise ValueError(f"asset {aid}: not a JPEG (no SOI)")
            pos, qt, huff, sof = 2, {}, {}, None
            coefs = None  # per-block coefficient store, across scans
            while pos < len(buf):
                if buf[pos] != 0xFF:
                    raise ValueError(f"asset {aid}: expected marker at {pos}")
                m = buf[pos + 1]
                pos += 2
                if m == 0xD9:  # EOI: all scans in — dequant + IDCT now
                    if sof is None or coefs is None:
                        raise ValueError(f"asset {aid}: EOI before any scan")
                    w, h, tq = sof
                    q = qt[tq]
                    nbx = w // 8
                    px = np.zeros((h, w), dtype=np.int64)
                    for bi, czz in enumerate(coefs):
                        Fm = np.zeros(64, dtype=np.float64)
                        Fm[list(zigzag)] = czz * q
                        block = M.T @ Fm.reshape(8, 8) @ M
                        by, bx = divmod(bi, nbx)
                        px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                            np.floor(block + 0.5).astype(np.int64) + 128, 0, 255
                        )
                    return w, h, px
                (ln,) = struct.unpack(">H", buf[pos : pos + 2])
                seg = buf[pos + 2 : pos + ln]
                pos += ln
                if 0xE0 <= m <= 0xEF or m == 0xFE:
                    continue
                if m == 0xDB:
                    i = 0
                    while i < len(seg):
                        pq, tq = seg[i] >> 4, seg[i] & 0xF
                        if pq != 0:
                            raise ValueError(f"asset {aid}: 16-bit DQT unsupported")
                        qt[tq] = np.frombuffer(
                            seg[i + 1 : i + 65], dtype=np.uint8
                        ).astype(np.int64)
                        i += 65
                elif m == 0xC4:
                    i = 0
                    while i < len(seg):
                        tc, th = seg[i] >> 4, seg[i] & 0xF
                        bits = list(seg[i + 1 : i + 17])
                        nv = sum(bits)
                        huff[(tc, th)] = build_huff(bits, list(seg[i + 17 : i + 17 + nv]))
                        i += 17 + nv
                elif m == 0xC2:  # SOF2 progressive
                    prec = seg[0]
                    h, w = struct.unpack(">HH", seg[1:5])
                    nc = seg[5]
                    if prec != 8 or nc != 1 or seg[7] != 0x11:
                        raise ValueError(
                            f"asset {aid}: only 8-bit single-component 1x1 "
                            f"progressive supported"
                        )
                    sof = (w, h, seg[8])
                    coefs = [
                        np.zeros(64, dtype=np.int64)
                        for _ in range((w // 8) * (h // 8))
                    ]
                elif m in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
                    raise ValueError(
                        f"asset {aid}: SOF{m & 0xF} in the progressive decoder "
                        f"(use decode_jpeg_features for baseline)"
                    )
                elif m == 0xDD:
                    raise ValueError(f"asset {aid}: restart intervals unsupported")
                elif m == 0xDA:
                    if sof is None:
                        raise ValueError(f"asset {aid}: SOS before SOF2")
                    tbl = seg[2]
                    ss, se = seg[3], seg[4]
                    ah, al = seg[5] >> 4, seg[5] & 0xF
                    data = bytearray()
                    p = pos
                    while p < len(buf):
                        if buf[p] == 0xFF:
                            if p + 1 < len(buf) and buf[p + 1] == 0x00:
                                data.append(0xFF)
                                p += 2
                                continue
                            break
                        data.append(buf[p])
                        p += 1
                    bitpos = 0

                    def getbit() -> int:
                        nonlocal bitpos
                        byte = data[bitpos >> 3]
                        bit = (byte >> (7 - (bitpos & 7))) & 1
                        bitpos += 1
                        return bit

                    def read_huff(tab):
                        code = ln2 = 0
                        while ln2 <= 16:
                            code = (code << 1) | getbit()
                            ln2 += 1
                            sym = tab.get((ln2, code))
                            if sym is not None:
                                return sym
                        raise ValueError(f"asset {aid}: invalid Huffman code")

                    def receive_extend(s: int) -> int:
                        v = 0
                        for _ in range(s):
                            v = (v << 1) | getbit()
                        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

                    if ss == 0 and ah == 0:  # DC first pass
                        dc_t = huff[(0, tbl >> 4)]
                        prev = 0
                        for czz in coefs:
                            s = read_huff(dc_t)
                            prev += receive_extend(s) if s else 0
                            czz[0] = prev << al
                    elif ss == 0:  # DC refinement: one raw bit per block
                        for czz in coefs:
                            if getbit():
                                czz[0] |= 1 << al
                    elif ah == 0:  # AC first pass over band [ss, se]
                        ac_t = huff[(1, tbl & 0xF)]
                        eobrun = 0
                        for czz in coefs:
                            if eobrun:
                                eobrun -= 1
                                continue
                            k = ss
                            while k <= se:
                                rs = read_huff(ac_t)
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:
                                        k += 16  # ZRL
                                        continue
                                    # EOBn: run of 2^r - 1 + extra blocks
                                    eobrun = (1 << r) - 1
                                    if r:
                                        v = 0
                                        for _ in range(r):
                                            v = (v << 1) | getbit()
                                        eobrun += v
                                    break
                                k += r
                                if k > se:
                                    raise ValueError(
                                        f"asset {aid}: AC index past band end"
                                    )
                                czz[k] = receive_extend(s) << al
                                k += 1
                    else:
                        # AC refinement (T.81 G.1.2.3, round 11 — the
                        # last image-contract item): per coefficient,
                        # a nonzero HISTORY value reads one correction
                        # bit (add ±2^Al toward its sign unless that
                        # bit is already set), a zero-history value can
                        # become newly significant (s=1 + sign bit);
                        # EOBn runs still read correction bits for the
                        # nonzero coefficients they skip.
                        ac_t = huff[(1, tbl & 0xF)]
                        p1 = 1 << al
                        m1 = -1 << al

                        def correct(czz, k: int) -> None:
                            if getbit() and (czz[k] & p1) == 0:
                                czz[k] += p1 if czz[k] >= 0 else m1

                        eobrun = 0
                        for czz in coefs:
                            k = ss
                            if eobrun == 0:
                                while k <= se:
                                    rs = read_huff(ac_t)
                                    r, s = rs >> 4, rs & 0xF
                                    if s == 0:
                                        if r != 15:
                                            # refinement EOBn counts the
                                            # CURRENT block too (its band
                                            # remainder still reads
                                            # correction bits below) —
                                            # 1<<r total, current consumes 1
                                            eobrun = 1 << r
                                            if r:
                                                v = 0
                                                for _ in range(r):
                                                    v = (v << 1) | getbit()
                                                eobrun += v
                                            break
                                        newval = 0  # ZRL: 16 zero-history skips
                                    else:
                                        if s != 1:
                                            raise ValueError(
                                                f"asset {aid}: refinement "
                                                f"s={s} (must be 1)"
                                            )
                                        newval = p1 if getbit() else m1
                                    # skip r zero-history coeffs, correcting
                                    # every nonzero-history one on the way
                                    while k <= se:
                                        if czz[k] != 0:
                                            correct(czz, k)
                                        else:
                                            if r == 0:
                                                break
                                            r -= 1
                                        k += 1
                                    if s and k <= se:
                                        czz[k] = newval
                                        k += 1
                                    elif not s:
                                        k += 1  # past the ZRL's 16th zero
                            if eobrun > 0:
                                # remainder of THIS block under the EOB run:
                                # nonzero history still reads correction bits
                                while k <= se:
                                    if czz[k] != 0:
                                        correct(czz, k)
                                    k += 1
                                eobrun -= 1
                    pos = p  # continue the marker walk after this scan
                else:
                    raise ValueError(f"asset {aid}: unexpected marker 0x{m:02x}")
            raise ValueError(f"asset {aid}: no EOI")

        for pdf in it:
            cols = (
                "asset_id", "width", "height", "n_pixels", "mean_lum", "topleft_lum",
            )
            rows = {k: [] for k in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_one(aid, bytes(payload))
                n = w * h
                rows["asset_id"].append(aid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(n)
                rows["mean_lum"].append(float(px.sum()) / n)
                rows["topleft_lum"].append(int(px[0, 0]))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5l: REAL image resize (nearest-neighbor over BMP, round 11) --------------


def resize_bmp_nearest(assets: DataFrame, max_side: int = 8) -> DataFrame:
    """REAL image resize — the last fake pixel kernel retired: decode
    the 24-bpp BMP payload (magic, headers, stride un-pad, bottom-up
    flip), NEAREST-NEIGHBOR downscale to fit ``max_side`` with pure
    INTEGER arithmetic (out_w = max(w·max_side // max(w,h), 1), source
    pixel sx = x·w // out_w — exact on any engine, no float scale
    factor to disagree about), and RE-ENCODE a valid bottom-up padded
    BMP, so the output of this operator feeds ``decode_bmp_features``
    — the round-trip that proves the re-encoder. The aspect ratio is
    preserved in the integer sense; upscaling is out of contract:
    images smaller than max_side pass through at original size via an
    explicit clamp out_w = min(w, max(w·max_side // max(w,h), 1)) —
    the unclamped formula alone would UPSCALE them (w=h=4, max_side=8
    gives 8×8), so the clamp is what makes the map the identity there.

    Scale note: payload rows never shuffle (mapInPandas preserves the
    input partitioning) and per-asset work is O(out pixels)."""
    out_schema = "asset_id bigint, payload binary, width int, height int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd

        def resize_one(aid, buf: bytes):
            if buf[:2] != b"BM":
                raise ValueError(f"asset {aid}: not a BMP")
            (off,) = struct.unpack("<I", buf[10:14])
            hdr_sz, w, h, planes, bpp = struct.unpack("<IiiHH", buf[14:30])
            if bpp != 24 or h <= 0:
                raise ValueError(f"asset {aid}: only bottom-up 24-bpp supported")
            stride = (w * 3 + 3) // 4 * 4
            rows = np.frombuffer(
                buf[off : off + h * stride], dtype=np.uint8
            ).reshape(h, stride)
            img = rows[::-1, : w * 3].reshape(h, w, 3)  # top-down, BGR
            m = max(w, h)
            # min(w, ·) clamps the already-small image to its original
            # size — upscaling is out of contract (see docstring); the
            # unclamped formula would upscale when max(w,h) < max_side.
            ow = min(w, max(w * max_side // m, 1))
            oh = min(h, max(h * max_side // m, 1))
            sx = (np.arange(ow, dtype=np.int64) * w) // ow
            sy = (np.arange(oh, dtype=np.int64) * h) // oh
            out = img[sy][:, sx]  # (oh, ow, 3) nearest-neighbor
            ostride = (ow * 3 + 3) // 4 * 4
            orows = np.zeros((oh, ostride), dtype=np.uint8)
            orows[:, : ow * 3] = out.reshape(oh, ow * 3)
            pix = orows[::-1].tobytes()  # back to bottom-up
            hoff = 14 + 40
            payload = (
                b"BM"
                + struct.pack("<IHHI", hoff + len(pix), 0, 0, hoff)
                + struct.pack("<IiiHH", 40, ow, oh, 1, 24)
                + struct.pack("<IIiiII", 0, len(pix), 0, 0, 0, 0)
                + pix
            )
            return payload, ow, oh

        for pdf in it:
            rows = {"asset_id": [], "payload": [], "width": [], "height": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                out, ow, oh = resize_one(aid, bytes(payload))
                rows["asset_id"].append(aid)
                rows["payload"].append(out)
                rows["width"].append(ow)
                rows["height"].append(oh)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D120: REAL WARC/WET web-archive ingest (round 15) --------------------------


def synthesize_warc_assets(docs: DataFrame) -> DataFrame:
    """REAL WARC/1.0 archives (ISO 28500 — the container every
    web-scale training corpus is delivered in: Common Crawl's
    WARC/WET/WAT files), one per document so the DuckDB oracle can
    replay every field from the documents table. Each archive holds a
    ``warcinfo`` record followed by a ``response`` record whose block
    is a full HTTP/1.1 response carrying the document's ACTUAL text —
    so the parser's recovered text is checkable against the source
    column, not a synthetic pattern. Records are individually
    GZIP-COMPRESSED and concatenated (RFC 1952 multi-member stream) —
    byte-for-byte the Common Crawl layout, which lets a reader
    decompress record-at-a-time and range-skip; the parser must walk
    gzip members, not just gunzip once.

    Closed forms shared with the oracle: target URI
    ``http://example.com/doc/{doc_id}``, HTTP status 200, block length
    45 + octet_length(text) (the fixed 45-byte header prefix
    ``HTTP/1.1 200 OK\\r\\nContent-Type: text/plain\\r\\n\\r\\n``)."""
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip
        import io

        import pandas as pd

        def gz_member(raw: bytes) -> bytes:
            bio = io.BytesIO()
            # mtime=0: deterministic bytes (the gzip header stores it)
            with gzip.GzipFile(fileobj=bio, mode="wb", mtime=0) as gf:
                gf.write(raw)
            return bio.getvalue()

        def record(rtype: str, headers: list, block: bytes) -> bytes:
            head = [f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"]
            head += [f"{k}: {v}\r\n" for k, v in headers]
            head.append(f"Content-Length: {len(block)}\r\n\r\n")
            return "".join(head).encode("ascii") + block + b"\r\n\r\n"

        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                info = record(
                    "warcinfo",
                    [("WARC-Record-ID", f"<urn:uuid:{d:032x}>")],
                    b"software: etl-cortex-spark-synth\r\n",
                )
                body = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
                    + str(text).encode("utf-8")
                )
                resp = record(
                    "response",
                    [
                        ("WARC-Record-ID", f"<urn:uuid:{d + 1:032x}>"),
                        ("WARC-Target-URI", f"http://example.com/doc/{d}"),
                        ("WARC-Date", "2024-01-01T00:00:00Z"),
                        ("Content-Type", "application/http;msgtype=response"),
                    ],
                    body,
                )
                payloads.append(gz_member(info) + gz_member(resp))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(batches, schema=out_schema)


def parse_warc_responses(assets: DataFrame) -> DataFrame:
    """REAL WARC ingest via ``mapInPandas`` — the first stage of every
    web-corpus pipeline (Common Crawl → text), no warc library: walk
    the MULTI-MEMBER gzip stream with ``zlib.decompressobj(wbits=31)``
    (each member ends with unused_data that starts the next — gunzip-
    once readers silently drop all but the first record), parse each
    WARC/1.0 record's named headers, enforce Content-Length record
    framing (the \\r\\n\\r\\n record separator is VERIFIED, not
    searched for — bodies may contain anything), keep only
    ``response`` records, and split the HTTP status line + headers
    from the payload. Emits per response: target URI, HTTP status,
    block length, and the md5 of the recovered UTF-8 text — so the
    oracle proves byte-exact text recovery against the source column
    without shipping the text twice. Malformed magic, truncated
    members, bad framing, or a record without Content-Length raise
    loudly. At 100 TB this is embarrassingly parallel per shard —
    the sanctioned mapInPandas escape hatch."""
    out_schema = (
        "asset_id bigint, target_uri string, http_status int, "
        "content_length bigint, text_md5 string"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import zlib

        import pandas as pd

        def gzip_members(aid, buf: bytes):
            pos = 0
            while pos < len(buf):
                if buf[pos : pos + 2] != b"\x1f\x8b":
                    raise ValueError(f"asset {aid}: bad gzip magic at {pos}")
                d = zlib.decompressobj(wbits=31)
                raw = d.decompress(buf[pos:])
                if not d.eof:
                    raise ValueError(f"asset {aid}: truncated gzip member at {pos}")
                yield raw
                pos = len(buf) - len(d.unused_data)

        def parse_record(aid, raw: bytes):
            sep = raw.find(b"\r\n\r\n")
            if sep < 0 or not raw.startswith(b"WARC/1.0\r\n"):
                raise ValueError(f"asset {aid}: not a WARC/1.0 record")
            headers = {}
            for line in raw[10:sep].decode("utf-8").split("\r\n"):
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            if "content-length" not in headers:
                raise ValueError(f"asset {aid}: record without Content-Length")
            n = int(headers["content-length"])
            block = raw[sep + 4 : sep + 4 + n]
            if raw[sep + 4 + n :] != b"\r\n\r\n":
                raise ValueError(f"asset {aid}: bad record framing")
            return headers, block

        for pdf in it:
            rows = {k: [] for k in (
                "asset_id", "target_uri", "http_status",
                "content_length", "text_md5",
            )}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for raw in gzip_members(aid, bytes(payload)):
                    headers, block = parse_record(aid, raw)
                    if headers.get("warc-type") != "response":
                        continue
                    hsep = block.find(b"\r\n\r\n")
                    status = int(block[:hsep].split(b"\r\n")[0].split(b" ")[1])
                    text = block[hsep + 4 :]
                    rows["asset_id"].append(aid)
                    rows["target_uri"].append(headers["warc-target-uri"])
                    rows["http_status"].append(status)
                    rows["content_length"].append(len(block))
                    rows["text_md5"].append(hashlib.md5(text).hexdigest())
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D121: REAL GIF decode (LZW, variable-width codes, round 15) ----------------


def _gif_dims(doc_id: int) -> tuple[int, int]:
    """Closed-form per-asset dimensions (shared with the oracle)."""
    return 10 + (doc_id % 4) * 5, 8 + (doc_id % 3) * 4


def synthesize_gif_assets(docs: DataFrame) -> DataFrame:
    """REAL GIF89a payloads, one per document — the LZW leg of the
    codec family (PNG proved DEFLATE/Huffman, JPEG proved DCT entropy
    coding; GIF is the third classic compressed image format and the
    only one built on DICTIONARY coding). Full spec grammar: header,
    logical screen descriptor, global color table, a Graphic Control
    Extension (so the reader's extension-skip path is exercised, not
    just tolerated), image descriptor, and an LZW-compressed index
    stream with variable code width (clear + EOI codes, LSB-first bit
    packing, dictionary growth to 12 bits), closed by the 0x3B
    trailer. Palette size 2^(2 + id % 3) (4/8/16 entries). Closed
    forms shared with the oracle (image coordinates, P = palette
    size):

        idx(x,y) = (id*7 + x*3 + y*5) % P
        palette[i] = (r,g,b) = ((id*5 + i*11) % 256,
                               (id*3 + i*7)  % 256,
                               (id*7 + i*13) % 256)
    """
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def lzw_encode(indices, min_code: int) -> bytes:
            clear, eoi = 1 << min_code, (1 << min_code) + 1
            table = {(i,): i for i in range(1 << min_code)}
            next_code = eoi + 1
            width = min_code + 1
            out = bytearray()
            acc = nbits = 0

            def emit(code: int):
                nonlocal acc, nbits
                acc |= code << nbits
                nbits += width
                while nbits >= 8:
                    out.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8

            emit(clear)
            run: tuple = ()
            for s in indices:
                cand = run + (s,)
                if cand in table:
                    run = cand
                    continue
                emit(table[run])
                table[cand] = next_code
                next_code += 1
                # GIF rule: width grows AFTER the code that filled the
                # current width's range is assigned
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
                if next_code >= 4096:
                    emit(clear)
                    table = {(i,): i for i in range(1 << min_code)}
                    next_code = eoi + 1
                    width = min_code + 1
                run = (s,)
            if run:
                emit(table[run])
            emit(eoi)
            if nbits:
                out.append(acc & 0xFF)
            return bytes(out)

        def encode_one(d: int) -> bytes:
            w, h = _gif_dims(d)
            pbits = 2 + d % 3
            P = 1 << pbits
            palette = b"".join(
                bytes(
                    (
                        (d * 5 + i * 11) % 256,
                        (d * 3 + i * 7) % 256,
                        (d * 7 + i * 13) % 256,
                    )
                )
                for i in range(P)
            )
            indices = [
                (d * 7 + x * 3 + y * 5) % P for y in range(h) for x in range(w)
            ]
            min_code = pbits
            lzw = lzw_encode(indices, min_code)
            blocks = bytearray()
            for i in range(0, len(lzw), 255):
                chunk = lzw[i : i + 255]
                blocks.append(len(chunk))
                blocks += chunk
            blocks.append(0)
            return (
                b"GIF89a"
                + struct.pack("<HH", w, h)
                + bytes((0x80 | (pbits - 1), 0, 0))  # GCT present, size bits
                + palette
                # Graphic Control Extension: readers MUST skip unknown/
                # control extensions by sub-block walking
                + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
                + b"\x2c"
                + struct.pack("<HHHH", 0, 0, w, h)
                + b"\x00"  # no local table, not interlaced
                + bytes((min_code,))
                + bytes(blocks)
                + b"\x3b"
            )

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def gif_lzw_decode(data: bytes, min_code: int, n_pixels: int) -> list:
    """GIF-variant LZW decode (the 89a spec's appendix algorithm):
    LSB-first bit unpacking, variable code width starting at
    min_code+1, clear resets the dictionary, EOI ends the stream, and
    the KwKwK case (a code one past the table end) reproduces
    prev + prev[0]. Raises on any other out-of-range code, on a code
    before the first clear-reset pixel, or on pixel overrun."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    pixels: list = []
    table: list = []
    width = min_code + 1
    prev: list | None = None
    acc = nbits = pos = 0

    def reset():
        nonlocal table, width, prev
        table = [[i] for i in range(1 << min_code)] + [None, None]
        width = min_code + 1
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended before EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} out of range")
        pixels.extend(entry)
        if len(pixels) > n_pixels:
            raise ValueError("LZW output overruns the image")
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if len(pixels) != n_pixels:
        raise ValueError(
            f"LZW decoded {len(pixels)} of {n_pixels} pixels"
        )
    return pixels


def decode_gif_features(assets: DataFrame) -> DataFrame:
    """REAL GIF decode via ``mapInPandas`` — no codec library: parse
    the 89a grammar (screen descriptor, global color table, extension
    sub-block skipping, image descriptor), run the full variable-width
    LZW decode (`gif_lzw_decode`), map indices through the palette,
    and emit per-asset features: exact channel means (integer sums
    divided once) and the top-left pixel's r+g+b. Local color tables
    and interlaced images raise loudly — the stated boundary, not a
    silent wrong answer; extension blocks of ANY label are walked by
    their sub-block lengths, the spec's forward-compat rule."""
    out_schema = (
        "asset_id bigint, width int, height int, n_pixels bigint, "
        "mean_r double, mean_g double, mean_b double, topleft_lum int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def decode_one(aid, buf: bytes):
            if buf[:6] not in (b"GIF89a", b"GIF87a"):
                raise ValueError(f"asset {aid}: not a GIF payload")
            w, h = struct.unpack("<HH", buf[6:10])
            packed = buf[10]
            pos = 13
            palette = None
            if packed & 0x80:
                P = 2 << (packed & 0x07)
                palette = buf[pos : pos + 3 * P]
                pos += 3 * P
            while True:
                if pos >= len(buf):
                    raise ValueError(f"asset {aid}: no image descriptor")
                b0 = buf[pos]
                pos += 1
                if b0 == 0x3B:
                    raise ValueError(f"asset {aid}: trailer before image")
                if b0 == 0x21:  # extension: label + sub-blocks
                    pos += 1
                    while buf[pos]:
                        pos += 1 + buf[pos]
                    pos += 1
                    continue
                if b0 != 0x2C:
                    raise ValueError(f"asset {aid}: bad block 0x{b0:02x}")
                break
            _l, _t, iw, ih = struct.unpack("<HHHH", buf[pos : pos + 8])
            ipacked = buf[pos + 8]
            pos += 9
            if ipacked & 0x80:
                raise ValueError(f"asset {aid}: local color tables unsupported")
            if ipacked & 0x40:
                raise ValueError(f"asset {aid}: interlaced GIFs unsupported")
            if palette is None:
                raise ValueError(f"asset {aid}: no color table")
            min_code = buf[pos]
            pos += 1
            lzw = bytearray()
            while True:
                n = buf[pos]
                pos += 1
                if n == 0:
                    break
                lzw += buf[pos : pos + n]
                pos += n
            idx = gif_lzw_decode(bytes(lzw), min_code, iw * ih)
            rs = sum(palette[3 * i] for i in idx)
            gs = sum(palette[3 * i + 1] for i in idx)
            bs = sum(palette[3 * i + 2] for i in idx)
            i0 = idx[0]
            tl = palette[3 * i0] + palette[3 * i0 + 1] + palette[3 * i0 + 2]
            n = iw * ih
            return iw, ih, n, rs / n, gs / n, bs / n, tl

        for pdf in it:
            rows = {k: [] for k in (
                "asset_id", "width", "height", "n_pixels",
                "mean_r", "mean_g", "mean_b", "topleft_lum",
            )}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, n, mr, mg, mb, tl = decode_one(aid, bytes(payload))
                rows["asset_id"].append(aid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(n)
                rows["mean_r"].append(mr)
                rows["mean_g"].append(mg)
                rows["mean_b"].append(mb)
                rows["topleft_lum"].append(tl)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5t: REAL MPEG-1 Layer III SCALEFACTOR (part2) decode (round 15) -----------

#: ISO 11172-3 2.4.2.7: scalefac_compress -> (slen1, slen2); slen1
#: covers long-block scalefactor bands 0-10, slen2 bands 11-20.
_MP3_SLEN1 = (0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
_MP3_SLEN2 = (0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)
#: scfsi group -> its long scalefactor bands (0-5, 6-10, 11-15, 16-20)
_MP3_SCFSI_BANDS = ((0, 6), (6, 11), (11, 16), (16, 21))


def synthesize_mp3_scf_assets(docs: DataFrame) -> DataFrame:
    """REAL MPEG-1 Layer III frames whose MAIN DATA carries genuine
    scalefactor part2 bitstreams (round 15 — the next boundary move
    after r14's side-info walk: now everything up to the Huffman
    SPECTRUM is real bits). Mono, no CRC, 128 kbps, main_data_begin=0
    (each frame self-contained), window_switching off, and an all-zero
    spectrum (big_values=0, part3=0 — a silent granule is fully legal),
    so part2_3_length is EXACTLY the scalefactor bit count and the
    decoder's part2/part3 split arithmetic is pinned at the zero
    boundary. scfsi is exercised for real: granule 1 transmits only
    the bands whose scfsi group bit is 0 and REUSES granule 0's values
    elsewhere — the state-carrying rule real decoders implement.
    Closed forms shared with the oracle (g = granule, b = band):

        samplerate idx    = id % 3 (44100/48000/32000); pad = (id+i)%2
        n_frames          = 6 + id % 5
        scalefac_compress = (id + 2i + g) % 16 -> slen1/slen2 (2.4.2.7)
        scfsi             = (id + i) % 16  (bit k = group k, MSB first)
        scalefac(g, b)    = (3·id + 5·i + 7·g + 11·b) mod 2^slen(b)
        global_gain       = (5·id + 7·i + 3·g) % 256
    """
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        rates = _MP3_RATES

        def encode_one(d: int) -> bytes:
            out = bytearray()
            sr = rates[d % 3]
            for i in range(6 + d % 5):
                pad = (d + i) % 2
                size = 144000 * 128 // sr + pad
                scfsi = (d + i) % 16
                grans = []
                for g in range(2):
                    sc = (d + 2 * i + g) % 16
                    s1, s2 = _MP3_SLEN1[sc], _MP3_SLEN2[sc]
                    part2 = 0
                    bands = []
                    for b in range(21):
                        slen = s1 if b <= 10 else s2
                        grp = 0 if b <= 5 else 1 if b <= 10 else 2 if b <= 15 else 3
                        reused = g == 1 and ((scfsi >> (3 - grp)) & 1) == 1
                        if not reused:
                            part2 += slen
                            bands.append((b, slen))
                    grans.append((sc, part2, bands))
                w = _BitWriter()
                w.put(0, 9)  # main_data_begin = 0 (self-contained)
                w.put(0, 5)  # private_bits
                w.put(scfsi, 4)
                for g, (sc, part2, _bands) in enumerate(grans):
                    w.put(part2, 12)  # part2_3_length == part2: part3 = 0
                    w.put(0, 9)  # big_values
                    w.put((5 * d + 7 * i + 3 * g) % 256, 8)
                    w.put(sc, 4)
                    w.put(0, 1)  # window_switching_flag
                    w.put(0, 15)  # 3 × table_select
                    w.put(0, 4)  # region0_count
                    w.put(0, 3)  # region1_count
                    w.put(0, 3)  # preflag, scalefac_scale, count1table_select
                side = w.bytes_padded(17)
                m = _BitWriter()
                for g, (_sc, _part2, bands) in enumerate(grans):
                    for b, slen in bands:
                        if slen:
                            m.put((3 * d + 5 * i + 7 * g + 11 * b) % (1 << slen), slen)
                main = m.bytes_padded(size - 4 - 17)
                hdr = bytes(
                    (
                        0xFF,
                        0xFB,
                        (9 << 4) | ((d % 3) << 2) | (pad << 1),
                        0xC0,
                    )
                )
                out += hdr + side + main
            return bytes(out)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def decode_mp3_scalefactors(assets: DataFrame) -> DataFrame:
    """REAL Layer III SCALEFACTOR decode via ``mapInPandas`` (round 15
    — part2 of the main data decoded bit-for-bit; after r13's Layer II
    samples and r14's side info, the remaining Layer III boundary is
    now EXACTLY two blocks of spec-table data: the Huffman codeword
    tables 3-B.7 for the spectrum and the synthesis window 3-B.3 —
    all the surrounding machinery is real). Per frame: header walk,
    full side-info parse, then the main-data bit walk — slen1/slen2
    from scalefac_compress (2.4.2.7), 21 long-block scalefactors per
    granule, and the scfsi REUSE rule (granule 1 carries granule 0's
    values for bands in groups whose scfsi bit is set — stateful
    across granules, the part real decoders get wrong first). The
    part2/part3 split is enforced: part2_3_length < the scalefactor
    bit count raises (a real-stream corruption), and the leftover
    part3 bits — the spectrum's Huffman budget — are summed as output.
    Output integers are order-free censuses so the oracle replays the
    closed forms exactly. Constraints stated loudly: mono, no CRC,
    long blocks, main_data_begin=0 (no reservoir assembly here — the
    reservoir LAW is already pinned by d05_mp3_sideinfo)."""
    out_schema = (
        "asset_id bigint, n_frames int, sum_scalefac bigint, "
        "max_scalefac int, n_reused_bands bigint, sum_part2_bits bigint, "
        "sum_part3_bits bigint, sum_global_gain bigint"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        rates = _MP3_RATES
        bitrates = _MP3_BITRATES

        def parse_one(aid, buf: bytes):
            pos = 0
            n = s_sf = mx = reused_n = s_p2 = s_p3 = s_gg = 0
            while pos < len(buf):
                if pos + 4 > len(buf):
                    raise ValueError(f"asset {aid}: truncated header at {pos}")
                b0, b1, b2, b3 = buf[pos : pos + 4]
                if b0 != 0xFF or (b1 & 0xFE) != 0xFA or not (b1 & 1):
                    raise ValueError(f"asset {aid}: lost frame sync at {pos}")
                br_idx, sr_idx, pad = b2 >> 4, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1
                if br_idx in (0, 15) or sr_idx == 3 or (b3 >> 6) != 3:
                    raise ValueError(f"asset {aid}: unsupported frame at {pos}")
                size = 144000 * bitrates[br_idx - 1] // rates[sr_idx] + pad
                if pos + size > len(buf) or size < 21:
                    raise ValueError(f"asset {aid}: truncated frame at {pos}")
                side = _BitReader(buf[pos + 4 : pos + 21])
                mdb = side.get(9)
                if mdb:
                    raise ValueError(
                        f"asset {aid}: bit-reservoir frames not supported "
                        "here (reservoir accounting is d05_mp3_sideinfo)"
                    )
                side.get(5)
                scfsi = side.get(4)
                grans = []
                for _g in range(2):
                    p23 = side.get(12)
                    bv = side.get(9)
                    gg = side.get(8)
                    sc = side.get(4)
                    wsf = side.get(1)
                    if wsf:
                        raise ValueError(
                            f"asset {aid}: window switching unsupported"
                        )
                    side.get(22)
                    side.get(3)
                    if bv:
                        raise ValueError(
                            f"asset {aid}: spectrum decode needs Huffman "
                            "tables 3-B.7 (the stated boundary)"
                        )
                    grans.append((p23, gg, sc))
                main = _BitReader(buf[pos + 21 : pos + size])
                sf0 = [0] * 21
                for g, (p23, gg, sc) in enumerate(grans):
                    s1, s2 = _MP3_SLEN1[sc], _MP3_SLEN2[sc]
                    part2 = 0
                    vals = [0] * 21
                    for grp, (lo, hi) in enumerate(_MP3_SCFSI_BANDS):
                        reuse = g == 1 and ((scfsi >> (3 - grp)) & 1) == 1
                        for b in range(lo, hi):
                            slen = s1 if b <= 10 else s2
                            if reuse:
                                vals[b] = sf0[b]
                                reused_n += 1
                            else:
                                vals[b] = main.get(slen) if slen else 0
                                part2 += slen
                    if g == 0:
                        sf0 = vals
                    if p23 < part2:
                        raise ValueError(
                            f"asset {aid}: part2_3_length {p23} < part2 "
                            f"{part2} (corrupt stream)"
                        )
                    # part3 (the spectrum's bit budget) is walked past:
                    # zero here by fixture, summed as the real budget
                    main.pos += p23 - part2
                    s_sf += sum(vals)
                    mx = max(mx, max(vals))
                    s_p2 += part2
                    s_p3 += p23 - part2
                    s_gg += gg
                n += 1
                pos += size
            if n == 0:
                raise ValueError(f"asset {aid}: no MPEG frames")
            return (n, s_sf, mx, reused_n, s_p2, s_p3, s_gg)

        for pdf in it:
            cols = (
                "asset_id", "n_frames", "sum_scalefac", "max_scalefac",
                "n_reused_bands", "sum_part2_bits", "sum_part3_bits",
                "sum_global_gain",
            )
            rows = {k: [] for k in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                vals = parse_one(aid, bytes(payload))
                for k, v in zip(cols, (aid, *vals)):
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)


# --- D5u: REAL Rice/Golomb residual decode (FLAC subframe core, round 15) -------


def synthesize_rice_audio_assets(docs: DataFrame) -> DataFrame:
    """Rice-coded FIXED-PREDICTOR audio subframes, one per document —
    the lossless-audio core that FLAC/Shorten/ALAC build on: an
    order-2 fixed linear predictor (ŝᵢ = 2·sᵢ₋₁ − sᵢ₋₂, FLAC's public
    fixed-predictor family) leaves small residuals on smooth signals,
    and Rice/Golomb coding (unary quotient + k binary remainder bits,
    FLAC's zigzag sign fold u = 2e / −2e−1) entropy-codes them. The
    CONTAINER here is a minimal private header (magic, n, order, k,
    verbatim warm-up samples) — the claim is the CODING machinery,
    not FLAC framing; both the predictor formulas and Rice coding are
    textbook-public. Closed forms shared with the oracle:

        n_samples = 64 + id % 64;  k = 2 + id % 3
        s(i) = 100 + 3·i + ((7·id + 11·i) mod 5)       (smooth + noise)
        residual e(i) = s(i) − 2·s(i−1) + s(i−2), i ≥ 2
    """
    out_schema = "asset_id bigint, payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def encode_one(d: int) -> bytes:
            n = 64 + d % 64
            k = 2 + d % 3
            s = [100 + 3 * i + ((7 * d + 11 * i) % 5) for i in range(n)]
            w = _BitWriter()
            for i in range(2, n):
                e = s[i] - 2 * s[i - 1] + s[i - 2]
                u = 2 * e if e >= 0 else -2 * e - 1
                q, r = u >> k, u & ((1 << k) - 1)
                for _ in range(q):
                    w.put(0, 1)
                w.put(1, 1)  # unary terminator
                w.put(r, k)
            w.put(0, 0)
            body = bytes(w.buf) + (
                bytes(((w.acc << (8 - w.nbits)) & 0xFF,)) if w.nbits else b""
            )
            return (
                b"RICE"
                + struct.pack("<HBBhh", n, 2, k, s[0], s[1])
                + body
            )

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": [encode_one(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=out_schema)


def decode_rice_audio_features(assets: DataFrame) -> DataFrame:
    """REAL Rice/Golomb decode + fixed-predictor reconstruction via
    ``mapInPandas``: walk the unary-quotient/binary-remainder
    bitstream, unfold the zigzag sign map, and reconstruct samples
    through the order-2 recurrence sᵢ = eᵢ + 2·sᵢ₋₁ − sᵢ₋₂ seeded by
    the verbatim warm-up pair — the exact inverse of the predictor,
    so reconstruction is BIT-EXACT (lossless coding has a closed-form
    oracle by definition). Emits integer censuses of both the decoded
    SAMPLES and the wire-level residuals, plus the actual bitstream
    size, so the oracle pins the entropy-coding arithmetic too. Bad
    magic, stream overrun, and unsupported predictor orders raise
    loudly."""
    out_schema = (
        "asset_id bigint, n_samples int, k int, sum_samples bigint, "
        "max_sample int, sum_abs_residual bigint, max_abs_residual int, "
        "payload_bytes int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def decode_one(aid, buf: bytes):
            if buf[:4] != b"RICE":
                raise ValueError(f"asset {aid}: not a RICE payload")
            n, order, k, s0, s1 = struct.unpack("<HBBhh", buf[4:12])
            if order != 2:
                raise ValueError(f"asset {aid}: only order-2 fixed predictor")
            r = _BitReader(buf[12:])
            total_bits = (len(buf) - 12) * 8
            s = [s0, s1]
            sum_abs_e = max_abs_e = 0
            for _i in range(2, n):
                q = 0
                while True:
                    if r.pos >= total_bits:
                        raise ValueError(f"asset {aid}: Rice stream overrun")
                    if r.get(1):
                        break
                    q += 1
                if r.pos + k > total_bits:
                    raise ValueError(f"asset {aid}: Rice stream overrun")
                u = (q << k) | r.get(k)
                e = (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)
                sum_abs_e += abs(e)
                max_abs_e = max(max_abs_e, abs(e))
                s.append(e + 2 * s[-1] - s[-2])
            return (
                n, k, sum(s), max(s), sum_abs_e, max_abs_e, len(buf),
            )

        for pdf in it:
            cols = (
                "asset_id", "n_samples", "k", "sum_samples", "max_sample",
                "sum_abs_residual", "max_abs_residual", "payload_bytes",
            )
            rows = {c: [] for c in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                vals = decode_one(aid, bytes(payload))
                for c, v in zip(cols, (aid, *vals)):
                    rows[c].append(v)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=out_schema)
