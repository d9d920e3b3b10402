"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched mapInPandas stages
(BASELINE.json north-star extension).

The container has no image/audio codec LIBRARIES, so library-bound
compressed formats (JPEG/MP3/H.264) stay stubbed: ``decode_media`` raises
NotImplementedError for them unless ``fake=True``, in which case a
deterministic fake decoder (seeded by the payload digest) produces feature
vectors with the real schema, partitioning, and batch shape. Everything
the stdlib can genuinely cover runs FOR REAL end-to-end: binary PPM (P6)
images (header parse + pixel stats + numpy nearest-neighbor resample),
8-bit truecolor PNG (r11 — zlib IS the PNG compressor: real chunk CRCs,
DEFLATE, and all five scanline filters, :func:`decode_png`), RIFF/WAVE
audio through the stdlib ``wave`` module, and YUV4MPEG2 video — real
bytes in, real pixels out, including one genuinely COMPRESSED format.

Scale design: payloads stay opaque binary through the plan (never parsed by
Catalyst, never a join key); metadata columns are the pruned/filtered
surface. mapInPandas streams Arrow record batches, so executor memory is
bounded by batch size × payload size, not partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssg_etl_spark.partitioning import fan_out

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Build a media-asset table (schemas.MEDIA_ASSETS shape) using document
    text bytes as stand-in payloads: doc_id → asset, round-robin media type,
    metadata derived from the payload."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.col("text").cast("binary")
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        mt.alias("media_type"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), mt).alias("mime"),
        F.when(mt == "image", (F.col("doc_id") % 640 + 1).cast("int")).alias("width"),
        F.when(mt == "image", (F.col("doc_id") % 480 + 1).cast("int")).alias("height"),
        F.when(mt != "image", (F.col("n_chars") * 100).cast("long")).alias("duration_ms"),
        F.create_map(F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")).alias(
            "meta"
        ),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic fake feature vector from the payload digest."""
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal binary PPM (P6, maxval 255) encoder: the one raster format
    a pure-stdlib pipeline can write AND read back losslessly. ``pixels``
    is raw interleaved RGB, exactly ``3*width*height`` bytes."""
    if width <= 0 or height <= 0:
        raise ValueError("PPM dimensions must be positive")
    if len(pixels) != 3 * width * height:
        raise ValueError(
            f"PPM pixel buffer must be 3*{width}*{height}="
            f"{3 * width * height} bytes, got {len(pixels)}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary PPM (P6): returns (width, height, maxval, pixels).

    Real header grammar: 'P6', then three whitespace-separated decimal
    tokens (width, height, maxval) with '#' comments allowed between
    tokens, then ONE whitespace byte, then raw interleaved RGB. Raises
    ValueError on anything malformed or truncated — a codec error is a
    NULL-row-per-asset decision made by the caller, never a silent one.
    """
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (missing P6 magic)")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header (expected decimal token)")
        tokens.append(int(payload[start:pos]))
    if pos >= len(payload) or not payload[pos : pos + 1].isspace():
        raise ValueError("malformed PPM header (missing raster separator)")
    pos += 1
    width, height, maxval = tokens
    if width <= 0 or height <= 0 or not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM geometry {width}x{height}/{maxval}")
    pixels = payload[pos:]
    if len(pixels) != 3 * width * height:
        raise ValueError(
            f"truncated PPM raster: expected {3 * width * height} bytes, "
            f"got {len(pixels)}"
        )
    return width, height, maxval, pixels


def _ppm_features(payload: bytes) -> list[float]:
    """REAL decode: header dims + whole-raster pixel statistics, shaped to
    the same FEATURE_DIM vector the stub emits. Layout:
    [width, height, n_pixels, mean_byte, min_byte, max_byte, maxval, 1.0]
    (the trailing 1.0 is the codec id — P6 — so mixed-codec corpora stay
    distinguishable in the one feature column)."""
    width, height, maxval, pixels = decode_ppm(payload)
    return [
        float(width),
        float(height),
        float(width * height),
        sum(pixels) / len(pixels),
        float(min(pixels)),
        float(max(pixels)),
        float(maxval),
        1.0,
    ]


# ---------------------------------------------------------------------------
# PNG (r11): REAL compressed image codec on the stdlib alone — zlib
# (DEFLATE) + struct cover the whole format for 8-bit truecolor, so the
# "uncompressed-only" qualifier on the multimodal story falls: encode
# writes genuine IHDR/IDAT/IEND chunks with CRCs, decode verifies CRCs,
# inflates, and reverses all five scanline filters (None/Sub/Up/Average/
# Paeth — the decoder handles any conforming writer, not just ours).
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """REAL PNG encode (8-bit truecolor RGB, filter 0 scanlines, one
    zlib-DEFLATE IDAT): stdlib ``zlib`` + ``struct`` only. ``pixels`` is
    raw interleaved RGB, exactly ``3*width*height`` bytes."""
    import struct
    import zlib

    if width <= 0 or height <= 0:
        raise ValueError("PNG dimensions must be positive")
    if len(pixels) != 3 * width * height:
        raise ValueError(
            f"PNG pixel buffer must be 3*{width}*{height}="
            f"{3 * width * height} bytes, got {len(pixels)}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = 3 * width
    raw = b"".join(
        b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """REAL PNG decode for 8-bit truecolor RGB: chunk walk with CRC
    verification, IDAT concatenation + inflate, and full five-filter
    scanline reconstruction (None/Sub/Up/Average/Paeth per the PNG spec
    §9 reference pseudocode). Returns (width, height, pixels). Raises
    ValueError on anything malformed, truncated, CRC-corrupt, or outside
    the supported subset (bit depth 8, color type 2, no interlace) — a
    poison payload must be inspectable, never mis-parsed."""
    import struct
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (missing signature)")
    pos = 8
    ihdr = None
    idat = []
    seen_iend = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk body")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if ihdr is None or not seen_iend or not idat:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    width, height, depth, ctype_i, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if (depth, ctype_i, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            "unsupported PNG subset: need 8-bit truecolor non-interlaced, "
            f"got depth={depth} color={ctype_i} interlace={interlace}"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = 3 * width
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG raster size mismatch: expected {height * (stride + 1)}"
            f" bytes, got {len(raw)}"
        )
    out = bytearray()
    prev = bytes(stride)
    bpp = 3
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                line[i] = (line[i] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += line
        prev = bytes(line)
    return width, height, bytes(out)


def _png_features(payload: bytes) -> list[float]:
    """REAL decode: IHDR dims + whole-raster pixel statistics after
    inflate+unfilter, shaped to the same FEATURE_DIM vector as PPM.
    Layout mirrors :func:`_ppm_features` with codec id 2.0 (PNG)."""
    width, height, pixels = decode_png(payload)
    return [
        float(width),
        float(height),
        float(width * height),
        sum(pixels) / len(pixels),
        float(min(pixels)),
        float(max(pixels)),
        255.0,
        2.0,
    ]


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> list[float]:
    """Decode one payload into a feature vector.

    The REAL branches handle binary PPM and 8-bit truecolor PNG images
    (pure-stdlib decodes — zlib IS the PNG compressor); remaining
    compressed formats (JPEG, MP3, H.264) need PIL/librosa/ffmpeg,
    unavailable in this environment, and stay intentionally
    unimplemented — substitute the library call at deployment time.
    """
    if fake:
        return _fake_decode(payload)
    if media_type == "image" and payload[:2] == b"P6":
        return _ppm_features(payload)
    if media_type == "image" and payload[:8] == PNG_SIG:
        return _png_features(payload)
    raise NotImplementedError(
        "no codec for this payload in this environment (real decode "
        "supports binary PPM and 8-bit RGB PNG images); use fake=True "
        "for the stub"
    )


PPM_ASSETS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def ppm_assets_from_documents(documents: DataFrame, width: int = 16) -> DataFrame:
    """Synthesize REAL decodable image assets: one binary PPM per document,
    16×(doc_id%4+1) pixels whose raster is the document text's md5 digest
    cycled — an Arrow-batched ENCODE stage, the write-side twin of the
    decode stage, and deterministic from (doc_id, text) alone so an
    engine-independent oracle can replay every derived pixel statistic
    (the raster is WHOLE digest repeats: 3·16·h bytes = 3h·16, so each
    digest byte appears equally often and raster stats equal digest
    stats; width 8 would give 24h bytes — a half digest per odd row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = int(doc_id) % 4 + 1
                n = 3 * width * h
                digest = hashlib.md5(str(text).encode("utf-8")).digest()
                reps = -(-n // len(digest))
                payloads.append(encode_ppm(width, h, (digest * reps)[:n]))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                }
            )

    return fan_out(documents.select("doc_id", "text")).mapInPandas(
        run, PPM_ASSETS_SCHEMA
    )


def png_assets_from_documents(documents: DataFrame, width: int = 16) -> DataFrame:
    """Synthesize REAL compressed image assets: one 8-bit RGB PNG per
    document, same digest-cycled raster as the PPM twin (16×(doc_id%4+1),
    whole md5 repeats) but DEFLATE-compressed through the stdlib encoder
    — so the decode side must genuinely inflate and unfilter to get the
    pixels back, and an engine-independent oracle can still replay every
    pixel statistic from the text digest alone."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = int(doc_id) % 4 + 1
                n = 3 * width * h
                digest = hashlib.md5(str(text).encode("utf-8")).digest()
                reps = -(-n // len(digest))
                payloads.append(encode_png(width, h, (digest * reps)[:n]))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                }
            )

    return fan_out(documents.select("doc_id", "text")).mapInPandas(
        run, PPM_ASSETS_SCHEMA
    )


PNG_ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.IntegerType()),
        T.StructField("sum_byte", T.LongType()),
        T.StructField("min_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
        T.StructField("raster_digest", T.StringType()),
    ]
)


def png_roundtrip(assets: DataFrame) -> DataFrame:
    """Arrow-batched PNG decode proof: per asset, IHDR dims, exact
    integer pixel statistics, and md5 over the lowercase-hex DECODED
    raster — the same digest convention as the PPM resize / Y4M frame
    oracles, so a hash match proves compress→decompress→unfilter
    returned every original byte."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_png(payload)
                rows.append(
                    {
                        "asset_id": int(aid),
                        "width": w,
                        "height": h,
                        "n_pixels": w * h,
                        "sum_byte": sum(px),
                        "min_byte": min(px),
                        "max_byte": max(px),
                        "raster_digest": hashlib.md5(
                            px.hex().encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return fan_out(assets.select("asset_id", "payload")).mapInPandas(
        run, PNG_ROUNDTRIP_SCHEMA
    )


def extract_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    mapInPandas so each Python call handles a whole record batch; the
    returned frame carries a fixed-dim ``array<double>`` feature column
    ready for the similarity operators.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads yield NULL features/sizes (a crashed codec call
            # would fail the whole job; a null row is inspectable output).
            feats = [
                None if p is None else decode_media(p, m, fake=fake)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload"].map(
                        lambda p: None if p is None else len(p)
                    ),
                    "feature": feats,
                }
            )

    # fan_out: mapInPandas parallelism == input partitions; a single-file
    # scan would run every Python batch on one core.
    return fan_out(assets.select("asset_id", "media_type", "payload")).mapInPandas(
        run, FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("payload_bytes", T.LongType()),
    ]
)


def _ppm_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL resample: nearest-neighbor resize of a binary PPM through the
    pure-stdlib codec (decode → numpy index-gather → encode).

    Standard pixel-center mapping: target index i reads source index
    ``floor((i + 0.5) * src / dst)`` — the OpenCV/PIL NEAREST convention,
    exact in integer arithmetic as ``((2i + 1) * src) // (2 * dst)`` (no
    float rounding anywhere, so the output is engine-replayable
    byte-for-byte). Vectorized as one numpy fancy-index over the
    (h, w, 3) raster view — no Python per-pixel loop."""
    import numpy as np

    w0, h0, maxval, pixels = decode_ppm(payload)
    if maxval != 255:
        raise ValueError(f"resample requires maxval 255, got {maxval}")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h0, w0, 3)
    rows = (2 * np.arange(height, dtype=np.int64) + 1) * h0 // (2 * height)
    cols = (2 * np.arange(width, dtype=np.int64) + 1) * w0 // (2 * width)
    return encode_ppm(width, height, arr[rows][:, cols].tobytes())


def _png_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL resample of a compressed image: PNG decode (inflate +
    unfilter) → the same exact-integer nearest-neighbor gather as
    :func:`_ppm_resize` → PNG re-encode (DEFLATE). The decoded OUTPUT
    raster is engine-replayable byte-for-byte (the payload bytes are
    not — they depend on the zlib encoder — which is why the registered
    query digests the decoded raster, not the container)."""
    import numpy as np

    w0, h0, pixels = decode_png(payload)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h0, w0, 3)
    rows = (2 * np.arange(height, dtype=np.int64) + 1) * h0 // (2 * height)
    cols = (2 * np.arange(width, dtype=np.int64) + 1) * w0 // (2 * width)
    return encode_png(width, height, arr[rows][:, cols].tobytes())


def _real_resize(payload: bytes, width: int, height: int) -> bytes:
    """Codec-dispatching real resample: PPM and PNG payloads route to
    their stdlib codecs; anything else raises the documented
    NotImplementedError (substitute Pillow at deployment)."""
    if payload[:2] == b"P6":
        return _ppm_resize(payload, width, height)
    if payload[:8] == PNG_SIG:
        return _png_resize(payload, width, height)
    raise NotImplementedError(
        "no resample codec for this payload (real path supports binary "
        "PPM and 8-bit RGB PNG); use fake=True for the stub"
    )


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resample: a digest-seeded byte
    stream sized ~3 bytes/pixel (RGB), so downstream size accounting and
    batch-memory behavior match a real resize."""
    out_len = max(1, width * height * 3)
    seed = hashlib.md5(payload).digest()
    reps = -(-out_len // len(seed))
    return (seed * reps)[:out_len]


def resize_images(
    assets: DataFrame, width: int = 64, height: int = 64, fake: bool = True
) -> DataFrame:
    """Arrow-batched image resize stage (image assets only).

    Same plumbing contract as :func:`extract_features`: mapInPandas over
    (asset_id, payload) record batches, binary in → binary out, executor
    memory bounded by batch size × payload size. ``fake=False`` runs the
    REAL pure-stdlib path — binary PPM or 8-bit RGB PNG in,
    nearest-neighbor-resampled same-format out (:func:`_real_resize`
    dispatches by magic bytes); other raster codecs substitute
    PIL/Pillow-SIMD at deployment behind the same batch signature.
    ``fake=True`` keeps the digest-seeded stand-in for corpora whose
    formats this environment cannot decode. NULL payloads pass through as
    NULL rows either way.
    """
    if width <= 0 or height <= 0:
        raise ValueError("target dimensions must be positive")
    resample = _fake_resize if fake else _real_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                None if p is None else resample(p, width, height)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                    "payload_bytes": [
                        None if p is None else len(p) for p in resized
                    ],
                }
            )

    images = assets.filter(F.col("media_type") == "image")
    return fan_out(images.select("asset_id", "payload")).mapInPandas(
        run, RESIZED_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video assets: one row per planned sample
    timestamp (the decode itself happens in extract_features). Pure
    DataFrame: sequence+explode, no Python."""
    video = assets.filter(F.col("media_type") == "video")
    # explode_outer: an asset with NULL duration keeps one row (sample_ms
    # NULL) instead of silently vanishing from the plan.
    return video.select(
        "asset_id",
        F.explode_outer(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("sample_ms"),
    )


# ---------------------------------------------------------------------------
# Audio (r10): REAL WAV codec end-to-end via the stdlib ``wave`` module —
# the audio leg of the multimodal story, un-faked like the PPM image leg.
# Waveforms are synthesized from a pure-integer formula of (asset_id, i),
# so every derived feature is engine-independent and an ANSI-SQL oracle
# replays the whole pipeline: formula → int16 PCM encode → wave-module
# decode → integer feature aggregation.
# ---------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000
WAV_BASE_SAMPLES = 2000

WAV_ASSETS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def wav_sample_count(asset_id: int) -> int:
    """Variable clip length, SQL-replayable: base + (id % 5)·32 frames."""
    return WAV_BASE_SAMPLES + (int(asset_id) % 5) * 32


def wav_samples(asset_id: int, n: int) -> "list[int]":
    """Deterministic int16 waveform: s_i = ((id·31 + i·7919) mod 65536)
    − 32768 — pure non-negative integer arithmetic, identical in Python
    and SQL (7919 is prime to 65536, so the samples sweep the full int16
    range with sign changes for the zero-crossing feature)."""
    a = int(asset_id)
    return [((a * 31 + i * 7919) % 65536) - 32768 for i in range(n)]


def encode_wav(samples: "list[int]", sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """REAL RIFF/WAVE encode (mono, 16-bit PCM) through the stdlib
    ``wave`` writer — genuine container bytes, not a stand-in."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> "tuple[int, 'object']":
    """REAL WAV decode via the stdlib reader: returns (sample_rate,
    int16 numpy array). Raises ValueError on anything but mono 16-bit
    PCM — a poison payload must be inspectable, not mis-parsed."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"expected mono 16-bit PCM, got channels={w.getnchannels()} "
                f"sampwidth={w.getsampwidth()}"
            )
        frames = w.readframes(w.getnframes())
        return w.getframerate(), np.frombuffer(frames, dtype="<i2")


def wav_assets_from_documents(documents: DataFrame) -> DataFrame:
    """Synthesize REAL decodable audio assets: one mono 16-bit PCM WAV
    per document, samples from :func:`wav_samples` — the audio twin of
    :func:`ppm_assets_from_documents` (encode stage, Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav(wav_samples(d, wav_sample_count(d)))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "audio",
                    "payload": payloads,
                }
            )

    return fan_out(documents.select("doc_id")).mapInPandas(
        run, WAV_ASSETS_SCHEMA
    )


def audio_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction over WAV payloads through
    the REAL decoder: per asset, the integer sufficient statistics a
    curation pipeline filters on — energy (Σ s²), peak amplitude,
    zero-crossing count (the classic cheap voicing/noise discriminant),
    duration. All features are exact integers, so the SQL oracle matches
    hash-for-hash with no float discipline needed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                sr, s = decode_wav(payload)
                s64 = s.astype(np.int64)
                n = int(s64.shape[0])
                rows.append(
                    {
                        "asset_id": int(aid),
                        "sample_rate": sr,
                        "n_samples": n,
                        "duration_ms": n * 1000 // sr,
                        "sum_sq": int((s64 * s64).sum()),
                        "peak": int(np.abs(s64).max()) if n else 0,
                        "zero_crossings": int(
                            ((s64[:-1] < 0) != (s64[1:] < 0)).sum()
                        )
                        if n > 1
                        else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return fan_out(assets.select("asset_id", "payload")).mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video (r10): REAL Y4M (YUV4MPEG2) codec end-to-end — the uncompressed
# video container of mjpegtools/ffmpeg, pure header + raw frames, so the
# whole decode/frame-sample path runs un-faked like PPM and WAV. Frame
# rasters are whole-md5-digest repeats of (text, frame_index), making
# every sampled frame digest SQL-replayable.
# ---------------------------------------------------------------------------

Y4M_W, Y4M_H = 16, 8  # 3·16·8 = 384 = 24 whole md5 digests per frame
Y4M_HEADER = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (Y4M_W, Y4M_H)
Y4M_FRAME_BYTES = 3 * Y4M_W * Y4M_H

Y4M_ASSETS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame_index", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def encode_y4m(frames: "list[bytes]") -> bytes:
    """REAL YUV4MPEG2 encode: stream header + ``FRAME\\n`` + raw C444
    planes per frame. Refuses wrong-sized rasters."""
    out = [Y4M_HEADER]
    for f in frames:
        if len(f) != Y4M_FRAME_BYTES:
            raise ValueError(
                f"frame must be {Y4M_FRAME_BYTES} bytes, got {len(f)}"
            )
        out.append(b"FRAME\n")
        out.append(f)
    return b"".join(out)


def decode_y4m(payload: bytes) -> "tuple[int, int, list[bytes]]":
    """REAL Y4M decode: parse the stream header (W/H tokens), then split
    fixed-size frames at their FRAME markers. Raises ValueError on a
    foreign signature, unsupported geometry, or a truncated frame — a
    poison payload must be inspectable, never mis-sliced."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    header = payload[:nl].decode("ascii", "replace").split(" ")
    dims = {t[0]: t[1:] for t in header[1:] if t}
    if int(dims.get("W", -1)) != Y4M_W or int(dims.get("H", -1)) != Y4M_H:
        raise ValueError(f"unsupported geometry {dims.get('W')}x{dims.get('H')}")
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 6] != b"FRAME\n":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        pos += 6
        frame = payload[pos : pos + Y4M_FRAME_BYTES]
        if len(frame) != Y4M_FRAME_BYTES:
            raise ValueError("truncated frame")
        frames.append(frame)
        pos += Y4M_FRAME_BYTES
    return Y4M_W, Y4M_H, frames


def y4m_frame_raster(text: str, frame_index: int) -> bytes:
    """Deterministic frame raster: whole repeats of
    md5(text ⊕ '-f' ⊕ index) — 24 digests fill one C444 frame exactly,
    so frame digests are replayable from the document text alone."""
    digest = hashlib.md5(f"{text}-f{frame_index}".encode("utf-8")).digest()
    return digest * (Y4M_FRAME_BYTES // len(digest))


def y4m_assets_from_documents(documents: DataFrame) -> DataFrame:
    """Synthesize REAL decodable video assets: one Y4M clip per document
    with 2 + doc_id % 4 frames — the video twin of the PPM/WAV encode
    stages (Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_y4m(
                    [
                        y4m_frame_raster(str(text), fi)
                        for fi in range(2 + int(doc_id) % 4)
                    ]
                )
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": "video",
                    "payload": payloads,
                }
            )

    return fan_out(documents.select("doc_id", "text")).mapInPandas(
        run, Y4M_ASSETS_SCHEMA
    )


def sample_frames(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Arrow-batched frame sampling through the REAL decoder: every
    ``every_n``-th frame of each clip (always including frame 0) becomes
    one output row with its md5 digest — the decode-side realization of
    ``frame_sample_plan``'s plumbing. Bounded memory: one clip's frames
    at a time, rows carry digests, never rasters."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _w, _h, frames = decode_y4m(bytes(payload))
                for fi in range(0, len(frames), every_n):
                    rows.append(
                        {
                            "asset_id": int(aid),
                            "n_frames": len(frames),
                            "frame_index": fi,
                            "payload_bytes": len(payload),
                            "frame_digest": hashlib.md5(
                                frames[fi].hex().encode("ascii")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    return fan_out(assets.select("asset_id", "payload")).mapInPandas(
        run, FRAME_FEATURES_SCHEMA
    )
