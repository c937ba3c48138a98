"""Multimodal columns: images/audio/video as opaque ``binary`` + typed
metadata, processed through Arrow-batched ``mapInPandas`` (the
training-data-pipeline surface).

Codec status: **all three media types have REAL dependency-free codecs** —
pure-numpy parsers of public container specs: uncompressed WAV (RIFF/PCM)
audio (``decode_audio(backend='wav')``), uncompressed BMP
(BITMAPINFOHEADER, 8/24/32-bpp) images (``decode_image(backend='bmp')``),
and uncompressed AVI (RIFF 'AVI ', DIB '00db' frames) video
(``decode_video(backend='avi')``). Compressed formats need external codecs
this container doesn't ship: ``decode_image(backend='pil')`` raises
``NotImplementedError`` unless Pillow imports, compressed AVI streams
(``00dc`` / nonzero biCompression) are rejected per-row, and the
deterministic ``FAKE`` container format (fully specified below) remains as
the plumbing-level fixture format for schema/partition/UDF-shape tests.

FAKE container layout (little-endian):
    bytes 0-3   magic  b"FAKE"
    byte  4     media type: 0=image, 1=audio, 2=video
    bytes 5-8   width  (int32; sample-rate for audio)
    bytes 9-12  height (int32; channels for audio)
    bytes 13-16 n_frames (int32; 1 for still images)
    bytes 17-   payload (width*height uint8 samples per frame, truncated ok)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FAKE"
MEDIA_TYPES = {0: "image", 1: "audio", 2: "video"}

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("valid", T.BooleanType()),
    ]
)

STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def make_fake_payload(
    doc_id: int, text: str, media_type: int = 0, n_frames: int = 1
) -> bytes:
    """Deterministic fake media object derived from (doc_id, text)."""
    import hashlib

    w = 8 + (doc_id % 9)
    h = 8 + (len(text) % 9)
    seed = hashlib.md5(f"{doc_id}:{text[:32]}".encode()).digest()
    need = w * h * n_frames
    body = (seed * (need // len(seed) + 1))[:need]
    return MAGIC + struct.pack("<biii", media_type, w, h, n_frames) + body


def attach_fake_payloads(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary); media type cycles by doc_id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_fake_payload(
                    int(r.doc_id), r.text, int(r.doc_id) % 3, 1 + int(r.doc_id) % 4
                )
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(gen, schema)


def _parse_header(payload: bytes):
    if payload is None or len(payload) < 17 or payload[:4] != MAGIC:
        return None
    mt, w, h, nf = struct.unpack("<biii", payload[4:17])
    return mt, w, h, nf


def _le_int32(col, pos: int):
    """Little-endian int32 at 1-based byte offset ``pos`` of a binary column,
    decoded JVM-side: hex the 4 bytes, swap the pairs, base-16 parse.

    The parse goes through ``long`` (any unsigned 32-bit value fits) and
    reinterprets the top bit to match ``struct.unpack('<i')``'s *signed*
    semantics. Casting the conv() result straight to ``int`` is a trap under
    ANSI mode (Spark 4 default): a corrupt-but-magic-valid header with the
    sign bit set (>= 2³¹) would throw CAST_INVALID_INPUT and kill the whole
    job, where this operator's contract is graceful per-row handling."""
    hx = F.hex(F.substring(col, pos, 4))
    le = F.concat(
        F.substring(hx, 7, 2),
        F.substring(hx, 5, 2),
        F.substring(hx, 3, 2),
        F.substring(hx, 1, 2),
    )
    v = F.conv(le, 16, 10).cast("long")
    return F.when(v >= 2**31, v - 2**32).otherwise(v).cast("int")


def extract_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata from the binary container header (no full decode).

    Fully native: the fixed 17-byte prefix is parsed with substring/hex/conv
    column expressions, so header extraction over billions of objects stays
    on the whole-stage-codegen path — no Python operator, no Arrow transfer
    of the (large) payload bytes to a worker process.
    """
    p = F.col("payload")
    valid = (
        p.isNotNull() & (F.length(p) >= 17) & (F.substring(p, 1, 4) == F.lit(MAGIC))
    )
    mt = F.conv(F.hex(F.substring(p, 5, 1)), 16, 10).cast("int")
    media_type = (
        F.when(mt == 0, "image")
        .when(mt == 1, "audio")
        .when(mt == 2, "video")
        .otherwise("unknown")
    )
    return media.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(valid, media_type).alias("media_type"),
        F.when(valid, _le_int32(p, 6)).alias("width"),
        F.when(valid, _le_int32(p, 10)).alias("height"),
        F.when(valid, _le_int32(p, 14)).alias("n_frames"),
        F.coalesce(F.length(p).cast("long"), F.lit(0)).alias("payload_bytes"),
        valid.alias("valid"),
    )


def decode_image(media: DataFrame, backend: str = "fake") -> DataFrame:
    """Decode + per-object intensity stats.

    ``backend='bmp'`` is a REAL codec: uncompressed BMP parsed with pure
    numpy (``decode_bmp_bytes``) — emits BMP_STATS_SCHEMA rows, skipping
    invalid/compressed payloads per-row.  ``backend='pil'`` requires Pillow
    (absent in this container → NotImplementedError, by design) for
    compressed formats; ``backend='fake'`` interprets the FAKE payload as
    raw uint8 samples — numpy-vectorized per object.
    """
    if backend == "bmp":

        def gen_bmp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    parsed = decode_bmp_bytes(r.payload)
                    if parsed is None:
                        continue
                    w, h, bpp, x = parsed
                    rows.append(
                        (
                            int(r.doc_id),
                            w,
                            h,
                            bpp,
                            float(np.mean(x)),
                            float(np.std(x)),
                            int(x.size),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in BMP_STATS_SCHEMA.fields]
                )

        return media.mapInPandas(gen_bmp, BMP_STATS_SCHEMA)
    if backend == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real image decode needs Pillow, which is not installed; "
                "use backend='bmp' (built-in, uncompressed) or install "
                "Pillow for compressed formats"
            ) from e

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                hdr = _parse_header(r.payload)
                if hdr is None:
                    continue
                mt, w, h, nf = hdr
                body = np.frombuffer(r.payload, dtype=np.uint8, offset=17)
                if len(body) == 0:
                    continue
                x = body.astype(np.float64)
                rows.append(
                    (
                        int(r.doc_id),
                        MEDIA_TYPES.get(mt, "unknown"),
                        float(np.mean(x)),
                        float(np.std(x)),
                        int(len(x)),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in STATS_SCHEMA.fields])

    return media.mapInPandas(gen, STATS_SCHEMA)


# --- real image codec: uncompressed BMP, pure numpy --------------------------

BMP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bpp", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
        T.StructField("n_pixels", T.LongType()),
    ]
)


def make_bmp_payload(doc_id: int, width: int = 16, height: int = 12, bpp: int = 24) -> bytes:
    """A real, canonical BMP file (BITMAPINFOHEADER, uncompressed, bottom-up)
    with deterministic pixel content derived from ``doc_id``."""
    import hashlib

    if bpp not in (8, 24, 32):
        raise ValueError(bpp)
    seed = int.from_bytes(hashlib.md5(f"bmp:{doc_id}".encode()).digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    bytes_pp = bpp // 8
    row_raw = width * bytes_pp
    row_padded = (row_raw + 3) & ~3
    palette = b""
    if bpp == 8:  # 8-bpp BMPs carry a 256-entry BGRA palette; use grayscale
        palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
    rows = []
    for _ in range(height):
        row = rng.integers(0, 256, size=row_raw, dtype=np.uint8).tobytes()
        rows.append(row + b"\x00" * (row_padded - row_raw))
    data = b"".join(rows)
    offset = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(data), 2835, 2835,
        256 if bpp == 8 else 0, 0,
    )
    header = b"BM" + struct.pack("<IHHI", offset + len(data), 0, 0, offset)
    return header + info + palette + data


def decode_bmp_bytes(payload: bytes):
    """Pure-numpy BMP parse → (width, height, bpp, intensity float64 array)
    or None for invalid/compressed/unsupported payloads.

    Spec (public): 14-byte file header ('BM', file size, reserved, pixel
    offset) + BITMAPINFOHEADER (size≥40: width i32, height i32 — positive
    means bottom-up, irrelevant to whole-image stats — planes, bpp,
    compression (0 = BI_RGB only here)); pixel rows padded to 4 bytes.
    Intensity is the mean of a pixel's channels (8-bpp: the palette-free
    raw index, the grayscale convention; 24/32-bpp: mean of B,G,R —
    the alpha byte of 32-bpp is excluded)."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    (offset,) = struct.unpack("<I", payload[10:14])
    hdr_size, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if hdr_size < 40 or compression != 0 or bpp not in (8, 24, 32):
        return None
    if w <= 0 or h == 0 or planes != 1:
        return None
    height = abs(h)
    bytes_pp = bpp // 8
    row_raw = w * bytes_pp
    row_padded = (row_raw + 3) & ~3
    need = offset + row_padded * height
    if len(payload) < need:
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_padded * height, offset=offset
    ).reshape(height, row_padded)[:, :row_raw]
    if bpp == 8:
        x = rows.astype(np.float64).ravel()
    else:
        px = rows.reshape(height, w, bytes_pp).astype(np.float64)
        x = px[:, :, :3].mean(axis=2).ravel()  # B,G,R; drop 32-bpp alpha
    return int(w), height, int(bpp), x


# --- real audio codec: uncompressed WAV (RIFF/PCM), pure numpy ---------------

WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("std_amp", T.DoubleType()),
        T.StructField("peak_amp", T.DoubleType()),
    ]
)


def make_wav_payload(
    doc_id: int,
    n_frames: int = 256,
    sample_rate: int = 8000,
    channels: int = 1,
    bits: int = 16,
) -> bytes:
    """A real, canonical RIFF/WAVE file (PCM) with deterministic content
    derived from ``doc_id`` — the generator side of the round-trip test."""
    import hashlib

    if bits not in (8, 16, 32):
        raise ValueError(bits)
    n = n_frames * channels
    seed = int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    if bits == 8:
        pcm = rng.integers(0, 256, size=n, dtype=np.uint8)  # 8-bit WAV is unsigned
    elif bits == 16:
        pcm = rng.integers(-(2**15), 2**15, size=n, dtype=np.int64).astype("<i2")
    else:
        pcm = rng.integers(-(2**31), 2**31, size=n, dtype=np.int64).astype("<i4")
    data = pcm.tobytes()
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_bytes(payload: bytes):
    """Pure-numpy RIFF/WAVE parse of one payload → (meta, samples float64)
    or None when the container is invalid/compressed — the scalar kernel
    both the Spark operator and the test's independent reference share is
    deliberately NOT this function in the test (the test recomputes stats
    straight from the generator's PCM array).

    Spec (public): RIFF header = b'RIFF' <u32 size> b'WAVE'; then chunks of
    (id:4, size:u32le, data[, pad to even]); 'fmt ' = audio_format u16 (1 =
    PCM), channels u16, sample_rate u32, byte_rate u32, block_align u16,
    bits u16; 'data' = the PCM frames. 8-bit is unsigned, 16/32-bit signed
    little-endian."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(chunk) >= 16:
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or channels < 1 or bits not in (8, 16, 32):
        return None  # compressed/extensible WAV is out of scope (PCM only)
    width = bits // 8
    n = len(data) // (width * channels) * channels  # whole frames only
    if n == 0:
        return None
    dt = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
    x = np.frombuffer(data, dtype=dt, count=n).astype(np.float64)
    if bits == 8:
        x = x - 128.0  # center unsigned 8-bit at zero like signed widths
    meta = (int(sample_rate), int(channels), int(bits), n // channels)
    return meta, x


def decode_audio(media: DataFrame, backend: str = "wav") -> DataFrame:
    """Decode audio payloads + per-object amplitude stats.

    ``backend='wav'`` is the REAL codec: uncompressed RIFF/PCM parsed with
    pure numpy inside Arrow-batched ``mapInPandas`` — vectorized per object,
    graceful per-row handling (invalid/compressed containers are skipped,
    never kill the job). Stats are computed on raw sample amplitudes
    (8-bit recentred at zero) so they are exact integers in float64.

    Scale shape: mapInPandas streams Arrow batches — no shuffle at all; the
    operator is embarrassingly parallel over whatever partitioning the
    payload table already has, and per-batch memory is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size.
    """
    if backend != "wav":
        raise NotImplementedError(
            f"audio backend {backend!r} not available; 'wav' (RIFF/PCM) is "
            "the built-in dependency-free codec"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                parsed = decode_wav_bytes(r.payload)
                if parsed is None:
                    continue
                (rate, ch, bits, n_frames), x = parsed
                rows.append(
                    (
                        int(r.doc_id),
                        rate,
                        ch,
                        bits,
                        int(n_frames),
                        float(n_frames / rate),
                        float(np.mean(x)),
                        float(np.std(x)),
                        float(np.max(np.abs(x))),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_STATS_SCHEMA.fields]
            )

    return media.mapInPandas(gen, WAV_STATS_SCHEMA)


def sample_frames(meta: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video objects: one row per kept frame
    (native sequence+explode; no Python).

    Filters to ``n_frames >= 1`` first: a corrupt-but-magic-valid header can
    carry a negative frame count, and ``sequence(0, n_frames-1, k)`` with a
    negative stop raises at runtime rather than yielding an empty array."""
    return (
        meta.filter((F.col("media_type") == "video") & (F.col("n_frames") >= 1))
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(int(every_k))
                )
            ),
        )
        .select("doc_id", "frame_idx", "width", "height")
    )


AUDIO_CHANNEL_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("prev_x", T.LongType()),
        T.StructField("prev_ts_us", T.LongType()),
    ]
)


def audio_channel_frame(media: DataFrame) -> DataFrame:
    """Decoded PCM as the ENGINE'S OWN channel frame — the multimodal column
    flowing into the same tier feature algebra as transcripts.

    Each mono WAV payload explodes to one row per sample with the adjacency
    columns :func:`~.features.aggregate_tier` needs: ``conv_id =
    'doc:<id>'``, ``channel = 'audio_amp'``, ``turn_idx = i``, ``ts_us =
    i·10⁶ // rate`` (integer floor — strictly increasing for rate ≤ 1 MHz),
    ``x`` the integer amplitude (exact: PCM values are integers, 8-bit
    recentred by an exact −128).  The output feeds ``features_from_turns`` /
    the rollup cascade unchanged, so A1–A8 (and the tier merge algebra) are
    computed over audio with the IDENTICAL contract and the numpy oracle
    gates it bitwise (tests/test_multimodal.py).

    Stereo/multi-channel payloads are skipped — interleaved samples are
    distinct series and silently concatenating them would corrupt adjacency
    features (zc, lag); invalid/compressed containers are skipped as in
    :func:`decode_audio`.

    Scale shape: mapInPandas, no shuffle — partition-parallel over the
    payload table; downstream tier aggregation adds its usual single
    exchange.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                parsed = decode_wav_bytes(r.payload)
                if parsed is None:
                    continue
                (rate, ch, _bits, _n_frames), x = parsed
                if ch != 1:
                    continue
                xi = x.astype(np.int64)
                i = np.arange(len(xi), dtype=np.int64)
                ts = i * 1_000_000 // rate
                outs.append(
                    pd.DataFrame(
                        {
                            "conv_id": f"doc:{int(r.doc_id)}",
                            "channel": "audio_amp",
                            "turn_idx": i.astype(np.int32),
                            "ts_us": ts,
                            "x": xi,
                            "prev_x": pd.Series(xi).shift(1).astype("Int64"),
                            "prev_ts_us": pd.Series(ts).shift(1).astype("Int64"),
                        }
                    )
                )
            yield (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame(
                    {f.name: [] for f in AUDIO_CHANNEL_SCHEMA.fields}
                )
            )

    return media.mapInPandas(gen, AUDIO_CHANNEL_SCHEMA)


# --- real video codec: uncompressed AVI (RIFF 'AVI ', DIB frames), numpy -----

AVI_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bpp", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def make_avi_payload(
    doc_id: int,
    n_frames: int = 8,
    width: int = 16,
    height: int = 12,
    bpp: int = 24,
    rate: int = 10,
    scale: int = 1,
) -> bytes:
    """A real, canonical AVI file (RIFF 'AVI ', single 'vids' stream with
    the 'DIB ' handler = uncompressed device-independent bitmap frames) with
    deterministic pixel content derived from ``doc_id``.

    Container layout is the public AVI RIFF spec: ``RIFF('AVI ')`` holding
    ``LIST('hdrl')`` = ``avih`` MainAVIHeader + ``LIST('strl')`` =
    ``strh`` AVIStreamHeader + ``strf`` BITMAPINFOHEADER, then
    ``LIST('movi')`` with one ``00db`` chunk per frame (bottom-up rows
    padded to 4 bytes — the same DIB row layout BMP uses). The optional
    ``idx1`` index is omitted (it is a seek aid, not part of frame data).
    """
    import hashlib

    if bpp not in (8, 24, 32):
        raise ValueError(bpp)
    seed = int.from_bytes(hashlib.md5(f"avi:{doc_id}".encode()).digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    bytes_pp = bpp // 8
    row_raw = width * bytes_pp
    row_padded = (row_raw + 3) & ~3
    frame_size = row_padded * height

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    us_per_frame = 1_000_000 * scale // rate
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, frame_size * rate // max(scale, 1), 0, 0x10,  # AVIF_HASINDEX off; 0x10=WASCAPTUREFILE (benign)
        n_frames, 0, 1, frame_size, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0, 0, scale, rate, 0, n_frames, frame_size, 0, 0,
            0, 0, width, height,
        )
    )
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256)) if bpp == 8 else b""
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, frame_size, 0, 0,
        256 if bpp == 8 else 0, 0,
    ) + palette
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    frames = []
    for _ in range(n_frames):
        rows = []
        for _ in range(height):
            row = rng.integers(0, 256, size=row_raw, dtype=np.uint8).tobytes()
            rows.append(row + b"\x00" * (row_padded - row_raw))
        frames.append(chunk(b"00db", b"".join(rows)))
    movi = lst(b"movi", b"".join(frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, body_start, body_size) walking a
    RIFF chunk sequence with word alignment."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            return  # truncated chunk: stop cleanly
        if cid == b"LIST" and size >= 4:
            yield cid, buf[body : body + 4], body + 4, size - 4
        else:
            yield cid, None, body, size
        pos = body + size + (size & 1)


def decode_avi_bytes(payload: bytes):
    """Pure-numpy parse of one uncompressed AVI payload →
    ``((width, height, bpp, rate, scale, n_frames), frames)`` where
    ``frames`` is a list of uint8 arrays — shape ``(h, w)`` for 8-bpp,
    ``(h, w, 3)`` B,G,R for 24/32-bpp (alpha dropped) — or ``None`` for
    invalid/compressed/non-video payloads.

    Spec (public AVI RIFF): see :func:`make_avi_payload`. Only
    ``BI_RGB`` (biCompression=0) DIB frames are in scope; a ``00dc``
    (compressed-frame) chunk or a nonzero biCompression rejects the object.
    A ``00db`` chunk whose size differs from the header's frame geometry is
    skipped (graceful per-frame handling), as are unknown chunks (JUNK,
    idx1, odd-sized vendor chunks) via word-aligned walking.
    """
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    fmt = None  # (width, height, bpp)
    timing = None  # (rate, scale)
    frames = []
    compressed = False

    def walk(pos, end, depth=0):
        nonlocal fmt, timing, compressed
        for cid, ltype, body, size in _riff_chunks(payload, pos, end):
            if cid == b"LIST":
                walk(body, body + size, depth + 1)
            elif cid == b"strh" and size >= 56:
                fcc_type = payload[body : body + 4]
                if fcc_type == b"vids":
                    s_scale, s_rate = struct.unpack(
                        "<II", payload[body + 20 : body + 28]
                    )
                    timing = (s_rate, s_scale)
            elif cid == b"strf" and size >= 40 and fmt is None:
                hdr_size, w, h = struct.unpack("<Iii", payload[body : body + 12])
                planes, bpp = struct.unpack("<HH", payload[body + 12 : body + 16])
                (compression,) = struct.unpack("<I", payload[body + 16 : body + 20])
                if hdr_size >= 40 and planes == 1 and w > 0 and h != 0:
                    if compression != 0 or bpp not in (8, 24, 32):
                        compressed = True
                    else:
                        fmt = (w, abs(h), bpp)
            elif cid[2:4] == b"dc":
                compressed = True
            elif cid[2:4] == b"db":
                frames.append((body, size))

    walk(12, len(payload))
    if compressed or fmt is None or timing is None:
        return None
    w, h, bpp = fmt
    rate, scale = timing
    if rate <= 0 or scale <= 0:
        return None
    bytes_pp = bpp // 8
    row_raw = w * bytes_pp
    row_padded = (row_raw + 3) & ~3
    out = []
    for body, size in frames:
        if size != row_padded * h:
            continue  # geometry mismatch: skip the frame, keep the object
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_padded * h, offset=body
        ).reshape(h, row_padded)[:, :row_raw]
        if bpp == 8:
            out.append(rows.copy())
        else:
            out.append(rows.reshape(h, w, bytes_pp)[:, :, :3].copy())
    if not out:
        return None
    return (w, h, bpp, rate, scale, len(out)), out


def decode_video(media: DataFrame, backend: str = "avi") -> DataFrame:
    """Decode video payloads + per-object intensity stats.

    ``backend='avi'`` is the REAL codec: uncompressed RIFF/AVI with DIB
    frames parsed with pure numpy inside Arrow-batched ``mapInPandas`` —
    the same dependency-free-public-container approach as
    ``decode_audio('wav')`` / ``decode_image('bmp')``. Intensity follows
    the BMP convention (8-bpp: raw index; 24/32-bpp: per-pixel mean of
    B,G,R, alpha excluded); invalid/compressed containers are skipped
    per-row, never kill the job.

    Scale shape: mapInPandas streams Arrow batches — no shuffle; per-batch
    memory is bounded by arrow batch size × payload size.
    """
    if backend != "avi":
        raise NotImplementedError(
            f"video backend {backend!r} not available; 'avi' (RIFF/DIB) is "
            "the built-in dependency-free codec"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                parsed = decode_avi_bytes(r.payload)
                if parsed is None:
                    continue
                (w, h, bpp, rate, scale, n_frames), frames = parsed
                if bpp == 8:
                    x = np.concatenate([f.astype(np.float64).ravel() for f in frames])
                else:
                    x = np.concatenate(
                        [f.astype(np.float64).mean(axis=2).ravel() for f in frames]
                    )
                rows.append(
                    (
                        int(r.doc_id), w, h, bpp, n_frames,
                        float(rate / scale),
                        float(n_frames * scale / rate),
                        float(np.mean(x)), float(np.std(x)), len(x),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AVI_STATS_SCHEMA.fields]
            )

    return media.mapInPandas(gen, AVI_STATS_SCHEMA)


def video_channel_frame(media: DataFrame) -> DataFrame:
    """Decoded AVI frames as the ENGINE'S OWN channel frame — the video
    column flowing into the same tier feature algebra as transcripts and
    audio (:func:`audio_channel_frame`).

    One row per frame: ``conv_id = 'doc:<id>'``, ``channel = 'video_luma'``,
    ``turn_idx = frame_idx``, ``ts_us = frame_idx · 10⁶ · scale // rate``
    (integer floor — strictly increasing for fps ≤ 1e6), ``x`` the frame's
    EXACT integer luma mass: the sum of every pixel-channel byte (padding
    and 32-bpp alpha excluded). Integer x keeps the downstream
    sufficient-stats algebra exact, so ``features_from_turns`` output is
    bit-identical to the independent numpy oracle — the identical contract
    the transcript and audio channels pass.

    Scale shape: mapInPandas, no shuffle; tier aggregation downstream adds
    its usual single exchange.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                parsed = decode_avi_bytes(r.payload)
                if parsed is None:
                    continue
                (_w, _h, _bpp, rate, scale, n_frames), frames = parsed
                xi = np.array(
                    [int(f.astype(np.int64).sum()) for f in frames],
                    dtype=np.int64,
                )
                i = np.arange(n_frames, dtype=np.int64)
                ts = i * 1_000_000 * scale // rate
                outs.append(
                    pd.DataFrame(
                        {
                            "conv_id": f"doc:{int(r.doc_id)}",
                            "channel": "video_luma",
                            "turn_idx": i.astype(np.int32),
                            "ts_us": ts,
                            "x": xi,
                            "prev_x": pd.Series(xi).shift(1).astype("Int64"),
                            "prev_ts_us": pd.Series(ts).shift(1).astype("Int64"),
                        }
                    )
                )
            yield (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame(
                    {f.name: [] for f in AUDIO_CHANNEL_SCHEMA.fields}
                )
            )

    return media.mapInPandas(gen, AUDIO_CHANNEL_SCHEMA)
