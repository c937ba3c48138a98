"""Multimodal plumbing: binary container round-trip, metadata extraction,
fake decode stats, frame sampling, and the stubbed real-codec path."""

from __future__ import annotations

import numpy as np
import pytest

from features_engineering_of_motion_data_spark.operators.multimodal import (
    attach_fake_payloads,
    decode_image,
    extract_metadata,
    make_fake_payload,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = attach_fake_payloads(docs).cache()
    m.count()
    return m


def test_metadata_roundtrip(spark, media, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    meta = extract_metadata(media).toPandas().set_index("doc_id").sort_index()
    assert len(meta) == len(docs)
    assert meta["valid"].all()
    # construction rules are recoverable from the parsed header
    for doc_id, row in meta.iterrows():
        assert row["media_type"] == {0: "image", 1: "audio", 2: "video"}[doc_id % 3]
        assert row["width"] == 8 + (doc_id % 9)
        assert row["n_frames"] == 1 + doc_id % 4
        assert row["payload_bytes"] == 17 + row["width"] * row["height"] * row["n_frames"]


def test_fake_decode_stats_deterministic(spark, media):
    a = decode_image(media, backend="fake").toPandas().sort_values("doc_id")
    b = decode_image(media, backend="fake").toPandas().sort_values("doc_id")
    assert len(a) == len(b) > 0
    assert (a["mean_intensity"].to_numpy() == b["mean_intensity"].to_numpy()).all()
    assert (a["n_samples"] > 0).all()
    # md5-derived bytes ≈ uniform → mean intensity near 127.5
    assert 100 < a["mean_intensity"].mean() < 155


def test_real_codec_is_stubbed(spark, media):
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(media, backend="pil").count()


def test_frame_sampling(spark, media):
    meta = extract_metadata(media)
    frames = sample_frames(meta, every_k=2).toPandas()
    vids = meta.filter("media_type = 'video'").toPandas()
    # every video contributes ceil(n_frames / 2) rows
    expect = int(np.ceil(vids["n_frames"].to_numpy() / 2).sum())
    assert len(frames) == expect
    assert (frames["frame_idx"] % 2 == 0).all()


def test_native_le_int32_parse_matches_struct(spark):
    """The JVM-side hex/conv little-endian parse must agree with Python's
    struct.unpack on random headers, including extreme field values."""
    import struct

    import pandas as pd

    from features_engineering_of_motion_data_spark.operators.multimodal import (
        MAGIC,
    )

    rng = np.random.default_rng(7)
    # full signed int32 range: high-bit (negative under '<i') header fields
    # are the ANSI-mode trap — conv() yields >= 2**31 and a bare cast("int")
    # throws CAST_INVALID_INPUT, killing the job on one garbage header
    vals = np.concatenate(
        [
            rng.integers(-(2**31), 2**31 - 1, size=50),
            [0, 1, -1, 2**31 - 1, -(2**31)],
        ]
    )
    payloads = [
        MAGIC
        + struct.pack("<biii", abs(int(v)) % 3, int(v), int(v) // 2, 1)
        + b"\x00"
        for v in vals
    ]
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    meta = extract_metadata(spark.createDataFrame(pdf)).toPandas().sort_values("doc_id")
    assert meta["valid"].all()
    expect = [struct.unpack("<biii", p[4:17]) for p in payloads]
    assert meta["width"].tolist() == [e[1] for e in expect]
    assert meta["height"].tolist() == [e[2] for e in expect]


def test_corrupt_video_header_survives_frame_sampling(spark):
    """A magic-valid payload advertising a negative n_frames must neither
    crash extract_metadata (ANSI cast) nor sample_frames (sequence() with a
    negative stop raises) — it just contributes no frames."""
    import struct

    import pandas as pd

    from features_engineering_of_motion_data_spark.operators.multimodal import (
        MAGIC,
    )

    bad = MAGIC + struct.pack("<biii", 2, 8, 8, -7) + b"\x00" * 64
    good = make_fake_payload(5, "hello", media_type=2, n_frames=3)
    pdf = pd.DataFrame({"doc_id": [1, 5], "payload": [bad, good]})
    meta = extract_metadata(spark.createDataFrame(pdf))
    got = meta.toPandas().set_index("doc_id")
    assert got.loc[1, "n_frames"] == -7  # struct '<i' signed semantics
    frames = sample_frames(meta, every_k=2).toPandas()
    assert sorted(frames["doc_id"].unique()) == [5]
    assert len(frames) == 2  # ceil(3/2)


def test_corrupt_payload_flagged(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3],
         "payload": [b"NOTFAKE_GARBAGE_HEADER", b"", make_fake_payload(3, "x")]}
    )
    df = spark.createDataFrame(pdf)
    meta = extract_metadata(df).toPandas().set_index("doc_id")
    assert not meta.loc[1, "valid"] and not meta.loc[2, "valid"]
    assert meta.loc[3, "valid"]


# --- real WAV codec (round-trip vs an independent numpy reference) -----------


def _wav_reference_stats(doc_id, n_frames, channels, bits):
    """Independent reference: regenerate the SAME deterministic PCM the
    writer used and compute stats directly — never calling the parser."""
    import hashlib

    n = n_frames * channels
    seed = int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    if bits == 8:
        x = rng.integers(0, 256, size=n, dtype=np.uint8).astype(np.float64) - 128.0
    elif bits == 16:
        x = rng.integers(-(2**15), 2**15, size=n, dtype=np.int64).astype(np.float64)
    else:
        x = rng.integers(-(2**31), 2**31, size=n, dtype=np.int64).astype(np.float64)
    return float(np.mean(x)), float(np.std(x)), float(np.max(np.abs(x)))


def test_wav_roundtrip_matches_numpy_reference(spark):
    import pandas as pd

    from features_engineering_of_motion_data_spark.operators.multimodal import (
        decode_audio,
        make_wav_payload,
    )

    cases = [  # (doc_id, n_frames, sample_rate, channels, bits)
        (1, 256, 8000, 1, 16),
        (2, 300, 16000, 2, 16),
        (3, 128, 44100, 1, 8),
        (4, 64, 48000, 2, 32),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [c[0] for c in cases],
            "payload": [make_wav_payload(*c) for c in cases],
        }
    )
    got = (
        decode_audio(spark.createDataFrame(pdf), backend="wav")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == len(cases)
    for doc_id, n_frames, rate, ch, bits in cases:
        row = got.loc[doc_id]
        assert (row["sample_rate"], row["channels"], row["bits"]) == (rate, ch, bits)
        assert row["n_frames"] == n_frames
        assert row["duration_s"] == n_frames / rate
        mean, std, peak = _wav_reference_stats(doc_id, n_frames, ch, bits)
        assert row["mean_amp"] == mean  # exact: integer amplitudes in f64
        assert row["std_amp"] == std
        assert row["peak_amp"] == peak


def test_wav_rejects_invalid_and_compressed(spark):
    import struct as _struct

    import pandas as pd

    from features_engineering_of_motion_data_spark.operators.multimodal import (
        decode_audio,
        make_wav_payload,
    )

    good = make_wav_payload(9)
    # flip audio_format to 2 (ADPCM) inside the fmt chunk -> rejected (PCM only)
    compressed = bytearray(good)
    fmt_at = good.index(b"fmt ") + 8
    compressed[fmt_at : fmt_at + 2] = _struct.pack("<H", 2)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "payload": [b"RIFFxxxxNOPE", b"", bytes(compressed), good],
        }
    )
    got = decode_audio(spark.createDataFrame(pdf)).toPandas()
    assert got["doc_id"].tolist() == [4]


def test_wav_tolerates_extra_chunks_and_odd_sizes(spark):
    """Chunk walking honors word alignment: a LIST chunk with an odd size
    before fmt/data must not desync the parse."""
    import struct as _struct

    import pandas as pd

    from features_engineering_of_motion_data_spark.operators.multimodal import (
        decode_audio,
        decode_wav_bytes,
        make_wav_payload,
    )

    base = make_wav_payload(11, n_frames=32)
    odd = b"LIST" + _struct.pack("<I", 3) + b"abc" + b"\x00"  # padded to even
    payload = base[:12] + odd + base[12:]
    payload = payload[:4] + _struct.pack("<I", len(payload) - 8) + payload[8:]
    assert decode_wav_bytes(payload) is not None
    pdf = pd.DataFrame({"doc_id": [11], "payload": [payload]})
    got = decode_audio(spark.createDataFrame(pdf)).toPandas()
    assert len(got) == 1 and got.loc[0, "n_frames"] == 32


def test_unknown_audio_backend_raises():
    from features_engineering_of_motion_data_spark.operators.multimodal import (
        decode_audio,
    )

    with pytest.raises(NotImplementedError, match="'wav'"):
        decode_audio(None, backend="mp3")


# --- real BMP codec ------------------------------------------------------------


def _bmp_reference(doc_id, width, height, bpp):
    """Independent reference: regenerate the SAME deterministic pixel rows
    the writer produced (including its per-row padding draws) and compute
    intensity stats directly — never calling the parser."""
    import hashlib

    seed = int.from_bytes(hashlib.md5(f"bmp:{doc_id}".encode()).digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    bytes_pp = bpp // 8
    row_raw = width * bytes_pp
    rows = np.stack(
        [rng.integers(0, 256, size=row_raw, dtype=np.uint8) for _ in range(height)]
    )
    if bpp == 8:
        x = rows.astype(np.float64).ravel()
    else:
        px = rows.reshape(height, width, bytes_pp).astype(np.float64)
        x = px[:, :, :3].mean(axis=2).ravel()
    return float(np.mean(x)), float(np.std(x)), int(x.size)


def test_bmp_roundtrip_matches_numpy_reference(spark):
    import pandas as pd

    from features_engineering_of_motion_data_spark.operators.multimodal import (
        decode_image,
        make_bmp_payload,
    )

    cases = [  # (doc_id, width, height, bpp) — widths chosen to force padding
        (1, 16, 12, 24),
        (2, 5, 7, 24),    # row_raw=15 -> padded to 16
        (3, 10, 4, 8),    # paletted grayscale, row padded 10 -> 12
        (4, 6, 3, 32),    # alpha channel excluded from intensity
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [c[0] for c in cases],
            "payload": [make_bmp_payload(*c) for c in cases],
        }
    )
    got = (
        decode_image(spark.createDataFrame(pdf), backend="bmp")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == len(cases)
    for doc_id, w, h, bpp in cases:
        row = got.loc[doc_id]
        assert (row["width"], row["height"], row["bpp"]) == (w, h, bpp)
        mean, std, n = _bmp_reference(doc_id, w, h, bpp)
        assert row["n_pixels"] == n
        assert row["mean_intensity"] == mean
        assert row["std_intensity"] == std


def test_bmp_rejects_invalid_and_compressed(spark):
    import struct as _struct

    import pandas as pd

    from features_engineering_of_motion_data_spark.operators.multimodal import (
        decode_image,
        make_bmp_payload,
    )

    good = make_bmp_payload(9)
    rle = bytearray(good)
    rle[30:34] = _struct.pack("<I", 1)  # BI_RLE8 -> rejected (uncompressed only)
    truncated = good[: len(good) // 2]
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "payload": [b"XX not a bmp", bytes(rle), truncated, good],
        }
    )
    got = decode_image(spark.createDataFrame(pdf), backend="bmp").toPandas()
    assert got["doc_id"].tolist() == [4]


def test_audio_feeds_tier_feature_algebra_bitwise(spark):
    """The multimodal bridge: decoded WAV PCM flows through the ENGINE'S OWN
    tier feature pipeline (audio_channel_frame -> features_from_turns) and
    every finalized feature matches the independent numpy oracle bitwise —
    the same gate the transcript channels pass.  Stereo and invalid
    payloads are skipped, never crash."""
    import numpy as np
    import pandas as pd

    import oracle.features as orc
    from features_engineering_of_motion_data_spark.operators.features import (
        features_from_turns,
    )
    from features_engineering_of_motion_data_spark.operators.multimodal import (
        audio_channel_frame,
        decode_wav_bytes,
        make_wav_payload,
    )

    payloads = {
        # low sample rates stretch the series across multiple 1m buckets
        # (ts_us = i*1e6//rate), so the tier bucketing is actually exercised
        1: make_wav_payload(1, n_frames=900, sample_rate=8, bits=16),
        2: make_wav_payload(2, n_frames=300, sample_rate=4, bits=8),
        3: make_wav_payload(3, n_frames=120, sample_rate=2, bits=32),
    }
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "payload": [
                payloads[1],
                payloads[2],
                payloads[3],
                make_wav_payload(4, n_frames=64, channels=2),  # stereo: skipped
                b"not audio at all",  # invalid: skipped
            ],
        }
    )
    media = spark.createDataFrame(pdf)
    got = (
        features_from_turns(audio_channel_frame(media), "1m")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert set(got["conv_id"]) == {"doc:1", "doc:2", "doc:3"}

    # oracle path: rebuild the channel frame from the SAME public decode,
    # then the independent numpy tier oracle
    frames = []
    for doc_id, payload in payloads.items():
        (rate, ch, _bits, _nf), x = decode_wav_bytes(payload)
        assert ch == 1
        i = np.arange(len(x), dtype=np.int64)
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": f"doc:{doc_id}",
                    "channel": "audio_amp",
                    "turn_idx": i,
                    "ts_us": i * 1_000_000 // rate,
                    "x": x.astype(np.int64),
                }
            )
        )
    want = orc.tier_features(pd.concat(frames, ignore_index=True), "1m")
    want = want.sort_values(["conv_id", "bucket_us"], kind="mergesort").reset_index(
        drop=True
    )
    assert len(got) == len(want) > 3
    got["bucket_us"] = got["bucket_start"].astype("datetime64[us]").astype("int64")
    assert (got["bucket_us"].to_numpy() == want["bucket_us"].to_numpy()).all()
    for c in ("n", "s1", "min_raw", "max_raw", "zc"):
        assert (
            got[c].to_numpy().astype(np.int64)
            == want[c].to_numpy().astype(np.int64)
        ).all(), c
    assert [int(v) for v in got["s2"]] == [int(v) for v in want["s2"]]
    for c in ("f_mean", "f_std", "f_rms", "f_min", "f_max", "f_energy"):
        a = got[c].to_numpy().astype(np.float64)
        b = want[c].to_numpy().astype(np.float64)
        assert (a == b).all(), c  # bitwise


# --- real AVI codec -------------------------------------------------------------


def _avi_reference_frames(doc_id, n_frames, width, height, bpp):
    """Independent regeneration of make_avi_payload's deterministic pixel
    stream (same public seed derivation, stats recomputed from scratch)."""
    import hashlib

    seed = int.from_bytes(hashlib.md5(f"avi:{doc_id}".encode()).digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    bytes_pp = bpp // 8
    row_raw = width * bytes_pp
    frames = []
    for _ in range(n_frames):
        rows = [rng.integers(0, 256, size=row_raw, dtype=np.uint8) for _ in range(height)]
        a = np.stack(rows)
        frames.append(a if bpp == 8 else a.reshape(height, width, bytes_pp))
    return frames


def test_avi_roundtrip_matches_numpy_reference(spark):
    import pandas as pd

    from features_engineering_of_motion_data_spark.operators.multimodal import (
        decode_video,
        make_avi_payload,
    )

    cases = [  # (doc_id, n_frames, width, height, bpp, rate, scale)
        (1, 8, 16, 12, 24, 10, 1),
        (2, 5, 10, 6, 8, 30, 1),
        (3, 3, 7, 9, 32, 24000, 1001),  # NTSC-style rational fps, odd width
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [c[0] for c in cases],
            "payload": [make_avi_payload(*c) for c in cases],
        }
    )
    got = (
        decode_video(spark.createDataFrame(pdf), backend="avi")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == len(cases)
    for doc_id, n_frames, w, h, bpp, rate, scale in cases:
        row = got.loc[doc_id]
        assert (row["width"], row["height"], row["bpp"]) == (w, h, bpp)
        assert row["n_frames"] == n_frames
        assert row["fps"] == rate / scale
        assert row["duration_s"] == n_frames * scale / rate
        frames = _avi_reference_frames(doc_id, n_frames, w, h, bpp)
        if bpp == 8:
            x = np.concatenate([f.astype(np.float64).ravel() for f in frames])
        else:
            x = np.concatenate(
                [f[:, :, :3].astype(np.float64).mean(axis=2).ravel() for f in frames]
            )
        assert row["n_samples"] == len(x)
        assert row["mean_intensity"] == float(np.mean(x))  # bitwise
        assert row["std_intensity"] == float(np.std(x))


def test_avi_rejects_invalid_and_compressed(spark):
    import struct as _struct

    import pandas as pd

    from features_engineering_of_motion_data_spark.operators.multimodal import (
        decode_avi_bytes,
        decode_video,
        make_avi_payload,
    )

    good = make_avi_payload(9, n_frames=4)
    # nonzero biCompression inside strf -> rejected (BI_RGB only)
    compressed = bytearray(good)
    at = good.index(b"strf") + 8 + 16  # biCompression offset in BITMAPINFOHEADER
    compressed[at : at + 4] = _struct.pack("<I", 1)  # BI_RLE8
    # a '00dc' (compressed-frame) chunk -> rejected
    dc = bytearray(good)
    at = dc.index(b"00db")
    dc[at : at + 4] = b"00dc"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "payload": [b"RIFFxxxxNOPE", b"", bytes(compressed), bytes(dc), good],
        }
    )
    got = decode_video(spark.createDataFrame(pdf)).toPandas()
    assert got["doc_id"].tolist() == [5]
    assert decode_avi_bytes(bytes(compressed)) is None
    assert decode_avi_bytes(bytes(dc)) is None


def test_avi_tolerates_junk_chunks_and_bad_frames(spark):
    """Word-aligned walking skips odd-sized vendor chunks, and a 00db chunk
    with mismatched geometry is dropped per-frame, not per-object."""
    import struct as _struct

    from features_engineering_of_motion_data_spark.operators.multimodal import (
        decode_avi_bytes,
        make_avi_payload,
    )

    base = make_avi_payload(11, n_frames=4, width=8, height=4, bpp=24)
    junk = b"JUNK" + _struct.pack("<I", 3) + b"abc" + b"\x00"
    payload = base[:12] + junk + base[12:]
    payload = payload[:4] + _struct.pack("<I", len(payload) - 8) + payload[8:]
    meta, frames = decode_avi_bytes(payload)
    assert meta[5] == 4 and len(frames) == 4

    # shrink one frame chunk body: that frame is skipped, others survive
    bad = bytearray(base)
    at = bad.index(b"00db")
    (size,) = _struct.unpack("<I", bad[at + 4 : at + 8])
    bad[at + 4 : at + 8] = _struct.pack("<I", size - 4)
    # remove 4 bytes so the following chunks stay aligned, then shrink the
    # enclosing movi LIST and RIFF sizes to match
    del bad[at + 8 + size - 4 : at + 8 + size]
    movi_at = bad.index(b"movi") - 8
    (movi_size,) = _struct.unpack("<I", bad[movi_at + 4 : movi_at + 8])
    bad[movi_at + 4 : movi_at + 8] = _struct.pack("<I", movi_size - 4)
    bad[4:8] = _struct.pack("<I", len(bad) - 8)
    meta2, frames2 = decode_avi_bytes(bytes(bad))
    assert meta2[5] == 3 and len(frames2) == 3


def test_unknown_video_backend_raises():
    from features_engineering_of_motion_data_spark.operators.multimodal import (
        decode_video,
    )

    with pytest.raises(NotImplementedError, match="'avi'"):
        decode_video(None, backend="h264")


def test_video_feeds_tier_feature_algebra_bitwise(spark):
    """The video bridge: decoded AVI frames flow through the ENGINE'S OWN
    tier feature pipeline (video_channel_frame -> features_from_turns) and
    every finalized feature matches the independent numpy oracle bitwise —
    the identical gate the transcript and audio channels pass."""
    import pandas as pd

    import oracle.features as orc
    from features_engineering_of_motion_data_spark.operators.features import (
        features_from_turns,
    )
    from features_engineering_of_motion_data_spark.operators.multimodal import (
        decode_avi_bytes,
        make_avi_payload,
        video_channel_frame,
    )

    payloads = {
        # low fps stretches frames across multiple 1m buckets
        # (ts_us = i*1e6*scale//rate), so tier bucketing is exercised
        1: make_avi_payload(1, n_frames=900, width=8, height=6, rate=8, scale=1),
        2: make_avi_payload(2, n_frames=300, width=6, height=4, bpp=8, rate=4, scale=1),
        3: make_avi_payload(3, n_frames=120, width=4, height=4, bpp=32, rate=2, scale=1),
    }
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "payload": [payloads[1], payloads[2], payloads[3], b"not video"],
        }
    )
    media = spark.createDataFrame(pdf)
    got = (
        features_from_turns(video_channel_frame(media), "1m")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert set(got["conv_id"]) == {"doc:1", "doc:2", "doc:3"}

    frames_pdf = []
    for doc_id, payload in payloads.items():
        (_w, _h, _bpp, rate, scale, n), frames = decode_avi_bytes(payload)
        xi = np.array([f.astype(np.int64).sum() for f in frames], dtype=np.int64)
        i = np.arange(n, dtype=np.int64)
        frames_pdf.append(
            pd.DataFrame(
                {
                    "conv_id": f"doc:{doc_id}",
                    "channel": "video_luma",
                    "turn_idx": i,
                    "ts_us": i * 1_000_000 * scale // rate,
                    "x": xi,
                }
            )
        )
    want = orc.tier_features(pd.concat(frames_pdf, ignore_index=True), "1m")
    want = want.sort_values(["conv_id", "bucket_us"], kind="mergesort").reset_index(
        drop=True
    )
    assert len(got) == len(want) > 3
    got["bucket_us"] = got["bucket_start"].astype("datetime64[us]").astype("int64")
    assert (got["bucket_us"].to_numpy() == want["bucket_us"].to_numpy()).all()
    for c in ("n", "s1", "min_raw", "max_raw", "zc"):
        assert (
            got[c].to_numpy().astype(np.int64)
            == want[c].to_numpy().astype(np.int64)
        ).all(), c
    assert [int(v) for v in got["s2"]] == [int(v) for v in want["s2"]]
    for c in ("f_mean", "f_std", "f_rms", "f_min", "f_max", "f_energy"):
        a = got[c].to_numpy().astype(np.float64)
        b = want[c].to_numpy().astype(np.float64)
        assert (a == b).all(), c  # bitwise
