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
