"""Round-trip property suite for the Gorilla-style codecs (SURVEY §5.3):
adversarial floats (±0.0, subnormals, extremes), irregular/duplicate/bursty
microsecond timestamps, plus hypothesis-generated arrays."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from features_engineering_of_motion_data_spark.kernels.codecs import (
    decode_dod,
    decode_xor,
    encode_dod,
    encode_xor,
)

EPOCH = 1_704_067_200_000_000  # 2024-01-01 in µs


def _rt_ts(ts):
    ts = np.asarray(ts, dtype=np.int64)
    out = decode_dod(encode_dod(ts))
    np.testing.assert_array_equal(out, ts)


def _rt_vals(v):
    v = np.asarray(v)
    out = decode_xor(encode_xor(v), dtype=v.dtype)
    assert out.dtype == v.dtype
    # bit-exact comparison (handles NaN payloads and -0.0)
    np.testing.assert_array_equal(
        out.view(np.uint64) if v.dtype == np.float64 else out,
        v.view(np.uint64) if v.dtype == np.float64 else v,
    )


# --- fixed edge cases --------------------------------------------------------


def test_dod_empty_single():
    _rt_ts([])
    _rt_ts([EPOCH])


def test_dod_regular_cadence():
    _rt_ts(EPOCH + 10_000_000 * np.arange(1000))  # dod==0 path


def test_dod_duplicate_microseconds():
    _rt_ts(EPOCH + 1_000_000 * (np.arange(30) // 3))


def test_dod_bursty_hours():
    rng = np.random.default_rng(7)
    t, out = EPOCH, []
    for _ in range(20):
        for _ in range(10):
            out.append(t)
            t += int(rng.integers(500, 5_000))
        t += 3_600_000_000  # hour-long silence → 64-bit bucket
    _rt_ts(out)


def test_dod_non_monotone_and_negative():
    _rt_ts([EPOCH, EPOCH - 5, EPOCH + 10**15, EPOCH - 10**15, 0, -1, 2**62])


def test_dod_every_bucket_boundary():
    # exercise each class edge: 0, ±64, ±256, ±2048, ±2^31, beyond
    deltas = [0, 63, -64, 64, 255, -256, 256, 2047, -2048, 2048,
              (1 << 31) - 1, -(1 << 31), 1 << 31, 1 << 40]
    ts = EPOCH + np.cumsum(np.cumsum(np.array([0] + deltas, dtype=np.int64)))
    _rt_ts(ts)


def test_xor_empty_single_constant():
    _rt_vals(np.array([], dtype=np.float64))
    _rt_vals(np.array([3.25]))
    _rt_vals(np.full(100, 7.125))  # xor==0 path


def test_xor_adversarial_floats():
    _rt_vals(
        np.array(
            [0.0, -0.0, 1.0, -1.0, np.pi, 5e-324, -5e-324, np.inf, -np.inf,
             np.nan, np.finfo(np.float64).max, np.finfo(np.float64).tiny]
        )
    )


def test_xor_int64_payloads():
    _rt_vals(np.array([0, 1, -1, 2**62, -(2**62), 123456789], dtype=np.int64))


def test_compression_ratio_regular_series():
    """Near-regular cadence must compress hard (the whole point of DoD)."""
    ts = EPOCH + 10_000_000 * np.arange(10_000)
    ratio = len(encode_dod(ts)) / (8 * len(ts))
    assert ratio < 0.02  # dod==0 → ~1 bit/sample vs 64


# --- hypothesis properties ---------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    arrays(
        np.int64,
        st.integers(0, 300),
        elements=st.integers(-(2**62), 2**62),
    )
)
def test_dod_roundtrip_random(ts):
    _rt_ts(ts)


@settings(max_examples=60, deadline=None)
@given(
    arrays(
        np.float64,
        st.integers(0, 300),
        elements=st.floats(allow_nan=True, width=64),
    )
)
def test_xor_roundtrip_random(v):
    _rt_vals(v)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(0, 2**20),
    st.integers(1, 400),
    st.integers(0, 10**7),
)
def test_dod_roundtrip_lognormalish(seed, n, scale):
    rng = np.random.default_rng(seed)
    gaps = rng.integers(0, max(scale, 1), n)
    _rt_ts(EPOCH + np.cumsum(gaps))


@pytest.mark.parametrize("n", [2, 3, 1000, 100_000])
def test_scaling_sizes(n):
    rng = np.random.default_rng(n)
    ts = EPOCH + np.cumsum(rng.integers(1, 10**7, n))
    _rt_ts(ts)
    _rt_vals(rng.normal(size=n))


# --- small/vectorized XOR path parity (the dispatch must be invisible) ------


def test_xor_small_vec_parity():
    """encode_xor dispatches small arrays (n <= _XOR_SMALL_N) to a
    Python-int bit packer; the two implementations must produce
    BYTE-IDENTICAL streams and decode each other's output bit-exactly —
    including -0.0, infinities, zero-XOR runs, and the lz > 31 clip."""
    import features_engineering_of_motion_data_spark.kernels.codecs as C

    rng = np.random.default_rng(11)
    cases = []
    for n in (1, 2, 3, 17, 64, 255, C._XOR_SMALL_N):
        cases.append(rng.standard_normal(n))
        v = rng.standard_normal(n)
        v[rng.random(n) < 0.5] = 0.0
        v[0] = -0.0
        cases.append(v)
        # tiny-exponent values exercise the lz-clip (clz > 31) branch
        cases.append(rng.standard_normal(n) * np.float64(2.0) ** -1000)
    for v in cases:
        u = v.view(np.uint64)
        small = C._encode_xor_small(u)
        old = C._XOR_SMALL_N
        C._XOR_SMALL_N = 0
        try:
            vec = C.encode_xor(v)
            dec_vec = C.decode_xor(small)
        finally:
            C._XOR_SMALL_N = old
        assert small == vec
        np.testing.assert_array_equal(
            C._decode_xor_small(len(u), small[16:]), u
        )
        np.testing.assert_array_equal(dec_vec.view(np.uint64), u)


def test_xor_roundtrip_above_small_threshold():
    """Arrays past the dispatch threshold take the vectorized path end to
    end and still round-trip bit-exactly."""
    import features_engineering_of_motion_data_spark.kernels.codecs as C

    rng = np.random.default_rng(13)
    v = rng.standard_normal(C._XOR_SMALL_N * 3)
    v[rng.random(len(v)) < 0.3] = 0.0
    _rt_vals(v)
