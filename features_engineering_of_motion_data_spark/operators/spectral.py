"""Frequency-domain features per conversation channel (SURVEY §2 F-canon).

The motion-feature literature the reference draws on (Figo et al. 2010 §3.2)
pairs every time-domain statistic with a frequency-domain set: spectral
energy, spectral entropy, dominant frequency, spectral centroid.  q45 covers
the cross-engine-exact subset (rational-twiddle DFT bins); this operator
computes the FULL one-sided periodogram via ``numpy.fft.rfft`` inside an
Arrow-batched ``applyInPandas`` — one vectorized FFT per (conv, channel)
group, zero per-row Python.

Exactness contract: an FFT's floating-point result depends on the transform
algorithm, so unlike the sufficient-stats tiers this operator is NOT gated
bitwise against a *differently-written* oracle. Its pytest gate is
(a) value agreement with an independent naive-DFT oracle at rtol 1e-9 and
(b) BITWISE invariance to partitioning/parallelism — each group's series is
sorted by turn_idx before the transform, so the result is a pure function
of the group's content regardless of physical layout.

Scale shape: ``groupBy(conv_id, channel).applyInPandas`` — one shuffle on
the same key the channel derivation already clusters by; group state is one
conversation channel (bounded by the longest conversation, not the corpus).
"""

from __future__ import annotations



import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("spectral_energy", T.DoubleType()),
        T.StructField("spectral_entropy", T.DoubleType()),
        T.StructField("dominant_k", T.LongType()),
        T.StructField("dominant_power", T.DoubleType()),
        T.StructField("spectral_centroid", T.DoubleType()),
    ]
)


def spectral_kernel(xs: np.ndarray) -> tuple[float, float, int, float, float]:
    """Periodogram features of one turn-ordered int64 series.

    PSD_k = |X_k|² / n over the non-DC one-sided bins k = 1..⌊n/2⌋ (DC is
    excluded so a constant signal has zero spectral energy, matching the
    zero-mean convention of the feature canon). Entropy is the Shannon
    entropy of the PSD normalized to a distribution; dominant_k is the
    lowest index attaining the maximum power; centroid is Σ k·p_k.
    """
    n = len(xs)
    spec = np.fft.rfft(xs.astype(np.float64))
    psd = (spec.real**2 + spec.imag**2)[1:] / n
    if len(psd) == 0:
        return 0.0, 0.0, 0, 0.0, 0.0
    total = float(np.sum(psd))
    if total == 0.0:
        return 0.0, 0.0, 0, 0.0, 0.0
    k = int(np.argmax(psd))  # lowest index on ties (numpy contract)
    p = psd / total
    nz = p[p > 0]
    entropy = float(-np.sum(nz * np.log(nz)))
    centroid = float(np.sum(np.arange(1, len(psd) + 1, dtype=np.float64) * p))
    return total, entropy, k + 1, float(psd[k]), centroid


def spectral_features(channels: DataFrame) -> DataFrame:
    """Per (conv_id, channel): full-spectrum periodogram features.

    Input: the ``derive_channels`` frame (conv_id, channel, turn_idx, x …).
    """

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="mergesort")
        xs = pdf["x"].to_numpy(np.int64)
        energy, entropy, k, power, centroid = spectral_kernel(xs)
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "channel": [pdf["channel"].iloc[0]],
                "n": [len(xs)],
                "spectral_energy": [energy],
                "spectral_entropy": [entropy],
                "dominant_k": [k],
                "dominant_power": [power],
                "spectral_centroid": [centroid],
            }
        )

    return (
        channels.select("conv_id", "channel", "turn_idx", "x")
        .groupBy("conv_id", "channel")
        .applyInPandas(compute, SPECTRAL_SCHEMA)
    )
