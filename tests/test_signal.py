"""Signal kernels vs numpy ground truth (reference collector.h:2744-3063)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_cpp_spark.operators import signal
from semantic_cpp_spark.sources import from_container


@pytest.fixture(scope="module")
def sig():
    rng = np.random.default_rng(11)
    return rng.uniform(-1, 1, size=50)  # non-power-of-two on purpose


def _collect(df):
    rows = sorted(df.collect(), key=lambda r: r["k"])
    return np.array([complex(r["re"], r["im"]) for r in rows])


def test_dft_matches_numpy(spark, sig):
    s = from_container(spark, [float(x) for x in sig])
    got = _collect(signal.dft(s.to_df(), F.col("value")))
    np.testing.assert_allclose(got, np.fft.fft(sig), atol=1e-9)


def test_fft_pad_truncate_quirk(spark, sig):
    """useFFT pads 50 → 64, transforms, truncates to 50
    (collector.h:2840-2876) — NOT equal to the plain DFT."""
    s = from_container(spark, [float(x) for x in sig])
    got = _collect(signal.fft(s.to_df(), F.col("value")))
    expect = np.fft.fft(np.pad(sig, (0, 14)))[:50]
    np.testing.assert_allclose(got, expect, atol=1e-9)
    assert not np.allclose(got, np.fft.fft(sig), atol=1e-6)


def test_ifft_divides_by_padded_length(spark, sig):
    s = from_container(spark, [float(x) for x in sig])
    got = _collect(signal.ifft(s.to_df(), F.col("value")))
    expect = np.fft.ifft(np.pad(sig, (0, 14)))[:50]
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_idft_roundtrip(spark, sig):
    s = from_container(spark, [float(x) for x in sig])
    fwd = _collect(signal.dft(s.to_df(), F.col("value")))
    np.testing.assert_allclose(np.fft.ifft(fwd), sig, atol=1e-9)


def test_fft_by_window(spark):
    vals = [float(i % 7) for i in range(32)]
    s = from_container(spark, vals)
    out = signal.fft_by_window(s.to_df(), F.col("value"), 16).collect()
    by_win = {}
    for r in out:
        by_win.setdefault(r["win_start"], []).append((r["k"], complex(r["re"], r["im"])))
    assert set(by_win) == {0, 16}
    for ws, pairs in by_win.items():
        got = np.array([c for _, c in sorted(pairs)])
        np.testing.assert_allclose(
            got, np.fft.fft(vals[ws : ws + 16]), atol=1e-9
        )


def test_gradient_descent_quadratic():
    """min (p0-3)^2 + (p1+1)^2 from (0,0)."""
    out = signal.gradient_descent(
        np.array([0.0, 0.0]),
        lambda p: 2 * (p - np.array([3.0, -1.0])),
        learning_rate=0.1,
        iterations=500,
        epsilon=1e-12,
    )
    np.testing.assert_allclose(out, [3.0, -1.0], atol=1e-6)


def test_gradient_descent_numeric_central_difference():
    out = signal.gradient_descent_numeric(
        np.array([0.0]),
        lambda p: float((p[0] - 2.0) ** 2),
        learning_rate=0.2,
        iterations=500,
        epsilon=1e-12,
    )
    assert math.isclose(out[0], 2.0, abs_tol=1e-5)
