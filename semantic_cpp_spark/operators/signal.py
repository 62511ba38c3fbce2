"""Signal kernels: DFT/IDFT/FFT/IFFT and gradient descent
(reference collector.h:2744-3063, SURVEY §2.5).

The reference treats the whole stream as one signal — meaningful only for
bounded windows, so the engine exposes BOTH:
- per-window transforms (``fft_by_window``): applyInPandas over window
  groups — each group a bounded signal, groups processed in parallel —
  the 100 TB shape;
- whole-stream transforms (``dft``/``fft``): single-group applyInPandas,
  inherently one signal = one task (documented; matches the reference's
  single-process semantics).

Complex results are (re, im) double pairs (SURVEY §1.3: complex<double> →
2-field struct, flattened here for oracle comparison).

Reference fidelity notes:
- useFFT zero-pads to the next power of two, runs radix-2, then TRUNCATES
  back to N (collector.h:2840-2876) — FFT-then-truncate ≠ DFT for
  non-power-of-two N. Reproduced exactly: numpy.fft over the padded
  buffer, then [:n].
- useIFFT divides by the PADDED length (collector.h:2880-2942).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semantic_cpp_spark.indexing import IDX

_OUT_SCHEMA = "k long, re double, im double"
_WIN_OUT_SCHEMA = "win_start long, k long, re double, im double"


def _pad_len(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


def _transform_block(vals: np.ndarray, kind: str) -> pd.DataFrame:
    n = len(vals)
    if kind == "dft":
        out = np.fft.fft(vals)
    elif kind == "idft":
        out = np.fft.ifft(vals)  # numpy divides by n == reference IDFT
    elif kind == "fft":
        m = _pad_len(n)
        out = np.fft.fft(np.pad(vals, (0, m - n)))[:n]
    elif kind == "ifft":
        # reference IFFT pads, inverts dividing by the PADDED length, then
        # truncates (collector.h:2880-2942) — np.fft.ifft(padded) already
        # divides by the padded length.
        m = _pad_len(n)
        out = np.fft.ifft(np.pad(vals, (0, m - n)))[:n]
    else:
        raise ValueError(kind)
    return pd.DataFrame(
        {"k": np.arange(n, dtype=np.int64), "re": out.real, "im": out.imag}
    )


def _whole_stream(df: DataFrame, value: Column, kind: str) -> DataFrame:
    src = df.select(F.col(IDX).alias("i"), value.cast("double").alias("x"))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i")
        return _transform_block(pdf["x"].to_numpy(), kind)

    return (
        src.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(lambda _, pdf: kernel(pdf), schema=_OUT_SCHEMA)
    )


def dft(df: DataFrame, value: Column) -> DataFrame:
    """useDFT (collector.h:2744-2779): exact DFT of the whole stream."""
    return _whole_stream(df, value, "dft")


def idft(df: DataFrame, value: Column) -> DataFrame:
    """useIDFT (collector.h:2781-2816)."""
    return _whole_stream(df, value, "idft")


def fft(df: DataFrame, value: Column) -> DataFrame:
    """useFFT (collector.h:2818-2878): pad-to-power-of-two, transform,
    truncate back — reproduced exactly."""
    return _whole_stream(df, value, "fft")


def ifft(df: DataFrame, value: Column) -> DataFrame:
    """useIFFT (collector.h:2880-2942): inverse with 1/padded-length."""
    return _whole_stream(df, value, "ifft")


def fft_by_window(df: DataFrame, value: Column, size: int) -> DataFrame:
    """Per-tumbling-window FFT — the scalable form: window groups fan out
    across executors, each bounded signal transformed independently."""
    src = df.select(
        (F.floor(F.col(IDX) / size) * size).cast("long").alias("win_start"),
        F.col(IDX).alias("i"),
        value.cast("double").alias("x"),
    )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i")
        block = _transform_block(pdf["x"].to_numpy(), "fft")
        block.insert(0, "win_start", key[0])
        return block

    return src.groupBy("win_start").applyInPandas(kernel, schema=_WIN_OUT_SCHEMA)


def gradient_descent(
    init: np.ndarray,
    grad_fn,
    learning_rate: float = 0.01,
    iterations: int = 100,
    epsilon: float = 1e-9,
) -> np.ndarray:
    """useGradient (collector.h:2944-2994): plain driver-side loop — the
    stream supplies the initial parameter vector; each step
    p -= lr * grad(p) until |step| < epsilon."""
    p = np.asarray(init, dtype=np.float64).copy()
    for _ in range(iterations):
        g = np.asarray(grad_fn(p), dtype=np.float64)
        step = learning_rate * g
        p -= step
        if float(np.sqrt(np.sum(step * step))) < epsilon:
            break
    return p


def gradient_descent_numeric(
    init: np.ndarray,
    cost_fn,
    learning_rate: float = 0.01,
    iterations: int = 100,
    epsilon: float = 1e-9,
    h: float = 1e-6,
) -> np.ndarray:
    """useGradient numeric variant (collector.h:2996-3063): central
    difference gradient (f(p+h) - f(p-h)) / 2h per dimension."""

    def grad(p: np.ndarray) -> np.ndarray:
        g = np.zeros_like(p)
        for d in range(len(p)):
            up, dn = p.copy(), p.copy()
            up[d] += h
            dn[d] -= h
            g[d] = (cost_fn(up) - cost_fn(dn)) / (2 * h)
        return g

    return gradient_descent(init, grad, learning_rate, iterations, epsilon)
