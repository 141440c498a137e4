"""Canonical-embedding norms (role of reference src/norms.cpp).

`embeddingLargestCoeff` (reference norms.h:85) = L-infinity norm of the
canonical embedding: max_j |f(zeta_m^j)| over primitive m-th roots of unity.
Host-side complex FFT; used by noise estimation, debug checkNoise, and the
"Bounded" rejection samplers (reference sample.cpp `sampleSmallBounded` etc.,
which resample until the canonical norm is below a high-probability bound).
"""

from __future__ import annotations

import math

import numpy as np


def embedding_largest_coeff(coeffs, m: int, pow2: bool) -> float:
    """max_j |f(zeta^j)| over primitive m-th roots, linear domain.

    For pow2 contexts `coeffs` has length N=m/2 and the ring is X^N+1
    (primitive 2N-th roots); otherwise coeffs are mod X^m-1 and we take the
    primitive m-th root spectrum (reference norms.cpp embeddingLargestCoeff).
    """
    arr = np.asarray([float(int(v)) for v in coeffs], dtype=np.float64)
    if pow2:
        N = len(arr)
        zeta = np.exp(1j * np.pi / N)
        b = arr.astype(np.complex128) * zeta ** np.arange(N)
        vals = np.fft.ifft(b) * N
        return float(np.max(np.abs(vals)))
    full = np.zeros(m, dtype=np.float64)
    full[: len(arr)] = arr
    spec = np.fft.fft(full)
    prim = np.array([j for j in range(1, m) if math.gcd(j, m) == 1])
    return float(np.max(np.abs(spec[prim])))


def embedding_largest_coeff_log2(coeffs, m: int, pow2: bool) -> float:
    mx = embedding_largest_coeff(coeffs, m, pow2)
    return math.log2(mx) if mx > 0 else float("-inf")


def embedding_largest_float_log2(arr, m: int, pow2: bool) -> float:
    """Same spectrum max for FLOAT coefficient vectors (used by the exact
    mod-switch measurement, whose delta/D coefficients are O(1) reals)."""
    arr = np.asarray(arr, dtype=np.float64)
    if pow2:
        N = len(arr)
        zeta = np.exp(1j * np.pi / N)
        b = arr.astype(np.complex128) * zeta ** np.arange(N)
        mx = float(np.max(np.abs(np.fft.ifft(b) * N)))
    else:
        full = np.zeros(m, dtype=np.float64)
        full[: len(arr)] = arr
        spec = np.fft.fft(full)
        prim = np.array([j for j in range(1, m) if math.gcd(j, m) == 1])
        mx = float(np.max(np.abs(spec[prim])))
    return math.log2(mx) if mx > 0 else float("-inf")


def embedding_norm_log2_scaled(mant: np.ndarray, exp2: np.ndarray,
                               m: int, pow2: bool) -> float:
    """log2 canonical norm from frexp-form coefficients (value_i =
    mant_i * 2^exp2_i) — the native CRT kernel's output format, which avoids
    float overflow for > 1000-bit values.  Coefficients more than ~2^-200
    below the largest are negligible for the L-infinity spectrum max."""
    nz = mant != 0.0
    if not np.any(nz):
        return float("-inf")
    shift = int(np.max(exp2[nz]))
    scaled = np.where(nz, mant * np.exp2(np.clip(exp2 - shift, -1000, 0)),
                      0.0)
    if pow2:
        N = len(scaled)
        zeta = np.exp(1j * np.pi / N)
        b = scaled.astype(np.complex128) * zeta ** np.arange(N)
        vals = np.fft.ifft(b) * N
        mx = float(np.max(np.abs(vals)))
    else:
        full = np.zeros(m, dtype=np.float64)
        full[: len(scaled)] = scaled
        spec = np.fft.fft(full)
        prim = np.array([j for j in range(1, m) if math.gcd(j, m) == 1])
        mx = float(np.max(np.abs(spec[prim])))
    return (math.log2(mx) + shift) if mx > 0 else float("-inf")
