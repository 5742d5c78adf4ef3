"""Mel-cepstral distortion (MCD) — the BASELINE.md parity metric.

MCD_13 between two waveforms: frame both, take log-mel, DCT-II to cepstra,
compare coefficients 1..13 with the standard 10*sqrt(2)/ln10 scaling, with a
simple best-offset alignment (full DTW intentionally omitted: for
codec/vocoder parity the sequences are already time-aligned).
"""

from __future__ import annotations

import numpy as np

from maxtext_indextts2_tpu.audio import mel as mel_lib


def mfcc(wav: np.ndarray, sample_rate: int = 24_000, n_mels: int = 80,
         n_mfcc: int = 13) -> np.ndarray:
    """[T] -> [frames, n_mfcc+1] (c0 included)."""
    import jax.numpy as jnp

    logmel = np.asarray(
        mel_lib.mel_spectrogram(
            jnp.asarray(wav)[None], n_mels=n_mels, sample_rate=sample_rate
        )[0]
    )  # [F, n_mels]
    # relative floor (~50 dB dynamic range): near-silent bins otherwise
    # dominate the cepstral distance through log-noise
    logmel = np.maximum(logmel, logmel.max() - 12.0)
    f = logmel.shape[0]
    # DCT-II (orthogonal)
    n = np.arange(n_mels)
    basis = np.cos(np.pi / n_mels * (n[None, :] + 0.5) * np.arange(n_mfcc + 1)[:, None])
    return logmel @ basis.T  # [F, n_mfcc+1]


def mcd(wav_a: np.ndarray, wav_b: np.ndarray, sample_rate: int = 24_000,
        n_mfcc: int = 13, max_offset: int = 3) -> float:
    """MCD_13 in dB (lower is better; identical audio -> 0)."""
    ca = mfcc(np.asarray(wav_a, np.float32), sample_rate, n_mfcc=n_mfcc)
    cb = mfcc(np.asarray(wav_b, np.float32), sample_rate, n_mfcc=n_mfcc)
    scale = 10.0 * np.sqrt(2.0) / np.log(10.0)

    best = np.inf
    for off in range(-max_offset, max_offset + 1):
        a = ca[max(off, 0):]
        b = cb[max(-off, 0):]
        n = min(len(a), len(b))
        if n == 0:
            continue
        d = a[:n, 1:] - b[:n, 1:]  # drop c0 (energy)
        val = scale * float(np.mean(np.sqrt(np.sum(d * d, axis=1))))
        best = min(best, val)
    return best
