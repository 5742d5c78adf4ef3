"""Mel-cepstral distortion (MCD) between waveform pairs.

The TTS quality metric named in BASELINE.md ("MCD parity with reference
outputs"). Frame-aligned MCD-13: mel spectrogram (audio/mel.py, the same
front-end the codecs train against) -> log -> DCT-II orthonormal -> drop
c0 -> 10*sqrt(2)/ln(10) * mean ||c_a - c_b||. Lengths are cropped to the
shorter signal; an optional per-frame best-offset search (+/- max_shift
frames) absorbs small alignment drift without full DTW.

Usage:
  python benchmarks/mcd.py a.wav b.wav [--sr 24000] [--max_shift 2]
Library:
  from benchmarks.mcd import mcd;  mcd(wav_a, wav_b, sr=24000)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dct2_orthonormal(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] DCT-II matrix with orthonormal scaling."""
    k = np.arange(n_out)[:, None]
    i = np.arange(n_in)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n_in))
    m *= np.sqrt(2.0 / n_in)
    m[0] *= np.sqrt(0.5)
    return m.astype(np.float32)


def mel_cepstra(wav: np.ndarray, sr: int = 24000, n_mels: int = 80,
                n_mfcc: int = 13) -> np.ndarray:
    """[T] wav -> [F, n_mfcc] mel cepstra (c0 included; MCD drops it)."""
    import jax.numpy as jnp

    from maxtext_indextts2_tpu.audio import mel as mel_lib

    n_fft = 1024 if sr <= 16000 else 2048
    hop = sr // 100  # 10 ms frames
    m = mel_lib.mel_spectrogram(
        jnp.asarray(wav, jnp.float32)[None], n_mels=n_mels, sample_rate=sr,
        n_fft=n_fft, hop=hop,
    )[0]
    logm = np.log(np.maximum(np.asarray(m), 1e-5))
    return logm @ _dct2_orthonormal(n_mels, n_mfcc).T


def mcd(wav_a: np.ndarray, wav_b: np.ndarray, sr: int = 24000,
        n_mfcc: int = 13, max_shift: int = 0) -> float:
    """MCD in dB over frame-aligned cepstra (c1..c{n_mfcc-1})."""
    ca = mel_cepstra(np.asarray(wav_a, np.float32), sr, n_mfcc=n_mfcc)
    cb = mel_cepstra(np.asarray(wav_b, np.float32), sr, n_mfcc=n_mfcc)
    f = min(len(ca), len(cb))
    ca, cb = ca[:f, 1:], cb[:f, 1:]
    const = 10.0 * np.sqrt(2.0) / np.log(10.0)

    def dist(a, b):
        n = min(len(a), len(b))
        return const * float(
            np.mean(np.sqrt(np.sum(np.square(a[:n] - b[:n]), axis=1)))
        )

    if max_shift <= 0:
        return dist(ca, cb)
    return min(
        dist(ca[s:], cb) if s >= 0 else dist(ca, cb[-s:])
        for s in range(-max_shift, max_shift + 1)
    )


def main(argv=None):
    import argparse

    if os.environ.get("MTT_PLATFORM"):  # sitecustomize clobbers JAX_PLATFORMS
        import jax

        jax.config.update("jax_platforms", os.environ["MTT_PLATFORM"])

    ap = argparse.ArgumentParser()
    ap.add_argument("wav_a")
    ap.add_argument("wav_b")
    ap.add_argument("--sr", type=int, default=24000)
    ap.add_argument("--max_shift", type=int, default=2)
    args = ap.parse_args(argv)

    def read(path):
        if path.endswith(".npy"):
            return np.load(path).astype(np.float32)
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        if data.ndim > 1:
            data = data.mean(axis=1)
        return data.astype(np.float32)

    val = mcd(read(args.wav_a), read(args.wav_b), sr=args.sr,
              max_shift=args.max_shift)
    print(json.dumps({"metric": "mcd_db", "value": round(val, 4),
                      "a": args.wav_a, "b": args.wav_b}))


if __name__ == "__main__":
    main()
