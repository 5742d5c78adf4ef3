"""Mel / filterbank features, fully on-device (JAX).

Replaces the reference's host-side torch SeamlessM4TFeatureExtractor front-end
(reference: input_pipeline/maskgct/semantic_utils.py:35 SemanticTokenizer —
16 kHz wav -> kaldi-style 80-dim log-mel fbank -> stack 2 frames -> 160-dim
@50 Hz -> w2v-BERT conformer). Everything here is jit-compatible with static
shapes: STFT via strided framing + rFFT, HTK/kaldi mel scale, per-utterance
mean/var normalization, 2-frame stacking.

Also provides the general mel spectrogram used by codec/vocoder training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# kaldi fbank defaults used by SeamlessM4T / w2v-BERT
SAMPLE_RATE = 16_000
N_FFT = 512  # kaldi: 400-sample window padded to 512
WIN_LENGTH = 400  # 25 ms
HOP_LENGTH = 160  # 10 ms
N_MELS = 80


def hz_to_mel(f, htk: bool = True):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel)


def mel_to_hz(m, htk: bool = True):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_min + f_sp * m)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int = N_MELS,
    n_fft: int = N_FFT,
    sample_rate: int = SAMPLE_RATE,
    fmin: float = 20.0,
    fmax: float | None = None,
    htk: bool = True,
    mel_space_triangles: bool = False,
) -> np.ndarray:
    """[n_fft//2+1, n_mels] triangular filters (host-side, cached).

    mel_space_triangles=True matches kaldi/SeamlessM4T: the triangles are
    linear in MEL space rather than Hz space.
    """
    fmax = fmax or sample_rate / 2
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    fb = np.zeros((len(bins), n_mels))
    if mel_space_triangles:
        mel_bins = hz_to_mel(bins, htk)
        for i in range(n_mels):
            lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
            up = (mel_bins - lo) / max(ctr - lo, 1e-10)
            down = (hi - mel_bins) / max(hi - ctr, 1e-10)
            fb[:, i] = np.maximum(0.0, np.minimum(up, down))
    else:
        for i in range(n_mels):
            lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
            up = (bins - lo) / max(ctr - lo, 1e-10)
            down = (hi - bins) / max(hi - ctr, 1e-10)
            fb[:, i] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def frame_signal(wav: jax.Array, frame_length: int, hop: int, center: bool = False):
    """[..., T] -> [..., num_frames, frame_length] via gather-free slicing."""
    if center:
        pad = frame_length // 2
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    t = wav.shape[-1]
    num = 1 + (t - frame_length) // hop
    idx = jnp.arange(num)[:, None] * hop + jnp.arange(frame_length)[None, :]
    return jnp.take(wav, idx, axis=-1)


def stft_magnitude(
    wav: jax.Array,
    n_fft: int = N_FFT,
    win_length: int = WIN_LENGTH,
    hop: int = HOP_LENGTH,
    window: str = "povey",
    center: bool = False,
    power: float = 2.0,
    preemphasis: float = 0.0,
    remove_dc: bool = True,
) -> jax.Array:
    """[..., T] -> [..., frames, n_fft//2+1] magnitude^power spectrum."""
    frames = frame_signal(wav, win_length, hop, center)
    if remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis > 0.0:
        first = frames[..., :1]
        frames = jnp.concatenate(
            [first * (1 - preemphasis), frames[..., 1:] - preemphasis * frames[..., :-1]],
            axis=-1,
        )
    if window == "hann":
        win = jnp.hanning(win_length + 1)[:-1] if win_length > 1 else jnp.ones(1)
    elif window == "povey":  # kaldi's default: symmetric hann^0.85
        win = (0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(win_length) / (win_length - 1))) ** 0.85
    else:
        win = jnp.ones(win_length)
    frames = frames * win.astype(frames.dtype)
    if n_fft > win_length:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - win_length)])
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    mag = jnp.abs(spec)
    return mag if power == 1.0 else mag**power


def log_mel_fbank(
    wav: jax.Array,
    n_mels: int = N_MELS,
    sample_rate: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
    win_length: int = WIN_LENGTH,
    hop: int = HOP_LENGTH,
    mel_floor: float = 1.192092955078125e-7,
) -> jax.Array:
    """kaldi-style log-mel fbank: [..., T] -> [..., frames, n_mels].

    The input is scaled by 2**15 (kaldi int16 convention, as in the
    reference's SeamlessM4T front-end) — this changes where mel_floor clips.
    """
    wav = wav * 32768.0
    power = stft_magnitude(
        wav, n_fft, win_length, hop, window="povey", center=False, power=2.0,
        preemphasis=0.97, remove_dc=True,
    )
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate, mel_space_triangles=True))
    mel = jnp.maximum(power @ fb, mel_floor)
    return jnp.log(mel)


def w2vbert_features(
    wav: jax.Array,
    wav_lengths: jax.Array | None = None,
    stride: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """SeamlessM4T front-end: log-mel fbank -> per-utterance mean/var norm ->
    stack ``stride`` frames. [..., T] -> ([..., frames//stride, 80*stride],
    feature_lengths).

    wav_lengths masks padding samples out of the normalization statistics.
    """
    feats = log_mel_fbank(wav)  # [..., F, 80]
    f = feats.shape[-2]
    # torch convention: unbiased variance (ddof=1), matching the reference's
    # SeamlessM4TFeatureExtractor per-mel-bin normalization.
    if wav_lengths is not None:
        num_frames = jnp.maximum((wav_lengths - WIN_LENGTH) // HOP_LENGTH + 1, 1)
        mask = (jnp.arange(f)[None, :] < num_frames[:, None])[..., None]
        cnt = jnp.maximum(jnp.sum(mask, axis=-2, keepdims=True), 2)
        mean = jnp.sum(feats * mask, axis=-2, keepdims=True) / cnt
        var = jnp.sum(jnp.square(feats - mean) * mask, axis=-2, keepdims=True) / (cnt - 1)
        feats = (feats - mean) / jnp.sqrt(var + 1e-7)
        feats = jnp.where(mask, feats, 0.0)
        feat_lengths = num_frames // stride
    else:
        mean = jnp.mean(feats, axis=-2, keepdims=True)
        var = jnp.var(feats, axis=-2, keepdims=True, ddof=1)
        feats = (feats - mean) / jnp.sqrt(var + 1e-7)
        feat_lengths = jnp.full(feats.shape[:-2], f // stride, jnp.int32)

    # stack `stride` consecutive frames
    f2 = (f // stride) * stride
    feats = feats[..., :f2, :]
    shape = feats.shape[:-2] + (f2 // stride, feats.shape[-1] * stride)
    return feats.reshape(shape), feat_lengths


def mel_spectrogram(
    wav: jax.Array,
    n_mels: int = 100,
    sample_rate: int = 24_000,
    n_fft: int = 1024,
    hop: int = 256,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    """Vocos/BigVGAN-style log-mel for codec/vocoder losses ([..., F, n_mels])."""
    mag = stft_magnitude(
        wav, n_fft, n_fft, hop, window="hann", center=True, power=1.0,
        preemphasis=0.0, remove_dc=False,
    )
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate, fmin=fmin, fmax=fmax))
    mel = jnp.maximum(mag @ fb, 1e-5)
    return jnp.log(mel)
