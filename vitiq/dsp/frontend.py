"""Preprocessing front-end: symbol extraction + normalization + model-shaping.

Single-frame numpy APIs reproduce the reference helpers retained in
`plot_preprocessing_signal.py:72-187` and the deleted DSP module's
`extract_symbols` contract (SURVEY.md §2.4). Batched jnp variants are the
jit-fusable production path that feeds the models without leaving the device.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from vitiq.dsp.filtering import matched_filter
from vitiq.dsp.timing import (
    simple_timing_recovery,
    timing_recovery_gardner,
    timing_recovery_mueller_muller,
)

_METHODS = ("simple_energy", "simple_correlation", "gardner", "mueller_muller")


def extract_symbols(i_signal, q_signal, sps: int = 1, method: str = "simple_energy") -> Dict:
    """Symbol extraction with SPS-mode semantics from the reference contract.

    sps == 1 (RadioML 2018.01A mode, ref: test_sps_modes.py:37-42): BYPASS —
      no filtering, no timing recovery; every sample IS a symbol, so
      `filtered_i` equals the input exactly and the output length equals the
      input length.
    sps >= 2 (oversampled mode, ref: test_dsp_functions.py:117-156): RRC
      matched filter, then timing recovery via `method`, yielding ~n/sps
      symbols.

    Returns dict with keys: symbol_i, symbol_q, symbol_indices,
    filtered_i, filtered_q.
    """
    i_sig = np.asarray(i_signal, dtype=np.float32)
    q_sig = np.asarray(q_signal, dtype=np.float32)
    if i_sig.shape != q_sig.shape or i_sig.ndim != 1:
        raise ValueError("i_signal and q_signal must be equal-length 1-D arrays")
    if sps < 1:
        raise ValueError(f"sps must be >= 1, got {sps}")

    if sps == 1:
        indices = np.arange(len(i_sig))
        return {
            "symbol_i": i_sig,
            "symbol_q": q_sig,
            "symbol_indices": indices,
            "filtered_i": i_sig,  # identical: test_sps_modes checks array_equal
            "filtered_q": q_sig,
        }

    if method not in _METHODS:
        raise ValueError(f"unknown timing-recovery method {method!r}; choose from {_METHODS}")

    filtered_i, filtered_q = matched_filter(i_sig, q_sig, sps=sps)
    if method == "simple_energy":
        indices = simple_timing_recovery(filtered_i, filtered_q, sps, method="energy")
    elif method == "simple_correlation":
        indices = simple_timing_recovery(filtered_i, filtered_q, sps, method="correlation")
    elif method == "gardner":
        indices = timing_recovery_gardner(filtered_i, filtered_q, sps)
    else:
        indices = timing_recovery_mueller_muller(filtered_i, filtered_q, sps)

    return {
        "symbol_i": filtered_i[indices],
        "symbol_q": filtered_q[indices],
        "symbol_indices": indices,
        "filtered_i": filtered_i,
        "filtered_q": filtered_q,
    }


# --------------------------------------------------------------------------
# normalization + model shaping (single frame, numpy — reference parity)
# --------------------------------------------------------------------------

def apply_normalization(i_signal, q_signal, stats: Dict[str, float]):
    """Z-score I and Q with per-channel train-split stats
    (ref: plot_preprocessing_signal.py:115-131)."""
    i_norm = (np.asarray(i_signal) - stats["i_mean"]) / stats["i_std"]
    q_norm = (np.asarray(q_signal) - stats["q_mean"]) / stats["q_std"]
    return i_norm, q_norm


def preprocess_for_vit(i_signal, q_signal, stats: Dict[str, float], H: int = 32, W: int = 64):
    """normalize -> concat [I, Q] (2048) -> reshape [1, H, W]
    (ref: plot_preprocessing_signal.py:134-161, ViT/dataloader/dataset.py:211-226)."""
    i_norm, q_norm = apply_normalization(i_signal, q_signal, stats)
    return np.concatenate([i_norm, q_norm]).reshape(1, H, W)


def preprocess_for_transformer(i_signal, q_signal, stats: Dict[str, float]):
    """normalize -> stack [2, L]
    (ref: plot_preprocessing_signal.py:164-187)."""
    i_norm, q_norm = apply_normalization(i_signal, q_signal, stats)
    return np.stack([i_norm, q_norm], axis=0)


# --------------------------------------------------------------------------
# batched, jittable device path
# --------------------------------------------------------------------------

def preprocess_batch_vit(x: jnp.ndarray, stats: Dict[str, float],
                         H: int = 32, W: int = 64) -> jnp.ndarray:
    """[B, L, 2] raw frames -> [B, 1, H, W] normalized ViT images, fully
    on-device. Fuses into the model jit (the reference does this per-sample on
    CPU workers, ref: ViT/dataloader/dataset.py:211-226)."""
    mean = jnp.asarray([stats["i_mean"], stats["q_mean"]], x.dtype)
    std = jnp.asarray([stats["i_std"], stats["q_std"]], x.dtype)
    norm = (x - mean) / std
    B = x.shape[0]
    # concat I then Q (channel-major), then view as image
    flat = jnp.concatenate([norm[..., 0], norm[..., 1]], axis=-1)  # [B, 2L]
    return flat.reshape(B, 1, H, W)


def preprocess_batch_rawiq(x: jnp.ndarray, stats: Dict[str, float]) -> jnp.ndarray:
    """[B, L, 2] raw frames -> [B, 2, L] normalized sequences, on-device
    (ref: transformer_rawIQ/dataloader/dataset.py:214-224)."""
    mean = jnp.asarray([stats["i_mean"], stats["q_mean"]], x.dtype)
    std = jnp.asarray([stats["i_std"], stats["q_std"]], x.dtype)
    return ((x - mean) / std).transpose(0, 2, 1)


_HYBRID_LOGGED: set = set()


def _log_hybrid_engaged_once(method: str, window: int) -> None:
    """One-time notice that the hybrid open-loop extrapolation replaced the
    full per-symbol feedback loop (ADVICE r4: the default silently changes
    behavior vs the reference on inputs with intra-frame clock drift;
    hybrid_window=0 restores the exact contract loop). Accuracy envelope at
    the corpus's 500 ppm worst case is pinned by
    tests/test_sps_e2e.py::test_hybrid_parity_under_clock_drift."""
    key = (method, window)
    if key not in _HYBRID_LOGGED:
        _HYBRID_LOGGED.add(key)
        import logging

        logging.getLogger("vitiq.dsp").info(
            "timing recovery %r using HYBRID loop (window=%d); set "
            "timing_hybrid_window=0 for the full per-symbol feedback loop",
            method, window)


def preprocess_batch_sps(x: jnp.ndarray, sps: int, alpha: float = 0.35,
                         span: int = 8,
                         method: str = "simple_energy",
                         hybrid_window: int = 64) -> jnp.ndarray:
    """Fused SPS-aware front-end (BASELINE.json config 3), fully batched/jit:

    sps == 1: identity (RadioML rule — every sample is a symbol).
    sps >= 2: RRC matched filter (one grouped conv over the batch) -> batched
    timing recovery via `method` -> [B, L//sps, 2] symbols.

    All four contract methods (ref: test_dsp_functions.py:117-156) run fully
    on-device:
      simple_energy / simple_correlation — vectorized per-frame phase pick
        (traced index, jnp.take along the phase axis);
      gardner / mueller_muller — by default the HYBRID loop (coarse energy
        phase + `hybrid_window`-step tracking + uniform strobes,
        vitiq.dsp.timing.hybrid_timing_positions) — it cuts the sequential
        chain from L//sps to `hybrid_window` steps, the e2e Gardner
        bottleneck (VERDICT r3 item 7). hybrid_window=0 restores the full
        per-symbol feedback loops (batched_timing_positions — required when
        intra-frame clock drift approaches a sample). Strobes that run past
        the frame end (the full scan's fixed L//sps trip count can
        overshoot on drifting loops) clamp to the last sample, so the
        output shape stays static; the single-frame extract_symbols drops
        them instead.
    """
    if sps == 1:
        return x
    if method not in _METHODS:
        raise ValueError(f"unknown timing-recovery method {method!r}; choose from {_METHODS}")
    from vitiq.dsp.filtering import matched_filter_batch

    B, L, _ = x.shape
    if L % sps:
        raise ValueError(f"frame length {L} must be a multiple of sps ({sps})")
    filtered = matched_filter_batch(x, sps=sps, alpha=alpha, span=span)
    n_sym = L // sps

    if method in ("gardner", "mueller_muller"):
        from vitiq.dsp.timing import (batched_timing_positions,
                                      hybrid_timing_positions)

        if hybrid_window and hybrid_window < n_sym:
            _log_hybrid_engaged_once(method, hybrid_window)
            positions, _valid = hybrid_timing_positions(
                filtered[..., 0], filtered[..., 1], sps, method,
                window=hybrid_window)
        else:
            positions, _valid = batched_timing_positions(
                filtered[..., 0], filtered[..., 1], sps, method)  # [B, n_sym]
        idx = jnp.clip(jnp.rint(positions), 0, L - 1).astype(jnp.int32)
        return jnp.take_along_axis(filtered, idx[..., None], axis=1)

    # [B, n_sym, sps, 2]: candidate symbol streams for each decimation phase
    phased = filtered.reshape(B, n_sym, sps, 2)
    if method == "simple_energy":
        score = jnp.sum(phased[..., 0] ** 2 + phased[..., 1] ** 2, axis=1)  # [B, sps]
    else:  # simple_correlation: symbol-to-symbol correlation per phase
        si, sq = phased[..., 0], phased[..., 1]
        score = jnp.mean(
            jnp.abs(si[:, :-1] * si[:, 1:] + sq[:, :-1] * sq[:, 1:]), axis=1)
    best = jnp.argmax(score, axis=-1)  # [B]
    return jnp.take_along_axis(
        phased, best[:, None, None, None], axis=2
    )[:, :, 0, :]


def preprocess_batch_spectrogram(
    x: jnp.ndarray,
    nfft: int = 64,
    hop: int = 32,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """[B, L, 2] I/Q frames -> [B, 1, nfft, T] log-magnitude spectrogram
    images for the ViT arm (the spectrogram patchification input mode named in
    BASELINE.json's north star).

    Complex STFT with a Hann window; full two-sided spectrum (I/Q is complex
    baseband, so negative frequencies carry information), fftshifted so DC is
    centered, log10 magnitude, per-frame standardized. T = (L - nfft)//hop + 1.
    """
    B, L, _ = x.shape
    if L < nfft:
        raise ValueError(f"frame length {L} must be >= nfft ({nfft})")
    sig = x[..., 0] + 1j * x[..., 1]
    T = (L - nfft) // hop + 1
    starts = jnp.arange(T) * hop
    # gather windows: [B, T, nfft]
    idx = starts[:, None] + jnp.arange(nfft)[None, :]
    frames = sig[:, idx]
    window = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(nfft) / nfft))
    spec = jnp.fft.fft(frames * window, axis=-1)
    mag = jnp.log10(jnp.abs(jnp.fft.fftshift(spec, axes=-1)) + eps)
    img = mag.transpose(0, 2, 1)  # [B, nfft(freq), T(time)]
    mean = img.mean(axis=(1, 2), keepdims=True)
    std = jnp.maximum(img.std(axis=(1, 2), keepdims=True), 1e-6)
    return ((img - mean) / std)[:, None, :, :].astype(jnp.float32)


def preprocess_batch_vit_spectrogram(x: jnp.ndarray, H: int = 32,
                                     W: int = 64) -> jnp.ndarray:
    """[B, L, 2] I/Q frames -> [B, 1, H, W] spectrogram IMAGES sized for the
    ViT patch grid (the 'spectrogram patchification' input mode of
    BASELINE.json configs 2; `DataConfig.features='spectrogram'`).

    nfft = H (frequency bins fill the image height); hop is chosen so the
    STFT yields at least W frames, then the time axis is center-cropped to
    exactly W. Falls back to edge-padding when L is too short to produce W
    frames at hop=1."""
    B, L, _ = x.shape
    if L < H:
        raise ValueError(f"frame length {L} must be >= nfft (= H = {H})")
    hop = max(1, (L - H) // max(1, W - 1))
    img = preprocess_batch_spectrogram(x, nfft=H, hop=hop)  # [B, 1, H, T]
    T = img.shape[-1]
    if T < W:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (0, W - T)), mode="edge")
    elif T > W:
        start = (T - W) // 2
        img = img[..., start:start + W]
    return img


def preprocess_batch_mdf(x: jnp.ndarray, H: int = 32, W: int = 32,
                         stats: Optional[Dict[str, float]] = None):
    """The MDF-NET dual-stream transform (ref: ViT/MDF_NET.ipynb cell 7):
    [B, L, 2] raw frames -> (amplitude image [B, 1, H, W] scaled by per-frame
    max, phase image [B, 1, H, W] scaled by pi, iq sequence [B, L, 2]).

    With `stats` (the dataset i/q mean/std dict), the I/Q channels are
    z-scored FIRST and amplitude/phase derive from the normalized signal.
    The notebook normalizes amplitude by a DATASET-level scalar
    `norm_stats['amp_max']` (amp_all.max(), cell 7) — pass that scalar as
    `stats['amp_max']` to get the exact cell-7 semantics (cross-frame
    amplitude scale preserved). Without `amp_max` in stats (or with
    stats=None) each frame is rescaled by its own max — scale-invariant
    features, a deliberate departure from the notebook. L must equal H*W
    (1024 = 32x32 in the notebook). The notebook's CNN-LSTM consumer
    (`CNN_LSTM_new.create_multi_domain_model`) is missing from the reference
    tree (SURVEY.md §2.7); a capability-equivalent reconstruction of its
    contract lives in `vitiq.models.mdf`.
    """
    B, L, _ = x.shape
    if L != H * W:
        raise ValueError(f"frame length {L} must equal H*W = {H * W}")
    if stats is not None:
        x = jnp.stack([
            (x[..., 0] - stats["i_mean"]) / stats["i_std"],
            (x[..., 1] - stats["q_mean"]) / stats["q_std"],
        ], axis=-1)
    i_sig, q_sig = x[..., 0], x[..., 1]
    amp = jnp.sqrt(i_sig * i_sig + q_sig * q_sig)
    if stats is not None and "amp_max" in stats:
        amp_max = jnp.maximum(jnp.asarray(stats["amp_max"], amp.dtype), 1e-8)
    else:
        amp_max = jnp.maximum(jnp.max(amp, axis=-1, keepdims=True), 1e-8)
    amp_img = (amp / amp_max).reshape(B, 1, H, W)
    phase_img = (jnp.arctan2(q_sig, i_sig) / jnp.pi).reshape(B, 1, H, W)
    return amp_img, phase_img, x


def preprocess_batch_amplitude_phase(x: jnp.ndarray) -> jnp.ndarray:
    """[B, L, 2] raw frames -> [B, 2, L] (amplitude/amp_max, phase/pi) features.

    The multi-domain feature transform from the reference's MDF-NET workload
    (ref: ViT/MDF_NET.ipynb cell 7: amplitude normalized by its per-frame max,
    phase by pi). The external CNN-LSTM model that consumed it is missing from
    the reference tree (SURVEY.md §2.7) — here the transform feeds the shared
    rawIQ encoder instead, giving modulation-order cues (|x|, arg x) that are
    first-order in the features rather than second-order in raw I/Q."""
    i_sig, q_sig = x[..., 0], x[..., 1]
    amp = jnp.sqrt(i_sig * i_sig + q_sig * q_sig)
    amp_max = jnp.maximum(jnp.max(amp, axis=-1, keepdims=True), 1e-8)
    phase = jnp.arctan2(q_sig, i_sig) / jnp.pi
    return jnp.stack([amp / amp_max, phase], axis=1)
