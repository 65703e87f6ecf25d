"""Polyphase filter-bank channelizer.

The streaming-wideband workload (BASELINE.json config 5: "64-channel
channelizer -> batched fused DSP+ViT") has no counterpart in the reference —
it is the scale-out axis SURVEY.md §5 prescribes for this domain: shard
CHANNELS/FRAMES across chips, not tokens.

Standard critically-sampled polyphase channelizer: a prototype lowpass of
length K*taps_per_phase is decomposed into K phases; each phase FIR-filters
its decimated branch and an inverse FFT across branches yields the K channel
streams. Everything is jnp: the branch filtering is ONE grouped conv (K
feature groups) and the FFT batches over time — the whole channelizer fuses
into the downstream classifier jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def design_prototype_lowpass(num_channels: int, taps_per_phase: int = 8,
                             beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed sinc prototype with cutoff at the channel half-width
    (1/(2K) of the input rate). Unit DC gain per branch."""
    n = num_channels * taps_per_phase
    t = np.arange(n) - (n - 1) / 2.0
    h = np.sinc(t / num_channels) * np.kaiser(n, beta)
    return (h / h.sum()).astype(np.float64)


def polyphase_channelize(x: jnp.ndarray, num_channels: int,
                         taps: np.ndarray) -> jnp.ndarray:
    """[B, N] complex wideband -> [B, K, N//K] complex channel streams.

    N must be a multiple of K. Channel k is centered at f = k/K of the input
    sample rate (fftfreq ordering: k > K/2 are negative frequencies).
    """
    B, N = x.shape
    K = num_channels
    if N % K:
        raise ValueError(f"stream length {N} must be a multiple of num_channels {K}")
    P = len(taps) // K
    if len(taps) != K * P:
        raise ValueError("taps length must be a multiple of num_channels")
    M = N // K

    # commutator: branch k takes samples n = m*K + k, newest-first branch order
    xb = x.reshape(B, M, K)  # [B, m, k]
    # polyphase decomposition of the prototype: phase k = taps[k::K]
    h = jnp.asarray(taps, jnp.float32).reshape(P, K)  # h[p, k] = taps[p*K + k]

    # branch FIR along m: y[b, m, k] = sum_p x[b, m - p, k] * h[p, k]
    # as one grouped conv with K groups (real and imag parts separately)
    def branch_filter(real_imag):  # [B, M, K] real
        lhs = real_imag.transpose(0, 2, 1)  # [B, K, M]
        rhs = jnp.flip(h, 0).T[:, None, :]  # [K, 1, P], conv kernel per group
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1,), padding=((P - 1, 0),),  # causal
            feature_group_count=K, dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return out.transpose(0, 2, 1)  # [B, M, K]

    yr = branch_filter(jnp.real(xb))
    yi = branch_filter(jnp.imag(xb))
    y = (yr + 1j * yi).astype(jnp.complex64)

    # forward DFT across branches demodulates channel k (branch phase for an
    # on-bin tone at f = c/K is e^{+j2pi ck/K}; summing against e^{-j2pi kk'/K}
    # peaks at k' = c). Unnormalized FFT x per-branch DC gain 1/K ~= unit gain.
    channels = jnp.fft.fft(y, axis=-1)  # [B, M, K] -> channel index on axis -1
    return channels.transpose(0, 2, 1)


def synthesize_multitone(
    num_channels: int,
    samples_per_channel: int,
    active: Tuple[Tuple[int, float], ...],
    seed: int = 0,
    noise_db: float = -30.0,
) -> np.ndarray:
    """Test/demo wideband: complex tones (+ noise) at given (channel, amplitude)
    pairs. Returns [1, K * samples_per_channel] complex64."""
    K = num_channels
    N = K * samples_per_channel
    rng = np.random.default_rng(seed)
    t = np.arange(N)
    x = np.zeros(N, np.complex128)
    for ch, amp in active:
        f = (ch / K) % 1.0
        phase = rng.uniform(0, 2 * np.pi)
        x += amp * np.exp(1j * (2 * np.pi * f * t + phase))
    npow = 10.0 ** (noise_db / 10.0)
    x += np.sqrt(npow / 2) * (rng.standard_normal(N) + 1j * rng.standard_normal(N))
    return x[None].astype(np.complex64)
