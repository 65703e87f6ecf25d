"""Synthetic modulated-signal generation.

Two roles:

1. `generate_test_signal` — the DSP contract's fixture (ref:
   test_dsp_functions.py:23-83): BPSK/QPSK/16QAM symbol sequences with known
   timing, RRC pulse shaping, calibrated AWGN. This is the spec for the timing
   -recovery golden tests.
2. `SyntheticAMCDataset` — a CPU-runnable labeled dataset of RadioML-style
   1024-sample sps=1 frames (BASELINE.json config 1: "raw-IQ transformer-small
   on synthetic QPSK/16QAM"), used by the end-to-end training slice, the
   sweep harness, and the benchmarks, so nothing in the framework requires the
   2018.01A HDF5 download.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import numpy as np

from vitiq.dsp.taps import rrc_filter

# unit-average-power constellations
_CONSTELLATIONS: Dict[str, np.ndarray] = {
    "BPSK": np.array([1.0 + 0j, -1.0 + 0j]),
    "QPSK": np.array([1 + 1j, -1 + 1j, -1 - 1j, 1 - 1j]) / np.sqrt(2.0),
    "8PSK": np.exp(2j * np.pi * np.arange(8) / 8),
    "16QAM": (
        (np.array([-3, -1, 1, 3])[:, None] + 1j * np.array([-3, -1, 1, 3])[None, :])
        .reshape(-1)
        / np.sqrt(10.0)
    ),
    "64QAM": (
        (np.arange(-7, 8, 2)[:, None] + 1j * np.arange(-7, 8, 2)[None, :])
        .reshape(-1)
        / np.sqrt(42.0)
    ),
}

SYNTHETIC_MODULATIONS: Tuple[str, ...] = tuple(_CONSTELLATIONS)


def _symbols(modulation: str, num_symbols: int, rng: np.random.Generator) -> np.ndarray:
    try:
        constellation = _CONSTELLATIONS[modulation]
    except KeyError:
        raise ValueError(f"Unknown modulation: {modulation}") from None
    return constellation[rng.integers(0, len(constellation), num_symbols)]


def generate_test_signal(
    modulation: str = "QPSK",
    num_symbols: int = 100,
    sps: int = 2,
    snr_db: float = 20.0,
    seed: int | None = None,
):
    """RRC-shaped test signal with known symbol timing.

    Mirrors the reference fixture semantics (test_dsp_functions.py:23-83):
    symbols upsampled by zero-insertion at indices i*sps, shaped with
    rrc_filter(alpha=0.35, span=8, sps) via 'same' convolution (so true symbol
    peaks stay at i*sps), then AWGN at the requested measured-signal SNR.

    Returns (i_signal, q_signal, true_symbol_indices).
    """
    rng = np.random.default_rng(seed)
    syms = _symbols(modulation, num_symbols, rng)

    n = num_symbols * sps
    i_up = np.zeros(n)
    q_up = np.zeros(n)
    true_indices = np.arange(num_symbols) * sps
    i_up[true_indices] = syms.real
    q_up[true_indices] = syms.imag

    if sps > 1:
        rrc = rrc_filter(alpha=0.35, span=8, sps=sps)
        i_shaped = np.convolve(i_up, rrc, mode="same")
        q_shaped = np.convolve(q_up, rrc, mode="same")
    else:
        i_shaped, q_shaped = i_up, q_up

    signal_power = np.mean(i_shaped**2 + q_shaped**2)
    noise_power = signal_power / (10.0 ** (snr_db / 10.0))
    i_signal = i_shaped + np.sqrt(noise_power / 2) * rng.standard_normal(n)
    q_signal = q_shaped + np.sqrt(noise_power / 2) * rng.standard_normal(n)
    return i_signal, q_signal, true_indices


@dataclass
class SyntheticAMCDataset:
    """Deterministic in-memory AMC dataset of sps=1 frames.

    X: [N, frame_len, 2] float32 (I/Q last, matching the HDF5 layout
    X:(N,1024,2), ref README.md:226-232), Y: int labels, Z: SNR dB.

    Frames get a random phase rotation and unit-power scaling so the task is
    non-trivial; at sps=1 each sample is a symbol (the RadioML rule,
    ref test_sps_modes.py:103-127).
    """

    classes: Sequence[str] = ("BPSK", "QPSK", "16QAM")
    frames_per_class: int = 512
    frame_len: int = 1024
    snrs_db: Sequence[float] = (-8.0, 0.0, 8.0, 20.0)
    seed: int = 0

    def __post_init__(self):
        for c in self.classes:
            if c not in _CONSTELLATIONS:
                raise ValueError(
                    f"unsupported synthetic class {c!r}; available: {SYNTHETIC_MODULATIONS}"
                )
        rng = np.random.default_rng(self.seed)
        n = len(self.classes) * self.frames_per_class
        F, L = self.frames_per_class, self.frame_len
        X = np.empty((n, L, 2), dtype=np.float32)
        Y = np.empty(n, dtype=np.int32)
        Z = np.empty(n, dtype=np.float32)
        for label, mod in enumerate(self.classes):
            constellation = _CONSTELLATIONS[mod]
            syms = constellation[rng.integers(0, len(constellation), (F, L))]
            syms = syms * np.exp(1j * rng.uniform(0, 2 * np.pi, (F, 1)))  # random phase
            snr = rng.choice(np.asarray(self.snrs_db, np.float32), F)
            noise_scale = np.sqrt(10.0 ** (-snr / 10.0) / 2.0)[:, None]
            sig = syms + noise_scale * (
                rng.standard_normal((F, L)) + 1j * rng.standard_normal((F, L))
            )
            rows = slice(label * F, (label + 1) * F)
            X[rows, :, 0] = sig.real
            X[rows, :, 1] = sig.imag
            Y[rows] = label
            Z[rows] = snr
        perm = rng.permutation(n)
        self.X, self.Y, self.Z = X[perm], Y[perm], Z[perm]

    def __len__(self) -> int:
        return self.X.shape[0]
