"""Impairment-faithful synthetic corpus (VERDICT r3 item 1).

The round-3 proxies were iid symbols at sps=1 (AWGN + random phase only)
and inverted the reference's cross-arm ordering; the ChannelModel layer
restores 2018.01A's generation ingredients — RRC pulse shaping at ~8
samples/symbol, CFO, sample-clock offset, Rician selective fading —
captured back at 1 sample/symbol (ref domain rule: test_sps_modes.py:103-127).
These tests pin the properties each ingredient must create.
"""

import numpy as np
import pytest

from vitiq.data.synthetic import (ChannelModel, SyntheticAMCDataset,
                                  channel_from_config, generate_frames)


def _acf1(sig):
    """Mean |lag-1 autocorrelation| of complex frames [F, L]."""
    return float(np.abs(np.mean(sig[:, 1:] * np.conj(sig[:, :-1]),
                                axis=-1)).mean())


def _evm(sig, constellation):
    """Median distance of samples to the nearest constellation point."""
    d = np.abs(sig[..., None] - constellation[None, None, :]).min(axis=-1)
    return float(np.median(d))


QPSK = np.array([1 + 1j, -1 + 1j, -1 - 1j, 1 - 1j]) / np.sqrt(2.0)


class TestChannelModel:
    def test_deterministic_and_unit_power(self):
        ch = ChannelModel()
        for mod in ("QPSK", "GMSK", "FM"):
            a = generate_frames(mod, 8, 256, np.random.default_rng(3), channel=ch)
            b = generate_frames(mod, 8, 256, np.random.default_rng(3), channel=ch)
            assert np.array_equal(a, b)
            assert a.shape == (8, 256)
            assert np.isfinite(a).all()
            np.testing.assert_allclose(np.mean(np.abs(a) ** 2, axis=-1), 1.0,
                                       atol=1e-6)

    def test_impairments_create_temporal_structure(self):
        """The core fix: impaired frames must carry the inter-sample
        correlation (pulse-shaping ISI) that iid-symbol frames lack — the
        structure the rawIQ arm's sequence tokenization exploits."""
        rng = np.random.default_rng(0)
        iid = generate_frames("QPSK", 64, 1024, rng)
        imp = generate_frames("QPSK", 64, 1024, np.random.default_rng(0),
                              channel=ChannelModel())
        assert _acf1(iid) < 0.08
        assert _acf1(imp) > 0.15

    def test_timing_jitter_toggle(self):
        """With every impairment off and t0=0, the captured samples sit at
        symbol instants — RRC('same') peaks — so they cluster near the
        constellation; random fractional timing moves them mid-transition."""
        quiet = ChannelModel(cfo_max=0.0, clock_ppm_max=0.0, fading=False,
                             timing_jitter=False)
        jit = ChannelModel(cfo_max=0.0, clock_ppm_max=0.0, fading=False,
                           timing_jitter=True)
        a = generate_frames("QPSK", 32, 512, np.random.default_rng(1),
                            channel=quiet)
        b = generate_frames("QPSK", 32, 512, np.random.default_rng(1),
                            channel=jit)
        # remove the per-frame scale (unit-power normalize) by comparing to a
        # scaled constellation: frames are unit power, QPSK is unit power
        assert _evm(a, QPSK) < 0.25
        assert _evm(b, QPSK) > 1.5 * _evm(a, QPSK)

    def test_cfo_rotates_constellation(self):
        """CFO-only channel: the 4th power of QPSK removes the data, leaving
        a tone at 4*f0 — its nonzero frequency is the CFO signature."""
        base = dict(clock_ppm_max=0.0, fading=False, timing_jitter=False)
        off = generate_frames("QPSK", 16, 1024, np.random.default_rng(2),
                              channel=ChannelModel(cfo_max=0.0, **base))
        on = generate_frames("QPSK", 16, 1024, np.random.default_rng(2),
                             channel=ChannelModel(cfo_max=2.5e-3, **base))

        def tone_bin(sig):
            spec = np.abs(np.fft.fft(sig ** 4, axis=-1))
            bins = np.argmax(spec, axis=-1)
            return np.where(bins > sig.shape[-1] // 2,
                            bins - sig.shape[-1], bins)

        assert np.all(tone_bin(off) == 0)          # no offset: tone at DC
        assert np.mean(tone_bin(on) != 0) > 0.8    # offset moves the tone

    def test_fading_tilts_spectra_differently_per_frame(self):
        """Selective fading draws an independent tap set per frame, so the
        low/high-band power ratio varies across frames far more than for
        the flat channel."""
        flat = ChannelModel(fading=False)
        faded = ChannelModel(fading=True)

        def band_ratio_spread(sig):
            spec = np.abs(np.fft.fft(sig, axis=-1)) ** 2
            half = spec.shape[-1] // 2
            lo = spec[:, :half].sum(axis=-1)
            hi = spec[:, half:].sum(axis=-1)
            return float(np.std(np.log(lo / hi)))

        a = generate_frames("QPSK", 64, 1024, np.random.default_rng(4),
                            channel=flat)
        b = generate_frames("QPSK", 64, 1024, np.random.default_rng(4),
                            channel=faded)
        assert band_ratio_spread(b) > 2.0 * band_ratio_spread(a)

    def test_clock_offset_drifts_timing(self):
        """Clock-offset-only channel: the sampling instant drifts through
        the symbol (cyclically — |eps|*m mod 1 symbol), so the whole-frame
        EVM rises well above the clock-off floor."""
        base = dict(cfo_max=0.0, fading=False, timing_jitter=False)
        off = generate_frames("QPSK", 64, 1024, np.random.default_rng(5),
                              channel=ChannelModel(clock_ppm_max=0.0, **base))
        on = generate_frames("QPSK", 64, 1024, np.random.default_rng(5),
                             channel=ChannelModel(clock_ppm_max=2000.0, **base))
        assert _evm(on, QPSK) > 1.5 * _evm(off, QPSK)

    def test_all_classes_generate(self):
        from vitiq.data.synthetic import SYNTHETIC_MODULATIONS

        ch = ChannelModel()
        for mod in SYNTHETIC_MODULATIONS:
            sig = generate_frames(mod, 2, 128, np.random.default_rng(6),
                                  channel=ch)
            assert sig.shape == (2, 128) and np.isfinite(sig).all(), mod


class TestDatasetAndConfig:
    def test_dataset_with_channel(self):
        ds = SyntheticAMCDataset(classes=("QPSK", "GMSK"), frames_per_class=16,
                                 frame_len=256, seed=1,
                                 channel=ChannelModel())
        assert ds.X.shape == (32, 256, 2)
        assert np.isfinite(ds.X).all()
        ds2 = SyntheticAMCDataset(classes=("QPSK", "GMSK"), frames_per_class=16,
                                  frame_len=256, seed=1,
                                  channel=ChannelModel())
        assert np.array_equal(ds.X, ds2.X)

    def test_channel_from_config(self):
        from vitiq.config import DataConfig

        assert channel_from_config(DataConfig()) is None
        cfg = DataConfig(synthetic_channel=True,
                         synthetic_channel_params={"fading": False,
                                                   "tap_delays": [0.0, 1.0]})
        ch = channel_from_config(cfg)
        assert ch is not None and ch.fading is False
        assert ch.tap_delays == (0.0, 1.0)  # list coerced to tuple

    def test_config_json_round_trip(self, tmp_path):
        from vitiq.config import ExperimentConfig

        cfg = ExperimentConfig.rawiq_synthetic19(**{
            "data.synthetic_channel": True,
            "data.synthetic_channel_params": {"cfo_max": 0.0},
        })
        p = tmp_path / "cfg.json"
        cfg.to_json(str(p))
        back = ExperimentConfig.from_json(str(p))
        assert back.data.synthetic_channel is True
        assert channel_from_config(back.data).cfo_max == 0.0

    def test_historical_corpus_unchanged(self):
        """channel=None must keep the round-3 corpus byte-identical (the
        pool-gate / head-variant validation artifacts were measured on it)."""
        a = SyntheticAMCDataset(classes=("QPSK",), frames_per_class=8,
                                frame_len=128, seed=3)
        b = SyntheticAMCDataset(classes=("QPSK",), frames_per_class=8,
                                frame_len=128, seed=3, channel=None)
        assert np.array_equal(a.X, b.X)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
