"""Channelizer + streaming-pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitiq.dsp.channelizer import (
    design_prototype_lowpass,
    polyphase_channelize,
    synthesize_multitone,
)


class TestPrototype:
    def test_unit_dc_gain_and_length(self):
        h = design_prototype_lowpass(16, taps_per_phase=8)
        assert len(h) == 16 * 8
        assert np.sum(h) == pytest.approx(1.0)

    def test_lowpass_shape(self):
        h = design_prototype_lowpass(16, taps_per_phase=12)
        H = np.abs(np.fft.fft(h, 4096))
        # stopband (beyond 2x channel width) well below passband
        passband = H[:64].max()
        stopband = H[512:2048].max()
        assert stopband < 0.01 * passband


class TestChannelizer:
    def test_tone_lands_in_its_channel(self):
        K, M = 16, 256
        for ch in (0, 3, 9, 15):
            x = jnp.asarray(synthesize_multitone(K, M, active=((ch, 1.0),),
                                                 noise_db=-60, seed=ch))
            taps = design_prototype_lowpass(K)
            y = polyphase_channelize(x, K, taps)  # [1, K, M]
            powers = np.asarray(jnp.mean(jnp.abs(y[0]) ** 2, axis=-1))
            assert int(np.argmax(powers)) == ch
            others = np.delete(powers, ch)
            assert powers[ch] > 50 * others.max(), f"channel {ch} leakage"

    def test_two_tones_two_channels(self):
        K, M = 32, 128
        x = jnp.asarray(synthesize_multitone(K, M, active=((5, 1.0), (20, 0.5)),
                                             noise_db=-60))
        y = polyphase_channelize(x, K, design_prototype_lowpass(K))
        powers = np.asarray(jnp.mean(jnp.abs(y[0]) ** 2, axis=-1))
        top2 = set(np.argsort(powers)[-2:])
        assert top2 == {5, 20}

    def test_tone_amplitude_preserved(self):
        """Critically-sampled PFB with unit-DC prototype: an on-bin tone of
        amplitude A appears in its channel with amplitude ~A."""
        K, M = 16, 512
        x = jnp.asarray(synthesize_multitone(K, M, active=((4, 0.7),), noise_db=-80))
        y = polyphase_channelize(x, K, design_prototype_lowpass(K))
        amp = float(jnp.mean(jnp.abs(y[0, 4, 64:])))  # skip filter warmup
        assert amp == pytest.approx(0.7, rel=0.05)

    def test_shape_validation(self):
        taps = design_prototype_lowpass(8)
        with pytest.raises(ValueError):
            polyphase_channelize(jnp.zeros((1, 100), jnp.complex64), 8, taps)

    def test_batch_independence(self):
        K, M = 8, 64
        a = synthesize_multitone(K, M, active=((2, 1.0),), seed=0)
        b = synthesize_multitone(K, M, active=((6, 1.0),), seed=1)
        taps = design_prototype_lowpass(K)
        both = polyphase_channelize(jnp.asarray(np.concatenate([a, b])), K, taps)
        solo_a = polyphase_channelize(jnp.asarray(a), K, taps)
        np.testing.assert_allclose(np.asarray(both[0]), np.asarray(solo_a[0]),
                                   atol=1e-5)


class TestStreamingPipeline:
    def test_end_to_end_shapes(self):
        from vitiq.config import ModelConfig
        from vitiq.models import init_amc_params, make_forward
        from vitiq.streaming import make_streaming_classifier

        cfg = ModelConfig(arm="rawiq", num_classes=5, d_model=32, n_head=4,
                          n_layers=1, ffn_hidden=64, seq_length=128,
                          segment_size=16)
        params = init_amc_params(jax.random.PRNGKey(0), cfg)
        fwd = make_forward(cfg)
        stats = {"i_mean": 0.0, "i_std": 1.0, "q_mean": 0.0, "q_std": 1.0}
        classify = make_streaming_classifier(cfg, fwd, stats, num_channels=8)
        wideband = jnp.asarray(synthesize_multitone(8, 128, active=((1, 1.0),)))
        logits = classify(params, wideband)
        assert logits.shape == (1, 8, 5)
        assert np.isfinite(np.asarray(logits)).all()

    def test_demo_runs(self):
        from vitiq.streaming import demo_streaming

        out = demo_streaming(num_channels=8, numerics="reference")
        assert out["logits_shape"] == (1, 8, 19)
        assert out["per_channel_pred"].shape == (1, 8)
