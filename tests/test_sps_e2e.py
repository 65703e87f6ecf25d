"""SPS-mode pipeline END-TO-END (BASELINE config 3): train + evaluate a
classifier THROUGH the sps>=2 matched-filter + timing-recovery front-end via
the production entry points (the round-2 gap: the library existed but no
train/eval/bench path exercised it).

Domain rule under test (ref: test_sps_modes.py:103-127): sps=1 is the
RadioML bypass; at sps>=2 the front-end decimates L samples to L/sps
symbols, and the classifier consumes the symbol stream."""

import json

import numpy as np
import pytest

from vitiq.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig


def _sps_cfg(tmp_path, sps=2, method="gardner"):
    frame_len = 256
    return ExperimentConfig(
        model=ModelConfig(arm="rawiq", num_classes=3, d_model=32, n_head=4,
                          n_layers=2, ffn_hidden=64, drop_prob=0.1,
                          seq_length=frame_len // sps, segment_size=8),
        data=DataConfig(source="synthetic",
                        synthetic_classes=("BPSK", "QPSK", "16QAM"),
                        synthetic_frames_per_class=128,
                        synthetic_frame_len=frame_len,
                        synthetic_snr_db=(20.0,),
                        sps=sps, timing_method=method),
        train=TrainConfig(batch_size=32, num_epochs=2, learning_rate=1e-3),
        experiment_name=f"sps{sps}_{method}",
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )


class TestSPSConfigValidation:
    def test_seq_length_must_match_decimated_frames(self, tmp_path):
        cfg = _sps_cfg(tmp_path, sps=2)
        cfg.model.seq_length = 256  # raw length — wrong once sps=2 decimates
        with pytest.raises(ValueError, match="effective"):
            cfg.validate(check_paths=False)

    def test_bad_timing_method_rejected(self, tmp_path):
        cfg = _sps_cfg(tmp_path)
        cfg.data.timing_method = "bogus"
        with pytest.raises(ValueError, match="timing_method"):
            cfg.validate(check_paths=False)

    def test_frame_len_must_divide_by_sps(self, tmp_path):
        cfg = _sps_cfg(tmp_path)
        cfg.data.sps = 3  # 256 % 3 != 0
        with pytest.raises(ValueError, match="multiple"):
            cfg.validate(check_paths=False)


class TestSPSTrainEval:
    def test_run_training_through_sps2_gardner(self, tmp_path):
        """Full train+eval through the fused sps=2 front-end; config.json
        embeds the sps settings so standalone evaluation re-derives the same
        pipeline."""
        from vitiq.runner import run_evaluation, run_training

        cfg = _sps_cfg(tmp_path, sps=2, method="gardner")
        summary = run_training(cfg, verbose=False)
        assert summary["epochs_run"] == 2
        assert "test_overall_accuracy" in summary
        exp_dir = tmp_path / "ckpt" / "sps2_gardner"
        saved = json.loads((exp_dir / "config.json").read_text())
        assert saved["data"]["sps"] == 2
        assert saved["data"]["timing_method"] == "gardner"
        # standalone eval re-derives the sps front-end from config.json
        res = run_evaluation(str(exp_dir), dataset="test", verbose=False)
        assert res["overall_accuracy"] == pytest.approx(
            summary["test_overall_accuracy"], abs=1e-9)

    def test_sps_front_end_sees_symbols_not_samples(self, tmp_path):
        """build_preprocess at sps=2 must emit seq_length//1 symbol tokens:
        shape contract [B, 2, L/sps] into the rawiq arm."""
        from vitiq.runner import build_preprocess

        cfg = _sps_cfg(tmp_path, sps=2, method="simple_energy")
        stats = {"i_mean": 0.0, "i_std": 1.0, "q_mean": 0.0, "q_std": 1.0}
        pre = build_preprocess(cfg, stats)
        x = np.random.default_rng(0).standard_normal((4, 256, 2)).astype(np.float32)
        out = np.asarray(pre(x))
        assert out.shape == (4, 2, 128)

    def test_sps1_bypass_matches_plain_preprocess(self, tmp_path):
        from vitiq.runner import build_preprocess

        cfg = _sps_cfg(tmp_path, sps=2)
        cfg.data.sps = 1
        cfg.model.seq_length = 256
        stats = {"i_mean": 0.1, "i_std": 1.2, "q_mean": -0.05, "q_std": 0.9}
        pre = build_preprocess(cfg, stats)
        from vitiq.dsp import preprocess_batch_rawiq

        x = np.random.default_rng(1).standard_normal((2, 256, 2)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(pre(x)),
                                      np.asarray(preprocess_batch_rawiq(x, stats)))


def test_bench_sps_infer_smoke():
    """The sps_infer bench compiles and reports frames/s on CPU."""
    from vitiq.bench import bench_sps_infer

    r = bench_sps_infer(batch_size=16, steps=3, sps=2, method="simple_energy")
    assert r["value"] > 0
    assert r["sps"] == 2
    assert "sps2_simple_energy" in r["metric"]


def test_hybrid_parity_under_clock_drift():
    """Safety envelope for the hybrid-timing DEFAULT (VERDICT r4 item 7 /
    ADVICE r4): at the corpus's ±500 ppm sample-clock-offset worst case
    (uniform strobes drift ~0.5 sample across a 512-symbol frame) the
    hybrid open-loop extrapolation (timing_hybrid_window=64) must classify
    at parity with the reference's full per-symbol feedback loop
    (hybrid_window=0). A tiny classifier is trained through the hybrid
    path on drift-free shaped frames, then both timing paths evaluate the
    SAME worst-case drifting test set."""
    import jax
    import jax.numpy as jnp

    from vitiq.data.synthetic import _symbols
    from vitiq.dsp import preprocess_batch_rawiq, preprocess_batch_sps
    from vitiq.dsp.taps import rrc_filter
    from vitiq.models import init_amc_params, make_forward

    sps, n_sym, Q = 2, 512, 8
    classes = ("BPSK", "QPSK", "16QAM")
    taps = rrc_filter(alpha=0.35, span=8, sps=sps * Q)

    def shaped(mod, F, ppm, rng, snr_db=15.0):
        """RRC frames sampled on a receiver clock offset by `ppm` (fine-grid
        synthesis at Q x the output rate, uniform decimation — symbol
        instants drift ppm*1e-6 per output sample, the ChannelModel
        clock-offset recipe)."""
        out = np.zeros((F, n_sym * sps, 2), np.float32)
        pad = 8
        for f in range(F):
            syms = _symbols(mod, n_sym + pad, rng)
            eps = rng.uniform(-1.0, 1.0) * ppm * 1e-6 if ppm else 0.0
            fine_n = (n_sym + pad) * sps * Q
            up = np.zeros(fine_n, complex)
            pos = np.round(np.arange(n_sym + pad) * sps * Q * (1 + eps)
                           ).astype(int)
            pos = pos[pos < fine_n]
            up[pos] = syms[: len(pos)]
            sh = np.convolve(up, taps, mode="same")
            samp = sh[::Q][: n_sym * sps]
            samp = samp / np.sqrt(np.mean(np.abs(samp) ** 2))  # unit power
            p = 1.0
            nstd = np.sqrt(p / (10 ** (snr_db / 10)) / 2)
            samp = samp + nstd * (rng.standard_normal(len(samp))
                                  + 1j * rng.standard_normal(len(samp)))
            out[f, :, 0], out[f, :, 1] = samp.real, samp.imag
        return out

    rng = np.random.default_rng(11)
    xs, ys = [], []
    for ci, mod in enumerate(classes):
        xs.append(shaped(mod, 96, 0.0, rng))
        ys.append(np.full(96, ci, np.int32))
    x_tr = np.concatenate(xs)
    y_tr = np.concatenate(ys)
    xs, ys = [], []
    for ci, mod in enumerate(classes):
        xs.append(shaped(mod, 32, 500.0, rng))  # the worst-case rung
        ys.append(np.full(32, ci, np.int32))
    x_te = jnp.asarray(np.concatenate(xs))
    y_te = np.concatenate(ys)

    cfg = ModelConfig(arm="rawiq", num_classes=3, d_model=32, n_head=4,
                      n_layers=2, ffn_hidden=64, drop_prob=0.0,
                      seq_length=n_sym, segment_size=16)
    stats = {"i_mean": 0.0, "i_std": 1.0, "q_mean": 0.0, "q_std": 1.0}
    fwd = make_forward(cfg)

    def pre(x, window):
        sym = preprocess_batch_sps(x, sps, method="gardner",
                                   hybrid_window=window)
        return preprocess_batch_rawiq(sym, stats)

    from vitiq.config import TrainConfig
    from vitiq.train.loop import make_train_step
    from vitiq.train.optim import create_train_state, make_optimizer

    tcfg = TrainConfig(batch_size=32, learning_rate=3e-3, weight_decay=1e-4)
    params = init_amc_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(tcfg)
    state = create_train_state(params, tcfg)
    step = make_train_step(fwd, tx, tcfg.label_smoothing,
                           lambda x: pre(x, 64))
    rng_j = jax.random.PRNGKey(0)
    order = np.random.default_rng(0)
    for _ in range(8):
        perm = order.permutation(len(x_tr))
        for s in range(0, len(perm) - 31, 32):
            bi = perm[s:s + 32]
            state, _ = step(state, jnp.asarray(x_tr[bi]),
                            jnp.asarray(y_tr[bi]), rng_j)

    def accuracy_at(window):
        logits = fwd(state.params, pre(x_te, window), train=False)
        return float(np.mean(np.argmax(np.asarray(logits), -1) == y_te))

    acc_full = accuracy_at(0)
    acc_hybrid = accuracy_at(64)
    # the model must have learned the task for the gate to mean anything
    assert acc_full > 0.6, f"full-loop accuracy too low ({acc_full:.3f})"
    assert acc_hybrid >= acc_full - 0.04, (
        f"hybrid timing lost accuracy under 500 ppm drift: "
        f"full={acc_full:.3f} hybrid={acc_hybrid:.3f}")
