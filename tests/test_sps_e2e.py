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
