"""Out-of-core streaming training: StreamFeed/ArrayFeed parity, epoch
determinism, PackedDataSource.batch_stream coverage, and run_training with
cfg.data.streaming end-to-end over a multi-window HDF5 corpus.

The capability under test replaces the reference's DataLoader worker pool
(ref: ViT/training/train.py:346-366): the production entry point must train
splits that do NOT fit in RAM (real 19-class RadioML train split ~19 GB)."""

import json

import numpy as np
import pytest

from vitiq.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from vitiq.data import HDF5DataSource, PackedDataSource, pack_split_to_npy
from vitiq.data.feeds import ArrayFeed, StreamFeed, as_feed


FRAME_LEN = 64
MODS = ["BPSK", "QPSK", "16QAM"]


@pytest.fixture(scope="module")
def learnable_hdf5(tmp_path_factory):
    """RadioML-shaped HDF5 with class-separable frames (constellation draws
    at 20 dB), big enough to span several 128-row stream windows."""
    import h5py

    from vitiq.data.synthetic import SyntheticAMCDataset

    path = tmp_path_factory.mktemp("streamdata") / "corpus.hdf5"
    ds = SyntheticAMCDataset(classes=tuple(MODS), frames_per_class=220,
                             frame_len=FRAME_LEN, snrs_db=(10.0, 20.0), seed=3)
    n = len(ds)
    Y = np.zeros((n, len(MODS)), np.int64)
    Y[np.arange(n), ds.Y] = 1
    with h5py.File(path, "w") as f:
        f.create_dataset("X", data=ds.X)
        f.create_dataset("Y", data=Y)
        f.create_dataset("Z", data=ds.Z[:, None])
    json_path = path.parent / "classes.json"
    json_path.write_text(json.dumps(MODS))
    return str(path), str(json_path)


def _stream_cfg(path, jpath, tmp_path, **train_overrides):
    return ExperimentConfig(
        model=ModelConfig(arm="rawiq", num_classes=3, d_model=32, n_head=4,
                          n_layers=2, ffn_hidden=64, drop_prob=0.1,
                          seq_length=FRAME_LEN, segment_size=8),
        data=DataConfig(source="hdf5", file_path=path, json_path=jpath,
                        target_modulations=tuple(MODS), streaming=True,
                        stream_window_rows=128, norm_sample_count=200),
        train=TrainConfig(batch_size=32, num_epochs=2, learning_rate=1e-3,
                          **train_overrides),
        experiment_name="stream_e2e",
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )


class TestStreamFeed:
    def _feed(self, path, jpath, window_rows=128):
        import functools

        src = HDF5DataSource(path, jpath)
        cfg = DataConfig(source="hdf5", file_path=path, json_path=jpath,
                         target_modulations=tuple(MODS))
        s = src.split(cfg)
        feed = StreamFeed(
            functools.partial(src.batch_stream, s.train, s.label_map,
                              window_rows=window_rows),
            num_samples=len(s.train), shuffle_seed=7)
        return src, s, feed

    def test_epoch_deterministic_and_epochs_differ(self, learnable_hdf5):
        path, jpath = learnable_hdf5
        _, _, feed = self._feed(path, jpath)
        a = [(x.copy(), y.copy()) for x, y in feed.train_batches(0, 32)]
        b = [(x.copy(), y.copy()) for x, y in feed.train_batches(0, 32)]
        c = [(x.copy(), y.copy()) for x, y in feed.train_batches(1, 32)]
        assert len(a) == len(b) == len(c) > 3  # several windows' worth
        for (xa, ya), (xb, yb) in zip(a, b):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)
        assert any(not np.array_equal(xa, xc) for (xa, _), (xc, _) in zip(a, c))

    def test_eval_batches_cover_every_sample_once(self, learnable_hdf5):
        path, jpath = learnable_hdf5
        src, s, feed = self._feed(path, jpath)
        n_seen = 0
        label_counts = np.zeros(3, int)
        for bx, by, mask in feed.eval_batches(32):
            assert bx.shape == (32, FRAME_LEN, 2)
            valid = int(mask.sum())
            n_seen += valid
            np.testing.assert_array_equal(mask[:valid], 1.0)
            label_counts += np.bincount(by[:valid], minlength=3)
        assert n_seen == len(s.train)
        want = np.bincount(
            [s.label_map[m] for m in src.y_strings[s.train]], minlength=3)
        np.testing.assert_array_equal(label_counts, want)

    def test_stream_eval_matches_inram_eval(self, learnable_hdf5):
        """Same params: evaluate_feed over the stream == evaluate over the
        materialized arrays (order-independent sums)."""
        import jax

        from vitiq.models import init_amc_params, make_forward
        from vitiq.train.loop import evaluate_feed, make_eval_step

        path, jpath = learnable_hdf5
        src, s, feed = self._feed(path, jpath)
        x, y, _ = src.load_split_arrays(s.train, s.label_map)
        mcfg = ModelConfig(arm="rawiq", num_classes=3, d_model=32, n_head=4,
                           n_layers=2, ffn_hidden=64, seq_length=FRAME_LEN,
                           segment_size=8)
        fwd = make_forward(mcfg)
        params = init_amc_params(jax.random.PRNGKey(0), mcfg)
        pre = lambda t: t.transpose(0, 2, 1)  # [B, L, 2] -> [B, 2, L]
        step = make_eval_step(fwd, 0.1, pre)
        streamed = evaluate_feed(step, params, feed, 32)
        inram = evaluate_feed(step, params, ArrayFeed(x, y), 32)
        assert streamed["loss"] == pytest.approx(inram["loss"], rel=1e-5)
        assert streamed["accuracy"] == pytest.approx(inram["accuracy"], abs=1e-9)


class TestPackedStream:
    def test_covers_all_rows_once_and_is_seed_deterministic(self, learnable_hdf5, tmp_path):
        path, jpath = learnable_hdf5
        src = HDF5DataSource(path, jpath)
        cfg = DataConfig(source="hdf5", file_path=path, json_path=jpath,
                         target_modulations=tuple(MODS))
        s = src.split(cfg)
        packed = pack_split_to_npy(src, s.valid, s.label_map,
                                   tmp_path / "packed", shard_rows=37)
        ps = PackedDataSource(packed)
        rows = list(ps.batch_stream(16, shuffle=True, seed=5, drop_last=False))
        ys = np.concatenate([y for _, y, _ in rows])
        assert len(ys) == len(s.valid)
        # same seed -> same stream; different seed -> different order
        rows2 = list(ps.batch_stream(16, shuffle=True, seed=5, drop_last=False))
        for (xa, _, _), (xb, _, _) in zip(rows, rows2):
            np.testing.assert_array_equal(xa, xb)
        rows3 = list(ps.batch_stream(16, shuffle=True, seed=6, drop_last=False))
        assert any(not np.array_equal(a[0], b[0]) for a, b in zip(rows, rows3))
        # label multiset preserved
        want = np.bincount(
            [s.label_map[m] for m in src.y_strings[s.valid]], minlength=3)
        np.testing.assert_array_equal(np.bincount(ys, minlength=3), want)

    def test_drop_last_drops_only_final_partial(self, learnable_hdf5, tmp_path):
        path, jpath = learnable_hdf5
        src = HDF5DataSource(path, jpath)
        cfg = DataConfig(source="hdf5", file_path=path, json_path=jpath,
                         target_modulations=tuple(MODS))
        s = src.split(cfg)
        ps = PackedDataSource(pack_split_to_npy(
            src, s.valid, s.label_map, tmp_path / "p2", shard_rows=37))
        n = len(s.valid)
        batches = list(ps.batch_stream(16, shuffle=False, drop_last=True))
        assert all(len(b[0]) == 16 for b in batches)
        assert len(batches) == n // 16


class TestStreamingRunTraining:
    def test_end_to_end_with_artifacts(self, learnable_hdf5, tmp_path):
        from vitiq.runner import run_training

        path, jpath = learnable_hdf5
        cfg = _stream_cfg(path, jpath, tmp_path, profile_steps=True)
        cfg.train.num_epochs = 4
        summary = run_training(cfg, verbose=False)
        assert summary["epochs_run"] == 4
        assert len(summary["history"]["train_loss"]) == 4
        # streaming trains: loss must move and eval must have run
        assert min(summary["history"]["train_loss"][1:]) < summary["history"]["train_loss"][0]
        assert "test_overall_accuracy" in summary
        # profile_steps=True -> per-epoch p50/p90 recorded
        assert len(summary["history"]["step_p50"]) == 4
        assert summary["step_times"]["steps"] > 0
        exp_dir = tmp_path / "ckpt" / "stream_e2e"
        assert (exp_dir / "model_best.npz").exists()
        assert (exp_dir / "evaluation" / "test_classification_report.txt").exists()

    def test_streaming_run_is_deterministic(self, learnable_hdf5, tmp_path):
        from vitiq.runner import run_training

        path, jpath = learnable_hdf5
        cfg_a = _stream_cfg(path, jpath, tmp_path / "a")
        cfg_b = _stream_cfg(path, jpath, tmp_path / "b")
        sa = run_training(cfg_a, verbose=False, evaluate_test=False)
        sb = run_training(cfg_b, verbose=False, evaluate_test=False)
        np.testing.assert_allclose(sa["history"]["train_loss"],
                                   sb["history"]["train_loss"], rtol=1e-6)
        np.testing.assert_allclose(sa["history"]["val_loss"],
                                   sb["history"]["val_loss"], rtol=1e-6)


def test_as_feed_tuple_roundtrip():
    x = np.zeros((10, 4, 2), np.float32)
    y = np.arange(10, dtype=np.int32)
    feed = as_feed((x, y), shuffle_seed=3)
    assert isinstance(feed, ArrayFeed)
    assert feed.num_samples == 10
    assert as_feed(feed) is feed
    batches = list(feed.train_batches(0, 4))
    assert len(batches) == 2  # drop-last
    again = list(feed.train_batches(0, 4))
    for (xa, ya), (xb, yb) in zip(batches, again):
        np.testing.assert_array_equal(ya, yb)
