"""Data-layer tests: split determinism with the reference's exact seeds,
torch-compatible normalization stats, HDF5 source round-trips, packed shards,
and the prefetch pipeline."""

import json

import numpy as np
import pytest

from vitiq.config import DataConfig
from vitiq.data import (
    HDF5DataSource,
    PackedDataSource,
    Prefetcher,
    SyntheticAMCDataset,
    compute_normalization_stats,
    pack_split_to_npy,
    split_labels,
    stats_from_array,
)


@pytest.fixture(scope="module")
def small_hdf5(tmp_path_factory):
    """RadioML-shaped HDF5: 3 mods x 2 SNRs x 40 frames of length 64."""
    import h5py

    path = tmp_path_factory.mktemp("data") / "small.hdf5"
    mods = ["BPSK", "QPSK", "16QAM"]
    rng = np.random.default_rng(0)
    n_per = 40
    snrs = [-8.0, 8.0]
    rows = len(mods) * len(snrs) * n_per
    X = rng.standard_normal((rows, 64, 2)).astype(np.float32)
    Y = np.zeros((rows, len(mods)), np.int64)
    Z = np.zeros((rows, 1), np.float32)
    r = 0
    for mi in range(len(mods)):
        for snr in snrs:
            for _ in range(n_per):
                Y[r, mi] = 1
                Z[r, 0] = snr
                r += 1
    with h5py.File(path, "w") as f:
        f.create_dataset("X", data=X)
        f.create_dataset("Y", data=Y)
        f.create_dataset("Z", data=Z)
    json_path = path.parent / "classes.json"
    json_path.write_text(json.dumps(mods))
    return str(path), str(json_path), X


class TestSplit:
    def test_deterministic_and_disjoint(self, small_hdf5):
        path, jpath, _ = small_hdf5
        src = HDF5DataSource(path, jpath)
        cfg = DataConfig(source="hdf5", file_path=path, json_path=jpath,
                         target_modulations=("BPSK", "QPSK", "16QAM"))
        s1, s2 = src.split(cfg), src.split(cfg)
        np.testing.assert_array_equal(s1.train, s2.train)
        np.testing.assert_array_equal(s1.valid, s2.valid)
        np.testing.assert_array_equal(s1.test, s2.test)
        all_idx = np.concatenate([s1.train, s1.valid, s1.test])
        assert len(np.unique(all_idx)) == len(all_idx) == 240
        assert s1.label_map == {"BPSK": 0, "QPSK": 1, "16QAM": 2}

    def test_ratios_and_stratification(self, small_hdf5):
        path, jpath, _ = small_hdf5
        src = HDF5DataSource(path, jpath)
        cfg = DataConfig(source="hdf5", file_path=path, json_path=jpath,
                         target_modulations=("BPSK", "QPSK", "16QAM"))
        s = src.split(cfg)
        assert len(s.train) == pytest.approx(0.7 * 240, abs=6)
        assert len(s.test) == pytest.approx(0.15 * 240, abs=6)
        # each (mod, snr) stratum contributes to every split
        for idx_set in (s.train, s.valid, s.test):
            labels = src.y_strings[idx_set]
            snrs = src.z[idx_set]
            for mod in ("BPSK", "QPSK", "16QAM"):
                for snr in (-8.0, 8.0):
                    assert np.sum((labels == mod) & (snrs == snr)) > 0

    def test_seed_changes_split(self, small_hdf5):
        path, jpath, _ = small_hdf5
        src = HDF5DataSource(path, jpath)
        y, z = src.y_strings, src.z
        mods = ("BPSK", "QPSK", "16QAM")
        a = split_labels(y, z, mods, 0.7, 0.15, 0.15, seed=42)
        b = split_labels(y, z, mods, 0.7, 0.15, 0.15, seed=43)
        assert not np.array_equal(a.train, b.train)

    def test_target_mod_subset(self, small_hdf5):
        path, jpath, _ = small_hdf5
        src = HDF5DataSource(path, jpath)
        s = split_labels(src.y_strings, src.z, ("QPSK",), 0.7, 0.15, 0.15, 42)
        assert len(s.train) + len(s.valid) + len(s.test) == 80
        assert set(src.y_strings[s.train]) == {"QPSK"}

    def test_bad_ratios_raise(self, small_hdf5):
        path, jpath, _ = small_hdf5
        src = HDF5DataSource(path, jpath)
        with pytest.raises(ValueError):
            split_labels(src.y_strings, src.z, ("BPSK",), 0.7, 0.2, 0.2, 42)


class TestNormalizationStats:
    def test_matches_torch_unbiased_std(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        x = (rng.standard_normal((200, 32, 2)) * 2.5 + 0.3).astype(np.float32)
        idx = np.arange(200)
        stats = stats_from_array(x, idx, seed=49, num_samples=150)
        # replicate with torch like the reference does (dataset.py:137-151)
        np.random.seed(49)
        sample = np.sort(np.random.choice(idx, 150, replace=False))
        t = torch.from_numpy(x[sample]).float()
        assert stats["i_mean"] == pytest.approx(float(t[:, :, 0].mean()), abs=1e-6)
        assert stats["i_std"] == pytest.approx(float(t[:, :, 0].flatten().std()), abs=1e-6)
        assert stats["q_std"] == pytest.approx(float(t[:, :, 1].flatten().std()), abs=1e-6)

    def test_deterministic_given_seed(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((100, 16, 2)).astype(np.float32)
        a = stats_from_array(x, np.arange(100), seed=49, num_samples=60)
        b = stats_from_array(x, np.arange(100), seed=49, num_samples=60)
        assert a == b
        c = stats_from_array(x, np.arange(100), seed=50, num_samples=60)
        assert a != c

    def test_std_clamped(self):
        x = np.zeros((50, 8, 2), np.float32)
        s = compute_normalization_stats(lambda r: x[r], np.arange(50))
        assert s["i_std"] == 1e-8 and s["q_std"] == 1e-8


class TestHDF5Source:
    def test_read_rows_any_order(self, small_hdf5):
        path, jpath, X = small_hdf5
        src = HDF5DataSource(path, jpath)
        rows = np.array([5, 3, 100, 3 + 0, 77])[::-1][:4]  # unsorted, no dups
        got = src.read_rows(rows)
        np.testing.assert_array_equal(got, X[rows])

    def test_load_split_arrays(self, small_hdf5):
        path, jpath, X = small_hdf5
        src = HDF5DataSource(path, jpath)
        cfg = DataConfig(source="hdf5", file_path=path, json_path=jpath,
                         target_modulations=("BPSK", "QPSK", "16QAM"))
        s = src.split(cfg)
        x, y, z = src.load_split_arrays(s.test, s.label_map, chunk_size=16)
        assert x.shape == (len(s.test), 64, 2)
        assert set(np.unique(y)) <= {0, 1, 2}
        assert set(np.unique(z)) == {-8.0, 8.0}

    def test_batch_stream_epoch(self, small_hdf5):
        path, jpath, _ = small_hdf5
        src = HDF5DataSource(path, jpath)
        cfg = DataConfig(source="hdf5", file_path=path, json_path=jpath,
                         target_modulations=("BPSK", "QPSK", "16QAM"))
        s = src.split(cfg)
        batches = list(src.batch_stream(s.train, s.label_map, batch_size=32,
                                        seed=3, window_rows=64))
        assert all(b[0].shape == (32, 64, 2) for b in batches)
        assert len(batches) == len(s.train) // 32 - (1 if len(s.train) % 64 < 32 and len(s.train) % 64 else 0) or len(batches) > 0
        # determinism given seed
        again = list(src.batch_stream(s.train, s.label_map, batch_size=32,
                                      seed=3, window_rows=64))
        np.testing.assert_array_equal(batches[0][0], again[0][0])

    def test_packed_roundtrip(self, small_hdf5, tmp_path):
        path, jpath, X = small_hdf5
        src = HDF5DataSource(path, jpath)
        cfg = DataConfig(source="hdf5", file_path=path, json_path=jpath,
                         target_modulations=("BPSK", "QPSK", "16QAM"))
        s = src.split(cfg)
        out = pack_split_to_npy(src, s.test, s.label_map, tmp_path / "packed",
                                shard_rows=16)
        packed = PackedDataSource(out)
        assert packed.num_rows == len(s.test)
        rows = np.array([0, 17, 5, 33])
        idx_sorted = np.sort(s.test)
        np.testing.assert_array_equal(packed.read_rows(rows), X[idx_sorted[rows]])


class TestPrefetcher:
    def test_order_and_completeness(self):
        items = list(range(57))
        out = list(Prefetcher(iter(items), prefetch_depth=4))
        assert out == items

    def test_transform_applied(self):
        out = list(Prefetcher(iter([1, 2, 3]), transform=lambda x: x * 10))
        assert out == [10, 20, 30]

    def test_worker_error_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("boom")

        it = iter(Prefetcher(gen()))
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="boom"):
            list(it)


class TestNativeGather:
    def test_parity_with_numpy_and_fallback(self, tmp_path):
        """The C gather must produce byte-identical reads; with
        VITIQ_NO_NATIVE=1 the numpy fallback serves the same bytes."""
        import os

        from vitiq.data import native

        rng = np.random.default_rng(0)
        src = rng.standard_normal((256, 16, 2)).astype(np.float32)
        rows = rng.permutation(256)[:64]
        want = src[rows]
        dst = np.zeros_like(want)
        if native.available():
            assert native.gather_rows(dst, src, rows)
            np.testing.assert_array_equal(dst, want)
            dst2 = np.zeros((256, 16, 2), np.float32)
            assert native.gather_scatter_rows(dst2, rows, src, rows)
            np.testing.assert_array_equal(dst2[rows], want)
        # layout guard: non-contiguous source must refuse (not corrupt)
        assert not native.gather_rows(dst, src[:, ::2], rows[:4])

    def test_packed_read_rows_native_matches_numpy(self, small_hdf5, tmp_path, monkeypatch):
        path, jpath, X = small_hdf5
        src = HDF5DataSource(path, jpath)
        idx = np.arange(120)
        packed = pack_split_to_npy(src, idx, {"BPSK": 0, "QPSK": 1, "16QAM": 2},
                                   tmp_path / "natpack", shard_rows=37)
        ps = PackedDataSource(packed)
        rows = np.random.default_rng(3).permutation(120)[:50]
        got = ps.read_rows(rows)
        monkeypatch.setenv("VITIQ_NO_NATIVE", "1")
        import importlib

        from vitiq.data import native
        native._tried = False
        native._lib = None
        try:
            want = ps.read_rows(rows)
        finally:
            native._tried = False
            native._lib = None
        np.testing.assert_array_equal(got, want)
