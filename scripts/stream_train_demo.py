#!/usr/bin/env python
"""Out-of-core training proof (VERDICT r2 item 1 'Done' criterion).

Writes a synthetic HDF5 corpus SHARD-WISE (never holding it in RAM), then
trains through the streaming path (cfg.data.streaming=True: windowed
sequential reads -> StreamFeed -> device_prefetch) and reports:

  * peak RSS — must stay FAR below the corpus size (bounded by the stream
    window + prefetch queue), proving run_training no longer materializes
    splits (the round-2 gap: the real 19-class RadioML train split is
    ~19 GB and the entry point loaded whole splits into RAM);

    RELAY CAVEAT (measured, scripts/tpu_rss_probe.py): the axon remote-relay
    client pins ~1x the bytes of EVERY host->device transfer for process
    lifetime — keep/drop/fold/dput probe modes all leak ~2.3 MB per 2.1 MB
    batch while reuse (no transfer) and host (no JAX) stay flat. That is an
    environment artifact of the relay, not the feed path: on a direct PJRT
    backend the same code is bounded (the CPU run of this demo is the
    proof). On the relay backend we therefore subtract the unavoidable
    pinned-transfer estimate (epochs x (train+val) bytes) before applying
    the bound, and report both raw and net RSS.
  * throughput: train_frames_per_s derives from EPOCH WALL TIME (honest on
    every backend); step_p50/p90 are also reported but are a host-dispatch
    metric on remote-relay TPU backends (per-call sync under-reports there
    — CLAUDE.md timing rule), so the pipeline-stall judgement uses the
    wall-clock rate vs the known compute-only step rate.

Usage: python scripts/stream_train_demo.py [gb] [epochs]
Default 8 GB corpus (1M frames of 1024x2 f32), 1 epoch. CPU-safe:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/stream_train_demo.py 2
"""
import json
import pathlib
import resource
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024


def main() -> int:
    import h5py

    from vitiq.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
    from vitiq.data.synthetic import generate_frames

    gb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    frame_len = 1024
    frame_bytes = frame_len * 2 * 4
    n = int(gb * 1e9 / frame_bytes)
    mods = ["BPSK", "QPSK", "16QAM", "64QAM"]
    tmp = tempfile.mkdtemp(prefix="vitiq_stream_demo_")
    path = f"{tmp}/corpus.hdf5"
    print(f"writing {n:,} frames ({gb:.1f} GB) shard-wise to {path} ...",
          flush=True)

    rng = np.random.default_rng(0)
    chunk = 16384
    t0 = time.perf_counter()
    with h5py.File(path, "w") as f:
        X = f.create_dataset("X", shape=(n, frame_len, 2), dtype=np.float32)
        Y = f.create_dataset("Y", shape=(n, len(mods)), dtype=np.int64)
        Z = f.create_dataset("Z", shape=(n, 1), dtype=np.float32)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            labels = rng.integers(0, len(mods), e - s)
            # ONE SNR draw per frame: the same values scale the noise AND
            # land in Z, so per-SNR evaluation bins are truthful
            snr_all = rng.choice([0.0, 10.0, 20.0], e - s)
            x = np.empty((e - s, frame_len, 2), np.float32)
            for li, mod in enumerate(mods):
                m = labels == li
                if not m.any():
                    continue
                sig = generate_frames(mod, int(m.sum()), frame_len, rng)
                ns = np.sqrt(10.0 ** (-snr_all[m] / 10.0) / 2.0)[:, None]
                sig = sig + ns * (rng.standard_normal(sig.shape)
                                  + 1j * rng.standard_normal(sig.shape))
                x[m, :, 0] = sig.real.astype(np.float32)
                x[m, :, 1] = sig.imag.astype(np.float32)
            X[s:e] = x
            Y[s:e] = np.eye(len(mods), dtype=np.int64)[labels]
            Z[s:e] = snr_all[:, None]
    pathlib.Path(f"{tmp}/classes.json").write_text(json.dumps(mods))
    write_rss = peak_rss_gb()
    print(f"write done in {time.perf_counter() - t0:.0f}s "
          f"(peak RSS {write_rss:.2f} GB)", flush=True)

    cfg = ExperimentConfig(
        model=ModelConfig(arm="rawiq", num_classes=len(mods), d_model=128,
                          n_head=8, n_layers=6, ffn_hidden=1024,
                          drop_prob=0.2, seq_length=frame_len,
                          segment_size=16,
                          numerics="tpu" if _on_tpu() else "reference"),
        data=DataConfig(source="hdf5", file_path=path,
                        json_path=f"{tmp}/classes.json",
                        target_modulations=tuple(mods),
                        streaming=True, stream_window_rows=16384),
        train=TrainConfig(batch_size=256, num_epochs=epochs,
                          patience=epochs, profile_steps=True),
        experiment_name="stream_demo",
        checkpoint_dir=f"{tmp}/ckpt", log_dir=f"{tmp}/logs",
    )
    from vitiq.runner import run_training

    t0 = time.perf_counter()
    summary = run_training(cfg, evaluate_test=False, verbose=True)
    train_wall = time.perf_counter() - t0
    rss = peak_rss_gb()

    # On the remote-relay TPU backend every host->device transfer's bytes
    # stay pinned in the relay client for process lifetime (measured:
    # scripts/tpu_rss_probe.py — transfer modes leak ~= transferred bytes,
    # reuse/host modes are flat). Subtract that unavoidable, environment-
    # imposed floor before judging the FEED PATH's boundedness; on direct
    # backends (CPU) the floor is zero and raw RSS is judged.
    on_relay = _on_tpu()
    streamed_frac = cfg.data.train_size + cfg.data.valid_size
    relay_pinned = epochs * streamed_frac * gb if on_relay else 0.0
    net_rss = rss - relay_pinned
    report = {
        "corpus_gb": gb,
        "frames": n,
        "epochs": epochs,
        "peak_rss_gb": rss,
        "rss_over_corpus": rss / gb,
        "relay_pinned_transfer_gb_est": relay_pinned,
        "net_rss_gb": net_rss,
        "train_wall_s": train_wall,
        "step_p50_ms": summary["history"]["step_p50"][-1] * 1e3,
        "step_p90_ms": summary["history"]["step_p90"][-1] * 1e3,
        "train_frames_per_s": n * cfg.data.train_size / (
            sum(summary["history"]["epoch_time"]) / epochs),
        "bounded": net_rss < max(4.0, 0.35 * gb),
    }
    print(json.dumps(report, indent=2), flush=True)
    if gb >= 1.0:  # don't clobber the headline artifact with smoke runs
        out = pathlib.Path("docs/STREAM_TRAIN_DEMO.json")
        out.parent.mkdir(exist_ok=True)
        out.write_text(json.dumps(report, indent=2))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    assert report["bounded"], (
        f"net RSS {net_rss:.1f} GB (raw {rss:.1f}, relay-pinned floor "
        f"{relay_pinned:.1f}) not bounded vs corpus {gb:.1f} GB")
    print("OUT-OF-CORE TRAINING: RSS BOUNDED ✓")
    return 0


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


if __name__ == "__main__":
    from vitiq.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    sys.exit(main())
