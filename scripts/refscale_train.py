#!/usr/bin/env python
"""Reference-scale streaming training (VERDICT r3 item 2).

Trains the ViT flagship / rawiq_best architecture on the 2.1M-frame packed
impairment corpus (scripts/gen_refscale_corpus.py) through the out-of-core
feed path at the REFERENCE regime: its batch size, AdamW, plateau LR, early
stopping, per-epoch checkpoint cadence, resume (ref:
ViT/training/train.py:405-424, 450-560).

RELAY CONSTRAINT (measured, scripts/tpu_rss_probe.py): the axon relay pins
~1x the bytes of every host->device transfer for process lifetime, so a
60-epoch run over a ~12 GB train split cannot live in one process. This
driver therefore runs `epochs_per_proc` epochs per invocation and exits;
the outer loop (scripts/refscale_train_loop.sh) restarts it until early
stop — every restart EXERCISES checkpoint resume at scale, and batches are
cast bf16 host-side to halve the pinned bytes (the model computes in bf16
under the tpu numerics policy anyway).

Usage: python scripts/refscale_train.py {vit,rawiq_best} [corpus_dir]
           [epochs_per_proc] [total_epochs]
State under result/refscale_{arm}/: ckpt_latest.npz/.json (resume point),
DONE marker when converged, report.json + evaluation artifacts at the end.
"""
import json
import pathlib
import resource
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    from vitiq.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax
    import ml_dtypes

    from vitiq.config import ExperimentConfig
    from vitiq.data.feeds import StreamFeed
    from vitiq.data.hdf5 import PackedDataSource
    from vitiq.models import init_amc_params
    from vitiq.runner import build_forward_and_preprocess
    from vitiq.train.checkpoint import load_checkpoint, save_checkpoint, save_params
    from vitiq.train.loop import fit
    from vitiq.train.optim import create_train_state

    arm = sys.argv[1] if len(sys.argv) > 1 else "rawiq_best"
    corpus = pathlib.Path(sys.argv[2] if len(sys.argv) > 2
                          else "result/refscale_corpus")
    epochs_per_proc = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    total_epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 60

    out = pathlib.Path(f"result/refscale_{arm}")
    out.mkdir(parents=True, exist_ok=True)
    done = out / "DONE"
    if done.exists():
        print("already DONE")
        return 0

    meta = json.loads((corpus / "stats.json").read_text())
    stats, classes = meta["stats"], meta["classes"]

    preset = {"vit": ExperimentConfig.vit_reference,
              "rawiq_best": ExperimentConfig.rawiq_best}[arm]
    cfg = preset(**{"model.numerics": "tpu"})
    cfg.experiment_name = f"refscale_{arm}"
    cfg.train.num_epochs = total_epochs
    # dispatch-FIFO drain cadence: bounds in-flight host batches (CLAUDE.md)
    cfg.train.dispatch_sync_steps = max(cfg.train.dispatch_sync_steps or 0, 64)
    # device-scan superbatching (round 4): K steps per device call — the
    # per-batch dispatch path measured 678 s/epoch through the relay
    # (11,484 dispatches x ~55 ms) vs 93 s for the same compute scanned
    cfg.train.device_scan_steps = 128

    forward, preprocess = build_forward_and_preprocess(cfg, stats)
    params = init_amc_params(jax.random.PRNGKey(0), cfg.model)

    src_tr = PackedDataSource(corpus / "train")
    src_va = PackedDataSource(corpus / "valid")

    def feed_of(src):
        def make_iter(batch_size, shuffle, seed, drop_last):
            for x, y, z in src.batch_stream(batch_size, shuffle=shuffle,
                                            seed=seed, drop_last=drop_last):
                # bf16 host cast: halves relay-pinned bytes + H2D traffic;
                # the tpu numerics policy computes in bf16 regardless
                yield x.astype(ml_dtypes.bfloat16), y.astype(np.int32), z
        return StreamFeed(make_iter, src.num_rows,
                          shuffle_seed=cfg.train.shuffle_seed, source=src)

    # ingestion-vs-train-rate proof (once, first process): drain one epoch
    # of host batches with no device work
    rate_file = out / "ingest_rate.json"
    if not rate_file.exists():
        t0 = time.perf_counter()
        n = 0
        for bx, _ in feed_of(src_tr).train_batches(0, cfg.train.batch_size):
            n += len(bx)
        feed_fps = n / (time.perf_counter() - t0)
        rate_file.write_text(json.dumps({"feed_frames_per_s": feed_fps}))
        print(f"host ingestion rate: {feed_fps:,.0f} frames/s", flush=True)

    # resume
    ckpt = out / "ckpt_latest"
    resume_state = resume_history = None
    start_epoch = 0
    if ckpt.with_suffix(".npz").exists():
        template = create_train_state(params, cfg.train)
        try:
            resume_state, manifest = load_checkpoint(ckpt, template)
            resume_history = manifest["history"]
            start_epoch = manifest["epoch"] + 1
            print(f"resumed from epoch {manifest['epoch']} "
                  f"(val_loss {manifest['val_loss']:.4f})", flush=True)
        except Exception as e:  # corrupt checkpoint: start fresh (ref rescue)
            print(f"resume failed ({e}); starting fresh", flush=True)

    # cap this process's epochs (fit re-derives plateau/early-stop state
    # from the resumed history, so the cap only bounds THIS process)
    cfg.train.num_epochs = min(total_epochs, start_epoch + epochs_per_proc)

    def on_epoch(epoch, state, history):
        save_checkpoint(ckpt, state, epoch, history["val_loss"][-1], history,
                        config=cfg)

    t0 = time.perf_counter()
    res = fit(cfg, forward, params, feed_of(src_tr), feed_of(src_va),
              preprocess_fn=preprocess, epoch_callback=on_epoch,
              resume_state=resume_state, resume_history=resume_history,
              start_epoch=start_epoch, verbose=True)
    wall = time.perf_counter() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024
    ep = res.epochs_run
    frames = ep * src_tr.num_rows
    print(f"proc ran {ep} epochs in {wall:.0f}s "
          f"({frames / max(wall, 1e-9):,.0f} train frames/s incl eval), "
          f"peak RSS {rss:.1f} GB", flush=True)

    finished = res.stopped_early or (start_epoch + ep) >= total_epochs
    if not finished:
        return 0

    # converged: params snapshot + full test evaluation artifacts
    best = res.best_params if res.best_tracked else res.state.params
    best = jax.device_get(best)
    save_params(out / "model_best", best)
    from vitiq.eval.evaluate import evaluate_feed_with_confusion

    src_te = PackedDataSource(corpus / "test")
    results = evaluate_feed_with_confusion(
        forward, best, feed_of(src_te), classes, out / "evaluation",
        prefix="test", batch_size=cfg.train.batch_size,
        preprocess_fn=preprocess)
    hist = res.history
    report = {
        "arm": arm,
        "epochs": start_epoch + ep,
        "stopped_early": bool(res.stopped_early),
        "train_frames_total": (start_epoch + ep) * src_tr.num_rows,
        "best_val_loss": float(np.min(hist["val_loss"])),
        "final_lr": hist["lr"][-1],
        "test_overall_accuracy": results["overall_accuracy"],
        "test_snr_accuracies": results["snr_accuracies"],
        "epoch_time_p50_s": float(np.median(hist["epoch_time"])),
        "peak_rss_gb_last_proc": rss,
        "ingest_feed_fps": json.loads(rate_file.read_text())["feed_frames_per_s"],
    }
    (out / "report.json").write_text(json.dumps(report, indent=2, default=float))
    done.write_text("converged\n")
    print(json.dumps(report, indent=2, default=float), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
