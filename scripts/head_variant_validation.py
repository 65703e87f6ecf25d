#!/usr/bin/env python
"""Accuracy gate for the d_head>=32 serving variants (H8 vs H4 vs H2).

The measured round-1 attribution (docs/BENCHMARKS.md) says the serving wall
is the per-head score-tensor work; d_head = d_model/n_head >= 32 shrinks it
2-4x. This script answers "does H=8 -> H=4/H=2 cost accuracy?" with enough
statistical power to mean something (the round-2 judge flagged the 3-seed
2-layer gate as underpowered):

  * FULL-DEPTH flagship geometry (d128 / 6 layers / reference regime)
  * the 19-class synthetic proxy corpus (full constellation set incl.
    ASK/APSK/cross-QAM + GMSK/OQPSK; vitiq/data/synthetic.py)
  * >= 10 seeds, init/data/shuffle varied together
  * PAIRED per-seed deltas vs H8 + t statistics in the output JSON

Usage:
  python scripts/head_variant_validation.py [epochs] [frames_per_class] \
      [comma-separated seeds] [numerics]
Defaults: 30 epochs, 512 frames/class, seeds 0..9, numerics=tpu when the
backend is TPU (fused train kernels — gating the PRODUCTION path) else
reference. Writes head_variant_validation.json.
"""
import json
import pathlib
import statistics
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    from vitiq.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from vitiq.config import (TARGET_MODULATIONS_19, DataConfig,
                              ExperimentConfig, ModelConfig, TrainConfig)
    from vitiq.runner import run_training

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    frames_per_class = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    seeds = [int(s) for s in (sys.argv[3].split(",") if len(sys.argv) > 3
                              else [str(i) for i in range(10)])]
    numerics = (sys.argv[4] if len(sys.argv) > 4
                else ("tpu" if jax.default_backend() == "tpu" else "reference"))

    classes = TARGET_MODULATIONS_19
    # WEDGE RESILIENCE: every completed run appends one line to the JSONL
    # ledger, and a restart skips runs already recorded — a hung remote
    # compile (observed: one 25-min stall) costs one retry, not the batch.
    ledger = pathlib.Path("head_variant_runs.jsonl")
    # Resume key includes the training regime so a rerun with different
    # epochs/frames does not silently reuse results from an incompatible
    # configuration. Records predating the regime fields (the 10-seed
    # round-3 campaign, run at the 30/512 defaults) carry those defaults.
    done = {}
    if ledger.exists():
        for line in ledger.read_text().splitlines():
            rec = json.loads(line)
            done[(rec["n_head"], rec["seed"], rec.get("epochs", 30),
                  rec.get("frames_per_class", 512))] = rec

    results = {}
    for n_head in (8, 4, 2):
        accs, vlosses = [], []
        for seed in seeds:
            rec = done.get((n_head, seed, epochs, frames_per_class))
            if rec is None:
                cfg = ExperimentConfig(
                    model=ModelConfig(arm="vit", num_classes=len(classes),
                                      d_model=128, n_head=n_head, n_layers=6,
                                      ffn_hidden=512, drop_prob=0.1, patch_size=4,
                                      numerics=numerics),
                    data=DataConfig(source="synthetic", synthetic_classes=classes,
                                    synthetic_frames_per_class=frames_per_class,
                                    synthetic_snr_db=(0.0, 4.0, 8.0, 12.0, 16.0, 20.0),
                                    synthetic_seed=seed),
                    train=TrainConfig(batch_size=256, num_epochs=epochs,
                                      patience=epochs, init_seed=seed,
                                      dropout_seed=seed + 100,
                                      shuffle_seed=seed + 200),
                    experiment_name=f"head_variant_h{n_head}_s{seed}",
                    checkpoint_dir="/tmp/head_variant/ckpt",
                    log_dir="/tmp/head_variant/logs",
                )
                summary = run_training(cfg, verbose=False)
                rec = {"n_head": n_head, "seed": seed, "epochs": epochs,
                       "frames_per_class": frames_per_class,
                       "test_overall_accuracy": summary["test_overall_accuracy"],
                       "best_val_loss": summary["best_val_loss"],
                       "epochs_run": summary["epochs_run"]}
                with ledger.open("a") as f:
                    f.write(json.dumps(rec) + "\n")
            accs.append(rec["test_overall_accuracy"])
            vlosses.append(rec["best_val_loss"])
            print(f"n_head={n_head} seed={seed}: test acc {accs[-1]:.4f}",
                  flush=True)

        results[f"h{n_head}"] = {
            "d_head": 128 // n_head,
            "per_seed_accuracy": accs,
            "mean_accuracy": statistics.mean(accs),
            "stdev_accuracy": statistics.stdev(accs) if len(accs) > 1 else 0.0,
            "mean_best_val_loss": statistics.mean(vlosses),
        }

    base = results["h8"]["per_seed_accuracy"]
    for k, v in results.items():
        deltas = [a - b for a, b in zip(v["per_seed_accuracy"], base)]
        v["delta_vs_h8"] = statistics.mean(deltas)
        if len(deltas) > 1 and k != "h8":
            sd = statistics.stdev(deltas)
            v["paired_stdev"] = sd
            v["paired_t"] = (statistics.mean(deltas)
                             / (sd / len(deltas) ** 0.5) if sd > 0 else 0.0)

    meta = {
        "regime": {"epochs": epochs, "frames_per_class": frames_per_class,
                   "seeds": seeds, "numerics": numerics,
                   "classes": len(classes), "n_layers": 6,
                   "backend": __import__("jax").default_backend()},
        **results,
    }
    out = pathlib.Path("head_variant_validation.json")
    out.write_text(json.dumps(meta, indent=2))
    print(json.dumps(meta, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
