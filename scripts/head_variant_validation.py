#!/usr/bin/env python
"""Accuracy revalidation for the d_head>=32 serving variants.

The measured round-1 attribution (docs/BENCHMARKS.md) says the serving wall
is the per-head score-tensor work; d_head = d_model/n_head >= 32 shrinks it by
2-4x. This script answers "does changing H=8 -> H=4/H=2 cost accuracy?" on
the synthetic head-to-head harness: identical data, seeds, budget — only
n_head differs.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/head_variant_validation.py \
           [epochs] [frames_per_class] [comma-separated seeds, default 0,1,2]
Runs each variant once per seed (init/data/shuffle seeds varied together)
and writes per-seed + mean/stdev results to head_variant_validation.json.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    frames_per_class = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from vitiq.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
    from vitiq.runner import run_training

    seeds = [int(s) for s in (sys.argv[3].split(",") if len(sys.argv) > 3
                              else ["0", "1", "2"])]
    results = {}
    # Learnable-within-CPU-budget geometry: the d_head question is about the
    # ATTENTION width (d_model/n_head), which a 2-layer stack at the flagship
    # width exercises; high-SNR frames keep the task solvable in ~a dozen
    # epochs (the full 6-layer/all-SNR setup needs the reference's 60-80 GPU
    # epochs and stays at chance here — measured). Multi-seed replicates
    # (init + data seeds varied together) put error bars on the deltas.
    classes = ("BPSK", "QPSK", "8PSK", "16QAM", "64QAM")
    for n_head in (8, 4, 2):
        accs, vlosses = [], []
        for seed in seeds:
            cfg = ExperimentConfig(
                model=ModelConfig(arm="vit", num_classes=len(classes),
                                  d_model=128, n_head=n_head, n_layers=2,
                                  ffn_hidden=512, drop_prob=0.1, patch_size=4,
                                  numerics="reference"),
                data=DataConfig(source="synthetic", synthetic_classes=classes,
                                synthetic_frames_per_class=frames_per_class,
                                synthetic_snr_db=(8.0, 14.0, 20.0),
                                synthetic_seed=seed),
                train=TrainConfig(batch_size=128, num_epochs=epochs,
                                  patience=epochs, init_seed=seed,
                                  dropout_seed=seed + 100,
                                  shuffle_seed=seed + 200),
                experiment_name=f"head_variant_h{n_head}_s{seed}",
            )
            summary = run_training(cfg, verbose=True)
            accs.append(summary.get("test_overall_accuracy"))
            vlosses.append(summary.get("best_val_loss"))
            print(f"n_head={n_head} seed={seed}: "
                  f"test acc {accs[-1]:.4f}", flush=True)
        import statistics

        results[f"h{n_head}"] = {
            "d_head": 128 // n_head,
            "per_seed_accuracy": accs,
            "mean_accuracy": statistics.mean(accs),
            "stdev_accuracy": statistics.stdev(accs) if len(accs) > 1 else 0.0,
            "mean_best_val_loss": statistics.mean(vlosses),
        }

    base = results["h8"]["mean_accuracy"]
    for k, v in results.items():
        v["delta_vs_h8"] = v["mean_accuracy"] - base
    out = pathlib.Path("head_variant_validation.json")
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
