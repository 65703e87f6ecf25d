#!/usr/bin/env python
"""PSO fitness calibration (VERDICT r4 item 3): does the fast-train budget
DISCRIMINATE architectures, i.e. is repeat-seed fitness spread smaller than
between-architecture spread at the top of the ladder?

Evaluates a ladder of known-quality architectures (the reference's own
published family: d256/L9 best, d128/L6 production, plus deliberately weak
rungs) at `train_steps` x `n_seeds` through the EXACT sweep fitness
(vitiq.sweep.make_amc_fitness on the 19-class impairment corpus), and
reports within-architecture vs between-architecture standard deviation plus
the ladder ordering. Gate: mean within-arch std < std of arch means AND the
known-good rungs rank above the weak rungs.

Usage: python scripts/pso_calibrate.py [train_steps] [n_seeds] [out_json]
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

LADDER = [
    # the reference's best-checkpoint family (exp_L9_H8_F1024_W1e-3)
    {"arm": "rawiq", "segment_size": 16, "d_model": 256, "n_head": 8,
     "n_layers": 9, "ffn_hidden": 1024, "drop_prob": 0.1,
     "learning_rate": 1e-4, "batch_size": 128},
    # the production flagship family (d128/L6)
    {"arm": "rawiq", "segment_size": 16, "d_model": 128, "n_head": 8,
     "n_layers": 6, "ffn_hidden": 1024, "drop_prob": 0.2,
     "learning_rate": 1e-4, "batch_size": 128},
    # ViT arm flagship
    {"arm": "vit", "patch_size": 4, "d_model": 128, "n_head": 8,
     "n_layers": 6, "ffn_hidden": 512, "drop_prob": 0.1,
     "learning_rate": 1e-4, "batch_size": 128},
    # deliberately weak: tiny capacity
    {"arm": "rawiq", "segment_size": 16, "d_model": 32, "n_head": 2,
     "n_layers": 1, "ffn_hidden": 64, "drop_prob": 0.0,
     "learning_rate": 1e-4, "batch_size": 128},
    # deliberately broken regime: huge LR + heavy dropout
    {"arm": "rawiq", "segment_size": 16, "d_model": 128, "n_head": 8,
     "n_layers": 6, "ffn_hidden": 1024, "drop_prob": 0.4,
     "learning_rate": 5e-3, "batch_size": 128},
]


def main() -> int:
    from vitiq.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import numpy as np

    from vitiq.config import TARGET_MODULATIONS_19
    from vitiq.data import ChannelModel, SyntheticAMCDataset
    from vitiq.sweep import make_amc_fitness

    train_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else "docs/pso_fitness_calibration.json"

    # the sweep's exact corpus regime (scripts/pso_full_sweep.py)
    ds = SyntheticAMCDataset(classes=tuple(TARGET_MODULATIONS_19),
                             frames_per_class=512, frame_len=256, seed=0,
                             channel=ChannelModel())
    n = len(ds)
    split = int(0.85 * n)
    fitness = make_amc_fitness((ds.X[:split], ds.Y[:split]),
                               (ds.X[split:], ds.Y[split:]),
                               len(ds.classes), 256,
                               train_steps=train_steps, seed=0, bucket=True)

    rows = []
    for ai, hp in enumerate(LADDER):
        accs = []
        for s in range(n_seeds):
            t0 = time.perf_counter()
            acc = fitness.eval_hp(hp, eval_seed=s)
            dt = time.perf_counter() - t0
            accs.append(acc)
            print(f"arch {ai} seed {s}: val_acc={acc:.4f} ({dt:.1f}s)",
                  flush=True)
        rows.append({"hparams": hp, "accs": accs,
                     "mean": float(np.mean(accs)),
                     "std": float(np.std(accs, ddof=1) if n_seeds > 1 else 0)})

    means = np.array([r["mean"] for r in rows])
    within = float(np.mean([r["std"] for r in rows]))
    between = float(np.std(means, ddof=1))
    # ordering: both known-good rungs (0, 1) must beat both weak rungs (3, 4)
    ordering_ok = bool(min(means[0], means[1]) > max(means[3], means[4]))
    report = {
        "train_steps": train_steps,
        "n_seeds": n_seeds,
        "ladder": rows,
        "within_arch_std_mean": within,
        "between_arch_std": between,
        "discriminates": bool(between > within) and ordering_ok,
        "ordering_ok": ordering_ok,
        "random_baseline": 1.0 / 19,
    }
    pathlib.Path(out_path).write_text(json.dumps(report, indent=2,
                                                 default=float))
    print(json.dumps({k: report[k] for k in
                      ("within_arch_std_mean", "between_arch_std",
                       "discriminates", "ordering_ok")}, indent=2))
    print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
