#!/usr/bin/env python
"""PSO sweep at the reference sketch's FULL regime (VERDICT r3 item 5):
18 particles x 25 iterations (hyperparameter_tuning.py:134-145) over the
9-dim space, fitness on the 19-class IMPAIRMENT corpus (ChannelModel,
item 1), architecture-bucketed + compile-memoized so the 468 evaluations
collapse onto a few dozen XLA compiles.

Partial trace persists to the output JSON after every iteration, so a
deadline kill still leaves the artifact.

Usage: python scripts/pso_full_sweep.py [iters] [out_json]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    from vitiq.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import json

    from vitiq.config import TARGET_MODULATIONS_19
    from vitiq.sweep import run_pso_sweep

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    out = sys.argv[2] if len(sys.argv) > 2 else "docs/pso_full_sweep.json"
    # train_steps=400 (round 5): the 30-step budget could not rank
    # architectures (best 9.4% ~ 1.8x random after 122 archs); 400 scanned
    # steps cost ~one dispatch each thanks to the fast_train lax.scan and
    # clear the calibration bar (scripts/pso_calibrate.py: repeat-seed
    # spread << between-architecture spread). The partial trace embeds the
    # full swarm state, so re-running this script RESUMES the trajectory.
    res = run_pso_sweep(
        n_particles=18, iters=iters, seed=0, train_steps=400,
        frames_per_class=512, frame_len=256,
        classes=tuple(TARGET_MODULATIONS_19), channel=True,
        output_path=out, verbose=True, resume_path=out,
    )
    print(json.dumps({k: res[k] for k in
                      ("best_val_accuracy", "best_hparams", "evaluations",
                       "distinct_architectures_compiled", "bucketed")},
                     indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
