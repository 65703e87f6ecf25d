#!/usr/bin/env python
"""Complete an interrupted ablation rung (VERDICT r3 item 1 ladder).

The first i_shape attempt timed out AFTER both arms finished training
(model_final.npz present) but during the rawIQ arm's evaluation — so this
driver re-runs ONLY the missing standalone evaluations (the reference's
evaluate.py flow, embedded-config path), rebuilds the cross-arm
comparison, and writes head_to_head_summary.json in the same shape
run_head_to_head produces.

Usage: python scripts/complete_ablation_rung.py [tag]   (default i_shape)
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    from vitiq.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from vitiq.eval import ModelComparison
    from vitiq.runner import run_evaluation

    tag = sys.argv[1] if len(sys.argv) > 1 else "i_shape"
    root = pathlib.Path(f"result/proxy19{tag}")
    summary = {}
    for arm in ("vit", "rawiq"):
        exp = root / "ckpt" / f"{arm}_synthetic19{tag}"
        sfile = exp / "summary.json"
        report = exp / "evaluation" / "test_classification_report.txt"
        if not report.exists():
            print(f"{arm}: evaluating {exp} ...", flush=True)
            run_evaluation(str(exp), dataset="test")
        if sfile.exists():
            s = json.loads(sfile.read_text())
        else:
            s = {"experiment_dir": str(exp), "note": "train summary lost to "
                 "the rung timeout; metrics from the standalone evaluation"}
        import pickle

        pkl = exp / "evaluation" / "test_results.pkl"
        res = pickle.loads(pkl.read_bytes()) if pkl.exists() else {}
        s.setdefault("experiment_dir", str(exp))
        if "overall_accuracy" in res:
            s["test_overall_accuracy"] = float(res["overall_accuracy"])
            s["test_snr_accuracies"] = {
                str(k): float(v)
                for k, v in res.get("snr_accuracies", {}).items()}
        summary[arm] = s

    mc = ModelComparison(
        root / "ckpt" / f"vit_synthetic19{tag}" / "evaluation"
        / "test_classification_report.txt",
        root / "ckpt" / f"rawiq_synthetic19{tag}" / "evaluation"
        / "test_classification_report.txt",
        output_dir=str(root / "comparison_results"))
    insights = mc.run_comparison(verbose=True)
    out = {"vit": summary["vit"], "rawiq": summary["rawiq"],
           "comparison_dir": str(root / "comparison_results"),
           "insights": insights}
    (root / "head_to_head_summary.json").write_text(
        json.dumps(out, indent=2, default=float))
    print(f"-> {root / 'head_to_head_summary.json'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
