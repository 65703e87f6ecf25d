#!/usr/bin/env python
"""Driver-facing benchmark: prints ONE JSON line.

Metric: classified IQ frames/sec/chip on the flagship fused path — z-score
normalization + [1,32,64] reshape + patchify + ViT-d128/L6 encoder + head in a
single jit program, bf16 'tpu' numerics, raw frames resident in HBM.

vs_baseline is relative to the 1M frames/s/chip target from BASELINE.json
(the reference publishes no inference throughput; its only number is ~2,330
frames/s TRAIN on an unspecified CUDA GPU, README.md:458-473).
"""

import json
import sys


def main() -> int:
    from vitiq.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from vitiq.bench import TARGET_FPS, bench_fused_infer

    try:
        res = bench_fused_infer("vit")
    except Exception as e:  # transient "TPU backend error (Internal)" observed
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); retrying",
              file=sys.stderr)
        res = bench_fused_infer("vit")
    line = {
        "metric": "iq_frames_per_sec_per_chip",
        "value": res["value"],
        "unit": "frames/s",
        "vs_baseline": res["value"] / TARGET_FPS,
        "p50_latency_ms": res["p50_latency_ms"],
        "batch_size": res["batch_size"],
        "backend": res["backend"],
    }
    # Secondary record: the rawIQ seg-64 MEAN-POOL geometry (the reference's
    # use_cls_token=False mode at its production_rawIQv1 tokenization) — the
    # served shape whose pass-arithmetic ceiling crosses the 1M north star.
    # The primary metric above stays on the reference's flagship ViT
    # architecture for parity. Set VITIQ_BENCH_MP=0 to skip.
    import os

    if os.environ.get("VITIQ_BENCH_MP", "1") != "0":
        try:
            mp = bench_fused_infer("rawiq_seg64_mp")
            line["rawiq_seg64_mp_frames_per_sec"] = mp["value"]
            line["rawiq_seg64_mp_vs_baseline"] = mp["value"] / TARGET_FPS
        except Exception as e:
            print(f"seg64-mp secondary bench skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)
    # Secondary record: ViT-Tiny at the RadioML 2016.10a task (BASELINE
    # config 2) — the ViT-arm geometry past the 1M north star (1.406M
    # frames/s with the fused raw-frame embedding, round 3aq). Set
    # VITIQ_BENCH_TINY=0 to skip.
    if os.environ.get("VITIQ_BENCH_TINY", "1") != "0":
        try:
            tiny = bench_fused_infer("vit_tiny", 16384)
            line["vit_tiny_frames_per_sec"] = tiny["value"]
            line["vit_tiny_vs_baseline"] = tiny["value"] / TARGET_FPS
        except Exception as e:
            print(f"vit_tiny secondary bench skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)
    # Secondary record: the fused TRAIN step at the same mean-pool geometry
    # (fwd+bwd+AdamW; stash backward, G=40, amortized async-queue timing —
    # docs/BENCHMARKS.md rounds 3w-3z). vs_reference_gpu is against the
    # reference's only published throughput (~2,330 frames/s train).
    if os.environ.get("VITIQ_BENCH_TRAIN", "1") != "0":
        try:
            from vitiq.bench import bench_train_step

            tr = bench_train_step("rawiq_seg64_mp", 8192)
            line["rawiq_seg64_mp_train_frames_per_sec"] = tr["value"]
            line["rawiq_seg64_mp_train_vs_reference_gpu"] = tr[
                "vs_reference_gpu"]
        except Exception as e:
            print(f"train secondary bench skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)
        # the REFERENCE flagship architecture's train step — the apples-to-
        # apples comparison against the reference's only published
        # throughput (~2,330 frames/s train on its GPU)
        try:
            trf = bench_train_step("rawiq", 2048)
            line["rawiq_flagship_train_frames_per_sec"] = trf["value"]
            line["rawiq_flagship_train_vs_reference_gpu"] = trf[
                "vs_reference_gpu"]
        except Exception as e:
            print(f"flagship train bench skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
