#!/usr/bin/env python
"""Driver-facing benchmark: prints ONE JSON line.

Primary metric: classified IQ frames/sec/chip on the fastest end-to-end
fused DSP+ViT geometry the framework serves — ViT-Tiny on RadioML
2016.10a-style 128-sample frames (BASELINE.json config 2: "ViT-Tiny on
RadioML 2016.10a spectrogram patches (11-class AMC)"). The full pipeline
(z-score normalization + [1,16,16] fold + patchify + ViT-d64/L4 encoder +
head) is ONE jit program whose front-end collapses into the embedding GEMM
(vitiq/models/raw_embed.py), bf16 'tpu' numerics, raw frames resident in
HBM. vs_baseline is relative to the 1M frames/s/chip north star from
BASELINE.json; this geometry crosses it (round 3aq: 1.406M frames/s).

The reference's own flagship architecture (ViT d128/L6 on 1024-sample
frames, BASELINE config 4 scale) is reported alongside as
vit_flagship_frames_per_sec: it is architecture-bound well below 1M on ANY
kernel (its per-frame pass arithmetic caps at ~269K frames/s at 100% MFU on
v5e — scripts/pass_roofline.py; we serve ~50% of that ceiling, inside the
42-61% band every served shape lands in). The reference publishes no
inference throughput of its own; its only number is ~2,330 frames/s TRAIN
on an unspecified CUDA GPU (README.md:458-473), against which the train
keys below report 16-119x.
"""

import json
import sys


def main() -> int:
    from vitiq.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from vitiq.bench import TARGET_FPS, bench_fused_infer, measure_dispatch_rtt

    # Relay-weather self-diagnostic (VERDICT r4 item 1): the per-dispatch
    # host<->device round trip on a trivial program. The fori-slope timing
    # below is immune to it by construction (constant per-call cost cancels
    # in the shallow/deep slope), but recording it makes any residual
    # contamination detectable post-hoc. Round-4's regression signature was
    # ~25-28 ms/step of exactly this leaking through the inner=8 queue.
    try:
        rtt = measure_dispatch_rtt()
    except Exception:
        rtt = {"p50_ms": -1.0, "min_ms": -1.0}
    try:
        res = bench_fused_infer("vit_tiny", 16384)
    except Exception as e:  # transient "TPU backend error (Internal)" observed
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); retrying",
              file=sys.stderr)
        res = bench_fused_infer("vit_tiny", 16384)
    # Metric key names its geometry (VERDICT r3 item 9): the r01/r02 primary
    # was the ViT flagship (61.6K -> 110.8K); r03+ promotes the 1M-crossing
    # vit_tiny geometry. Both remain emitted every round —
    # vit_flagship_frames_per_sec is the apples-to-apples continuation of
    # the old primary — so round-over-round vs_baseline stays comparable.
    line = {
        "metric": "iq_frames_per_sec_per_chip__vit_tiny",
        "value": res["value"],
        "unit": "frames/s",
        "vs_baseline": res["value"] / TARGET_FPS,
        "p50_latency_ms": res["p50_latency_ms"],
        "batch_size": res["batch_size"],
        "backend": res["backend"],
        "config": "vit_tiny (BASELINE config 2: ViT-arm 11-class AMC, "
                  "fused DSP front-end + ViT-d64/L4, 128-sample frames)",
        "dispatch_rtt_ms_p50": rtt["p50_ms"],
        "dispatch_rtt_ms_min": rtt["min_ms"],
        "timing_method": res.get("timing_method", "queue"),
        "timing_overhead_ms_p50": res.get("overhead_p50_ms", -1.0),
    }
    import os

    # The REFERENCE FLAGSHIP ViT (d128/L6, 1024-sample frames) — the
    # architecture-parity key. Architecture-bound at ~269K frames/s
    # pass-arithmetic SOL (scripts/pass_roofline.py), so its vs_baseline
    # cannot reach 1.0 on any kernel. Set VITIQ_BENCH_FLAGSHIP=0 to skip.
    if os.environ.get("VITIQ_BENCH_FLAGSHIP", "1") != "0":
        try:
            fl = bench_fused_infer("vit")
            line["vit_flagship_frames_per_sec"] = fl["value"]
            line["vit_flagship_vs_baseline"] = fl["value"] / TARGET_FPS
            line["vit_flagship_p50_latency_ms"] = fl["p50_latency_ms"]
        except Exception as e:
            print(f"flagship bench skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)
    # The rawIQ seg-64 MEAN-POOL geometry (the reference's
    # use_cls_token=False mode at its production_rawIQv1 tokenization) — the
    # second served geometry past the 1M north star (raw-IQ arm).
    # Set VITIQ_BENCH_MP=0 to skip.
    if os.environ.get("VITIQ_BENCH_MP", "1") != "0":
        try:
            mp = bench_fused_infer("rawiq_seg64_mp")
            line["rawiq_seg64_mp_frames_per_sec"] = mp["value"]
            line["rawiq_seg64_mp_vs_baseline"] = mp["value"] / TARGET_FPS
        except Exception as e:
            print(f"seg64-mp secondary bench skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)
    # Secondary record: the fused TRAIN step at the same mean-pool geometry
    # (fwd+bwd+AdamW; stash backward, amortized async-queue timing —
    # docs/BENCHMARKS.md rounds 3w-3aq). vs_reference_gpu is against the
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
        # the reference's BEST-ACCURACY architecture (rawIQ d256/L9
        # exp_L9_H8_F1024_W1e-3, 63.44% — VERDICT r3 item 3): the round-4
        # G=4 rung lifted it +15% over the round-3 conservative pick
        try:
            trb = bench_train_step("rawiq_best", 8192)
            line["rawiq_best_train_frames_per_sec"] = trb["value"]
            line["rawiq_best_train_vs_reference_gpu"] = trb[
                "vs_reference_gpu"]
        except Exception as e:
            print(f"best train bench skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)
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
