#!/usr/bin/env python
"""On-TPU correctness spot-check: the fused-layer bf16 inference path vs the
reference f32 path. Run on a TPU backend.

Usage: python scripts/tpu_check_fused.py [vit|conv1d|rawiq|best|seg64|bestmp|seg64mp|tiny] [batch] [n_head]
  vit     — flagship ViT d128/L6 (129 tokens), default
  conv1d  — rawIQ conv1d mode (1025 tokens, ref:
            transformer_rawIQ/models/encoder.py:34-41)
  rawiq   — rawIQ segment-16 (65 tokens, Lp=80 — exercises the
            batch-packed attention tile, VITIQ_V3_PACK auto)
  seg64   — rawIQ segment-64 (17 tokens, Lp=32 — the small-Lp xpack
            regime; set VITIQ_V3_ATTN=xpack [+ VITIQ_V3_G] to force)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vitiq.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from vitiq.bench import FLAGSHIP_STATS, flagship_vit_config
from vitiq.config import ModelConfig
from vitiq.dsp import preprocess_batch_rawiq, preprocess_batch_vit
from vitiq.models import init_amc_params, make_forward


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "vit"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if which == "conv1d":
        mk = lambda numerics: ModelConfig(
            arm="rawiq", num_classes=19, d_model=128, n_head=8, n_layers=6,
            ffn_hidden=1024, drop_prob=0.2, embedding_type="conv1d",
            seq_length=1024, numerics=numerics)
        cfg_tpu, cfg_ref = mk("tpu"), mk("reference")
        pre = lambda x: preprocess_batch_rawiq(x, FLAGSHIP_STATS)
    elif which == "rawiq":
        from vitiq.bench import flagship_rawiq_config

        cfg_tpu = flagship_rawiq_config("tpu")
        cfg_ref = flagship_rawiq_config("reference")
        pre = lambda x: preprocess_batch_rawiq(x, FLAGSHIP_STATS)
    elif which == "best":
        # the reference's best published checkpoint geometry (rawIQ
        # exp_L9_H8_F1024_W1e-3: d256/L9/H8/seg16 -> 65 tokens, Lp=80) —
        # exercises the fused stacks at d_model=256
        mk = lambda numerics: ModelConfig(
            arm="rawiq", num_classes=19, d_model=256, n_head=8, n_layers=9,
            ffn_hidden=1024, drop_prob=0.1, embedding_type="segment",
            segment_size=16, numerics=numerics)
        cfg_tpu, cfg_ref = mk("tpu"), mk("reference")
        pre = lambda x: preprocess_batch_rawiq(x, FLAGSHIP_STATS)
    elif which == "seg64":
        # segment-64 tokenization (17 tokens, Lp=32) — the small-Lp xpack
        # regime (VITIQ_V3_ATTN=xpack [+ VITIQ_V3_G] to exercise it)
        from vitiq.bench import rawiq_seg64_config

        cfg_tpu = rawiq_seg64_config("tpu")
        cfg_ref = rawiq_seg64_config("reference")
        pre = lambda x: preprocess_batch_rawiq(x, FLAGSHIP_STATS)
    elif which == "bestmp":
        # best-checkpoint geometry (d256/L9/seg16) with mean-pool: Lp=64
        from vitiq.bench import rawiq_best_mp_config

        cfg_tpu = rawiq_best_mp_config("tpu")
        cfg_ref = rawiq_best_mp_config("reference")
        pre = lambda x: preprocess_batch_rawiq(x, FLAGSHIP_STATS)
    elif which == "seg64mp":
        # segment-64 MEAN-POOL readout (use_cls_token=False, ref
        # transformer_rawIQ.py:88-93): 16 tokens, Lp=16 — zero sublane
        # padding, the highest-ceiling served shape (pass_roofline.py)
        from vitiq.bench import rawiq_seg64_mp_config

        cfg_tpu = rawiq_seg64_mp_config("tpu")
        cfg_ref = rawiq_seg64_mp_config("reference")
        pre = lambda x: preprocess_batch_rawiq(x, FLAGSHIP_STATS)
    elif which == "tiny":
        # BASELINE config 2: ViT-Tiny 2016.10a geometry (d64/L4/H4,
        # 128-sample frames -> 16x16 image, 17 tokens) — exercises the
        # fused stacks at d_model=64 (half a lane tile)
        from vitiq.bench import vit_tiny_2016_config

        cfg_tpu = vit_tiny_2016_config("tpu")
        cfg_ref = vit_tiny_2016_config("reference")
        pre = lambda x: preprocess_batch_vit(x, FLAGSHIP_STATS, H=16, W=16)
    else:
        cfg_tpu = flagship_vit_config("tpu")
        cfg_ref = flagship_vit_config("reference")
        pre = lambda x: preprocess_batch_vit(x, FLAGSHIP_STATS)
    if len(sys.argv) > 3:  # head variant (d_head = d_model / n_head)
        from dataclasses import replace

        nh = int(sys.argv[3])
        cfg_tpu, cfg_ref = replace(cfg_tpu, n_head=nh), replace(cfg_ref, n_head=nh)
        which = f"{which}_h{nh}"
    params = init_amc_params(jax.random.PRNGKey(0), cfg_tpu)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, cfg_tpu.seq_length, 2)), jnp.float32)

    # the tpu side runs exactly what production serving would run for this
    # config — including the fused raw-frame embedding when its auto gate
    # (vitiq/models/raw_embed.py) selects it; the reference side is always
    # the unfused f32 chain (the parity target)
    from vitiq.models.raw_embed import fused_raw_embed_enabled

    if fused_raw_embed_enabled(cfg_tpu):
        which = f"{which}+rawembed"
        fwd_raw = make_forward(cfg_tpu, raw_stats=FLAGSHIP_STATS)
        fused = jax.jit(lambda p, x: fwd_raw(p, x, train=False))
    else:
        fused = jax.jit(lambda p, x: make_forward(cfg_tpu)(p, pre(x), train=False))
    ref = jax.jit(lambda p, x: make_forward(cfg_ref)(p, pre(x), train=False))
    a = np.asarray(fused(params, x))
    b = np.asarray(ref(params, x))
    agree = float(np.mean(a.argmax(-1) == b.argmax(-1)))
    max_abs = float(np.abs(a - b).max())
    # random-init logits can be near-tied (especially at 1025 tokens, where
    # mean-pooled features shrink the gaps), so argmax flips on samples whose
    # top-2 margin is below the bf16 noise floor say nothing about parity;
    # score agreement only where the reference's own margin clears the
    # measured noise
    top2 = np.sort(b, axis=-1)
    margin = top2[:, -1] - top2[:, -2]
    confident = margin > 4 * max_abs
    agree_conf = float(np.mean(a.argmax(-1)[confident] == b.argmax(-1)[confident])) \
        if confident.any() else 1.0
    print(f"[{which}] fused-vs-reference: argmax agreement {agree:.3f} "
          f"(confident-margin: {agree_conf:.3f} over {int(confident.sum())}), "
          f"max |dlogit| {max_abs:.4f}", flush=True)
    assert max_abs < 0.05, "fused bf16 logits diverge from reference"
    assert agree_conf >= 0.99, "fused bf16 path diverges on confident samples"
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
