"""Streaming wideband inference: channelizer -> fused DSP+classifier.

BASELINE.json config 5: a 64-channel polyphase channelizer splits a wideband
complex stream into per-channel baseband I/Q, every channel's 1024-sample
frame is z-scored and classified by the flagship model — ONE jit program end
to end, so the wideband samples never leave the device between stages.

Scale-out: the batch/channel axis is the parallel axis (SURVEY.md §5 "shard
channelizer outputs across chips (frame parallelism), not tokens") — the
returned function shards its [B, N] input over the mesh's 'data' axis like
any other batch.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vitiq.config import ModelConfig
from vitiq.dsp.channelizer import design_prototype_lowpass, polyphase_channelize
from vitiq.dsp import preprocess_batch_rawiq, preprocess_batch_vit


def make_streaming_classifier(
    cfg: ModelConfig,
    forward_fn: Callable,
    stats: Dict[str, float],
    num_channels: int = 64,
    taps_per_phase: int = 8,
) -> Callable:
    """Build jitted fn(params, wideband [B, N] complex64) -> logits
    [B, num_channels, num_classes].

    N must equal num_channels * frame_len so each channel yields exactly one
    model frame per call (streaming callers invoke once per frame window).
    """
    frame_len = cfg.seq_length
    taps = design_prototype_lowpass(num_channels, taps_per_phase)
    if cfg.arm == "vit":
        pre = lambda x: preprocess_batch_vit(x, stats, H=cfg.img_size_h, W=cfg.img_size_w)
    else:
        pre = lambda x: preprocess_batch_rawiq(x, stats)

    @jax.jit
    def classify(params, wideband: jnp.ndarray) -> jnp.ndarray:
        B, N = wideband.shape
        if N != num_channels * frame_len:
            raise ValueError(
                f"stream window must be num_channels*frame_len = "
                f"{num_channels * frame_len} samples, got {N}"
            )
        chans = polyphase_channelize(wideband, num_channels, taps)  # [B, K, L]
        frames = jnp.stack([jnp.real(chans), jnp.imag(chans)], axis=-1)  # [B, K, L, 2]
        flat = frames.reshape(B * num_channels, frame_len, 2)
        logits = forward_fn(params, pre(flat), train=False)
        return logits.reshape(B, num_channels, -1)

    return classify


def demo_streaming(
    num_channels: int = 64,
    batch: int = 1,
    numerics: str = "tpu",
    seed: int = 0,
) -> Dict:
    """Self-contained demo: flagship rawIQ classifier over a synthetic
    multitone wideband. Returns logits shape + per-channel argmax."""
    from vitiq.dsp.channelizer import synthesize_multitone
    from vitiq.models import init_amc_params, make_forward

    cfg = ModelConfig(arm="rawiq", num_classes=19, d_model=128, n_head=8,
                      n_layers=6, ffn_hidden=1024, segment_size=16,
                      numerics=numerics)
    params = init_amc_params(jax.random.PRNGKey(seed), cfg)
    fwd = make_forward(cfg)
    stats = {"i_mean": 0.0, "i_std": 1.0, "q_mean": 0.0, "q_std": 1.0}
    classify = make_streaming_classifier(cfg, fwd, stats, num_channels)

    wideband = jnp.asarray(np.concatenate([
        synthesize_multitone(num_channels, cfg.seq_length,
                             active=((3, 1.0), (17, 0.5)), seed=seed + i)
        for i in range(batch)
    ]))
    logits = classify(params, wideband)
    return {
        "logits_shape": tuple(logits.shape),
        "per_channel_pred": np.asarray(jnp.argmax(logits, -1)),
    }
