"""Matched filtering.

Receiver-side RRC filtering of I/Q (the pair of the transmit pulse shaping,
ref contract: test_dsp_functions.py imports `matched_filter` alongside
`rrc_filter`; shaping at the call sites is `np.convolve(x, rrc, mode='same')`).

The core is jnp so it fuses into the rest of a jitted front-end; the batched
variant lowers to one XLA grouped conv over the whole batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vitiq.dsp.taps import rrc_filter


def matched_filter(i_signal, q_signal, sps: int = 2, alpha: float = 0.35, span: int = 8):
    """RRC matched filter over an I/Q pair; 'same'-mode convolution so sample
    indices stay aligned with the input (symbol peaks keep their positions).

    Returns (filtered_i, filtered_q) as float32 arrays of the input length.
    """
    taps = jnp.asarray(rrc_filter(alpha=alpha, span=span, sps=sps), dtype=jnp.float32)
    i_f = jnp.convolve(jnp.asarray(i_signal, jnp.float32), taps, mode="same")
    q_f = jnp.convolve(jnp.asarray(q_signal, jnp.float32), taps, mode="same")
    return np.asarray(i_f), np.asarray(q_f)


def matched_filter_batch(x: jnp.ndarray, sps: int, alpha: float = 0.35, span: int = 8) -> jnp.ndarray:
    """Batched jittable matched filter: x [B, L, 2] -> [B, L, 2].

    One grouped 1-D convolution (identical taps on the I and Q channels) so the
    whole batch is a single XLA conv op.
    """
    taps = jnp.asarray(rrc_filter(alpha=alpha, span=span, sps=sps), dtype=x.dtype)
    k = taps.shape[0]
    pad = (k - 1) // 2  # 'same' padding; k = span*sps+1 is odd
    lhs = x.transpose(0, 2, 1)  # [B, C=2, L]
    # np.convolve(x, h)[n] = sum_k x[n-k] h[k] is correlation with the flipped
    # kernel; XLA conv computes correlation, so flip the taps (symmetric RRC
    # taps make this a no-op numerically, but keep the orientation exact).
    rhs = jnp.broadcast_to(jnp.flip(taps)[None, None, :], (2, 1, k))
    out = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1,),
        padding=((pad, pad),),
        feature_group_count=2,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.transpose(0, 2, 1)
