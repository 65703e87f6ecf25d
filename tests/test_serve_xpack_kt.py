"""Key-tiled packed serving kernel (xpack-kt, long sequences): parity vs the
XLA reference path in interpreter mode, incl. remainder key tiles and padded
tokens — the stale-scratch-row cases the tiling has to get right."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vitiq.models import layers as L
from vitiq.ops.numerics import REFERENCE
from vitiq.ops.pallas.serve_xpack_kt import (
    fused_encoder_layer_xpack_kt_stack,
    pick_kt,
)


def _xla_layer(params, x, n_head):
    return L.encoder_layer_apply(params, x, n_head=n_head, drop_prob=0.0,
                                 rng=None, train=False, policy=REFERENCE)


@pytest.mark.parametrize("Lx,n_head", [(200, 8), (299, 4)])
def test_single_layer_matches_xla(Lx, n_head):
    """Lx=200 -> full tiles + remainder; Lx=299 (f32 Lp=304) additionally
    pads tokens, so the last tile mixes remainder-zeroing with the padded-key
    mask."""
    rng = np.random.default_rng(0)
    params = L.encoder_layer_init(jax.random.PRNGKey(0), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)
    want = np.asarray(_xla_layer(params, x, n_head))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_encoder_layer_xpack_kt_stack(x, [params], n_head))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_two_layer_stack_matches_xla():
    rng = np.random.default_rng(1)
    p0 = L.encoder_layer_init(jax.random.PRNGKey(1), 128, 256)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(2), 128, 256)
    x = jnp.asarray(rng.standard_normal((3, 200, 128)), jnp.float32)
    want = np.asarray(_xla_layer(p1, _xla_layer(p0, x, 8), 8))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_layer_xpack_kt_stack(x, [p0, p1], 8))
    np.testing.assert_allclose(got, want, atol=6e-5)


def test_kt_env_override(monkeypatch):
    monkeypatch.setenv("VITIQ_KT", "32")
    rng = np.random.default_rng(2)
    params = L.encoder_layer_init(jax.random.PRNGKey(3), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, 200, 128)), jnp.float32)
    want = np.asarray(_xla_layer(params, x, 8))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_encoder_layer_xpack_kt_stack(x, [params], 8))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_picker_covers_conv1d():
    g, kt = pick_kt(1040, 128, 1024, 8, 2)  # the conv1d serving geometry
    assert g >= 1 and kt >= 32


def test_lpc_split_matches_one_call(monkeypatch):
    """VITIQ_KT_LPC=1 (one layer per pallas_call — the compile-time lever for
    long stacks) must match the default whole-stack call exactly."""
    rng = np.random.default_rng(3)
    p0 = L.encoder_layer_init(jax.random.PRNGKey(4), 128, 256)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(5), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, 200, 128)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        one_call = np.asarray(
            fused_encoder_layer_xpack_kt_stack(x, [p0, p1], 8))
        monkeypatch.setenv("VITIQ_KT_LPC", "1")
        split = np.asarray(
            fused_encoder_layer_xpack_kt_stack(x, [p0, p1], 8))
    np.testing.assert_allclose(split, one_call, atol=1e-6)


@pytest.mark.parametrize("cls_only", [False, True])
def test_v3_stack_routes_kt(cls_only, monkeypatch):
    """fused_encoder_layer_v3_stack with VITIQ_V3_ATTN=kt must route the full
    layers through the key-tiled stack (and the CLS tail through the
    single-layer recursion) with reference parity — the wiring the conv1d
    long-sequence fallback rides."""
    from vitiq.ops.pallas.fused_encoder_layer import (
        fused_encoder_layer_v3_stack,
    )

    monkeypatch.setenv("VITIQ_V3_ATTN", "kt")
    rng = np.random.default_rng(4)
    p0 = L.encoder_layer_init(jax.random.PRNGKey(6), 128, 256)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(7), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, 200, 128)), jnp.float32)
    ref = np.asarray(_xla_layer(p1, _xla_layer(p0, x, 8), 8))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_layer_v3_stack(
            x, [p0, p1], 8, cls_only=cls_only))
    if cls_only:
        np.testing.assert_allclose(got[:, 0], ref[:, 0], atol=1e-4)
    else:
        np.testing.assert_allclose(got, ref, atol=1e-4)