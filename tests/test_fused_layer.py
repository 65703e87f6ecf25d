"""Fused encoder-layer kernel vs the unfused reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vitiq.models import layers as L
from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer
from vitiq.ops.numerics import REFERENCE


@pytest.mark.parametrize("Lx,n_head", [(17, 4), (129, 8), (64, 8)])
def test_matches_unfused_layer(Lx, n_head):
    rng = np.random.default_rng(0)
    B, D, H = 3, 128, 512
    params = L.encoder_layer_init(jax.random.PRNGKey(0), D, H)
    x = jnp.asarray(rng.standard_normal((B, Lx, D)), jnp.float32)
    want = np.asarray(
        L.encoder_layer_apply(params, x, n_head=n_head, drop_prob=0.0,
                              rng=None, train=False, policy=REFERENCE)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_layer(x, params, n_head))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_padding_rows_do_not_leak():
    """Valid rows must be independent of batch/sequence padding."""
    rng = np.random.default_rng(1)
    D, H, n_head = 128, 256, 8
    params = L.encoder_layer_init(jax.random.PRNGKey(1), D, H)
    x9 = jnp.asarray(rng.standard_normal((1, 9, D)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out9 = np.asarray(fused_encoder_layer(x9, params, n_head))
    want = np.asarray(
        L.encoder_layer_apply(params, x9, n_head=n_head, drop_prob=0.0,
                              rng=None, train=False, policy=REFERENCE)
    )
    np.testing.assert_allclose(out9, want, atol=3e-5)


def test_stacked_layers_match_encoder():
    """Chaining fused layers == the unfused 2-layer encoder core."""
    rng = np.random.default_rng(2)
    B, Lx, D, H, n_head = 2, 33, 128, 512, 8
    p1 = L.encoder_layer_init(jax.random.PRNGKey(2), D, H)
    p2 = L.encoder_layer_init(jax.random.PRNGKey(3), D, H)
    x = jnp.asarray(rng.standard_normal((B, Lx, D)), jnp.float32)
    ref = L.encoder_layer_apply(p1, x, n_head, 0.0, None, False)
    ref = np.asarray(L.encoder_layer_apply(p2, ref, n_head, 0.0, None, False))
    with pltpu.force_tpu_interpret_mode():
        got = fused_encoder_layer(x, p1, n_head)
        got = np.asarray(fused_encoder_layer(got, p2, n_head))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_v2_stack_matches_reference_layers():
    """The v2 (augmented score-matrix) stack == unfused reference layers."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v2_stack

    rng = np.random.default_rng(5)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(10), 128, 512)
    p2 = L.encoder_layer_init(jax.random.PRNGKey(11), 128, 512)
    x = jnp.asarray(rng.standard_normal((3, 129, 128)), jnp.float32)
    ref = L.encoder_layer_apply(p1, x, 8, 0.0, None, False, policy=REFERENCE)
    ref = np.asarray(L.encoder_layer_apply(p2, ref, 8, 0.0, None, False,
                                           policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_layer_v2_stack(x, [p1, p2], 8))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_v2_bias_exactness():
    """The ones-column trick must carry q/k biases exactly: a layer whose
    q/k BIASES are large still matches."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v2_stack

    rng = np.random.default_rng(6)
    params = L.encoder_layer_init(jax.random.PRNGKey(12), 128, 256)
    params["attention"]["w_q"]["bias"] = jnp.asarray(
        rng.standard_normal(128) * 5.0, jnp.float32)
    params["attention"]["w_k"]["bias"] = jnp.asarray(
        rng.standard_normal(128) * 5.0, jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 17, 128)), jnp.float32)
    want = np.asarray(L.encoder_layer_apply(params, x, 8, 0.0, None, False,
                                            policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_layer_v2_stack(x, [params], 8))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("Lx,n_head", [
    (17, 4),   # single key tile, width < 128
    (129, 8),  # flagship: full 128 tile + 16-wide masked remainder
    (200, 8),  # two tiles, second partially masked
])
def test_v3_stack_matches_reference_layers(Lx, n_head):
    """The v3 (score-tile-streamed) stack == unfused reference layers.
    Covers the Lk-128 tiling, the masked remainder tile, the MXU ones-column
    denominator, and the scale-folded-into-W_q trick."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

    rng = np.random.default_rng(7)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(20), 128, 512)
    p2 = L.encoder_layer_init(jax.random.PRNGKey(21), 128, 512)
    x = jnp.asarray(rng.standard_normal((3, Lx, 128)), jnp.float32)
    ref = L.encoder_layer_apply(p1, x, n_head, 0.0, None, False, policy=REFERENCE)
    ref = np.asarray(L.encoder_layer_apply(p2, ref, n_head, 0.0, None, False,
                                           policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_layer_v3_stack(x, [p1, p2], n_head))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("Lx,n_head,cls_only", [
    (16, 8, False),   # seg-64 mean-pool geometry: Lp=16, ZERO padded rows
    (17, 4, False),   # single tile, no padded keys beyond sublane pad
    (129, 8, False),  # flagship geometry incl. 15 padded key rows
    (200, 8, False),  # several head blocks per K-pack row span
    (129, 8, True),   # CLS tail after xpack main layers
])
def test_v3_xpack_matches_reference_layers(Lx, n_head, cls_only, monkeypatch):
    """VITIQ_V3_ATTN=xpack (cross-head packed block-diagonal attention) must
    be exact: one GEMM chain replaces the per-head score->exp->PV chains;
    covers padded-key masking via zeroed vp rows + ones_bd, zero-fill-once
    scratch reuse across grid steps and layers, and the CLS-only tail."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

    monkeypatch.setenv("VITIQ_V3_ATTN", "xpack")
    rng = np.random.default_rng(8)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(22), 128, 512)
    p2 = L.encoder_layer_init(jax.random.PRNGKey(23), 128, 512)
    x = jnp.asarray(rng.standard_normal((5, Lx, 128)), jnp.float32)
    ref = L.encoder_layer_apply(p1, x, n_head, 0.0, None, False, policy=REFERENCE)
    ref = np.asarray(L.encoder_layer_apply(p2, ref, n_head, 0.0, None, False,
                                           policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_layer_v3_stack(
            x, [p1, p2], n_head, cls_only=cls_only))
    if cls_only:
        np.testing.assert_allclose(got[:, 0], ref[:, 0], atol=1e-4)
    else:
        np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("Lx", [129, 133, 136, 128])
def test_v3_vpu_tail_matches_mxu_tiles(Lx, monkeypatch):
    """The VPU rank-1 tail-key path (keys beyond the last full 128-wide MXU
    tile computed as broadcast-multiply corrections) must match both the
    tile-only kernel and the unfused reference. Covers n_tail = 1, 5, 8 and
    the exact-128 no-tail boundary."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

    rng = np.random.default_rng(17)
    params = L.encoder_layer_init(jax.random.PRNGKey(60), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)
    want = np.asarray(L.encoder_layer_apply(params, x, 8, 0.0, None, False,
                                            policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("VITIQ_V3_TAIL", "1")
        got_tail = np.asarray(fused_encoder_layer_v3_stack(x, [params], 8))
        monkeypatch.setenv("VITIQ_V3_TAIL", "0")
        got_tiles = np.asarray(fused_encoder_layer_v3_stack(x, [params], 8))
    np.testing.assert_allclose(got_tail, want, atol=1e-4)
    np.testing.assert_allclose(got_tail, got_tiles, atol=1e-4)


@pytest.mark.parametrize("Lx,n_head,p", [
    (65, 8, 2),    # rawIQ segment-16 shape: Lp=80, packed pairs
    (17, 4, 4),    # segment-64 shape: Lp=32, 4 frames fill one 128 tile
    (64, 8, 2),    # seq_len == elem_len (no padded rows inside a frame)
    (65, 8, 3),    # pack that doesn't divide 128 (160*1.5): odd P
])
def test_v3_batch_packed_matches_unpacked(Lx, n_head, p, monkeypatch):
    """VITIQ_V3_PACK>1 rides several frames in one attention tile with a
    block-diagonal probability mask; must match the unpacked stack and the
    unfused reference exactly (incl. a batch that is not a multiple of P)."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

    rng = np.random.default_rng(53)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(90), 128, 256)
    p2 = L.encoder_layer_init(jax.random.PRNGKey(91), 128, 256)
    x = jnp.asarray(rng.standard_normal((3, Lx, 128)), jnp.float32)
    ref = L.encoder_layer_apply(p1, x, n_head, 0.0, None, False, policy=REFERENCE)
    ref = np.asarray(L.encoder_layer_apply(p2, ref, n_head, 0.0, None, False,
                                           policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("VITIQ_V3_PACK", str(p))
        got = np.asarray(fused_encoder_layer_v3_stack(x, [p1, p2], n_head))
        monkeypatch.setenv("VITIQ_V3_PACK", "0")
        got_unpacked = np.asarray(
            fused_encoder_layer_v3_stack(x, [p1, p2], n_head))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    np.testing.assert_allclose(got, got_unpacked, atol=1e-5)


@pytest.mark.parametrize("n_layers,attn", [
    (2, "chain"), (3, "chain"),  # round-2 combo: last full layer + CLS
    (2, "xpack"), (3, "xpack"),  # mono: ENTIRE stack + CLS in one call
])
def test_v3_fused_cls_tail_matches(n_layers, attn, monkeypatch):
    """VITIQ_V3_FUSECLS=1 must match the two-call path on both cores: under
    the chained core it merges the last full layer with the CLS layer; under
    xpack it merges the ENTIRE stack (inter-layer activation VMEM-resident,
    zero full-activation HBM round-trips)."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

    monkeypatch.setenv("VITIQ_V3_ATTN", attn)
    rng = np.random.default_rng(61)
    ps = [L.encoder_layer_init(jax.random.PRNGKey(95 + i), 128, 256)
          for i in range(n_layers)]
    x = jnp.asarray(rng.standard_normal((3, 129, 128)), jnp.float32)
    ref = x
    for p in ps:
        ref = L.encoder_layer_apply(p, ref, 8, 0.0, None, False,
                                    policy=REFERENCE)
    ref = np.asarray(ref)
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("VITIQ_V3_FUSECLS", "0")
        two_call = np.asarray(fused_encoder_layer_v3_stack(x, ps, 8,
                                                           cls_only=True))
        monkeypatch.setenv("VITIQ_V3_FUSECLS", "1")
        fused = np.asarray(fused_encoder_layer_v3_stack(x, ps, 8,
                                                        cls_only=True))
    assert fused.shape == (3, 1, 128)
    np.testing.assert_allclose(fused, two_call, atol=1e-5)
    np.testing.assert_allclose(fused[:, 0], ref[:, 0], atol=1e-4)


def test_v3_batch_packed_cls_only(monkeypatch):
    """Packing + CLS-only last layer (the rawIQ serving path) must match
    token 0 of the full packed stack."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

    rng = np.random.default_rng(54)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(92), 128, 256)
    p2 = L.encoder_layer_init(jax.random.PRNGKey(93), 128, 256)
    x = jnp.asarray(rng.standard_normal((3, 65, 128)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("VITIQ_V3_PACK", "2")
        full = np.asarray(fused_encoder_layer_v3_stack(x, [p1, p2], 8))
        cls = np.asarray(fused_encoder_layer_v3_stack(x, [p1, p2], 8,
                                                      cls_only=True))
    assert cls.shape == (3, 1, 128)
    np.testing.assert_allclose(cls[:, 0], full[:, 0], atol=2e-5)


@pytest.mark.parametrize("epi,Lx", [("div", 129), ("div3", 129), ("mul", 129),
                                    ("mul2", 129), ("div2", 129), ("div3", 17),
                                    ("mul", 200)])
def test_v3_epilogue_variants_match_reference(epi, Lx, monkeypatch):
    """All softmax-normalization epilogues (VITIQ_V3_EPI) must be correct.
    The bf16-numerator variants (mul/mul2/div2) carry 2^-9 relative rounding
    on the attention output — same class as the bf16 stream itself — so they
    get a looser tolerance. On-chip timings in docs/BENCHMARKS.md round-2.6
    ('div' is the measured winner and the default)."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

    rng = np.random.default_rng(43)
    params = L.encoder_layer_init(jax.random.PRNGKey(75), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)
    want = np.asarray(L.encoder_layer_apply(params, x, 8, 0.0, None, False,
                                            policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("VITIQ_V3_EPI", epi)
        got = np.asarray(fused_encoder_layer_v3_stack(x, [params], 8))
    atol = 1e-4 if epi in ("div", "div3") else 6e-3
    np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.parametrize("hg,Lx", [(2, 129), (4, 129), (8, 129), (4, 17),
                                   (2, 200)])
def test_v3_head_group_matches_reference(hg, Lx, monkeypatch):
    """VITIQ_V3_HG>1 (head-grouped score->exp->PV staging) must be exact."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

    rng = np.random.default_rng(31)
    params = L.encoder_layer_init(jax.random.PRNGKey(70), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)
    want = np.asarray(L.encoder_layer_apply(params, x, 8, 0.0, None, False,
                                            policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("VITIQ_V3_HG", str(hg))
        got = np.asarray(fused_encoder_layer_v3_stack(x, [params], 8))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_v3_denominator_column_exact():
    """The MXU ones-column denominator must equal the true softmax sum even
    with large q/k biases (exercises the folded scale on the bias too)."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

    rng = np.random.default_rng(8)
    params = L.encoder_layer_init(jax.random.PRNGKey(22), 128, 256)
    params["attention"]["w_q"]["bias"] = jnp.asarray(
        rng.standard_normal(128) * 5.0, jnp.float32)
    params["attention"]["w_k"]["bias"] = jnp.asarray(
        rng.standard_normal(128) * 5.0, jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 17, 128)), jnp.float32)
    want = np.asarray(L.encoder_layer_apply(params, x, 8, 0.0, None, False,
                                            policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_layer_v3_stack(x, [params], 8))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("Lx", [17, 129])
def test_v3_attn_int8_close_to_reference(Lx):
    """int8 attention core: quantization noise only (no structural error).
    Verifies the scale-cancellation argument (per-row probs scale and
    per-head vaug scale drop out of out/denominator) and the cross-tile
    running-max merge."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

    rng = np.random.default_rng(9)
    params = L.encoder_layer_init(jax.random.PRNGKey(30), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)
    want = np.asarray(L.encoder_layer_apply(params, x, 8, 0.0, None, False,
                                            policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_layer_v3_stack(
            x, [params], 8, attn_int8=True))
    # int8 attention-core tolerance: ~1% of activation scale
    err = np.abs(got - want).max()
    assert err < 0.15, f"int8 attention core error too large: {err}"
    np.testing.assert_allclose(got, want, atol=0.15)


class TestSoftmaxBoundGuard:
    """Calibration guard for the max-free fused softmax (r1 VERDICT weak #3)."""

    def _cfg(self):
        from vitiq.config import ModelConfig
        return ModelConfig(arm="rawiq", num_classes=3, d_model=32, n_head=4,
                           n_layers=1, ffn_hidden=64, seq_length=64,
                           segment_size=16)

    def test_normal_weights_pass(self):
        import jax
        from vitiq.models import init_amc_params
        from vitiq.ops.guards import check_softmax_bound

        cfg = self._cfg()
        params = init_amc_params(jax.random.PRNGKey(0), cfg)
        peak = check_softmax_bound(params, cfg)
        assert peak < 80

    def test_pathological_weights_warn_and_raise(self):
        import warnings
        import jax
        import jax.numpy as jnp
        from vitiq.models import init_amc_params
        from vitiq.ops.guards import check_softmax_bound

        cfg = self._cfg()
        params = init_amc_params(jax.random.PRNGKey(0), cfg)
        ap = params["encoder"]["layers"][0]["attention"]
        ap["w_q"]["kernel"] = ap["w_q"]["kernel"] * 300.0
        ap["w_k"]["kernel"] = ap["w_k"]["kernel"] * 300.0
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            peak = check_softmax_bound(params, cfg)
        assert peak > 80
        assert any("safety bound" in str(x.message) for x in w)
        with pytest.raises(ValueError):
            check_softmax_bound(params, cfg, strict=True)


@pytest.mark.parametrize("Lx,n_head,tq", [
    (300, 8, 128),   # padded tail tile (300 -> 384), 3 q-tiles
    (256, 4, 128),   # exact multiple, no padding
    (129, 8, 64),    # flagship length through the long path (tiny TQ)
])
def test_v4long_stack_matches_reference_layers(Lx, n_head, tq, monkeypatch):
    """The query-tiled long-sequence stack (XLA QKV GEMM + per-query-tile
    Pallas layer tail) == unfused reference layers. Covers padded query/key
    rows, multiple query tiles, and the q_sec core mode."""
    from vitiq.ops.pallas.fused_encoder_layer import (
        fused_encoder_layer_v4long_stack,
    )

    monkeypatch.setenv("VITIQ_V4_TQ", str(tq))
    rng = np.random.default_rng(47)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(80), 128, 256)
    p2 = L.encoder_layer_init(jax.random.PRNGKey(81), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)
    ref = L.encoder_layer_apply(p1, x, n_head, 0.0, None, False, policy=REFERENCE)
    ref = np.asarray(L.encoder_layer_apply(p2, ref, n_head, 0.0, None, False,
                                           policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_layer_v4long_stack(x, [p1, p2], n_head))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_v4long_cls_only_matches_full(monkeypatch):
    """cls_only through the long stack (v4long body + v3 CLS tail) must
    reproduce token 0 of the full long stack."""
    from vitiq.ops.pallas.fused_encoder_layer import (
        fused_encoder_layer_v4long_stack,
    )

    monkeypatch.setenv("VITIQ_V4_TQ", "128")
    rng = np.random.default_rng(48)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(82), 128, 256)
    p2 = L.encoder_layer_init(jax.random.PRNGKey(83), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, 300, 128)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        full = np.asarray(fused_encoder_layer_v4long_stack(x, [p1, p2], 8))
        cls = np.asarray(fused_encoder_layer_v4long_stack(x, [p1, p2], 8,
                                                          cls_only=True))
    assert cls.shape == (2, 1, 128)
    np.testing.assert_allclose(cls[:, 0], full[:, 0], atol=2e-5)


@pytest.mark.parametrize("Lx,n_head", [(17, 4), (129, 8)])
def test_v3_cls_only_matches_full_stack_token0(Lx, n_head):
    """cls_only=True must reproduce token 0 of the full stack exactly
    (the last layer computes only the CLS query row)."""
    from vitiq.ops.pallas.fused_encoder_layer import fused_encoder_layer_v3_stack

    rng = np.random.default_rng(11)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(40), 128, 512)
    p2 = L.encoder_layer_init(jax.random.PRNGKey(41), 128, 512)
    x = jnp.asarray(rng.standard_normal((3, Lx, 128)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        full = np.asarray(fused_encoder_layer_v3_stack(x, [p1, p2], n_head))
        cls = np.asarray(fused_encoder_layer_v3_stack(x, [p1, p2], n_head,
                                                      cls_only=True))
    assert cls.shape == (3, 1, 128)
    np.testing.assert_allclose(cls[:, 0], full[:, 0], atol=2e-5)


def test_v3_int8_stack_close_to_float():
    """W8A8 v3 stack (int8 weight GEMMs, bf16 v3 attention): quantization
    noise only, incl. the dequantized CLS-only last layer."""
    from vitiq.ops.quant import quantize_params_int8
    from vitiq.ops.pallas.fused_encoder_layer import (
        fused_encoder_layer_v3_int8_stack,
    )

    rng = np.random.default_rng(13)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(50), 128, 512)
    p2 = L.encoder_layer_init(jax.random.PRNGKey(51), 128, 512)
    q1, q2 = quantize_params_int8(p1), quantize_params_int8(p2)
    x = jnp.asarray(rng.standard_normal((2, 129, 128)), jnp.float32)
    ref = L.encoder_layer_apply(p1, x, 8, 0.0, None, False, policy=REFERENCE)
    ref = np.asarray(L.encoder_layer_apply(p2, ref, 8, 0.0, None, False,
                                           policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_layer_v3_int8_stack(x, [q1, q2], 8))
        got_cls = np.asarray(fused_encoder_layer_v3_int8_stack(
            x, [q1, q2], 8, cls_only=True))
    assert np.abs(got - ref).max() < 0.25  # int8 weight quant noise
    np.testing.assert_allclose(got_cls[:, 0], got[:, 0], atol=0.05)


def test_xpack_picker_measured_geometries():
    """The 16.2 MB picker budget encodes the round-3b/3c measured ladder:
    flagship lands exactly on G=7 (G=8's 18.3 MB estimate failed to
    compile; 62.09 ms @ 8192 = the headline default), head variants on
    G=8 (H4 175.1K / H2 201.6K frames/s), conv1d returns 0 (falls back
    to the chained core)."""
    from vitiq.ops.pallas.fused_encoder_layer import _pick_batch_block_v3_xpack

    assert _pick_batch_block_v3_xpack(144, 128, 512, 8, 2) == 7  # flagship
    assert _pick_batch_block_v3_xpack(144, 128, 512, 4, 2) == 8  # H4
    assert _pick_batch_block_v3_xpack(144, 128, 512, 2, 2) == 8  # H2
    # small-Lp ladder (rounds 3d/3h): Lp <= 32 extends the candidates to
    # 64/32 — seg-64 CLS lands on G=32 (measured-best 548.0K), seg-64
    # mean-pool (Lp=16) on G=64; seg-16 stays on G=8 (its G=16 measured
    # slower AND overflows the budget at 21.6 MB)
    assert _pick_batch_block_v3_xpack(32, 128, 1024, 8, 2) == 32  # seg-64
    assert _pick_batch_block_v3_xpack(16, 128, 1024, 8, 2) == 64  # seg-64 mp
    assert _pick_batch_block_v3_xpack(80, 128, 1024, 8, 2) == 8   # seg-16
    assert _pick_batch_block_v3_xpack(1032, 128, 1024, 8, 2) == 0  # conv1d


def test_auto_routes_xpack_over_pack_at_short_lp(monkeypatch):
    """Round-3d default: auto engages the xpack core at EVERY Lp whose
    VMEM picker finds a G (measured wins at Lp=144/80/32), preempting the
    batch-packing rule that used to claim 64 < Lp <= 96; forcing
    VITIQ_V3_PACK=2 restores the packed chained core. Both routes must
    stay reference-exact."""
    import vitiq.ops.pallas.fused_encoder_layer as F

    calls = {"xpack": 0}
    orig = F._v3_attention_core_xpack

    def spy(*a, **k):
        calls["xpack"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(F, "_v3_attention_core_xpack", spy)
    monkeypatch.delenv("VITIQ_V3_ATTN", raising=False)
    monkeypatch.delenv("VITIQ_V3_PACK", raising=False)
    rng = np.random.default_rng(9)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(30), 128, 512)
    x = jnp.asarray(rng.standard_normal((4, 65, 128)), jnp.float32)  # Lp=80
    ref = np.asarray(L.encoder_layer_apply(p1, x, 8, 0.0, None, False,
                                           policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(F.fused_encoder_layer_v3_stack(x, [p1], 8))
    assert calls["xpack"] > 0, "auto did not engage the xpack core at Lp=80"
    np.testing.assert_allclose(got, ref, atol=1e-4)

    calls["xpack"] = 0
    monkeypatch.setenv("VITIQ_V3_PACK", "2")
    with pltpu.force_tpu_interpret_mode():
        got_packed = np.asarray(F.fused_encoder_layer_v3_stack(x, [p1], 8))
    assert calls["xpack"] == 0, "forced pack must disable xpack"
    np.testing.assert_allclose(got_packed, ref, atol=1e-4)


def test_v3_pack_zero_keeps_xpack_eligible(monkeypatch):
    """VITIQ_V3_PACK=0 means 'batch-packing off' — it must NOT disable the
    xpack attention core (regression: the eligibility check once accepted
    only pack in (-1, 1), so the documented certification combination
    VITIQ_V3_ATTN=xpack VITIQ_V3_PACK=0 silently measured the chained
    core). Only forcing pack >= 2 opts out of xpack."""
    import vitiq.ops.pallas.fused_encoder_layer as fel

    calls = []
    real_pick = fel._pick_batch_block_v3_xpack

    def spy(*a, **k):
        g = real_pick(*a, **k)
        calls.append(g)
        return g

    monkeypatch.setattr(fel, "_pick_batch_block_v3_xpack", spy)
    rng = np.random.default_rng(7)
    params = L.encoder_layer_init(jax.random.PRNGKey(3), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, 129, 128)), jnp.float32)
    ref = np.asarray(L.encoder_layer_apply(params, x, 8, 0.0, None, False,
                                           policy=REFERENCE))
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("VITIQ_V3_ATTN", "xpack")
        monkeypatch.setenv("VITIQ_V3_PACK", "0")
        got = np.asarray(fel.fused_encoder_layer_v3_stack(x, [params], 8))
        assert calls and calls[-1] > 0, "xpack picker not consulted at PACK=0"
        monkeypatch.setenv("VITIQ_V3_PACK", "2")
        calls.clear()
        got_packed = np.asarray(fel.fused_encoder_layer_v3_stack(x, [params], 8))
        assert not calls, "forced pack>=2 must bypass the xpack core"
    np.testing.assert_allclose(got, ref, atol=1e-4)
    np.testing.assert_allclose(got_packed, ref, atol=1e-4)


def test_meanpool_seg64_end_to_end_fused_matches_reference(monkeypatch):
    """The seg-64 MEAN-POOL serving route (use_cls_token=False — the
    reference's transformer_rawIQ.py:88-93 pooling flag): 16 tokens land
    exactly on the bf16 sublane boundary (Lp=16, ZERO padded rows), the
    shape the round-3h 1M-frames/s geometry serves. End-to-end fused
    (z-score + segment embed + xpack stack + mean-pool head) must agree
    with the unfused reference-f32 path; mean-pool needs every token, so
    this also covers the cls_only=False final layer under xpack."""
    from dataclasses import replace

    import vitiq.ops.pallas.fused_encoder_layer as F
    from vitiq.bench import FLAGSHIP_STATS, rawiq_seg64_mp_config
    from vitiq.dsp import preprocess_batch_rawiq
    from vitiq.models import init_amc_params, make_forward

    monkeypatch.setenv("VITIQ_FUSED_FORCE", "1")
    monkeypatch.setenv("VITIQ_PALLAS_INTERPRET", "1")
    calls = {"xpack": 0}
    orig = F._v3_attention_core_xpack

    def spy(*a, **k):
        calls["xpack"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(F, "_v3_attention_core_xpack", spy)

    cfg = rawiq_seg64_mp_config("tpu")
    assert cfg.num_tokens == 16  # no CLS row
    params = init_amc_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 1024, 2)),
                    jnp.float32)
    xb = preprocess_batch_rawiq(x, FLAGSHIP_STATS)
    out_fused = make_forward(cfg)(params, xb, train=False)
    assert calls["xpack"] > 0, "mean-pool route must ride the xpack core"

    monkeypatch.setenv("VITIQ_FUSED_FORCE", "0")
    cfg_ref = rawiq_seg64_mp_config("reference")
    out_ref = make_forward(cfg_ref)(params, xb, train=False)
    agree = float((out_fused.argmax(-1) == out_ref.argmax(-1)).mean())
    assert agree == 1.0
    assert float(jnp.abs(out_fused.astype(jnp.float32) - out_ref).max()) < 0.05
