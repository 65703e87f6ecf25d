"""Fused TRAINING layer (Pallas fwd + Pallas bwd, in-kernel dropout):
correctness vs the XLA autodiff path in interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vitiq.models import layers as L
from vitiq.ops.numerics import REFERENCE
from vitiq.ops.pallas.fused_layer_train import fused_train_layer_stack


def _xla_layer(params, x, n_head):
    return L.encoder_layer_apply(params, x, n_head=n_head, drop_prob=0.0,
                                 rng=None, train=False, policy=REFERENCE)


@pytest.mark.parametrize("Lx,n_head", [(17, 4), (129, 8)])
def test_forward_matches_xla_nodrop(Lx, n_head):
    rng = np.random.default_rng(0)
    params = L.encoder_layer_init(jax.random.PRNGKey(0), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)
    want = np.asarray(_xla_layer(params, x, n_head))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_train_layer_stack(x, [params], n_head, 0.0, 7))
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.parametrize("knobs", [
    {},  # defaults: PB=recompute, EPI=wide
    {"VITIQ_TRAIN_PB": "reuse"},
    {"VITIQ_TRAIN_EPI": "head"},
    {"VITIQ_TRAIN_DW": "merged"},
    {"VITIQ_TRAIN_DW": "batched"},
    # stash fwd/bwd pair: fwd emits [attn|xh1|xh2|pbar]+[r1|r2], bwd skips
    # the attention/LN/FFN2 recompute (w_k bias grads are exactly zero in
    # exact arithmetic — softmax shift invariance — so the assert below
    # tolerating small-magnitude noise matters for this knob)
    {"VITIQ_TRAIN_STASH": "1"},
    # stash is the AUTO default at Lp<=64, so pin the recompute backward
    # explicitly to keep it covered at small Lp too
    {"VITIQ_TRAIN_STASH": "0"},
    # the per-head chain inside stash mode (fullprod is the default there)
    {"VITIQ_TRAIN_STASH": "1", "VITIQ_TRAIN_ATTNBWD": "chain"},
    # fullprod at a non-trivial head grouping
    {"VITIQ_TRAIN_STASH": "1", "VITIQ_TRAIN_FPG": "2"},
    # fullprod with the narrow per-head softmax backward (wide is default)
    {"VITIQ_TRAIN_STASH": "1", "VITIQ_TRAIN_FPV": "head"},
    # the chain stash FORWARD (xpack fwd is the default in-regime)
    {"VITIQ_TRAIN_STASH": "1", "VITIQ_TRAIN_FWD": "chain"},
    # fullprod WITHOUT the block-diagonal dP/dQ scratch (auto=blk at Lp<=32)
    {"VITIQ_TRAIN_FPA": "0"},
    # the blk scratch forced (covers it at the Lp=136 two-tile geometry too)
    {"VITIQ_TRAIN_FPA": "blk"},
    # packed dW full product (round 3ar): p1 packs [x|attn|x1]^T@[dqkv|da|
    # dpre]; full folds dw2 in; 0 pins the four separate per-site GEMMs
    {"VITIQ_TRAIN_DWPACK": "p1"},
    {"VITIQ_TRAIN_DWPACK": "full"},
    {"VITIQ_TRAIN_DWPACK": "0"},
    {"VITIQ_TRAIN_STASH": "0", "VITIQ_TRAIN_DWPACK": "p1"},
    # round 3aw: the packed cross-head core in the RECOMPUTE regime —
    # forward kernel (RFWD), backward recompute (RBWD), and both composed
    {"VITIQ_TRAIN_STASH": "0", "VITIQ_TRAIN_RFWD": "xpack"},
    {"VITIQ_TRAIN_STASH": "0", "VITIQ_TRAIN_RBWD": "xpack"},
    {"VITIQ_TRAIN_STASH": "0", "VITIQ_TRAIN_RFWD": "xpack",
     "VITIQ_TRAIN_RBWD": "xpack"},
], ids=["default", "pb_reuse", "epi_head", "dw_merged", "dw_batched",
        "stash", "recompute", "stash_chain", "stash_fpg2", "stash_fpvhead",
        "stash_fwdchain", "fpa_off", "fpa_blk", "dwpack_p1", "dwpack_full",
        "dwpack_off", "dwpack_recompute", "rfwd_xpack", "rbwd_xpack",
        "rcore_xpack"])
@pytest.mark.parametrize("Lx,n_head", [(17, 4), (129, 8)])
def test_gradients_match_autodiff_nodrop(Lx, n_head, knobs, monkeypatch):
    """dx and every weight gradient vs jax autodiff of the XLA layer —
    exercised for every backward env knob (VITIQ_TRAIN_PB=reuse caches
    probability tiles; VITIQ_TRAIN_EPI=head is the non-wide epilogue), so
    the gated paths stay correct in CI, like the serving VITIQ_V3_* knobs."""
    for k, v in knobs.items():
        monkeypatch.setenv(k, v)
    rng = np.random.default_rng(1)
    params = L.encoder_layer_init(jax.random.PRNGKey(1), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)

    def loss_ref(params, x):
        return jnp.sum((_xla_layer(params, x, n_head) - tgt) ** 2)

    def loss_fused(params, x):
        y = fused_train_layer_stack(x, [params], n_head, 0.0, 7)
        return jnp.sum((y - tgt) ** 2)

    (ref_l, (ref_gp, ref_gx)) = (loss_ref(params, x),
                                 jax.grad(loss_ref, argnums=(0, 1))(params, x))
    with pltpu.force_tpu_interpret_mode():
        fused_l = loss_fused(params, x)
        got_gp, got_gx = jax.grad(loss_fused, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(float(fused_l), float(ref_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx),
                               atol=2e-3, rtol=1e-3)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_gp)
    flat_got = jax.tree_util.tree_leaves(got_gp)
    for (path, a), b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=1e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("Lx", [129, 133])
def test_gradients_match_with_tail_keys(Lx, monkeypatch):
    """VITIQ_TRAIN_TAIL=1: the packed cross-head tail path (fwd corrections +
    bwd rank-1 gradient terms) must reproduce the autodiff gradients exactly
    like the tile-only path. Gated off by default — the serving A/B measured
    the remainder tile free on v5e — but kept correct."""
    monkeypatch.setenv("VITIQ_TRAIN_TAIL", "1")
    rng = np.random.default_rng(23)
    params = L.encoder_layer_init(jax.random.PRNGKey(9), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)

    def loss_ref(params, x):
        return jnp.sum((_xla_layer(params, x, 8) - tgt) ** 2)

    def loss_fused(params, x):
        y = fused_train_layer_stack(x, [params], 8, 0.0, 7)
        return jnp.sum((y - tgt) ** 2)

    ref_gp, ref_gx = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        got_gp, got_gx = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx),
                               atol=2e-3, rtol=1e-3)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_gp)
    flat_got = jax.tree_util.tree_leaves(got_gp)
    for (path, a), b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=1e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_dropout_masks_deterministic():
    """Same seed -> identical output; dropout on vs off differs. (Seed
    SENSITIVITY cannot be asserted here: interpret-mode prng_random_bits
    ignores prng_seed — verified empirically — so distinct-seed divergence is
    checked on hardware by scripts/tpu_check_train.py instead.)"""
    params = L.encoder_layer_init(jax.random.PRNGKey(2), 128, 256)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 17, 128)),
                    jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(fused_train_layer_stack(x, [params], 4, 0.3, 11))
        b = np.asarray(fused_train_layer_stack(x, [params], 4, 0.3, 11))
        d = np.asarray(fused_train_layer_stack(x, [params], 4, 0.0, 11))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, d)
    assert np.isfinite(a).all()


def test_dropout_gradient_consistency():
    """With dropout ON, the custom backward regenerates the SAME masks: the
    analytic directional derivative must match finite differences of the
    (deterministic, same-seed) forward."""
    params = L.encoder_layer_init(jax.random.PRNGKey(3), 128, 256)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 17, 128)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((1, 17, 128)), jnp.float32)

    def loss(x):
        y = fused_train_layer_stack(x, [params], 4, 0.25, 21)
        # mean (not sum): keeps the loss O(1) so the f32 central difference
        # isn't destroyed by cancellation (sum-loss FD noise measured ~0.3)
        return jnp.mean((y - tgt) ** 2)

    direction = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    direction = direction / jnp.linalg.norm(direction)
    eps = 1e-2
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(x)
        analytic = float(jnp.vdot(g, direction))
        fd = float((loss(x + eps * direction) - loss(x - eps * direction))
                   / (2 * eps))
    assert abs(analytic - fd) < 2e-2 * max(1e-3, abs(fd)), (analytic, fd)


def test_two_layer_stack_chains():
    p1 = L.encoder_layer_init(jax.random.PRNGKey(4), 128, 256)
    p2 = L.encoder_layer_init(jax.random.PRNGKey(5), 128, 256)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 17, 128)),
                    jnp.float32)
    ref = _xla_layer(p1, x, 4)
    ref = np.asarray(_xla_layer(p2, ref, 4))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_train_layer_stack(x, [p1, p2], 4, 0.0, 7))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("lpc", [2, 3])
@pytest.mark.parametrize("Lx", [16, 17])
def test_stacked_lpc_gradients_match_autodiff(Lx, lpc, monkeypatch):
    """VITIQ_TRAIN_LPC>1 chains the per-layer stash-xpack fwd and stash bwd
    bodies through VMEM inside ONE pallas call per chunk (round 3au —
    attacks the 14.3 ms out-of-kernel floor the 3at decomposition measured).
    Layer i>0's backward input is reconstructed from layer i-1's stashed
    LN2 (y = g2*xh2 + be2); this must reproduce autodiff exactly, for both
    even (3 = 2+1 chunks) and whole-stack (3 = one call) splits."""
    monkeypatch.setenv("VITIQ_TRAIN_LPC", str(lpc))
    n_head = 8
    plist = [L.encoder_layer_init(jax.random.PRNGKey(i), 128, 256)
             for i in range(3)]
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)

    def xla_stack(plist, x):
        for p in plist:
            x = _xla_layer(p, x, n_head)
        return x

    def loss_ref(plist, x):
        return jnp.sum((xla_stack(plist, x) - tgt) ** 2)

    def loss_fused(plist, x):
        y = fused_train_layer_stack(x, plist, n_head, 0.0, 7)
        return jnp.sum((y - tgt) ** 2)

    ref_l = loss_ref(plist, x)
    ref_gp, ref_gx = jax.grad(loss_ref, argnums=(0, 1))(plist, x)
    with pltpu.force_tpu_interpret_mode():
        fused_l = loss_fused(plist, x)
        got_gp, got_gx = jax.grad(loss_fused, argnums=(0, 1))(plist, x)
    np.testing.assert_allclose(float(fused_l), float(ref_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx),
                               atol=2e-3, rtol=1e-3)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_gp)
    flat_got = jax.tree_util.tree_leaves(got_gp)
    for (path, a), b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=1e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_stacked_lpc_accumulates_across_grid_blocks(monkeypatch):
    """Stacked-call weight-grad accumulators must survive multiple grid
    steps, like the per-layer path's (batch 40 > G forces a multi-step
    grid in interpreter mode too)."""
    monkeypatch.setenv("VITIQ_TRAIN_LPC", "2")
    monkeypatch.setenv("VITIQ_TRAIN_G", "8")
    n_head = 8
    plist = [L.encoder_layer_init(jax.random.PRNGKey(i), 128, 256)
             for i in range(2)]
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((40, 16, 128)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((40, 16, 128)), jnp.float32)

    def loss_ref(plist):
        y = x
        for p in plist:
            y = _xla_layer(p, y, n_head)
        return jnp.mean((y - tgt) ** 2)

    def loss_fused(plist):
        y = fused_train_layer_stack(x, plist, n_head, 0.0, 7)
        return jnp.mean((y - tgt) ** 2)

    ref_g = jax.grad(loss_ref)(plist)
    with pltpu.force_tpu_interpret_mode():
        got_g = jax.grad(loss_fused)(plist)
    for a, b in zip(jax.tree_util.tree_leaves(got_g),
                    jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_lpc_mode_gating(monkeypatch):
    """Forced LPC only engages where the stacked wrappers are correct
    (stash regime + xpack fwd + no tail + dwpack 0 + n_head*Lp<=512);
    auto stays 1 pending the on-chip ladder."""
    monkeypatch.delenv("VITIQ_TRAIN_LPC", raising=False)
    from vitiq.ops.pallas.fused_layer_train import _lpc_mode
    assert _lpc_mode(6, 16, 16, 8, 128, 2) == 1          # auto = per-layer
    monkeypatch.setenv("VITIQ_TRAIN_LPC", "3")
    assert _lpc_mode(6, 16, 16, 8, 128, 2) == 3          # forced, eligible
    assert _lpc_mode(6, 144, 129, 8, 128, 2) == 1        # big Lp: no stash
    monkeypatch.setenv("VITIQ_TRAIN_FWD", "chain")
    assert _lpc_mode(6, 16, 16, 8, 128, 2) == 1          # chain fwd: no
    monkeypatch.delenv("VITIQ_TRAIN_FWD", raising=False)
    monkeypatch.setenv("VITIQ_TRAIN_DWPACK", "p1")
    assert _lpc_mode(6, 16, 16, 8, 128, 2) == 1          # dwpack: no


def test_rcore_xpack_gating(monkeypatch):
    """The recompute-regime packed core (round 3aw) engages only where
    structurally supported: no tail mode, n_head*Lp<=1280, and (RBWD) the
    fullprod gradient loop; auto stays chain pending the chip ladder."""
    from vitiq.ops.pallas.fused_layer_train import _rcore_xpack
    for k in ("VITIQ_TRAIN_RFWD", "VITIQ_TRAIN_RBWD", "VITIQ_TRAIN_TAIL",
              "VITIQ_TRAIN_ATTNBWD"):
        monkeypatch.delenv(k, raising=False)
    assert not _rcore_xpack("RFWD", 144, 129, 8, 128)     # auto = chain
    monkeypatch.setenv("VITIQ_TRAIN_RFWD", "xpack")
    assert _rcore_xpack("RFWD", 144, 129, 8, 128)         # flagship shape
    assert not _rcore_xpack("RFWD", 1040, 1025, 8, 128)   # conv1d: lanes
    monkeypatch.setenv("VITIQ_TRAIN_RBWD", "xpack")
    assert _rcore_xpack("RBWD", 144, 129, 8, 128)
    monkeypatch.setenv("VITIQ_TRAIN_ATTNBWD", "chain")
    assert not _rcore_xpack("RBWD", 144, 129, 8, 128)     # needs fullprod
    assert _rcore_xpack("RFWD", 144, 129, 8, 128)         # RFWD unaffected


def test_gradients_accumulate_across_grid_blocks():
    """Weight grads accumulate in VMEM scratch across MULTIPLE sequential
    grid steps (the single-block tests can't catch broken cross-block
    accumulation — that bug appeared on hardware first)."""
    n_head = 4
    params = L.encoder_layer_init(jax.random.PRNGKey(6), 128, 256)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((40, 17, 128)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((40, 17, 128)), jnp.float32)

    def loss_ref(params):
        return jnp.mean((_xla_layer(params, x, n_head) - tgt) ** 2)

    def loss_fused(params):
        y = fused_train_layer_stack(x, [params], n_head, 0.0, 7)
        return jnp.mean((y - tgt) ** 2)

    ref_g = jax.grad(loss_ref)(params)
    with pltpu.force_tpu_interpret_mode():
        got_g = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(got_g),
                    jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


class TestLongSequenceEligibility:
    """Round-3f regression: conv1d training (1025 tokens) must NOT route to
    the fused train kernels — their backward's scoped-VMEM stack measured
    65.25 MB vs the 16 MB limit on chip (hard compile error). The encoder
    gates on fused_train_supported and takes the XLA train path instead."""

    def test_supported_predicate(self):
        from vitiq.ops.pallas.fused_layer_train import fused_train_supported

        assert fused_train_supported(129, 128, 512)    # flagship ViT
        assert fused_train_supported(65, 128, 1024)    # rawIQ seg-16
        assert not fused_train_supported(1025, 128, 1024)  # conv1d

    def test_conv1d_train_routes_to_xla(self, monkeypatch):
        """With the fused family forced on, a conv1d TRAIN forward must not
        touch fused_train_layer_stack (the flagship control proves the
        monkeypatch tripwire works)."""
        from vitiq import models as M
        from vitiq.config import ModelConfig
        from vitiq.models import encoder as enc
        import vitiq.ops.pallas.fused_layer_train as flt

        def boom(*a, **k):
            raise AssertionError("fused train stack reached at 1025 tokens")

        monkeypatch.setenv("VITIQ_FUSED_FORCE", "1")
        monkeypatch.setattr(flt, "fused_train_layer_stack", boom)

        cfg = ModelConfig(arm="rawiq", num_classes=3, d_model=128, n_head=8,
                          n_layers=1, ffn_hidden=1024, drop_prob=0.1,
                          embedding_type="conv1d", seq_length=1024,
                          numerics="tpu")
        params = M.init_amc_params(jax.random.PRNGKey(0), cfg)
        fwd = M.make_forward(cfg)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 2, 1024)), jnp.float32)
        out = fwd(params, x, train=True, rng=jax.random.PRNGKey(1))
        assert out.shape == (2, 3)

        # control: the flagship (129 tokens) DOES reach the fused stack
        vit = ModelConfig(arm="vit", num_classes=3, d_model=128, n_head=8,
                          n_layers=1, ffn_hidden=512, drop_prob=0.1,
                          patch_size=4, numerics="tpu")
        vparams = M.init_amc_params(jax.random.PRNGKey(0), vit)
        vx = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 1, 32, 64)), jnp.float32)
        with pytest.raises(Exception, match="fused train stack reached"):
            M.make_forward(vit)(vparams, vx, train=True,
                                rng=jax.random.PRNGKey(1))

    def test_remat_training_grads_identical(self, monkeypatch):
        """jax.checkpoint on the fallback layer loop (long-sequence training)
        must be semantics-preserving: grads with VITIQ_TRAIN_REMAT=1 match
        the un-remat'd path exactly."""
        from vitiq import models as M
        from vitiq.config import ModelConfig

        cfg = ModelConfig(arm="rawiq", num_classes=3, d_model=32, n_head=4,
                          n_layers=2, ffn_hidden=64, drop_prob=0.0,
                          embedding_type="segment", segment_size=16,
                          seq_length=64, numerics="reference")
        params = M.init_amc_params(jax.random.PRNGKey(0), cfg)
        fwd = M.make_forward(cfg)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (4, 2, 64)), jnp.float32)

        def loss(p, remat):
            monkeypatch.setenv("VITIQ_TRAIN_REMAT", remat)
            return jnp.sum(fwd(p, x, train=True,
                               rng=jax.random.PRNGKey(1)) ** 2)

        g0 = jax.grad(lambda p: loss(p, "0"))(params)
        g1 = jax.grad(lambda p: loss(p, "1"))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pick_g_measured_defaults(monkeypatch):
    """Lock the on-chip-measured block-size defaults (docs/BENCHMARKS.md
    rounds 3o/3p): Lp<=16 gets the extended ladder capped at G=24 (G=32's
    real VMEM footprint is batch-sensitive — compiled @2048, OOMed @8192;
    G=48 hard-OOMs), larger Lp keeps the conservative ladder."""
    monkeypatch.delenv("VITIQ_TRAIN_G", raising=False)
    from vitiq.ops.pallas.fused_layer_train import _pick_g
    assert _pick_g(16, 128, 1024, 2) == 24   # seg-64 mean-pool
    assert _pick_g(32, 128, 1024, 2) == 8    # seg-64 CLS — unextended
    assert _pick_g(144, 128, 512, 2) == 2    # flagship ViT
    monkeypatch.setenv("VITIQ_TRAIN_G", "7")
    assert _pick_g(16, 128, 1024, 2) == 7    # env override wins


def test_stash_gate_and_picker(monkeypatch):
    """Lock the measured stash auto-gate + G defaults (docs/BENCHMARKS.md
    rounds 3y-3aa): auto = on at Lp<=32 where the on-chip A/B won (Lp=16
    +13%, CLS +5.4%), off at the measured-neutral/negative big-Lp points
    (flagship Lp=80 neutral, vit Lp=144 -22%); stash at Lp<=16 rides the
    G=40 ladder rung its lighter backward unlocked."""
    monkeypatch.delenv("VITIQ_TRAIN_G", raising=False)
    monkeypatch.delenv("VITIQ_TRAIN_STASH", raising=False)
    from vitiq.ops.pallas.fused_layer_train import (
        _pick_g, _stash_enabled, _stash_supported)
    # supported: no tail mode + packed probs lane cap (1280)
    assert _stash_supported(16, 16, 8)
    assert _stash_supported(144, 129, 8)     # flagship vit: 1152 lanes
    assert not _stash_supported(144, 129, 16)  # 2304 lanes — over the cap
    # auto gate: measured-win regime only (Lp=16/32/64 win on chip)
    assert _stash_enabled(16, 16, 8, 128)
    assert _stash_enabled(32, 17, 8, 128)
    assert _stash_enabled(64, 64, 8, 128)    # seg-16 mean-pool: +30%
    # flagship Lp=80: round-3 "neutral" was the per-call fetch tax; the
    # round-4 amortized ladder measured +14%/+11.6% at batch 2048/8192
    assert _stash_enabled(80, 65, 8, 128)
    # d>128: stash residuals are HBM-resident per layer — the d256/L9 arm
    # measured an HBM OOM at batch 8192 but a +13.7% win at batch 4096
    # (round-4 batch-matched A/B), so auto is BATCH-gated there; callers
    # that don't know the batch stay conservative
    assert not _stash_enabled(64, 64, 8, 256)
    assert not _stash_enabled(64, 64, 8, 256, batch=8192)
    assert _stash_enabled(64, 64, 8, 256, batch=4096)
    assert not _stash_enabled(80, 65, 8, 256, batch=4096)  # CLS Lp=80: compile wall
    monkeypatch.setenv("VITIQ_TRAIN_STASH", "1")
    assert _stash_enabled(80, 65, 8, 128)    # forceable
    monkeypatch.setenv("VITIQ_TRAIN_STASH", "0")
    assert not _stash_enabled(16, 16, 8, 128)
    monkeypatch.delenv("VITIQ_TRAIN_STASH", raising=False)
    # picker: the stash ladders (G=40/16/8 at Lp<=16/32/64, D<=128 —
    # rounds 3y-3ad); recompute ladder unchanged; D>128 stays conservative
    assert _pick_g(16, 128, 1024, 2, stash=True) == 40
    assert _pick_g(16, 128, 1024, 2, stash=False) == 24
    assert _pick_g(32, 128, 1024, 2, stash=True) == 16
    assert _pick_g(64, 128, 1024, 2, stash=True) == 8
    assert _pick_g(64, 256, 1024, 2, stash=True) < 8
