"""Train-path xpack kernels (cross-head packed attention + counter-based
dropout): correctness vs XLA autodiff in interpreter mode, including the
decoupled-G dropout contract the module exists to enable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vitiq.models import layers as L
from vitiq.ops.numerics import REFERENCE
from vitiq.ops.pallas.fused_layer_train import _round_up
from vitiq.ops.pallas.train_xpack import (
    _hash_mask,
    _site_salt,
    fused_train_layer_stack_xpack,
    xpack_train_supported,
)

LN_EPS = 1e-12


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
        got = np.asarray(
            fused_train_layer_stack_xpack(x, [params], n_head, 0.0, 7))
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.parametrize("Lx,n_head", [(17, 4), (129, 8)])
def test_gradients_match_autodiff_nodrop(Lx, n_head):
    rng = np.random.default_rng(1)
    params = L.encoder_layer_init(jax.random.PRNGKey(1), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, Lx, 128)), jnp.float32)

    def loss_ref(params, x):
        return jnp.sum((_xla_layer(params, x, n_head) - tgt) ** 2)

    def loss_fused(params, x):
        y = fused_train_layer_stack_xpack(x, [params], n_head, 0.0, 7)
        return jnp.sum((y - tgt) ** 2)

    ref_l = loss_ref(params, x)
    ref_gp, ref_gx = jax.grad(loss_ref, argnums=(0, 1))(params, x)
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


def test_two_layer_stack_matches_xla():
    rng = np.random.default_rng(5)
    p0 = L.encoder_layer_init(jax.random.PRNGKey(2), 128, 256)
    p1 = L.encoder_layer_init(jax.random.PRNGKey(3), 128, 256)
    x = jnp.asarray(rng.standard_normal((3, 33, 128)), jnp.float32)
    want = np.asarray(_xla_layer(p1, _xla_layer(p0, x, 8), 8))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_train_layer_stack_xpack(x, [p0, p1], 8, 0.0, 11))
    np.testing.assert_allclose(got, want, atol=6e-5)


def _ref_layer_with_masks(params, x, n_head, masks):
    """Reference-numerics encoder layer with EXPLICIT dropout multipliers —
    replicates the kernel's math (softmax attention, post-norm eps=1e-12
    biased-variance LN, ReLU FFN, dropout before residual) so the kernels'
    hash masks can be checked end-to-end through autodiff."""
    m1, m2, m3 = masks
    ap = params["attention"]

    def lin(p, v):
        return v @ p["kernel"] + p["bias"]

    B, Lx, D = x.shape
    dh = D // n_head
    q = lin(ap["w_q"], x).reshape(B, Lx, n_head, dh).transpose(0, 2, 1, 3)
    k = lin(ap["w_k"], x).reshape(B, Lx, n_head, dh).transpose(0, 2, 1, 3)
    v = lin(ap["w_v"], x).reshape(B, Lx, n_head, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (dh ** 0.5)
    p = jax.nn.softmax(s, axis=-1)
    attn = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3)
    attn = attn.reshape(B, Lx, D)
    a = lin(ap["w_concat"], attn) * m1

    def ln(z, np_):
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
        return np_["gamma"] * (z - mu) * jax.lax.rsqrt(var + LN_EPS) + np_["beta"]

    x1 = ln(a + x, params["norm1"])
    h = jnp.maximum(lin(params["ffn"]["linear1"], x1), 0.0) * m2
    f = lin(params["ffn"]["linear2"], h) * m3
    return ln(f + x1, params["norm2"])


@pytest.mark.parametrize("gf,gb", [("0", "0"), ("2", "1")],
                         ids=["auto_g", "decoupled_g"])
def test_dropout_grads_match_mask_replica(gf, gb, monkeypatch):
    """With drop>0, forward AND gradients must match an XLA replica that
    applies the same hash-derived masks explicitly — proving (a) the mask
    hash is position-stable, (b) fwd and bwd regenerate identical masks,
    and (c) they keep doing so when fwd and bwd use DIFFERENT grid block
    sizes (the decoupling the counter-based design exists for)."""
    monkeypatch.setenv("VITIQ_TXP_GF", gf)
    monkeypatch.setenv("VITIQ_TXP_GB", gb)
    drop, seed, n_head, Lx, D = 0.25, 99, 4, 17, 128
    rng = np.random.default_rng(7)
    params = L.encoder_layer_init(jax.random.PRNGKey(4), D, 256)
    x = jnp.asarray(rng.standard_normal((3, Lx, D)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((3, Lx, D)), jnp.float32)

    Lp = _round_up(Lx, 8)  # f32 sublane
    masks = []
    for site, w in ((0, D), (1, 256), (2, D)):
        m = _hash_mask((3, Lp, w), drop, jnp.int32(seed),
                       _site_salt(0, site), jnp.int32(0))
        masks.append(m[:, :Lx, :])

    def loss_ref(params, x):
        y = _ref_layer_with_masks(params, x, n_head, masks)
        return jnp.sum((y - tgt) ** 2)

    def loss_fused(params, x):
        y = fused_train_layer_stack_xpack(x, [params], n_head, drop, seed)
        return jnp.sum((y - tgt) ** 2)

    ref_l = loss_ref(params, x)
    ref_gp, ref_gx = jax.grad(loss_ref, argnums=(0, 1))(params, x)
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


def test_dropout_deterministic_and_seed_sensitive():
    rng = np.random.default_rng(9)
    params = L.encoder_layer_init(jax.random.PRNGKey(5), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, 17, 128)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y1 = np.asarray(fused_train_layer_stack_xpack(x, [params], 4, 0.3, 42))
        y2 = np.asarray(fused_train_layer_stack_xpack(x, [params], 4, 0.3, 42))
        y3 = np.asarray(fused_train_layer_stack_xpack(x, [params], 4, 0.3, 43))
    np.testing.assert_array_equal(y1, y2)
    assert not np.allclose(y1, y3)


def test_hash_mask_statistics():
    """Keep-rate and scaling of the stateless hash mask."""
    m = np.asarray(_hash_mask((64, 32, 128), 0.25, jnp.int32(3),
                              _site_salt(2, 1), jnp.int32(0)))
    kept = m > 0
    assert abs(kept.mean() - 0.75) < 0.01
    np.testing.assert_allclose(m[kept], 1.0 / 0.75, rtol=1e-6)
    # partition independence: shifting batch0 reproduces the tail rows
    a = np.asarray(_hash_mask((8, 16, 64), 0.5, jnp.int32(1),
                              _site_salt(0, 0), jnp.int32(0)))
    b = np.asarray(_hash_mask((4, 16, 64), 0.5, jnp.int32(1),
                              _site_salt(0, 0), jnp.int32(4)))
    np.testing.assert_array_equal(a[4:], b)


def test_supported_geometries():
    assert xpack_train_supported(129, 128, 512, 8)      # flagship
    assert xpack_train_supported(129, 128, 512, 4)      # H4 production
    assert not xpack_train_supported(1025, 128, 1024, 8)  # conv1d: fallback


class TestUnderMesh:
    """Virtual 8-device mesh certification (pattern of test_mesh_fused.py):
    pallas lowers through the GENERIC interpreter, which composes with
    shard_map — and unlike the chained module's TPU-PRNG dropout, the hash
    masks are plain jnp ops, so the DROPOUT path is certifiable here too."""

    @pytest.fixture(autouse=True)
    def _generic_interpret(self, monkeypatch):
        monkeypatch.setenv("VITIQ_PALLAS_INTERPRET", "1")

    def _mesh(self):
        from jax.sharding import Mesh
        return Mesh(np.array(jax.devices()[:8]).reshape(8, 1),
                    ("data", "model"))

    def test_grads_match_autodiff_through_shard_map(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh()
        params = L.encoder_layer_init(jax.random.PRNGKey(3), 128, 256)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((16, 17, 128)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((16, 17, 128)), jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P(("data",))))

        def loss_fused(p, xx):
            sm = jax.shard_map(
                lambda xx_, ll, s: fused_train_layer_stack_xpack(
                    xx_, ll, 8, 0.0, s),
                mesh=mesh, in_specs=(P(("data",)), P(), P()),
                out_specs=P(("data",)), check_vma=False)
            return jnp.mean((sm(xx, [p], jnp.int32(7)) - tgt) ** 2)

        def loss_ref(p, xx):
            y = _xla_layer(p, xx, 8)
            return jnp.mean((y - tgt) ** 2)

        with mesh:
            gp, gx = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(params, xs)
            gp = jax.device_get(gp)
            gx = np.asarray(gx)
        rgp, rgx = jax.grad(loss_ref, argnums=(0, 1))(params, x)
        np.testing.assert_allclose(gx, np.asarray(rgx), atol=1e-4, rtol=1e-3)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(rgp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)

    def test_dropout_is_shard_local_under_shard_map(self):
        """shard_map(stack) must equal per-shard local calls — the hash
        masks are a function of LOCAL batch position + seed, so the sharded
        forward is bit-identical to running each shard alone (the per-shard
        seed fold that decorrelates masks lives one level up, in
        encoder_apply)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh()
        params = L.encoder_layer_init(jax.random.PRNGKey(6), 128, 256)
        x = jnp.asarray(np.random.default_rng(8).standard_normal((16, 17, 128)),
                        jnp.float32)
        sm = jax.shard_map(
            lambda xx_, ll, s: fused_train_layer_stack_xpack(
                xx_, ll, 4, 0.3, s),
            mesh=mesh, in_specs=(P(("data",)), P(), P()),
            out_specs=P(("data",)), check_vma=False)
        with mesh:
            xs = jax.device_put(x, NamedSharding(mesh, P(("data",))))
            got = np.asarray(jax.jit(sm)(xs, [params], jnp.int32(21)))
        want = np.concatenate([
            np.asarray(fused_train_layer_stack_xpack(
                x[i * 2:(i + 1) * 2], [params], 4, 0.3, 21))
            for i in range(8)])
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("attn", ["xpack", "auto"])
def test_stack_env_dispatch(attn, monkeypatch):
    """fused_train_layer_stack must route through the xpack train kernels
    under VITIQ_TRAIN_ATTN={xpack,auto} (auto gates on VMEM fit) — the
    env-only switch the TPU A/B rides. At drop=0 the two cores are
    numerically identical."""
    from vitiq.ops.pallas.fused_layer_train import fused_train_layer_stack

    rng = np.random.default_rng(9)
    params = L.encoder_layer_init(jax.random.PRNGKey(7), 128, 256)
    x = jnp.asarray(rng.standard_normal((2, 17, 128)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        direct = np.asarray(
            fused_train_layer_stack_xpack(x, [params], 4, 0.0, 7))
        monkeypatch.setenv("VITIQ_TRAIN_ATTN", attn)
        routed = np.asarray(
            fused_train_layer_stack(x, [params], 4, 0.0, 7))
    np.testing.assert_array_equal(routed, direct)
