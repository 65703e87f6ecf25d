"""Numerics tests for the shared transformer core against independent
references: hand-written numpy formulae and (where semantics are identical
built-ins) torch functional ops.

These encode the reference's exact semantics from SURVEY.md §2.2 — post-norm,
biased-variance LN with eps=1e-12, ReLU FFN, -10000 mask fill — at atol 1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitiq.models import layers as L
from vitiq.models import embeddings as emb
from vitiq.ops.attention import scaled_dot_product_attention
from vitiq.ops.numerics import REFERENCE


def rand(rng, *shape):
    return np.asarray(rng.standard_normal(shape), dtype=np.float32)


class TestLayerNorm:
    def test_matches_numpy_biased_variance(self):
        rng = np.random.default_rng(0)
        x = rand(rng, 4, 7, 16)
        params = L.layer_norm_init(16)
        got = np.asarray(L.layer_norm_apply(params, jnp.asarray(x)))
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)  # numpy default ddof=0 == unbiased=False
        want = (x - mean) / np.sqrt(var + 1e-12)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_affine_params_applied(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rand(rng, 2, 3, 8))
        params = {"gamma": jnp.full((8,), 2.0), "beta": jnp.full((8,), -1.0)}
        base = L.layer_norm_apply(L.layer_norm_init(8), x)
        got = L.layer_norm_apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(2.0 * base - 1.0), atol=1e-5)

    def test_matches_torch_layernorm_eps(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        x = rand(rng, 5, 9, 32)
        params = L.layer_norm_init(32)
        got = np.asarray(L.layer_norm_apply(params, jnp.asarray(x)))
        want = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (32,), eps=1e-12
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestAttention:
    @staticmethod
    def numpy_attention(q, k, v, mask=None):
        d = q.shape[-1]
        score = q @ np.swapaxes(k, -1, -2) / np.sqrt(d)
        if mask is not None:
            score = np.where(mask == 0, -10000.0, score)
        score = score - score.max(-1, keepdims=True)
        p = np.exp(score)
        p /= p.sum(-1, keepdims=True)
        return p @ v

    def test_matches_numpy(self):
        rng = np.random.default_rng(3)
        q, k, v = (rand(rng, 2, 4, 9, 16) for _ in range(3))
        got = np.asarray(scaled_dot_product_attention(*map(jnp.asarray, (q, k, v))))
        np.testing.assert_allclose(got, self.numpy_attention(q, k, v), atol=1e-5)

    def test_mask_uses_minus_10000(self):
        """Reference fills masked scores with -10000, not -inf
        (scale_dot_product_attention.py:31): masked positions keep a tiny,
        non-zero probability."""
        rng = np.random.default_rng(4)
        q, k, v = (rand(rng, 1, 1, 4, 8) for _ in range(3))
        mask = np.ones((1, 1, 4, 4), dtype=np.float32)
        mask[..., -1] = 0
        got = np.asarray(
            scaled_dot_product_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask=jnp.asarray(mask)
            )
        )
        want = self.numpy_attention(q, k, v, mask)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_softmax_rows_sum_to_one(self):
        rng = np.random.default_rng(5)
        q, k, v = (jnp.asarray(rand(rng, 2, 2, 5, 4)) for _ in range(3))
        _, scores = scaled_dot_product_attention(q, k, v, return_scores=True)
        np.testing.assert_allclose(np.asarray(scores.sum(-1)), 1.0, atol=1e-6)


class TestMHA:
    def test_matches_numpy_composition(self):
        rng = np.random.default_rng(6)
        d_model, n_head = 32, 4
        x = rand(rng, 3, 7, d_model)
        params = L.mha_init(jax.random.PRNGKey(0), d_model)
        got = np.asarray(L.mha_apply(params, jnp.asarray(x), n_head))

        def lin(p, t):
            return t @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

        q = lin(params["w_q"], x)
        k = lin(params["w_k"], x)
        v = lin(params["w_v"], x)
        B, Lx, D = x.shape
        dh = D // n_head
        sp = lambda t: t.reshape(B, Lx, n_head, dh).transpose(0, 2, 1, 3)
        out = TestAttention.numpy_attention(sp(q), sp(k), sp(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, Lx, D)
        want = lin(params["w_concat"], out)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_single_head_equals_unsplit(self):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rand(rng, 2, 5, 16))
        params = L.mha_init(jax.random.PRNGKey(1), 16)
        one = L.mha_apply(params, x, n_head=1)
        assert one.shape == (2, 5, 16)


class TestFFNAndEncoderLayer:
    def test_ffn_is_relu_not_gelu(self):
        rng = np.random.default_rng(8)
        x = rand(rng, 2, 3, 8)
        params = L.ffn_init(jax.random.PRNGKey(2), 8, 16)
        got = np.asarray(L.ffn_apply(params, jnp.asarray(x), 0.0, None, False))
        h = x @ np.asarray(params["linear1"]["kernel"]) + np.asarray(params["linear1"]["bias"])
        h = np.maximum(h, 0.0)
        want = h @ np.asarray(params["linear2"]["kernel"]) + np.asarray(params["linear2"]["bias"])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_post_norm_ordering(self):
        """x = norm1(attn + x); x = norm2(ffn + x) — output of every encoder
        layer is LayerNorm'd, so per-feature mean ~= beta = 0."""
        rng = np.random.default_rng(9)
        x = jnp.asarray(rand(rng, 2, 6, 16))
        params = L.encoder_layer_init(jax.random.PRNGKey(3), 16, 32)
        out = np.asarray(L.encoder_layer_apply(params, x, n_head=4, drop_prob=0.0,
                                               rng=None, train=False))
        np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(out.var(-1), 1.0, atol=1e-4)

    def test_encoder_layer_full_composition(self):
        rng = np.random.default_rng(10)
        d, h, nh = 16, 64, 4
        x = rand(rng, 2, 5, d)
        params = L.encoder_layer_init(jax.random.PRNGKey(4), d, h)
        got = np.asarray(
            L.encoder_layer_apply(params, jnp.asarray(x), n_head=nh, drop_prob=0.0,
                                  rng=None, train=False)
        )

        def lin(p, t):
            return t @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

        def ln(p, t):
            m = t.mean(-1, keepdims=True)
            v = t.var(-1, keepdims=True)
            return np.asarray(p["gamma"]) * (t - m) / np.sqrt(v + 1e-12) + np.asarray(p["beta"])

        ap = params["attention"]
        q, k, v = lin(ap["w_q"], x), lin(ap["w_k"], x), lin(ap["w_v"], x)
        B, Lx, D = x.shape
        dh = D // nh
        sp = lambda t: t.reshape(B, Lx, nh, dh).transpose(0, 2, 1, 3)
        attn = TestAttention.numpy_attention(sp(q), sp(k), sp(v))
        attn = lin(ap["w_concat"], attn.transpose(0, 2, 1, 3).reshape(B, Lx, D))
        x1 = ln(params["norm1"], attn + x)
        f = lin(params["ffn"]["linear1"], x1)
        f = np.maximum(f, 0.0)
        f = lin(params["ffn"]["linear2"], f)
        want = ln(params["norm2"], f + x1)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestDropout:
    def test_eval_identity(self):
        x = jnp.ones((4, 4))
        out = L.dropout(x, 0.5, None, train=False)
        np.testing.assert_array_equal(np.asarray(out), np.ones((4, 4)))

    def test_train_scales_by_keep_prob(self):
        x = jnp.ones((1000,))
        out = np.asarray(L.dropout(x, 0.25, jax.random.PRNGKey(0), train=True))
        kept = out[out != 0]
        np.testing.assert_allclose(kept, 1.0 / 0.75, atol=1e-6)
        assert abs((out != 0).mean() - 0.75) < 0.05

    def test_zero_rate_is_identity_in_train(self):
        x = jnp.ones((8,))
        out = L.dropout(x, 0.0, jax.random.PRNGKey(0), train=True)
        np.testing.assert_array_equal(np.asarray(out), np.ones((8,)))


class TestEmbeddings:
    def test_fold_patches_matches_torch_conv2d(self):
        """fold + matmul must equal Conv2d(kernel=p, stride=p) exactly."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(11)
        B, C, H, W, p, d = 2, 1, 32, 64, 4, 8
        x = rand(rng, B, C, H, W)
        w = rand(rng, d, C, p, p)
        b = rand(rng, d)
        want = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=p
        )
        want = want.flatten(2).transpose(1, 2).numpy()  # (B, N, d)
        params = {"proj": {"kernel": jnp.asarray(w.reshape(d, -1).T), "bias": jnp.asarray(b)}}
        got = np.asarray(emb.patch_embed_2d_apply(params, jnp.asarray(x), p))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_fold_segments_matches_torch_conv1d(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(12)
        B, C, Lx, s, d = 2, 2, 64, 16, 8
        x = rand(rng, B, C, Lx)
        w = rand(rng, d, C, s)
        b = rand(rng, d)
        want = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=s
        ).transpose(1, 2).numpy()
        params = {"proj": {"kernel": jnp.asarray(w.reshape(d, -1).T), "bias": jnp.asarray(b)}}
        got = np.asarray(emb.sequence_embed_apply(params, jnp.asarray(x), "segment", s))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_conv1d_mode_is_pointwise(self):
        rng = np.random.default_rng(13)
        x = rand(rng, 2, 2, 10)
        params = emb.sequence_embed_init(jax.random.PRNGKey(5), 2, 6, "conv1d")
        got = np.asarray(emb.sequence_embed_apply(params, jnp.asarray(x), "conv1d", None))
        want = x.transpose(0, 2, 1) @ np.asarray(params["proj"]["kernel"]) + np.asarray(
            params["proj"]["bias"]
        )
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert got.shape == (2, 10, 6)

    def test_sinusoidal_encoding_formula(self):
        """encoding[p, 2i] = sin(p / 10000^(2i/d)); [p, 2i+1] = cos(same)."""
        d, n = 16, 10
        enc = np.asarray(emb.sinusoidal_encoding(n, d))
        pos = np.arange(n)[:, None]
        denom = np.power(10000.0, np.arange(0, d, 2) / d)
        np.testing.assert_allclose(enc[:, 0::2], np.sin(pos / denom), atol=1e-6)
        np.testing.assert_allclose(enc[:, 1::2], np.cos(pos / denom), atol=1e-6)

    def test_pe_length_check(self):
        x = jnp.zeros((1, 12, 8))
        with pytest.raises(ValueError):
            emb.add_positional_encoding(x, max_len=10)
