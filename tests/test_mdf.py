"""MDF-NET multi-domain CNN-LSTM tests (ref: ViT/MDF_NET.ipynb cells 7/16/19).

The reference's `CNN_LSTM_new` module is missing from its tree, so these test
the reconstruction's CONTRACT: the notebook's factory signature, the cell-7
input transform semantics, three-input forward, dropout train/eval behavior,
and end-to-end trainability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vitiq.dsp import preprocess_batch_mdf
from vitiq.models import create_multi_domain_model


def _inputs(B=4, rng=0):
    x = jnp.asarray(np.random.default_rng(rng).standard_normal(
        (B, 1024, 2)), jnp.float32)
    return preprocess_batch_mdf(x)


def test_mdf_transform_contract():
    """Cell-7 semantics: amp image is per-sample max-scaled (max == 1),
    phase image lies in [-1, 1], iq passes through untouched."""
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (5, 1024, 2)), jnp.float32)
    amp, phase, iq = preprocess_batch_mdf(x)
    assert amp.shape == (5, 1, 32, 32) and phase.shape == (5, 1, 32, 32)
    np.testing.assert_allclose(
        np.asarray(amp).reshape(5, -1).max(axis=1), 1.0, atol=1e-6)
    assert float(jnp.min(phase)) >= -1.0 and float(jnp.max(phase)) <= 1.0
    np.testing.assert_array_equal(np.asarray(iq), np.asarray(x))
    with pytest.raises(ValueError):
        preprocess_batch_mdf(x[:, :1000, :])
    # stats path: notebook cell-7 semantics — z-score first, then amp/phase
    stats = {"i_mean": 0.5, "i_std": 2.0, "q_mean": -0.25, "q_std": 0.5}
    amp_s, phase_s, iq_s = preprocess_batch_mdf(x, stats=stats)
    want_iq = np.stack([(np.asarray(x)[..., 0] - 0.5) / 2.0,
                        (np.asarray(x)[..., 1] + 0.25) / 0.5], -1)
    np.testing.assert_allclose(np.asarray(iq_s), want_iq, rtol=1e-6)
    assert not np.allclose(np.asarray(amp_s), np.asarray(amp))
    # dataset-level amp_max (the notebook's amp_all.max() scalar): amplitude
    # divides by THAT constant, so cross-frame scale is preserved (frames no
    # longer all peak at 1.0)
    stats_amax = dict(stats, amp_max=7.5)
    amp_g, _, _ = preprocess_batch_mdf(x, stats=stats_amax)
    amp_raw = np.sqrt(want_iq[..., 0] ** 2 + want_iq[..., 1] ** 2)
    np.testing.assert_allclose(np.asarray(amp_g).reshape(5, -1),
                               amp_raw.reshape(5, -1) / 7.5, rtol=1e-5)
    frame_maxes = np.asarray(amp_g).reshape(5, -1).max(axis=1)
    assert frame_maxes.std() > 1e-6  # per-frame peaks differ


def test_mdf_forward_shapes_and_jit():
    init_fn, apply_fn = create_multi_domain_model(num_classes=5)
    params = init_fn(jax.random.PRNGKey(0))
    amp, phase, iq = _inputs()
    logits = jax.jit(lambda p, a, ph, q: apply_fn(p, a, ph, q))(
        params, amp, phase, iq)
    assert logits.shape == (4, 5)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_mdf_dropout_train_vs_eval():
    init_fn, apply_fn = create_multi_domain_model(num_classes=5,
                                                  dropout_rate=0.5)
    params = init_fn(jax.random.PRNGKey(0))
    amp, phase, iq = _inputs()
    ev1 = apply_fn(params, amp, phase, iq, train=False)
    ev2 = apply_fn(params, amp, phase, iq, train=False)
    np.testing.assert_array_equal(np.asarray(ev1), np.asarray(ev2))
    tr1 = apply_fn(params, amp, phase, iq, train=True,
                   rng=jax.random.PRNGKey(1))
    tr2 = apply_fn(params, amp, phase, iq, train=True,
                   rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(tr1), np.asarray(ev1))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
    # train=True without an rng must run dropout-free, not crash
    tr_norng = apply_fn(params, amp, phase, iq, train=True)
    np.testing.assert_array_equal(np.asarray(tr_norng), np.asarray(ev1))


def test_mdf_trains_on_separable_synthetic():
    """A few Adam steps on a 2-class amplitude-separable task must cut the
    loss (gradients flow through both CNN towers and the LSTM)."""
    init_fn, apply_fn = create_multi_domain_model(num_classes=2,
                                                  dropout_rate=0.0)
    params = init_fn(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    B = 16
    x = rng.standard_normal((B, 1024, 2)).astype(np.float32)
    y = np.arange(B) % 2
    x[y == 1] *= 4.0  # class 1: hot amplitude envelope
    amp, phase, iq = preprocess_batch_mdf(jnp.asarray(x))
    labels = jnp.asarray(y)

    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            logits = apply_fn(p, amp, phase, iq)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    params, state, first = step(params, state)
    losses = []
    for _ in range(40):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert min(losses[-5:]) < float(first) * 0.5, (float(first), losses[-5:])
