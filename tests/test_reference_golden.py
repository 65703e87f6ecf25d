"""Full-model golden tests against the REAL reference PyTorch modules.

Round 1 proved parity layer-locally (LayerNorm/conv-fold vs
torch.nn.functional) and key-mapping against hand-synthesized state_dicts.
These tests retire the remaining risk end-to-end: they import the reference's
actual model classes from /root/reference, instantiate them, export the real
state_dict through vitiq.interop, and assert logits match at atol 1e-5 under
the f32 'reference' numerics policy (SURVEY.md §7.3 parity bar).

Also pins split_data index parity by running the reference's own
ViT/dataloader/utils.py:split_data against vitiq's on the same HDF5 file.

Skipped wholesale when /root/reference or torch is unavailable.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitiq.config import ModelConfig
from vitiq.interop import load_torch_state_dict
from vitiq.models import make_forward

REF_ROOT = Path("/root/reference/Transformer_Thesis")

pytestmark = pytest.mark.skipif(
    not REF_ROOT.exists(), reason="reference tree not available"
)
torch = pytest.importorskip("torch")


def _purge_ref_modules():
    """Both reference arms register top-level packages named `models` /
    `dataloader`; purge between arm imports so they don't collide."""
    for name in list(sys.modules):
        if name == "models" or name.startswith("models.") \
                or name == "dataloader" or name.startswith("dataloader."):
            del sys.modules[name]


def _import_ref(arm_dir: str, module: str, symbol: str):
    _purge_ref_modules()
    path = str(REF_ROOT / arm_dir)
    sys.path.insert(0, path)
    try:
        mod = __import__(module, fromlist=[symbol])
        return getattr(mod, symbol)
    finally:
        sys.path.remove(path)


def _assert_logits_match(torch_model, torch_input, cfg, atol=1e-5):
    torch_model.eval()
    with torch.no_grad():
        ref_logits = torch_model(torch_input).numpy()
    params = load_torch_state_dict(torch_model.state_dict(), cfg)
    fwd = make_forward(cfg)
    got = np.asarray(fwd(params, jnp.asarray(torch_input.numpy())))
    np.testing.assert_allclose(got, ref_logits, atol=atol, rtol=0)


def test_vit_full_model_golden():
    """Flagship ViT config (d128/L6, 129 tokens) vs the real
    ViT/models/amc_transformer.py AMCTransformer."""
    AMCTransformer = _import_ref("ViT", "models.amc_transformer", "AMCTransformer")
    torch.manual_seed(0)
    model = AMCTransformer(
        in_channels=1, img_size_h=32, img_size_w=64, patch_size=4,
        num_classes=19, d_model=128, n_head=8, n_layers=6, ffn_hidden=512,
        drop_prob=0.1, device="cpu",
    )
    cfg = ModelConfig(arm="vit", num_classes=19, d_model=128, n_head=8,
                      n_layers=6, ffn_hidden=512, patch_size=4,
                      numerics="reference")
    x = torch.randn(4, 1, 32, 64)
    _assert_logits_match(model, x, cfg)


@pytest.mark.parametrize("use_cls_token", [True, False])
def test_rawiq_segment_full_model_golden(use_cls_token):
    """rawIQ segment-16 arm (both CLS and mean-pool heads) vs the real
    transformer_rawIQ/models/transformer_rawIQ.py AMCTransformer."""
    AMCTransformer = _import_ref(
        "transformer_rawIQ", "models.transformer_rawIQ", "AMCTransformer")
    torch.manual_seed(1)
    model = AMCTransformer(
        in_channels=2, seq_length=1024, num_classes=19, d_model=128, n_head=8,
        n_layers=6, ffn_hidden=1024, drop_prob=0.2, device="cpu",
        use_cls_token=use_cls_token, embedding_type="segment", segment_size=16,
    )
    cfg = ModelConfig(arm="rawiq", num_classes=19, d_model=128, n_head=8,
                      n_layers=6, ffn_hidden=1024, seq_length=1024,
                      embedding_type="segment", segment_size=16,
                      use_cls_token=use_cls_token, numerics="reference")
    x = torch.randn(4, 2, 1024)
    _assert_logits_match(model, x, cfg)


def test_rawiq_conv1d_full_model_golden():
    """conv1d tokenization mode (every sample a token,
    ref: transformer_rawIQ/models/encoder.py:34-41) — short sequence so the
    CPU torch forward stays fast; the mode's token math is length-invariant."""
    AMCTransformer = _import_ref(
        "transformer_rawIQ", "models.transformer_rawIQ", "AMCTransformer")
    torch.manual_seed(2)
    model = AMCTransformer(
        in_channels=2, seq_length=128, num_classes=5, d_model=64, n_head=4,
        n_layers=2, ffn_hidden=128, drop_prob=0.1, device="cpu",
        use_cls_token=True, embedding_type="conv1d",
    )
    cfg = ModelConfig(arm="rawiq", num_classes=5, d_model=64, n_head=4,
                      n_layers=2, ffn_hidden=128, seq_length=128,
                      embedding_type="conv1d", use_cls_token=True,
                      numerics="reference")
    x = torch.randn(3, 2, 128)
    _assert_logits_match(model, x, cfg)


def test_split_indices_match_reference(tmp_path):
    """vitiq.data.splits.split_data reproduces the reference's split_data
    (ViT/dataloader/utils.py:58-148) index-for-index on the same HDF5 file."""
    import h5py
    import json as json_mod

    from vitiq.data.splits import split_data as vitiq_split

    ref_split = _import_ref("ViT", "dataloader.utils", "split_data")

    rng = np.random.default_rng(7)
    mods = ["BPSK", "QPSK", "8PSK", "16QAM"]
    snrs = np.array([-4.0, 0.0, 4.0])
    per_stratum = 20
    n = len(mods) * len(snrs) * per_stratum
    y = np.zeros((n, len(mods)), np.float32)
    z = np.zeros((n, 1), np.float32)
    row = 0
    for mi in range(len(mods)):
        for snr in snrs:
            for _ in range(per_stratum):
                y[row, mi] = 1.0
                z[row, 0] = snr
                row += 1
    perm = rng.permutation(n)
    y, z = y[perm], z[perm]

    h5 = tmp_path / "mini.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("X", data=np.zeros((n, 8, 2), np.float32))
        f.create_dataset("Y", data=y)
        f.create_dataset("Z", data=z)
    classes = tmp_path / "classes.json"
    classes.write_text(json_mod.dumps(mods))

    args = (str(h5), str(classes), mods, 0.7, 0.15, 0.15, 42)
    r_train, r_valid, r_test, r_map = ref_split(*args)
    v_train, v_valid, v_test, v_map = vitiq_split(*args)

    np.testing.assert_array_equal(v_train, r_train)
    np.testing.assert_array_equal(v_valid, r_valid)
    np.testing.assert_array_equal(v_test, r_test)
    assert v_map == r_map
