"""Deterministic dataset splitting & metadata.

Reproduces the reference's split EXACTLY (same seeds -> same index arrays):
70/15/15 stratified jointly by (modulation x SNR) via two chained sklearn
`train_test_split` calls per stratum, then a final seeded shuffle
(ref: ViT/dataloader/utils.py:58-148). sklearn is used directly so the
permutation stream is bit-identical to the reference's.

Works over any "label source": the HDF5 file's Y/Z datasets
(ref: utils.py:92-95) or in-memory arrays (synthetic path).
"""

from __future__ import annotations

import json
from typing import Dict, List, NamedTuple, Sequence, Tuple

import numpy as np


class SplitIndices(NamedTuple):
    train: np.ndarray
    valid: np.ndarray
    test: np.ndarray
    label_map: Dict[str, int]


def load_dataset_metadata(file_path: str, json_path: str):
    """Read labels/SNR without touching X (ref: ViT/dataloader/utils.py:12-55).

    Returns (Y_strings, Z, available_modulations, total_samples).
    """
    import h5py

    with h5py.File(file_path, "r") as f:
        total_samples = f["X"].shape[0]
        y_int = np.argmax(f["Y"][:], axis=1)
        z = f["Z"][:, 0]
    with open(json_path, "r") as f:
        modulation_classes = json.load(f)
    y_strings = np.array([modulation_classes[i] for i in y_int])
    available = list(np.unique(y_strings))
    return y_strings, z, available, total_samples


def split_labels(
    y_strings: np.ndarray,
    z: np.ndarray,
    target_mods: Sequence[str],
    train_ratio: float,
    valid_ratio: float,
    test_ratio: float,
    seed: int,
) -> SplitIndices:
    """Stratified (modulation x SNR) split over in-memory label arrays.

    Exact reference algorithm (ViT/dataloader/utils.py:96-148): per stratum,
    first split off `test_ratio`, then split train/valid at
    valid/(train+valid), both with sklearn's seeded shuffling; single-sample
    leftovers go to train; final per-split shuffle with np.random.seed(seed).
    """
    from sklearn.model_selection import train_test_split

    if not np.isclose(train_ratio + valid_ratio + test_ratio, 1.0):
        raise ValueError("Ratios must sum to 1.0")

    label_map = {mod: i for i, mod in enumerate(target_mods)}
    train_indices: List[int] = []
    valid_indices: List[int] = []
    test_indices: List[int] = []

    for mod in target_mods:
        for snr in np.unique(z):
            idx = np.where((y_strings == mod) & (z == snr))[0]
            if len(idx) == 0:
                continue
            idx_train_val, idx_test = train_test_split(
                idx, test_size=test_ratio, random_state=seed, shuffle=True
            )
            relative_valid_ratio = valid_ratio / (train_ratio + valid_ratio)
            if len(idx_train_val) > 1:
                idx_train, idx_valid = train_test_split(
                    idx_train_val, test_size=relative_valid_ratio,
                    random_state=seed, shuffle=True,
                )
            else:
                idx_train, idx_valid = idx_train_val, []
            train_indices.extend(idx_train)
            valid_indices.extend(idx_valid)
            test_indices.extend(idx_test)

    np.random.seed(seed)
    np.random.shuffle(train_indices)
    np.random.shuffle(valid_indices)
    np.random.shuffle(test_indices)
    return SplitIndices(
        np.array(train_indices), np.array(valid_indices), np.array(test_indices), label_map
    )


def split_data(
    file_path: str,
    json_path: str,
    target_mods: Sequence[str],
    train_ratio: float,
    valid_ratio: float,
    test_ratio: float,
    seed: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Dict[str, int]]:
    """HDF5-backed split with the reference's exact signature and return shape
    (ref: ViT/dataloader/utils.py:58-148)."""
    y_strings, z, _, _ = load_dataset_metadata(file_path, json_path)
    s = split_labels(y_strings, z, target_mods, train_ratio, valid_ratio, test_ratio, seed)
    return s.train, s.valid, s.test, s.label_map
