#!/usr/bin/env python
"""Generate the reference-scale impairment-faithful packed corpus
(VERDICT r3 item 2: >=100K frames/class ~ the reference's 2.55M-frame
training regime, ref: ViT/README_ViT.md:490-493).

19 classes x frames_per_class impaired frames (2018.01A-style ChannelModel:
RRC shaping + CFO + clock offset + Rician fading), AWGN over the proxy19
SNR grid, split 70/15/15 and written DIRECTLY into PackedDataSource shards
(vitiq/data/hdf5.py pack_split_to_npy format) — the corpus never exists in
RAM. Classes are interleaved in rounds so every shard (= one shuffle window
of PackedDataSource.batch_stream) carries the full class mix.

Normalization stats follow the reference recipe (5000-row seeded sample of
the train split, seed 49, ddof=1, clamp 1e-8 — ref:
ViT/dataloader/dataset.py:116-158) and land in stats.json.

Usage: python scripts/gen_refscale_corpus.py [out_dir] [frames_per_class]
Defaults: result/refscale_corpus, 110592 frames/class (= 54 rounds x 2048;
19 classes -> 2.10M frames, ~16.8 GB f32).
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

SNR_GRID = (-8.0, -4.0, 0.0, 4.0, 8.0, 12.0, 16.0, 20.0)
SHARD_ROWS = 65536
ROUND_PER_CLASS = 2048


class ShardWriter:
    """Append rows; flush x_%05d.npy shards of SHARD_ROWS; y/z kept in RAM
    (ints/floats only) and saved with meta.json at close."""

    def __init__(self, out_dir: pathlib.Path, frame_len: int):
        self.dir = out_dir
        self.dir.mkdir(parents=True, exist_ok=True)
        self.buf = np.empty((SHARD_ROWS, frame_len, 2), np.float32)
        self.fill = 0
        self.shards = []
        self.ys, self.zs = [], []

    def append(self, x, y, z):
        self.ys.append(y.astype(np.int64))
        self.zs.append(z.astype(np.float32))
        n = len(x)
        off = 0
        while off < n:
            take = min(SHARD_ROWS - self.fill, n - off)
            self.buf[self.fill:self.fill + take] = x[off:off + take]
            self.fill += take
            off += take
            if self.fill == SHARD_ROWS:
                self._flush()

    def _flush(self):
        if self.fill == 0:
            return
        np.save(self.dir / f"x_{len(self.shards):05d}.npy",
                self.buf[:self.fill])
        self.shards.append(int(self.fill))
        self.fill = 0

    def close(self, label_map):
        self._flush()
        y = np.concatenate(self.ys)
        z = np.concatenate(self.zs)
        np.save(self.dir / "y.npy", y)
        np.save(self.dir / "z.npy", z)
        (self.dir / "meta.json").write_text(json.dumps({
            "num_rows": int(len(y)),
            "shard_rows": SHARD_ROWS,
            "shards": self.shards,
            "label_map": label_map,
        }))
        return int(len(y))


def main() -> int:
    from vitiq.config import TARGET_MODULATIONS_19
    from vitiq.data.synthetic import ChannelModel, generate_frames

    out_root = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                            else "result/refscale_corpus")
    per_class = int(sys.argv[2]) if len(sys.argv) > 2 else 54 * ROUND_PER_CLASS
    classes = list(TARGET_MODULATIONS_19)
    label_map = {m: i for i, m in enumerate(classes)}
    L = 1024
    ch = ChannelModel()
    rounds = (per_class + ROUND_PER_CLASS - 1) // ROUND_PER_CLASS

    writers = {s: ShardWriter(out_root / s, L)
               for s in ("train", "valid", "test")}
    rng = np.random.default_rng(2026)
    t0 = time.time()
    total = 0
    for r in range(rounds):
        f = min(ROUND_PER_CLASS, per_class - r * ROUND_PER_CLASS)
        xs, ys, zs = [], [], []
        for label, mod in enumerate(classes):
            sig = generate_frames(mod, f, L, rng, channel=ch)
            sig = sig * np.exp(1j * rng.uniform(0, 2 * np.pi, (f, 1))
                               ).astype(np.complex64)
            snr = rng.choice(np.asarray(SNR_GRID, np.float32), f)
            ns = np.sqrt(10.0 ** (-snr / 10.0) / 2.0)[:, None].astype(np.float32)
            sig = sig + ns * (rng.standard_normal((f, L))
                              + 1j * rng.standard_normal((f, L))
                              ).astype(np.complex64)
            x = np.empty((f, L, 2), np.float32)
            x[:, :, 0] = sig.real
            x[:, :, 1] = sig.imag
            xs.append(x)
            ys.append(np.full(f, label, np.int64))
            zs.append(snr)
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        z = np.concatenate(zs)
        perm = rng.permutation(len(x))
        x, y, z = x[perm], y[perm], z[perm]
        n_tr = int(0.7 * len(x))
        n_va = int(0.15 * len(x))
        writers["train"].append(x[:n_tr], y[:n_tr], z[:n_tr])
        writers["valid"].append(x[n_tr:n_tr + n_va], y[n_tr:n_tr + n_va],
                                z[n_tr:n_tr + n_va])
        writers["test"].append(x[n_tr + n_va:], y[n_tr + n_va:],
                               z[n_tr + n_va:])
        total += len(x)
        el = time.time() - t0
        print(f"round {r + 1}/{rounds}: {total:,} frames, {el:.0f}s "
              f"({total / el:.0f} fps)", flush=True)

    counts = {s: w.close(label_map) for s, w in writers.items()}

    # reference norm-stats recipe: 5000 seeded train rows, seed 49
    from vitiq.data.hdf5 import PackedDataSource

    src = PackedDataSource(out_root / "train")
    sub = np.sort(np.random.default_rng(49).choice(
        counts["train"], size=min(5000, counts["train"]), replace=False))
    rows = src.read_rows(sub)
    stats = {
        "i_mean": float(rows[..., 0].mean()),
        "i_std": float(max(rows[..., 0].std(ddof=1), 1e-8)),
        "q_mean": float(rows[..., 1].mean()),
        "q_std": float(max(rows[..., 1].std(ddof=1), 1e-8)),
    }
    (out_root / "stats.json").write_text(json.dumps({
        "stats": stats, "classes": classes, "snr_grid": list(SNR_GRID),
        "frames_per_class": per_class, "counts": counts,
        "channel": "ChannelModel() defaults", "frame_len": L,
    }, indent=2))
    print(json.dumps({"counts": counts, "stats": stats}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
