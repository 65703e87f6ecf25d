"""Experiment orchestration: the reference's per-arm `main()` as a library.

Covers the full reference behavior for BOTH arms with the rawIQ arm's fixes
(SURVEY.md §2.8 item 5) adopted everywhere:

  * config validation up-front (ref: transformer_rawIQ/training/train.py:116-157)
  * experiment dirs + config.json persisted (ref: train.py:378-381)
  * deterministic split + seeded norm stats (ref: ViT/training/train.py:308-342)
  * fit loop with plateau LR / early stopping / periodic checkpoints
  * model_best saved and PREFERRED for the final test eval
    (ref: transformer_rawIQ/training/train.py:605,664-669 — the ViT arm
    evaluated final-epoch weights; we keep best)
  * KeyboardInterrupt rescue checkpoint (ref: train.py:716-734)
  * training-history plot + full evaluation artifacts
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import numpy as np

from vitiq.config import ExperimentConfig
from vitiq.data import (HDF5DataSource, SyntheticAMCDataset, channel_from_config,
                        stats_from_array)
from vitiq.data.feeds import ArrayFeed, DataFeed, StreamFeed
from vitiq.dsp import preprocess_batch_rawiq, preprocess_batch_vit
from vitiq.models import count_parameters, init_amc_params, make_forward
from vitiq.train import fit, load_checkpoint, save_checkpoint
from vitiq.train.checkpoint import load_params, save_params
from vitiq.train.optim import create_train_state


def build_preprocess(cfg: ExperimentConfig, stats: Dict[str, float]) -> Callable:
    """The fused front-end matching the arm: raw [B, L, 2] -> model input.

    With cfg.data.sps >= 2 (BASELINE config 3) the SPS front-end runs FIRST,
    inside the same jit: RRC matched filter + timing recovery decimate each
    frame to L/sps symbols, and the arm preprocessing consumes the symbol
    stream. Normalization stats are computed on the RAW frames; the RRC taps
    are unit-energy (vitiq/dsp/taps.py), so symbol-instant scale is preserved
    and the raw-frame z-score stays calibrated (the matched filter only
    removes out-of-band noise)."""
    arm_pre = _build_arm_preprocess(cfg, stats)
    if cfg.data.sps <= 1:
        return arm_pre
    from vitiq.dsp import preprocess_batch_sps

    sps, method = cfg.data.sps, cfg.data.timing_method
    hyb = cfg.data.timing_hybrid_window
    return lambda x: arm_pre(preprocess_batch_sps(x, sps, method=method,
                                                  hybrid_window=hyb))


def build_forward_and_preprocess(cfg: ExperimentConfig, stats: Dict[str, float]):
    """(forward, preprocess) for the experiment. When the fused raw
    embedding applies (iq features, sps=1, VITIQ_FUSED_EMBED gate —
    vitiq/models/raw_embed.py), preprocessing folds into the embedding
    GEMM: the forward consumes raw [B, L, 2] frames and preprocess is the
    identity. Every other mode keeps the preprocess -> forward split."""
    from vitiq.models.raw_embed import fused_raw_embed_enabled

    if (cfg.data.sps <= 1 and cfg.data.features == "iq"
            and fused_raw_embed_enabled(cfg.model)):
        return make_forward(cfg.model, raw_stats=stats), (lambda x: x)
    return make_forward(cfg.model), build_preprocess(cfg, stats)


def _build_arm_preprocess(cfg: ExperimentConfig, stats: Dict[str, float]) -> Callable:
    if cfg.model.arm == "vit":
        if cfg.data.features == "spectrogram":
            from vitiq.dsp import preprocess_batch_vit_spectrogram

            return lambda x: preprocess_batch_vit_spectrogram(
                x, H=cfg.model.img_size_h, W=cfg.model.img_size_w
            )
        if cfg.data.features != "iq":
            raise ValueError(
                f"features={cfg.data.features!r} is not valid for the vit arm "
                "(use 'iq' or 'spectrogram')")
        return lambda x: preprocess_batch_vit(
            x, stats, H=cfg.model.img_size_h, W=cfg.model.img_size_w
        )
    if cfg.data.features == "amp_phase":
        from vitiq.dsp import preprocess_batch_amplitude_phase

        return preprocess_batch_amplitude_phase
    if cfg.data.features != "iq":
        raise ValueError(
            f"features={cfg.data.features!r} is not valid for the rawiq arm "
            "(use 'iq' or 'amp_phase')")
    return lambda x: preprocess_batch_rawiq(x, stats)


def _check_frame_geometry(cfg: ExperimentConfig, frame_len: int) -> None:
    """Fail FAST when the dataset's frame length (after SPS decimation)
    doesn't match the model — the synthetic source validates this in
    ExperimentConfig.validate, but the hdf5 frame length is only knowable
    once the file is open (round-3 review finding: --source hdf5 --sps 2
    with a stale seq_length crashed deep inside the jitted forward)."""
    if frame_len % cfg.data.sps:
        raise ValueError(
            f"dataset frame length ({frame_len}) must be a multiple of "
            f"data.sps ({cfg.data.sps})")
    eff = frame_len // cfg.data.sps
    if cfg.model.arm == "rawiq" and cfg.model.seq_length != eff:
        raise ValueError(
            f"model.seq_length ({cfg.model.seq_length}) != effective frame "
            f"length ({eff} = dataset frame_len {frame_len} / sps {cfg.data.sps})")
    if (cfg.model.arm == "vit" and cfg.data.features == "iq"
            and cfg.model.img_size_h * cfg.model.img_size_w != 2 * eff):
        raise ValueError(
            f"ViT image {cfg.model.img_size_h}x{cfg.model.img_size_w} must "
            f"hold 2*(frame_len/sps) = {2 * eff} values")


def load_experiment_data(cfg: ExperimentConfig):
    """Returns (splits dict of (x, y, snr), stats, class_names)."""
    if cfg.data.source == "hdf5":
        src = HDF5DataSource(cfg.data.file_path, cfg.data.json_path)
        _check_frame_geometry(cfg, src.frame_len)
        s = src.split(cfg.data)
        stats = src.normalization_stats(s.train, cfg.data)
        splits = {}
        for name, idx in (("train", s.train), ("valid", s.valid), ("test", s.test)):
            splits[name] = src.load_split_arrays(idx, s.label_map)
        src.close()
        class_names = list(cfg.data.target_modulations)
    else:
        ds = SyntheticAMCDataset(
            classes=cfg.data.synthetic_classes,
            frames_per_class=cfg.data.synthetic_frames_per_class,
            frame_len=cfg.data.synthetic_frame_len,
            snrs_db=cfg.data.synthetic_snr_db,
            seed=cfg.data.synthetic_seed,
            shaping_sps=cfg.data.synthetic_shaping_sps,
            channel=channel_from_config(cfg.data),
        )
        n = len(ds)
        n_train = int(cfg.data.train_size * n)
        n_valid = int(cfg.data.valid_size * n)
        sl = {
            "train": slice(0, n_train),
            "valid": slice(n_train, n_train + n_valid),
            "test": slice(n_train + n_valid, n),
        }
        splits = {k: (ds.X[v], ds.Y[v], ds.Z[v]) for k, v in sl.items()}
        stats = stats_from_array(ds.X[:n_train], np.arange(n_train),
                                 seed=cfg.data.norm_seed,
                                 num_samples=cfg.data.norm_sample_count)
        class_names = list(cfg.data.synthetic_classes)
    return splits, stats, class_names


def load_experiment_feeds(cfg: ExperimentConfig):
    """Returns (feeds dict of DataFeed, stats, class_names).

    With cfg.data.streaming (hdf5 source), each split becomes a StreamFeed
    over windowed sequential HDF5 reads — the out-of-core path that trains
    the real ~19 GB RadioML split with RSS bounded by stream_window_rows
    (replaces the reference's DataLoader worker pool,
    ref: ViT/training/train.py:346-366). Each split holds its OWN file
    handle so prefetch threads never share h5py state. Otherwise splits are
    materialized in RAM and wrapped in ArrayFeeds — same interface, so
    fit()/eval run identically either way."""
    if cfg.data.source == "hdf5" and cfg.data.streaming:
        import functools

        meta_src = HDF5DataSource(cfg.data.file_path, cfg.data.json_path)
        _check_frame_geometry(cfg, meta_src.frame_len)
        s = meta_src.split(cfg.data)
        stats = meta_src.normalization_stats(s.train, cfg.data)
        meta_src.close()
        feeds: Dict[str, DataFeed] = {}
        for name, idx in (("train", s.train), ("valid", s.valid), ("test", s.test)):
            src = HDF5DataSource(cfg.data.file_path, cfg.data.json_path)
            feeds[name] = StreamFeed(
                functools.partial(src.batch_stream, idx, s.label_map,
                                  window_rows=cfg.data.stream_window_rows),
                num_samples=len(idx), shuffle_seed=cfg.train.shuffle_seed,
                source=src,
            )
        return feeds, stats, list(cfg.data.target_modulations)

    splits, stats, class_names = load_experiment_data(cfg)
    feeds = {
        name: ArrayFeed(x, y, z, shuffle_seed=cfg.train.shuffle_seed)
        for name, (x, y, z) in splits.items()
    }
    return feeds, stats, class_names


def run_training(
    cfg: ExperimentConfig,
    resume: Optional[str] = None,
    evaluate_test: bool = True,
    verbose: bool = True,
) -> Dict:
    """Full train+eval experiment. Returns summary dict."""
    cfg.validate(check_paths=cfg.data.source == "hdf5")
    exp_dir = Path(cfg.checkpoint_dir) / cfg.experiment_name
    log_dir = Path(cfg.log_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    log_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_json(exp_dir / "config.json")

    feeds, stats, class_names = load_experiment_feeds(cfg)
    (exp_dir / "normalization_stats.json").write_text(json.dumps(stats, indent=2))
    fwd, preprocess = build_forward_and_preprocess(cfg, stats)
    params = init_amc_params(jax.random.PRNGKey(cfg.train.init_seed), cfg.model)
    if verbose:
        print(f"model: {cfg.model.arm}, {count_parameters(params):,} parameters")

    resume_state = resume_history = None
    start_epoch = 0
    if resume == "auto":
        # auto-discover the newest checkpoint in the experiment dir (epoch-
        # numbered saves + the interrupt-rescue snapshot) so an interrupted
        # run can be re-launched with the same command (round-5: lets the
        # ablation-rung driver resume instead of retraining from scratch)
        candidates = []
        for p in exp_dir.glob("checkpoint_epoch_*.json"):
            try:
                candidates.append((int(p.stem.rsplit("_", 1)[1]), p))
            except ValueError:
                continue
        p_int = exp_dir / "checkpoint_interrupted.json"
        if p_int.exists():
            try:
                candidates.append(
                    (json.loads(p_int.read_text())["epoch"] + 1, p_int))
            except Exception:
                pass
        resume = str(max(candidates)[1].with_suffix("")) if candidates else None
    if resume:
        template = create_train_state(params, cfg.train)
        try:
            resume_state, manifest = load_checkpoint(resume, template)
            resume_history = manifest["history"]
            start_epoch = manifest["epoch"] + 1
            if verbose:
                print(f"resumed from {resume} at epoch {start_epoch}")
        except (FileNotFoundError, ValueError) as e:
            # corrupt/missing resume -> start fresh, like the rawIQ arm
            # (ref: transformer_rawIQ/training/train.py:532-541)
            print(f"warning: could not resume from {resume} ({e}); starting fresh")

    def checkpoint_callback(epoch: int, state, history):
        if (epoch + 1) % cfg.train.save_freq == 0:
            save_checkpoint(exp_dir / f"checkpoint_epoch_{epoch + 1}", state, epoch,
                            history["val_loss"][-1], history, cfg)
        # rolling best params
        if history["val_loss"][-1] <= min(history["val_loss"]):
            save_params(exp_dir / "model_best", state.params)

    # rescue state for Ctrl-C (ref: transformer_rawIQ/training/train.py:716-734
    # saves checkpoint_interrupted.pth on KeyboardInterrupt)
    last = {"state": None, "epoch": -1, "history": None}

    def tracking_callback(epoch, state, history):
        last.update(state=state, epoch=epoch, history=history)
        checkpoint_callback(epoch, state, history)

    t0 = time.perf_counter()
    try:
        result = fit(
            cfg, fwd, params, feeds["train"], feeds["valid"],
            preprocess_fn=preprocess, epoch_callback=tracking_callback,
            resume_state=resume_state, resume_history=resume_history,
            start_epoch=start_epoch, verbose=verbose,
            profile=cfg.train.profile_steps,
        )
    except KeyboardInterrupt:
        if last["state"] is not None:
            save_checkpoint(exp_dir / "checkpoint_interrupted", last["state"],
                            last["epoch"], last["history"]["val_loss"][-1],
                            last["history"], cfg)
            print(f"interrupted — rescue checkpoint written to "
                  f"{exp_dir / 'checkpoint_interrupted.npz'} (epoch {last['epoch'] + 1})")
        else:
            print("interrupted before the first epoch completed — nothing to rescue")
        for f in feeds.values():
            f.close()
        raise
    train_wall = time.perf_counter() - t0

    save_checkpoint(exp_dir / "checkpoint_final", result.state,
                    result.epochs_run - 1,
                    result.history["val_loss"][-1] if result.history["val_loss"] else float("inf"),
                    result.history, cfg)
    save_params(exp_dir / "model_final", result.state.params)
    best_params = result.best_params
    best_path = exp_dir / "model_best"
    if result.best_tracked or not best_path.with_suffix(".npz").exists():
        save_params(best_path, best_params)
    else:
        # resumed run whose post-resume epochs never beat the historical best:
        # the rolling checkpoint_callback's model_best.npz from the original
        # run holds the genuinely best weights — keep it and evaluate it
        best_params = load_params(best_path, result.state.params)

    try:
        from vitiq.eval.plots import plot_training_history
        plot_training_history(result.history,
                              log_dir / f"{cfg.experiment_name}_training_history.png")
    except Exception as e:  # plotting must never kill a finished run
        print(f"warning: history plot failed: {e}")

    summary: Dict = {
        "experiment_dir": str(exp_dir),
        "epochs_run": result.epochs_run,
        "stopped_early": result.stopped_early,
        "train_wall_seconds": train_wall,
        "best_val_loss": min(result.history["val_loss"]) if result.history["val_loss"] else None,
        "history": result.history,
        "normalization_stats": stats,
    }
    if result.step_times:
        summary["step_times"] = result.step_times

    if evaluate_test:
        from vitiq.eval import evaluate_feed_with_confusion
        eval_res = evaluate_feed_with_confusion(
            fwd, best_params, feeds["test"], class_names,
            exp_dir / "evaluation", prefix="test", batch_size=cfg.train.batch_size,
            preprocess_fn=preprocess, verbose=verbose,
        )
        summary["test_overall_accuracy"] = eval_res["overall_accuracy"]
        summary["test_snr_accuracies"] = eval_res["snr_accuracies"]

    (exp_dir / "summary.json").write_text(json.dumps(
        {k: v for k, v in summary.items() if k != "history"}, indent=2, default=float
    ))
    for f in feeds.values():
        f.close()  # streaming feeds hold one HDF5 handle per split
    return summary


def run_head_to_head(
    vit_cfg: ExperimentConfig,
    rawiq_cfg: ExperimentConfig,
    comparison_dir: str = "comparison_results",
    verbose: bool = True,
    resume: Optional[str] = None,
) -> Dict:
    """BASELINE.json config 4: train BOTH arms on identical data, evaluate
    each, and run the cross-arm comparison — the workflow the reference
    performs manually across its two script trees + compare_models.py.
    `resume="auto"` resumes each arm from the newest checkpoint in its
    experiment dir (round 5: lets an interrupted rung re-run with the same
    command instead of retraining from scratch)."""
    from vitiq.eval import ModelComparison

    vit_summary = run_training(vit_cfg, resume=resume, verbose=verbose)
    rawiq_summary = run_training(rawiq_cfg, resume=resume, verbose=verbose)
    vit_report = (Path(vit_summary["experiment_dir"]) / "evaluation"
                  / "test_classification_report.txt")
    rawiq_report = (Path(rawiq_summary["experiment_dir"]) / "evaluation"
                    / "test_classification_report.txt")
    mc = ModelComparison(vit_report, rawiq_report, output_dir=comparison_dir)
    insights = mc.run_comparison(verbose=verbose)
    return {
        "vit": {k: v for k, v in vit_summary.items() if k != "history"},
        "rawiq": {k: v for k, v in rawiq_summary.items() if k != "history"},
        "comparison_dir": str(comparison_dir),
        "insights": insights,
    }


def run_evaluation(
    checkpoint_dir: str,
    dataset: str = "test",
    batch_size: Optional[int] = None,
    config_path: Optional[str] = None,
    int8: bool = False,
    verbose: bool = True,
) -> Dict:
    """Standalone evaluation of a saved experiment (the reference's
    evaluate.py flow: re-derive split + stats deterministically, rebuild the
    model, load weights, evaluate — ref: ViT/training/evaluate.py:42-226)."""
    exp_dir = Path(checkpoint_dir)
    cfg_file = Path(config_path) if config_path else exp_dir / "config.json"
    if cfg_file.exists():
        cfg = ExperimentConfig.from_json(str(cfg_file))
    else:
        # fall back to the config embedded in a checkpoint manifest, like the
        # reference's evaluate.py reads checkpoint['config']
        # (ref: ViT/training/evaluate.py:60-87)
        embedded = None
        for name in ("checkpoint_final.json", "checkpoint_interrupted.json"):
            p = exp_dir / name
            if p.exists():
                manifest = json.loads(p.read_text())
                if manifest.get("config"):
                    embedded = manifest["config"]
                    break
        if embedded is None:
            raise FileNotFoundError(
                f"no config.json in {exp_dir} and no checkpoint manifest with an "
                f"embedded config — pass --config explicitly"
            )
        cfg = ExperimentConfig.from_dict(embedded)
    if batch_size:
        cfg.train.batch_size = batch_size

    feeds, stats, class_names = load_experiment_feeds(cfg)
    stats_file = exp_dir / "normalization_stats.json"
    if stats_file.exists():
        stats = json.loads(stats_file.read_text())

    template = init_amc_params(jax.random.PRNGKey(cfg.train.init_seed), cfg.model)
    weights = exp_dir / "model_best.npz"
    if not weights.exists():
        weights = exp_dir / "model_final.npz"
    params = load_params(weights, template)

    prefix = dataset
    if int8:
        # evaluate through the int8 W8A8 serving path (quantized GEMMs,
        # fused int8 layers on TPU) — validates deployment accuracy
        from vitiq.ops.quant import make_quantized_forward, quantize_params_int8

        params = quantize_params_int8(params)
        qfwd = make_quantized_forward(cfg.model)
        fwd = lambda p, x, train=False, rng=None: qfwd(p, x)
        prefix = f"{dataset}_int8"
        preprocess = build_preprocess(cfg, stats)  # quant fwd is not raw-aware
    else:
        fwd, preprocess = build_forward_and_preprocess(cfg, stats)

    from vitiq.eval import evaluate_feed_with_confusion
    try:
        return evaluate_feed_with_confusion(
            fwd, params, feeds[dataset], class_names, exp_dir / "evaluation",
            prefix=prefix, batch_size=cfg.train.batch_size,
            preprocess_fn=preprocess, verbose=verbose,
        )
    finally:
        for f in feeds.values():
            f.close()


def run_reference_evaluation(
    torch_checkpoint: str,
    config_path: Optional[str] = None,
    output_dir: Optional[str] = None,
    dataset: str = "test",
    batch_size: Optional[int] = None,
    data_path: Optional[str] = None,
    json_path: Optional[str] = None,
    verbose: bool = True,
) -> Dict:
    """One-command reference-checkpoint import-and-evaluate (VERDICT r4
    item 8): given a reference .pth and its dataset, produce the full eval
    artifact set without retraining.

    Config resolution, in order: `config_path` (either a vitiq config JSON
    or the reference's UPPERCASE per-checkpoint config.json — auto-detected
    by key case, ref: transformer_rawIQ/training/train.py:378-381); a
    config.json sitting next to the .pth (or in its parent dir); the
    'config' dict the reference embeds in its training checkpoints
    (ref: ViT/training/utils.py:66-119). `data_path`/`json_path` override
    the config's dataset location (the reference persists Windows paths).
    Artifacts land in `output_dir` (default
    result/reference_import/<stem>/evaluation — never next to a read-only
    .pth). Weight import runs through vitiq.interop (parity vs the real
    reference modules pinned at atol 1e-5, tests/test_reference_golden.py).
    """
    import torch

    ckpt_path = Path(torch_checkpoint)
    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob

    def _cfg_from_json(p: Path) -> ExperimentConfig:
        d = json.loads(Path(p).read_text())
        if any(k.isupper() for k in d):
            return ExperimentConfig.from_reference_dict(d)
        return ExperimentConfig.from_dict(d)

    cfg = None
    if config_path:
        cfg = _cfg_from_json(Path(config_path))
    else:
        for cand in (ckpt_path.with_suffix(".json"),
                     ckpt_path.parent / "config.json"):
            if cand.exists():
                cfg = _cfg_from_json(cand)
                break
        if cfg is None and isinstance(blob, dict) and blob.get("config"):
            cfg = ExperimentConfig.from_reference_dict(blob["config"])
    if cfg is None:
        raise FileNotFoundError(
            f"no config found for {ckpt_path}: pass --config, place a "
            f"config.json next to the checkpoint, or use a reference "
            f"training checkpoint with an embedded config")

    if data_path:
        cfg.data.file_path = data_path
        cfg.data.source = "hdf5"
    if json_path:
        cfg.data.json_path = json_path
    if batch_size:
        cfg.train.batch_size = batch_size
    cfg.model.validate()

    from vitiq.interop import load_torch_state_dict

    params = load_torch_state_dict(sd, cfg.model)

    out = Path(output_dir) if output_dir else (
        Path("result/reference_import") / ckpt_path.stem / "evaluation")
    feeds, stats, class_names = load_experiment_feeds(cfg)
    fwd, preprocess = build_forward_and_preprocess(cfg, stats)
    from vitiq.eval import evaluate_feed_with_confusion

    try:
        return evaluate_feed_with_confusion(
            fwd, params, feeds[dataset], class_names, out,
            prefix=dataset, batch_size=cfg.train.batch_size,
            preprocess_fn=preprocess, verbose=verbose,
        )
    finally:
        for f in feeds.values():
            f.close()
