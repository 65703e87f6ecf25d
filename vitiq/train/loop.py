"""Jitted train/eval steps and the epoch orchestration loop.

TPU-first restructuring of the reference's epoch loop (ref:
ViT/training/train.py:175-260, 450-560):

* ONE jitted, state-donating train step = preprocess (normalize/reshape, fused
  from the raw [B, L, 2] frame) + forward + loss + backward + clip + AdamW.
  The reference instead preprocesses per-sample in DataLoader worker processes
  and runs eager torch ops.
* Batches arrive as global arrays sharded over the mesh's 'data' axis; the
  gradient all-reduce is inserted by the jit partitioner and rides ICI.
* Everything epoch-granular (plateau LR, early stop, checkpoint cadence,
  history) stays on the host between steps.

Static batch shapes: the train split drops the final partial batch (shapes
must be trace-stable); evaluation pads the final batch and masks the padding
so every sample is scored exactly once.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitiq.config import ExperimentConfig
from vitiq.data.feeds import DataFeed, as_feed
from vitiq.data.pipeline import device_prefetch
from vitiq.ops.metrics import accuracy, label_smoothed_cross_entropy
from vitiq.parallel.mesh import batch_sharding, make_mesh, shard_params
from vitiq.train.optim import TrainState, create_train_state, get_learning_rate, make_optimizer, set_learning_rate
from vitiq.train.schedule import EarlyStopping, ReduceLROnPlateau


# --------------------------------------------------------------------------
# jitted steps
# --------------------------------------------------------------------------

def _as_rbg_key(key):
    """Rewrap a (possibly legacy uint32[2]) threefry key as an XLA-native RBG
    key — TPU-fast random bits for dropout masks."""
    data = key
    if jnp.issubdtype(data.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(data)
    data = data.astype(jnp.uint32)
    return jax.random.wrap_key_data(jnp.concatenate([data, data]), impl="rbg")


def make_train_step(
    forward_fn: Callable,
    tx,
    label_smoothing: float,
    preprocess_fn: Optional[Callable] = None,
):
    """Returns jitted step(state, x, y, rng) -> (state, metrics).

    x is the raw [B, L, 2] frame batch (or an already-shaped model input if
    preprocess_fn is None); donate_argnums=(0,) reuses the state buffers.
    """

    def step(state: TrainState, x, y, rng):
        inputs = preprocess_fn(x) if preprocess_fn is not None else x
        # fold the step counter into the dropout key: one key per step,
        # deterministic given (seed, step). On TPU the key is rewrapped as an
        # RBG key: dropout masks need no cross-framework parity, and threefry
        # mask generation measured ~77 ms of a 425 ms flagship train step on
        # v5e (step vs step_nodrop, scripts/tpu_train_probe.py); XLA's native
        # RngBitGenerator makes it near-free at identical semantics
        # (deterministic per (seed, step), still Bernoulli(1-p)). CPU keeps
        # threefry so host-side test trajectories stay pinned.
        dropout_rng = jax.random.fold_in(rng, state.step)
        if jax.default_backend() == "tpu":
            dropout_rng = _as_rbg_key(dropout_rng)

        def loss_fn(params):
            logits = forward_fn(params, inputs, train=True, rng=dropout_rng)
            return label_smoothed_cross_entropy(logits, y, label_smoothing), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {"loss": loss, "accuracy": accuracy(logits, y)}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_train_scan_step(
    forward_fn: Callable,
    tx,
    label_smoothing: float,
    preprocess_fn: Optional[Callable] = None,
):
    """K-step fused train call: step(state, xs [K,B,...], ys [K,B], rng) ->
    (state, mean loss, mean acc). Semantically identical to K calls of
    make_train_step's step (same per-(seed, state.step) dropout keys, same
    update order); one device dispatch instead of K
    (TrainConfig.device_scan_steps)."""

    def step(state: TrainState, xs, ys, rng):
        on_tpu = jax.default_backend() == "tpu"

        def scan_body(st, batch):
            x, y = batch
            inputs = preprocess_fn(x) if preprocess_fn is not None else x
            drng = jax.random.fold_in(rng, st.step)
            if on_tpu:
                drng = _as_rbg_key(drng)

            def loss_fn(params):
                logits = forward_fn(params, inputs, train=True, rng=drng)
                return (label_smoothed_cross_entropy(logits, y,
                                                     label_smoothing), logits)

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            st.params, updates)
            st = TrainState(params=params, opt_state=opt_state,
                            step=st.step + 1)
            return st, (loss, accuracy(logits, y))

        state, (losses, accs) = jax.lax.scan(scan_body, state, (xs, ys))
        return state, losses.mean(), accs.mean()

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(
    forward_fn: Callable,
    label_smoothing: float,
    preprocess_fn: Optional[Callable] = None,
):
    """Returns jitted step(params, x, y, valid_mask) -> metrics sums + preds.

    valid_mask zeroes padded rows so partial final batches score exactly.
    """

    def step(params, x, y, valid_mask):
        inputs = preprocess_fn(x) if preprocess_fn is not None else x
        logits = forward_fn(params, inputs, train=False)
        logp_loss = label_smoothed_cross_entropy_per_sample(logits, y, label_smoothing)
        preds = jnp.argmax(logits, axis=-1)
        correct = (preds == y).astype(jnp.float32) * valid_mask
        return {
            "loss_sum": jnp.sum(logp_loss * valid_mask),
            "correct_sum": jnp.sum(correct),
            "count": jnp.sum(valid_mask),
            "preds": preds,
        }

    return jax.jit(step)


def label_smoothed_cross_entropy_per_sample(logits, labels, smoothing):
    from vitiq.ops.metrics import log_softmax

    logp = log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if smoothing == 0.0:
        return nll
    uniform = -jnp.mean(logp, axis=-1)
    return (1.0 - smoothing) * nll + smoothing * uniform


# --------------------------------------------------------------------------
# host-side batching
# --------------------------------------------------------------------------

def train_batches(
    x: np.ndarray, y: np.ndarray, batch_size: int, rng: np.random.Generator,
    sharding=None,
) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Shuffled, drop-last batches placed on device (sharded if given)."""
    n = len(x)
    perm = rng.permutation(n)
    for start in range(0, n - batch_size + 1, batch_size):
        idx = perm[start:start + batch_size]
        bx, by = x[idx], y[idx]
        if sharding is not None:
            bx = jax.device_put(bx, sharding)
            by = jax.device_put(by, sharding)
        yield bx, by


def eval_batches(
    x: np.ndarray, y: np.ndarray, batch_size: int, sharding=None,
) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int]]:
    """Sequential batches; the final one is padded to full size with a mask.
    Yields (x, y, valid_mask, n_valid)."""
    n = len(x)
    for start in range(0, n, batch_size):
        bx, by = x[start:start + batch_size], y[start:start + batch_size]
        n_valid = len(bx)
        if n_valid < batch_size:
            pad = batch_size - n_valid
            bx = np.concatenate([bx, np.zeros((pad,) + bx.shape[1:], bx.dtype)])
            by = np.concatenate([by, np.zeros((pad,), by.dtype)])
        mask = np.zeros(batch_size, np.float32)
        mask[:n_valid] = 1.0
        if sharding is not None:
            bx = jax.device_put(bx, sharding)
            by = jax.device_put(by, sharding)
            mask = jax.device_put(mask, sharding)
        yield bx, by, mask, n_valid


def evaluate_epoch(eval_step, params, x, y, batch_size: int, sharding=None) -> Dict[str, float]:
    """evaluate_feed over in-RAM arrays — one accumulation/padding path for
    the array and streaming cases (the padding semantics live only in
    feeds._pad_eval)."""
    from vitiq.data.feeds import ArrayFeed

    return evaluate_feed(eval_step, params, ArrayFeed(x, y), batch_size, sharding)


def evaluate_feed(eval_step, params, feed: DataFeed, batch_size: int,
                  sharding=None, prefetch_depth: int = 3,
                  assemble=None) -> Dict[str, float]:
    """evaluate_epoch over a DataFeed (in-RAM or streaming) with async
    prefetch — padded batches, every sample scored exactly once."""
    loss_sum = correct_sum = count = 0.0
    batches = device_prefetch(feed.eval_batches(batch_size), sharding,
                              prefetch_depth=prefetch_depth,
                              assemble=assemble)
    for bx, by, mask in batches:
        m = eval_step(params, bx, by, mask)
        loss_sum += float(m["loss_sum"])
        correct_sum += float(m["correct_sum"])
        count += float(m["count"])
    return {"loss": loss_sum / count, "accuracy": correct_sum / count}


def superbatches(src_iter, k: int):
    """Group k host batches -> ("scan", xs [k,B,...], ys [k,B]) items for the
    device-scan superbatching path; equal-shape groups only. A batch whose
    shape differs from the group-in-progress flushes the group as
    ("single", x, y) items immediately (checked at append time, so a
    mid-epoch shape change can never silently disable grouping or accumulate
    the rest of the epoch in host RAM — ADVICE r4); the ragged tail falls
    back to per-batch items too."""
    buf = []
    for item in src_iter:
        if buf and item[0].shape != buf[0][0].shape:
            for b in buf:
                yield ("single",) + tuple(b)
            buf = []
        buf.append(item)
        if len(buf) == k:
            yield ("scan",
                   np.stack([b[0] for b in buf]),
                   np.stack([b[1] for b in buf]))
            buf = []
    for item in buf:
        yield ("single",) + tuple(item)


# --------------------------------------------------------------------------
# fit: the full training loop
# --------------------------------------------------------------------------

@dataclass
class FitResult:
    state: TrainState
    best_params: Any
    history: Dict[str, list] = field(default_factory=dict)
    stopped_early: bool = False
    epochs_run: int = 0
    # StepTimer.summary() when fit(profile=True): p50/p90/best/mean step s
    step_times: Optional[Dict] = None
    # True iff best_params was actually tracked by early stopping this run;
    # False means best_params is the final-epoch fallback. On resume, history
    # re-priming sets the bar without params, so a run whose post-resume
    # epochs never beat the historical best reports False — callers must not
    # overwrite a previously saved best snapshot in that case.
    best_tracked: bool = False


def fit(
    cfg: ExperimentConfig,
    forward_fn: Callable,
    init_params,
    train_data: Tuple[np.ndarray, np.ndarray],
    valid_data: Tuple[np.ndarray, np.ndarray],
    preprocess_fn: Optional[Callable] = None,
    mesh=None,
    epoch_callback: Optional[Callable] = None,
    resume_state: Optional[TrainState] = None,
    resume_history: Optional[Dict] = None,
    start_epoch: int = 0,
    verbose: bool = True,
    profile: bool = False,
) -> FitResult:
    """Train with the reference's control semantics: plateau LR, early stop,
    best-params tracking, full history (ref: ViT/training/train.py:450-560).

    `epoch_callback(epoch, state, history)` runs after each epoch (checkpoint
    cadence lives there). Raw frames in train/valid_data; preprocess_fn runs
    inside the jitted steps.

    train_data / valid_data: (x, y) array tuples (in-RAM) OR DataFeed
    objects (`vitiq.data.feeds`) — a StreamFeed over
    `HDF5DataSource.batch_stream` trains out-of-core corpora with bounded
    RSS. Either way batches are fed through `device_prefetch`, so the host
    read + H2D copy of step N+1 overlap step N's compute.

    profile=True records dispatch-synchronized per-step wall times
    (StepTimer) and adds per-epoch step_p50/step_p90 to history; each
    step then blocks on its own output, trading a little pipelining for
    honest step latencies. CAVEAT (CLAUDE.md timing rule): through a
    REMOTE-dispatch TPU transport, per-call block_until_ready can ack
    before device execution and under-report wildly — on such backends
    treat epoch_time (wall clock over many steps) as the honest number
    and step_p50/p90 as a host-side dispatch metric only.
    """
    tcfg = cfg.train
    if mesh is None:
        mesh = make_mesh(data=tcfg.data_parallel, model=tcfg.model_parallel)
    data_sharding = batch_sharding(mesh)

    tx = make_optimizer(tcfg)
    if resume_state is not None:
        state = resume_state
    else:
        # copy before sharding: the train step donates state buffers, and the
        # caller's init_params must survive (e.g. to seed a second run)
        params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), init_params)
        params = shard_params(params, mesh)
        state = create_train_state(params, tcfg)

    train_step = make_train_step(forward_fn, tx, tcfg.label_smoothing, preprocess_fn)
    eval_step = make_eval_step(forward_fn, tcfg.label_smoothing, preprocess_fn)
    # device-scan superbatching (TrainConfig.device_scan_steps): K train
    # steps per device call. Works on single-device AND on single-process
    # meshes (round 5, VERDICT r4 item 5): the stacked [K, B, ...] batch is
    # placed with scan_batch_sharding (K unsharded, B over the data axes) and
    # scan-of-sharded-steps composes with the partitioner — per-step grad
    # collectives are unchanged, just issued from inside one device call
    # (trajectory-identity on a mesh pinned by
    # tests/test_train.py::test_device_scan_superbatching_on_mesh).
    # Per-step profiling forces it off (it needs per-step dispatch), and so
    # does multi-host feeding (per-process assembly of a stacked superbatch
    # via make_array_from_process_local_data is unplumbed).
    scan_k = tcfg.device_scan_steps if (
        tcfg.device_scan_steps and tcfg.device_scan_steps > 1
        and not profile
        and jax.process_count() == 1) else 0
    train_scan_step = (make_train_scan_step(forward_fn, tx,
                                            tcfg.label_smoothing,
                                            preprocess_fn)
                       if scan_k else None)

    scheduler = ReduceLROnPlateau(
        factor=tcfg.lr_plateau_factor, patience=tcfg.lr_plateau_patience, min_lr=tcfg.min_lr
    )
    early_stopping = EarlyStopping(patience=tcfg.patience)

    history = resume_history or {
        "train_loss": [], "train_acc": [], "val_loss": [], "val_acc": [],
        "lr": [], "epoch_time": [],
    }
    # re-prime scheduler/early-stop from history on resume (the reference
    # restores history but silently resets both controllers — we re-derive)
    for past_loss in history["val_loss"]:
        scheduler.step(past_loss, get_learning_rate(state))
        early_stopping(past_loss)
    early_stopping.early_stop = False

    base_rng = jax.random.PRNGKey(tcfg.dropout_seed)
    train_feed = as_feed(train_data, shuffle_seed=tcfg.shuffle_seed)
    valid_feed = as_feed(valid_data, shuffle_seed=tcfg.shuffle_seed)
    # Multi-host meshes: per-host data feeding (SURVEY §0/§2.9, VERDICT r3
    # item 6). Every process runs this same fit() with identical seeds, so
    # the wrapped feeds see identical global permutations; each then yields
    # only its process's rows and device placement assembles the global
    # array from process-local shards. Single-process runs keep the plain
    # full-batch device_put path (assemble=None).
    assemble = None
    if jax.process_count() > 1:
        from vitiq.data.feeds import ProcessShardFeed
        from vitiq.parallel.mesh import shard_batch_per_process

        train_feed = ProcessShardFeed(train_feed, mesh)
        valid_feed = ProcessShardFeed(valid_feed, mesh)
        _gbs = tcfg.batch_size

        def assemble(batch):
            return shard_batch_per_process(batch, mesh, _gbs)
    if train_feed.num_samples < tcfg.batch_size:
        raise ValueError(
            f"batch_size ({tcfg.batch_size}) exceeds the training-set size "
            f"({train_feed.num_samples}); train batches drop the final partial "
            f"batch, so no step would ever run"
        )
    if valid_feed.num_samples == 0:
        raise ValueError("validation set is empty — plateau LR and early stopping "
                         "need a validation metric")

    timer = None
    if profile:
        from vitiq.utils.profiling import StepTimer
        timer = StepTimer()
        history.setdefault("step_p50", [])
        history.setdefault("step_p90", [])

    result = FitResult(state=state, best_params=None, history=history)
    with mesh:
        for epoch in range(start_epoch, tcfg.num_epochs):
            t0 = time.perf_counter()
            losses, accs = [], []
            epoch_steps0 = len(timer.times) if timer else 0
            if scan_k:
                from vitiq.parallel.mesh import scan_batch_sharding

                _scan_sh = scan_batch_sharding(mesh)

                def _assemble_sb(it):
                    sh = _scan_sh if it[0] == "scan" else data_sharding
                    return (it[0],) + tuple(jax.device_put(x, sh)
                                            for x in it[1:])

                sb = device_prefetch(
                    superbatches(train_feed.train_batches(epoch,
                                                          tcfg.batch_size),
                                 scan_k),
                    prefetch_depth=max(2, tcfg.prefetch_depth // 2),
                    assemble=_assemble_sb)
                weights = []
                for kind, bx, by in sb:
                    if kind == "scan":
                        state, l, a = train_scan_step(state, bx, by, base_rng)
                        weights.append(scan_k)
                    else:
                        state, m = train_step(state, bx, by, base_rng)
                        l, a = m["loss"], m["accuracy"]
                        weights.append(1)
                    losses.append(l)
                    accs.append(a)
                    # each scan call IS dispatch_sync_steps-deep; one
                    # scalar fetch per call bounds in-flight depth
                    if tcfg.dispatch_sync_steps:
                        float(losses[-1])
                w = jnp.asarray(weights, jnp.float32)
                losses = [jnp.sum(jnp.stack(losses) * w) / w.sum()]
                accs = [jnp.sum(jnp.stack(accs) * w) / w.sum()]
                batches = ()
            else:
                batches = device_prefetch(
                    train_feed.train_batches(epoch, tcfg.batch_size),
                    data_sharding, prefetch_depth=tcfg.prefetch_depth,
                    assemble=assemble)
            for bx, by in batches:
                if timer is not None:
                    with timer.step():
                        state, metrics = train_step(state, bx, by, base_rng)
                        timer.sync(metrics["loss"])
                else:
                    state, metrics = train_step(state, bx, by, base_rng)
                losses.append(metrics["loss"])
                accs.append(metrics["accuracy"])
                # drain the dispatch FIFO periodically: async dispatch lets
                # the host run an unbounded number of steps ahead, pinning
                # every in-flight batch buffer (measured: 8 GB streamed
                # corpus -> 11 GB RSS through the remote relay). One scalar
                # fetch bounds in-flight depth at ~sync window cost.
                if (tcfg.dispatch_sync_steps
                        and len(losses) % tcfg.dispatch_sync_steps == 0):
                    float(losses[-1])
            train_loss = float(jnp.mean(jnp.stack(losses)))
            train_acc = float(jnp.mean(jnp.stack(accs)))

            val = evaluate_feed(eval_step, state.params, valid_feed,
                                tcfg.batch_size, data_sharding,
                                prefetch_depth=tcfg.prefetch_depth,
                                assemble=assemble)
            epoch_time = time.perf_counter() - t0

            lr = get_learning_rate(state)
            new_lr = scheduler.step(val["loss"], lr)
            if new_lr != lr:
                state = set_learning_rate(state, new_lr)

            history["train_loss"].append(train_loss)
            history["train_acc"].append(train_acc)
            history["val_loss"].append(val["loss"])
            history["val_acc"].append(val["accuracy"])
            history["lr"].append(lr)
            history["epoch_time"].append(epoch_time)
            step_note = ""
            if timer is not None:
                et = np.asarray(timer.times[epoch_steps0:])
                # skip the first step of the first epoch (compile)
                if epoch == start_epoch and len(et) > 1:
                    et = et[1:]
                p50 = float(np.median(et)) if len(et) else float("nan")
                p90 = float(np.percentile(et, 90)) if len(et) else float("nan")
                history["step_p50"].append(p50)
                history["step_p90"].append(p90)
                step_note = f" step p50={p50 * 1e3:.1f}ms p90={p90 * 1e3:.1f}ms"

            if verbose:
                print(
                    f"epoch {epoch + 1}/{tcfg.num_epochs} "
                    f"train_loss={train_loss:.4f} train_acc={train_acc:.4f} "
                    f"val_loss={val['loss']:.4f} val_acc={val['accuracy']:.4f} "
                    f"lr={lr:.2e} ({epoch_time:.1f}s){step_note}"
                )

            result.state = state
            result.epochs_run = epoch + 1
            if epoch_callback is not None:
                epoch_callback(epoch, state, history)

            if early_stopping(val["loss"], state.params):
                result.stopped_early = True
                if verbose:
                    print(f"early stopping at epoch {epoch + 1}")
                break

    result.state = state
    if timer is not None:
        result.step_times = timer.summary()
    result.best_tracked = early_stopping.best_params is not None
    result.best_params = (
        early_stopping.best_params if result.best_tracked else state.params
    )
    result.history = history
    return result
