#!/bin/bash
# Round-3ab: (1) the Lp=64 point of the stash gate (rawiq_mp, seg-16
# mean-pool) — the boundary between the measured win (Lp<=32) and the
# measured neutral/loss (Lp>=80); (2) an end-to-end short-training A/B
# (vit_tiny, 12 epochs) stash vs recompute — trajectory-level evidence
# that the stash backward trains identically, on top of the grad-parity
# cosine.
set -u
cd "$(dirname "$0")/.."
run() { # arm batch [env...]
  local arm=$1 batch=$2; shift 2
  env "$@" timeout 2400 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.bench import bench_train_step
print(json.dumps(bench_train_step('$arm', $batch)))
"
}
echo "--- rawiq_mp (Lp=64) default (stash auto-off) ---"
run rawiq_mp 8192 2>&1 | tee /tmp/r3ab_lp64_off.log
echo "--- rawiq_mp (Lp=64) STASH=1 ---"
run rawiq_mp 8192 VITIQ_TRAIN_STASH=1 2>&1 | tee /tmp/r3ab_lp64_on.log

train_ab() { # stash-env-value tag
  env VITIQ_TRAIN_STASH=$1 timeout 3000 python -u -c "
from vitiq.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import json
from vitiq.config import ExperimentConfig
from vitiq.runner import run_training
cfg = ExperimentConfig.vit_tiny_2016(**{
    'data.synthetic_frames_per_class': 512,
    'data.synthetic_snr_db': (-8.0, 0.0, 8.0, 16.0),
    'model.numerics': 'tpu',
    'train.num_epochs': 12,
    'checkpoint_dir': '/tmp/r3ab_$2/ckpt',
    'log_dir': '/tmp/r3ab_$2/logs',
})
cfg.experiment_name = 'stash_ab_$2'
s = run_training(cfg, evaluate_test=True, verbose=False)
print(json.dumps({'tag': '$2',
                  'val_loss': [round(v, 4) for v in s['history']['val_loss']],
                  'val_acc': [round(v, 4) for v in s['history']['val_accuracy']],
                  'test_acc': s.get('test_accuracy')}))
"
}
echo "--- vit_tiny 12-epoch training, stash auto (on) ---"
train_ab auto on 2>&1 | tee /tmp/r3ab_train_on.log
echo "--- vit_tiny 12-epoch training, stash off ---"
train_ab 0 off 2>&1 | tee /tmp/r3ab_train_off.log
echo "ROUND3AB QUEUE COMPLETE"
