#!/usr/bin/env python
"""Pass-arithmetic speed-of-light (SOL) for the fused TRAINING step.

The serving audit (scripts/pass_roofline.py) closed round 3h by showing every
served shape runs at 42-61% of its MXU pass floor and that the remaining
levers are GEOMETRY (padded rows / pass counts), not kernel scheduling. This
script applies the same methodology to the training path (ROADMAP: "the
ceiling-audit methodology applied to the training path").

Cost model per [M,K]@[K,N] GEMM (docs/BENCHMARKS.md round-2.5 measured rule —
M and N actual, K padded to the 128-deep MXU pass):

    effective_MACs = M * ceil(K/128) * 128 * N

GEMM inventory = exactly the dot_generals in
vitiq/ops/pallas/fused_layer_train.py (_fwd_kernel / _bwd_kernel /
_attention_fwd) at the default knobs (VITIQ_TRAIN_TAIL=0, EPI=wide,
PB=recompute), plus the recompute the backward performs.

KEY STRUCTURAL FINDING this model surfaces: every weight-grad GEMM
(dWqkv/dWo/dW1/dW2) contracts over the TOKEN dimension per frame
(dot_general batched over the G block, summed after), so its contraction
depth is Lp — padded to ceil(Lp/128)*128. At seg-64 (Lp=16) that is an 8x
pass penalty on every dW, and dW terms dominate the backward. Merging the
G block into the contraction ([G,Lp,C] -> [G*Lp,C], one unbatched GEMM,
no sum) amortizes the pad across the block: K = ceil(G*Lp/128)*128 / G per
frame. The 'merged' column below is the ceiling that rewrite unlocks;
dk/dv cannot merge (k,v are frame-local activations).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/train_roofline.py
"""
import math

PEAK_MACS = 98.5e12  # v5e bf16: 197 TFLOP/s


def gemm(M, K, N):
    return M * math.ceil(K / 128) * 128 * N


def kpad(rows):
    return math.ceil(rows / 128) * 128


def fwd_layer_macs(Lp, D, H, ffn):
    """One fused train layer forward (also the backward's recompute)."""
    dh = D // H
    ntiles = math.ceil(Lp / 128)
    c = gemm(Lp, D, 3 * D)                      # QKV projection
    c += H * Lp * kpad(dh) * Lp                 # per-head score tiles (K=dh)
    c += H * Lp * ntiles * 128 * (dh + 1)       # PV (+ones denom column)
    c += 2 * gemm(Lp, H, D)                     # wide-divide den_expand (hi/lo)
    c += gemm(Lp, D, D)                         # concat projection
    c += gemm(Lp, D, ffn) + gemm(Lp, ffn, D)    # FFN
    return c


def bwd_layer_macs(Lp, D, H, ffn, G, dw_mode="batched"):
    """One fused train layer backward at batch block G (per-frame MACs)."""
    dh = D // H
    ntiles = math.ceil(Lp / 128)
    c = fwd_layer_macs(Lp, D, H, ffn)           # in-kernel recompute

    # weight grads: contraction over token rows
    if dw_mode == "batched":                    # current kernel: per-frame Lp
        kw = kpad(Lp)
    else:                                       # merged G*Lp contraction
        kw = kpad(G * Lp) / G
    c += ffn * kw * D                           # dW2
    c += D * kw * ffn                           # dW1
    c += D * kw * D                             # dWo
    c += D * kw * 3 * D                         # dWqkv

    # activation grads
    c += gemm(Lp, D, ffn)                       # dh = df @ W2^T
    c += gemm(Lp, ffn, D)                       # dx1 += dpre @ W1^T
    c += gemm(Lp, D, D)                         # dattn = da @ Wo^T
    c += gemm(Lp, 3 * D, D)                     # dx += dqkv @ Wqkv^T
    # attention backward, per head (chained core):
    c += H * Lp * kpad(dh) * Lp                 # score recompute (K=dh)
    c += H * Lp * kpad(dh) * Lp                 # dp = dout @ V^T (K=dh)
    c += H * Lp * ntiles * 128 * dh             # dq = ds @ K  (K=tile width)
    # dk/dv contract over Lq rows — frame-local, CANNOT merge G
    c += 2 * H * Lp * kpad(Lp) * dh             # dk = ds^T q ; dv = p^T dout
    return c


def step_macs(Lp, D, H, ffn, n_layers, G, embed, dw_mode="batched"):
    """fwd pass + bwd pass per frame (head/loss/AdamW are negligible;
    embedding fwd counted, embedding bwd approximated as 2x fwd)."""
    per_layer = fwd_layer_macs(Lp, D, H, ffn) + bwd_layer_macs(
        Lp, D, H, ffn, G, dw_mode)
    return n_layers * per_layer + 3 * embed


# name, (Lp, D, H, ffn, layers, G, embed_macs), measured train fps @ 2048
CONFIGS = [
    ("flagship ViT H8 (Lp144, ffn512, G=2)",
     (144, 128, 8, 512, 6, 2, gemm(128, 32, 128)), 13_644),
    ("flagship H4", (144, 128, 4, 512, 6, 2, gemm(128, 32, 128)), 17_365),
    ("flagship H2", (144, 128, 2, 512, 6, 2, gemm(128, 32, 128)), 20_106),
    # 47,382 = round-3m merged-dW default (batched measured 42,812)
    ("seg-64 MEAN-POOL (Lp16, ffn1024, G=16)",
     (16, 128, 8, 1024, 6, 16, gemm(16, 128, 128)), 47_382),
    ("rawIQ seg-16 CLS (Lp80, ffn1024, G=4)",
     (80, 128, 8, 1024, 6, 4, gemm(64, 32, 128)), 21_083),
]


def main():
    print(f"{'config':42s} {'SOL':>8s} {'meas':>7s} {'%SOL':>5s} "
          f"{'SOL-merged':>10s} {'dW%':>5s}")
    for name, (Lp, D, H, ffn, nl, G, emb), meas in CONFIGS:
        macs = step_macs(Lp, D, H, ffn, nl, G, emb)
        macs_m = step_macs(Lp, D, H, ffn, nl, G, emb, dw_mode="merged")
        sol = PEAK_MACS / macs
        sol_m = PEAK_MACS / macs_m
        kw = kpad(Lp)
        dw = nl * (ffn * kw * D + D * kw * ffn + D * kw * D + D * kw * 3 * D)
        pct = f"{100.0 * meas / sol:5.1f}" if meas else "    -"
        print(f"{name:42s} {sol/1e3:7.1f}K {str(meas or '-'):>7s} {pct} "
              f"{sol_m/1e3:9.1f}K {100.0*dw/macs:5.1f}")
    print("""
Columns: SOL = pass-arithmetic ceiling of the CURRENT kernel structure
(batched dW); %SOL = measured/SOL; SOL-merged = ceiling if the four dW
GEMMs contract over the merged [G*Lp] rows; dW%% = share of step passes
spent in the (batched) dW GEMMs.""")


if __name__ == "__main__":
    main()
