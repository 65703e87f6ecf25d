#!/usr/bin/env python
"""Pass-arithmetic speed-of-light (SOL) for the served architectures.

The naive roofline (useful FLOPs / peak bf16 FLOPs) overstates the ceiling
for attention at small d_head: the MXU contracts in 128-deep passes, so a
score GEMM with K=d_head=16 pays the full 128-deep pass per output element
(8x its useful FLOPs). The repo's measured rule (docs/BENCHMARKS.md round
2.5: "MXU time tracks the ACTUAL N width, not ceil(N/128)") gives the cost
model used here, per [M,K]@[K,N] GEMM:

    effective_MACs = M * ceil(K/128) * 128 * N

(M and N actual; K padded to the 128-deep pass; narrow N is proportional,
NOT rounded up to a lane tile.) Summing every GEMM in the serving path and
dividing by v5e's peak MAC rate yields the fastest ANY kernel could run
this architecture on this chip — softmax/layernorm VPU time, HBM traffic,
and dispatch are all ON TOP of this floor, so %SOL below is an upper bound
on remaining kernel headroom.

Peak: v5e bf16 197 TFLOP/s = 98.5e12 MAC/s (public spec).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/pass_roofline.py
"""
import math

PEAK_MACS = 98.5e12  # v5e bf16: 197 TFLOP/s


def gemm(M, K, N):
    return M * math.ceil(K / 128) * 128 * N


def encoder_layer_macs(Lp, D, H, ffn, xpack=True):
    """Effective MACs per frame for one fused encoder layer (serving)."""
    c = gemm(Lp, D, 3 * D)              # QKV projection
    if xpack:
        c += gemm(Lp, D, H * Lp)        # packed block-diagonal scores
        c += gemm(Lp, H * Lp, D)        # packed block-diagonal PV
        c += gemm(Lp, H * Lp, H)        # ones-matrix denominators
    else:
        dh = D // H
        c += H * gemm(Lp, dh, Lp)       # per-head scores (K=dh pads to 128)
        c += H * gemm(Lp, Lp, dh)       # per-head PV
    c += gemm(Lp, D, D)                 # concat projection
    c += gemm(Lp, D, ffn) + gemm(Lp, ffn, D)
    return c


def serving_macs(L, D, H, ffn, n_layers, cls_only=True, xpack=True,
                 embed_macs=0):
    sub = 16  # bf16 sublane
    Lp = math.ceil(L / sub) * sub
    full = (n_layers - 1) if cls_only else n_layers
    c = full * encoder_layer_macs(Lp, D, H, ffn, xpack)
    if cls_only:
        # CLS-only last layer: single query row (rq=8 padded rows)
        rq = 8
        c += gemm(rq, D, 3 * D)
        if xpack:
            c += gemm(rq, D, H * Lp) + gemm(rq, H * Lp, D)
        else:
            dh = D // H
            c += H * (gemm(rq, dh, Lp) + gemm(rq, Lp, dh))
        c += gemm(rq, D, D) + gemm(rq, D, ffn) + gemm(rq, ffn, D)
    return c + embed_macs


CONFIGS = [
    # name, (L, D, H, ffn, layers, cls_only, xpack, embed), measured fps
    ("flagship ViT H8 (d128/L6, Lp144)",
     (129, 128, 8, 512, 6, True, True, gemm(128, 32, 128)), 142_229),
    ("flagship H4", (129, 128, 4, 512, 6, True, True,
                     gemm(128, 32, 128)), 175_100),
    ("flagship H2", (129, 128, 2, 512, 6, True, True,
                     gemm(128, 32, 128)), 201_600),
    ("rawIQ seg-16 (65 tok, ffn1024)",
     (65, 128, 8, 1024, 6, True, True, gemm(64, 32, 128)), 227_000),
    ("rawIQ seg-64 (17 tok)",
     (17, 128, 8, 1024, 6, True, True, gemm(16, 128, 128)), 631_225),
    # mean-pool readouts (use_cls_token=False, the reference's
    # transformer_rawIQ.py:88-93 mode): no CLS row -> token count lands ON
    # the sublane boundary, erasing the padded-row waste (seg-64: Lp 32->16
    # halves kernel-real M; seg-16: Lp 80->64). cls_only=False (mean needs
    # every token, so the last layer runs full).
    ("rawIQ seg-64 MEAN-POOL (16 tok, Lp16)",
     (16, 128, 8, 1024, 6, False, True, gemm(16, 128, 128)), 1_488_112),
    ("rawIQ seg-16 MEAN-POOL (64 tok, Lp64)",
     (64, 128, 8, 1024, 6, False, True, gemm(64, 32, 128)), 310_075),
    # conv1d serves through the CHAINED core (xpack VMEM-ineligible)
    ("conv1d H8 (1025 tok)",
     (1025, 128, 8, 1024, 6, True, False, gemm(1024, 6, 128)), 5_551),
    ("conv1d H2",
     (1025, 128, 2, 1024, 6, True, False, gemm(1024, 6, 128)), 15_446),
]


def main():
    print(f"{'config':38s} {'SOL fps':>10s} {'measured':>10s} {'%SOL':>6s}")
    for name, (L, D, H, ffn, nl, cls, xp, emb), meas in CONFIGS:
        macs = serving_macs(L, D, H, ffn, nl, cls, xp, emb)
        sol = PEAK_MACS / macs
        pct = 100.0 * meas / sol
        print(f"{name:38s} {sol:10,.0f} {meas:10,} {pct:5.1f}%")
    # what does 1M frames/s require?
    print("\n1M frames/s budget: <= 98.5e6 effective MACs/frame.")
    for name, (L, D, H, ffn, nl, cls, xp, emb), _ in CONFIGS[:3]:
        macs = serving_macs(L, D, H, ffn, nl, cls, xp, emb)
        print(f"  {name}: {macs/1e6:.1f}M MACs/frame "
              f"-> architecture ceiling {PEAK_MACS/macs/1e3:,.0f}K fps")


if __name__ == "__main__":
    main()
