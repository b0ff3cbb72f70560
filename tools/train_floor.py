"""Training-step floor model: the fwd+bwd analogue of BASELINE.md's
per-config forward floor table (VERDICT r4 #1).

Idealization rules (same as the forward table):
  * dense matmuls at the v5e bf16 peak (197 TFLOP/s), at the PADDED token
    length for 896/1288 (stream pre-padded) — fwd + dgrad + wgrad = 3x fwd
    FLOPs;
  * flash attention at the composite D=64 floor: contractions over the
    64-deep head dim run at HALF MXU rate (QK fwd; s-recompute and dp in
    the bwd), contractions over the token extent at full rate (PV fwd;
    dq/dk/dv in the bwd). Fused bwd = 5 block matmuls (2 half + 3 full),
    see ops/attention.py::_bwd_fused_kernel_t;
  * remat_policy='mlp' recomputes fc1 (8*N*D^2/layer) in the bwd;
  * pure-HBM terms at 819 GB/s: Adam update over fp32 params+moments
    (read g,p,m,v; write p,m,v), the per-step fp32->bf16 param cast,
    the stacked-wgrad writes, the fused-bwd dq partial buffer
    (kv_steps+2 passes over a [B*H, kv_steps, D, Np] fp32 buffer), and
    the residual stash (write fwd / read bwd);
  * measured constants counted as-is (no meaningful floor): LN fwd+bwd,
    boundary copies, head/embed fwd+bwd, prepare_gt+loss.

Usage: python tools/train_floor.py   (pure host math, no device)
"""

from __future__ import annotations

import sys

PEAK = 197e12          # v5e bf16 TFLOP/s
HBM = 819e9            # v5e HBM bytes/s
DEPTH = 24             # ViT-L

# (name, true N, padded Np, D, mlp_ratio, kv_steps of the fused bwd —
# from ops/attention.py::_choose_bwd_blocks at this length)
CONFIGS = [
    ("multiHMR_896_L", 4097, 4224, 1024, 4, 1),
    ("multiHMR_1288_L_bedlam", 8465, 8704, 1024, 4, 4),
]

# measured constants (ms) from the round-5 profiler op tables
# (docs/PROFILE_TRAIN_*_r5.txt): [LN fwd, copies fwd, head+embed fwd]
MEASURED_FWD = {"multiHMR_896_L": (0.65, 0.11, 0.82),
                "multiHMR_1288_L_bedlam": (1.23, 0.22, 1.45)}

N_PARAMS = 319.9e6     # full model, fp32 master copy


def ms(x):
    return 1000.0 * x


def floor(name, n, np_, d, mlp, kv_steps, batch=1):
    heads = d // 64
    # ---- dense (per layer): qkv 6ND^2 + proj 2ND^2 + mlp 16ND^2 ----
    dense_fwd = 24 * np_ * d * d * DEPTH * batch
    t_dense_fwd = ms(dense_fwd / PEAK)
    t_dense_bwd = 2 * t_dense_fwd                      # dgrad + wgrad
    t_remat = ms(8 * np_ * d * d * DEPTH * batch / PEAK)  # fc1 recompute
    # ---- flash attention: per matmul 2*Np^2*D flops ----
    mm = 2.0 * np_ * np_ * d * DEPTH * batch
    half, full = ms(mm / (PEAK / 2)), ms(mm / PEAK)
    t_flash_fwd = half + full                          # QK + PV
    t_flash_bwd = 2 * half + 3 * full                  # s, dp + dq, dk, dv
    # ---- HBM terms ----
    t_adam = ms(7 * N_PARAMS * 4 / HBM)                # r: g,p,m,v  w: p,m,v
    t_cast = ms(N_PARAMS * (4 + 2) / HBM)              # fp32 read, bf16 write
    wgrad_bytes = 25.2e6 * 4 * DEPTH                   # stacked fp32 wgrads
    t_wgrad_dus = ms(wgrad_bytes / HBM)
    dqp_bytes = batch * heads * kv_steps * 64 * np_ * 4 * DEPTH
    t_dqp = ms(dqp_bytes * (1 + 2.0 / kv_steps) / HBM)  # kv_steps w + r + w
    stash_bytes = 4 * np_ * d * 2 * DEPTH * batch      # ~4 bf16 acts/layer
    t_stash = ms(2 * stash_bytes / HBM)
    # ---- measured-as-is ----
    ln_f, cp_f, head_f = MEASURED_FWD[name]
    t_const = ln_f * 3 + cp_f * 3 + head_f * 3 + 1.5   # +bwd~2x each, +loss/gt

    rows = [
        ("flash fwd (floor)", t_flash_fwd),
        ("flash bwd (floor, fused 5-matmul)", t_flash_bwd),
        ("dense fwd (roofline)", t_dense_fwd),
        ("dense bwd (roofline)", t_dense_bwd),
        ("remat fc1 recompute", t_remat),
        ("Adam update (HBM)", t_adam),
        ("param fp32->bf16 cast (HBM)", t_cast),
        ("stacked wgrad writes (HBM)", t_wgrad_dus),
        ("fused-bwd dq partials (HBM)", t_dqp),
        ("residual stash w+r (HBM)", t_stash),
        ("LN/copies/head/loss (measured)", t_const),
    ]
    total = sum(v for _, v in rows)
    print(f"\n{name}  batch={batch}  N={n}->Np={np_}  kv_steps={kv_steps}")
    for label, v in rows:
        print(f"  {label:38s} {v:8.2f} ms")
    print(f"  {'TOTAL floor':38s} {total:8.2f} ms")
    return total


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    for cfg in CONFIGS:
        floor(*cfg, batch=batch)
