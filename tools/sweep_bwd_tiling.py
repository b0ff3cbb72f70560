"""Sweep (block_q, block_kv) tilings of the fused flash-attention BACKWARD.

Round 4's forward sweep (tools/sweep_tiling.py) found the mono-kv upgrade;
the backward never got the same treatment (BASELINE.md attributes it at
+11%/+7.5% over its composite floor). The structural lever here is
different: the fused kernel emits per-kv-block dq PARTIALS into a
``[B·H, kv_steps, Dh, Np]`` fp32 HBM buffer summed outside
(ops/attention.py::_flash_bwd_impl_t), so FEWER kv steps (larger block_kv)
cut that buffer's write+read traffic linearly — at the price of smaller
q blocks once the fp32 [bkv, bq] score tiles hit the VMEM roof. This
sweeps the feasible grid at the ViT-L training shapes and prints a table;
candidates that exceed VMEM fail to compile and are reported as such.

Usage:
  python tools/sweep_bwd_tiling.py [--shapes 4097 8465] [--iters 6]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# true kv_len -> candidate (block_q, block_kv) pairs over the padded length's
# 128-multiple divisors (4097 -> 4224: 128/384/1408/4224; 8465 -> 8704:
# 128/256/512/2176/4352/8704). None = the production default chooser.
CANDIDATES = {
    4097: [None, (128, 1408), (384, 384), (128, 4224), (384, 4224),
           (1408, 384), (128, 384)],
    8465: [None, (256, 2176), (128, 4352), (256, 4352), (128, 8704),
           (512, 512), (2176, 512), (128, 2176)],
}


def bwd_flops(H, N, D=64):
    # 5 block matmuls (s, dp, dv, dk, dq) of 2·N²·D each per head
    return 5 * 2 * N * N * D * H


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", nargs="*", type=int, default=[4097, 8465])
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--heads", type=int, default=16)
    args = p.parse_args()

    import jax

    if jax.default_backend() in ("tpu", "axon"):
        from multihmr_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()
    import jax.numpy as jnp

    from multihmr_tpu.ops.attention import (
        _flash_bwd_impl_t,
        _flash_fwd_impl_t,
        _choose_bwd_blocks,
    )
    from multihmr_tpu.utils.profiling import latency_stats

    D, H = 64, args.heads
    for N in args.shapes:
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        q, k, v, do = (jax.random.normal(kk, (1, H, D, N), jnp.bfloat16)
                       for kk in keys)
        o, lse = _flash_fwd_impl_t(q, k, v)
        jax.block_until_ready((o, lse))
        dflt = _choose_bwd_blocks(N)
        print(f"# N={N} (padded {dflt[0]}), default blocks bq={dflt[1]} "
              f"bkv={dflt[2]}, flops/call {bwd_flops(H, N) / 1e12:.2f} T")
        for cand in CANDIDATES.get(N, [None]):
            bq, bkv = cand if cand else (None, None)
            label = f"bq={bq or dflt[1]:>5} bkv={bkv or dflt[2]:>5}" + (
                " (default)" if cand is None else "")
            def fn(q, k, v, o, lse, do, _bq=bq, _bkv=bkv):
                return _flash_bwd_impl_t(q, k, v, o, lse, do,
                                         block_q=_bq, block_kv=_bkv)
            try:
                r = latency_stats(fn, (q, k, v, o, lse, do),
                                  iters=args.iters)
                ms = r["p50_ms"]
                tf = bwd_flops(H, N) / (ms * 1e-3) / 1e12
                print(f"{label}: {ms:7.3f} ms  {tf:6.1f} TFLOP/s")
            except Exception as e:  # VMEM overflow / compile failure
                msg = str(e).splitlines()[0][:110]
                print(f"{label}: FAILED — {msg}")


if __name__ == "__main__":
    main()
