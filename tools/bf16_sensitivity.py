"""bf16-backbone sensitivity study: how many millimetres of vertex error
does the bf16 ViT contribute, against the 0.5 mm PVE parity bar?

The precision policy (utils/precision.py: bf16 backbone weights/compute,
fp32 geometry) is asserted safe by golden tests at fp32 tolerances, but
when real weights arrive a parity failure must be triaged as bug vs
quantization — that needs this number IN ADVANCE (VERDICT r4 #5).

Method: identical params, identical images, identical person slots — the
detections are INJECTED via ``gt_det`` so both precisions regress the very
same query cells and the measured delta is purely the backbone's precision
(a thresholded detection path could pick different slots near ties, which
would compare different people, not different arithmetic). The fp32
reference side is a TRUE fp32-compute model (``compute_dtype="float32"``
via dataclasses.replace — NOT merely fp32 param storage, which the module
would silently cast to the config's bf16 compute dtype at use); both sides
run the SAME transposed flash kernel so the delta is purely arithmetic
dtype, not algorithm. Per valid slot, the fp32-backbone forward vs
bf16-backbone forward v3d delta is reported raw (includes the exp-decoded
camera distance, the most bf16-sensitive output) and pelvis-centered (the
PVE the parity bar is defined on, reference train.py:373-385).

Caveat: random init — real checkpoints have sharper feature distributions;
this measures the architecture's precision conditioning, re-runnable on
real weights the day they arrive (pass --ckpt).

Usage:
  python tools/bf16_sensitivity.py [--configs multiHMR_672_S,...]
      [--images 2] [--seeds 2] [--persons 3] [--no-merge]

Prints one JSON line per config and merges a ``bf16_sensitivity`` block
into BENCH_SWEEP.json unless --no-merge.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CONFIGS = (
    "multiHMR_672_S",
    "multiHMR_672_B",
    "multiHMR_672_L",
    "multiHMR_896_L",
    "multiHMR_1288_L_bedlam",
)


def run_config(name: str, n_images: int, n_seeds: int, n_persons: int,
               ckpt: str = None) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from multihmr_tpu.config import named_config
    from multihmr_tpu.factory import build_model
    from multihmr_tpu.ops.detection import Detections
    from multihmr_tpu.utils.precision import cast_backbone_bf16

    model, params0 = build_model(name, checkpoint=ckpt)   # production bf16
    model32, _ = build_model(
        name, cfg=dataclasses.replace(named_config(name),
                                      compute_dtype="float32"),
        checkpoint=ckpt)                                   # true-fp32 compute
    cfg = model.cfg
    S, g, Kcap = cfg.img_size, cfg.grid_size, cfg.max_people
    f = (S / 2.0) / np.tan(np.radians(60.0) / 2.0)
    Kmat = jnp.asarray(
        [[[f, 0, S / 2], [0, f, S / 2], [0, 0, 1.0]]], jnp.float32)

    # injected detections: n_persons distinct central-ish cells, static
    # across precisions → both forwards regress the same query slots
    rng = np.random.default_rng(0)
    cells = rng.choice(g * g // 2, size=n_persons, replace=False) + g * g // 4
    rows = np.zeros((1, Kcap), np.int32)
    cols = np.zeros((1, Kcap), np.int32)
    rows[0, :n_persons] = cells // g
    cols[0, :n_persons] = cells % g
    valid = np.zeros((1, Kcap), np.float32)
    valid[0, :n_persons] = 1.0
    det = Detections(
        rows=jnp.asarray(rows), cols=jnp.asarray(cols),
        scores=jnp.asarray(valid), valid=jnp.asarray(valid),
    )

    fwd16 = jax.jit(
        lambda p, x: model.forward(
            p, x, Kmat, is_training=True, gt_det=det, batch_mode="fused"
        )
    )
    fwd32 = jax.jit(
        lambda p, x: model32.forward(
            p, x, Kmat, is_training=True, gt_det=det, batch_mode="fused"
        )
    )

    raw_mm, centered_mm = [], []
    for seed in range(n_seeds):
        params = (params0 if ckpt is not None
                  else model.init_params(jax.random.PRNGKey(seed)))
        params_bf16 = cast_backbone_bf16(params)
        for img in range(n_images):
            x = jax.random.normal(
                jax.random.PRNGKey(1000 + seed * 100 + img), (1, S, S, 3),
                jnp.float32)
            out32 = fwd32(params, x)
            out16 = fwd16(params_bf16, x)
            v32 = np.asarray(out32["v3d"][0, :n_persons], np.float64)
            v16 = np.asarray(out16["v3d"][0, :n_persons], np.float64)
            p32 = np.asarray(out32["transl_pelvis"][0, :n_persons], np.float64
                             ).reshape(n_persons, 1, 3)
            p16 = np.asarray(out16["transl_pelvis"][0, :n_persons], np.float64
                             ).reshape(n_persons, 1, 3)
            # per-person mean vertex delta in mm
            raw = 1000.0 * np.linalg.norm(v32 - v16, axis=-1).mean(-1)
            cen = 1000.0 * np.linalg.norm(
                (v32 - p32) - (v16 - p16), axis=-1).mean(-1)
            raw_mm.extend(raw.tolist())
            centered_mm.extend(cen.tolist())

    def stats(v):
        a = np.asarray(v)
        return {"p50": round(float(np.percentile(a, 50)), 3),
                "p99": round(float(np.percentile(a, 99)), 3),
                "max": round(float(a.max()), 3)}

    return {
        "config": name,
        "samples": len(raw_mm),
        "v3d_raw_mm": stats(raw_mm),          # includes exp-decoded distance
        "v3d_pelvis_centered_mm": stats(centered_mm),  # the PVE-bar quantity
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default=",".join(DEFAULT_CONFIGS))
    p.add_argument("--images", type=int, default=2)
    p.add_argument("--seeds", type=int, default=2)
    p.add_argument("--persons", type=int, default=3)
    p.add_argument("--ckpt", default=None,
                   help="real checkpoint (re-run the study on real weights)")
    p.add_argument("--no-merge", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from multihmr_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    results = {}
    for name in args.configs.split(","):
        r = run_config(name.strip(), args.images, args.seeds, args.persons,
                       ckpt=args.ckpt)
        results[name.strip()] = r
        print(json.dumps(r), flush=True)

    if not args.no_merge:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_SWEEP.json")
        with open(path) as f:
            sweep = json.load(f)
        sweep["results"]["bf16_sensitivity"] = {
            "weights": "random-init" if args.ckpt is None else args.ckpt,
            "per_config": results,
        }
        with open(path, "w") as f:
            json.dump(sweep, f, indent=1)
        print(f"# merged into {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
