"""Numerical-parity harness against the torch reference.

Runs a converted reference checkpoint over a folder of images and compares
the outputs with reference-side dumps (produced separately by running the
torch reference and saving its person dicts with numpy). Reports per-stage
deltas so conversion bugs localize quickly.

Usage (when checkpoints + SMPL-X assets are available):

  # 1. On the reference side, save outputs per image:
  #    np.savez(out.npz, v3d_0=..., j2d_0=..., scores_0=..., ...)  (index = person)
  # 2. Here:
  python tools/parity_harness.py --ckpt multiHMR_896_L.pt \
      --img_folder example_data --reference_dumps ref_dumps/ \
      [--model_name multiHMR_896_L] [--fov 60]

Exit code 0 iff max PVE delta < 0.5 mm (the BASELINE.md fidelity bar).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--img_folder", required=True)
    p.add_argument("--reference_dumps", required=True)
    p.add_argument("--model_name", default="multiHMR_896_L")
    p.add_argument("--fov", type=float, default=60)
    p.add_argument("--det_thresh", type=float, default=0.3)
    p.add_argument("--nms_kernel_size", type=int, default=3)
    p.add_argument("--tol_mm", type=float, default=0.5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multihmr_tpu.factory import build_model
    from multihmr_tpu.io.preprocessing import open_image, get_camera_parameters

    model, params = build_model(args.model_name, checkpoint=args.ckpt)
    assert params is not None
    fwd = jax.jit(
        lambda p, x, K: model.forward(
            p, x, K, det_thresh=args.det_thresh, nms_kernel_size=args.nms_kernel_size
        )
    )
    K = jnp.asarray(get_camera_parameters(model.cfg.img_size, fov=args.fov))

    worst = 0.0
    n_imgs = 0
    count_mismatches = 0
    for name in sorted(os.listdir(args.img_folder)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        dump_path = os.path.join(
            args.reference_dumps, os.path.splitext(name)[0] + ".npz"
        )
        if not os.path.exists(dump_path):
            print(f"[skip] no reference dump for {name}")
            continue
        ref = np.load(dump_path)
        x, _ = open_image(os.path.join(args.img_folder, name), model.cfg.img_size)
        out = fwd(params, jnp.asarray(x), K)
        persons = model.extract_persons(out)[0]
        n_ref = len([k for k in ref.files if k.startswith("v3d_")])
        print(f"{name}: ours {len(persons)} persons, reference {n_ref}")
        n_imgs += 1
        if len(persons) != n_ref:
            # a count mismatch IS a parity failure — without this, a model
            # detecting 0 people would sail past the PVE gate untested
            count_mismatches += 1
            print(f"  [FAIL] person-count mismatch ({len(persons)} vs {n_ref})")
        for i in range(min(len(persons), n_ref)):
            v_ref = ref[f"v3d_{i}"]
            v_ours = np.asarray(persons[i]["v3d"])
            pel_ref = ref[f"transl_pelvis_{i}"].reshape(1, 3)
            pel_ours = np.asarray(persons[i]["transl_pelvis"]).reshape(1, 3)
            pve = 1000 * np.linalg.norm(
                (v_ours - pel_ours) - (v_ref - pel_ref), axis=-1
            ).mean()
            worst = max(worst, pve)
            marker = "OK " if pve < args.tol_mm else "FAIL"
            print(f"  person {i}: PVE delta {pve:.3f} mm [{marker}]")
            if f"scores_{i}" in ref.files:
                ds = abs(float(persons[i]["scores"]) - float(ref[f"scores_{i}"]))
                print(f"             score delta {ds:.5f}")

    if n_imgs == 0:
        print("no dumps compared — provide --reference_dumps produced from the torch side")
        sys.exit(2)
    print(
        f"\nmax PVE delta: {worst:.3f} mm (tolerance {args.tol_mm}); "
        f"{count_mismatches} image(s) with person-count mismatch"
    )
    sys.exit(0 if worst < args.tol_mm and count_mismatches == 0 else 1)


if __name__ == "__main__":
    main()
