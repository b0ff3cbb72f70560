"""Dump per-image torch-reference outputs for tools/parity_harness.py.

Runs the ACTUAL reference implementation (demo.py pipeline at
/root/reference or --reference_dir) on a folder of images with a real
``multiHMR_*.pt`` checkpoint + SMPL-X assets, and writes one npz per image
with the person dicts keyed ``{field}_{person_idx}`` — exactly the format
``tools/parity_harness.py --reference_dumps`` consumes. With this script the
parity check is one command on each side:

  # torch side (reference env: torch + smplx + roma + assets):
  python tools/dump_reference_outputs.py --ckpt multiHMR_896_L.pt \
      --img_folder /root/reference/example_data --out ref_dumps/

  # jax side (this repo):
  python tools/parity_harness.py --ckpt multiHMR_896_L.pt \
      --img_folder /root/reference/example_data --reference_dumps ref_dumps/

Mirrors reference demo.py:27-126 (open_image → K from fov → forward_model);
fields per person follow reference model.py:328-347.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

FIELDS = (
    "scores", "loc", "transl", "transl_pelvis", "rotvec", "expression",
    "shape", "v3d", "j3d", "j2d",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="multiHMR_*.pt checkpoint")
    p.add_argument("--img_folder", required=True)
    p.add_argument("--out", required=True, help="output folder for npz dumps")
    p.add_argument("--reference_dir", default="/root/reference")
    p.add_argument("--fov", type=float, default=60)
    p.add_argument("--det_thresh", type=float, default=0.3)
    p.add_argument("--nms_kernel_size", type=int, default=3)
    p.add_argument(
        "--stages", action="store_true",
        help="also dump per-stage intermediates (backbone tokens, detection "
        "logits, HPH outputs) via forward hooks, as stage_* keys — "
        "tools/parity_harness.py compares them for stage-localized deltas",
    )
    args = p.parse_args()

    sys.path.insert(0, os.path.abspath(args.reference_dir))
    import torch
    from demo import open_image, get_camera_parameters, forward_model

    device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
    # Rebuild exactly as reference demo.py:87-103: ckpt['args'] → kwargs,
    # Model/ModelAnny dispatch on the path, strict=False weight load. (We
    # inline it because demo.load_model only resolves NAMES under its cache
    # dir, not local paths.)
    ckpt = torch.load(args.ckpt, map_location=device, weights_only=False)
    kwargs = dict(vars(ckpt["args"]))
    if "anny" in os.path.basename(args.ckpt):
        from multi_hmr_anny.multi_hmr import Multi_HMR as ModelAnny

        model = ModelAnny(**kwargs).to(device)
    else:
        from model import Model

        kwargs["type"] = ckpt["args"].train_return_type
        kwargs["img_size"] = ckpt["args"].img_size[0]  # stored as a list
        model = Model(**kwargs).to(device)
    model.load_state_dict(ckpt["model_state_dict"], strict=False)
    model.eval()

    # --stages: capture intermediates at the same boundaries the jax side
    # reads (tools/parity_harness.py capture_stages): backbone output
    # (reference model.py:229), mlp_classif logits (model.py:135), HPH
    # output tuple (model.py:281).
    stage: dict = {}
    if args.stages and hasattr(model, "backbone"):
        model.backbone.register_forward_hook(
            lambda m, i, o: stage.__setitem__("backbone", o)
        )
        model.mlp_classif.register_forward_hook(
            lambda m, i, o: stage.__setitem__("det_logits", o)
        )
        model.x_attention_head.register_forward_hook(
            lambda m, i, o: stage.__setitem__("hph", o)
        )

    os.makedirs(args.out, exist_ok=True)
    img_size = kwargs["img_size"] if isinstance(kwargs["img_size"], int) \
        else kwargs["img_size"][0]
    for name in sorted(os.listdir(args.img_folder)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        x, _ = open_image(os.path.join(args.img_folder, name), img_size, device=device)
        K = get_camera_parameters(img_size, fov=args.fov, device=device)
        humans = forward_model(
            model, x, K,
            det_thresh=args.det_thresh, nms_kernel_size=args.nms_kernel_size,
        )
        dump = {}
        for i, h in enumerate(humans):
            for f in FIELDS:
                if f in h:
                    dump[f"{f}_{i}"] = h[f].detach().cpu().numpy()
        if stage:
            np_ = lambda t: t.detach().cpu().float().numpy()
            dump["stage_backbone"] = np_(stage["backbone"])[0]  # [N, D]
            dump["stage_det_logits"] = np_(stage["det_logits"])[0, :, 0]
            pred_smpl, pred_cam = stage["hph"]
            dump["stage_hph_rotmat"] = np_(
                torch.cat(
                    [pred_smpl["global_orient"], pred_smpl["body_pose"]], 1
                )
            )  # [P, nrot, 3, 3] in person (detection) order
            dump["stage_hph_betas"] = np_(pred_smpl["betas"])
            dump["stage_hph_cam"] = np_(pred_cam)[:, 0]
            stage.clear()
        out_path = os.path.join(args.out, os.path.splitext(name)[0] + ".npz")
        np.savez(out_path, **dump)
        print(f"{name}: {len(humans)} persons -> {out_path}")


if __name__ == "__main__":
    main()
