"""Evaluation harness — the analogue of reference train.py:336-482.

Per image: forward the model, greedily match predicted people to GT in 2D,
accumulate PVE / PA-PVE (and MPJPE / PA-MPJPE via the H36M regressor for
3DPW), plus precision/recall/F1 from the matching.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from multihmr_tpu.train.metrics import (
    match_2d_greedy,
    compute_prf1,
    pve as pve_fn,
    pa_pve,
    AverageMeter,
)
from multihmr_tpu.ops.camera import perspective_projection
from multihmr_tpu.bodymodel.constants import H36M_TO_J14


def make_smplx_gt_forward(body_model, num_betas: int = 11, capacity: int = 16):
    """GT forward for datasets that store SMPL-X parameters (BEDLAM):
    annot['humans'] entries with smplx_* keys → v3d/j3d/j2d dict.
    The jit'd body-model forward is shared with the training path.

    Static shapes: persons are padded to a fixed ``capacity`` (and chunked
    when an image has more), so the forward compiles EXACTLY ONCE no matter
    how person counts vary across the dataset — a per-count ``[P, ...]``
    signature would pay the slow remote TPU compile for every distinct count
    (the same [B, K]-padding idiom the rest of the framework uses; the
    reference tolerates the dynamic shape because torch re-traces for free,
    train.py:351-357).
    """
    from multihmr_tpu.bodymodel.core import lbs_forward
    from multihmr_tpu.ops.rotations import rotvec_to_rotmat

    trace_counter = {"n": 0}  # introspection for tests: executes at TRACE time

    @jax.jit
    def _fwd(pose, shape, transl, K):  # fixed [capacity, ...] signature
        trace_counter["n"] += 1
        rots = rotvec_to_rotmat(pose)
        out = lbs_forward(body_model, rots, shape)
        v3d = out["vertices"] + transl[:, None]
        j3d = out["joints"] + transl[:, None]
        j2d = perspective_projection(j3d, K[None])
        return v3d, j3d, j2d

    def gt_forward(annot):
        humans = annot["humans"]
        pose = np.stack(
            [
                np.concatenate(
                    [h["smplx_root_pose"], h["smplx_body_pose"], h["smplx_jaw_pose"],
                     h["smplx_leye_pose"], h["smplx_reye_pose"],
                     h["smplx_left_hand_pose"], h["smplx_right_hand_pose"]], 0)
                for h in humans
            ]
        ).astype(np.float32)
        shape = np.stack([h["smplx_shape"][:num_betas] for h in humans]).astype(
            np.float32
        )
        transl = np.stack([h["smplx_transl"] for h in humans]).astype(np.float32)
        P = pose.shape[0]
        K = jnp.asarray(annot["K"])
        chunks = []
        for s in range(0, P, capacity):
            n = min(capacity, P - s)
            pad = ((0, capacity - n),) + ((0, 0),) * (pose.ndim - 1)
            v3d, j3d, j2d = _fwd(
                jnp.asarray(np.pad(pose[s : s + n], pad)),
                jnp.asarray(np.pad(shape[s : s + n], ((0, capacity - n), (0, 0)))),
                jnp.asarray(np.pad(transl[s : s + n], ((0, capacity - n), (0, 0)))),
                K,
            )
            chunks.append(
                (np.asarray(v3d)[:n], np.asarray(j3d)[:n], np.asarray(j2d)[:n])
            )
        v3d, j3d, j2d = (np.concatenate(parts) for parts in zip(*chunks))
        return {"v3d": v3d, "j3d": j3d, "j2d": j2d}

    gt_forward.trace_counter = trace_counter
    return gt_forward


def make_smpl_gt_forward(body_models: Dict[str, Any], capacity: int = 16):
    """GT forward for datasets that store GENDERED SMPL parameters (3DPW):
    annot['humans'] entries with smpl_* keys + smpl_gender → v3d [P,6890,3] /
    j3d [P,24,3] / j2d. The reference keeps one smpl layer per gender and
    dispatches per person (train.py:58-96, 351-357); here each gender gets
    ONE fixed-[capacity] jit program (static shapes — same idiom as
    ``make_smplx_gt_forward``) and persons are regrouped by gender, then
    scattered back to their original order.

    Note for consumers: GT vertices are SMPL topology (6890) — comparing
    against SMPL-X predictions requires the ``smplx2smpl`` regressor
    (reference train.py:383-384); without it 3DPW PVE is undefined.
    """
    from multihmr_tpu.bodymodel.core import lbs_forward
    from multihmr_tpu.ops.rotations import rotvec_to_rotmat

    def _make(bm):
        @jax.jit
        def _fwd(pose, shape, transl, K):  # [capacity, 24, 3], [capacity, B]
            rots = rotvec_to_rotmat(pose)
            out = lbs_forward(bm, rots, shape)
            v3d = out["vertices"] + transl[:, None]
            j3d = out["joints"] + transl[:, None]
            j2d = perspective_projection(j3d, K[None])
            return v3d, j3d, j2d

        return _fwd

    fwds = {g: _make(bm) for g, bm in body_models.items()}

    def gt_forward(annot):
        humans = annot["humans"]
        K = jnp.asarray(annot["K"])
        outs = [None] * len(humans)
        for g, fwd in fwds.items():
            idxs = [i for i, h in enumerate(humans) if h["smpl_gender"] == g]
            if not idxs:
                continue
            pose = np.stack(
                [
                    np.concatenate(
                        [humans[i]["smpl_root_pose"],
                         humans[i]["smpl_body_pose"]], 0)
                    for i in idxs
                ]
            ).astype(np.float32)
            shape = np.stack(
                [humans[i]["smpl_shape"] for i in idxs]
            ).astype(np.float32)
            transl = np.stack(
                [humans[i]["smpl_transl"] for i in idxs]
            ).astype(np.float32)
            for s in range(0, len(idxs), capacity):
                m = min(capacity, len(idxs) - s)
                pad3 = ((0, capacity - m), (0, 0), (0, 0))
                pad2 = ((0, capacity - m), (0, 0))
                v3d, j3d, j2d = fwd(
                    jnp.asarray(np.pad(pose[s : s + m], pad3)),
                    jnp.asarray(np.pad(shape[s : s + m], pad2)),
                    jnp.asarray(np.pad(transl[s : s + m], pad2)),
                    K,
                )
                v3d, j3d, j2d = (np.asarray(a)[:m] for a in (v3d, j3d, j2d))
                for k, i in enumerate(idxs[s : s + m]):
                    outs[i] = (v3d[k], j3d[k], j2d[k])
        v3d, j3d, j2d = (np.stack(parts) for parts in zip(*outs))
        return {"v3d": v3d, "j3d": j3d, "j2d": j2d}

    return gt_forward


def _save_eval_visu(visu_dir, idx, x, annot, persons, gt, faces):
    """Save an [input | prediction | GT] triptych for eval debugging."""
    import os

    from multihmr_tpu.ops.image import IMG_NORM_MEAN, IMG_NORM_STD
    from multihmr_tpu.render import render_meshes

    os.makedirs(visu_dir, exist_ok=True)
    img = np.clip((np.asarray(x) * IMG_NORM_STD + IMG_NORM_MEAN) * 255, 0, 255).astype(
        np.uint8
    )
    K = np.asarray(annot["K"])
    pred_arr = render_meshes(
        img, [np.asarray(p["v3d"]) for p in persons], [faces] * len(persons), K
    )
    gt_arr = render_meshes(img, list(gt["v3d"]), [faces] * len(gt["v3d"]), K)
    strip = np.concatenate([img, pred_arr, gt_arr], axis=1)
    try:
        from PIL import Image

        Image.fromarray(strip).save(os.path.join(visu_dir, f"eval_{idx:04d}.png"))
    except ImportError:  # pragma: no cover
        np.save(os.path.join(visu_dir, f"eval_{idx:04d}.npy"), strip)


def _project_np(j3d: np.ndarray, K: np.ndarray) -> np.ndarray:
    """``perspective_projection`` in host numpy (K·(x/z), utils/camera.py:14-27)
    — GT never touches the device: through a remote-TPU link every eager
    device op in the per-image loop costs a ~25 ms round trip."""
    y = j3d / j3d[..., -1:]
    return np.einsum("ij,...kj->...ki", np.asarray(K, np.float64), y)[..., :2]


def evaluate_dataset(
    model,
    params,
    dataset,
    det_thresh: float = 0.3,
    nms_kernel_size: int = 3,
    smplx2smpl: Optional[np.ndarray] = None,  # [6890, 10475] for 3DPW
    J_regressor_h36m: Optional[np.ndarray] = None,  # [17, 6890]
    gt_forward: Optional[Callable] = None,
    max_images: Optional[int] = None,
    log_every: int = 50,
    log_fn=print,
    visu_to_save: int = 0,
    visu_dir: str = "eval_visu",
    faces: Optional[np.ndarray] = None,
    pipeline: Optional[bool] = None,
) -> Dict[str, float]:
    """Run eval over a dataset yielding (image NHWC, annot dict).

    ``gt_forward(annot) -> dict(v3d [P,V,3], j3d [P,J,3], j2d [P,J,2])``
    supplies GT meshes for datasets that store parameters rather than
    vertices; EHF-style datasets with ``smplx_vertices`` are handled
    natively (GT joints regressed with the model's J_regressor, reference
    train.py:72-74).

    TPU-native loop shape (vs the reference's strictly serial
    train.py:351-357): with ``pipeline=True`` image *i+1*'s forward is
    DISPATCHED before image *i*'s result is pulled back, so the device
    computes while the host matches/scores. ``pipeline=None`` (default)
    auto-selects: pipelined only when there is real per-image host work to
    hide (a ``gt_forward`` that runs a numpy LBS, or eval visualization);
    for host-light datasets (EHF-style precomputed vertices: matching
    measured 0.06 s over 100 images) dispatch-ahead was MEASURED SLOWER on
    a remote-tunnel link — each readback queues behind the next in-flight
    program (u8 wire, 100 images: serial 23.8 s vs pipelined 30.4 s,
    BENCH_SWEEP.json eval_sweep; co-located the two are equal) — so the
    auto policy picks the serial reference shape there. Images with
    ``uint8`` dtype are normalized on-device (4× fewer upload bytes — the
    upload, not compute, dominates a remote link). ``results['timings']``
    attributes the whole wall clock: load / dispatch / wait / readback /
    gt / match_metrics / visu sum to ~wall (the residue is loop overhead).
    """
    if pipeline is None:  # auto: overlap only if there's host work to hide
        pipeline = gt_forward is not None or visu_to_save > 0
    from multihmr_tpu.ops.image import IMG_NORM_MEAN, IMG_NORM_STD

    def body(p, x, K):
        if x.dtype == jnp.uint8:  # u8 wire: normalize on device
            x = (x.astype(jnp.float32) / 255.0
                 - jnp.asarray(IMG_NORM_MEAN)) / jnp.asarray(IMG_NORM_STD)
        return model.forward(
            p, x, K, det_thresh=det_thresh, nms_kernel_size=nms_kernel_size
        )

    fwd = jax.jit(body)
    meters = {k: AverageMeter(k) for k in ["pve", "pa_pve", "mpjpe", "pa_mpjpe"]}
    count = miss = fp = 0
    import time

    timings = {k: 0.0 for k in (
        "load", "dispatch", "wait", "readback", "gt", "match_metrics", "visu")}

    n = len(dataset) if max_images is None else min(len(dataset), max_images)

    def dispatch(i):
        t0 = time.perf_counter()
        x, annot = dataset[i]
        t1 = time.perf_counter()
        out = fwd(params, jnp.asarray(x[None]), jnp.asarray(annot["K"][None]))
        timings["load"] += t1 - t0
        timings["dispatch"] += time.perf_counter() - t1
        return i, x, annot, out

    def process(item):
        nonlocal count, miss, fp
        i, x, annot, out = item
        # forward completion wait (device time not hidden by the pipeline),
        # then the trimmed readback: the metrics below touch only
        # v3d / j2d / transl_pelvis — one overlapped device_get
        t0 = time.perf_counter()
        jax.block_until_ready(out)  # one program produces every leaf
        t1 = time.perf_counter()
        persons = model.extract_persons(
            out, fields=["v3d", "j2d", "transl_pelvis"]
        )[0]
        t2 = time.perf_counter()
        timings["wait"] += t1 - t0
        timings["readback"] += t2 - t1

        # ---- GT meshes (host-only) ----
        if gt_forward is not None:
            gt = gt_forward(annot)
        elif "smplx_vertices" in annot["humans"][0]:
            verts = np.stack([h["smplx_vertices"] for h in annot["humans"]])
            Jreg = np.asarray(model.body_model.J_regressor)
            j3d = np.einsum("jv,pvc->pjc", Jreg, verts)
            j2d = _project_np(j3d, annot["K"]).astype(np.float32)
            gt = {"v3d": verts, "j3d": j3d, "j2d": j2d}
        else:
            raise ValueError("dataset provides no GT meshes and no gt_forward")
        t3 = time.perf_counter()
        timings["gt"] += t3 - t2

        # eval-time visualization (reference train.py:441-469: saves
        # image/pred/GT triptychs for the first --visu_to_save images)
        if i < visu_to_save and faces is not None:
            _save_eval_visu(visu_dir, i, x, annot, persons, gt, faces)
            timings["visu"] += time.perf_counter() - t3
            t3 = time.perf_counter()

        n_gt = gt["v3d"].shape[0]
        count += n_gt
        if not persons:
            miss += n_gt
            timings["match_metrics"] += time.perf_counter() - t3
            return

        # predictions truncated to the GT joint count (reference train.py:361)
        n_j = gt["j2d"].shape[1]
        pred_j2d = [np.asarray(p["j2d"])[:n_j] for p in persons]
        valid_mask = [np.ones(n_j, bool)] * n_gt
        best, fps, misses = match_2d_greedy(pred_j2d, list(gt["j2d"]), valid_mask)
        fp += len(fps)
        miss += len(misses)

        for pi, gi in best:
            p_pel = np.asarray(persons[pi]["transl_pelvis"]).reshape(1, 1, 3)
            g_pel = gt["j3d"][gi][:1][None]
            # center at the pelvis BEFORE the regressor sums (reference
            # train.py:373-385): for row-stochastic regressors the order is
            # mathematically irrelevant, but regressing O(camera-distance)
            # coordinates loses ~3 fp32 digits to cancellation vs regressing
            # the O(0.3 m) centered mesh
            pv = np.asarray(persons[pi]["v3d"])[None] - p_pel
            gv = gt["v3d"][gi][None] - g_pel
            if smplx2smpl is not None:  # 3DPW: map SMPL-X verts → SMPL topology
                pv = np.einsum("sv,bvc->bsc", smplx2smpl, pv)
            meters["pve"].update(float(pve_fn(pv, gv, 0.0, 0.0)[0]))
            meters["pa_pve"].update(float(pa_pve(pv, gv)[0]))
            if J_regressor_h36m is not None:
                # center at h36m joint 0 (H36M pelvis) BEFORE the J14 subset
                # (reference train.py:406-415 — the subset's first entry is
                # NOT the pelvis, so select-then-center is a different metric)
                pj = np.einsum("js,bsc->bjc", J_regressor_h36m, pv)
                gj = np.einsum("js,bsc->bjc", J_regressor_h36m, gv)
                pj = (pj - pj[:, :1])[:, H36M_TO_J14]
                gj = (gj - gj[:, :1])[:, H36M_TO_J14]
                meters["mpjpe"].update(
                    float(1000 * np.linalg.norm(pj - gj, axis=-1).mean())
                )
                meters["pa_mpjpe"].update(float(pa_pve(pj, gj)[0]))
        timings["match_metrics"] += time.perf_counter() - t3
        if log_every and (i + 1) % log_every == 0:
            log_fn(
                f"[{i+1}/{n}] pve={meters['pve'].avg:.1f} "
                f"pa_pve={meters['pa_pve'].avg:.1f}"
            )

    t_start = time.perf_counter()
    if pipeline:
        in_flight = None
        for i in range(n):
            nxt = dispatch(i)  # device starts image i ...
            if in_flight is not None:
                process(in_flight)  # ... while the host scores image i-1
            in_flight = nxt
        if in_flight is not None:
            process(in_flight)
    else:  # reference-shaped serial loop (train.py:351-357), for A/B timing
        for i in range(n):
            process(dispatch(i))
    wall = time.perf_counter() - t_start

    precision, recall, f1 = compute_prf1(count, miss, fp)
    results = {
        "pve": meters["pve"].avg,
        "pa_pve": meters["pa_pve"].avg,
        "precision": precision,
        "recall": recall,
        "f1_score": f1,
        "n_images": n,
        "timings": {**{k: round(v, 4) for k, v in timings.items()},
                    "wall": round(wall, 4)},
    }
    if J_regressor_h36m is not None:
        results["mpjpe"] = meters["mpjpe"].avg
        results["pa_mpjpe"] = meters["pa_mpjpe"].avg
    return results
