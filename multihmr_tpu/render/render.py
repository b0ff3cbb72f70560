"""Mesh visualization (host-side CPU, like the reference).

Equivalent of reference utils/render.py:175-448 (pyrender EGL overlay,
side-views, glb export) — but dependency-free by default: a compact numpy
z-buffer rasterizer with Lambertian shading replaces pyrender when it is not
installed (it is not shipped in this image), and .glb export is implemented
directly against the glTF 2.0 binary spec (no trimesh).

Rendering is explicitly NOT a TPU workload (reference SURVEY §2.2-E): this
stays on host, off the jit path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import json
import struct

import numpy as np

from multihmr_tpu.render.color import demo_color

try:  # optional fast path
    import pyrender  # noqa: F401

    _HAS_PYRENDER = True
except Exception:  # pragma: no cover
    _HAS_PYRENDER = False


def _rasterize(
    verts: np.ndarray,  # [V, 3] camera space
    faces: np.ndarray,  # [F, 3]
    K: np.ndarray,  # [3, 3]
    width: int,
    height: int,
    color=(0.65, 0.74, 0.86),
):
    """Z-buffer rasterizer with per-face Lambertian shading.

    Returns (rgb float [H,W,3], depth [H,W] with +inf holes).
    """
    v2d = verts @ K.T
    v2d = v2d[:, :2] / np.maximum(v2d[:, 2:3], 1e-9)
    z = verts[:, 2]

    tri2d = v2d[faces]  # [F, 3, 2]
    triz = z[faces]  # [F, 3]
    # face normals for shading (camera space, light along -z)
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    shade = 0.35 + 0.65 * np.abs(n[:, 2])  # double-sided

    depth = np.full((height, width), np.inf, np.float32)
    image = np.zeros((height, width, 3), np.float32)
    color = np.asarray(color, np.float32)

    # cull: behind camera or outside frame
    xmin = np.floor(tri2d[..., 0].min(1)).astype(np.int64)
    xmax = np.ceil(tri2d[..., 0].max(1)).astype(np.int64)
    ymin = np.floor(tri2d[..., 1].min(1)).astype(np.int64)
    ymax = np.ceil(tri2d[..., 1].max(1)).astype(np.int64)
    ok = (
        (triz > 1e-6).all(1)
        & (xmax >= 0) & (xmin < width) & (ymax >= 0) & (ymin < height)
    )

    # Fully vectorized small-window pass: each face rasterizes into a WxW
    # local window (human-mesh triangles project tiny); oversized faces take
    # the per-face fallback below. ~30k faces/person → a handful of numpy
    # array ops instead of a 30k-iteration python loop.
    W = 12
    small = ok & (xmax - xmin < W) & (ymax - ymin < W)

    def rasterize_faces(fids, win):
        if len(fids) == 0:
            return
        a = tri2d[fids, 0]  # [F, 2]
        b = tri2d[fids, 1]
        c = tri2d[fids, 2]
        det = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
            c[:, 0] - a[:, 0]
        ) * (b[:, 1] - a[:, 1])
        keep = np.abs(det) > 1e-12
        fids, a, b, c, det = fids[keep], a[keep], b[keep], c[keep], det[keep]
        if len(fids) == 0:
            return
        dx = np.arange(win, dtype=np.float32)
        # keep the whole tier single-precision: int64 mins would upcast
        # px/py and every barycentric/z intermediate to float64 (2× memory
        # traffic on [F, W, W] tiles), and the native C++ twin is fp32
        px = xmin[fids].astype(np.float32)[:, None] + dx[None]  # [F, W]
        py = ymin[fids].astype(np.float32)[:, None] + dx[None]
        xs = px[:, None, :] + 0.5  # [F, 1, W]
        ys = py[:, :, None] + 0.5  # [F, W, 1]
        l1 = ((xs - a[:, None, None, 0]) * (c[:, None, None, 1] - a[:, None, None, 1])
              - (c[:, None, None, 0] - a[:, None, None, 0]) * (ys - a[:, None, None, 1])
              ) / det[:, None, None]
        l2 = ((b[:, None, None, 0] - a[:, None, None, 0]) * (ys - a[:, None, None, 1])
              - (xs - a[:, None, None, 0]) * (b[:, None, None, 1] - a[:, None, None, 1])
              ) / det[:, None, None]
        l0 = 1.0 - l1 - l2
        z = (l0 * triz[fids, 0][:, None, None]
             + l1 * triz[fids, 1][:, None, None]
             + l2 * triz[fids, 2][:, None, None])
        ix = np.broadcast_to(px[:, None, :], z.shape).astype(np.int64)
        iy = np.broadcast_to(py[:, :, None], z.shape).astype(np.int64)
        valid = (
            (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
            & (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height)
        )
        flat = (iy * width + ix)[valid]
        zv = z[valid].astype(np.float32)
        sh = np.broadcast_to(shade[fids][:, None, None], z.shape)[valid]
        # z-buffer: scatter-min depths, then color the winners
        np.minimum.at(depth.reshape(-1), flat, zv)
        winners = depth.reshape(-1)[flat] == zv
        image.reshape(-1, 3)[flat[winners]] = sh[winners, None] * color

    rasterize_faces(np.nonzero(small)[0], W)
    # medium tiers: vectorized with larger windows, chunked for memory
    covered = small
    for W2, chunk in ((48, 2048), (128, 256)):
        tier = ok & ~covered & (xmax - xmin < W2) & (ymax - ymin < W2)
        tier_ids = np.nonzero(tier)[0]
        for s in range(0, len(tier_ids), chunk):
            rasterize_faces(tier_ids[s : s + chunk], W2)
        covered = covered | tier
    medium = covered & ~small
    # fallback: big faces (close-ups), python loop — rare for real meshes
    for f in np.nonzero(ok & ~small & ~medium)[0]:
        x0, x1 = max(xmin[f], 0), min(xmax[f] + 1, width)
        y0, y1 = max(ymin[f], 0), min(ymax[f] + 1, height)
        if x1 <= x0 or y1 <= y0:
            continue
        xs, ys = np.meshgrid(
            np.arange(x0, x1, dtype=np.float32) + np.float32(0.5),
            np.arange(y0, y1, dtype=np.float32) + np.float32(0.5),
        )
        a, b, c = tri2d[f]
        det = (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        if abs(det) < 1e-12:
            continue
        l1 = ((xs - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (ys - a[1])) / det
        l2 = ((b[0] - a[0]) * (ys - a[1]) - (xs - a[0]) * (b[1] - a[1])) / det
        l0 = 1.0 - l1 - l2
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        if not inside.any():
            continue
        zpix = l0 * triz[f, 0] + l1 * triz[f, 1] + l2 * triz[f, 2]
        sub_d = depth[y0:y1, x0:x1]
        closer = inside & (zpix < sub_d)
        sub_d[closer] = zpix[closer]
        image[y0:y1, x0:x1][closer] = shade[f] * color
    return image, depth


def _soften_mask(fg: np.ndarray) -> np.ndarray:
    """Feather the foreground mask's edges (reference utils/render.py:301-310):
    ``fg ← max(0, 2·mean3×3(fg) − 1) · fg`` — interior stays 1, boundary
    pixels whose 3×3 neighborhood is less than half-covered fade out, so the
    overlay blends into the background instead of a hard staircase edge."""
    H, W = fg.shape
    p = np.pad(fg, 1)
    s = np.zeros_like(fg)
    for dy in range(3):
        for dx in range(3):
            s += p[dy : dy + H, dx : dx + W]
    return np.clip(s * (2.0 / 9.0) - 1.0, 0.0, None) * fg


def render_meshes(
    img: np.ndarray,  # [H, W, 3] uint8 background
    l_mesh: Sequence[np.ndarray],
    l_face: Sequence[np.ndarray],
    cam_param: np.ndarray,  # K [3,3]
    color=None,
    alpha: float = 0.75,
):
    """Overlay meshes onto an image (reference utils/render.py:175-315).

    Returns the blended uint8 array. Uses the numpy rasterizer (or pyrender
    when installed — same API either way).
    """
    H, W = img.shape[:2]
    out = img.astype(np.float32) / 255.0
    colors = color if color is not None else demo_color

    # native C++ rasterizer when built (~ms per mesh); numpy fallback below
    use_native = False
    try:
        from multihmr_tpu.io import native as _native

        use_native = _native.native_available()
    except Exception:  # pragma: no cover
        use_native = False

    acc_img = np.zeros((H, W, 3), np.float32)
    acc_depth = np.full((H, W), np.inf, np.float32)
    if use_native:
        # shared z-buffer across meshes: occlusion handled natively
        for i, (verts, faces) in enumerate(zip(l_mesh, l_face)):
            _native.rasterize(
                np.asarray(verts, np.float32), np.asarray(faces, np.int32),
                np.asarray(cam_param, np.float32), W, H,
                color=colors[i % len(colors)], rgb=acc_img, depth=acc_depth,
            )
        fg = _soften_mask(np.isfinite(acc_depth).astype(np.float32))[..., None]
        out = fg * (alpha * acc_img + (1 - alpha) * out) + (1 - fg) * out
        return (out * 255).astype(np.uint8)

    for i, (verts, faces) in enumerate(zip(l_mesh, l_face)):
        rgb, depth = _rasterize(
            np.asarray(verts, np.float32),
            np.asarray(faces, np.int64),
            np.asarray(cam_param, np.float32),
            W, H,
            color=colors[i % len(colors)],
        )
        closer = depth < acc_depth
        acc_depth[closer] = depth[closer]
        acc_img[closer] = rgb[closer]
    fg = _soften_mask(np.isfinite(acc_depth).astype(np.float32))[..., None]
    out = fg * (alpha * acc_img + (1 - alpha) * out) + (1 - fg) * out
    return (out * 255).astype(np.uint8)


def overlay_human_meshes(humans, faces, K, img, unique_color=False, alpha=0.75):
    """Reference demo.py:128-158 equivalent: overlay each detected person's
    mesh. ``humans`` is the list-of-dicts from ``extract_persons``."""
    l_mesh = [np.asarray(h["v3d"]) for h in humans]
    l_face = [np.asarray(faces)] * len(l_mesh)
    colors = [demo_color[0]] * len(l_mesh) if unique_color else demo_color
    arr = render_meshes(np.asarray(img), l_mesh, l_face, np.asarray(K)[0], colors, alpha)
    return arr, colors[: len(l_mesh)]


def get_bbox(points2d: np.ndarray, factor: float = 1.35):
    """2D keypoints → expanded bbox (reference utils/render.py:384-405)."""
    x1, y1 = points2d.min(0)
    x2, y2 = points2d.max(0)
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    sx, sy = (x2 - x1) * factor / 2, (y2 - y1) * factor / 2
    return np.array([cx - sx, cy - sy, cx + sx, cy + sy])


def print_distance_on_image(arr, humans, colors):
    """Annotate each person with its camera distance
    (reference utils/render.py:365-382) — cv2-free fallback draws nothing if
    cv2 is unavailable."""
    try:
        import cv2
    except ImportError:  # pragma: no cover
        return arr
    arr = arr.copy()
    for h, c in zip(humans, colors):
        d = float(np.asarray(h["transl_pelvis"]).reshape(-1)[2])
        loc = np.asarray(h["loc"]).astype(int)
        cv2.putText(
            arr, f"{d:.2f}m", (int(loc[0]), int(loc[1])),
            cv2.FONT_HERSHEY_SIMPLEX, 0.7, tuple(int(255 * x) for x in c), 2,
        )
    return arr


def export_obj(path: str, verts: np.ndarray, faces: np.ndarray):
    """Dependency-free Wavefront OBJ export."""
    with open(path, "w") as f:
        for v in np.asarray(verts):
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in np.asarray(faces) + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


def create_glb_scene(
    l_mesh: Sequence[np.ndarray],
    l_face: Sequence[np.ndarray],
    path: Optional[str] = None,
    img=None,
    focal: float = 600.0,
    colors: Optional[Sequence] = None,
    camera_marker: bool = True,
) -> bytes:
    """Minimal binary glTF 2.0 (.glb) scene export of the predicted meshes
    (reference utils/render.py:62-173 exports via trimesh; this writes the
    container directly — loadable by any glTF viewer).

    Parity with the reference scene: optional per-mesh colors, the input
    ``img`` as a textured plane placed at the camera's focal geometry
    (screen_width 0.3, distance focal·0.3/img_width — utils/render.py:94-97),
    and a red camera-frustum wireframe at the optical center (:136-165;
    rendered as glTF LINES instead of the reference's pseudo-edge triangle
    trick — same marker, native primitive).
    """
    bufs, buffer_views, accessors, meshes, nodes = bytearray(), [], [], [], []
    materials, textures, images_json, samplers = [], [], [], []
    FLIP = np.array([1, -1, -1], np.float32)  # camera (+Y down) → glTF (+Y up)

    def add_view(data: bytes, target=None):
        off = len(bufs)
        bufs.extend(data)
        while len(bufs) % 4:
            bufs.append(0)
        view = {"buffer": 0, "byteOffset": off, "byteLength": len(data)}
        if target:
            view["target"] = target
        buffer_views.append(view)
        return len(buffer_views) - 1

    def add_accessor(view, ctype, count, atype, vmin=None, vmax=None):
        acc = {"bufferView": view, "componentType": ctype, "count": count,
               "type": atype}
        if vmin is not None:
            acc["min"], acc["max"] = vmin, vmax
        accessors.append(acc)
        return len(accessors) - 1

    def add_positions(v: np.ndarray):
        view = add_view(v.tobytes(), 34962)
        return add_accessor(
            view, 5126, len(v), "VEC3", v.min(0).tolist(), v.max(0).tolist()
        )

    for i, (verts, faces) in enumerate(zip(l_mesh, l_face)):
        v = np.asarray(verts, np.float32) * FLIP
        f = np.asarray(faces, np.uint32)
        pos = add_positions(v)
        idx = add_accessor(add_view(f.tobytes(), 34963), 5125, f.size, "SCALAR")
        prim = {"attributes": {"POSITION": pos}, "indices": idx}
        if colors is not None:
            # per-mesh colors may arrive as a list/tuple of RGB triples OR a
            # [N, 3] numpy array (palette math output); a single RGB triple
            # (any container, ndim == 1) applies to every mesh. float64 so
            # Python-float inputs round-trip exactly into the JSON.
            carr = np.asarray(colors, np.float64)
            c = carr[i] if carr.ndim == 2 else carr
            materials.append(
                {
                    "pbrMetallicRoughness": {
                        "baseColorFactor": [float(c[0]), float(c[1]), float(c[2]), 1.0],
                        "metallicFactor": 0.0,
                        "roughnessFactor": 0.5,
                    }
                }
            )
            prim["material"] = len(materials) - 1
        meshes.append({"primitives": [prim]})
        nodes.append({"mesh": len(meshes) - 1})

    # ---- textured image plane (reference utils/render.py:93-134) ----
    plane_hx = plane_hy = dist = None
    if img is not None:
        arr = np.asarray(img)
        ih, iw = arr.shape[:2]
        # reference scale: screen_width 0.3, distance focal*0.3/width
        # (utils/render.py:94-96); aspect kept upright (width:height = iw:ih)
        screen_width = 0.3
        dist = focal * screen_width / iw  # plane distance from optical center
        plane_hx = screen_width / 2.0
        plane_hy = plane_hx * (ih / iw)
        # corners in OpenCV camera space (x right, y down, z forward)
        corners = np.array(
            [
                [-plane_hx, -plane_hy, dist],
                [plane_hx, -plane_hy, dist],
                [plane_hx, plane_hy, dist],
                [-plane_hx, plane_hy, dist],
            ],
            np.float32,
        ) * FLIP
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        tris = np.array([[0, 1, 2], [0, 2, 3], [2, 1, 0], [3, 2, 0]], np.uint32)

        import io as _io

        from PIL import Image as _Image

        pil = img if hasattr(img, "save") else _Image.fromarray(arr.astype(np.uint8))
        png = _io.BytesIO()
        pil.save(png, format="PNG")
        img_view = add_view(png.getvalue())
        images_json.append({"bufferView": img_view, "mimeType": "image/png"})
        samplers.append({"magFilter": 9729, "minFilter": 9729})
        textures.append({"source": len(images_json) - 1, "sampler": 0})
        materials.append(
            {
                "pbrMetallicRoughness": {
                    "baseColorTexture": {"index": len(textures) - 1},
                    "metallicFactor": 0.0,
                    "roughnessFactor": 1.0,
                },
                "doubleSided": True,
            }
        )
        pos = add_positions(corners)
        uv_acc = add_accessor(add_view(uv.tobytes(), 34962), 5126, 4, "VEC2")
        idx = add_accessor(add_view(tris.tobytes(), 34963), 5125, tris.size, "SCALAR")
        meshes.append(
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": pos, "TEXCOORD_0": uv_acc},
                        "indices": idx,
                        "material": len(materials) - 1,
                    }
                ]
            }
        )
        nodes.append({"mesh": len(meshes) - 1})

    # ---- camera-frustum wireframe (reference utils/render.py:136-165) ----
    if camera_marker:
        hx = plane_hx if plane_hx is not None else 0.15
        hy = plane_hy if plane_hy is not None else 0.15
        d = dist if dist is not None else 0.2
        corners = np.array(
            [
                [-hx, -hy, d], [hx, -hy, d], [hx, hy, d], [-hx, hy, d],
            ],
            np.float32,
        ) * FLIP
        apex = np.zeros((1, 3), np.float32)
        v = np.concatenate([apex, corners])
        # 4 apex→corner edges + base loop, as glTF LINES (mode 1)
        lines = np.array(
            [0, 1, 0, 2, 0, 3, 0, 4, 1, 2, 2, 3, 3, 4, 4, 1], np.uint32
        )
        materials.append(
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [1.0, 0.0, 0.0, 1.0],
                    "metallicFactor": 0.0,
                },
            }
        )
        pos = add_positions(v)
        idx = add_accessor(add_view(lines.tobytes(), 34963), 5125, lines.size, "SCALAR")
        meshes.append(
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": pos},
                        "indices": idx,
                        "mode": 1,
                        "material": len(materials) - 1,
                    }
                ]
            }
        )
        nodes.append({"mesh": len(meshes) - 1})

    gltf = {
        "asset": {"version": "2.0", "generator": "multihmr_tpu"},
        "scene": 0,
        "scenes": [{"nodes": list(range(len(nodes)))}],
        "nodes": nodes,
        "meshes": meshes,
        "accessors": accessors,
        "bufferViews": buffer_views,
        "buffers": [{"byteLength": len(bufs)}],
    }
    if materials:
        gltf["materials"] = materials
    if textures:
        gltf["textures"] = textures
        gltf["images"] = images_json
        gltf["samplers"] = samplers
    js = json.dumps(gltf).encode()
    while len(js) % 4:
        js += b" "
    total = 12 + 8 + len(js) + 8 + len(bufs)
    out = (
        struct.pack("<III", 0x46546C67, 2, total)
        + struct.pack("<II", len(js), 0x4E4F534A) + js
        + struct.pack("<II", len(bufs), 0x004E4942) + bytes(bufs)
    )
    if path:
        with open(path, "wb") as fh:
            fh.write(out)
    return out
