"""Software rasterizer, glb export, side views."""

import struct

import numpy as np

from multihmr_tpu.render import (
    render_meshes,
    create_glb_scene,
    export_obj,
    render_side_views,
    create_rotating_video,
    get_bbox,
)


def make_triangle_scene():
    # one big triangle facing the camera at z=2
    verts = np.array(
        [[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.5, 2.0]], np.float32
    )
    faces = np.array([[0, 1, 2]], np.int64)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    return verts, faces, K


def test_rasterizer_covers_expected_pixels():
    verts, faces, K = make_triangle_scene()
    img = np.zeros((64, 64, 3), np.uint8)
    out = render_meshes(img, [verts], [faces], K, alpha=1.0)
    # triangle centroid projects to (32, 32-ish) and must be colored
    assert out[32, 32].sum() > 0
    # far corners stay background
    assert out[0, 0].sum() == 0 and out[63, 63].sum() == 0


def test_rasterizer_depth_ordering():
    # near triangle must occlude far triangle
    near = np.array([[-0.4, -0.4, 1.0], [0.4, -0.4, 1.0], [0.0, 0.4, 1.0]], np.float32)
    far = near.copy()
    far[:, 2] = 3.0
    faces = np.array([[0, 1, 2]], np.int64)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    img = np.zeros((64, 64, 3), np.uint8)
    out_nf = render_meshes(img, [near, far], [faces, faces], K,
                           color=[(1.0, 0, 0), (0, 1.0, 0)], alpha=1.0)
    out_fn = render_meshes(img, [far, near], [faces, faces], K,
                           color=[(0, 1.0, 0), (1.0, 0, 0)], alpha=1.0)
    # center pixel red (near wins) regardless of draw order
    assert out_nf[32, 32, 0] > out_nf[32, 32, 1]
    assert out_fn[32, 32, 0] > out_fn[32, 32, 1]


def test_soften_mask_reference_semantics():
    """fg ← max(0, 2·mean3×3(fg) − 1)·fg (reference utils/render.py:301-310):
    interior stays 1, a straight edge feathers to 1/3, an isolated pixel
    (2/9 coverage) vanishes."""
    from multihmr_tpu.render.render import _soften_mask

    half = np.zeros((8, 8), np.float32)
    half[:, 4:] = 1.0  # vertical half-plane
    s = _soften_mask(half)
    assert s[4, 6] == 1.0  # interior: 9/9 → 2·1−1 = 1
    np.testing.assert_allclose(s[4, 4], 1.0 / 3.0, atol=1e-6)  # 6/9 → 1/3
    assert s[4, 3] == 0.0  # background side stays 0 (multiplied by fg)

    lone = np.zeros((5, 5), np.float32)
    lone[2, 2] = 1.0
    assert _soften_mask(lone).max() == 0.0  # 1/9 coverage → clamped away


def test_render_meshes_edges_are_feathered():
    """Overlay boundary pixels blend part-way instead of a hard cut."""
    verts, faces, K = make_triangle_scene()
    img = np.full((64, 64, 3), 200, np.uint8)
    out = render_meshes(img, [verts], [faces], K, alpha=1.0,
                        color=[(0.0, 0.0, 0.0)])
    inside, bg = out[32, 32], out[0, 0]
    assert tuple(bg) == (200, 200, 200)
    assert inside.sum() < 30  # fully covered → mesh color
    # some pixel strictly between background and mesh levels exists on the
    # silhouette (the feathered rim)
    mids = (out[..., 0] > 40) & (out[..., 0] < 180)
    assert mids.any()


def test_glb_export_valid_container(tmp_path):
    verts, faces, _ = make_triangle_scene()
    data = create_glb_scene([verts], [faces], str(tmp_path / "s.glb"))
    magic, version, length = struct.unpack("<III", data[:12])
    assert magic == 0x46546C67 and version == 2 and length == len(data)
    # JSON chunk parses
    jlen, jtype = struct.unpack("<II", data[12:20])
    assert jtype == 0x4E4F534A
    import json

    gltf = json.loads(data[20 : 20 + jlen])
    assert gltf["asset"]["version"] == "2.0"
    # human mesh + the always-on camera-frustum marker (reference
    # utils/render.py:136-165 adds its camera mesh unconditionally too)
    assert len(gltf["meshes"]) == 2


def test_obj_export(tmp_path):
    verts, faces, _ = make_triangle_scene()
    p = tmp_path / "m.obj"
    export_obj(str(p), verts, faces)
    lines = p.read_text().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 3
    assert sum(1 for l in lines if l.startswith("f ")) == 1


def test_side_views_and_video(tmp_path):
    verts, faces, K = make_triangle_scene()
    views = render_side_views([verts], [faces], K, 64, 64)
    assert set(views) == {"bis", "side45", "side90", "bev"}
    for v in views.values():
        assert v.shape == (64, 64, 3)
    # full sweep: centre→right→centre→left→centre (yaw) + centre→top→centre
    # (elevation), like reference demo.py:188-241; legs of n_frames//2 frames
    # → 6·leg−5 total (the one-sided [0, +range] sweep was a bug)
    frames = create_rotating_video([verts], [faces], K, 48, 48, n_frames=4)
    assert len(frames) == 6 * 2 - 5
    for fr in frames:
        assert fr.shape == (48, 48, 3)
    # empty scene: white frames, not a crash (reference utils/render.py:420)
    from multihmr_tpu.render.views import render_view_from_angle

    blank = render_view_from_angle([], [], K, 32, 24, 30.0)
    assert blank.shape == (24, 32, 3) and (blank == 255).all()


def test_get_bbox():
    pts = np.array([[10.0, 20], [30, 60]])
    box = get_bbox(pts, factor=1.0)
    np.testing.assert_allclose(box, [10, 20, 30, 60])


def test_glb_scene_image_plane_and_frustum(tmp_path):
    """Scene parity with reference utils/render.py:62-173: textured image
    plane + red camera-frustum wireframe + per-mesh colors."""
    import json

    verts, faces, _ = make_triangle_scene()
    img = np.zeros((60, 80, 3), np.uint8)
    img[:, :, 0] = 200
    data = create_glb_scene(
        [verts], [faces], str(tmp_path / "s.glb"),
        img=img, focal=600.0, colors=[(0.2, 0.4, 0.6)],
    )
    jlen, jtype = struct.unpack("<II", data[12:20])
    gltf = json.loads(data[20 : 20 + jlen])
    # 1 human mesh + image plane + frustum
    assert len(gltf["meshes"]) == 3
    assert len(gltf["nodes"]) == 3
    # textured plane: texture/image/sampler + TEXCOORD_0
    assert len(gltf["textures"]) == 1 and len(gltf["images"]) == 1
    plane = gltf["meshes"][1]["primitives"][0]
    assert "TEXCOORD_0" in plane["attributes"]
    tex_mat = gltf["materials"][plane["material"]]
    assert "baseColorTexture" in tex_mat["pbrMetallicRoughness"]
    # frustum: LINES primitive with a red material
    frustum = gltf["meshes"][2]["primitives"][0]
    assert frustum["mode"] == 1
    red = gltf["materials"][frustum["material"]]
    assert red["pbrMetallicRoughness"]["baseColorFactor"][:3] == [1.0, 0.0, 0.0]
    # human mesh color carried
    body_mat = gltf["materials"][gltf["meshes"][0]["primitives"][0]["material"]]
    assert body_mat["pbrMetallicRoughness"]["baseColorFactor"][:3] == [0.2, 0.4, 0.6]
    # embedded PNG chunk decodes back to the image
    img_view = gltf["bufferViews"][gltf["images"][0]["bufferView"]]
    bin_off = 20 + jlen + 8
    png = data[bin_off + img_view["byteOffset"] :][: img_view["byteLength"]]
    import io as _io

    from PIL import Image

    back = np.asarray(Image.open(_io.BytesIO(png)))
    np.testing.assert_array_equal(back, img)
