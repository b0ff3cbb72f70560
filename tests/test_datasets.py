"""Dataset classes exercised end-to-end on synthetic fixture files
(PLY meshes + PNGs + sequence pkls written to tmp dirs)."""

import os
import pickle

import numpy as np

from multihmr_tpu.data.ply import read_ply_vertices


def write_ply_ascii(path, verts):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")


def write_ply_binary(path, verts):
    import struct

    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"end_header\n")
        for v in verts:
            f.write(struct.pack("<fff", *v))


def test_ply_reader_roundtrip(tmp_path, rng):
    verts = rng.normal(size=(20, 3)).astype(np.float32)
    pa = tmp_path / "a.ply"
    pb = tmp_path / "b.ply"
    write_ply_ascii(pa, verts)
    write_ply_binary(pb, verts)
    np.testing.assert_allclose(read_ply_vertices(str(pa)), verts, rtol=1e-4)
    np.testing.assert_allclose(read_ply_vertices(str(pb)), verts)


def test_ehf_dataset_end_to_end(tmp_path, rng):
    from PIL import Image

    from multihmr_tpu.data.ehf import EHF, EHF_CAM_ROTVEC, EHF_CAM_T, _rotvec_to_rotmat_np

    root = tmp_path / "EHF"
    root.mkdir()
    verts = rng.normal(size=(50, 3)).astype(np.float32)
    for i in range(2):
        write_ply_binary(root / f"{i:02d}_align.ply", verts + i)
        Image.fromarray(
            rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
        ).save(root / f"{i:02d}_img.png")

    ds = EHF(
        img_size=64,
        root_dir=str(root),
        annotations_dir=str(tmp_path / "annot"),
        force_build_dataset=True,
    )
    assert len(ds) == 2
    x, annot = ds[0]
    assert x.shape == (64, 64, 3)
    assert annot["K"].shape == (3, 3)
    gt = annot["humans"][0]["smplx_vertices"]
    # GT verts = R @ v + t
    R = _rotvec_to_rotmat_np(EHF_CAM_ROTVEC)
    np.testing.assert_allclose(gt, verts @ R.T + EHF_CAM_T, atol=1e-4)
    # reload from pickle (no rebuild)
    ds2 = EHF(img_size=64, root_dir=str(root), annotations_dir=str(tmp_path / "annot"))
    assert ds2.imagenames == ds.imagenames
    # --val_n truncation (reference train.py:504 passes n= to every val set)
    ds_n = EHF(img_size=64, root_dir=str(root),
               annotations_dir=str(tmp_path / "annot"), n=1)
    assert ds_n.imagenames == ds.imagenames[:1]


def test_threedpw_dataset_end_to_end(tmp_path, rng):
    from PIL import Image

    from multihmr_tpu.data.threedpw import THREEDPW
    from multihmr_tpu.bodymodel.assets import synthetic_body_model

    root = tmp_path / "3DPW"
    (root / "sequenceFiles" / "test").mkdir(parents=True)
    (root / "imageFiles" / "seq0").mkdir(parents=True)
    T = 2
    meta = {
        "poses": [rng.normal(scale=0.2, size=(T, 72)).astype(np.float32)],
        "trans": [rng.normal(size=(T, 3)).astype(np.float32)],
        "betas": [rng.normal(size=10).astype(np.float32)],
        "genders": ["m"],
        "campose_valid": [np.ones(T)],
        "cam_poses": np.tile(np.eye(4), (T, 1, 1)),
        "cam_intrinsics": np.array([[500.0, 0, 80], [0, 500, 60], [0, 0, 1]]),
        "poses2d": [rng.normal(size=(T, 3, 18)).astype(np.float32)],
    }
    with open(root / "sequenceFiles" / "test" / "seq0.pkl", "wb") as f:
        pickle.dump(meta, f)
    for k in range(T):
        Image.fromarray(
            rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
        ).save(root / "imageFiles" / "seq0" / f"image_{k:05d}.jpg")

    # monkeypatch the SMPL loader to the synthetic model (no licensed pkl)
    import multihmr_tpu.bodymodel.assets as assets

    orig = assets.load_smpl_pkl
    assets.load_smpl_pkl = lambda path, num_betas=10: synthetic_body_model(
        num_vertices=60, num_joints=24, num_extra=0, num_lmk=0
    )
    try:
        ds = THREEDPW(
            img_size=64,
            root_dir=str(root),
            annotations_dir=str(tmp_path / "annot3"),
            force_build_dataset=True,
        )
    finally:
        assets.load_smpl_pkl = orig
    assert len(ds) == 2
    x, annot = ds[0]
    assert x.shape == (64, 64, 3)
    hum = annot["humans"][0]
    assert hum["smpl_gender"] == "male" and int(hum["smpl_gender_id"]) == 1
    assert hum["smpl_root_pose"].shape == (1, 3)
    assert hum["smpl_body_pose"].shape == (23, 3)


def test_bedlam_flip_mirroring(rng):
    from multihmr_tpu.data.bedlam import flip_smplx_params, FLIP_PAIRS

    hum = {
        "smplx_root_pose": rng.normal(size=(1, 3)).astype(np.float32),
        "smplx_body_pose": rng.normal(size=(21, 3)).astype(np.float32),
        "smplx_jaw_pose": rng.normal(size=(1, 3)).astype(np.float32),
        "smplx_leye_pose": rng.normal(size=(1, 3)).astype(np.float32),
        "smplx_reye_pose": rng.normal(size=(1, 3)).astype(np.float32),
        "smplx_left_hand_pose": rng.normal(size=(15, 3)).astype(np.float32),
        "smplx_right_hand_pose": rng.normal(size=(15, 3)).astype(np.float32),
        "smplx_transl": np.array([1.0, 2.0, 3.0], np.float32),
    }
    out = flip_smplx_params(hum)
    np.testing.assert_allclose(out["smplx_transl"], [-1, 2, 3])
    # y/z negated on root
    np.testing.assert_allclose(out["smplx_root_pose"][0, 0], hum["smplx_root_pose"][0, 0])
    np.testing.assert_allclose(out["smplx_root_pose"][0, 1:], -hum["smplx_root_pose"][0, 1:])
    # hands swapped with negation
    np.testing.assert_allclose(out["smplx_left_hand_pose"][:, 0], hum["smplx_right_hand_pose"][:, 0])
    np.testing.assert_allclose(out["smplx_left_hand_pose"][:, 1:], -hum["smplx_right_hand_pose"][:, 1:])
    # body pairs swapped
    a, b = FLIP_PAIRS[0]
    np.testing.assert_allclose(out["smplx_body_pose"][a, 0], hum["smplx_body_pose"][b, 0])
    # double flip = identity
    out2 = flip_smplx_params(out)
    for k in hum:
        np.testing.assert_allclose(out2[k], hum[k], atol=1e-6)


def test_bedlam_dataset_end_to_end(tmp_path, rng):
    from PIL import Image

    from multihmr_tpu.data.bedlam import BEDLAM

    root = tmp_path / "BEDLAM"
    seq = "seq0"
    (root / "training" / seq / "png").mkdir(parents=True)
    (root / "all_npz_12_training").mkdir(parents=True)

    n_person, n_img = 3, 2
    rows = n_person * n_img
    imgnames = np.array([f"im{i}.png" for i in range(n_img) for _ in range(n_person)])
    np.savez(
        root / "all_npz_12_training" / f"{seq}.npz",
        pose_cam=rng.normal(scale=0.2, size=(rows, 165)).astype(np.float32),
        cam_int=np.tile(np.array([[500.0, 0, 80], [0, 500, 60], [0, 0, 1]]), (rows, 1, 1)),
        cam_ext=np.tile(np.eye(4), (rows, 1, 1)),
        shape=rng.normal(size=(rows, 11)).astype(np.float32),
        imgname=imgnames,
        trans_cam=(rng.normal(size=(rows, 3)) + [0, 0, 4]).astype(np.float32),
    )
    for i in range(n_img):
        Image.fromarray(
            rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
        ).save(root / "training" / seq / "png" / f"im{i}.png")

    ds = BEDLAM(
        split="training", training=False, img_size=56,
        root_dir=str(root), annotations_dir=str(tmp_path / "annots"),
        force_build_dataset=True,
    )
    assert len(ds) == n_img
    x, annot = ds[0]
    assert x.shape == (56, 56, 3)
    humans = annot["humans"]
    assert len(humans) == n_person
    # sorted near-to-far
    depths = [h["smplx_transl"][2] for h in humans]
    assert depths == sorted(depths)
    assert humans[0]["smplx_body_pose"].shape == (21, 3)
    assert humans[0]["smplx_left_hand_pose"].shape == (15, 3)
    assert humans[0]["smplx_shape"].shape == (11,)
    # training mode draws random indices and can flip — must still work
    ds_train = BEDLAM(
        split="training", training=True, img_size=56,
        root_dir=str(root), annotations_dir=str(tmp_path / "annots"), seed=0,
    )
    x2, annot2 = ds_train[0]
    assert x2.shape == (56, 56, 3)
    assert len(annot2["humans"]) <= n_person  # z>0.01 filter
    # --train_n/--val_n truncation (reference train.py:504,536,553,556;
    # applied before subsample, datasets/bedlam.py:83-87)
    ds_n = BEDLAM(
        split="training", training=False, img_size=56,
        root_dir=str(root), annotations_dir=str(tmp_path / "annots"), n=1,
    )
    assert ds_n.imagenames == ds.imagenames[:1]
    ds_n0 = BEDLAM(
        split="training", training=False, img_size=56,
        root_dir=str(root), annotations_dir=str(tmp_path / "annots"),
        n=-1, subsample=2,
    )
    assert ds_n0.imagenames == ds.imagenames[::2]
    # extension='jpg' reads the create_jpeg siblings under remapped keys
    # (reference datasets/bedlam.py:62-78 + :449-485)
    from multihmr_tpu.cli.data import create_jpeg

    assert create_jpeg(str(root / "training"), target_size=48) == n_img
    ds_jpg = BEDLAM(
        split="training", training=False, img_size=56,
        root_dir=str(root), annotations_dir=str(tmp_path / "annots"),
        extension="jpg", res=48,
    )
    assert [os.path.basename(p) for p in ds_jpg.imagenames] == [
        f"im{i}_48.jpg" for i in range(n_img)
    ]
    xj, annot_j = ds_jpg[0]
    assert xj.shape == (56, 56, 3)
    assert len(annot_j["humans"]) == n_person


def test_create_jpeg_walks_and_resizes(tmp_path, rng):
    """create_jpeg (reference datasets/bedlam.py:449-485): every non-hidden
    .png in the tree gets a long-side-resized JPEG sibling named
    name_<target>.jpg (or name.jpg with no resize)."""
    from PIL import Image

    from multihmr_tpu.cli.data import create_jpeg

    d = tmp_path / "seq" / "png"
    d.mkdir(parents=True)
    Image.fromarray(
        rng.integers(0, 255, size=(60, 120, 3), dtype=np.uint8)
    ).save(d / "wide.png")
    Image.fromarray(
        rng.integers(0, 255, size=(120, 60, 3), dtype=np.uint8)
    ).save(tmp_path / "tall.png")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / ".hidden.png")
    (d / "notes.txt").write_text("not an image")

    assert create_jpeg(str(tmp_path), target_size=32, log_freq=0) == 2
    wide = Image.open(d / "wide_32.jpg")
    assert wide.size == (32, 16)  # long side → 32, aspect kept
    tall = Image.open(tmp_path / "tall_32.jpg")
    assert tall.size == (16, 32)
    assert not (d / ".hidden_32.jpg").exists()

    # no-resize mode: plain .jpg sibling, original size
    assert create_jpeg(str(tmp_path), target_size=None, log_freq=0) == 2
    assert Image.open(d / "wide.jpg").size == (120, 60)


def test_square_canvas_K_matches_reference_fov_roundtrip():
    """square_canvas_K (shared by EHF/3DPW/BEDLAM) must equal the reference's
    FOV round-trip form (ehf.py:135-145 / threedpw.py:192-202):
    img_size / (2·tan(atan(max_side/(2f)))) == img_size·f/max_side."""
    from multihmr_tpu.data.collate import square_canvas_K

    rng = np.random.default_rng(7)
    for _ in range(20):
        rw, rh = rng.integers(100, 4000, size=2)
        focal = rng.uniform(200, 2000, size=2)
        princpt = np.array([rw, rh]) * rng.uniform(0.3, 0.7, size=2)
        img_size = int(rng.choice([336, 672, 896]))
        K = square_canvas_K(focal, princpt, (rw, rh), img_size)
        max_side = max(rw, rh)
        fovx = 2 * np.arctan(max_side / (2 * focal[0]))
        fovy = 2 * np.arctan(max_side / (2 * focal[1]))
        np.testing.assert_allclose(K[0, 0], img_size / (2 * np.tan(fovx / 2)),
                                   rtol=1e-6)
        np.testing.assert_allclose(K[1, 1], img_size / (2 * np.tan(fovy / 2)),
                                   rtol=1e-6)
        np.testing.assert_allclose(
            K[[0, 1], [2, 2]], img_size * (princpt / [rw, rh]), rtol=1e-6
        )
