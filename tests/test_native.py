"""Native C++ preprocessing library vs the Python reference path."""

import os

import numpy as np
import pytest

from multihmr_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native library not built"
)

REF_IMAGES = "/root/reference/example_data"


def _any_jpg():
    files = [f for f in os.listdir(REF_IMAGES) if f.endswith(".jpg")]
    return os.path.join(REF_IMAGES, files[0])


def test_decode_matches_pil():
    from PIL import Image

    path = _any_jpg()
    ours = native.decode_file(path)
    ref = np.asarray(Image.open(path).convert("RGB"))
    assert ours.shape == ref.shape
    # JPEG decoders may differ by ±1-2 in IDCT rounding
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.5


def test_preprocess_file_shape_and_range():
    path = _any_jpg()
    out = native.preprocess_file(path, 224)
    assert out.shape == (224, 224, 3)
    assert np.isfinite(out).all()
    # normalized range
    assert -3.0 < out.min() < out.max() < 3.5


def test_preprocess_matches_python_path():
    from multihmr_tpu.io.preprocessing import normalize_nhwc, resize_pad_numpy

    path = _any_jpg()
    raw = native.decode_file(path)
    ours = native.preprocess_file(path, 128)
    ref = normalize_nhwc(resize_pad_numpy(raw, 128))
    # same PIL-BICUBIC convention → ≤1 uint8 level ≈ 1/255/0.225 normalized
    assert np.abs(ours - ref).max() < 0.018


def test_preprocess_matches_pil_bicubic(tmp_path):
    """The native resample must match PIL's actual ImageOps.contain
    (default BICUBIC) within one uint8 level — the reference's demo
    pipeline (demo.py:39-43) IS that PIL path, so this is the real-weight
    parity requirement for the prefetch loader. Sizes include an odd pad
    diff ≡ 3 (mod 4) (PIL centers with round-half-even, not floor) and a
    .5 contain-rounding tie."""
    from PIL import Image, ImageOps

    from multihmr_tpu.io.preprocessing import normalize_nhwc

    rng = np.random.default_rng(5)
    cases = [(_any_jpg(), 160)]
    for (h, w, S) in [(1000, 1024, 128), (250, 1000, 674)]:
        p = str(tmp_path / f"{h}x{w}.png")
        Image.fromarray(
            rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        ).save(p)
        cases.append((p, S))
    for path, S in cases:
        pil = Image.open(path).convert("RGB")
        ref = normalize_nhwc(
            np.asarray(ImageOps.pad(ImageOps.contain(pil, (S, S)), size=(S, S)))
        )
        ours = native.preprocess_file(path, S)
        assert np.abs(ours - ref).max() < 0.018, (path, S)
        assert np.abs(ours - ref).mean() < 1e-3


def test_native_loader_yields_all():
    paths = sorted(
        os.path.join(REF_IMAGES, f)
        for f in os.listdir(REF_IMAGES)
        if f.endswith(".jpg")
    )
    loader = native.NativeImageLoader(paths, img_size=96, n_threads=3)
    seen = set()
    for idx, arr in loader:
        assert arr.shape == (96, 96, 3)
        assert idx >= 0
        seen.add(idx)
    assert seen == set(range(len(paths)))
    loader.close()


def test_native_loader_bad_path():
    loader = native.NativeImageLoader(["/nonexistent.jpg"], img_size=32)
    items = list(loader)
    assert len(items) == 1
    assert items[0][0] == -1  # decode failure encoding
    loader.close()
