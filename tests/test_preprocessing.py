"""Host preprocessing semantics vs PIL (the reference's resize path)."""

import numpy as np
from PIL import Image, ImageOps

from multihmr_tpu.io.preprocessing import (
    contain_size,
    resize_pad_numpy,
    get_camera_parameters,
    rescale_K_to_original,
)


def test_contain_size_matches_pil(rng):
    for (w, h) in [(640, 480), (480, 640), (1000, 333), (7, 900), (224, 224)]:
        img = Image.new("RGB", (w, h))
        out = ImageOps.contain(img, (224, 224))
        assert contain_size(w, h, 224) == out.size, (w, h)


def test_resize_pad_centering(rng):
    img = rng.integers(0, 255, size=(50, 100, 3), dtype=np.uint8)
    out = resize_pad_numpy(img, 64)
    assert out.shape == (64, 64, 3)
    # content occupies the middle rows (64x32 resized, pad 16 top/bottom)
    assert out[:16].sum() == 0 and out[-16:].sum() == 0
    assert out[16:48].sum() > 0


def test_camera_parameters_and_rescale():
    K = get_camera_parameters(672, fov=60)
    assert K.shape == (1, 3, 3)
    np.testing.assert_allclose(K[0, 0, 2], 336)
    K_full = rescale_K_to_original(K, 1280, 720, 672)
    np.testing.assert_allclose(K_full[0, 0, 2], 640)
    np.testing.assert_allclose(K_full[0, 1, 2], 360)
    np.testing.assert_allclose(K_full[0, 0, 0], K[0, 0, 0] * 1280 / 672)


def test_resize_pad_numpy_matches_pil_bicubic(rng):
    """The no-PIL numpy fallback implements PIL's BICUBIC resample (the
    reference's ImageOps.contain default) — max one uint8 level apart
    (fixed-point vs float rounding ties)."""
    from PIL import Image, ImageOps

    # incl. odd pad diff ≡ 3 (mod 4) (1000x1024@128 → diff 3: PIL centers
    # with round-half-even, not floor) and a .5 contain tie (250x1000@674)
    for h, w in [(480, 640), (333, 517), (1000, 250), (64, 64), (1000, 1024)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        S = 128
        ref = np.asarray(
            ImageOps.pad(
                ImageOps.contain(Image.fromarray(img), (S, S)), size=(S, S)
            )
        ).astype(np.int32)
        ours = resize_pad_numpy(img, S).astype(np.int32)
        assert np.abs(ref - ours).max() <= 1
        assert np.abs(ref - ours).mean() < 0.02
