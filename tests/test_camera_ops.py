"""Camera geometry + Fourier ray encoding vs. independent torch formulations."""

import math

import numpy as np
import torch
import jax.numpy as jnp

from multihmr_tpu.ops import (
    perspective_projection,
    inverse_perspective_projection,
    get_focal_length_from_fov,
    focal_length_normalization,
    undo_focal_length_normalization,
    log_depth,
    undo_log_depth,
    intrinsics_from_fov,
    fourier_ray_features,
    fourier_channels,
)


def make_K(bs, f=600.0, c=336.0):
    K = np.zeros((bs, 3, 3), dtype=np.float32)
    K[:, 0, 0] = K[:, 1, 1] = f
    K[:, 0, 2] = K[:, 1, 2] = c
    K[:, 2, 2] = 1.0
    return K


def test_perspective_projection(rng):
    K = make_K(3)
    x = rng.normal(size=(3, 17, 3)).astype(np.float32)
    x[..., 2] = np.abs(x[..., 2]) + 1.0
    ours = np.asarray(perspective_projection(jnp.asarray(x), jnp.asarray(K)))
    # torch: y = x/z ; K @ y
    xt = torch.from_numpy(x)
    Kt = torch.from_numpy(K)
    y = xt / xt[..., -1:]
    ref = torch.einsum("bij,bkj->bki", Kt, y)[..., :2].numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_inverse_perspective_projection_roundtrip(rng):
    K = make_K(2)
    pts3d = rng.normal(size=(2, 9, 3)).astype(np.float32)
    pts3d[..., 2] = np.abs(pts3d[..., 2]) + 2.0
    p2d = perspective_projection(jnp.asarray(pts3d), jnp.asarray(K))
    dist = jnp.linalg.norm(jnp.asarray(pts3d), axis=-1, keepdims=True)
    # unproject at |x| distance along the *ray*: K^-1 [u,v,1] * d has norm d
    rays = inverse_perspective_projection(p2d, jnp.asarray(K), None)
    unit = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    rec = np.asarray(unit * dist)
    np.testing.assert_allclose(rec, pts3d, rtol=1e-4, atol=1e-3)


def test_inverse_projection_matches_torch_inverse(rng):
    K = make_K(2, f=450.0, c=200.0)
    p = (rng.uniform(size=(2, 5, 2)) * 400).astype(np.float32)
    d = (rng.uniform(size=(2, 5, 1)) * 10 + 0.5).astype(np.float32)
    ours = np.asarray(inverse_perspective_projection(jnp.asarray(p), jnp.asarray(K), jnp.asarray(d)))
    pt = torch.cat([torch.from_numpy(p), torch.ones(2, 5, 1)], -1)
    ref = torch.einsum("bij,bkj->bki", torch.inverse(torch.from_numpy(K)), pt) * torch.from_numpy(d)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)


def test_focal_normalization_roundtrip():
    f = np.array([500.0, 900.0], dtype=np.float32)[:, None]
    x = np.array([[1.3], [0.2]], dtype=np.float32)
    y = focal_length_normalization(jnp.asarray(x), jnp.asarray(f), fovn=60, img_size=896)
    x2 = undo_focal_length_normalization(y, jnp.asarray(f), fovn=60, img_size=896)
    np.testing.assert_allclose(np.asarray(x2), x, rtol=1e-6)
    fn = get_focal_length_from_fov(60, 896)
    assert math.isclose(fn, 896 / (2 * math.tan(math.radians(30))), rel_tol=1e-9)


def test_log_depth_roundtrip():
    d = jnp.asarray([[0.5], [30.0]], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(undo_log_depth(log_depth(d))), np.asarray(d), rtol=1e-5)


def test_intrinsics_from_fov():
    K = np.asarray(intrinsics_from_fov(60, 672, (4,)))
    assert K.shape == (4, 3, 3)
    assert np.allclose(K[:, 0, 0], 672 / (2 * math.tan(math.radians(30))))
    assert np.allclose(K[:, 0, 2], 336)


def test_fourier_ray_features_matches_reference_layout(rng):
    """Mirrors reference camera_embed.py:39-57 channel ordering exactly."""
    num_bands, max_res = 16, 64
    pos = rng.normal(size=(2, 7, 3)).astype(np.float32)
    ours = np.asarray(fourier_ray_features(jnp.asarray(pos), num_bands, max_res))
    assert ours.shape[-1] == fourier_channels(3, num_bands) == 99

    post = torch.from_numpy(pos)
    freq = torch.stack([torch.linspace(1.0, max_res / 2, num_bands) for _ in range(3)], 0)
    feats = torch.stack([post[i][:, :, None] * freq[None] for i in range(2)], 0)
    feats = feats.reshape(2, 7, -1)
    feats = torch.cat([torch.sin(np.pi * feats), torch.cos(np.pi * feats)], -1)
    ref = torch.cat([post, feats], -1).numpy()
    # fp32 linspace differences are amplified by pi*f*x inside sin/cos
    np.testing.assert_allclose(ours, ref, atol=2e-4)
