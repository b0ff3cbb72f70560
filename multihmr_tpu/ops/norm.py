"""Fused channels-major LayerNorm (Pallas TPU kernel + XLA fallback).

The transposed-stream ViT (models/vit.py) normalizes over the CHANNEL
(sublane) dim of ``[B, D, N]`` twice per block. XLA lowers that chain
(convert → reduce stats → broadcast normalize → scale/bias → convert) into
several passes over the 17 MB fp32 activation — profiled at ~0.29 ms/layer
on v5e at the 896_L shape, ~7 ms of a 36.5 ms forward, ~8× the pure
HBM-bandwidth cost of the op. One Pallas kernel does it in a single pass:
bf16 in, fp32 stats in VMEM, bf16 out.

Gradients: ``pallas_call`` has no VJP, so :func:`layernorm_cm` is a
``custom_vjp`` whose backward recomputes the statistics in plain XLA (the
analytic LN backward) — training pays what it always paid; inference gets
the fused forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps):
    # stats are PER LANE (per token), so zero-padded lanes only produce
    # padded outputs that the caller slices off — no masking needed
    x = x_ref[0].astype(jnp.float32)  # [D, bn]
    mu = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=0, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    scale = scale_ref[...].astype(jnp.float32)  # [D, 1]
    bias = bias_ref[...].astype(jnp.float32)
    o_ref[0] = (y * scale + bias).astype(o_ref.dtype)


def _pick_bn(Np: int) -> int:
    """Largest 128-multiple divisor of Np with a ≤~2 MB fp32 tile."""
    best = 128
    for k in range(1, Np // 128 + 1):
        bn = 128 * k
        if Np % bn == 0 and bn <= 512:
            best = bn
    return best


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype", "interpret"))
def _ln_fwd_pallas(x, scale, bias, eps, out_dtype, interpret=False):
    B, D, N = x.shape
    Np = ((N + 127) // 128) * 128
    if Np != N:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, Np - N)])
    bn = _pick_bn(Np)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(B, Np // bn),
        in_specs=[
            pl.BlockSpec((1, D, bn), lambda b, i: (b, 0, i)),
            pl.BlockSpec((D, 1), lambda b, i: (0, 0)),
            pl.BlockSpec((D, 1), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, D, bn), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B, D, Np), out_dtype),
        interpret=interpret,
    )(x, scale.reshape(D, 1), bias.reshape(D, 1))
    if Np != N:
        out = out[:, :, :N]
    return out


def _ln_reference(x, scale, bias, eps, out_dtype):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale[None, :, None] + bias[None, :, None]).astype(out_dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def layernorm_cm(x, scale, bias, eps=1e-6, out_dtype=jnp.bfloat16,
                 interpret=False):
    """LayerNorm over the channel dim of ``[B, D, N]`` → ``out_dtype``.

    Pallas single-pass kernel on TPU, XLA reference elsewhere. Numerics
    match the unfused fp32-stats + cast path to within ``out_dtype``
    rounding (the unfused path rounds at the same final cast)."""
    if _on_tpu() or interpret:
        return _ln_fwd_pallas(x, scale, bias, eps, out_dtype, interpret)
    return _ln_reference(x, scale, bias, eps, out_dtype)


def _ln_fwd(x, scale, bias, eps, out_dtype, interpret):
    return layernorm_cm(x, scale, bias, eps, out_dtype, interpret), (x, scale)


def _ln_bwd(eps, out_dtype, interpret, res, g):
    # analytic LN backward in plain XLA, stats recomputed from x (training
    # keeps its usual cost; no residuals besides x are stored)
    x, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    yhat = xc * rstd  # [B, D, N]
    dy = gf * scale.astype(jnp.float32)[None, :, None]
    m1 = jnp.mean(dy, axis=1, keepdims=True)
    m2 = jnp.mean(dy * yhat, axis=1, keepdims=True)
    dx = (rstd * (dy - m1 - yhat * m2)).astype(x.dtype)
    dscale = jnp.sum(gf * yhat, axis=(0, 2)).astype(scale.dtype)
    dbias = jnp.sum(gf, axis=(0, 2)).astype(scale.dtype)
    return dx, dscale, dbias


layernorm_cm.defvjp(_ln_fwd, _ln_bwd)
