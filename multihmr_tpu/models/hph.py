"""HPH — the cross-attention SMPL-X parameter-regression head.

Re-design of reference model.py:352-593 + blocks/cross_attn_transformer.py
for static shapes: one query slot per detection-capacity entry ``[B, K]``
with a validity mask, instead of the reference's ragged person batch
(``rebatch``/``pad_to_max``, utils/tensor_manip.py:7-45 — machinery that
disappears entirely here because the batch is *born* padded).

Numerical semantics are matched exactly:
  * per layer: ``x = x*mask; x = SA(LN(x))+x; x = CA(LN(x))+x; x = FF(LN(x))+x``
    and a final ``x*mask`` (reference cross_attn_transformer.py:247-259);
  * self-attention masks q/k/v, subtracts ``(1-mask)*1e11`` on keys and
    re-masks the probabilities (reference :142-154);
  * cross-attention masks queries and subtracts ``(1-mask)*1e6`` on the
    *query* axis (a softmax no-op kept for parity, reference :193-203);
  * learned row/col query embeddings added to the central features and
    value embeddings scatter-added into the kv feature map at detected
    cells (reference model.py:479-525);
  * query token = central feature ⊕ mean-SMPL init (pose 6d, betas, cam),
    decoded deltas added back to the inits (reference model.py:550-575).

The head runs in fp32: at K≤16 queries it is ~0.1% of the ViT's FLOPs, so
accuracy here is free.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from multihmr_tpu.config import ModelConfig
from multihmr_tpu.ops.detection import Detections, scatter_add_grid
from multihmr_tpu.ops.image import grid_to_tokens
from multihmr_tpu.ops.rotations import rot6d_to_rotmat


class AdaptiveLayerNorm1D(nn.Module):
    """FiLM-style conditional LayerNorm (reference
    cross_attn_transformer.py:11-40 — present in the reference as the
    ``norm='ada'`` option, unused by the shipped configs). ``t`` is the
    conditioning vector; scale/shift projection is zero-initialized so the
    module starts as a plain LayerNorm."""

    data_dim: int
    norm_cond_dim: int

    @nn.compact
    def __call__(self, x, t):
        y = nn.LayerNorm(epsilon=1e-5, use_bias=True, use_scale=True)(x)
        ab = nn.Dense(
            2 * self.data_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="linear",
        )(t)
        alpha, beta = jnp.split(ab, 2, axis=-1)
        while alpha.ndim < y.ndim:  # broadcast over token axes
            alpha = alpha[:, None]
            beta = beta[:, None]
        return y * (1.0 + alpha) + beta


def drop_token_dropout(rng, x, p: float):
    """Reference DropTokenDropout (cross_attn_transformer.py:263-281):
    removes a shared subset of tokens during training. Static-shape variant:
    tokens are zeroed and a keep-mask is returned (the reference physically
    shrinks the sequence — impossible under jit; downstream masking makes
    the two equivalent for attention)."""
    import jax

    keep = jax.random.bernoulli(rng, 1.0 - p, (x.shape[1],))
    return x * keep[None, :, None], keep


def zero_token_dropout(rng, x, p: float):
    """Reference ZeroTokenDropout (cross_attn_transformer.py:284-299):
    zeroes tokens independently per batch element."""
    import jax

    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape[:2])
    return x * keep[..., None], keep


class MaskedSelfAttention(nn.Module):
    """Reference blocks/cross_attn_transformer.py:106-159."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, mask):
        B, K, _ = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, K, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        m = mask[:, None, :, None]  # [B,1,K,1]
        q, k, v = q * m, k * m, v * m
        dots = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (self.dim_head**-0.5)
        dots = dots - (1.0 - mask)[:, None, None, :] * 1e11  # key mask (10e10)
        attn = jax.nn.softmax(dots, axis=-1)
        attn = attn * mask[:, None, None, :]
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, K, inner)
        return nn.Dense(self.dim, name="to_out")(out)


class MaskedCrossAttention(nn.Module):
    """Reference blocks/cross_attn_transformer.py:162-205."""

    dim: int
    context_dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context, mask):
        B, K, _ = x.shape
        N = context.shape[1]
        inner = self.heads * self.dim_head
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)

        q = q.reshape(B, K, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q = q * mask[:, None, :, None]
        dots = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (self.dim_head**-0.5)
        # query-axis shift — softmax-invariant, kept for bit-parity
        dots = dots - (1.0 - mask)[:, None, :, None] * 1e6
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out * mask[:, None, :, None]
        out = out.transpose(0, 2, 1, 3).reshape(B, K, inner)
        return nn.Dense(self.dim, name="to_out")(out)


class FeedForward(nn.Module):
    """Reference blocks/cross_attn_transformer.py:88-103 (GELU MLP)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="fc2")(x)


class HPH(nn.Module):
    """Human-perception head: queries [B,K] cross-attend the feature map."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, z_central, kv_grid, det: Detections):
        c = self.cfg
        hph = c.hph
        context_dim = c.vit.embed_dim + c.camera_embed_dim
        res = c.grid_size
        B, K, _ = z_central.shape
        mask = det.valid  # [B, K]

        # Learned query embeddings at detected (row, col) cells
        # (reference model.py:424-438,499-505).
        cq_x = self.param("cross_queries_x", nn.initializers.normal(0.2), (res, context_dim))
        cq_y = self.param("cross_queries_y", nn.initializers.normal(0.2), (res, context_dim))
        cv_x = self.param("cross_values_x", nn.initializers.normal(0.2), (res, context_dim))
        cv_y = self.param("cross_values_y", nn.initializers.normal(0.2), (res, context_dim))

        queries_xy = cq_x[det.rows] + cq_y[det.cols]  # [B, K, C]
        x_central = z_central + queries_xy * mask[..., None]

        values_xy = cv_x[det.rows] + cv_y[det.cols]
        kv = scatter_add_grid(kv_grid, det, values_xy)
        context = grid_to_tokens(kv)  # [B, N, C]

        # Mean-parameter inits (reference model.py:440-477; converted
        # checkpoints overwrite these "buffers"). Fresh inits use the
        # NEUTRAL pose layout (identity 6d per joint), not zeros — a zero
        # 6d is rank-deficient under Gram-Schmidt, so zero-initialized
        # training from scratch would start from collapsed rotations. The
        # real SMPL mean pose (smpl_mean_params.npz) is spliced in by
        # ``apply_mean_params`` / the checkpoint converter when available.
        from multihmr_tpu.bodymodel.assets import load_mean_params

        mean = load_mean_params(None, nrot=c.nrot, num_betas=c.num_betas)
        init_pose = self.param(
            "init_body_pose", lambda _: jnp.asarray(mean["pose"], jnp.float32)
        )
        init_betas = self.param(
            "init_betas", lambda _: jnp.asarray(mean["shape"], jnp.float32)
        )
        init_cam = self.param(
            "init_cam", lambda _: jnp.asarray(mean["cam"], jnp.float32)
        )
        init_expression = self.param(
            "init_expression",
            lambda _: jnp.asarray(mean["expression"], jnp.float32),
        )

        expand = lambda t: jnp.broadcast_to(t[None], (B, K, t.shape[-1]))
        token = jnp.concatenate(
            [x_central, expand(init_pose[0]), expand(init_betas[0]), expand(init_cam[0])],
            axis=-1,
        )

        # TransformerDecoder (reference cross_attn_transformer.py:302-359):
        # token embedding + pos-embedding slot 0 only.
        x = nn.Dense(hph.dim, name="to_token_embedding")(token)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, 1, hph.dim), jnp.float32
        )
        x = x + pos[:, 0][:, None, :]

        for i in range(hph.depth):
            y = nn.LayerNorm(epsilon=1e-5, name=f"sa_norm{i}")(x * mask[..., None])
            x = MaskedSelfAttention(hph.dim, hph.heads, hph.dim_head, name=f"sa{i}")(
                y, mask
            ) + x * mask[..., None]
            y = nn.LayerNorm(epsilon=1e-5, name=f"ca_norm{i}")(x)
            x = MaskedCrossAttention(
                hph.dim, context_dim, hph.heads, hph.dim_head, name=f"ca{i}"
            )(y, context, mask) + x
            y = nn.LayerNorm(epsilon=1e-5, name=f"ff_norm{i}")(x)
            x = FeedForward(hph.dim, hph.mlp_dim, name=f"ff{i}")(y) + x
        x = x * mask[..., None]

        # Decoders + init residuals (reference model.py:414-416,571-575).
        pose6d = nn.Dense(c.npose, name="decpose")(x) + init_pose[None]
        betas = nn.Dense(c.num_betas, name="decshape")(x) + init_betas[None]
        cam = nn.Dense(3, name="deccam")(x) + init_cam[None]
        expression = nn.Dense(10, name="decexpression")(x) + init_expression[None]

        rotmat = rot6d_to_rotmat(pose6d.reshape(B, K, c.nrot, 6))  # [B,K,nrot,3,3]
        return {
            "rotmat": rotmat,
            "betas": betas,
            "cam": cam,
            "expression": expression,
        }
