"""DINOv2-geometry Vision Transformer backbone.

The reference loads its ViT through ``torch.hub('facebookresearch/dinov2')``
(reference blocks/dinov2.py:8-26) and calls
``get_intermediate_layers(x)[0]`` — final-block, LayerNorm'd patch tokens
without cls. This module re-implements that architecture TPU-first in
flax.linen:

  * NHWC input, patch embedding as an explicit unfold+matmul (guaranteed
    single MXU matmul instead of relying on conv lowering);
  * bf16 activations/matmuls with fp32 LayerNorms and fp32 params
    (the reference runs fp16 autocast, demo.py:117);
  * attention dispatches to the Pallas flash kernel on TPU;
  * pos-embedding interpolation (bicubic, torch-exact incl. DINOv2's 0.1
    offset) precomputed at parameter-conversion time, NOT per step: the
    model's ``pos_embed`` param is stored already resampled to the target
    grid, so the forward pass is pure static compute;
  * LayerScale (DINOv2's per-channel residual scaling, init 1e-5) and exact
    (erf) GELU to match torch's ``nn.GELU`` default.

Architecture table (dinov2 S/B/L): patch 14, depth 12/12/24,
dim 384/768/1024, heads 6/12/16, mlp ratio 4, qkv bias, pre-norm.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from multihmr_tpu.config import ViTConfig
from multihmr_tpu.parallel.ring_attention import (
    mesh_attention_merged,
    mesh_attention_t,
)


def _gelu(x, dtype):
    """GELU with precision-matched flavor: exact (erf) in fp32 — bit-faithful
    to torch's ``nn.GELU`` default for the parity tests — and tanh-approx in
    bf16, where the approximation error (max 5e-4) sits far below bf16
    quantization noise (ulp 1.6e-2 at |x|≈3) while erf costs 0.235 ms per
    fc1 tile on v5e vs tanh's 0.026 ms (measured; ~5 ms per ViT-L forward)."""
    return nn.gelu(x, approximate=jnp.dtype(dtype) == jnp.bfloat16)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = _gelu(x, self.dtype)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Self-attention with mesh-aware dispatch.

    With no mesh (single chip) this is the Pallas flash kernel on TPU / XLA
    elsewhere. With a mesh whose ``model`` axis is non-trivial, the kernel is
    run under ``shard_map`` — heads sharded (Megatron TP, ``tp_mode="heads"``)
    or sequence sharded (ring attention, ``tp_mode="ring"``) — because the
    Pallas custom call cannot be auto-partitioned by XLA's SPMD pass.
    """

    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16
    mesh: Any = None
    tp_mode: str = "heads"

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        h = self.num_heads
        dh = D // h
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, dh).transpose(2, 0, 3, 1, 4)  # [3,B,h,N,dh]
        q, k, v = qkv[0], qkv[1], qkv[2]
        # merged [B, N, D]: the flash kernel's native transposed output folds
        # the heads-merge into the one transpose this reshape always cost
        out = mesh_attention_merged(q, k, v, self.mesh, mode=self.tp_mode)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init), (self.dim,), jnp.float32
        )
        return x * gamma.astype(self.dtype)


class Block(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.bfloat16
    mesh: Any = None
    tp_mode: str = "heads"
    # rematerialize ONLY the MLP in the backward pass (remat_policy="mlp"):
    # drops the fc1 hidden state — the largest activation, 4·D·N per layer —
    # while keeping attention residuals saved (no flash-forward re-run)
    remat_mlp: bool = False

    @nn.compact
    def __call__(self, x, _scan_unused=None):
        c = self.cfg
        mlp_cls = nn.remat(Mlp, prevent_cse=False) if self.remat_mlp else Mlp
        # LayerNorms run in fp32 for stability, outputs cast back to bf16.
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        y = Attention(
            c.embed_dim, c.num_heads, self.dtype,
            mesh=self.mesh, tp_mode=self.tp_mode, name="attn",
        )(y.astype(self.dtype))
        x = x + LayerScale(c.embed_dim, c.layerscale_init, self.dtype, name="ls1")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        y = mlp_cls(c.embed_dim, int(c.embed_dim * c.mlp_ratio), self.dtype, name="mlp")(
            y.astype(self.dtype)
        )
        x = x + LayerScale(c.embed_dim, c.layerscale_init, self.dtype, name="ls2")(y)
        return x, None


# ---------------------------------------------------------------------------
# Transposed stream: the residual stream kept channels-major [B, D, N].
#
# Why (profiled on v5e, 896_L): with the standard [B, N, D] stream every
# attention layer pays a layout transform into [3, B, H, N, 64] whose
# (8, 128)-tiled minor dim is 64 → HALF-EMPTY tiles (2× HBM for q/k/v), plus
# the matching pad/bitcast fusions around the Pallas call (~0.2 ms/layer).
# Channels-major, the qkv projection einsum ("io,bin->bon") emits [B, 3D, N]
# whose head slices reshape to the flash kernel's native [B, H, 64, N]
# operand layout for FREE (minor dim untouched, fully-packed tiles), and the
# kernel's output feeds the proj einsum directly. Boundary transposes happen
# ONCE per forward (after patch embedding, before the final LayerNorm).
#
# The T* modules use the SAME parameter names and shapes as their flax
# twins (kernel [in, out], bias/scale [dim]), so checkpoints, the torch
# converter, and the TP sharding rules are layout-agnostic.
# ---------------------------------------------------------------------------


class TDense(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # [B, in, N] → [B, out, N]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        y = jnp.einsum(
            "io,bin->bon", kernel.astype(self.dtype), x.astype(self.dtype)
        )
        return y + bias.astype(self.dtype)[None, :, None]


class TLayerNorm(nn.Module):
    """LayerNorm over the channel (sublane) dim of ``[B, D, N]``: fp32
    statistics, ``dtype`` output. Dispatches to the single-pass Pallas
    kernel on TPU (ops/norm.py — XLA's unfused chain costs ~8× the
    bandwidth of the op); numerically identical to the unfused
    fp32-stats-then-cast path."""

    epsilon: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from multihmr_tpu.ops.norm import layernorm_cm

        D = x.shape[1]
        scale = self.param("scale", nn.initializers.ones, (D,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (D,), jnp.float32)
        return layernorm_cm(
            x, scale, bias, self.epsilon, jnp.dtype(self.dtype)
        )


class TLayerScale(nn.Module):
    dim: int
    init: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # [B, D, N]
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init), (self.dim,), jnp.float32
        )
        return x * gamma.astype(self.dtype)[None, :, None]


class TMlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = TDense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = _gelu(x, self.dtype)
        return TDense(self.dim, dtype=self.dtype, name="fc2")(x)


class TAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16
    mesh: Any = None
    tp_mode: str = "heads"
    # true token count when the stream is pre-padded to the kernel length
    # (None = stream length IS the true length; kernel pads internally)
    kv_len: Any = None

    @nn.compact
    def __call__(self, x):  # [B, D, N]
        B, D, N = x.shape
        h = self.num_heads
        dh = D // h
        qkv = TDense(3 * D, dtype=self.dtype, name="qkv")(x)  # [B, 3D, N]
        qkv = qkv.reshape(B, 3, h, dh, N)  # free: minor dim untouched
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # [B, h, dh, N]
        out = mesh_attention_t(
            q, k, v, self.mesh, mode=self.tp_mode, kv_len=self.kv_len
        )
        out = out.reshape(B, D, N)  # free merge
        return TDense(self.dim, dtype=self.dtype, name="proj")(out)


class TBlock(nn.Module):
    """Transposed-stream twin of :class:`Block` — identical parameter tree."""

    cfg: ViTConfig
    dtype: Any = jnp.bfloat16
    mesh: Any = None
    tp_mode: str = "heads"
    kv_len: Any = None  # pre-padded stream: true token count
    remat_mlp: bool = False  # see Block.remat_mlp

    @nn.compact
    def __call__(self, x, _scan_unused=None):
        c = self.cfg
        mlp_cls = nn.remat(TMlp, prevent_cse=False) if self.remat_mlp else TMlp
        y = TLayerNorm(name="norm1", dtype=self.dtype)(x)
        y = TAttention(
            c.embed_dim, c.num_heads, self.dtype,
            mesh=self.mesh, tp_mode=self.tp_mode, kv_len=self.kv_len,
            name="attn",
        )(y.astype(self.dtype))
        x = x + TLayerScale(c.embed_dim, c.layerscale_init, self.dtype, name="ls1")(y)
        y = TLayerNorm(name="norm2", dtype=self.dtype)(x)
        y = mlp_cls(c.embed_dim, int(c.embed_dim * c.mlp_ratio), self.dtype, name="mlp")(
            y.astype(self.dtype)
        )
        x = x + TLayerScale(c.embed_dim, c.layerscale_init, self.dtype, name="ls2")(y)
        return x, None


class ScannedBlocks(nn.Module):
    """``depth`` transformer blocks under ``nn.scan``: ONE compiled block
    body instead of ``depth`` separate ones. Cuts XLA compile time ~depth-fold
    for ViT-L (24 blocks) — params are stacked with a leading depth axis
    (the checkpoint converter stacks per-layer torch weights accordingly)."""

    cfg: ViTConfig
    dtype: Any = jnp.bfloat16
    remat: bool = False
    remat_policy: str = "block"  # "block" | "mlp" — see ModelConfig.remat_policy
    mesh: Any = None
    tp_mode: str = "heads"
    transposed: bool = False
    kv_len: Any = None  # pre-padded transposed stream: true token count

    @nn.compact
    def __call__(self, tokens):
        block_cls = TBlock if self.transposed else Block
        remat_mlp = False
        if self.remat:
            if self.remat_policy == "block":
                # rematerialize each whole block in the backward pass:
                # activation memory drops from O(depth·N·D) to O(N·D), but
                # the backward re-runs every block forward INCLUDING the
                # flash-attention kernel (the dominant op) — choose when
                # memory is the binding constraint (jax.checkpoint).
                block_cls = nn.remat(block_cls, prevent_cse=False)
            elif self.remat_policy == "mlp":
                # rematerialize only the MLP: drops the fc1 hidden state
                # (4·D·N, the largest single activation) and keeps the
                # attention residuals saved, so the backward recomputes two
                # cheap dense layers instead of the flash forward.
                remat_mlp = True
            else:
                raise ValueError(
                    f"unknown remat_policy {self.remat_policy!r} "
                    "(expected 'block' or 'mlp')"
                )
        scan = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.cfg.depth,
        )
        kw = {"kv_len": self.kv_len} if self.transposed else {}
        return scan(
            self.cfg, self.dtype, mesh=self.mesh, tp_mode=self.tp_mode,
            name="block", remat_mlp=remat_mlp, **kw
        )(tokens, None)[0]


class DINOv2ViT(nn.Module):
    """Backbone returning final-norm patch tokens and the cls token.

    Input: ``[B, S, S, 3]`` NHWC normalized image. The ``pos_embed`` param is
    ``[1, 1 + (S/14)^2, D]`` — already interpolated to the working grid (see
    module docstring).
    """

    cfg: ViTConfig
    grid_size: int
    dtype: Any = jnp.bfloat16
    scan_blocks: bool = True
    remat: bool = False
    remat_policy: str = "block"
    mesh: Any = None
    tp_mode: str = "heads"
    # channels-major [B, D, N] residual stream through the blocks (see the
    # "Transposed stream" comment above). Parameter-tree identical to the
    # standard stream; numerics identical up to fp reassociation. "ring"
    # (sequence-parallel) keeps the standard stream — its collectives want
    # the sequence on a shardable major dim.
    transposed_stream: bool = True

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, H, W, _ = x.shape
        p = c.patch_size
        gh, gw = H // p, W // p
        assert gh == gw == self.grid_size, (gh, gw, self.grid_size)
        n = gh * gw

        # Patch embedding: unfold to [B, N, p*p*3] then one big matmul.
        patches = x.reshape(B, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(B, n, p * p * 3).astype(self.dtype)
        tokens = nn.Dense(c.embed_dim, dtype=self.dtype, name="patch_embed")(patches)

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, c.embed_dim), jnp.float32
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + n, c.embed_dim),
            jnp.float32,
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, c.embed_dim)), tokens],
            axis=1,
        )
        tokens = tokens + pos.astype(self.dtype)

        transposed = self.transposed_stream and self.tp_mode != "ring"
        kv_len = None
        if transposed:
            tokens = tokens.transpose(0, 2, 1)  # [B, D, 1+N] channels-major
            # Pre-pad the stream ONCE to the flash kernel's padded length:
            # otherwise every layer pads q/k/v in and slices the output out,
            # and at batch > 1 XLA materializes those as separate HBM passes
            # (~3 ms/img at 896_L batch 4, profiled). Gated on ≤5% padding
            # overhead: worth it at 896²/1288² (3%) where the pad tokens ride
            # the dense matmuls almost free; at 672² the kernel pad is 11%
            # (2305→2560) and taxing every MLP with it costs more than the
            # boundary traffic saves. Pad tokens carry junk (NOT zeros) —
            # attention masks kv ≥ kv_len inside the kernel, everything else
            # is per-token, and the slice below drops them.
            from multihmr_tpu.ops.attention import transposed_padded_len

            n_tok = 1 + n
            n_pad = transposed_padded_len(n_tok)
            if n_pad != n_tok and (n_pad - n_tok) / n_tok <= 0.05:
                tokens = jnp.pad(tokens, [(0, 0), (0, 0), (0, n_pad - n_tok)])
                kv_len = n_tok
        if self.scan_blocks:
            tokens = ScannedBlocks(
                c, self.dtype, remat=self.remat, remat_policy=self.remat_policy,
                mesh=self.mesh, tp_mode=self.tp_mode, transposed=transposed,
                kv_len=kv_len, name="blocks",
            )(tokens)
        else:
            block_cls = TBlock if transposed else Block
            for i in range(c.depth):
                kw = {"kv_len": kv_len} if transposed else {}
                tokens = block_cls(
                    c, self.dtype, mesh=self.mesh, tp_mode=self.tp_mode,
                    name=f"block{i}", **kw
                )(tokens)[0]
        if transposed:
            if kv_len is not None:
                tokens = tokens[:, :, :kv_len]  # drop the pad-token junk
            tokens = tokens.transpose(0, 2, 1)  # back to [B, 1+N, D]

        tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(tokens)
        return {
            "patch_tokens": tokens[:, 1:].astype(self.dtype),  # [B, N, D]
            "cls_token": tokens[:, 0].astype(self.dtype),  # [B, D]
        }
