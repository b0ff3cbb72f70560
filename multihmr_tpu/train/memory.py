"""Training-memory estimate and automatic remat-policy selection.

The reference leaves activation memory to the user (torch's autograd keeps
everything; reference train.py:240-334 simply OOMs when it doesn't fit and
relies on fp16 autocast + small batches). The TPU rebuild exposes three
rematerialisation levels (config.py::ModelConfig.remat/remat_policy) whose
speed ranking is fixed — ``none`` > ``mlp`` > ``block`` (measured:
896_L batch-1 0.133 / 0.138 / 0.159 s/step, docs/DESIGN.md §3e) — but whose
memory footprints differ by ~8x. Until round 5 the user had to discover the
right flag by OOM-ing; :func:`choose_remat` picks the FASTEST level whose
estimated HBM footprint fits, so ``--remat auto`` (the CLI default) lands
the no-remat win where the stash fits and degrades gracefully where it
doesn't.

Calibration (v5e, 15.75 GB usable HBM — the XLA bytes_limit observed on
this chip):

- 1288_L batch-1 no-remat: measured 16.23 GB requested -> OOM
  (docs/DESIGN.md §3e). This single boundary point fixes the no-remat
  per-token-dim activation constant at ~50 bytes (everything the backward
  keeps: block residuals, qkv, attention out, both MLP intermediates, the
  flash stash and fused-backward dq-partial buffers).
- 1288_L batch-1 mlp-remat: fits and is the production config
  (BENCH_TRAIN.json 0.368 s/step). Dropping the fc1 hidden + gelu output
  (2 x 4D bf16 = 16 bytes/token-dim) gives the mlp constant of ~34.
- block-remat keeps only the scan carries (one bf16 [N, D] residual pair
  per layer) plus recompute workspace: ~6 bytes/token-dim.

The estimate is deliberately conservative (a wrong "fits" answer costs the
user an OOM; a wrong "doesn't fit" costs 4-16% step time), so the fit test
uses a 0.92 safety factor on the HBM limit.
"""

from __future__ import annotations

from typing import Optional, Tuple

# bytes per (token x embed-dim x layer) the backward must keep, per policy
_ACT_BYTES_PER_TOKEN_DIM = {"none": 50.0, "mlp": 34.0, "block": 6.0}
# params (fp32) + Adam m, v (fp32) + the per-step bf16 compute copy
_BYTES_PER_PARAM = 4 + 4 + 4 + 2
# image/patch buffers, detection + HPH + SMPL-X fwd/bwd stash, GT targets,
# loss temporaries — all small next to the ViT scan stash; lumped
_FIXED_BYTES = 1.0e9
_SAFETY = 0.92
_FALLBACK_HBM_BYTES = 15.75e9  # v5e usable bytes_limit (docs/DESIGN.md §3e)

# fastest first — the chooser returns the first level that fits
_POLICY_ORDER = ("none", "mlp", "block")


def approx_param_count(cfg) -> int:
    """Analytic parameter count (±5% is plenty for a memory estimate).

    Per ViT layer: qkv (3D²) + proj (D²) + fc1/fc2 (8D²) = 12D²; the HPH
    cross-attention stack, SMPL-X regression head, patch/camera embeddings
    and detection head add a config-dependent but small tail (~30M at
    D=1024 — reference model.py:352-593 scale).
    """
    v = cfg.vit
    vit = 12 * v.embed_dim * v.embed_dim * v.depth
    h = cfg.hph
    head = 12 * h.dim * h.dim * cfg.xat_depth + h.dim * cfg.token_dim
    embeds = v.embed_dim * (v.patch_size * v.patch_size * 3
                            + v.pos_embed_size * v.pos_embed_size)
    return int((vit + head + embeds) * 1.05)


def estimate_train_hbm_bytes(cfg, batch_size: int, policy: str) -> float:
    """Estimated peak HBM of one donated train step at the given remat level.

    ``policy`` is ``"none"`` (remat=False), ``"mlp"`` or ``"block"``.
    """
    act = _ACT_BYTES_PER_TOKEN_DIM[policy]
    v = cfg.vit
    tokens = cfg.num_patches + 1
    stash = act * batch_size * tokens * v.embed_dim * v.depth
    return approx_param_count(cfg) * _BYTES_PER_PARAM + stash + _FIXED_BYTES


def device_hbm_limit(default: float = _FALLBACK_HBM_BYTES) -> float:
    """The accelerator's usable byte limit, or ``default`` when unknown.

    On CPU (tests, the multichip dryrun) memory_stats is absent or
    host-sized; callers there pass an explicit limit.
    """
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        return float(limit) if limit else default
    except Exception:
        return default


def choose_remat(
    cfg,
    batch_size: int,
    hbm_limit_bytes: Optional[float] = None,
    policy: Optional[str] = None,
) -> Tuple[bool, str, dict]:
    """Pick the fastest remat level whose estimate fits the HBM budget.

    Returns ``(remat, remat_policy, report)`` ready for ModelConfig.
    ``policy`` restricts the choice to {"none", policy} (the user pinned a
    policy but left ``--remat auto`` to decide whether it's needed at all).
    When even "block" does not fit, block is returned anyway — the estimate
    is conservative and an OOM error names the real number.
    """
    limit = hbm_limit_bytes if hbm_limit_bytes else device_hbm_limit()
    budget = _SAFETY * limit
    order = _POLICY_ORDER if policy is None else ("none", policy)
    estimates = {p: estimate_train_hbm_bytes(cfg, batch_size, p)
                 for p in order}
    chosen = order[-1]
    for p in order:
        if estimates[p] <= budget:
            chosen = p
            break
    report = {
        "hbm_limit_bytes": limit,
        "budget_bytes": budget,
        "estimates_gb": {p: round(e / 1e9, 2) for p, e in estimates.items()},
        "chosen": chosen,
    }
    return chosen != "none", ("mlp" if chosen == "none" else chosen), report


def resolve_remat_flags(
    remat_arg: str,
    policy_arg: Optional[str],
    cfg,
    per_device_batch: int,
    hbm_limit_bytes: Optional[float] = None,
) -> Tuple[bool, str, Optional[dict]]:
    """CLI-flag resolution for ``--remat {auto,0,1} --remat_policy {...}``.

    Returns ``(remat, remat_policy, report)``; ``report`` is None unless
    auto ran. Used by cli/train.py; factored here so the decision logic is
    unit-testable without driving the training main.
    """
    if remat_arg == "auto":
        return choose_remat(cfg, per_device_batch,
                            hbm_limit_bytes=hbm_limit_bytes,
                            policy=policy_arg)
    return bool(int(remat_arg)), policy_arg or "mlp", None
