"""Auto remat-policy selection (train/memory.py).

The chooser is calibrated against two measured v5e boundary points
(docs/DESIGN.md §3e): no-remat at 1288² batch-1 requests 16.23 GB and OOMs
on the 15.75 GB chip, while mlp-remat fits and no-remat at 896² batch-1
fits. These tests pin that the analytic estimate reproduces those verdicts
and behaves monotonically, so `--remat auto` (cli/train.py) keeps landing
the fast path exactly where it is safe.
"""

import pytest

from multihmr_tpu.config import named_config
from multihmr_tpu.train.memory import (
    approx_param_count,
    choose_remat,
    estimate_train_hbm_bytes,
    resolve_remat_flags,
)

V5E = 15.75e9


def test_calibration_point_1288_none_oom():
    cfg = named_config("multiHMR_1288_L_bedlam")
    est = estimate_train_hbm_bytes(cfg, 1, "none")
    # measured 16.23 GB requested; the estimate must reproduce it closely
    assert est == pytest.approx(16.23e9, rel=0.05)


def test_choices_match_measured_v5e_points():
    # 896_L batch-1: the no-remat stash fits -> fastest level, no remat
    remat, policy, rep = choose_remat(named_config("multiHMR_896_L"), 1,
                                      hbm_limit_bytes=V5E)
    assert not remat and rep["chosen"] == "none"
    # 1288_L batch-1: no-remat OOMs, mlp fits -> the production config
    remat, policy, rep = choose_remat(
        named_config("multiHMR_1288_L_bedlam"), 1, hbm_limit_bytes=V5E)
    assert remat and policy == "mlp"
    # 896_L batch-4: even mlp's stash estimate exceeds the chip -> block
    remat, policy, _ = choose_remat(named_config("multiHMR_896_L"), 4,
                                    hbm_limit_bytes=V5E)
    assert remat and policy == "block"
    # 672_B batch-8 (the training bench config family): fits without remat
    remat, policy, _ = choose_remat(named_config("multiHMR_672_B"), 8,
                                    hbm_limit_bytes=V5E)
    assert not remat


def test_monotonic_in_batch_and_policy():
    cfg = named_config("multiHMR_896_L")
    sizes = {"none": 0, "mlp": 1, "block": 2}
    prev = -1
    for b in (1, 2, 4, 8, 16):
        _, _, rep = choose_remat(cfg, b, hbm_limit_bytes=V5E)
        level = sizes[rep["chosen"]]
        assert level >= prev, f"batch {b} picked a faster level than smaller"
        prev = level
    # memory ordering of the estimates themselves
    for b in (1, 4):
        e = {p: estimate_train_hbm_bytes(cfg, b, p) for p in sizes}
        assert e["none"] > e["mlp"] > e["block"]


def test_pinned_policy_restricts_choice():
    # user pinned block but left auto to decide IF remat is needed
    cfg = named_config("multiHMR_896_L")
    remat, policy, _ = choose_remat(cfg, 1, hbm_limit_bytes=V5E,
                                    policy="block")
    assert not remat  # fits without
    remat, policy, _ = choose_remat(cfg, 16, hbm_limit_bytes=V5E,
                                    policy="block")
    assert remat and policy == "block"


def test_param_count_sane():
    # ViT-L + HPH head ≈ 320-350M (BASELINE.md training-floor analysis)
    n = approx_param_count(named_config("multiHMR_896_L"))
    assert 3.0e8 < n < 3.7e8
    n_b = approx_param_count(named_config("multiHMR_672_B"))
    assert 0.8e8 < n_b < 1.3e8


def test_resolve_remat_flags_cli_semantics():
    cfg = named_config("multiHMR_896_L")
    # auto delegates to the chooser and returns a report
    remat, policy, rep = resolve_remat_flags("auto", None, cfg, 1,
                                             hbm_limit_bytes=V5E)
    assert not remat and rep is not None and rep["chosen"] == "none"
    # explicit '1' without a policy keeps the mlp default
    assert resolve_remat_flags("1", None, cfg, 1) == (True, "mlp", None)
    assert resolve_remat_flags("1", "block", cfg, 1) == (True, "block", None)
    # explicit '0' never remats regardless of estimated pressure
    remat, _, rep = resolve_remat_flags("0", None, cfg, 64)
    assert not remat and rep is None


def test_degenerate_limit_falls_back_to_block():
    cfg = named_config("multiHMR_1288_L_bedlam")
    remat, policy, _ = choose_remat(cfg, 8, hbm_limit_bytes=2e9)
    assert remat and policy == "block"  # conservative, never raises
