"""Demo CLI loop tests (hermetic — stubbed model, no TPU, no assets).

The demo loop is a one-stage software pipeline: image i+1's forward is
dispatched BEFORE image i's host-side processing so the device computes
under the host render (reference demo.py:333-338 serializes sync+render
per image). These tests pin that ordering and the summary contract.
"""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


class _FakeBody:
    faces = np.zeros((4, 3), np.int32)


class _FakeCfg:
    img_size = 64
    max_people = 2


class _FakeModel:
    cfg = _FakeCfg()
    body_model = _FakeBody()

    def __init__(self, events):
        self._events = events

    def init_params(self, rng):
        # flax-variables layout expected by cast_backbone_bf16
        return {"params": {"head": {"w": jnp.zeros(())}}}

    def forward(self, p, x, K, det_thresh, nms_kernel_size):
        # only observable per-call when jax.jit is stubbed to identity
        self._events.append("dispatch")
        return {"v3d": jnp.zeros((1, 2, 12, 3))}

    def extract_persons(self, out, fields=None):
        return [[]]


def _run_demo(tmp_path, monkeypatch, n_images):
    from PIL import Image

    import multihmr_tpu.factory as factory
    import multihmr_tpu.render as render
    from multihmr_tpu.cli import demo

    src = tmp_path / "in"
    src.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_images):
        Image.fromarray(
            rng.uniform(0, 255, (40, 48, 3)).astype(np.uint8)
        ).save(src / f"im{i}.jpg")

    events = []
    model = _FakeModel(events)
    monkeypatch.setattr(factory, "build_model", lambda *a, **kw: (model, None))
    # identity-jit so each fwd call runs the Python body (recordable);
    # the real path traces once and replays compiled
    monkeypatch.setattr(jax, "jit", lambda f, **kw: f)

    real_overlay = render.overlay_human_meshes

    def overlay_spy(*a, **kw):
        events.append("process")
        return real_overlay(*a, **kw)

    monkeypatch.setattr(render, "overlay_human_meshes", overlay_spy)

    out_dir = tmp_path / "out"
    monkeypatch.setattr(
        "sys.argv",
        ["demo", "--img_folder", str(src), "--out_folder", str(out_dir),
         "--model_name", "stub"],
    )
    import io as _io
    from contextlib import redirect_stdout

    buf = _io.StringIO()
    with redirect_stdout(buf):
        demo.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    return events, json.loads(lines[-1]), out_dir


def test_demo_pipeline_dispatches_one_stage_ahead(tmp_path, monkeypatch):
    events, summary, out_dir = _run_demo(tmp_path, monkeypatch, 3)
    # serial would be d p d p d p; the pipeline must run d d p d p p
    assert events == [
        "dispatch", "dispatch", "process", "dispatch", "process", "process"
    ]
    assert summary["n_images"] == 3
    assert summary["img_per_s"] > 0 and summary["wall_s"] > 0
    assert summary["p50_wait_ms"] >= 0
    assert len(list(out_dir.glob("*.png"))) == 3


@pytest.mark.parametrize("n", [0, 1])
def test_demo_pipeline_degenerate_counts(tmp_path, monkeypatch, n):
    events, summary, out_dir = _run_demo(tmp_path, monkeypatch, n)
    assert events == ["dispatch", "process"] * n or events == (
        ["dispatch"] * n + ["process"] * n
    )
    assert summary["n_images"] == n
    if n == 0:
        assert summary["p50_wait_ms"] is None and summary["img_per_s"] is None
    assert len(list(out_dir.glob("*.png"))) == n
