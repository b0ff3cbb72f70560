"""Serving: the stdlib HTTP fallback server end-to-end (POST image → PNG)."""

import io
import threading
import urllib.request

import numpy as np
import jax

from multihmr_tpu.config import ModelConfig, ViTConfig
from multihmr_tpu.bodymodel import synthetic_body_model
from multihmr_tpu.models.multihmr import MultiHMR

TINY = ViTConfig(embed_dim=32, depth=2, num_heads=2)


class TinyConfig(ModelConfig):
    @property
    def vit(self):
        return TINY


def test_stdlib_server_roundtrip():
    from PIL import Image

    from multihmr_tpu.cli.app import build_infer

    cfg = TinyConfig(img_size=56, max_people=4, person_center="j5", compute_dtype="float32")
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))
    infer, _ = build_infer("tiny", None, model=model, params=params)

    # direct call
    img = np.random.default_rng(0).integers(0, 255, size=(80, 100, 3), dtype=np.uint8)
    overlay, glb, count = infer(img)
    assert overlay.shape[2] == 3 and isinstance(glb, bytes)

    # serve over HTTP
    from http.server import BaseHTTPRequestHandler, HTTPServer

    # spin a one-shot server on an ephemeral port
    server_holder = {}

    def run():
        from http.server import HTTPServer

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b'{"status": "ok"}')

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(n)
                arr = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
                overlay, glb, count = infer(arr)
                buf = io.BytesIO()
                Image.fromarray(overlay).save(buf, format="PNG")
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("X-Person-Count", str(count))
                self.end_headers()
                self.wfile.write(buf.getvalue())

        srv = HTTPServer(("127.0.0.1", 0), H)
        server_holder["srv"] = srv
        srv.serve_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    import time

    for _ in range(100):
        if "srv" in server_holder:
            break
        time.sleep(0.05)
    port = server_holder["srv"].server_address[1]

    # health
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=30) as r:
        assert b"ok" in r.read()
    # inference round trip
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/infer", data=buf.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        png = r.read()
        assert r.headers["Content-Type"] == "image/png"
        out = np.asarray(Image.open(io.BytesIO(png)))
        assert out.ndim == 3
    server_holder["srv"].shutdown()


def test_result_cache_roundtrip(tmp_path):
    """Per-example result caching (reference app.py:97-103): a repeated call
    with identical inputs is served from the on-disk cache."""
    from PIL import Image

    from multihmr_tpu.cli.app import build_infer

    cfg = TinyConfig(img_size=56, max_people=4, person_center="j5",
                     compute_dtype="float32")
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))
    cache = tmp_path / "cache"
    infer, _ = build_infer("tiny", None, model=model, params=params,
                           cache_dir=str(cache))

    img = np.random.default_rng(1).integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    overlay1, glb1, count1 = infer(img, det_thresh=0.3)
    import os

    files = sorted(os.listdir(cache))
    assert any(f.endswith(".png") for f in files)
    assert any(f.endswith(".glb") for f in files)

    # prove the second call reads the cache: poison the cached glb
    glb_fn = next(f for f in files if f.endswith(".glb"))
    with open(cache / glb_fn, "wb") as f:
        f.write(b"POISONED")
    overlay2, glb2, count2 = infer(img, det_thresh=0.3)
    assert glb2 == b"POISONED"
    assert count2 == count1
    np.testing.assert_array_equal(overlay2, overlay1)

    # different params -> different cache entry -> fresh compute
    _, glb3, _ = infer(img, det_thresh=0.5)
    assert glb3 != b"POISONED"
