"""Interactive web demo — the analogue of reference app.py (Gradio HF-space).

Serves single-image inference with overlay + downloadable .glb. Uses gradio
when installed; otherwise falls back to a dependency-free stdlib HTTP server
(POST an image, get the overlay PNG back), so the serving surface exists in
every environment.

Usage:
    python -m multihmr_tpu.cli.app --model_name multiHMR_672_S [--ckpt ...] \
        [--port 7860]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import tempfile

import numpy as np


def build_infer(model_name: str, ckpt, model=None, params=None, cache_dir=None,
                cache_max_entries: int = 50):
    import jax
    import jax.numpy as jnp

    from multihmr_tpu.factory import build_model
    from multihmr_tpu.io.preprocessing import rescale_K_to_original
    from multihmr_tpu.render import overlay_human_meshes, create_glb_scene

    if model is None:
        model, params = build_model(model_name, checkpoint=ckpt)
    if params is None:
        params = model.init_params(jax.random.PRNGKey(0))
    from multihmr_tpu.utils.precision import cast_backbone_bf16

    params = cast_backbone_bf16(params)  # inference: bf16 weight storage
    faces = np.asarray(model.body_model.faces)
    fwd_cache = {}

    def _cache_paths(img, det_thresh, nms_kernel_size, fov):
        """Per-example result cache (reference app.py:83-103 keys results by
        example basename + params; we key by image content hash so repeated
        uploads of the same image hit too, pruned to ``cache_max_entries``)."""
        import hashlib

        h = hashlib.sha1(np.ascontiguousarray(img).tobytes()).hexdigest()[:16]
        base = (
            f"{h}_{model_name}_thresh{int(det_thresh * 100)}"
            f"_nms{int(nms_kernel_size)}_fov{int(fov)}"
        )
        return (
            os.path.join(cache_dir, base + ".png"),
            os.path.join(cache_dir, base + ".glb"),
        )

    def _prune_cache():
        entries = sorted(
            (os.path.join(cache_dir, f) for f in os.listdir(cache_dir)),
            key=os.path.getmtime,
        )
        for old in entries[: max(0, len(entries) - 2 * cache_max_entries)]:
            try:
                os.remove(old)
            except OSError:
                pass

    def infer(img: np.ndarray, det_thresh: float = 0.3, nms_kernel_size: int = 3,
              fov: float = 60):
        """img: HWC uint8. Returns (overlay uint8, glb bytes, n_persons)."""
        from PIL import Image

        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
            png_fn, glb_fn = _cache_paths(img, det_thresh, nms_kernel_size, fov)
            if os.path.exists(png_fn) and os.path.exists(glb_fn):
                cached = Image.open(png_fn)
                count = int(cached.info.get("n_persons", -1))
                with open(glb_fn, "rb") as f:
                    return np.asarray(cached.convert("RGB")), f.read(), count

        from multihmr_tpu.io.preprocessing import preprocess_array

        S = model.cfg.img_size
        pre = preprocess_array(img, S, fov=fov)
        pil, resized = pre.original, pre.resized
        x = pre.x[None]
        K = pre.K[None]
        # det_thresh is only used in >= comparisons → keep it a TRACED
        # argument so moving the threshold slider reuses the compiled
        # program. Only nms_kernel_size (a conv window) is genuinely static
        # — each distinct value costs one (slow, remote) compile.
        key = nms_kernel_size
        if key not in fwd_cache:
            fwd_cache[key] = jax.jit(
                lambda p, x, K, t: model.forward(
                    p, x, K, det_thresh=t, nms_kernel_size=nms_kernel_size
                )
            )
        out = fwd_cache[key](
            params, jnp.asarray(x), jnp.asarray(K),
            jnp.float32(det_thresh),
        )
        humans = model.extract_persons(out)[0]
        K_full = rescale_K_to_original(K, pil.size[0], pil.size[1], S)
        overlay, _ = overlay_human_meshes(humans, faces, K_full, pil)
        glb = create_glb_scene(
            [np.asarray(h["v3d"]) for h in humans], [faces] * len(humans),
            img=resized, focal=float(np.asarray(K)[0, 0, 0]),
        )
        if cache_dir is not None:
            from PIL.PngImagePlugin import PngInfo

            meta = PngInfo()
            meta.add_text("n_persons", str(len(humans)))
            Image.fromarray(overlay).save(png_fn, pnginfo=meta)
            with open(glb_fn, "wb") as f:
                f.write(glb)
            _prune_cache()
        return overlay, glb, len(humans)

    return infer, model


def serve_stdlib(infer, port: int):
    """Minimal fallback server: POST image bytes to /infer → PNG overlay;
    GET /health → JSON."""
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/health":
                body = json.dumps({"status": "ok"}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path.startswith("/infer"):
                n = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(n)
                img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
                overlay, glb, count = infer(img)
                buf = io.BytesIO()
                Image.fromarray(overlay).save(buf, format="PNG")
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("X-Person-Count", str(count))
                self.end_headers()
                self.wfile.write(buf.getvalue())
            else:
                self.send_response(404)
                self.end_headers()

    print(f"serving on http://0.0.0.0:{port} (POST /infer, GET /health)")
    HTTPServer(("0.0.0.0", port), Handler).serve_forever()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", type=str, default="multiHMR_672_S")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument(
        "--cache_dir",
        type=str,
        default=os.path.join(tempfile.gettempdir(), "multihmr_tpu_results"),
        help="per-example result cache (reference app.py:97-103); '' disables",
    )
    args = p.parse_args()

    infer, model = build_infer(
        args.model_name, args.ckpt, cache_dir=args.cache_dir or None
    )
    try:
        import gradio as gr
    except ImportError:
        serve_stdlib(infer, args.port)
        return

    def gr_infer(img, det_thresh, nms, fov):
        overlay, glb, count = infer(img, det_thresh, int(nms), fov)
        glb_path = os.path.join(tempfile.mkdtemp(), "scene.glb")
        with open(glb_path, "wb") as f:
            f.write(glb)
        return overlay, glb_path, f"{count} persons"

    demo = gr.Interface(
        fn=gr_infer,
        inputs=[
            gr.Image(type="numpy"),
            gr.Slider(0.05, 0.9, value=0.3, label="detection threshold"),
            gr.Slider(1, 7, value=3, step=2, label="NMS kernel"),
            gr.Slider(30, 110, value=60, label="FOV"),
        ],
        outputs=[gr.Image(), gr.Model3D(), gr.Text()],
        title=f"Multi-HMR TPU — {args.model_name}",
    )
    demo.launch(server_port=args.port)


if __name__ == "__main__":
    main()
