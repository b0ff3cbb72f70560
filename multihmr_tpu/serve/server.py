"""Batching HTTP inference server (production serving surface).

Stdlib-only (ThreadingHTTPServer) so it runs in every environment; each
request handler thread blocks on its own future while the
:class:`~multihmr_tpu.serve.batcher.DynamicBatcher` worker coalesces
concurrent requests into full fixed-shape device batches.

Endpoints:
  POST /infer          image bytes → JSON persons (scores, loc, transl,
                       transl_pelvis, j2d-count); ``?render=1`` → PNG overlay
  GET  /healthz        liveness
  GET  /stats          batcher stats (batch-size histogram, p50/p95 latency)

The reference has no serving stack beyond the per-image gradio demo
(app.py); this is the TPU-native equivalent of a production model server.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def build_batched_infer(model, params, max_batch: int = 8,
                        det_thresh: float = 0.3, nms_kernel_size: int = 3,
                        max_delay_ms: float = 5.0, forward_fn=None,
                        fields=None, mesh=None, wire: str = "u8",
                        max_queue: int = 0, deadline_s: float = 0.0):
    """(batcher, preprocess) for ``model`` at a fixed batch capacity.

    ``forward_fn``: optional ``(params, x, K) -> out`` override replacing the
    live ``model.forward`` jit — e.g. an AOT artifact adapted through
    :func:`multihmr_tpu.io.export.as_model_forward`, which starts serving
    without re-tracing/lowering (det_thresh/nms are baked into the artifact
    and the passed values are ignored).

    ``fields``: restrict device→host readback per request (see
    ``MultiHMR.extract_persons``) — the readback of unused mesh tensors is
    the dominant per-request tail for JSON-only clients.

    ``mesh``: a ``jax.sharding.Mesh`` → data-parallel serving: the batch
    axis is sharded over the mesh's ``data`` axis (weights replicated), so
    a multi-chip host serves one coalesced batch across all its chips.
    ``max_batch`` must be a multiple of the data-axis size."""
    import jax
    import jax.numpy as jnp

    from multihmr_tpu.serve.batcher import DynamicBatcher

    # batch_mode: the model object is built mesh-less here, so its "auto"
    # would pick lax.map even when THIS jit shards the batch over a mesh —
    # and lax.map over a sharded batch axis serializes across the chips.
    # Force "fused" for data-parallel serving; keep "auto" (= lax.map, same
    # per-image latency as batch 1) on a single chip.
    bm = "fused" if mesh is not None else "auto"
    # Wire format (``wire``: "u8" default, or "f32"): raw uint8 pixels,
    # ImageNet-normalized ON DEVICE inside the jit. Host→device upload is
    # the serving bottleneck, not compute — measured through the remote-TPU
    # tunnel (~38 MB/s): a fp32 [8,672,672,3] batch is 43 MB = 1.12 s of
    # upload vs 46 ms of model compute; uint8 is 4× smaller (285 ms) and
    # the normalize is a free fused prologue. The batcher ENFORCES one
    # dtype per wire (a coalesced batch takes its buffer dtype from its
    # first request, so mixing would silently corrupt results) — callers
    # submitting pre-normalized fp32 arrays directly (equivalence tests,
    # AOT artifacts exported with normalized inputs) pass wire="f32";
    # forward_fn artifacts force it.
    wire_u8 = forward_fn is None and wire == "u8"

    def body(p, x, K):
        if x.dtype == jnp.uint8:
            from multihmr_tpu.ops.image import IMG_NORM_MEAN, IMG_NORM_STD

            x = (x.astype(jnp.float32) / 255.0
                 - jnp.asarray(IMG_NORM_MEAN)) / jnp.asarray(IMG_NORM_STD)
        return model.forward(
            p, x, K, det_thresh=det_thresh, nms_kernel_size=nms_kernel_size,
            batch_mode=bm,
        )
    if forward_fn is not None:
        fwd = forward_fn
    elif mesh is not None:
        from multihmr_tpu.parallel.sharding import batch_sharding, replicated

        n_data = mesh.shape["data"]
        assert max_batch % n_data == 0, (max_batch, n_data)
        params = jax.device_put(params, replicated(mesh, params))
        x_sh = batch_sharding(mesh)
        fwd = jax.jit(
            body,
            in_shardings=(replicated(mesh, params), x_sh, x_sh),
            out_shardings=None,
        )
    else:
        fwd = jax.jit(body)

    def batch_fn(x, K):
        return fwd(params, jnp.asarray(x), jnp.asarray(K))

    def extract_fn(out, n_valid):
        # host sync happens here
        persons = model.extract_persons(out, fields=fields)
        return persons[:n_valid]

    S = model.cfg.img_size

    def preprocess(img_rgb: np.ndarray, fov: float = 60.0):
        from multihmr_tpu.io.preprocessing import preprocess_array

        p = preprocess_array(img_rgb, S, fov=fov)
        if wire_u8:  # raw resized pixels; normalization happens on device
            return np.asarray(p.resized, np.uint8), p.K, p.original
        return p.x, p.K, p.original

    batcher = DynamicBatcher(
        batch_fn, extract_fn, max_batch=max_batch, max_delay_ms=max_delay_ms,
        wire_dtype=np.uint8 if wire_u8 else np.float32,
        max_queue=max_queue, deadline_s=deadline_s,
    )
    return batcher, preprocess


def _persons_json(persons) -> bytes:
    out = []
    for h in persons:
        out.append({
            "score": float(np.asarray(h["scores"])),
            "loc": np.asarray(h["loc"]).tolist(),
            "transl": np.asarray(h["transl"]).tolist(),
            "transl_pelvis": np.asarray(h["transl_pelvis"]).reshape(-1).tolist(),
            "n_j2d": int(np.asarray(h["j2d"]).shape[0]),
        })
    return json.dumps({"persons": out, "count": len(out)}).encode()


def make_server(model, params, port: int = 8000, max_batch: int = 8,
                det_thresh: float = 0.3, nms_kernel_size: int = 3,
                max_delay_ms: float = 5.0, forward_fn=None,
                json_only: bool = False, mesh=None, warmup: bool = True,
                max_queue: int = 0, deadline_s: float = 0.0):
    """Build (ThreadingHTTPServer, batcher). Caller runs serve_forever().
    ``forward_fn``/``mesh``: see :func:`build_batched_infer`. ``json_only``:
    skip the mesh-tensor (v3d/rotvec/shape/...) device readback —
    /infer?render=1 then returns 400, and per-request latency drops to the
    JSON fields' readback only. ``warmup``: compile + run one dummy batch
    before returning, so the first clients never wait out the jit compile
    inside their request timeout (see :meth:`DynamicBatcher.warmup`).
    ``max_queue``/``deadline_s``: overload policy — a full queue sheds with
    HTTP 429 + Retry-After, a request that ages past the deadline before
    dispatch fails with 503 (see :class:`DynamicBatcher`)."""
    from PIL import Image

    from multihmr_tpu.render import overlay_human_meshes
    from multihmr_tpu.serve.batcher import DeadlineExceeded, QueueFull

    json_fields = ["scores", "loc", "transl", "transl_pelvis", "j2d"]
    batcher, preprocess = build_batched_infer(
        model, params, max_batch=max_batch, det_thresh=det_thresh,
        nms_kernel_size=nms_kernel_size, max_delay_ms=max_delay_ms,
        forward_fn=forward_fn, fields=json_fields if json_only else None,
        mesh=mesh, max_queue=max_queue, deadline_s=deadline_s,
    )
    if warmup:
        batcher.warmup((model.cfg.img_size, model.cfg.img_size, 3),
                       dtype=batcher.wire_dtype)
    faces = np.asarray(model.body_model.faces)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body, extra=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, "application/json", b'{"status":"ok"}')
            elif self.path == "/stats":
                self._send(
                    200, "application/json",
                    json.dumps(batcher.stats.snapshot()).encode(),
                )
            else:
                self._send(404, "text/plain", b"not found")

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            parsed = urlparse(self.path)
            if parsed.path != "/infer":
                self._send(404, "text/plain", b"not found")
                return
            render = parse_qs(parsed.query).get("render", ["0"])[0] == "1"
            if render and json_only:
                # reject BEFORE decoding/preprocessing the image body
                self._send(400, "application/json",
                           b'{"error":"server started json_only"}')
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                img = np.asarray(
                    Image.open(io.BytesIO(self.rfile.read(n))).convert("RGB")
                )
                x, K, pil = preprocess(img)
                persons = batcher.submit(x, K)
                if render:
                    from multihmr_tpu.io.preprocessing import (
                        rescale_K_to_original,
                    )

                    S = model.cfg.img_size
                    K_full = rescale_K_to_original(
                        K[None], pil.size[0], pil.size[1], S
                    )
                    overlay, _ = overlay_human_meshes(
                        persons, faces, K_full, pil
                    )
                    buf = io.BytesIO()
                    Image.fromarray(overlay).save(buf, format="PNG")
                    self._send(
                        200, "image/png", buf.getvalue(),
                        extra=[("X-Person-Count", str(len(persons)))],
                    )
                else:
                    self._send(200, "application/json", _persons_json(persons))
            except BrokenPipeError:  # pragma: no cover
                pass
            except QueueFull as e:
                # load shed: tell the client when to come back instead of
                # queueing past the serving ceiling
                self._send(
                    429, "application/json",
                    json.dumps({"error": "overloaded",
                                "retry_after_s": round(e.retry_after_s, 1)}
                               ).encode(),
                    extra=[("Retry-After",
                            str(max(1, int(round(e.retry_after_s)))))],
                )
            except DeadlineExceeded as e:
                self._send(
                    503, "application/json",
                    json.dumps({"error": f"deadline exceeded: {e}"}).encode(),
                )
            except TimeoutError as e:
                self._send(
                    504, "application/json",
                    json.dumps({"error": f"timeout: {e}"}).encode(),
                )
            except Exception as e:
                self._send(
                    500, "application/json",
                    json.dumps({"error": f"{type(e).__name__}: {e}"}).encode(),
                )

    class Server(ThreadingHTTPServer):
        # socketserver's default listen backlog is 5: a burst of concurrent
        # clients beyond that gets TCP connection resets (observed at 24
        # clients under load test). The batcher queue is the real limiter.
        request_queue_size = 128
        daemon_threads = True

    srv = Server(("0.0.0.0", port), Handler)
    srv.batcher = batcher  # for tests / shutdown
    return srv, batcher


def serve_forever_in_thread(srv) -> threading.Thread:
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return t
