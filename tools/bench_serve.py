"""Serving-under-load benchmark: drive the batching HTTP server on-chip.

The model-level numbers in BENCH_SWEEP.json (e.g. 672_B batch-8 ~172 img/s)
measure one jit program in a loop; this tool measures the PRODUCTION serving
surface instead — `serve.server.make_server` (stdlib ThreadingHTTPServer +
DynamicBatcher) under genuinely concurrent HTTP clients, so the number
includes request parsing, JPEG decode, preprocessing, batch coalescing, the
device step, and the JSON readback tail. The reference has no serving stack
to compare against (app.py is a one-image-at-a-time gradio demo); the
comparison point is this repo's own model-level throughput ceiling.

Usage:
  python tools/bench_serve.py [--model_name multiHMR_672_B] [--clients 24]
      [--requests 20] [--max_batch 8] [--max_delay_ms 5] [--no-merge]

Prints one JSON line with client-side p50/p95/img_s and the server's own
/stats snapshot (batch-size histogram, server-side latency), and merges a
``serve_<name>`` entry into BENCH_SWEEP.json unless --no-merge.
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpegs(n: int, w: int = 800, h: int = 600) -> list:
    """A few distinct synthetic JPEGs so decode work is realistic."""
    from PIL import Image

    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        # smooth gradient + noise compresses like a photo, not like static
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack(
            [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 255 / (w + h))], -1
        )
        img = np.clip(base + rng.normal(0, 12, (h, w, 3)), 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=90)
        out.append(buf.getvalue())
    return out


def run_load(url: str, jpegs: list, clients: int, requests_each: int,
             retry_shed: bool = False):
    """Drive ``clients`` concurrent threads, each POSTing ``requests_each``
    images sequentially. Returns (per-request latencies s, wall s, errors,
    status_counts). Shed responses (429/503) are counted in status_counts,
    not reported as errors — they are the overload policy working; with
    ``retry_shed`` a 429 waits out the server's Retry-After then retries
    once (the well-behaved-client protocol)."""
    lat = [[] for _ in range(clients)]
    errors = []
    status_counts: dict = {}
    counts_lock = threading.Lock()
    start_gate = threading.Event()

    def count(code):
        with counts_lock:
            status_counts[code] = status_counts.get(code, 0) + 1

    def client(ci: int):
        start_gate.wait()
        for ri in range(requests_each):
            body = jpegs[(ci + ri) % len(jpegs)]
            attempts = 2 if retry_shed else 1
            t0 = time.perf_counter()
            for attempt in range(attempts):
                req = urllib.request.Request(
                    url + "/infer", data=body,
                    headers={"Content-Type": "image/jpeg"},
                )
                try:
                    with urllib.request.urlopen(req, timeout=120) as r:
                        json.loads(r.read())
                    lat[ci].append(time.perf_counter() - t0)
                    count(200)
                    break
                except urllib.error.HTTPError as e:  # pragma: no cover
                    count(e.code)
                    if e.code == 429 and attempt + 1 < attempts:
                        time.sleep(float(e.headers.get("Retry-After", 1)))
                        continue
                    if e.code not in (429, 503):
                        body_txt = e.read()[:200].decode(errors="replace")
                        errors.append(
                            f"client {ci} req {ri}: HTTP {e.code}: {body_txt}")
                    break
                except Exception as e:  # pragma: no cover - diagnostics
                    errors.append(
                        f"client {ci} req {ri}: {type(e).__name__}: {e}")
                    break

    threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    for t in threads:
        t.start()
    t0 = time.perf_counter()
    start_gate.set()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return [x for l in lat for x in l], wall, errors, status_counts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default="multiHMR_672_B")
    p.add_argument("--clients", type=int, default=24)
    p.add_argument("--requests", type=int, default=20)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_delay_ms", type=float, default=5.0)
    p.add_argument("--max_queue", type=int, default=16,
                   help="bounded queue for the overload policy under test")
    p.add_argument("--deadline_s", type=float, default=10.0)
    p.add_argument("--burst_clients", type=int, default=0,
                   help="over-capacity burst phase size (0 = 4x clients)")
    p.add_argument("--no-merge", action="store_true")
    args = p.parse_args()

    import jax

    from multihmr_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # share bench.py's warm .jax_cache

    from multihmr_tpu.factory import build_model
    from multihmr_tpu.serve.server import make_server, serve_forever_in_thread
    from multihmr_tpu.utils.precision import cast_backbone_bf16

    model, _ = build_model(args.model_name)
    params = cast_backbone_bf16(model.init_params(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)

    # json_only: production JSON clients don't pay the mesh-tensor readback.
    # make_server's warmup compiles + runs one dummy batch before returning.
    t0 = time.perf_counter()
    srv, batcher = make_server(
        model, params, port=0, max_batch=args.max_batch,
        max_delay_ms=args.max_delay_ms, json_only=True,
        max_queue=args.max_queue, deadline_s=args.deadline_s,
    )
    print(f"# server up (compile) {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    serve_forever_in_thread(srv)
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    jpegs = make_jpegs(4)

    # HTTP-path warmup burst (handler threads, decode, batcher round trip)
    _, warm_wall, errs, _ = run_load(url, jpegs, clients=args.max_batch,
                                     requests_each=1)
    if errs:
        print("\n".join(errs), file=sys.stderr)
        raise SystemExit("warmup failed")
    # the warmup burst stays out of the reported server-side stats
    batcher.stats = type(batcher.stats)()

    lat, wall, errs, _ = run_load(url, jpegs, args.clients, args.requests)
    if errs:
        print("\n".join(errs[:5]), file=sys.stderr)
    with urllib.request.urlopen(url + "/stats", timeout=10) as r:
        stats = json.loads(r.read())

    # ---- over-capacity burst: offered load far beyond the wire ceiling ----
    # The steady-state phase above is queueing-dominated already; this phase
    # proves the OVERLOAD POLICY — with the bounded queue + deadline, a
    # 2-4× burst must yield (a) nonzero 429 sheds, (b) a p95 for ACCEPTED
    # requests bounded by ~(max_queue/max_batch + 2) batch cycles, instead
    # of latency growing linearly with the burst size.
    burst_clients = args.burst_clients or 4 * args.clients
    batcher.stats = type(batcher.stats)()
    b_lat, b_wall, b_errs, b_codes = run_load(
        url, jpegs, burst_clients, requests_each=4, retry_shed=True)
    if b_errs:
        print("\n".join(b_errs[:5]), file=sys.stderr)
    with urllib.request.urlopen(url + "/stats", timeout=10) as r:
        b_stats = json.loads(r.read())
    srv.shutdown()
    batcher.close()

    b_lat_ms = 1e3 * np.asarray(b_lat) if b_lat else np.asarray([])
    burst = {
        "offered_clients": burst_clients,
        "max_queue": args.max_queue,
        "deadline_s": args.deadline_s,
        "ok": int(b_codes.get(200, 0)),
        "shed_429": int(b_codes.get(429, 0)),
        "shed_503": int(b_codes.get(503, 0)),
        "other_errors": len(b_errs),
        "throughput_img_s": round(len(b_lat) / b_wall, 1) if b_wall else 0,
        "accepted_latency_ms": None if not len(b_lat_ms) else {
            "p50": round(float(np.percentile(b_lat_ms, 50)), 1),
            "p95": round(float(np.percentile(b_lat_ms, 95)), 1),
            "max": round(float(b_lat_ms.max()), 1),
        },
        "server_stats": b_stats,
    }

    lat_ms = 1e3 * np.asarray(lat)
    n_ok = len(lat)
    result = {
        "model": args.model_name,
        "clients": args.clients,
        "requests_ok": n_ok,
        "requests_failed": len(errs),
        "throughput_img_s": round(n_ok / wall, 1),
        # n_ok == 0 (every request failed) must still report the failure
        # counts + server stats instead of crashing on an empty percentile
        "client_latency_ms": None if n_ok == 0 else {
            "p50": round(float(np.percentile(lat_ms, 50)), 1),
            "p95": round(float(np.percentile(lat_ms, 95)), 1),
            "max": round(float(lat_ms.max()), 1),
        },
        "server_stats": stats,
        "overload_burst": burst,
    }
    print(json.dumps(result), flush=True)

    if not args.no_merge:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_SWEEP.json",
        )
        with open(path) as f:
            sweep = json.load(f)
        sweep["results"][f"serve_{args.model_name}"] = result
        with open(path, "w") as f:
            json.dump(sweep, f, indent=1)
        print(f"# merged into {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
