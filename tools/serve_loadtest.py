"""Closed-loop load test of `yogo serve` (yogo_tpu/serve.py).

Measures what a production client of the HTTP server actually sees:
request throughput and latency percentiles under concurrency, plus the
batcher's own /metrics (mean batch occupancy, device dispatch time).

Methodology:
  - a base_model at the production 772x1032 grayscale shape, objectness
    head scaled/biased to the production detection density (~170
    survivors/image - bench.py's production_density_variables), saved to
    a temp .ckpt and served in-process (ThreadingHTTPServer on loopback,
    so no network between client and server; the TPU relay is still in
    the dispatch path, exactly as in any use of this dev harness).
  - closed-loop clients: K threads each POST the same frame back-to-back
    for --duration seconds. Closed-loop means measured throughput is
    bounded by (K / mean latency) - the standard serving-bench shape.
  - two wire formats per level: `png` (encoded image, server-side PIL
    decode) and `raw` (application/octet-stream uint8 frame, zero-decode
    path). The delta isolates the host-side decode cost.

Prints one JSON line per (mode, concurrency) level:
  {"mode": "raw", "concurrency": 16, "rps": ..., "p50_ms": ...,
   "p95_ms": ..., "p99_ms": ..., "mean_batch_occupancy": ...,
   "mean_dispatch_ms": ...}

Usage:
  python tools/serve_loadtest.py [--device cpu] [--batch-size 64]
      [--quantize] [--levels 1,4,16,64] [--duration 10]
      [--linger-ms 5] [--modes raw,png]

Run with PYTHONPATH=/root/repo:/root/.axon_site (CLAUDE.md); default
device is the real TPU.
"""

import argparse
import http.client
import io
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--levels", default="1,4,16,64")
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument("--linger-ms", type=float, default=5.0)
    p.add_argument("--modes", default="raw,png")
    p.add_argument("--model", default="base_model")
    p.add_argument("--pipeline-depth", type=int, default=2)
    p.add_argument(
        "--frames-per-request", default="1",
        help="raw mode only: comma list of N values - concatenate N frames "
             "per POST (the batch request path; png mode always sends 1). "
             "All values run within ONE server session so relay drift "
             "cancels across the sweep.",
    )
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache_tpu"
            if args.device != "cpu"
            else Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import IMG_HW, production_density_variables
    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.serve import build_server
    from yogo_tpu.utils.checkpoint import save_checkpoint
    from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

    model = YOGO.create(
        IMG_HW, df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    variables = production_density_variables(model.init(jax.random.key(0)))
    ckpt = Path("/tmp/serve_loadtest.ckpt")
    save_checkpoint(ckpt, model, variables,
                    classes=[f"c{i}" for i in range(7)])

    calib_dir = None
    if args.quantize:
        from PIL import Image

        calib_dir = Path("/tmp/serve_loadtest_calib")
        calib_dir.mkdir(exist_ok=True)
        rng = np.random.default_rng(0)
        for i in range(8):
            Image.fromarray(
                rng.integers(0, 256, IMG_HW, dtype=np.uint8)
            ).save(calib_dir / f"cal{i}.png")

    print(f"building server (batch={args.batch_size}, "
          f"quantize={args.quantize}, linger={args.linger_ms}ms; first "
          "compile on a cold cache takes minutes on TPU)...",
          file=sys.stderr)
    server = build_server(
        ckpt, port=0, batch_size=args.batch_size,
        quantize=args.quantize, calibration_images=calib_dir,
        linger_ms=args.linger_ms, pipeline_depth=args.pipeline_depth,
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    # one production-size frame, both wire encodings
    frame = np.random.default_rng(1).integers(
        0, 256, (1, *IMG_HW), dtype=np.uint8
    )
    fprs = [max(1, int(x)) for x in
            str(args.frames_per_request).split(",")]
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame[0]).save(buf, format="PNG")
    png_body = buf.getvalue()
    # (mode, frames_per_request) combos: raw sweeps the batch-request
    # sizes, png is always single-frame (no encoded batch wire format)
    combos = []
    for mode in args.modes.split(","):
        if mode == "raw":
            combos += [
                ("raw", fpr, frame.tobytes() * fpr,
                 "application/octet-stream")
                for fpr in fprs
            ]
        elif mode == "png":
            combos.append((mode, 1, png_body, "image/png"))
        else:
            sys.exit(f"unknown mode {mode!r}: --modes takes raw,png")

    def metrics():
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        c.request("GET", "/metrics")
        r = json.loads(c.getresponse().read())
        c.close()
        return r

    def client_loop(body, ctype, stop_t, latencies, errors):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        try:
            while time.perf_counter() < stop_t:
                t0 = time.perf_counter()
                conn.request("POST", "/predict", body=body,
                             headers={"Content-Type": ctype})
                resp = conn.getresponse()
                resp.read()
                if resp.status != 200:
                    errors.append(resp.status)
                else:
                    latencies.append(time.perf_counter() - t0)
        except Exception as e:  # record, don't kill the level
            errors.append(repr(e))
        finally:
            conn.close()

    results = []
    for mode, fpr, body, ctype in combos:
        # warmup: fill every compiled shape / code path once
        lat0, err0 = [], []
        client_loop(body, ctype, time.perf_counter() + 2.0, lat0, err0)
        if err0:
            print(f"warmup errors ({mode}/fpr={fpr}): {err0[:3]}",
                  file=sys.stderr)
            continue
        for k in (int(x) for x in args.levels.split(",")):
            m0 = metrics()
            latencies, errors = [], []
            stop_t = time.perf_counter() + args.duration
            threads = [
                threading.Thread(
                    target=client_loop,
                    args=(body, ctype, stop_t, latencies, errors),
                )
                for _ in range(k)
            ]
            t_start = time.perf_counter()
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            wall = time.perf_counter() - t_start
            m1 = metrics()
            if not latencies:
                print(f"level {mode}/{k}: no successful requests, "
                      f"errors={errors[:3]}", file=sys.stderr)
                continue
            lat = np.sort(np.asarray(latencies)) * 1e3
            d_img = m1["images"] - m0["images"]
            d_b = max(m1["batches"] - m0["batches"], 1)
            row = {
                "mode": mode,
                "concurrency": k,
                "pipeline_depth": args.pipeline_depth,
                "frames_per_request": fpr,
                "requests": len(lat),
                "rps": round(len(lat) / wall, 1),
                "img_per_s": round(len(lat) * fpr / wall, 1),
                "p50_ms": round(float(lat[len(lat) // 2]), 1),
                "p95_ms": round(float(lat[int(len(lat) * 0.95)]), 1),
                "p99_ms": round(float(lat[min(int(len(lat) * 0.99),
                                              len(lat) - 1)]), 1),
                "mean_batch_occupancy": round(d_img / d_b, 2),
                "mean_dispatch_ms": round(
                    (m1["mean_dispatch_ms"] * m1["batches"]
                     - m0["mean_dispatch_ms"] * m0["batches"]) / d_b, 1),
                "errors": len(errors),
                "error_sample": [str(e) for e in errors[:2]],
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    server.shutdown()
    server.yogo_batcher.shutdown()
    server.server_close()
    return results


if __name__ == "__main__":
    main()
