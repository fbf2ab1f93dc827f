"""Soak test of `yogo serve`: sustained mixed raw/encoded load against a
REAL server process, with a mid-soak SIGHUP hot checkpoint reload and
RSS/fd ceiling assertions.

The load tests (tools/serve_loadtest.py, tools/serve_pipeline_bench.py)
measure throughput/latency over seconds; this probes the
standing-daemon failure class - slow memory leaks, fd exhaustion,
reload-under-load races - that only shows up when the server keeps
serving (VERDICT r3 weak-item #6).

Methodology:
  - `python -m yogo_tpu serve` runs as a SUBPROCESS (its own pid: real
    /proc RSS + fd accounting, real SIGHUP delivery - the in-process
    thread harness of the load tests can't probe either).
  - client lanes (threads, closed loop, for --seconds):
      raw    ServeClient.predict()        (octet-stream frames)
      rawN   ServeClient.predict_many(4)  (batch wire format)
      png    http POST image/png          (server-side decode path)
      stats  GET /metrics + /healthz      (the monitoring lane)
  - at the halfway mark the checkpoint file is OVERWRITTEN with fresh
    weights (same avals) and the server gets SIGHUP: the hot-reload path
    must swap weights with zero downtime (load keeps running; every
    in-flight and subsequent request must still return 200).
  - /proc/<pid>/status VmRSS and /proc/<pid>/fd are sampled throughout;
    the receipt asserts
      * zero request errors across all lanes,
      * responses CHANGED after the reload (new weights actually serve),
      * fd count stable (final <= post-warmup + 8),
      * RSS growth from post-warmup settle to end < --rss-slack-mb
        (default 200 MB; measures leak-per-hour when divided by
        --seconds).

Run (CPU, default 60 s):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/serve_soak.py \
      [--seconds 60] [--device cpu] [--batch-size 8]
Prints one JSON receipt line; exits nonzero on any assertion.
"""

from __future__ import annotations

import argparse
import http.client
import io
import json
import os
import signal
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--linger-ms", type=float, default=2.0)
    p.add_argument("--rss-slack-mb", type=float, default=200.0)
    p.add_argument("--hw", default="96,128",
                   help="serve at this input size (small keeps the CPU "
                        "soak request-bound, not conv-bound)")
    return p.parse_args()


def proc_rss_mb(pid: int) -> float:
    for line in open(f"/proc/{pid}/status"):
        if line.startswith("VmRSS:"):
            return int(line.split()[1]) / 1024.0
    raise RuntimeError("no VmRSS")


def proc_fd_count(pid: int) -> int:
    return len(os.listdir(f"/proc/{pid}/fd"))


def make_ckpt(path: Path, hw, seed: int) -> None:
    """A small detect-ish model (objectness biased up) - seed varies the
    weights so the mid-soak reload observably changes responses."""
    import jax
    import jax.numpy as jnp

    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.utils.checkpoint import save_checkpoint

    model = YOGO.create(hw, 0.1, 0.12, 2, model_version="quarter_filters",
                        compute_dtype=jnp.float32)
    variables = model.init(jax.random.key(seed))
    bias = np.asarray(variables["params"]["conv7"]["bias"]).copy()
    bias[4] = 1.0
    variables["params"]["conv7"]["bias"] = jnp.asarray(bias)
    save_checkpoint(path, model, variables, classes=["cell", "parasite"])


def main() -> None:
    args = parse_args()
    hw = tuple(int(v) for v in args.hw.split(","))

    import jax

    jax.config.update("jax_platforms", "cpu")  # ckpt generation only
    ckpt = Path("/tmp/serve_soak.ckpt")
    make_ckpt(ckpt, hw, seed=0)

    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    # persistent XLA compile cache for the server subprocess (shell-level
    # env DOES work for a fresh process): without it every soak pays the
    # full cold compile - >20 min for the TPU serve program through the
    # dev relay
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        str(REPO / (".jax_cache" if args.device == "cpu" else ".jax_cache_tpu")),
    )
    cmd = [sys.executable, "-m", "yogo_tpu", "serve", str(ckpt),
           "--port", str(port), "--batch-size", str(args.batch_size),
           "--linger-ms", str(args.linger_ms)]
    if args.device == "cpu":
        cmd += ["--device", "cpu"]
    # --device tpu: let the server take the environment's default
    # platform (the accelerator) - the platform NAME differs per harness
    # ("tpu" on a real TPU VM, "axon" through this dev relay), so forcing
    # the literal string would fail on one of them
    server = subprocess.Popen(
        cmd,
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=str(REPO),
    )
    server_log: list = []
    threading.Thread(
        target=lambda: server_log.extend(server.stdout), daemon=True
    ).start()

    from yogo_tpu.serve_client import ServeClient

    client = None
    # first compile can take a while - and on the TPU through the dev
    # relay a COLD serve program can take many minutes to compile
    startup_tries = 240 if args.device == "cpu" else 3600
    for _ in range(startup_tries):
        if server.poll() is not None:
            print("".join(server_log[-40:]), file=sys.stderr)
            sys.exit(f"server died during startup rc={server.returncode}")
        try:
            client = ServeClient(port=port, timeout=60)
            break
        except OSError:
            time.sleep(0.5)
    if client is None:
        server.kill()
        sys.exit("server never became healthy")

    frame = np.random.default_rng(1).integers(
        0, 256, (1, *hw), np.uint8
    )
    buf = io.BytesIO()
    from PIL import Image

    Image.fromarray(frame[0]).save(buf, format="PNG")
    png_body = buf.getvalue()

    # warmup both wire paths, then settle the RSS baseline
    client.predict(frame)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/predict", body=png_body,
                 headers={"Content-Type": "image/png"})
    assert conn.getresponse().status == 200
    conn.close()
    rss_settled = proc_rss_mb(server.pid)
    fd_settled = proc_fd_count(server.pid)

    stop_at = time.perf_counter() + args.seconds
    counts: dict = {"raw": 0, "rawN": 0, "png": 0, "stats": 0}
    errors: list = []
    det_samples: dict = {"before": None, "after": None}
    reload_done = threading.Event()
    rss_samples: list = []
    lock = threading.Lock()

    def lane_raw(name, many):
        try:
            c = ServeClient(port=port, timeout=60, max_retries=8)
            while time.perf_counter() < stop_at:
                if many:
                    r = c.predict_many(np.repeat(frame[None], 4, axis=0))[0]
                else:
                    r = c.predict(frame)
                with lock:
                    counts[name] += 1
                    key = "after" if reload_done.is_set() else "before"
                    if det_samples[key] is None and not many:
                        det_samples[key] = r
            c.close()
        except Exception as e:
            errors.append(f"{name}: {e!r}")

    def lane_png():
        try:
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            while time.perf_counter() < stop_at:
                c.request("POST", "/predict", body=png_body,
                          headers={"Content-Type": "image/png"})
                resp = c.getresponse()
                resp.read()
                if resp.status == 503:  # overload backoff lane-locally
                    time.sleep(0.05)
                    continue
                if resp.status != 200:
                    errors.append(f"png: HTTP {resp.status}")
                    return
                with lock:
                    counts["png"] += 1
            c.close()
        except Exception as e:
            errors.append(f"png: {e!r}")

    def lane_stats():
        try:
            c = ServeClient(port=port, timeout=60)
            while time.perf_counter() < stop_at:
                c.metrics()
                with lock:
                    counts["stats"] += 1
                rss_samples.append(proc_rss_mb(server.pid))
                time.sleep(1.0)
            c.close()
        except Exception as e:
            errors.append(f"stats: {e!r}")

    threads = [
        threading.Thread(target=lane_raw, args=("raw", False)),
        threading.Thread(target=lane_raw, args=("raw", False)),
        threading.Thread(target=lane_raw, args=("rawN", True)),
        threading.Thread(target=lane_png),
        threading.Thread(target=lane_stats),
    ]
    for t in threads:
        t.start()

    # ---- mid-soak hot reload under load
    time.sleep(args.seconds / 2)
    make_ckpt(ckpt, hw, seed=7)  # new weights, same avals
    os.kill(server.pid, signal.SIGHUP)
    time.sleep(2.0)
    reload_done.set()

    for t in threads:
        t.join()

    rss_end = proc_rss_mb(server.pid)
    fd_end = proc_fd_count(server.pid)
    server.send_signal(signal.SIGINT)
    try:
        server.wait(timeout=30)
    except subprocess.TimeoutExpired:
        server.kill()

    reload_lines = [ln for ln in server_log if "SIGHUP reload" in ln]
    changed = (
        det_samples["before"] is not None
        and det_samples["after"] is not None
        and det_samples["before"] != det_samples["after"]
    )
    receipt = {
        "seconds": args.seconds,
        "requests": counts,
        "errors": errors[:5],
        "n_errors": len(errors),
        "rss_settled_mb": round(rss_settled, 1),
        "rss_end_mb": round(rss_end, 1),
        "rss_peak_mb": round(max(rss_samples or [rss_end]), 1),
        "rss_growth_mb": round(rss_end - rss_settled, 1),
        "fd_settled": fd_settled,
        "fd_end": fd_end,
        "reload_logged": bool(reload_lines),
        "responses_changed_after_reload": changed,
    }
    print(json.dumps(receipt))

    assert not errors, f"request errors during soak: {errors[:5]}"
    assert sum(counts.values()) > 0 and all(
        counts[k] > 0 for k in ("raw", "rawN", "png", "stats")
    ), f"a lane made no progress: {counts}"
    assert reload_lines, "SIGHUP reload never logged by the server"
    assert changed, "responses identical after reload - new weights not serving"
    assert fd_end <= fd_settled + 8, f"fd leak: {fd_settled} -> {fd_end}"
    assert rss_end - rss_settled < args.rss_slack_mb, (
        f"RSS grew {rss_end - rss_settled:.0f} MB over {args.seconds:.0f}s "
        f"(settled {rss_settled:.0f} -> {rss_end:.0f})"
    )
    print("SERVE SOAK PASSED")


if __name__ == "__main__":
    main()
