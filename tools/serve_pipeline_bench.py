"""Isolate the serve batcher's pipeline-depth effect on device throughput.

`tools/serve_loadtest.py` measures the full HTTP path, but each invocation
is a fresh process/relay session and the dev relay's throughput drifts
between sessions - a 15 s sample at depth 1 vs a later one at depth 2
mostly measures the relay's mood. This tool builds the server ONCE, then
swaps in fresh `_Batcher`s of varying pipeline_depth over the SAME warm
jitted program, alternating depths A,B,A,B... within the single session so
drift cancels. No HTTP: images are submit()ed directly, so the number is
the pure batch-assembly -> H2D -> forward -> D2H pipeline rate.

Prints one JSON line per (depth, rep) plus a summary per depth.

Usage (TPU default; CLAUDE.md PYTHONPATH applies):
  python tools/serve_pipeline_bench.py [--depths 1,2,3] [--reps 3]
      [--batch-size 64] [--batches 6] [--model base_model]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--depths", default="1,2,3")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--batches", type=int, default=6,
                   help="full batches submitted per timed rep")
    p.add_argument("--model", default="base_model")
    p.add_argument("--img-hw", default=None,
                   help="HxW override (e.g. 96x128 for a CPU smoke run)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache_tpu"
            if args.device != "cpu"
            else Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    import jax.numpy as jnp

    # production-density checkpoint, same recipe as serve_loadtest.py
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import IMG_HW, production_density_variables  # noqa: E402

    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.serve import _Batcher, build_server
    from yogo_tpu.utils.checkpoint import save_checkpoint
    from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

    if args.img_hw:
        IMG_HW = tuple(int(x) for x in args.img_hw.split("x"))

    model = YOGO.create(
        IMG_HW, df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        compute_dtype=jnp.bfloat16, model_version=args.model,
    )
    variables = production_density_variables(model.init(jax.random.key(0)))
    tmp = tempfile.mkdtemp(prefix="pipe_bench_")
    ckpt = Path(tmp) / "m.ckpt"
    save_checkpoint(ckpt, model, variables,
                    classes=[f"c{i}" for i in range(7)])

    print("building server (one warm compile)...", file=sys.stderr)
    server = build_server(ckpt, port=0, batch_size=args.batch_size)
    base = server.yogo_batcher
    base.shutdown()  # we drive fresh batchers over the same fwd closures
    img_chw = base.img_chw

    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 256, img_chw, dtype=np.uint8)
        for _ in range(args.batch_size)
    ]
    depths = [int(x) for x in args.depths.split(",")]
    n_imgs = args.batches * args.batch_size
    per_depth = {d: [] for d in depths}

    for rep in range(args.reps):
        for d in depths:  # alternate within the session: drift cancels
            b = _Batcher(base._fwd_dispatch, base._fwd_fetch,
                         args.batch_size, img_chw, linger_s=0.0,
                         pipeline_depth=d)
            try:
                # warm one batch through (first dispatch on a new batcher)
                for f in [b.submit(frames[i % args.batch_size])
                          for i in range(args.batch_size)]:
                    f.result(timeout=300)
                t0 = time.monotonic()
                futs = [b.submit(frames[i % args.batch_size])
                        for i in range(n_imgs)]
                for f in futs:
                    f.result(timeout=600)
                dt = time.monotonic() - t0
            finally:
                b.shutdown()
            ips = n_imgs / dt
            per_depth[d].append(ips)
            print(json.dumps({"depth": d, "rep": rep,
                              "img_per_s": round(ips, 1),
                              "s_per_batch": round(dt / args.batches, 3)}),
                  flush=True)

    for d in depths:
        v = np.asarray(per_depth[d])
        print(json.dumps({"depth": d, "img_per_s_mean": round(v.mean(), 1),
                          "img_per_s_min": round(v.min(), 1),
                          "img_per_s_max": round(v.max(), 1),
                          "vs_depth1": round(
                              v.mean() / np.mean(per_depth[depths[0]]), 3)}),
              flush=True)
    server.server_close()


if __name__ == "__main__":
    main()
