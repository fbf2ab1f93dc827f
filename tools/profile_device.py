"""Per-op TPU device profiling via jax.profiler xplane traces.

Driver-round-3 discovery (2026-08-20): the axon harness now records DEVICE
lanes - earlier probes saw host-only traces (docs/perf-notes.md
"jax.profiler on axon: host-only", now superseded). The xplane carries,
per HLO op execution: device duration, hlo_category, flops,
bytes_accessed, shape, and the originating JAX op + source line (tf_op /
source_stack). That is full roofline-capable attribution: achieved
TFLOP/s and GB/s per fusion, no more block-scan proxies.

Profiles bench.py's EXACT programs (so the persistent TPU compile cache
at .jax_cache_tpu is reused - novel graphs compile for minutes through
the relay):

  PROF_TARGET=fwd    scanned bf16 forward, bs=PROF_BS (default 512)
  PROF_TARGET=e2e    forward + fused count at production density
  PROF_TARGET=train  one donated train step, bs=PROF_BS (default 64)

Run: PYTHONPATH=/root/repo:/root/.axon_site PROF_TARGET=fwd \
       python tools/profile_device.py
Prints a per-op table (top PROF_TOP rows, default 25), a per-category
summary, and the device-busy total. Sanity: a standalone 1024^3 bf16
matmul measures 11.56 us = 185 TF/s = 94% of v5e peak, and the whole-
program XLA-Modules span matches bench.py's wall-clock rate.
"""

from __future__ import annotations

import collections
import glob
import os
import sys
import tempfile

import jax
import jax.numpy as jnp

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0


def _trace(fn) -> str:
    """Run fn() under a profiler trace; return the xplane.pb path."""
    out = tempfile.mkdtemp(prefix="yogo_prof_")
    jax.profiler.start_trace(out)
    fn()
    jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(out, "plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise RuntimeError(f"no xplane.pb written under {out}")
    return max(paths, key=os.path.getmtime)


def _int_stat(s) -> int:
    """XStat value is a proto oneof; some producers emit int64, others
    uint64 (ADVICE r3) - reading the wrong member silently returns 0."""
    return s.int64_value or s.uint64_value


def parse_xplane(path: str):
    """xplane.pb -> (list of per-op-execution dicts from the TPU device
    plane's "XLA Ops" line, total "XLA Modules" span in ps)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    rows = []
    modules_ps = 0
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        stat_names = {k: m.name for k, m in plane.stat_metadata.items()}
        for line in plane.lines:
            if line.name == "XLA Modules":
                modules_ps += sum(e.duration_ps for e in line.events)
                continue
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                m = plane.event_metadata[e.metadata_id]
                row = {
                    "name": m.display_name or m.name.split(" = ")[0],
                    "dur_ps": 0,
                    "category": "",
                    "flops": 0,
                    "bytes": 0,
                    "tf_op": "",
                    "source": "",
                    "shape": "",
                }
                for s in e.stats:
                    if stat_names.get(s.metadata_id) == "device_duration_ps":
                        row["dur_ps"] = _int_stat(s)
                for s in m.stats:
                    n = stat_names.get(s.metadata_id)
                    if n == "hlo_category":
                        row["category"] = s.str_value
                    elif n == "flops":
                        row["flops"] = _int_stat(s)
                    elif n == "bytes_accessed":
                        row["bytes"] = _int_stat(s)
                    elif n == "tf_op":
                        row["tf_op"] = s.str_value
                    elif n == "source":
                        row["source"] = s.str_value
                    elif n == "shape_with_layout":
                        # strip the tiling/layout annotation: bf16[512,16,..]
                        row["shape"] = s.str_value.split("{")[0]
                if not row["dur_ps"]:
                    # fall back to the event's own duration (ps timebase)
                    row["dur_ps"] = e.duration_ps
                rows.append(row)
    return rows, modules_ps


_CONTAINERS = ("while", "conditional", "call")  # time covers nested body ops


def report(rows, top: int = 25, modules_ps: int = 0) -> None:
    leaf = [r for r in rows if r["category"] not in _CONTAINERS]
    total_ps = sum(r["dur_ps"] for r in leaf)
    if not total_ps:
        print("no device op events (host-only trace?)", file=sys.stderr)
        return
    if modules_ps:
        # Container exclusion relies on hlo_category naming (ADVICE r3); if
        # a producer labels control-flow wrappers differently, body op time
        # double-counts. The XLA-Modules span is the ground-truth program
        # total - warn when the leaf sum diverges from it.
        ratio = total_ps / modules_ps
        if not 0.75 <= ratio <= 1.05:
            print(
                f"WARNING: leaf-op sum {total_ps / 1e9:.1f} ms vs XLA-Modules "
                f"span {modules_ps / 1e9:.1f} ms ({ratio:.2f}x) - container "
                "exclusion may be double-counting (or ops idle-gapped); "
                "trust the Modules span for program totals",
                file=sys.stderr,
            )
    agg = collections.defaultdict(
        lambda: {"dur_ps": 0, "n": 0, "flops": 0, "bytes": 0, "row": None}
    )
    for r in leaf:
        a = agg[(r["name"], r["tf_op"])]
        a["dur_ps"] += r["dur_ps"]
        a["flops"] += r["flops"]
        a["bytes"] += r["bytes"]
        a["n"] += 1
        a["row"] = r
    print(
        f"\ndevice busy total: {total_ps / 1e9:.3f} ms over {len(leaf)} leaf op "
        f"executions (container ops excluded: "
        f"{sum(r['dur_ps'] for r in rows if r['category'] in _CONTAINERS) / 1e9:.1f} ms)"
    )
    print(f"{'op':26s} {'out shape':24s} {'n':>4s} {'ms/exec':>8s} {'total ms':>9s} "
          f"{'%':>5s} {'TF/s':>6s} {'GB/s':>6s}  jax op @ source")
    ranked = sorted(agg.values(), key=lambda a: -a["dur_ps"])
    for a in ranked[:top]:
        r = a["row"]
        dur_s = a["dur_ps"] / 1e12
        tfs = a["flops"] / dur_s / 1e12 if dur_s else 0.0
        gbs = a["bytes"] / dur_s / 1e9 if dur_s else 0.0
        src = r["source"].split("/")[-1]
        tf_op = r["tf_op"].rstrip(":").split("/")[-1][:36]
        print(
            f"{r['name'][:26]:26s} {r['shape'][:24]:24s} {a['n']:>4d} "
            f"{a['dur_ps'] / 1e9 / max(a['n'], 1):>8.3f} {a['dur_ps'] / 1e9:>9.3f} "
            f"{100 * a['dur_ps'] / total_ps:>4.1f}% "
            f"{tfs:>6.1f} {gbs:>6.0f}  {tf_op} @ {src}"
        )
    print("\nby category:")
    cats = collections.Counter()
    for r in leaf:
        cats[r["category"] or "?"] += r["dur_ps"]
    for cat, ps in cats.most_common():
        print(f"  {cat:28s} {ps / 1e9:>9.3f} ms {100 * ps / total_ps:>5.1f}%")
    mxu_ps = sum(ps for c, ps in cats.items() if "convolution" in c)
    print(
        f"\nMXU(conv) share {100 * mxu_ps / total_ps:.1f}%; peaks for "
        f"reference: v5e bf16 {V5E_PEAK_BF16_TFLOPS:.0f} TF/s, HBM "
        f"{V5E_PEAK_HBM_GBS:.0f} GB/s"
    )


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench  # sets the persistent TPU compile-cache dir on import

    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

    target = os.environ.get("PROF_TARGET", "fwd")
    model = YOGO.create(
        bench.IMG_HW,
        df.ANCHOR_W,
        df.ANCHOR_H,
        num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.key(0))

    if target == "train":
        bs = int(os.environ.get("PROF_BS", "64"))
        # warm (compile) once outside the trace, then trace 2 steps
        bench.measure_train(model, bs, n_steps=1)
        path = _trace(lambda: bench.measure_train(model, bs, n_steps=2))
        label = f"train step bs={bs} (fwd+bwd+adamw+flips)"
    else:
        bs = int(os.environ.get("PROF_BS", "512"))
        with_count = target == "e2e"
        if with_count:
            variables = bench.production_density_variables(variables)
        # measure() compiles+warms then times 3 scans; tracing it captures
        # 4 executions of the 16-batch scan
        path = _trace(
            lambda: bench.measure(model, variables, bs, with_count=with_count)
        )
        label = f"{target} scan bs={bs} x{bench.NUM_BATCHES} batches"

    print(f"=== {label}; xplane: {path}")
    rows, modules_ps = parse_xplane(path)
    if modules_ps:
        print(f"XLA Modules span (program total): {modules_ps / 1e9:.3f} ms")
    report(rows, top=int(os.environ.get("PROF_TOP", "25")), modules_ps=modules_ps)


if __name__ == "__main__":
    main()
