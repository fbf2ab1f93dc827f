"""Host decode throughput: native C++ pipeline vs PIL, single CPU core.

Generates N noisy PNGs at the canonical camera size, then times
  - PIL: Image.open().convert("L") + antialiased resize per image
  - native decode_image: libpng decode + triangle resize per image
  - native decode_batch: the C++ thread pool filling one batch buffer

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_decode.py [n] [threads]
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image

from yogo_tpu import native

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
THREADS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SRC_HW = (772, 1032)
OUT_HW = (772, 1032)


def main() -> None:
    assert native.available(), "native library unavailable"
    root = Path(tempfile.mkdtemp(prefix="decode_bench_"))
    rng = np.random.default_rng(0)
    paths = []
    for i in range(N):
        img = rng.integers(0, 256, SRC_HW, np.uint8)
        p = root / f"{i}.png"
        Image.fromarray(img).save(p)
        paths.append(p)

    t0 = time.perf_counter()
    for p in paths:
        im = Image.open(p).convert("L")
        if im.size != (OUT_HW[1], OUT_HW[0]):
            im = im.resize((OUT_HW[1], OUT_HW[0]), Image.Resampling.BILINEAR)
        np.asarray(im)
    t_pil = time.perf_counter() - t0

    t0 = time.perf_counter()
    for p in paths:
        assert native.decode_image(p, OUT_HW) is not None
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    batch, ok = native.decode_batch(paths, OUT_HW, n_threads=THREADS)
    t_batch = time.perf_counter() - t0
    assert ok.all()

    print(f"{N} PNGs at {SRC_HW}:")
    print(f"  PIL per-image          {N / t_pil:7.1f} img/s")
    print(f"  native per-image       {N / t_native:7.1f} img/s"
          f"  ({t_pil / t_native:.2f}x PIL)")
    print(f"  native batch ({THREADS} thr)   {N / t_batch:7.1f} img/s"
          f"  ({t_pil / t_batch:.2f}x PIL)")


if __name__ == "__main__":
    main()
