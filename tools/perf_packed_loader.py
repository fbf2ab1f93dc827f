"""Measure the disk->host training input pipeline at full resolution.

Round-4's finding: per-epoch PNG decode delivers ~20-50 img/s on this
1-core host against a chip that trains at ~1,340 img/s (VERDICT r4 gap
#1). The packed cache (data/packed_cache.py) pays decode once; this tool
measures what the loader then sustains from disk:

  - live:   DataLoader over ObjectDetectionDataset (PNG decode per item,
            what the reference's worker pool parallelizes)
  - build:  one-time packed-cache build rate
  - packed: DataLoader over PackedDataset (memmap read + grid encode)

Pure host measurement (no TPU, no relay). Fixture: PNGs at 772x1032 with
production-ish label density, generated once into PERF_PACK_DIR
(default /tmp/perf_packed, reused if present).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_packed_loader.py
Env: PERF_PACK_N (default 128), PERF_PACK_BS (64), PERF_PACK_EPOCHS (3).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("PERF_PACK_N", "128"))
BS = int(os.environ.get("PERF_PACK_BS", "64"))
EPOCHS = int(os.environ.get("PERF_PACK_EPOCHS", "3"))
H, W = 772, 1032
ROOT = Path(os.environ.get("PERF_PACK_DIR", "/tmp/perf_packed"))


def gen_fixture() -> None:
    from PIL import Image

    img_dir, lbl_dir = ROOT / "images", ROOT / "labels"
    if (
        img_dir.exists()
        and len(list(img_dir.glob("*.png"))) >= N
        and len(list(lbl_dir.glob("*.txt"))) >= N
    ):
        return
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    r = np.random.default_rng(0)
    for i in range(N):
        arr = np.full((H, W), 225, np.uint8)
        rows = []
        for _ in range(int(r.integers(20, 61))):
            bh, bw = (36, 36) if r.integers(2) == 0 else (24, 48)
            y = int(r.integers(2, H - 2 - bh))
            x = int(r.integers(2, W - 2 - bw))
            arr[y : y + bh, x : x + bw] = 60
            rows.append(
                f"0 {(x + bw / 2) / W:.5f} {(y + bh / 2) / H:.5f} "
                f"{bw / W:.5f} {bh / H:.5f}"
            )
        arr += r.integers(0, 12, arr.shape).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"i{i:04d}.png")
        (lbl_dir / f"i{i:04d}.txt").write_text("\n".join(rows))
        if (i + 1) % 32 == 0:
            print(f"fixture: {i + 1}/{N}", file=sys.stderr)


def time_loader(loader, epochs: int) -> float:
    n = 0
    t0 = time.perf_counter()
    for e in range(epochs):
        loader.set_epoch(e)
        for imgs, labels, mask in loader:
            n += int(mask.sum())
    dt = time.perf_counter() - t0
    return n / dt


def main() -> None:
    from yogo_tpu.data.dataset import ObjectDetectionDataset
    from yogo_tpu.data.loader import DataLoader
    from yogo_tpu.data.packed_cache import PackedDataset

    gen_fixture()
    sx, sy = 129, 97  # base_model grid at 772x1032

    src = ObjectDetectionDataset(
        ROOT / "images", ROOT / "labels", sx, sy, classes=["c"],
        image_hw=(H, W),
    )

    # live PNG-decode rate over a small slice (it is slow)
    n_live = min(N, 32)
    t0 = time.perf_counter()
    for i in range(n_live):
        src[i]
    live_rate = n_live / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    packed = PackedDataset(src, Sx=sx, Sy=sy, cache_root=ROOT / "cache")
    build_s = time.perf_counter() - t0

    loader = DataLoader(packed, batch_size=BS, shuffle=True)
    warm = time_loader(loader, 1)  # first pass faults pages in
    packed_rate = time_loader(loader, EPOCHS)

    out = {
        "n_images": N,
        "batch_size": BS,
        "live_png_decode_img_s": round(live_rate, 1),
        "cache_build_s": round(build_s, 1),
        "packed_first_epoch_img_s": round(warm, 1),
        "packed_loader_img_s": round(packed_rate, 1),
        "speedup_vs_live": round(packed_rate / live_rate, 1),
        "chip_train_rate_img_s": 1340,
        "loader_headroom_vs_chip": round(packed_rate / 1340, 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
