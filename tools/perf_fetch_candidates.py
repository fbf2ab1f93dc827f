"""Measure full-tensor vs top-K candidate fetch for the artifact paths.

`yogo infer --save-npy/--save-preds/--draw-boxes` must bring predictions
to the host. The full decoded tensor is (B, 12, 97, 129) f32 = 38 MB at
bs=64 (772x1032 base_model); the top-K candidate fetch
(ops/postprocess.select_top_candidates, K=512) moves ~1.7 MB instead.
This times forward+fetch round trips for both paths on the real device.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_fetch_candidates.py
Env knobs: FB_BS (default 64), FB_ITERS (default 8), FB_K (default 512).
"""

import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu"),
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from yogo_tpu.models.yogo import YOGO  # noqa: E402
from yogo_tpu.ops.postprocess import select_top_candidates  # noqa: E402

BS = int(os.environ.get("FB_BS", "64"))
ITERS = int(os.environ.get("FB_ITERS", "8"))
K = int(os.environ.get("FB_K", "512"))

model = YOGO.create((772, 1032), 0.0425010, 0.0555177, 7).with_compute_dtype(
    jnp.bfloat16
)
variables = model.init(jax.random.key(0))

fwd = jax.jit(lambda v, x: model.apply(v, x, inference=True))
sel = jax.jit(lambda v, x: select_top_candidates(fwd(v, x), K))

imgs = jax.device_put(
    np.random.default_rng(0).integers(0, 255, (BS, 1, 772, 1032), np.uint8)
)

# warm both programs; FETCH (block_until_ready lies on axon)
_ = np.asarray(fwd(variables, imgs))
r, i = sel(variables, imgs)
_ = np.asarray(r), np.asarray(i)

t0 = time.perf_counter()
for _ in range(ITERS):
    full = np.asarray(fwd(variables, imgs))
t_full = (time.perf_counter() - t0) / ITERS

t0 = time.perf_counter()
for _ in range(ITERS):
    rows, idx = sel(variables, imgs)
    rows_np, idx_np = np.asarray(rows), np.asarray(idx)
t_cand = (time.perf_counter() - t0) / ITERS

mb_full = full.nbytes / 2**20
mb_cand = (rows_np.nbytes + idx_np.nbytes) / 2**20
print(
    f"bs={BS} K={K}: full fetch {t_full*1e3:.0f} ms/batch ({mb_full:.1f} MB)"
    f" = {BS/t_full:.0f} img/s; candidate fetch {t_cand*1e3:.0f} ms/batch"
    f" ({mb_cand:.2f} MB) = {BS/t_cand:.0f} img/s; speedup {t_full/t_cand:.1f}x"
)
