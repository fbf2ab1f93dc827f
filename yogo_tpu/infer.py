"""Inference driver: `yogo infer` and the python predict() API.

Re-design of the reference inference loop (reference: yogo/infer.py:140-422)
for TPU throughput:

  - fixed-shape batches: the last ragged batch is padded (one compiled
    program, no recompiles),
  - the postprocess chain (objectness filter -> NMS -> count) runs *fused on
    device* via yogo_tpu.ops.postprocess instead of the reference's per-image
    host loops; only final counts / padded detections come back,
  - host threads overlap image decode with device compute (double-buffered
    prefetch: the next batch decodes while the current one runs).

Output artifacts keep the reference schemas: YOLO-format txt prediction
files, the scope (8+C, N) .npy array + JSON metadata sidecar, drawn images,
and per-class counts.
"""

from __future__ import annotations

import datetime
import json
import warnings
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Literal, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.data.image_source import get_dataset
from yogo_tpu.data.loader import choose_dataloader_num_workers
from yogo_tpu.ops.postprocess import (
    INFER_COUNT_MAX_DETECTIONS,
    count_class_predictions,
    count_class_predictions_raw,
    format_preds,
    format_to_numpy,
)
from yogo_tpu.utils.checkpoint import load_any


def save_predictions(fnames, batch_preds, obj_thresh=0.5, iou_thresh=0.5):
    """Write YOLO-format txt per image: 'class cx cy w h' rows
    (reference: yogo/infer.py:39-57)."""
    for fname, pred in zip(fnames, batch_preds):
        rows = format_preds(
            np.asarray(pred), obj_thresh=obj_thresh, iou_thresh=iou_thresh
        )
        lines = [
            f"{int(np.argmax(r[5:]))} {r[0]} {r[1]} {r[2]} {r[3]}" for r in rows
        ]
        Path(fname).write_text("\n".join(lines))


def get_prediction_class_counts(
    batch_preds: np.ndarray,
    obj_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    min_class_confidence_threshold: float = 0.0,
) -> np.ndarray:
    """Host-path per-class counting over a batch (reference:
    yogo/infer.py:60-87); the device path is
    ops.postprocess.count_class_predictions."""
    from yogo_tpu.ops.postprocess import count_cells_for_formatted_preds

    num_classes = batch_preds.shape[1] - 5
    total = np.zeros(num_classes, np.int64)
    for pred in batch_preds:
        rows = format_preds(
            pred,
            obj_thresh=obj_thresh,
            iou_thresh=iou_thresh,
            min_class_confidence_threshold=min_class_confidence_threshold,
        )
        if len(rows):
            total += count_cells_for_formatted_preds(rows[:, 5:])
    return total


def write_metadata(metadata_path: Path, **kwargs) -> None:
    with open(Path(metadata_path).with_suffix(".json"), "w") as f:
        json.dump(kwargs, f, indent=4)


def predict(
    path_to_ckpt: Union[str, Path],
    *,
    path_to_images: Optional[Path] = None,
    path_to_zarr: Optional[Path] = None,
    output_dir: Optional[str] = None,
    draw_boxes: bool = False,
    save_preds: bool = False,
    save_npy: bool = False,
    class_names: Optional[List[str]] = None,
    count_predictions: bool = False,
    batch_size: int = 64,
    obj_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    vertical_crop_height: Optional[float] = None,
    use_tqdm: bool = False,
    output_img_ftype: Literal[".png", ".tif", ".tiff"] = ".png",
    requested_num_workers: Optional[int] = None,
    min_class_confidence_threshold: float = 0.0,
    half: bool = False,
    quantize: bool = False,
    return_full_predictions: bool = False,
    max_detections: int = INFER_COUNT_MAX_DETECTIONS,
    data_parallel: bool = False,
    spatial_parallel: int = 1,
    fetch_top_k: int = 512,
) -> Optional[np.ndarray]:
    """See `yogo infer --help`. Mirrors the reference predict() surface
    (reference: yogo/infer.py:140-192). `max_detections` (an extension -
    the reference's host NMS has no capacity) bounds the fused on-device
    count path's top-K; the default covers ~1.5x the realistic max object
    density (capacity note: docs/perf-notes.md round 3). `quantize` (an
    extension - no reference analogue) runs the backbone's wide matmuls in
    int8 on the MXU after calibrating activation scales on the first
    batch of this run's own images (conv stacks: ops/quant.py, ~1.25x
    forward throughput on v5e at detection parity with the float path;
    convnext: ops/quant_convnext.py quantizes the pointwise/downsample
    matmuls).
    `data_parallel` (an extension - the reference infers on a single GPU,
    reference: yogo/infer.py:214-216) shards each batch over ALL devices
    of this process via a 1-D jax Mesh (parallel/mesh.py), e.g. the 8
    chips of a v5e-8 host, with XLA inserting any collectives; batch_size
    is rounded up to a multiple of the data-shard count (device count /
    spatial_parallel; ragged tails are already padded + masked).
    Multi-host (jax.distributed initialized, process_count > 1): each
    process decodes its contiguous chunk of the sorted image list,
    batch_size becomes the PER-PROCESS batch, the fused count reduces
    globally across hosts (process 0 prints), and per-image artifacts are
    written by the owning process (.npy gets a .p{rank} suffix;
    return_full_predictions raises - tested end-to-end by
    tests/test_multihost.py over real processes).
    `spatial_parallel` (an extension - no reference analogue) splits each
    image's ROWS over N devices on a 2-D (data, space) mesh: XLA's SPMD
    partitioner inserts conv halo exchanges over ICI (GSPMD spatial
    partitioning, the canonical TPU treatment of images too large for one
    chip's HBM). Alone it uses EXACTLY N devices with no batch sharding
    or rounding; combined with data_parallel it spans all local devices
    (8 with spatial_parallel=4 serve each batch as 2 data shards x 4 row
    shards). N must divide the image height (772 allows 2 or 4).
    `fetch_top_k` (an extension, same knob as `yogo serve --fetch-top-k`):
    the host-formatting artifact paths (--save-npy/--save-preds/
    --draw-boxes and the host count that rides with them) fetch only the
    top-K cells by objectness per image instead of the full
    (5+C, Sy, Sx) tensor (~25x less D2H at K=512, 772x1032) - results
    stay EXACT: an image whose K-th candidate objectness exceeds the
    lowest consumer threshold falls back to fetching its full slice
    (ops/postprocess.py select_top_candidates). 0 disables (always fetch
    full tensors); return_full_predictions and multi-host runs always
    fetch full tensors."""
    if save_preds and draw_boxes:
        raise ValueError(
            "cannot save predictions in YOGO format and draw_boxes at the "
            "same time"
        )
    elif output_dir is not None and not (save_preds or draw_boxes or save_npy):
        warnings.warn(
            f"output dir is not None (is {output_dir}), but it will not be "
            "used since save_preds and draw_boxes are both false"
        )
    elif output_dir is not None:
        Path(output_dir).mkdir(exist_ok=True, parents=False)
    elif save_preds:
        raise ValueError("output_dir must not be None if save_preds is True")
    if output_img_ftype not in (".png", ".tif", ".tiff"):
        raise ValueError(
            "only .png, .tif, and .tiff are supported for output img "
            f"filetype; got {output_img_ftype}"
        )

    model, variables, cfg = load_any(path_to_ckpt)
    if half:
        model = model.with_compute_dtype(jnp.bfloat16)

    img_h, img_w = model.img_size
    crop_hw = None
    if vertical_crop_height:
        crop_px = int(round(vertical_crop_height * img_h))
        crop_hw = (crop_px, int(img_w))
        model = model.resize(crop_px)
        img_h = crop_px

    num_classes = model.num_classes
    if class_names is not None and len(class_names) != num_classes:
        raise ValueError(
            f"expected {num_classes} class names, got {len(class_names)}"
        )
    if class_names is None and isinstance(cfg, dict):
        class_names = cfg.get("class_names") or cfg.get("classes")
        if class_names is not None and len(class_names) != num_classes:
            # stale checkpoint metadata: zipping short names with per-class
            # counts would silently drop classes from --count output
            warnings.warn(
                f"checkpoint lists {len(class_names)} class names but the "
                f"model has {num_classes} classes; falling back to indices"
            )
            class_names = None

    dataset = get_dataset(
        path_to_images=path_to_images,
        path_to_zarr=path_to_zarr,
        crop_hw=crop_hw,
        normalize_images=bool(model.normalize_images),
        rgb=bool(model.is_rgb),  # RGB checkpoints need 3-channel batches
    )
    n_images = len(dataset)
    num_workers = choose_dataloader_num_workers(
        n_images, requested_num_workers=requested_num_workers
    )

    mesh = None
    nproc = jax.process_count()
    pid = jax.process_index()
    if (data_parallel or spatial_parallel > 1) and nproc > 1:
        # multi-host: each process decodes and postprocesses ITS contiguous
        # chunk of the (sorted) image list; batches are globalized over a
        # mesh spanning every process's devices (shard_batch ->
        # make_array_from_process_local_data) and the fused count's global
        # reduction crosses hosts via XLA collectives. Per-image artifacts
        # (txt/drawn images) are written by the owning process; counts are
        # globally identical on every process and printed by process 0.
        if not data_parallel:
            raise ValueError(
                "spatial_parallel-only inference is single-process; add "
                "data_parallel to shard images across processes too"
            )
        if return_full_predictions:
            raise ValueError(
                "return_full_predictions is single-process only (each "
                "process holds only its own images' predictions); use "
                "save_npy and merge the per-process .npy files"
            )
    if data_parallel or spatial_parallel > 1:
        from yogo_tpu.parallel.mesh import (
            data_sharded,
            fetch_local_rows,
            get_mesh,
            get_mesh_2d,
            n_data,
            replicate_to_mesh,
            shard_batch,
            space_sharded,
            validate_spatial_height,
        )

        if spatial_parallel > 1 and nproc > 1:
            local_dev = len(jax.local_devices())
            if local_dev % spatial_parallel:
                # get_mesh_2d reshapes the process-major global device list
                # into (data, space) rows; a row must not straddle hosts or
                # every conv halo exchange would ride DCN instead of ICI
                raise ValueError(
                    f"spatial_parallel={spatial_parallel} must divide the "
                    f"per-process device count {local_dev} under multi-host"
                )
        candidate = (
            # spatial-only: exactly N devices, pure row sharding - no
            # implicit batch sharding/rounding the user didn't ask for;
            # WITH --data-parallel: all local devices, (n_dev/N) x N
            get_mesh_2d(
                spatial_parallel,
                None if data_parallel else jax.devices()[:spatial_parallel],
            )
            if spatial_parallel > 1
            else get_mesh()
        )
        n_dev = candidate.devices.size
        if n_dev > 1:
            mesh = candidate
            if spatial_parallel > 1:
                validate_spatial_height(mesh, img_h)
            # batch_size is the PER-PROCESS batch; it must divide over this
            # process's data-axis shards (ragged tails are padded +
            # image-masked anyway, so rounding the compiled batch shape up
            # only adds masked padding work)
            nd_local = max(n_data(mesh) // nproc, 1)
            if batch_size % nd_local:
                batch_size = ((batch_size + nd_local - 1) // nd_local) * nd_local
            # float variables replicate later, and only on the float path:
            # the quantized program consumes qp alone, and building qp from
            # already-replicated variables would fetch every kernel straight
            # back off-device (np.asarray in the fold) while the replicated
            # tree sat as dead HBM weight for the whole run

    # multi-host image ownership: process p takes the p-th contiguous chunk
    # of the sorted image list (counts/artifacts stay deterministic)
    mh = mesh is not None and nproc > 1
    if mh:
        per_proc = -(-n_images // nproc)
        # clamp keeps chunk_lo <= chunk_hi when nproc > n_images (an
        # empty chunk still dispatches n_rounds fully-masked batches)
        chunk_lo = min(n_images, pid * per_proc)
        chunk_hi = min(n_images, chunk_lo + per_proc)
    else:
        per_proc = n_images
        chunk_lo, chunk_hi = 0, n_images

    # jitted forward (full batch shape only; last batch is padded)
    if quantize:
        from yogo_tpu.ops.quant import family_quant_plan

        build_qp, fwd_quant, n_scales, all_skip = family_quant_plan(
            model, variables
        )

        if n_images == 0:
            raise ValueError("--quantize needs at least one image to calibrate")
        if all_skip or (mh and pid != 0):
            # every block skipped (narrow arch): quantize_conv_stack never
            # consumes a calibration batch, so don't decode one (a full
            # batch of pure startup latency otherwise). Multi-host,
            # process 0 calibrates and broadcasts its scales.
            calib_batches = []
        else:
            # calibrate on the run's own leading images (decoded once more
            # by the normal loop afterwards - one batch of extra decode
            # work), with the same threaded decode the batch loop uses: a
            # serial 512-image decode is tens of seconds of startup latency
            idxs = range(chunk_lo, min(chunk_lo + batch_size, chunk_hi))
            if num_workers > 0:
                with ThreadPoolExecutor(max_workers=num_workers) as cp:
                    items = list(cp.map(dataset.__getitem__, idxs))
            else:
                items = [dataset[i] for i in idxs]
            calib_batches = [np.stack([im for im, _ in items])]
        if mh and not all_skip:
            # all processes must serve an IDENTICAL int8 program: process 0
            # calibrates on its leading images, the scales broadcast, and
            # every process assembles qp from the same (scales, weights)
            from jax.experimental import multihost_utils

            qp0 = build_qp(calib_batches) if pid == 0 else None
            local_scales = (
                np.asarray(qp0["scales"], np.float32)
                if qp0 is not None
                else np.zeros(n_scales, np.float32)
            )
            scales = np.asarray(
                multihost_utils.broadcast_one_to_all(local_scales)
            )
            # pid 0 already holds the identical qp - don't quantize every
            # weight tensor a second time just to rebuild it from scales
            qp = qp0 if qp0 is not None else build_qp([], act_scales=scales)
        else:
            qp = build_qp(calib_batches)

        if mesh is not None:
            qp = replicate_to_mesh(qp, mesh)

        def _fwd(imgs):
            return fwd_quant(model, qp, imgs)

    else:
        if mesh is not None:
            variables = replicate_to_mesh(variables, mesh)

        def _fwd(imgs):
            return model.apply(variables, imgs, inference=True)

    if mesh is not None:
        # batch axis sharded over the mesh's data axis (and, with
        # spatial_parallel, image rows over its space axis - XLA's SPMD
        # partitioner inserts the conv halo exchanges over ICI), params
        # replicated. The decoded (B, 5+C, Sy, Sx) output comes back
        # batch-sharded; Sy=97 is prime so spatial shards regroup there.
        forward_xla = jax.jit(
            _fwd,
            in_shardings=space_sharded(mesh, 4),
            out_shardings=data_sharded(mesh, 4),
        )
    else:
        forward_xla = jax.jit(_fwd)

    # Opt-in fused Pallas stem (YOGO_PALLAS_STEM): dispatched as its OWN
    # executable, then a second jit for blocks 1..n + decode. A Mosaic
    # kernel inlined into the full-model jit crashes the axon TPU worker
    # (docs/perf-notes.md), and back-to-back unfenced Mosaic dispatches do
    # too - hence the block_until_ready fence between stem and rest.
    probe = jax.ShapeDtypeStruct(
        (batch_size, model.input_channels, *model.img_size), jnp.uint8
    )
    stem_mode = model._stem_pallas_mode(probe, train=False, mutable=False)
    if stem_mode is not None and (mesh is not None or quantize):
        # the stem path runs the FLOAT variables - silently serving an
        # unquantized model under --quantize would be worse than refusing
        raise ValueError(
            "YOGO_PALLAS_STEM is a single-device float-only experimental "
            "path; unset it to use data_parallel or --quantize inference"
        )
    if stem_mode is not None:

        @jax.jit
        def stem_fn(imgs):
            return model.pallas_stem_forward(
                variables, imgs, interpret=stem_mode == "interpret"
            )

        @jax.jit
        def rest_fn(h):
            return model.forward_from_block1(variables, h, inference=True)

        def forward(imgs):
            if imgs.dtype != jnp.uint8:  # normalized float input: XLA path
                return forward_xla(imgs)
            h = jax.block_until_ready(stem_fn(imgs))
            return rest_fn(h)

    else:
        forward = forward_xla

    Sx, Sy = model.grid
    pred_dim = 5 + num_classes

    needs_full = (
        return_full_predictions or save_npy or save_preds or draw_boxes
    )


    # Candidate fetch for the host-formatting paths: every consumer below
    # filters at an objectness threshold, so per image the top-K candidate
    # set is provably complete whenever the K-th candidate's objectness is
    # <= the LOWEST consumer threshold (select_top_candidates docstring);
    # incomplete images fall back to fetching their full slice. Multi-host
    # keeps the plain per-process row fetch (its D2H is already split
    # across hosts, and a cross-process fallback slice would gather).
    n_cells = int(Sy) * int(Sx)
    _consumer_threshes = []
    if draw_boxes or save_preds:
        _consumer_threshes.append(obj_thresh)
    if count_predictions:
        _consumer_threshes.append(obj_thresh)
    if save_npy:
        # format_to_numpy filters at format_preds' DEFAULT thresholds
        # (reference: yogo/utils/prediction_formatting.py:130-134), not
        # this run's --obj-thresh
        _consumer_threshes.append(0.5)
    use_candidates = (
        needs_full
        and not return_full_predictions
        and not mh
        and 0 < fetch_top_k < n_cells
    )
    # The selection-first raw-head programs (round 4): count-only runs
    # and the candidate-fetch artifact paths run the forward WITHOUT the
    # full-grid decode - selection happens on the objectness plane of the
    # NHWC head output and only the K survivors (or, for counts, the NMS
    # winners) are decoded. Identical results (pinned in
    # tests/test_postprocess.py; ~6 ms/batch-512 saved at 772x1032, per-op
    # device profile in docs/perf-notes.md round 4). The experimental
    # Pallas-stem path keeps the decoded route.
    use_raw_candidates = use_candidates and stem_mode is None
    forward_raw = None
    if stem_mode is None and (
        (count_predictions and not needs_full) or use_raw_candidates
    ):
        if quantize:

            def _fwd_raw(imgs):
                return fwd_quant(model, qp, imgs, decode=False)

        else:

            def _fwd_raw(imgs):
                return model.apply(variables, imgs, decode=False)

        if mesh is not None:
            forward_raw = jax.jit(
                _fwd_raw,
                in_shardings=space_sharded(mesh, 4),
                out_shardings=data_sharded(mesh, 4),
            )
        else:
            forward_raw = jax.jit(_fwd_raw)

    if use_candidates:
        from yogo_tpu.ops.postprocess import (
            decode_raw_slice,
            scatter_candidates,
            select_top_candidates,
            select_top_candidates_raw,
        )

        thresh_floor = min(_consumer_threshes)
        if use_raw_candidates:
            select_fn = jax.jit(
                lambda raw: select_top_candidates_raw(
                    raw, fetch_top_k, model.anchor_w, model.anchor_h,
                    width_multiplier=model.width_multiplier,
                    height_multiplier=model.height_multiplier,
                )
            )

            # fallback: slice + decode the one image on device (the full
            # handle is raw); slot is traced - a Python-int slot would
            # compile one executable per slot value (same trick as serve)
            def slice_fn(full, i):
                return decode_raw_slice(
                    full, jnp.asarray(i, jnp.int32), model.anchor_w,
                    model.anchor_h,
                    width_multiplier=model.width_multiplier,
                    height_multiplier=model.height_multiplier,
                )

        else:
            select_fn = jax.jit(
                lambda out: select_top_candidates(out, fetch_top_k)
            )
            slice_fn = jax.jit(
                lambda full, i: jax.lax.dynamic_index_in_dim(
                    full, i, axis=0, keepdims=False
                )
            )
        n_full_fallbacks = 0

    results = (
        np.zeros((n_images, pred_dim, Sy, Sx), np.float32)
        if return_full_predictions
        else None
    )
    np_results: List[np.ndarray] = []
    tot_counts = np.zeros(num_classes, np.int64)

    # one persistent decode pool for the whole run (a fresh pool per batch
    # would spawn+join up to num_workers OS threads on every hot-path load)
    decode_pool = (
        ThreadPoolExecutor(max_workers=num_workers) if num_workers > 0 else None
    )

    def zero_batch():
        # fully-masked padding batch: shape/dtype must match real batches so
        # the compiled program is reused; every row is masked out via real=0
        ch = 3 if model.is_rgb else 1
        dtype = np.float32 if model.normalize_images else np.uint8
        return np.zeros((batch_size, ch, img_h, int(img_w)), dtype), [], 0

    def load_batch(start: int):
        idxs = range(start, min(start + batch_size, chunk_hi))
        if len(idxs) == 0:
            # aligned-rounds padding batch (multi-host, a shorter chunk)
            return zero_batch()
        if decode_pool is not None:
            items = list(decode_pool.map(dataset.__getitem__, idxs))
        else:
            items = [dataset[i] for i in idxs]
        imgs = np.stack([im for im, _ in items])
        names = [name for _, name in items]
        real = len(items)
        if real < batch_size:  # pad to the compiled batch shape
            pad = np.repeat(imgs[:1], batch_size - real, axis=0)
            imgs = np.concatenate([imgs, pad])
        return imgs, names, real

    pbar = None
    if use_tqdm:
        try:
            from tqdm import tqdm

            pbar = tqdm(unit="images", total=chunk_hi - chunk_lo)
        except ImportError:
            pass

    if mh:
        # every process dispatches the SAME number of rounds: the fused
        # count program reduces over the GLOBAL batch (a cross-host
        # collective), so a process that stopped early would deadlock it -
        # short chunks run trailing fully-masked zero batches
        n_rounds = -(-per_proc // batch_size) if n_images else 0
        starts = [chunk_lo + k * batch_size for k in range(n_rounds)]
    else:
        starts = list(range(0, n_images, batch_size))
    # double-buffered prefetch: decode batch i+1 while batch i computes
    prefetcher = ThreadPoolExecutor(max_workers=1)
    # pools must not leak worker threads if the forward or a
    # postprocess step raises mid-run (long-lived caller processes)
    try:
        pending = prefetcher.submit(load_batch, starts[0]) if starts else None

        for bi, start in enumerate(starts):
            # tolerate malformed images: warn and skip the batch, like the
            # reference's inference loop (reference: yogo/infer.py:299-309)
            try:
                imgs, names, real = pending.result()
            except Exception as e:
                warnings.warn(f"got error {e}; continuing")
                if not mh:
                    pending = (
                        prefetcher.submit(load_batch, starts[bi + 1])
                        if bi + 1 < len(starts)
                        else None
                    )
                    continue
                # multi-host: the other processes enter this round's
                # collective regardless, so a skipped round here would
                # desynchronize the dispatch counts and deadlock them -
                # substitute a fully-masked zero batch instead
                imgs, names, real = zero_batch()
            pending = (
                prefetcher.submit(load_batch, starts[bi + 1])
                if bi + 1 < len(starts)
                else None
            )

            imgs_j = (
                shard_batch(mesh, imgs, spatial_first=spatial_parallel > 1)[0]
                if mesh is not None
                else jnp.asarray(imgs)
            )
            if count_predictions and not needs_full:
                # fully fused on device: forward + NMS + count, no big transfers;
                # padded tail images are excluded by mask (a [:real] slice would
                # change the shape and recompile per distinct tail size).
                # Multi-host the mask must be a GLOBAL array like the batch
                # (each process masks its own padding rows), and the counts
                # that come back are already the GLOBAL per-round totals.
                count_mask = (
                    shard_batch(mesh, np.arange(batch_size) < real)[0]
                    if mh
                    else jnp.arange(batch_size) < real
                )
                if forward_raw is not None:
                    counts = count_class_predictions_raw(
                        forward_raw(imgs_j),
                        model.anchor_w,
                        model.anchor_h,
                        width_multiplier=model.width_multiplier,
                        height_multiplier=model.height_multiplier,
                        obj_thresh=obj_thresh,
                        iou_thresh=iou_thresh,
                        min_class_confidence_threshold=min_class_confidence_threshold,
                        max_detections=max_detections,
                        image_mask=count_mask,
                    )
                else:
                    counts = count_class_predictions(
                        forward(imgs_j),
                        obj_thresh=obj_thresh,
                        iou_thresh=iou_thresh,
                        min_class_confidence_threshold=min_class_confidence_threshold,
                        max_detections=max_detections,
                        image_mask=count_mask,
                    )
                tot_counts += np.asarray(counts, np.int64)
                if pbar:
                    pbar.update(real)
                continue

            out = (
                forward_raw(imgs_j)
                if use_raw_candidates
                else forward(imgs_j)
            )
            if use_candidates:
                # fetch only the top-K candidate rows + cell indices (the
                # full tensor stays an unfetched device handle - raw on
                # the selection-first path - sliced [+ decoded] per image
                # iff its candidate set can't prove completeness)
                rows, idx = select_fn(out)
                rows_np = np.asarray(rows, np.float32)
                idx_np = np.asarray(idx)
                res = np.empty((real, pred_dim, Sy, Sx), np.float32)
                for j in range(real):
                    if float(rows_np[j, -1, 4]) > thresh_floor:
                        n_full_fallbacks += 1
                        res[j] = np.asarray(slice_fn(out, j), np.float32)
                    else:
                        res[j] = scatter_candidates(
                            rows_np[j], idx_np[j], pred_dim, Sy, Sx
                        )
            else:
                # multi-host: the output stays batch-sharded; fetch only
                # this process's rows (the images it decoded)
                res = (fetch_local_rows(out) if mh else np.asarray(out))[
                    :real
                ]

            if draw_boxes:
                from yogo_tpu.utils.drawing import draw_yogo_prediction

                for j in range(real):
                    bbox_img = draw_yogo_prediction(
                        img=imgs[j],
                        prediction=res[j],
                        obj_thresh=obj_thresh,
                        iou_thresh=iou_thresh,
                        min_class_confidence_threshold=min_class_confidence_threshold,
                        labels=class_names,
                        images_are_normalized=bool(model.normalize_images),
                    )
                    if output_dir is not None:
                        out_path = (
                            Path(output_dir)
                            / Path(names[j]).with_suffix(output_img_ftype).name
                        )
                        bbox_img.save(out_path)
                    else:
                        bbox_img.show()
            if save_preds:
                out_fnames = [
                    Path(output_dir) / Path(n).with_suffix(".txt").name
                    for n in names
                ]
                save_predictions(
                    out_fnames, res, obj_thresh=obj_thresh, iou_thresh=iou_thresh
                )
            if save_npy:
                for j in range(real):
                    np_results.append(
                        format_to_numpy(
                            start + j, res[j], int(img_h), int(img_w)
                        )
                    )
            if count_predictions:
                tot_counts += get_prediction_class_counts(
                    res,
                    obj_thresh=obj_thresh,
                    iou_thresh=iou_thresh,
                    min_class_confidence_threshold=min_class_confidence_threshold,
                )
            if return_full_predictions:
                results[start : start + real] = res
            if pbar:
                pbar.update(real)

    finally:
        prefetcher.shutdown(wait=False)
        if decode_pool is not None:
            decode_pool.shutdown(wait=False)
        if pbar:
            pbar.close()

    if use_candidates and n_images and n_full_fallbacks > 0.1 * n_images:
        # serve exposes the same counter as /metrics full_fetch_fallbacks;
        # results are still exact - fallbacks only cost the full-tensor D2H
        # the candidate fetch exists to avoid
        warnings.warn(
            f"{n_full_fallbacks}/{n_images} images exceeded the "
            f"--fetch-top-k {fetch_top_k} candidate capacity and fell back "
            "to full-tensor fetches (exact but slow); raise --fetch-top-k "
            "to cover your detection density"
        )

    if count_predictions:
        if mh and needs_full:
            # host-path counting accumulated only this process's images;
            # reduce across processes (the fused path's totals are already
            # global - its in-program reduction crossed hosts)
            from jax.experimental import multihost_utils

            tot_counts = np.sum(
                np.asarray(multihost_utils.process_allgather(tot_counts)),
                axis=0,
            ).astype(np.int64)
        if pid == 0:
            print(
                list(zip(class_names or range(num_classes), map(int, tot_counts)))
            )

    if save_npy and np_results:
        pred_tensors = np.hstack(np_results)
        if path_to_images:
            filename = Path(path_to_images).resolve().parent.stem
        elif path_to_zarr:
            filename = Path(path_to_zarr).resolve().stem
        if mh:
            # one .npy per process (its own images; img_id stays the global
            # index) - concatenating them reproduces the single-process file
            filename = f"{filename}.p{pid}"
        base = Path(output_dir).resolve() if output_dir else Path.cwd().resolve()
        # append rather than with_suffix: the multi-host rank tag makes the
        # name 'scope.p1', whose '.p1' with_suffix would REPLACE - every
        # rank would then write the same 'scope.npy'
        fp = base / f"{filename}.npy"
        np.save(fp, pred_tensors)
        write_metadata(
            fp.with_suffix(".json"),
            run_name=fp.with_suffix("").name,
            model_name=(cfg.get("model_name") if isinstance(cfg, dict) else None),
            obj_thresh=obj_thresh,
            iou_thresh=iou_thresh,
            vertical_crop_height_px=int(img_h),
            write_date=datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
        )

    if return_full_predictions:
        return results
    return None


def do_infer(args) -> None:
    predict(
        args.ckpt_path,
        path_to_images=args.path_to_images,
        path_to_zarr=args.path_to_zarr,
        output_dir=args.output_dir,
        draw_boxes=args.draw_boxes,
        save_preds=args.save_preds,
        save_npy=args.save_npy,
        class_names=args.class_names,
        obj_thresh=args.obj_thresh,
        iou_thresh=args.iou_thresh,
        batch_size=args.batch_size,
        use_tqdm=args.use_tqdm,
        vertical_crop_height=args.crop_height,
        count_predictions=args.count,
        output_img_ftype=args.output_img_filetype,
        min_class_confidence_threshold=args.min_class_confidence_threshold,
        half=args.half,
        quantize=args.quantize,
        max_detections=args.max_detections,
        data_parallel=args.data_parallel,
        spatial_parallel=args.spatial_parallel,
        fetch_top_k=args.fetch_top_k,
    )
