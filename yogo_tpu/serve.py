"""`yogo serve`: a production inference server (extension - the reference
ships only batch CLI inference, yogo/infer.py).

Design, TPU-first:

  - ONE jitted fixed-shape forward (bf16 or int8 via ops/quant.py) compiled
    at startup and kept warm: requests never pay compile time, and the
    fixed batch shape means XLA's program cache is never invalidated.
  - MICRO-BATCHING: concurrent requests are coalesced by a single batcher
    thread into one device dispatch (pad + mask, same fixed-shape contract
    as infer.py) - the standard way to reach device throughput when
    requests arrive one image at a time. `linger_ms` bounds added latency.
  - stdlib only (http.server + threading): no framework dependency to pin.

Protocol (JSON over HTTP):
  GET  /healthz           -> {"status": "ok", "model": ..., "classes": [...]}
  POST /predict           -> body = image bytes (PNG/JPEG/TIFF...; decoded
                             exactly like the batch pipeline, data/utils.py
                             read_image); optional query params obj_thresh,
                             iou_thresh, min_class_confidence_threshold.
                             Response: {"detections": [{"class_idx", "class",
                             "objectness", "class_confidence", "bbox_cxcywh",
                             "bbox_xyxy"}...], "counts": {name: n}}
  POST /predict with `Content-Type: application/octet-stream` -> body is a
      RAW uint8 frame, C-order (C, H, W) exactly matching the model input
      reported by /healthz's input_hw (grayscale: H*W bytes). This is the
      high-rate path for clients that already hold pixel buffers (a
      microscope camera streaming frames): no PNG encode client-side, no
      decode server-side (per-request cost measured in
      tools/serve_loadtest.py / docs/perf-notes.md). Responses are
      bit-identical to the encoded-image path for the same pixels.
  POST /predict (octet-stream) with N concatenated frames (body length =
      N x frame bytes, N <= /healthz's max_frames_per_request) -> BATCH
      request: one HTTP round trip, N frames enter the batcher atomically
      (all-or-nothing vs --max-queue shedding). Response is
      {"results": [per-frame {detections, counts}...]} in input order.
      Amortizes the per-request HTTP + queueing overhead for clients that
      buffer short bursts (response schema stays the single-frame one when
      N == 1).

Detections come from the host-exact formatter (ops/postprocess.format_preds,
reference semantics: yogo/utils/prediction_formatting.py:23-93), so a served
response matches `yogo infer --save-preds` on the same image bit-for-bit.
"""

from __future__ import annotations

import gzip
import io
import json
import math
import queue
import sys
import threading
import time
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FuturesTimeoutError
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.ops.postprocess import (  # noqa: F401  (scatter_candidates
    _cxcywh_to_xyxy_np,  # re-exported: it grew up here and tests/users
    decode_raw_slice,  # import it from yogo_tpu.serve)
    format_preds,
    scatter_candidates,
    select_top_candidates,  # kept importable (tests/users)
    select_top_candidates_raw,
)
from yogo_tpu.utils.checkpoint import load_any


# encoded-image uploads are buffered whole before decode; bound the
# allocation so a misconfigured client (or an attacker) can't make every
# handler thread hold an arbitrary-size body (a 772x1032 PNG is <1 MB;
# 32 MiB covers any real microscope frame with headroom)
_MAX_ENCODED_BODY = 32 * 1024 * 1024


class Overloaded(RuntimeError):
    """Raised by _Batcher.submit when the waiting queue is at --max-queue:
    the device is saturated and accepting the frame would only grow an
    unbounded backlog of ~H*W-byte buffers. HTTP maps it to 503 +
    Retry-After so well-behaved clients back off."""


class _Gauge:
    """Count of in-flight /predict requests, waitable at shutdown: request
    handler threads are daemons (a hung keep-alive client must not block
    exit forever), so a graceful stop instead waits - bounded - for the
    gauge to reach zero before closing, ensuring accepted requests get
    their responses written."""

    def __init__(self):
        self._n = 0
        self._cond = threading.Condition()

    def __enter__(self):
        with self._cond:
            self._n += 1
        return self

    def __exit__(self, *exc):
        with self._cond:
            self._n -= 1
            if self._n == 0:
                self._cond.notify_all()
        return False

    def wait_zero(self, timeout: float) -> bool:
        deadline = time.monotonic() + timeout
        with self._cond:
            while self._n > 0:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
                self._cond.wait(remaining)
            return True


class _Batcher:
    """Coalesce single-image requests into fixed-shape device dispatches,
    PIPELINED: dispatch and fetch run on separate threads.

    Handler threads submit() an image and block on a Future. The collector
    thread drains the queue every `linger_s` (or immediately once a full
    batch is waiting), pads to the compiled batch size, and DISPATCHES the
    jitted forward - jax dispatch is asynchronous, so the call returns
    un-fetched device handles immediately. A second thread fetches each
    dispatch's host results (the blocking D2H) and distributes per-image
    predictions. While the fetcher blocks on batch N, the collector is
    already assembling and uploading batch N+1 - host-side work and the
    H2D transfer ride under the device's compute + D2H of the previous
    batch (measured ~1.1x on the dev relay where H2D dominates; on PCIe
    the same overlap hides host assembly entirely). `pipeline_depth`
    bounds in-flight dispatches (backpressure: each holds one input batch
    + one full-prediction tensor in HBM). Padding rows are discarded -
    identical masking contract to infer.predict's ragged tail.
    """

    _SENTINEL = None  # enqueued by the collector on shutdown

    def __init__(self, fwd_dispatch, fwd_fetch, batch_size: int,
                 img_chw: Tuple[int, int, int], linger_s: float = 0.005,
                 pipeline_depth: int = 2, max_queue: int = 0):
        # fwd_dispatch: np batch -> un-fetched device handles (async);
        # fwd_fetch: handles -> (host candidate rows, host cell idx, device
        # full-prediction handle). Per-image futures resolve to
        # (rows[i], idx[i], full_handle, i) - see build_server's
        # _fwd_select / _pred_for pair.
        self._fwd_dispatch = fwd_dispatch
        self._fwd_fetch = fwd_fetch
        self.batch_size = int(batch_size)
        self.img_chw = tuple(img_chw)
        self.linger_s = float(linger_s)
        # load shedding: cap images WAITING for a dispatch slot (beyond
        # this the device is already saturated and every queued frame is
        # ~H*W bytes of host memory a slow drain would hold for seconds);
        # 0 = unbounded
        self.max_queue = int(max_queue)
        self._lock = threading.Lock()
        self._nonempty = threading.Condition(self._lock)
        self._queue: List[Tuple[np.ndarray, Future]] = []
        self._stop = False
        # dispatched-but-unfetched batches: (handles, take, t_dispatch)
        self._inflight: "queue.Queue" = queue.Queue(
            maxsize=max(1, int(pipeline_depth))
        )
        # observability counters (read under the same lock via stats())
        self._n_images = 0
        self._n_batches = 0
        self._n_shed = 0
        self._dispatch_s = 0.0
        self._collector = threading.Thread(target=self._collect, daemon=True)
        self._fetcher = threading.Thread(target=self._fetch, daemon=True)
        self._collector.start()
        self._fetcher.start()

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            n_img, n_b = self._n_images, self._n_batches
            disp = self._dispatch_s
            depth = len(self._queue)
        return {
            "images": n_img,
            "batches": n_b,
            # micro-batching health: 1.0 = every dispatch rode alone,
            # batch_size = perfectly coalesced
            "mean_batch_occupancy": (n_img / n_b) if n_b else 0.0,
            # dispatch-to-results-ready per batch; under pipelining this
            # INCLUDES time overlapped with the previous batch's fetch,
            # so it can exceed the per-batch marginal cost
            "mean_dispatch_ms": (1e3 * disp / n_b) if n_b else 0.0,
            "queue_depth": depth,
            "inflight_batches": self._inflight.qsize(),
            "shed_frames": self._n_shed,
        }

    def submit(self, img: np.ndarray) -> Future:
        return self.submit_many([img])[0]

    def submit_many(self, imgs: List[np.ndarray]) -> List[Future]:
        """Enqueue N frames atomically: either all are accepted or the
        whole group is shed (no partial work for a batch request that is
        going to 503 anyway). Futures resolve independently, in input
        order, possibly across several device dispatches."""
        for img in imgs:
            if img.shape != self.img_chw:
                raise ValueError(
                    f"image shape {img.shape} != model input {self.img_chw}"
                )
        futs: List[Future] = [Future() for _ in imgs]
        with self._nonempty:
            if self._stop:
                raise RuntimeError("batcher is shut down")
            if self.max_queue and len(self._queue) + len(imgs) > self.max_queue:
                self._n_shed += len(imgs)
                raise Overloaded(
                    f"{len(self._queue)} images already queued "
                    f"(--max-queue {self.max_queue}); retry later"
                )
            self._queue.extend(zip(imgs, futs))
            self._nonempty.notify()
        return futs

    def shutdown(self) -> None:
        with self._nonempty:
            self._stop = True
            self._nonempty.notify()
        self._collector.join(timeout=5)
        if self._collector.is_alive():
            # the collector normally enqueues the sentinel on its way out;
            # if it hung past the join timeout, enqueue one ourselves so
            # the fetcher (blocked on _inflight.get) still terminates
            try:
                self._inflight.put_nowait(self._SENTINEL)
            except queue.Full:
                pass
        self._fetcher.join(timeout=5)

    # ---------------------------------------------------- collector thread
    def _collect(self) -> None:
        """Assemble batches and dispatch them (async); never blocks on
        device results - backpressure comes from the bounded _inflight
        queue."""
        while True:
            with self._nonempty:
                while not self._queue and not self._stop:
                    self._nonempty.wait()
                if self._stop and not self._queue:
                    self._inflight.put(self._SENTINEL)
                    return
                # linger so concurrent requests share a dispatch: every
                # submit() notifies, so loop on a monotonic deadline (a
                # single wait() would wake on the FIRST new arrival and
                # dispatch 2-image batches under streaming load)
                deadline = time.monotonic() + self.linger_s
                while len(self._queue) < self.batch_size and not self._stop:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._nonempty.wait(remaining)
                take = self._queue[: self.batch_size]
                del self._queue[: len(take)]
            imgs = np.zeros((self.batch_size, *self.img_chw), np.uint8)
            for i, (im, _) in enumerate(take):
                imgs[i] = im
            t0 = time.monotonic()
            try:
                handles = self._fwd_dispatch(imgs)
            except Exception as e:  # tracing/compile-time failure
                for _, fut in take:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            # blocks when pipeline_depth dispatches are un-fetched
            self._inflight.put((handles, take, t0))

    # ------------------------------------------------------ fetcher thread
    def _fetch(self) -> None:
        """Fetch each dispatch's host results in FIFO order and resolve
        the per-image futures."""
        while True:
            item = self._inflight.get()
            if item is self._SENTINEL:
                return
            handles, take, t0 = item
            try:
                rows, idx, full = self._fwd_fetch(handles)
                for i, (_, fut) in enumerate(take):
                    fut.set_result((rows[i], idx[i], full, i))
            except Exception as e:  # surface device errors to every waiter
                for _, fut in take:
                    if not fut.done():
                        fut.set_exception(e)
            with self._lock:
                self._n_images += len(take)
                self._n_batches += 1
                self._dispatch_s += time.monotonic() - t0


def build_server(
    ckpt_path,
    *,
    host: str = "127.0.0.1",
    port: int = 8765,
    batch_size: int = 8,
    obj_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    min_class_confidence_threshold: float = 0.0,
    class_names: Optional[List[str]] = None,
    vertical_crop_height: Optional[float] = None,
    half: bool = False,
    quantize: bool = False,
    calibration_images: Optional[Path] = None,
    linger_ms: float = 5.0,
    data_parallel: bool = False,
    spatial_parallel: int = 1,
    fetch_top_k: int = 512,
    pipeline_depth: int = 2,
    max_queue: Optional[int] = None,
    max_frames_per_request: Optional[int] = None,
) -> ThreadingHTTPServer:
    """Load the model, compile the fixed-shape forward, and return a ready
    (not yet serving) ThreadingHTTPServer. Callers run serve_forever();
    tests drive it from a thread and shutdown() it."""
    model, variables, cfg = load_any(ckpt_path)
    if half:
        model = model.with_compute_dtype(jnp.bfloat16)

    img_h, img_w = (int(d) for d in model.img_size)
    crop_hw = None
    if vertical_crop_height:
        crop_px = int(round(vertical_crop_height * img_h))
        crop_hw = (crop_px, img_w)
        model = model.resize(crop_px)
        img_h = crop_px

    num_classes = model.num_classes
    if class_names is None and isinstance(cfg, dict):
        names = cfg.get("class_names") or cfg.get("classes")
        if names is not None and len(names) == num_classes:
            class_names = list(names)
    if class_names is None:
        class_names = [str(i) for i in range(num_classes)]
    if len(class_names) != num_classes:
        raise ValueError(
            f"expected {num_classes} class names, got {len(class_names)}"
        )
    if len(set(class_names)) != num_classes:
        # duplicate names would merge per-class counts into one JSON key
        # and silently drop a class from every response
        raise ValueError(f"class names must be unique, got {class_names}")

    rgb = bool(model.input_channels == 3)
    img_chw = (model.input_channels, img_h, img_w)
    # the batch pipeline normalizes in the DATASET for normalize_images
    # checkpoints (infer.py:189 -> ImagePathDataset divides by 255);
    # requests arrive as raw bytes here, so scale inside the jitted
    # forward instead (same math, f32, and uint8 stays the wire format)
    normalize = bool(model.normalize_images)

    def _scale(imgs):
        return imgs.astype(jnp.float32) / 255.0 if normalize else imgs

    if quantize:
        from yogo_tpu.ops.quant import family_quant_plan

        build_qp, _q_forward, _, all_skip = family_quant_plan(
            model, variables
        )
        if all_skip:
            calib = []  # no int8 convs -> no scales consumed (ops/quant.py)
        else:
            if calibration_images is None:
                raise ValueError(
                    "--quantize on a server needs --calibration-images DIR "
                    "(representative images to calibrate activation scales "
                    "on; the batch CLI calibrates on the run's own inputs)"
                )
            from yogo_tpu.data.image_source import get_dataset

            ds = get_dataset(
                path_to_images=calibration_images,
                crop_hw=crop_hw,
                rgb=rgb,
                normalize_images=normalize,
            )
            n = min(len(ds), max(batch_size, 8))
            if n == 0:
                raise ValueError("--calibration-images directory is empty")
            calib = [np.stack([ds[i][0] for i in range(n)])]
        qp = build_qp(calib)
        weights = qp

        def _fwd_raw(w, imgs):
            return _q_forward(model, w, _scale(imgs), decode=False)

    else:
        calib = None
        weights = variables

        def _fwd_raw(w, imgs):
            return model.apply(w, _scale(imgs), decode=False)

    # Device-side candidate selection: fetching the full (B, 5+C, Sy, Sx)
    # prediction tensor is the server's D2H bandwidth hog (~600 KB/image
    # f32 at 772x1032 - 38 MB per batch of 64). Production detectors emit
    # a few hundred candidates at most, so the program returns only the
    # top-K cells by objectness (rows + cell indices, ~25 KB/image at
    # K=512) plus the UNFETCHED device handle of the full tensor. The
    # host path stays provably exact: cells outside the top-K have
    # objectness <= the K-th value, so when that value <= the request's
    # obj_thresh the candidate set contains every passing cell and the
    # response is bit-identical to full-tensor formatting; otherwise
    # (saturated capacity, or a very low threshold) the handler fetches
    # that image's full slice on demand. Cell indices ride along so the
    # reconstructed grid preserves flat cell order - NMS tie-breaks
    # (original cell index, host parity) are unaffected.
    Sx, Sy = (int(g) for g in model.grid)
    n_cells = Sy * Sx
    pred_dim = 5 + num_classes
    K = max(1, min(int(fetch_top_k), n_cells))

    def _fwd_select(w, imgs):
        # exactness argument + v5e numbers: ops/postprocess.py
        # select_top_candidates_raw docstring (shared with `yogo infer`).
        # Round 4: selection-first over the UNDECODED head - no full-grid
        # decode in the program, and the retained fallback handle is the
        # compute-dtype raw (for bf16 serving that halves the HBM of the
        # decoded f32; the --quantize path emits its head in f32, so there
        # the saving is only the dropped decoded concat, not a halving)
        raw = _fwd_raw(w, imgs)
        rows, idx = select_top_candidates_raw(
            raw, K, model.anchor_w, model.anchor_h,
            width_multiplier=model.width_multiplier,
            height_multiplier=model.height_multiplier,
        )
        return rows, idx, raw  # (B,K,D), (B,K), unfetched raw handle

    if (data_parallel or spatial_parallel > 1) and jax.process_count() > 1:
        raise ValueError(
            "data_parallel/spatial_parallel serving is single-process only "
            "(same contract as yogo infer)"
        )
    if spatial_parallel > 1 or (data_parallel and len(jax.devices()) > 1):
        # same mesh selection as infer.predict: spatial-only uses exactly
        # N devices (row sharding cuts single-request LATENCY - the axis
        # that matters when micro-batches are small); with data_parallel
        # it spans all local devices as (n_dev/N) data x N space
        from yogo_tpu.parallel.mesh import (
            data_sharded,
            get_mesh,
            get_mesh_2d,
            n_data,
            replicated,
            space_sharded,
            validate_spatial_height,
        )

        mesh = (
            get_mesh_2d(
                spatial_parallel,
                None if data_parallel else jax.devices()[:spatial_parallel],
            )
            if spatial_parallel > 1
            else get_mesh()
        )
        if spatial_parallel > 1:
            validate_spatial_height(mesh, img_h)
        nd = n_data(mesh)
        if batch_size % nd:
            batch_size = ((batch_size + nd - 1) // nd) * nd
        weights_sharding = replicated(mesh)
        weights = jax.device_put(weights, weights_sharding)
        in_shard = (
            space_sharded(mesh) if spatial_parallel > 1 else data_sharded(mesh)
        )
        jfwd = jax.jit(
            _fwd_select,
            in_shardings=(weights_sharding, in_shard),
            out_shardings=replicated(mesh),
        )
    else:
        weights_sharding = None
        # commit the weights to the device ONCE: as a jit argument, host
        # numpy leaves would re-upload the whole tree every dispatch (and
        # a reload's committed tree would miss the jit cache)
        weights = jax.device_put(weights)
        jfwd = jax.jit(_fwd_select)

    # weights are a jit ARGUMENT, not a closure constant: a hot reload
    # (SIGHUP / reload_checkpoint) swaps this reference and the next
    # dispatch runs the SAME compiled program with the new weights - same
    # avals, zero recompile. The dict swap is atomic under the GIL; an
    # in-flight dispatch keeps the handles it already read.
    state = {"weights": weights}

    def fwd_dispatch(imgs_np):
        """Asynchronously dispatch one batch: device_put + jitted forward
        both return un-fetched handles, so this never blocks on the device
        - the batcher's collector thread keeps assembling/uploading the
        next batch while this one computes (pipelining)."""
        return jfwd(state["weights"], jnp.asarray(imgs_np))

    def fwd_fetch(handles):
        """Fetch ONLY the candidate rows + indices (the blocking D2H; the
        full tensor stays on device, sliced per image iff a request needs
        it)."""
        rows, idx, full = handles
        return np.asarray(rows, np.float32), np.asarray(idx), full

    # the fallback's per-image slice+decode as ONE jitted program with a
    # traced slot index: a Python-int slot would compile a distinct
    # executable per slot value (up to batch_size uncached remote
    # compiles hiding in first low-threshold requests). The full handle
    # is RAW, so the fallback decodes the one sliced image on device
    def _slice_full(full, i):
        return decode_raw_slice(
            full, jnp.asarray(i, jnp.int32), model.anchor_w,
            model.anchor_h,
            width_multiplier=model.width_multiplier,
            height_multiplier=model.height_multiplier,
        )

    # compile + warm NOW (the selection program AND the fallback slice):
    # the first request must not pay tracing/compile. FETCH results rather
    # than block_until_ready - on remote backends (the axon tunnel)
    # block_until_ready can return before the program actually loaded+ran
    # on the worker, leaving the first request to pay ~27 s of one-time
    # load (measured; same gotcha as bench timing)
    _, _, _full_w = fwd_fetch(
        fwd_dispatch(np.zeros((batch_size, *img_chw), np.uint8))
    )
    np.asarray(_slice_full(_full_w, 0))
    del _full_w

    # default shed point: pipeline_depth batches can be in flight plus
    # this many waiting = several seconds of device backlog already
    if max_queue is None:
        max_queue = 8 * batch_size
    # raw batch requests: frames per POST (4 device batches fills the
    # default pipeline nicely; also the implicit raw-path body bound)
    if max_frames_per_request is None:
        # derived default must respect a user-set --max-queue (a batch
        # request sheds whole, so the cap can never usefully exceed it)
        max_frames_per_request = min(4 * batch_size, max_queue or 10**9)
    max_frames_per_request = max(1, int(max_frames_per_request))
    if max_queue and max_frames_per_request > max_queue:
        # a batch request sheds whole: one bigger than the queue bound
        # could NEVER be accepted, even on an idle server
        raise ValueError(
            f"--max-frames-per-request {max_frames_per_request} exceeds "
            f"--max-queue {max_queue}: a full-size batch request would "
            "always be shed; raise --max-queue or lower the frame cap"
        )
    batcher = _Batcher(fwd_dispatch, fwd_fetch, batch_size, img_chw,
                       linger_s=linger_ms / 1e3,
                       pipeline_depth=pipeline_depth,
                       max_queue=max_queue)
    inflight = _Gauge()
    fallback_lock = threading.Lock()
    fallback_count = [0]  # full-tensor fetches (candidate set insufficient)

    def _pred_for(cand_rows, cand_idx, full, slot, obj_t: float):
        """Reconstruct the (D, Sy, Sx) grid this request's thresholds can
        be served from. Fast path: scatter the K candidates into a zero
        grid (zero rows have objectness 0 and are filtered exactly like
        the cells they stand in for, PROVIDED no passing cell is missing -
        guaranteed when the K-th candidate's objectness <= obj_thresh).
        Otherwise fetch this image's full slice from the device handle."""
        if K < n_cells and float(cand_rows[-1, 4]) > obj_t:
            with fallback_lock:
                fallback_count[0] += 1
            return np.asarray(_slice_full(full, slot), np.float32)
        return scatter_candidates(cand_rows, cand_idx, pred_dim, Sy, Sx)

    def _format_detections(pred, thr) -> Dict[str, Any]:
        rows = format_preds(pred, box_format="cxcywh", **thr)
        # derive xyxy from the single formatter pass: a second
        # format_preds call would redo the filter + host NMS
        xyxy = (
            _cxcywh_to_xyxy_np(rows[:, :4])
            if len(rows)
            else np.zeros((0, 4), np.float32)
        )
        dets = []
        counts = {name: 0 for name in class_names}
        for r, bx in zip(rows, xyxy):
            ci = int(np.argmax(r[5:]))
            counts[class_names[ci]] += 1
            dets.append({
                "class_idx": ci,
                "class": class_names[ci],
                "objectness": float(r[4]),
                "class_confidence": float(r[5 + ci]),
                "bbox_cxcywh": [float(v) for v in r[:4]],
                "bbox_xyxy": [float(v) for v in bx],
            })
        return {"detections": dets, "counts": counts}

    defaults = {
        "obj_thresh": obj_thresh,
        "iou_thresh": iou_thresh,
        "min_class_confidence_threshold": min_class_confidence_threshold,
    }
    info = {
        "status": "ok",
        "model": getattr(model.defn, "name", "yogo"),
        "classes": class_names,
        "input_hw": [img_h, img_w],
        "rgb": rgb,
        "normalize_images": normalize,
        "batch_size": batch_size,
        "quantize": bool(quantize),
        "fetch_top_k": K,
        "pipeline_depth": max(1, int(pipeline_depth)),
        "max_queue": int(max_queue),
        "max_frames_per_request": int(max_frames_per_request),
        "data_parallel_devices": (
            len(jax.devices())
            if data_parallel and len(jax.devices()) > 1
            else 1
        ),
        "spatial_parallel": int(spatial_parallel),
        "defaults": defaults,
        "reloads": 0,
    }

    reload_lock = threading.Lock()

    def reload_checkpoint(path=None) -> Dict[str, Any]:
        """Hot-swap the served weights from `path` (default: the checkpoint
        path given at startup, re-read from disk) WITHOUT recompiling:
        weights are a jit argument, so same avals -> the same warm
        executable runs the new values on the next dispatch. The swap is
        atomic; in-flight dispatches finish on the old weights. A
        quantized server recalibrates its int8 plan on the retained
        calibration batches. On any failure the old weights keep serving
        and {"ok": False, "error": ...} is returned. Triggered by SIGHUP
        under `yogo serve` (the standard reload signal - no network
        surface), or called directly on the server object."""
        src = path if path is not None else ckpt_path
        with reload_lock:
            try:
                model2, variables2, _cfg2 = load_any(src)
                for what, got, want in (
                    ("model", model2.defn.name, model.defn.name),
                    ("num_classes", model2.num_classes, num_classes),
                    ("input_channels", model2.input_channels,
                     model.input_channels),
                    ("normalize_images", bool(model2.normalize_images),
                     normalize),
                ):
                    if got != want:
                        raise ValueError(
                            f"incompatible reload: {what} {got!r} != "
                            f"serving {want!r}"
                        )
                if quantize:
                    build_qp2 = family_quant_plan(model, variables2)[0]
                    new_w = build_qp2(calib)
                else:
                    new_w = variables2

                # aval parity is the no-recompile guarantee (and catches
                # e.g. a width-mismatched checkpoint before it serves)
                def avals(tree):
                    return jax.tree.map(
                        lambda a: (tuple(np.shape(a)),
                                   np.result_type(a).name), tree
                    )

                if avals(state["weights"]) != avals(new_w):
                    raise ValueError(
                        "incompatible reload: weight shapes/dtypes differ "
                        "from the serving program's"
                    )
                new_w = (
                    jax.device_put(new_w, weights_sharding)
                    if weights_sharding is not None
                    else jax.device_put(new_w)
                )
                jax.block_until_ready(new_w)  # upload off the hot path
                state["weights"] = new_w
                info["reloads"] += 1
                return {"ok": True, "reloads": info["reloads"],
                        "path": str(src)}
            except Exception as e:
                return {"ok": False, "error": repr(e), "path": str(src)}

    class Handler(BaseHTTPRequestHandler):
        # quiet by default; tests and production logs don't want per-request
        # stderr lines from the stdlib handler
        def log_message(self, fmt, *args):  # noqa: N802 (stdlib name)
            pass

        def _drain(self, length: int) -> None:
            """Discard a rejected request's body in small chunks before
            responding: answering while the client is still writing makes
            it see EPIPE instead of our JSON error. Allocation stays one
            chunk; bodies beyond 2x the encoded cap aren't worth the
            bandwidth - close the connection instead."""
            limit = 2 * _MAX_ENCODED_BODY
            if length > limit:
                self.close_connection = True
                length = 0
            while length > 0:
                chunk = self.rfile.read(min(length, 1 << 20))
                if not chunk:
                    self.close_connection = True
                    return
                length -= len(chunk)

        def _json(self, code: int, payload: Dict[str, Any],
                  extra_headers: Optional[Dict[str, str]] = None) -> None:
            body = json.dumps(payload).encode()
            encoding = None
            # a batch-request response is megabytes of JSON (hundreds of
            # detections x hundreds of frames); gzip cuts it ~10x for any
            # client that asks. Small bodies aren't worth the CPU.
            accepts = self.headers.get("Accept-Encoding", "")
            if len(body) >= 1024 and "gzip" in accepts.lower():
                body = gzip.compress(body, compresslevel=1)
                encoding = "gzip"
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if encoding:
                self.send_header("Content-Encoding", encoding)
            for k, v in (extra_headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib name)
            url = urlparse(self.path)
            path = url.path
            if path in ("/", "/healthz"):
                self._json(200, info)
            elif path == "/metrics":
                stats = batcher.stats()
                with fallback_lock:
                    stats["full_fetch_fallbacks"] = fallback_count[0]
                q = {k: v[-1] for k, v in parse_qs(url.query).items()}
                if q.get("format") == "prometheus":
                    # the exposition format every scraper speaks; gauges
                    # (queue_depth, inflight) and counters (the rest) are
                    # all numeric already
                    lines = []
                    for k, v in sorted(stats.items()):
                        kind = ("gauge" if k in
                                ("queue_depth", "inflight_batches",
                                 "mean_batch_occupancy", "mean_dispatch_ms")
                                else "counter")
                        lines.append(f"# TYPE yogo_{k} {kind}")
                        lines.append(f"yogo_{k} {float(v)!r}")
                    body = ("\n".join(lines) + "\n").encode()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "text/plain; version=0.0.4"
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._json(200, stats)
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):  # noqa: N802 (stdlib name)
            with inflight:
                self._predict()

        def _predict(self):
            url = urlparse(self.path)
            if url.path != "/predict":
                self._json(404, {"error": f"unknown path {url.path}"})
                return
            cl = self.headers.get("Content-Length")
            if cl is None:
                # stdlib http.server does not decode chunked bodies; be
                # explicit rather than misreporting it as an empty body
                self._json(411, {
                    "error": "Content-Length required (chunked "
                             "transfer-encoding is not supported)"
                })
                return
            try:
                length = int(cl)
            except ValueError:
                self._json(400, {"error": f"bad Content-Length: {cl!r}"})
                return
            if length <= 0:
                self._json(400, {"error": "empty body; POST image bytes"})
                return
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            if ctype.strip().lower() == "application/octet-stream":
                # raw uint8 frame path: the body IS the (C, H, W) pixel
                # buffer the model consumes - no decode, no crop (clients
                # holding camera frames send them as-is; /healthz reports
                # the expected input_hw). N concatenated frames = one
                # BATCH request (see module docstring).
                expected = int(np.prod(img_chw))
                n_frames, rem = divmod(length, expected)
                if rem or not (1 <= n_frames <= max_frames_per_request):
                    self._drain(length)
                    self._json(400, {
                        "error": (
                            f"raw body must be N x {expected} bytes "
                            f"(uint8, C-order {list(img_chw)} CHW frames, "
                            f"1 <= N <= {max_frames_per_request}), got "
                            f"{length}"
                        )
                    })
                    return
                buf = self.rfile.read(length)
                if len(buf) != length:  # client hung up mid-body
                    self._json(400, {
                        "error": f"short body: {len(buf)}/{length} bytes"
                    })
                    return
                imgs = list(
                    np.frombuffer(buf, np.uint8).reshape(-1, *img_chw)
                )
            else:
                if length > _MAX_ENCODED_BODY:
                    # bound the decode path's allocation: an attacker (or
                    # a misconfigured client) must not make the server
                    # buffer an arbitrary-size body
                    self._drain(length)
                    self._json(413, {
                        "error": (
                            f"body of {length} bytes exceeds the "
                            f"{_MAX_ENCODED_BODY}-byte limit for encoded "
                            "images; send raw octet-stream frames instead"
                        )
                    })
                    return
                try:
                    raw = self.rfile.read(length)
                    imgs = [_decode_image_bytes(raw, rgb=rgb, crop_hw=crop_hw)]
                except Exception as e:
                    self._json(
                        400, {"error": f"could not decode image: {e}"}
                    )
                    return
            for img in imgs:
                if img.shape != img_chw:
                    self._json(400, {
                        "error": (
                            f"image shape {list(img.shape)} != model input "
                            f"{list(img_chw)} (CHW); resize/crop client-side "
                            "or start the server with --crop-height"
                        )
                    })
                    return

            q = {k: v[-1] for k, v in parse_qs(url.query).items()}
            unknown = sorted(set(q) - set(defaults))
            if unknown:
                # a typo'd override (obj_tresh=0.9) silently serving the
                # DEFAULT threshold is a debugging trap; fail loudly like
                # the CLI does for unknown flags
                self._json(400, {
                    "error": (
                        f"unknown query parameter(s) {unknown}; "
                        f"supported: {sorted(defaults)}"
                    )
                })
                return
            try:
                thr = {k: float(q.get(k, defaults[k])) for k in defaults}
                # same bounds the CLI validators enforce: a negative or
                # NaN obj_thresh would feed EVERY grid cell into the
                # O(N^2) host NMS - a one-request CPU-exhaustion hole
                for k, v in thr.items():
                    if not math.isfinite(v) or not (0.0 <= v <= 1.0):
                        raise ValueError(f"{k}={v} outside [0, 1]")
            except ValueError as e:
                self._json(400, {"error": f"bad query parameter: {e}"})
                return

            try:
                futs = batcher.submit_many(imgs)
                # shared deadline across the group: a hung device must not
                # cost 60 s PER frame of a batch request
                deadline = time.monotonic() + 120.0
                results = []
                for i in range(len(futs)):
                    # release each future (and its result tuple's full-
                    # prediction DEVICE handle) as soon as it's formatted:
                    # holding the whole group's handles until the loop
                    # ends would pin ~n_dispatches full tensors in HBM
                    # per concurrent batch request, beyond the
                    # pipeline_depth backpressure
                    fut, futs[i] = futs[i], None
                    cand_rows, cand_idx, full, slot = fut.result(
                        timeout=max(0.0, deadline - time.monotonic())
                    )
                    del fut
                    pred = _pred_for(
                        cand_rows, cand_idx, full, slot, thr["obj_thresh"]
                    )
                    del cand_rows, cand_idx, full
                    results.append(_format_detections(pred, thr))
            except Overloaded as e:
                # shed BEFORE holding the frames: tell clients when to retry
                # (one batch's drain time, coarsely)
                self._json(503, {"error": f"overloaded: {e}"},
                           extra_headers={"Retry-After": "1"})
                return
            except FuturesTimeoutError:
                # str(TimeoutError()) is "" - name the deadline so logs
                # and clients can tell a hung device from other failures
                self._json(503, {
                    "error": "inference timed out (120 s group deadline); "
                             "device hung or severely backlogged"
                }, extra_headers={"Retry-After": "30"})
                return
            except Exception as e:
                self._json(503, {"error": f"inference failed: {e!r}"})
                return
            if len(results) == 1:
                self._json(200, results[0])
            else:
                self._json(200, {"results": results})

    class _Server(ThreadingHTTPServer):
        # socketserver's default accept backlog is 5: a burst of
        # concurrent clients overflows the listen queue and sees
        # connection-refused/reset (measured at 64 clients,
        # tools/serve_loadtest.py). 128 covers any sane client fan-in.
        request_queue_size = 128

        def handle_error(self, request, client_address):
            # a client that disconnects mid-response (curl timeout, LB
            # reset) raises ConnectionError in its handler thread;
            # socketserver's default prints a full traceback per event -
            # pure noise under load. Anything else still gets reported.
            exc = sys.exc_info()[1]
            if isinstance(exc, (ConnectionError, TimeoutError)):
                return
            super().handle_error(request, client_address)

    server = _Server((host, port), Handler)
    server.yogo_batcher = batcher  # for orderly shutdown
    server.yogo_inflight = inflight
    server.yogo_info = info
    server.reload_checkpoint = reload_checkpoint
    server.yogo_jfwd = jfwd  # tests pin the no-recompile reload contract
    return server


def _decode_image_bytes(
    raw: bytes, *, rgb: bool, crop_hw: Optional[Tuple[int, int]]
) -> np.ndarray:
    """Bytes -> (C, H, W) uint8 through the batch pipeline's OWN decoder
    (read_image accepts any PIL-openable source, so byte-for-byte parity
    with `yogo infer` holds by construction, not by re-implementation)."""
    from yogo_tpu.data.image_source import center_crop
    from yogo_tpu.data.utils import read_image

    return center_crop(read_image(io.BytesIO(raw), rgb=rgb), crop_hw)


def do_serve(args) -> None:
    server = build_server(
        args.ckpt_path,
        host=args.host,
        port=args.port,
        batch_size=args.batch_size,
        obj_thresh=args.obj_thresh,
        iou_thresh=args.iou_thresh,
        min_class_confidence_threshold=args.min_class_confidence_threshold,
        class_names=args.class_names,
        vertical_crop_height=args.crop_height,
        half=args.half,
        quantize=args.quantize,
        calibration_images=args.calibration_images,
        linger_ms=args.linger_ms,
        data_parallel=args.data_parallel,
        spatial_parallel=args.spatial_parallel,
        fetch_top_k=args.fetch_top_k,
        pipeline_depth=args.pipeline_depth,
        max_queue=args.max_queue,
        max_frames_per_request=args.max_frames_per_request,
    )
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port} "
          f"(POST /predict, GET /healthz; ctrl-c or SIGTERM to stop)")

    # graceful stop on SIGTERM (the supervisor/pod grace signal), same
    # philosophy as the trainer's preemption handler: stop accepting,
    # finish in-flight requests, exit 0. shutdown() must run off the
    # serve_forever thread (calling it from the signal frame - which IS
    # that thread - deadlocks, stdlib gotcha), so the handler hands it
    # to a one-shot thread.
    import signal as _signal

    def _term(signum, frame):
        threading.Thread(target=server.shutdown, daemon=True).start()

    def _hup(signum, frame):
        # reload off the signal frame; report the outcome to stderr
        def run():
            print(f"SIGHUP reload: {server.reload_checkpoint()}",
                  file=sys.stderr)

        threading.Thread(target=run, daemon=True).start()

    not_installed = object()  # a None prev disposition is legitimate
    prev = prev_hup = not_installed
    try:
        prev = _signal.signal(_signal.SIGTERM, _term)
        prev_hup = _signal.signal(_signal.SIGHUP, _hup)
    except ValueError:  # not the main thread (embedded use)
        pass
    try:
        server.serve_forever()
        # stopped via SIGTERM -> server.shutdown(): drain before closing.
        # Accepted requests finish (the gauge covers decode -> batcher
        # round-trip -> response write); the bound keeps a hung client's
        # keep-alive connection from holding the process hostage.
        drained = server.yogo_inflight.wait_zero(timeout=30.0)
        print(
            "SIGTERM: "
            + ("drained in-flight requests, " if drained
               else "drain timed out (hung client?), ")
            + "shutting down",
            file=sys.stderr,
        )
    except KeyboardInterrupt:
        pass
    finally:
        # signal.signal rejects None as a handler even though it returns
        # None for a C-installed one; restore the default in that case
        if prev is not not_installed:
            _signal.signal(_signal.SIGTERM,
                           _signal.SIG_DFL if prev is None else prev)
        if prev_hup is not not_installed:
            _signal.signal(_signal.SIGHUP,
                           _signal.SIG_DFL if prev_hup is None else prev_hup)
        server.yogo_batcher.shutdown()
        server.server_close()
