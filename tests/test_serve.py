"""`yogo serve` HTTP inference server (yogo_tpu/serve.py - extension, the
reference ships only batch CLI inference).

Pins: served detections == infer's host-exact formatter on the same image,
micro-batching coalesces concurrent requests into shared dispatches, error
paths return structured JSON (bad image, wrong shape, unknown route), and
per-request threshold overrides work.
"""

import io
import json
import threading
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import pytest

from tests.test_golden_detections import gen_test_images
from yogo_tpu.ops.postprocess import format_preds
from yogo_tpu.serve import build_server
from yogo_tpu.utils.checkpoint import load_any

GOLDEN_DIR = Path(__file__).parent / "goldens"
CKPT_PATH = GOLDEN_DIR / "trained_half_filters.ckpt"


def _png_bytes(img_hw_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_hw_u8).save(buf, format="PNG")
    return buf.getvalue()


def _post(port: int, body: bytes, path="/predict", timeout=60,
          content_type=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST",
        headers={"Content-Type": content_type} if content_type else {},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def goldens_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_goldens")
    gen_test_images(d, n=4, seed=5)
    return d


@pytest.fixture(scope="module")
def server():
    srv = build_server(CKPT_PATH, port=0, batch_size=4, linger_ms=20.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.yogo_batcher.shutdown()
    srv.server_close()
    t.join(timeout=5)


def test_healthz_reports_model(server):
    port = server.server_address[1]
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/healthz", timeout=30
    ) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["classes"] == ["cell", "parasite"]
    assert info["input_hw"] == [int(d) for d in load_any(CKPT_PATH)[0].img_size]


def test_served_detections_match_host_formatter(server, goldens_dir):
    """The end gate: a served response == format_preds on the model's own
    prediction for the same image (bit-exact class/count agreement, boxes
    to float tolerance)."""
    import jax.numpy as jnp

    port = server.server_address[1]
    model, variables, _ = load_any(CKPT_PATH)
    imgs = gen_test_images(goldens_dir, n=4, seed=5)

    total = 0
    for img in imgs:
        status, resp = _post(port, _png_bytes(img))
        assert status == 200, resp
        pred = np.asarray(
            model.apply(variables, jnp.asarray(img[None, None]),
                        inference=True),
            np.float32,
        )[0]
        rows = format_preds(pred, obj_thresh=0.5, iou_thresh=0.5)
        dets = resp["detections"]
        assert len(dets) == len(rows)
        got_classes = sorted(d["class_idx"] for d in dets)
        want_classes = sorted(int(np.argmax(r[5:])) for r in rows)
        assert got_classes == want_classes
        # counts sum to detections and match the per-class histogram
        assert sum(resp["counts"].values()) == len(dets)
        # boxes round-trip through JSON at float precision
        by_obj = sorted(dets, key=lambda d: -d["objectness"])
        want_by_obj = rows[np.argsort(-rows[:, 4], kind="stable")]
        for d, r in zip(by_obj, want_by_obj):
            np.testing.assert_allclose(
                d["bbox_cxcywh"], r[:4], rtol=1e-5, atol=1e-6
            )
        total += len(dets)
    assert total >= 5  # the golden generator produces real detections


def test_concurrent_requests_share_dispatches(server, goldens_dir):
    """Micro-batching: N concurrent posts produce N correct responses (the
    batcher pads/unpads correctly under concurrency), and /metrics shows
    the dispatches actually coalesced (occupancy > 1)."""
    port = server.server_address[1]
    imgs = gen_test_images(goldens_dir, n=4, seed=5)
    bodies = [_png_bytes(im) for im in imgs] * 3  # 12 requests, batch cap 4

    with ThreadPoolExecutor(max_workers=12) as pool:
        results = list(pool.map(lambda b: _post(port, b), bodies))
    assert all(status == 200 for status, _ in results)
    # identical images must produce identical responses regardless of
    # which micro-batch slot they rode in
    for i in range(4):
        a, b, c = results[i][1], results[i + 4][1], results[i + 8][1]
        assert a == b == c

    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/metrics", timeout=30
    ) as r:
        stats = json.loads(r.read())
    assert stats["images"] >= 12 and stats["batches"] >= 1
    # 12 concurrent requests into a cap-4 batcher with a 20 ms linger must
    # coalesce: strictly fewer dispatches than images
    assert stats["batches"] < stats["images"]
    assert stats["mean_batch_occupancy"] > 1.0


def test_threshold_query_overrides(server, goldens_dir):
    port = server.server_address[1]
    img = gen_test_images(goldens_dir, n=1, seed=5)[0]
    _, strict = _post(port, _png_bytes(img), path="/predict?obj_thresh=0.99")
    _, loose = _post(port, _png_bytes(img), path="/predict?obj_thresh=0.1")
    assert len(strict["detections"]) <= len(loose["detections"])
    # unparseable, out-of-range, and NaN thresholds are all 400s - a
    # negative obj_thresh would feed EVERY grid cell into the O(N^2) host
    # NMS (one-request CPU exhaustion), NaN silently returns nothing
    for bad_q in ("obj_thresh=nope", "obj_thresh=-1", "obj_thresh=nan",
                  "iou_thresh=2"):
        status, bad = _post(port, _png_bytes(img), path=f"/predict?{bad_q}")
        assert status == 400 and "error" in bad, bad_q


def test_error_paths(server):
    port = server.server_address[1]
    status, resp = _post(port, b"not an image")
    assert status == 400 and "decode" in resp["error"]
    wrong = np.zeros((8, 8), np.uint8)
    status, resp = _post(port, _png_bytes(wrong))
    assert status == 400 and "shape" in resp["error"]
    status, resp = _post(port, _png_bytes(wrong), path="/nonsense")
    assert status == 404
    status, resp = _post(port, b"")
    assert status == 400


def test_missing_content_length_is_411(server):
    """Chunked transfer-encoding is unsupported by stdlib http.server; the
    server must say so (411) instead of misreporting an empty body."""
    import socket

    port = server.server_address[1]
    with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
        s.sendall(
            b"POST /predict HTTP/1.1\r\nHost: t\r\n"
            b"Transfer-Encoding: chunked\r\nConnection: close\r\n\r\n"
        )
        head = s.recv(65536).split(b"\r\n", 1)[0]
    assert b"411" in head


def test_raw_frame_path_matches_png_path(server, goldens_dir):
    """`Content-Type: application/octet-stream` posts the raw (C, H, W)
    uint8 buffer - the high-rate camera-client path. Responses must be
    bit-identical to the PNG path for the same pixels (both feed the same
    batcher), and size errors must be structured 400s."""
    port = server.server_address[1]
    img = gen_test_images(goldens_dir, n=1, seed=5)[0]  # (H, W) grayscale

    _, png_resp = _post(port, _png_bytes(img))
    status, raw_resp = _post(
        port, img[None].tobytes(),  # (1, H, W) C-order
        content_type="application/octet-stream",
    )
    assert status == 200
    assert raw_resp == png_resp
    assert len(raw_resp["detections"]) >= 1  # a real trained-model response

    # wrong byte count -> 400 naming the expected size, not a 500
    status, resp = _post(
        port, img[None].tobytes()[:-7],
        content_type="application/octet-stream",
    )
    assert status == 400 and "bytes" in resp["error"]
    # content-type parameters (charset etc.) don't break the dispatch
    status, resp = _post(
        port, img[None].tobytes(),
        content_type="application/octet-stream; x=y",
    )
    assert status == 200 and resp == png_resp


def test_raw_batch_request_matches_singles(server, goldens_dir):
    """N concatenated raw frames in ONE POST = a batch request: the
    {"results": [...]} entries must be bit-identical (JSON-level) to N
    single posts of the same frames, in input order; thresholds apply to
    every frame; a non-multiple body length or N over the advertised
    max_frames_per_request is a structured 400."""
    port = server.server_address[1]
    imgs = gen_test_images(goldens_dir, n=3, seed=5)
    singles = [
        _post(port, im[None].tobytes(),
              content_type="application/octet-stream")[1]
        for im in imgs
    ]
    body = b"".join(im[None].tobytes() for im in imgs)
    status, resp = _post(port, body,
                         content_type="application/octet-stream")
    assert status == 200
    assert set(resp) == {"results"} and len(resp["results"]) == 3
    assert resp["results"] == singles

    # threshold overrides apply to the whole group
    status, strict = _post(port, body, path="/predict?obj_thresh=0.99",
                           content_type="application/octet-stream")
    assert status == 200
    assert all(len(s["detections"]) <= len(r["detections"])
               for s, r in zip(strict["results"], resp["results"]))

    info = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/healthz", timeout=30).read())
    cap = info["max_frames_per_request"]
    assert cap == 4 * info["batch_size"]  # the documented default
    too_many = imgs[0][None].tobytes() * (cap + 1)
    status, resp = _post(port, too_many,
                         content_type="application/octet-stream")
    assert status == 400 and str(cap) in resp["error"]


def test_encoded_body_size_cap(server):
    """Encoded-image bodies above the 32 MiB bound are rejected 413 before
    the decode path buffers them (allocation-bound hardening; raw
    octet-stream bodies are instead bounded by max_frames_per_request)."""
    port = server.server_address[1]
    status, resp = _post(port, b"\0" * (32 * 1024 * 1024 + 1))
    assert status == 413 and "limit" in resp["error"]


def test_batcher_submit_many_is_atomic_under_shedding():
    """A group that would overflow max_queue is shed WHOLE - no partial
    enqueue computing frames for a request that already got its 503 - and
    a group that fits is accepted whole."""
    from yogo_tpu.serve import Overloaded, _Batcher

    fetch_gate = threading.Event()

    def fwd_dispatch(imgs):
        return imgs.copy()

    def fwd_fetch(imgs):
        fetch_gate.wait(timeout=30)
        b = imgs.shape[0]
        return (imgs[:, 0, :1, :1].astype(np.float32).reshape(b, 1, 1),
                np.zeros((b, 1), np.int64), "full")

    batcher = _Batcher(fwd_dispatch, fwd_fetch, batch_size=1,
                       img_chw=(1, 1, 1), linger_s=0.0, pipeline_depth=1,
                       max_queue=4)
    try:
        import time

        # saturate the pipeline deterministically (batch_size=1): batch 1
        # blocked inside the gated fetch, batch 2 queued in _inflight,
        # batch 3 taken by the collector which is now blocked on the full
        # _inflight.put - the waiting queue drains to 0 and STAYS there
        first = [batcher.submit(np.zeros((1, 1, 1), np.uint8))
                 for _ in range(3)]
        deadline = time.monotonic() + 30
        while batcher.stats()["queue_depth"] > 0:
            assert time.monotonic() < deadline, "pipeline never saturated"
        # a group of 3 fits the empty waiting queue (3 <= 4)...
        group = batcher.submit_many(
            [np.full((1, 1, 1), v, np.uint8) for v in (1, 2, 3)]
        )
        # ...but a further group of 2 would take it to 5 > 4: shed whole
        try:
            batcher.submit_many(
                [np.zeros((1, 1, 1), np.uint8) for _ in range(2)]
            )
            raise AssertionError("expected Overloaded")
        except Overloaded:
            pass
        stats = batcher.stats()
        assert stats["shed_frames"] == 2
        assert stats["queue_depth"] == 3  # the accepted group is intact

        fetch_gate.set()
        got = [int(f.result(timeout=30)[0][0, 0]) for f in group]
        assert got == [1, 2, 3]  # input order preserved across dispatches
        for f in first:
            f.result(timeout=30)
    finally:
        fetch_gate.set()
        batcher.shutdown()


def test_fetch_topk_fallback_is_exact(goldens_dir):
    """The device->host candidate fetch is capacity-K but responses must
    stay EXACT at any threshold: when the K-th candidate's objectness
    exceeds the request's obj_thresh the server fetches that image's full
    tensor instead (counted in /metrics full_fetch_fallbacks). K=4 on a
    192-cell grid forces both paths."""
    import jax.numpy as jnp

    srv = build_server(CKPT_PATH, port=0, batch_size=2, linger_ms=5.0,
                       fetch_top_k=4)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        assert srv.yogo_info["fetch_top_k"] == 4
        model, variables, _ = load_any(CKPT_PATH)
        img = gen_test_images(goldens_dir, n=1, seed=5)[0]
        pred = np.asarray(
            model.apply(variables, jnp.asarray(img[None, None]),
                        inference=True), np.float32,
        )[0]

        for thresh in (0.01, 0.5, 0.99):
            status, resp = _post(
                port, _png_bytes(img), path=f"/predict?obj_thresh={thresh}"
            )
            assert status == 200
            want = format_preds(pred, obj_thresh=thresh, iou_thresh=0.5)
            assert len(resp["detections"]) == len(want)
            got = sorted(resp["detections"], key=lambda d: -d["objectness"])
            want_sorted = want[np.argsort(-want[:, 4], kind="stable")]
            for d, r in zip(got, want_sorted):
                np.testing.assert_allclose(
                    d["bbox_cxcywh"], r[:4], rtol=1e-5, atol=1e-6
                )
        # obj_thresh=0.01 passes more than 4 cells on this trained model,
        # so at least one request took the full-tensor path
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=30
        ) as r:
            stats = json.loads(r.read())
        assert stats["full_fetch_fallbacks"] >= 1
        n_pass_low = int((pred[4] > 0.01).sum())
        assert n_pass_low > 4  # the premise of the fallback assertion
    finally:
        srv.shutdown()
        srv.yogo_batcher.shutdown()
        srv.server_close()
        t.join(timeout=5)


def test_scatter_candidates_exactness_fuzz():
    """Property fuzz of the top-K candidate contract: for random grids,
    random K, and any threshold t with (K-th candidate objectness) <= t,
    format_preds on the scattered candidate grid must be BIT-identical to
    format_preds on the full tensor - including NMS tie-breaks (original
    cell order) and duplicate objectness values."""
    from yogo_tpu.serve import scatter_candidates

    D, Sy, Sx = 9, 7, 11  # 4 classes
    S = Sy * Sx
    for seed in range(40):
        rng = np.random.default_rng(seed)
        pred = rng.random((D, Sy, Sx), dtype=np.float32)
        # clustered boxes + quantized objectness so NMS suppression and
        # score ties actually occur
        pred[2:4] *= 0.4
        pred[4] = np.round(pred[4] * 8) / 8
        K = int(rng.integers(1, S + 1))

        flat = pred.reshape(D, S).T  # (S, D), the formatter's own order
        order = np.argsort(-flat[:, 4], kind="stable")[:K]
        cand_idx = order  # device order (objectness-desc); scatter restores
        cand_rows = flat[cand_idx]
        vK = cand_rows[-1, 4]

        for t in (vK, min(vK + 0.1, 1.0), 0.6, 0.9):
            if vK > t:
                continue  # the server would take the full-fetch path
            rec = scatter_candidates(cand_rows, cand_idx, D, Sy, Sx)
            got = format_preds(rec, obj_thresh=float(t), iou_thresh=0.5)
            want = format_preds(pred, obj_thresh=float(t), iou_thresh=0.5)
            np.testing.assert_array_equal(got, want, err_msg=f"{seed}/{t}")


def test_serve_sigterm_graceful_shutdown():
    """`yogo serve` + SIGTERM (the supervisor/pod grace signal): the
    server stops accepting, answers the in-flight request, prints the
    drain line, and exits 0 - the serving side of the framework's
    preemption story (the trainer's is tests/test_train.py)."""
    import os
    import signal
    import socket
    import subprocess
    import sys as _sys
    import time

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.Popen(
        [_sys.executable, "-m", "yogo_tpu", "serve", str(CKPT_PATH),
         "--device", "cpu", "--port", str(port), "--batch-size", "2"],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=dict(os.environ, PYTHONPATH=f"{repo}:{os.environ.get('PYTHONPATH', '')}"),
    )
    try:
        deadline = time.monotonic() + 120
        while True:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5
                ):
                    break
            except Exception:
                if time.monotonic() > deadline:
                    proc.kill()
                    pytest.fail("server never came up")
                time.sleep(0.5)

        img = np.full((96, 128), 127, np.uint8)
        result = {}

        def post():
            result["resp"] = _post(
                port, img[None].tobytes(),
                content_type="application/octet-stream",
            )

        th = threading.Thread(target=post)
        th.start()
        time.sleep(0.05)  # request likely in flight when the signal lands
        proc.send_signal(signal.SIGTERM)
        th.join(timeout=60)
        out, err = proc.communicate(timeout=60)
    except Exception:
        proc.kill()
        raise
    assert proc.returncode == 0, err[-2000:]
    assert "SIGTERM" in err and "shutting down" in err, err[-2000:]
    assert result["resp"][0] == 200  # the in-flight request was answered


def test_batcher_pipelines_dispatch_ahead_of_fetch():
    """The batcher must DISPATCH batch N+1 while batch N's fetch is still
    blocked (that overlap is the point of the two-thread pipeline), bounded
    by pipeline_depth, and still resolve every future with its own slot's
    result in FIFO order."""
    import time

    from yogo_tpu.serve import _Batcher

    dispatched = []
    fetch_gate = threading.Event()
    dispatch_seen = threading.Condition()

    def fwd_dispatch(imgs):
        with dispatch_seen:
            dispatched.append(imgs.copy())
            dispatch_seen.notify_all()
        return len(dispatched) - 1  # handle = dispatch ordinal

    def fwd_fetch(handle):
        fetch_gate.wait(timeout=30)
        imgs = dispatched[handle]
        b = imgs.shape[0]
        rows = imgs[:, 0, :1, :1].astype(np.float32).reshape(b, 1, 1)
        idx = np.zeros((b, 1), np.int64)
        return rows, idx, f"full-{handle}"

    batcher = _Batcher(fwd_dispatch, fwd_fetch, batch_size=2,
                       img_chw=(1, 1, 1), linger_s=0.0, pipeline_depth=2)
    try:
        futs = [
            batcher.submit(np.full((1, 1, 1), v, np.uint8))
            for v in (10, 11, 20, 21, 30, 31)
        ]
        # fetch is gated shut, yet dispatches must keep flowing until the
        # pipeline is full: depth=2 in the queue + 1 the fetcher already
        # popped (blocked inside fwd_fetch) = 3 dispatched batches
        with dispatch_seen:
            deadline = time.monotonic() + 30
            while len(dispatched) < 3:
                if not dispatch_seen.wait(deadline - time.monotonic()):
                    break
        assert len(dispatched) == 3, f"pipelining stalled: {len(dispatched)}"
        assert not any(f.done() for f in futs)  # nothing fetched yet

        fetch_gate.set()
        results = [f.result(timeout=30) for f in futs]
        # every request got ITS image's row back (slot mapping survived)
        for want, (rows, _idx, full, slot) in zip((10, 11, 20, 21, 30, 31),
                                                  results):
            assert int(rows[0, 0]) == want
        # FIFO: the i-th pair rode the i-th dispatch
        assert [r[2] for r in results] == [
            "full-0", "full-0", "full-1", "full-1", "full-2", "full-2"
        ]
    finally:
        fetch_gate.set()
        batcher.shutdown()


def test_batcher_fetch_error_reaches_all_waiters():
    """A device error surfacing at FETCH time (the common case under
    pipelining - dispatch is async so errors materialize on the fetch)
    must fail every future of that batch and leave the batcher alive for
    the next one."""
    from yogo_tpu.serve import _Batcher

    fail_next = [True]

    def fwd_dispatch(imgs):
        return imgs.copy()

    def fwd_fetch(imgs):
        if fail_next[0]:
            fail_next[0] = False
            raise RuntimeError("worker fault")
        b = imgs.shape[0]
        return (imgs[:, 0, :1, :1].astype(np.float32).reshape(b, 1, 1),
                np.zeros((b, 1), np.int64), "full")

    batcher = _Batcher(fwd_dispatch, fwd_fetch, batch_size=2,
                       img_chw=(1, 1, 1), linger_s=0.0, pipeline_depth=2)
    try:
        f1 = batcher.submit(np.zeros((1, 1, 1), np.uint8))
        f2 = batcher.submit(np.zeros((1, 1, 1), np.uint8))
        errs = 0
        for f in (f1, f2):
            try:
                f.result(timeout=30)
            except RuntimeError:
                errs += 1
        assert errs >= 1  # the failing dispatch's waiters all saw the error
        # the batcher survives and serves the next batch
        f3 = batcher.submit(np.full((1, 1, 1), 7, np.uint8))
        rows, _idx, _full, _slot = f3.result(timeout=30)
        assert int(rows[0, 0]) == 7
    finally:
        batcher.shutdown()


def test_batcher_sheds_load_at_max_queue():
    """With max_queue set, submit() raises Overloaded once that many
    images are WAITING (dispatched-but-unfetched batches don't count),
    the shed is visible in stats(), and the batcher accepts again after
    the backlog drains."""
    import time

    from yogo_tpu.serve import Overloaded, _Batcher

    fetch_gate = threading.Event()

    def fwd_dispatch(imgs):
        return imgs.copy()

    def fwd_fetch(imgs):
        fetch_gate.wait(timeout=30)
        b = imgs.shape[0]
        return (imgs[:, 0, :1, :1].astype(np.float32).reshape(b, 1, 1),
                np.zeros((b, 1), np.int64), "full")

    batcher = _Batcher(fwd_dispatch, fwd_fetch, batch_size=2,
                       img_chw=(1, 1, 1), linger_s=0.0, pipeline_depth=1,
                       max_queue=3)
    try:
        futs = []
        shed = 0
        # the pipeline absorbs 2 batches (1 in-flight + 1 queued dispatch,
        # 2 imgs each) before the waiting queue can even fill; keep
        # submitting until 3 are waiting, then the next must shed
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            try:
                futs.append(batcher.submit(np.zeros((1, 1, 1), np.uint8)))
            except Overloaded:
                shed += 1
                break
        assert shed == 1, "never shed despite a gated fetch + max_queue=3"
        stats = batcher.stats()
        assert stats["shed_frames"] == 1
        # the queue was at max_queue at shed time; the collector may have
        # started popping a batch since, but never past the cap
        assert stats["queue_depth"] <= 3

        fetch_gate.set()  # drain
        for f in futs:
            f.result(timeout=30)
        f = batcher.submit(np.full((1, 1, 1), 9, np.uint8))  # accepts again
        rows, _idx, _full, _slot = f.result(timeout=30)
        assert int(rows[0, 0]) == 9
    finally:
        fetch_gate.set()
        batcher.shutdown()


def test_serve_overload_returns_503_with_retry_after(server):
    """The HTTP mapping of Overloaded: 503, a Retry-After header, and a
    JSON error body; the server keeps serving afterwards."""
    from yogo_tpu.serve import Overloaded

    port = server.server_address[1]
    info = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/healthz", timeout=30).read())
    h, w = info["input_hw"]
    assert info["max_queue"] == 8 * info["batch_size"]  # default shed point
    body = np.zeros((1, h, w), np.uint8).tobytes()

    orig_submit = server.yogo_batcher.submit_many
    server.yogo_batcher.submit_many = lambda imgs: (_ for _ in ()).throw(
        Overloaded("8 images already queued"))
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body, method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 503
        assert ei.value.headers["Retry-After"] == "1"
        assert "overloaded" in json.loads(ei.value.read())["error"]
    finally:
        server.yogo_batcher.submit_many = orig_submit

    status, _ = _post(port, body, content_type="application/octet-stream")
    assert status == 200  # back to normal service


def test_metrics_prometheus_format(server):
    """GET /metrics?format=prometheus returns the exposition format with
    one yogo_-prefixed sample per JSON counter, numerically equal."""
    port = server.server_address[1]
    stats = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/metrics", timeout=30).read())
    resp = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/metrics?format=prometheus", timeout=30)
    assert resp.headers["Content-Type"].startswith("text/plain")
    text = resp.read().decode()
    samples = {}
    for line in text.strip().splitlines():
        if not line.startswith("#"):
            name, val = line.split()
            samples[name] = float(val)
    assert set(samples) == {f"yogo_{k}" for k in stats}
    for k, v in stats.items():
        assert samples[f"yogo_{k}"] == pytest.approx(float(v))
    assert "# TYPE yogo_queue_depth gauge" in text
    assert "# TYPE yogo_images counter" in text


def test_unknown_query_param_is_400(server, goldens_dir):
    """A typo'd override (obj_tresh=0.9) must fail loudly, not silently
    serve the default threshold."""
    port = server.server_address[1]
    img = gen_test_images(goldens_dir, n=1, seed=5)[0]
    status, resp = _post(port, _png_bytes(img), path="/predict?obj_tresh=0.9")
    assert status == 400
    assert "obj_tresh" in resp["error"] and "obj_thresh" in resp["error"]


def test_frame_cap_over_queue_cap_is_a_build_error():
    """A batch request sheds whole, so --max-frames-per-request above
    --max-queue means a full-size batch request could NEVER be accepted:
    reject the configuration at startup, not request-by-request."""
    with pytest.raises(ValueError, match="max-queue"):
        build_server(CKPT_PATH, port=0, batch_size=2, max_queue=4,
                     max_frames_per_request=8)
    # ...but a small user-set --max-queue with the DEFAULT frame cap must
    # clamp, not refuse to start (the default is derived, not chosen)
    srv = build_server(CKPT_PATH, port=0, batch_size=8, max_queue=16)
    try:
        assert srv.yogo_info["max_frames_per_request"] == 16
    finally:
        srv.yogo_batcher.shutdown()
        srv.server_close()


def test_serve_rejects_duplicate_class_names():
    with pytest.raises(ValueError, match="unique"):
        build_server(CKPT_PATH, port=0, class_names=["cell", "cell"])


def test_serve_normalized_checkpoint_parity(tmp_path):
    """A normalize_images=True checkpoint must be served with the same
    /255 scaling the batch pipeline applies in its dataset - serving raw
    uint8 to such a model returns garbage with HTTP 200."""
    import jax
    import jax.numpy as jnp

    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.utils.checkpoint import save_checkpoint

    model = YOGO.create(
        (48, 64), 0.08, 0.1, 2, model_version="quarter_filters",
        normalize_images=True,
    )
    v = model.init(jax.random.key(4))
    ck = tmp_path / "norm.ckpt"
    save_checkpoint(ck, model, v, {}, classes=["a", "b"])

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    want_pred = np.asarray(
        model.apply(
            v, jnp.asarray(img[None, None], jnp.float32) / 255.0,
            inference=True,
        ),
        np.float32,
    )[0]
    want = format_preds(want_pred, obj_thresh=0.4, iou_thresh=0.5)

    srv = build_server(ck, port=0, batch_size=2, linger_ms=1.0)
    assert srv.yogo_info["normalize_images"] is True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        status, resp = _post(
            port, _png_bytes(img), path="/predict?obj_thresh=0.4"
        )
        assert status == 200
        dets = resp["detections"]
        assert len(dets) == len(want)
        got = sorted(
            (d["class_idx"], round(d["objectness"], 4)) for d in dets
        )
        exp = sorted(
            (int(np.argmax(r[5:])), round(float(r[4]), 4)) for r in want
        )
        assert got == exp
    finally:
        srv.shutdown()
        srv.yogo_batcher.shutdown()
        srv.server_close()
        t.join(timeout=5)


def test_serve_data_parallel_matches_single_device(server, goldens_dir):
    """--data-parallel serving shards micro-batches over the 8-virtual-
    device mesh and must reproduce the single-device server's responses."""
    srv = build_server(
        CKPT_PATH, port=0, batch_size=3,  # rounds up to 8 on the mesh
        linger_ms=1.0, data_parallel=True,
    )
    assert srv.yogo_info["data_parallel_devices"] == 8
    assert srv.yogo_info["batch_size"] == 8
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port_dp = srv.server_address[1]
        port_1 = server.server_address[1]
        imgs = gen_test_images(goldens_dir, n=3, seed=5)
        for img in imgs:
            s1, single = _post(port_1, _png_bytes(img))
            s2, multi = _post(port_dp, _png_bytes(img))
            assert s1 == s2 == 200
            assert len(single["detections"]) == len(multi["detections"])
            assert single["counts"] == multi["counts"]
            for a, b in zip(single["detections"], multi["detections"]):
                assert a["class_idx"] == b["class_idx"]
                np.testing.assert_allclose(
                    a["bbox_cxcywh"], b["bbox_cxcywh"], rtol=1e-5, atol=1e-6
                )
    finally:
        srv.shutdown()
        srv.yogo_batcher.shutdown()
        srv.server_close()
        t.join(timeout=5)


def test_serve_spatial_parallel_matches_single_device(server, goldens_dir):
    """--spatial-parallel serving row-shards each request's image over the
    space axis (XLA halo exchanges) and must reproduce the single-device
    server's responses; spatial-only uses exactly N devices."""
    srv = build_server(
        CKPT_PATH, port=0, batch_size=2, linger_ms=1.0, spatial_parallel=4,
    )
    assert srv.yogo_info["spatial_parallel"] == 4
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port_sp = srv.server_address[1]
        port_1 = server.server_address[1]
        imgs = gen_test_images(goldens_dir, n=2, seed=5)
        for img in imgs:
            s1, single = _post(port_1, _png_bytes(img))
            s2, spatial = _post(port_sp, _png_bytes(img))
            assert s1 == s2 == 200
            assert single["counts"] == spatial["counts"]
            for a, b in zip(single["detections"], spatial["detections"]):
                assert a["class_idx"] == b["class_idx"]
                np.testing.assert_allclose(
                    a["bbox_cxcywh"], b["bbox_cxcywh"], rtol=1e-4, atol=1e-5
                )
    finally:
        srv.shutdown()
        srv.yogo_batcher.shutdown()
        srv.server_close()
        t.join(timeout=5)

    # a non-divisible height is rejected at startup, not per-request
    with pytest.raises(ValueError, match="divisible"):
        build_server(CKPT_PATH, port=0, spatial_parallel=5)


def test_serve_quantize_all_skipped(tmp_path, server):
    """--quantize on the (narrow) golden ckpt serves the bf16-folded stack
    without needing calibration images; detections must MATCH the float
    server's (the stack is BN-folded bf16 - only fold/cast noise allowed),
    not merely return 200."""
    imgs = gen_test_images(tmp_path / "imgs", n=2, seed=6)
    srv = build_server(
        CKPT_PATH, port=0, batch_size=2, quantize=True, linger_ms=1.0
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port_q = srv.server_address[1]
        port_f = server.server_address[1]
        assert srv.yogo_info["quantize"] is True
        n_dets = 0
        for img in imgs:
            sq, q = _post(port_q, _png_bytes(img))
            sf, f = _post(port_f, _png_bytes(img))
            assert sq == sf == 200
            assert q["counts"] == f["counts"]
            assert len(q["detections"]) == len(f["detections"])
            for a, b in zip(q["detections"], f["detections"]):
                assert a["class_idx"] == b["class_idx"]
                assert abs(a["objectness"] - b["objectness"]) < 0.05
                np.testing.assert_allclose(
                    a["bbox_cxcywh"], b["bbox_cxcywh"], rtol=1e-2, atol=1e-3
                )
            n_dets += len(f["detections"])
        assert n_dets > 0
    finally:
        srv.shutdown()
        srv.yogo_batcher.shutdown()
        srv.server_close()
        t.join(timeout=5)


def test_serve_quantize_wide_model_requires_calibration(tmp_path):
    """A wide (int8-bearing) arch refuses --quantize without
    --calibration-images, and serves with them."""
    import jax

    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.utils.checkpoint import save_checkpoint

    model = YOGO.create((96, 128), 0.08, 0.1, 2, model_version="base_model")
    v = model.init(jax.random.key(0))
    ck = tmp_path / "wide.ckpt"
    save_checkpoint(ck, model, v, {}, classes=["a", "b"])

    with pytest.raises(ValueError, match="calibration-images"):
        build_server(ck, port=0, batch_size=2, quantize=True)

    gen_test_images(tmp_path / "calib", n=2, seed=7)
    srv = build_server(
        ck, port=0, batch_size=2, quantize=True,
        calibration_images=tmp_path / "calib", linger_ms=1.0,
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        img = gen_test_images(tmp_path / "calib", n=1, seed=7)[0]
        status, resp = _post(port, _png_bytes(img))
        assert status == 200 and "detections" in resp
    finally:
        srv.shutdown()
        srv.yogo_batcher.shutdown()
        srv.server_close()
        t.join(timeout=5)
