"""ServeClient (yogo_tpu/serve_client.py) against a live server: chunking
to max_frames_per_request, input-order preservation, threshold overrides,
input validation, and 503 backoff semantics."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from tests.test_golden_detections import gen_test_images
from tests.test_serve import CKPT_PATH, _post
from yogo_tpu.serve import build_server
from yogo_tpu.serve_client import ServeClient, ServerOverloaded


@pytest.fixture(scope="module")
def server():
    srv = build_server(CKPT_PATH, port=0, batch_size=4, linger_ms=20.0,
                       max_frames_per_request=16)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.yogo_batcher.shutdown()
    srv.server_close()
    t.join(timeout=5)


@pytest.fixture(scope="module")
def client(server):
    c = ServeClient("127.0.0.1", server.server_address[1])
    yield c
    c.close()


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    d = tmp_path_factory.mktemp("client_imgs")
    return [im[None] for im in gen_test_images(d, n=4, seed=5)]


def test_discovery_and_single_predict_parity(server, client, frames):
    """The client discovers the wire contract from /healthz, and
    predict() returns exactly what a hand-rolled raw POST returns."""
    assert client.img_chw == (1, *server.yogo_info["input_hw"])
    assert client.max_frames == 16
    port = server.server_address[1]
    for f in frames:
        _, want = _post(port, f.tobytes(),
                        content_type="application/octet-stream")
        assert client.predict(f) == want


def test_predict_many_chunks_and_preserves_order(client, frames):
    """35 frames through a max_frames=16 server: 3 batch requests
    (16+16+3), results in input order - each frame's result equals its
    single-predict result."""
    singles = [client.predict(f) for f in frames]
    seq = [frames[i % 4] for i in range(35)]
    results = client.predict_many(np.stack(seq))
    assert len(results) == 35
    for i, r in enumerate(results):
        assert r == singles[i % 4]


def test_threshold_kwargs(client, frames):
    loose = client.predict(frames[0], obj_thresh=0.1)
    strict = client.predict(frames[0], obj_thresh=0.99)
    assert len(strict["detections"]) <= len(loose["detections"])
    with pytest.raises(RuntimeError, match="unknown query"):
        client.predict(frames[0], obj_tresh=0.5)  # typo'd name -> 400


def test_input_validation_is_local(client):
    """Wrong shapes/dtypes are rejected before any upload."""
    with pytest.raises(ValueError, match="frames must be"):
        client.predict(np.zeros((1, 8, 8), np.uint8))
    with pytest.raises(ValueError, match="frames must be"):
        client.predict_many(np.zeros((2, 3, 4), np.uint8))
    # float frames would unsafe-cast to all-black images: loud error
    with pytest.raises(ValueError, match="uint8"):
        client.predict_many(np.zeros((1, *client.img_chw), np.float32))
    # predict() with a 4-D batch would silently drop N-1 results
    with pytest.raises(ValueError, match="predict_many"):
        client.predict(np.zeros((2, *client.img_chw), np.uint8))


def test_retry_after_http_date_does_not_crash(client, frames, monkeypatch):
    """A proxy may rewrite Retry-After to the RFC HTTP-date form; the
    backoff must fall back to its default, not crash on float()."""
    real = ServeClient._request
    state = {"n": 0}

    def proxy_shed(self, method, path, body, ctype):
        if method == "POST" and state["n"] < 1:
            state["n"] += 1
            return (503, {"Retry-After": "Wed, 21 Oct 2026 07:28:00 GMT"},
                    json.dumps({"error": "overloaded: proxy"}).encode())
        return real(self, method, path, body, ctype)

    monkeypatch.setattr(ServeClient, "_request", proxy_shed)
    assert client.predict(frames[0]) == client.predict(frames[0])
    assert state["n"] == 1


def test_503_backoff_then_success(client, frames, monkeypatch):
    """A shed (503 + Retry-After) is retried with the server's hint; a
    persistent shed surfaces as ServerOverloaded after max_retries."""
    real = ServeClient._request
    sheds = {"n": 0}

    def flaky(self, method, path, body, ctype):
        if method == "POST" and sheds["n"] < 2:
            sheds["n"] += 1
            return (503, {"Retry-After": "0"},
                    json.dumps({"error": "overloaded: test"}).encode())
        return real(self, method, path, body, ctype)

    monkeypatch.setattr(ServeClient, "_request", flaky)
    want = client.predict(frames[0])
    sheds["n"] = 0
    assert client.predict(frames[0]) == want  # 2 sheds then success
    assert sheds["n"] == 2

    def always_shed(self, method, path, body, ctype):
        return (503, {"Retry-After": "0"},
                json.dumps({"error": "overloaded: always"}).encode())

    monkeypatch.setattr(ServeClient, "_request", always_shed)
    with pytest.raises(ServerOverloaded, match="always"):
        client.predict(frames[0])


def test_reconnects_after_server_side_close(server, client, frames):
    """A dropped keep-alive socket (idle reset) is transparently
    reconnected once rather than failing the request."""
    import socket

    client._connection().connect()  # ensure a live socket
    # simulate the server/LB dropping the keep-alive: FIN both directions
    # (a locally-closed fd would raise EBADF, which is NOT what a dropped
    # remote looks like and is deliberately not retried)
    client._conn.sock.shutdown(socket.SHUT_RDWR)
    assert client.predict(frames[0]) == client.predict(frames[0])


def test_serve_from_pth_checkpoint(tmp_path, frames):
    """A reference-format .pth checkpoint serves identically to the native
    .ckpt it was exported from - the first thing a reference user migrating
    their trained model would do."""
    from yogo_tpu.utils.checkpoint import load_any
    from yogo_tpu.utils.torch_bridge import save_pth

    model, variables, cfg = load_any(CKPT_PATH)
    pth = tmp_path / "exported.pth"
    save_pth(pth, model, variables, classes=["cell", "parasite"],
             model_name=model.defn.name)
    srv = build_server(pth, port=0, batch_size=2, linger_ms=1.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with ServeClient("127.0.0.1", srv.server_address[1]) as c:
            assert c.info["classes"] == ["cell", "parasite"]
            got = c.predict(frames[0])
    finally:
        srv.shutdown()
        srv.yogo_batcher.shutdown()
        srv.server_close()
        t.join(timeout=5)

    srv2 = build_server(CKPT_PATH, port=0, batch_size=2, linger_ms=1.0)
    t2 = threading.Thread(target=srv2.serve_forever, daemon=True)
    t2.start()
    try:
        with ServeClient("127.0.0.1", srv2.server_address[1]) as c:
            want = c.predict(frames[0])
    finally:
        srv2.shutdown()
        srv2.yogo_batcher.shutdown()
        srv2.server_close()
        t2.join(timeout=5)
    assert got == want


def test_gzip_negotiation(server, client, frames):
    """A client advertising Accept-Encoding: gzip gets a compressed body
    (smaller on the wire) that decodes to exactly the plain response;
    clients that don't ask still get identity."""
    import gzip as _gzip
    import http.client as hc

    port = server.server_address[1]
    body = np.concatenate([f for f in frames[0:1]] * 8).tobytes()

    def post(hdrs):
        conn = hc.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/predict?obj_thresh=0.1", body=body,
                     headers={"Content-Type": "application/octet-stream",
                              **hdrs})
        r = conn.getresponse()
        payload, enc = r.read(), r.headers.get("Content-Encoding")
        conn.close()
        return payload, enc

    plain, enc0 = post({})
    assert enc0 is None
    zipped, enc1 = post({"Accept-Encoding": "gzip"})
    assert enc1 == "gzip" and len(zipped) < len(plain)
    assert _gzip.decompress(zipped) == plain
    # the ServeClient transparently negotiates + decompresses (its parity
    # tests vs urllib already pin content equality; this pins the wiring)
    got = client.predict_many(np.stack([frames[0]] * 8), obj_thresh=0.1)
    assert json.dumps({"results": got}).encode() == plain


def test_hot_reload_swaps_weights_without_recompile(tmp_path, frames):
    """reload_checkpoint: new weights serve on the next dispatch with the
    SAME compiled program (weights are a jit argument - the TPU serving
    pattern); incompatible checkpoints are rejected and the old weights
    keep serving."""
    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.utils.checkpoint import load_any, save_checkpoint

    model, variables, _ = load_any(CKPT_PATH)
    ckpt = tmp_path / "serving.ckpt"
    save_checkpoint(ckpt, model, variables, classes=["cell", "parasite"])

    srv = build_server(ckpt, port=0, batch_size=2, linger_ms=1.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with ServeClient("127.0.0.1", srv.server_address[1]) as c:
            before = c.predict(frames[0])

            # overwrite the ckpt with perturbed weights, SIGHUP-equivalent
            bumped = __import__("jax").tree.map(
                lambda a: a * 1.1 if hasattr(a, "dtype") else a, variables
            )
            save_checkpoint(ckpt, model, bumped,
                            classes=["cell", "parasite"])
            n_compiles = srv.yogo_jfwd._cache_size()
            out = srv.reload_checkpoint()
            assert out["ok"], out
            after = c.predict(frames[0])
            assert after != before  # new weights actually serve
            assert srv.yogo_jfwd._cache_size() == n_compiles  # no recompile
            assert c.metrics() is not None  # server healthy

            # incompatible arch: rejected, old (bumped) weights keep serving
            other = YOGO.create(model.img_size, 0.04, 0.05, num_classes=5)
            save_checkpoint(ckpt, other,
                            other.init(__import__("jax").random.key(0)),
                            classes=[f"c{i}" for i in range(5)])
            out = srv.reload_checkpoint()
            assert not out["ok"] and "incompatible" in out["error"]
            assert c.predict(frames[0]) == after
            info = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{srv.server_address[1]}/healthz",
                timeout=30).read())
            assert info["reloads"] == 1
    finally:
        srv.shutdown()
        srv.yogo_batcher.shutdown()
        srv.server_close()
        t.join(timeout=5)


def test_hot_reload_quantized_server(tmp_path, frames):
    """Reload under --quantize rebuilds the quant plan from the new
    variables (the jit argument is the PLAN, not raw variables) - same
    avals, no recompile, new predictions."""
    import jax

    from yogo_tpu.utils.checkpoint import load_any, save_checkpoint

    model, variables, _ = load_any(CKPT_PATH)
    ckpt = tmp_path / "serving_q.ckpt"
    save_checkpoint(ckpt, model, variables, classes=["cell", "parasite"])
    srv = build_server(ckpt, port=0, batch_size=2, linger_ms=1.0,
                       quantize=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with ServeClient("127.0.0.1", srv.server_address[1]) as c:
            before = c.predict(frames[0])
            bumped = jax.tree.map(
                lambda a: a * 1.1 if hasattr(a, "dtype") else a, variables
            )
            save_checkpoint(ckpt, model, bumped,
                            classes=["cell", "parasite"])
            n_compiles = srv.yogo_jfwd._cache_size()
            out = srv.reload_checkpoint()
            assert out["ok"], out
            assert srv.yogo_jfwd._cache_size() == n_compiles
            assert c.predict(frames[0]) != before
    finally:
        srv.shutdown()
        srv.yogo_batcher.shutdown()
        srv.server_close()
        t.join(timeout=5)


def test_metrics_passthrough(server, client):
    port = server.server_address[1]
    want = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/metrics", timeout=30).read())
    got = client.metrics()
    assert set(got) == set(want)
