import jax
import numpy as np

from yogo_tpu.parallel.distributed import initialize_multihost, process_shard
from yogo_tpu.parallel.mesh import (
    get_mesh,
    pad_batch_to_multiple,
    prefetch_to_device,
    shard_batch,
)
from yogo_tpu.utils.wandb_helpers import choose_device, get_free_port


def batches(n, b=3):
    for i in range(n):
        yield (
            np.full((b, 1, 8, 8), i, np.uint8),
            np.zeros((b, 6, 2, 2), np.float32),
            np.ones(b, np.float32),
        )


def test_prefetch_to_device_yields_all_padded():
    mesh = get_mesh()
    out = list(prefetch_to_device(batches(5, b=3), mesh))
    assert len(out) == 5
    for i, (imgs, labels, mask) in enumerate(out):
        assert imgs.shape[0] % mesh.size == 0
        assert int(np.asarray(mask).sum()) == 3  # padding masked out
        assert np.asarray(imgs)[0, 0, 0, 0] == i  # order preserved


def test_prefetch_empty_iterator():
    mesh = get_mesh()
    assert list(prefetch_to_device(iter([]), mesh)) == []


def test_pad_batch_to_multiple():
    imgs = np.zeros((5, 1, 4, 4), np.uint8)
    labels = np.zeros((5, 6, 2, 2), np.float32)
    mask = np.ones(5, np.float32)
    i2, l2, m2 = pad_batch_to_multiple(imgs, labels, mask, 8)
    assert i2.shape[0] == 8 and m2.sum() == 5


def test_shard_batch_places_on_mesh():
    mesh = get_mesh()
    (arr,) = shard_batch(mesh, np.zeros((16, 3), np.float32))
    assert arr.shape == (16, 3)
    assert len(arr.sharding.device_set) == mesh.size


def test_initialize_multihost_noop_single_host(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_multihost() is False
    assert process_shard() == (0, 1)


def test_choose_device_and_free_port():
    d = choose_device()
    assert d.platform in ("cpu", "tpu", "gpu")
    p = get_free_port()
    assert 0 < p < 65536


def test_spmd_loss_invariant_to_device_count():
    """The same batch gives the same loss whether computed on 1 device or
    sharded over 8 - validates the masked normalization under GSPMD."""
    import jax.numpy as jnp

    from tests.data_fixtures import CLASSES
    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.parallel.mesh import data_sharded, replicated
    from yogo_tpu.train import make_eval_step

    model = YOGO.create((48, 64), 0.1, 0.12, len(CLASSES),
                        model_version="quarter_filters")
    v = model.init(jax.random.key(0))
    eval_fn = make_eval_step(model, dict(no_obj_weight=0.5, iou_weight=5.0,
                                         classify_weight=1.0,
                                         label_smoothing=0.01))
    rng = np.random.default_rng(0)
    Sx, Sy = model.grid
    imgs = rng.integers(0, 255, (8, 1, 48, 64)).astype(np.uint8)
    labels = np.zeros((8, 6, Sy, Sx), np.float32)
    labels[:, :, 2, 3] = [1, 0.4, 0.4, 0.6, 0.6, 1]
    mask = np.ones(8, np.float32)

    losses = {}
    for ndev in (1, 8):
        mesh = get_mesh(jax.devices()[:ndev])
        rep, dat, msk = replicated(mesh), data_sharded(mesh), data_sharded(mesh, 1)
        step = jax.jit(eval_fn, in_shardings=(rep, rep, dat, dat, msk),
                       out_shardings=(rep, rep))
        di, dl, dm = shard_batch(mesh, imgs, labels, mask)
        loss, _ = step(v["params"], v.get("batch_stats", {}), di, dl, dm)
        losses[ndev] = float(loss)
    np.testing.assert_allclose(losses[1], losses[8], rtol=1e-5)
