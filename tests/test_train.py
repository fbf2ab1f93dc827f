"""Training-stack tests: optimizer recipe, train step over the virtual
8-device mesh, checkpointing, full tiny Trainer run (the reference has NO
training-loop tests - this improves on its test strategy per SURVEY §4)."""

import json
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.data_fixtures import CLASSES, make_pair_dirs, write_defn
from yogo_tpu.models.yogo import YOGO
from yogo_tpu.parallel.mesh import get_mesh
from yogo_tpu.train import (
    TrainState,
    Trainer,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from yogo_tpu.utils.checkpoint import (
    load_any,
    load_checkpoint,
    save_checkpoint,
)


def tiny_model():
    return YOGO.create((48, 64), 0.08, 0.1, len(CLASSES),
                       model_version="quarter_filters")


def make_state(model, tx, seed=0):
    v = model.init(jax.random.key(seed))
    return TrainState(
        params=v["params"],
        batch_stats=v.get("batch_stats", {}),
        opt_state=tx.init(v["params"]),
        step=jnp.asarray(0, jnp.int32),
    )


def fake_batch(model, b=8, n_obj=2, seed=0):
    rng = np.random.default_rng(seed)
    h, w = model.img_size
    imgs = rng.integers(0, 255, (b, 1, h, w)).astype(np.uint8)
    Sx, Sy = model.grid
    labels = np.zeros((b, 6, Sy, Sx), np.float32)
    for i in range(b):
        for _ in range(n_obj):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            bw, bh = rng.uniform(0.1, 0.2, 2)
            ii = int((2 * cx) * Sx // 2)
            jj = int((2 * cy) * Sy // 2)
            labels[i, :, jj, ii] = [
                1, cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2,
                rng.integers(0, 3),
            ]
    mask = np.ones(b, np.float32)
    return imgs, labels, mask


def test_cosine_schedule_matches_torch_semantics():
    """optax cosine_decay(alpha=1/decay) == torch CosineAnnealingLR
    (eta_min = lr/decay, T_max = total steps), stepped per batch. The
    host-side closed-form twin returned by make_optimizer (used for
    logging without a device dispatch) must match the optax schedule the
    optimizer actually follows."""
    import optax

    lr, decay, total = 3e-4, 10.0, 100
    _, sched = make_optimizer(lr, 5e-2, decay, total)
    opt_sched = optax.cosine_decay_schedule(lr, total, alpha=1.0 / decay)
    eta_min = lr / decay
    for t in [0, 1, 50, 99, 100]:
        want = eta_min + (lr - eta_min) * (1 + np.cos(np.pi * t / total)) / 2
        np.testing.assert_allclose(sched(t), want, rtol=1e-6)
        np.testing.assert_allclose(float(opt_sched(t)), want, rtol=1e-6)
        np.testing.assert_allclose(sched(t), float(opt_sched(t)), rtol=1e-6)


def test_grad_clip_elementwise():
    """The +-clip_value elementwise clamp must actually shape what AdamW
    sees. Single-step symmetric checks are vacuous (Adam's first update is
    ~lr*sign(g) for ANY magnitude), so feed a magnitude that varies across
    steps: with the clamp, grads [100, then 1] reach Adam as [1, 1] - the
    second-step update must match a clean AdamW fed [1, 1], and differ
    from an unclipped chain fed the raw [100, 1]."""
    import optax

    def two_steps(tx, g1, g2):
        params = {"w": jnp.zeros(2)}
        st = tx.init(params)
        u1, st = tx.update({"w": jnp.asarray(g1)}, st, params)
        params = optax.apply_updates(params, u1)
        u2, _ = tx.update({"w": jnp.asarray(g2)}, st, params)
        return np.asarray(u2["w"])

    tx_clip, _ = make_optimizer(1e-2, 0.0, 10.0, 100, clip_value=1.0)
    # same cosine schedule as make_optimizer, just without the clip stage
    sched = optax.cosine_decay_schedule(1e-2, 100, alpha=0.1)
    tx_plain = optax.adamw(learning_rate=sched, weight_decay=0.0)

    ours = two_steps(tx_clip, [100.0, -100.0], [1.0, -1.0])
    clipped_equiv = two_steps(tx_plain, [1.0, -1.0], [1.0, -1.0])
    unclipped = two_steps(tx_plain, [100.0, -100.0], [1.0, -1.0])

    np.testing.assert_allclose(ours, clipped_equiv, rtol=1e-5)
    assert not np.allclose(ours, unclipped, rtol=1e-3)


def test_train_step_runs_and_descends_on_mesh():
    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    state = make_state(model, tx)
    step = make_train_step(model, tx, dict(no_obj_weight=0.5, iou_weight=5.0,
                                           classify_weight=1.0,
                                           label_smoothing=0.01))
    from yogo_tpu.parallel.mesh import data_sharded, replicated, shard_batch

    mesh = get_mesh()
    rep, dat, msk = replicated(mesh), data_sharded(mesh), data_sharded(mesh, 1)
    jstep = jax.jit(step, in_shardings=(rep, dat, dat, msk, rep),
                    out_shardings=(rep, rep, rep))

    imgs, labels, mask = fake_batch(model)
    rng = jax.random.key(0)
    losses = []
    for i in range(6):
        di, dl, dm = shard_batch(mesh, imgs, labels, mask)
        state, loss, comps = jstep(state, di, dl, dm, rng)
        losses.append(float(loss))
    assert int(state.step) == 6
    assert losses[-1] < losses[0]  # overfitting a fixed batch must descend
    assert all(np.isfinite(x) for x in losses)


@pytest.mark.parametrize("remat", ["blocks", "full"])
def test_train_step_remat_matches_none(remat):
    """remat only changes WHEN activations are (re)computed, never the math:
    loss and the updated params must match the non-remat step exactly
    (same dtype path; dropout rng is replayed deterministically)."""
    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    loss_kwargs = dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
                       label_smoothing=0.01)
    imgs, labels, mask = fake_batch(model)
    args = (jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(mask),
            jax.random.key(7))

    base_step = jax.jit(make_train_step(model, tx, loss_kwargs))
    re_step = jax.jit(make_train_step(model, tx, loss_kwargs, remat=remat))
    s1, loss1, _ = base_step(make_state(model, tx), *args)
    s2, loss2, _ = re_step(make_state(model, tx), *args)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        s1.params, s2.params,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        s1.batch_stats, s2.batch_stats,
    )


def test_grad_accumulation_exactly_matches_big_batch():
    """accumulate=2 over stacked micro-batches must produce EXACTLY the
    big-batch loss, gradient, and parameter update under frozen BN - for a
    RAGGED mask pattern too (the count-weighted accumulation divides the
    summed micro losses/grads by the total real-image count, which is the
    big batch's normalizer). Dropout-free test arch: stochastic dropout
    masks are drawn per forward and can never agree between one big forward
    and two micro forwards."""
    from yogo_tpu.models.defns import MODELS, ConvSpec, ModelDefn, register_model

    def test_nodrop(num_classes, rgb_input=False):
        return ModelDefn(
            name="test_nodrop",
            blocks=(
                ConvSpec(8, stride=2, bias=False, bn=True),
                ConvSpec(16, stride=2),
                ConvSpec(5 + num_classes, kernel=1, padding=0, act=None),
            ),
        )

    register_model(test_nodrop)
    try:
        model = YOGO.create((48, 64), 0.08, 0.1, len(CLASSES),
                            model_version="test_nodrop")
        tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
        imgs, labels, _ = fake_batch(model, b=8, seed=3)
        # ragged: micro 0 fully real, micro 1 has one real + three pad rows
        mask = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)

        kw = dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
                  label_smoothing=0.01)
        big_step = jax.jit(make_train_step(
            model, tx, kw, augment=False, tuning=True))
        acc_step = jax.jit(make_train_step(
            model, tx, kw, augment=False, tuning=True, accumulate=2))

        s_big, loss_big, comps_big = big_step(
            make_state(model, tx), jnp.asarray(imgs), jnp.asarray(labels),
            jnp.asarray(mask), jax.random.key(1),
        )
        s_acc, loss_acc, comps_acc = acc_step(
            make_state(model, tx),
            jnp.asarray(imgs).reshape(2, 4, *imgs.shape[1:]),
            jnp.asarray(labels).reshape(2, 4, *labels.shape[1:]),
            jnp.asarray(mask).reshape(2, 4),
            jax.random.key(1),
        )
        np.testing.assert_allclose(
            float(loss_acc), float(loss_big), rtol=1e-6)
        for k in comps_big:
            np.testing.assert_allclose(
                float(comps_acc[k]), float(comps_big[k]), rtol=1e-5,
                atol=1e-8)
        for a, b in zip(jax.tree.leaves(s_acc.params),
                        jax.tree.leaves(s_big.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
        assert int(s_acc.step) == int(s_big.step) == 1
    finally:
        del MODELS["test_nodrop"]


def test_grad_accumulation_live_bn_descends():
    """With live BN the micro-batches normalize with their own statistics
    (sequential-small-batch semantics, documented divergence from the big
    batch): the step must still run, update batch_stats, and descend."""
    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    kw = dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
              label_smoothing=0.01)
    step = jax.jit(make_train_step(model, tx, kw, accumulate=2))
    state = make_state(model, tx)
    stats0 = jax.tree.map(np.asarray, state.batch_stats)
    imgs, labels, mask = fake_batch(model, b=8, seed=4)
    stack = lambda a: jnp.asarray(a).reshape(2, 4, *a.shape[1:])
    losses = []
    for _ in range(6):
        state, loss, _ = step(
            state, stack(imgs), stack(labels), stack(mask), jax.random.key(2)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    changed = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(state.batch_stats),
                        jax.tree.leaves(stats0))
    )
    assert changed, "live BN stats must update through the scan"


def test_prefetch_groups_micro_batches_and_pads_short_final():
    """prefetch_to_device(accumulate=2): 5 loader batches -> 3 stacked
    groups; the final group is padded with a zero-mask copy so the step
    shape never changes, and the zero mask gives it zero gradient weight."""
    from yogo_tpu.parallel.mesh import prefetch_to_device

    model = tiny_model()
    mesh = get_mesh()
    imgs, labels, mask = fake_batch(model, b=10, seed=5)
    batches = [
        (imgs[i: i + 2], labels[i: i + 2], mask[i: i + 2])
        for i in range(0, 10, 2)
    ]
    groups = list(prefetch_to_device(iter(batches), mesh, accumulate=2))
    assert len(groups) == 3
    for gi, gl, gm in groups:
        # batch axis padded to the 8-device mesh: (2, 8, ...) stacks
        assert gi.shape[:2] == (2, 8) and gm.shape == (2, 8)
        assert gl.shape[:2] == (2, 8)
    # the pad micro of the last group is fully masked out
    last_mask = np.asarray(groups[-1][2])
    assert last_mask[1].sum() == 0 and last_mask[0].sum() == 2
    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    with pytest.raises(ValueError, match="remat"):
        make_train_step(model, tx, {}, remat="everything")


def test_train_step_image_mask_excludes_padding():
    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    loss_kwargs = dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
                       label_smoothing=0.01)
    eval_step = make_eval_step(model, loss_kwargs)
    v = model.init(jax.random.key(0))
    imgs, labels, mask = fake_batch(model, b=8)
    full_loss, _ = eval_step(v["params"], v.get("batch_stats", {}),
                             jnp.asarray(imgs), jnp.asarray(labels),
                             jnp.asarray(mask))
    # replace last 4 images with garbage but mask them out
    imgs2 = imgs.copy()
    imgs2[4:] = 255
    mask2 = mask.copy()
    mask2[4:] = 0
    half_loss, _ = eval_step(v["params"], v.get("batch_stats", {}),
                             jnp.asarray(imgs2), jnp.asarray(labels),
                             jnp.asarray(mask2))
    ref_loss, _ = eval_step(v["params"], v.get("batch_stats", {}),
                            jnp.asarray(imgs[:4]), jnp.asarray(labels[:4]),
                            jnp.asarray(mask[:4]))
    np.testing.assert_allclose(float(half_loss), float(ref_loss), rtol=1e-4)
    # negative case: the mask genuinely changes the result
    assert not np.isclose(float(half_loss), float(full_loss))


def test_checkpoint_roundtrip(tmp_path):
    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    state = make_state(model, tx)
    p = tmp_path / "ck.ckpt"
    save_checkpoint(
        p, model,
        {"params": state.params, "batch_stats": state.batch_stats},
        opt_state=state.opt_state, epoch=2, step=34,
        classes=CLASSES, model_name="testrun",
    )
    m2, v2, meta = load_checkpoint(p)
    assert meta["step"] == 34 and meta["epoch"] == 2
    assert meta["classes"] == CLASSES
    assert m2.model_version == "quarter_filters"
    assert m2.grid == model.grid
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(v2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # load_any dispatches on suffix
    m3, _, _ = load_any(p)
    assert m3.model_version == "quarter_filters"


def test_trainer_end_to_end_tiny(tmp_path):
    """2-epoch training run on generated data: loss logged, checkpoints
    written, test metrics produced."""
    pairs = [make_pair_dirs(tmp_path, str(i), n_images=6, seed=i) for i in range(2)]
    test_pair = [make_pair_dirs(tmp_path, "t", n_images=4, seed=9)]
    defn = write_defn(
        tmp_path / "d.yml",
        dataset_pairs=pairs,
        test_pairs=test_pair,
        split={"train": 0.75, "val": 0.25},
    )
    config = {
        "learning_rate": 1e-3,
        "decay_factor": 10.0,
        "weight_decay": 5e-2,
        "label_smoothing": 0.01,
        "iou_weight": 5.0,
        "no_obj_weight": 0.5,
        "classify_weight": 1.0,
        "epochs": 2,
        "batch_size": 4,
        "anchor_w": 0.1,
        "anchor_h": 0.15,
        "model": "quarter_filters",
        "half": False,
        "rgb": False,
        "image_hw": (40, 56),
        "pretrained_path": None,
        "normalize_images": False,
        "dataset_split_override": None,
        "dataset_descriptor_file": str(defn),
        "name": "tiny",
        "note": None,
        "tags": None,
        "wandb_entity": None,
        "wandb_project": None,
        "use_wandb": False,
        "model_save_dir": str(tmp_path / "run"),
    }
    trainer = Trainer(config)
    trainer.init()
    result = trainer.train()

    run_dir = tmp_path / "run"
    assert (run_dir / "metrics.jsonl").exists()
    assert (run_dir / "best.ckpt").exists()
    lines = [json.loads(ln) for ln in (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert any("val loss" in ln for ln in lines)

    assert result is not None
    mean_loss, mAP, confusion, *_ = result
    assert np.isfinite(mean_loss)
    assert confusion.shape[0] >= len(CLASSES)

    # resume: load best.ckpt as pretrained
    config2 = dict(config, pretrained_path=str(run_dir / "best.ckpt"),
                   epochs=1, model_save_dir=str(tmp_path / "run2"))
    t2 = Trainer(config2)
    t2.init()
    assert int(t2.state.step) > 0  # global step restored


def test_trainer_end_to_end_accumulate(tmp_path):
    """Trainer wiring for --accumulate-grad-batches: stacked micro-batch
    groups feed the train step (rank-5 shardings) while validation keeps
    the plain rank-4 eval step - a CLI drive caught exactly this clobber.
    3 train batches at accumulate=2 -> 2 optimizer steps per epoch (the
    short final group pads with a zero-weight micro)."""
    pairs = [make_pair_dirs(tmp_path, "a", n_images=8, seed=0)]
    defn = write_defn(
        tmp_path / "d.yml",
        dataset_pairs=pairs,
        split={"train": 0.75, "val": 0.25},
    )
    config = {
        "learning_rate": 1e-3, "decay_factor": 10.0, "weight_decay": 5e-2,
        "label_smoothing": 0.01, "iou_weight": 5.0, "no_obj_weight": 0.5,
        "classify_weight": 1.0, "epochs": 1, "batch_size": 2,
        "anchor_w": 0.1, "anchor_h": 0.15, "model": "quarter_filters",
        "half": False, "rgb": False, "image_hw": (40, 56),
        "pretrained_path": None, "normalize_images": False,
        "dataset_split_override": None,
        "dataset_descriptor_file": str(defn),
        "name": "acc", "note": None, "tags": None,
        "wandb_entity": None, "wandb_project": None, "use_wandb": False,
        "model_save_dir": str(tmp_path / "run"),
        "accumulate_grad_batches": 2,
    }
    trainer = Trainer(config)
    trainer.init()
    trainer.train()
    # 6 train images / bs 2 = 3 batches -> ceil(3/2) = 2 optimizer steps
    assert trainer.global_step == 2, trainer.global_step
    lines = [
        json.loads(ln)
        for ln in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("val loss" in ln for ln in lines)  # the rank-4 eval step ran
    assert any("train loss" in ln for ln in lines)


def test_trainer_rejects_mismatched_pretrained_size(tmp_path):
    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    state = make_state(model, tx)
    p = tmp_path / "ck.ckpt"
    save_checkpoint(p, model, {"params": state.params,
                               "batch_stats": state.batch_stats})
    pairs = [make_pair_dirs(tmp_path, "x", n_images=3)]
    defn = write_defn(tmp_path / "d.yml", dataset_pairs=pairs)
    config = {
        "learning_rate": 1e-3, "decay_factor": 10.0, "weight_decay": 5e-2,
        "label_smoothing": 0.01, "iou_weight": 5.0, "no_obj_weight": 0.5,
        "epochs": 1, "batch_size": 2, "anchor_w": 0.1, "anchor_h": 0.15,
        "model": None, "half": False, "rgb": False,
        "image_hw": (40, 56),  # != (48, 64) in the checkpoint
        "pretrained_path": str(p), "normalize_images": False,
        "dataset_split_override": None,
        "dataset_descriptor_file": str(defn), "use_wandb": False,
    }
    t = Trainer(config)
    with pytest.raises(RuntimeError, match="mismatch in pretrained"):
        t.init()


def test_tuning_train_step_freezes_bn():
    """Fine-tune BN-freeze (reference loads pretrained models with
    tuning=True -> BN in eval: yogo/model.py:67-70,134): batch_stats must
    not change across a tuning step, and the forward must normalize with the
    (frozen) running stats rather than batch statistics."""
    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    state = make_state(model, tx)
    loss_kwargs = dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
                       label_smoothing=0.01)

    # shift the running stats away from the batch statistics so the two BN
    # modes are distinguishable
    shifted = jax.tree.map(lambda x: x + 3.0, state.batch_stats)
    state = state.replace(batch_stats=shifted)
    imgs, labels, mask = fake_batch(model)
    rng = jax.random.key(0)

    tune_step = make_train_step(model, tx, loss_kwargs, augment=False,
                                tuning=True)
    norm_step = make_train_step(model, tx, loss_kwargs, augment=False,
                                tuning=False)

    new_state, tune_loss, _ = tune_step(
        state, jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(mask), rng)
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    norm_state, norm_loss, _ = norm_step(
        state, jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(mask), rng)
    # normal training updates the running stats...
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.batch_stats),
                        jax.tree.leaves(norm_state.batch_stats))
    )
    assert changed
    # ...and normalizes with batch stats, so with shifted running stats the
    # two modes must produce different losses (same dropout rng both times)
    assert not np.isclose(float(tune_loss), float(norm_loss))

    # eval-BN forward parity at the BN layer itself: bn0's output (block 0
    # precedes every dropout layer, so it is rng-independent) must be
    # IDENTICAL between the tuning-mode train forward and an eval forward,
    # and differ from the batch-stats train forward - comparing two
    # identical calls would only prove determinism.
    v = {"params": state.params, "batch_stats": state.batch_stats}
    module = model.module()
    x_nhwc = jnp.transpose(jnp.asarray(imgs).astype(jnp.float32), (0, 2, 3, 1))

    def bn0_out(**kw):
        _, aux = module.apply(
            v, x_nhwc, capture_intermediates=True,
            mutable=["intermediates", "batch_stats"], **kw,
        )
        return np.asarray(aux["intermediates"]["bn0"]["__call__"][0])

    tuning_bn = bn0_out(train=True, bn_frozen=True,
                        rngs={"dropout": jax.random.key(7)})
    eval_bn = bn0_out(train=False)
    batch_bn = bn0_out(train=True, bn_frozen=False,
                       rngs={"dropout": jax.random.key(7)})
    np.testing.assert_array_equal(tuning_bn, eval_bn)
    assert not np.allclose(tuning_bn, batch_bn)


def test_trainer_sets_tuning_from_pretrained(tmp_path):
    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    state = make_state(model, tx)
    p = tmp_path / "ck.ckpt"
    save_checkpoint(p, model, {"params": state.params,
                               "batch_stats": state.batch_stats},
                    classes=CLASSES, step=10)
    pairs = [make_pair_dirs(tmp_path, "x", n_images=3)]
    defn = write_defn(tmp_path / "d.yml", dataset_pairs=pairs)
    base = {
        "learning_rate": 1e-3, "decay_factor": 10.0, "weight_decay": 5e-2,
        "label_smoothing": 0.01, "iou_weight": 5.0, "no_obj_weight": 0.5,
        "epochs": 1, "batch_size": 2, "anchor_w": 0.08, "anchor_h": 0.1,
        "model": "quarter_filters", "half": False, "rgb": False,
        "image_hw": (48, 64), "normalize_images": False,
        "dataset_split_override": None,
        "dataset_descriptor_file": str(defn), "use_wandb": False,
    }
    t = Trainer(dict(base, pretrained_path=str(p),
                     model_save_dir=str(tmp_path / "r1")))
    t.init()
    assert t.tuning is True
    t2 = Trainer(dict(base, pretrained_path=None,
                      model_save_dir=str(tmp_path / "r2")))
    t2.init()
    assert t2.tuning is False


def test_flush_train_logs_buffers_and_emits_per_step(tmp_path):
    """The hot loop must not sync per step: losses are buffered as device
    arrays and fetched once per commit window, and the logger still receives
    one correct record per step (VERDICT round-1 item 2)."""
    from yogo_tpu.utils.logging import RunLogger

    t = Trainer.__new__(Trainer)
    t.logger = RunLogger(log_dir=tmp_path, use_wandb=False)
    t.lr_schedule = lambda step: 0.1 * step

    losses = [jnp.asarray(float(i), jnp.float32) for i in range(1, 4)]
    comps = [{"iou_loss": jnp.asarray(10.0 * i)} for i in range(1, 4)]
    pending = [(i, losses[i - 1], comps[i - 1]) for i in range(1, 4)]
    t._flush_train_logs(pending, epoch=0, window_imgs=12, window_start=0.0)
    assert pending == []  # buffer cleared
    t.logger.finish()

    lines = [json.loads(ln)
             for ln in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    committed = [ln for ln in lines if "train loss" in ln]
    # every buffered step must survive as its own record (wandb flushes an
    # uncommitted row when the step advances; merging would drop 99 of 100)
    assert [(ln["step"], ln["train loss"], ln["iou_loss"]) for ln in committed] == [
        (1, 1.0, 10.0),
        (2, 2.0, 20.0),
        (3, 3.0, 30.0),
    ]
    assert np.isclose(committed[-1]["LR"], 0.3)
    assert committed[-1]["images/sec"] > 0


def test_restore_opt_state_roundtrip(tmp_path):
    """--resume-optimizer: saved AdamW moments restore exactly into a fresh
    optimizer state template (extension over the reference, which restores
    model weights only)."""
    from yogo_tpu.utils.checkpoint import restore_opt_state

    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    state = make_state(model, tx)
    # take one step so the moments are non-trivial
    step = make_train_step(
        model, tx,
        dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
             label_smoothing=0.01),
    )
    imgs, labels, mask = fake_batch(model)
    state, _, _ = jax.jit(step)(
        state, jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(mask),
        jax.random.key(0),
    )

    p = tmp_path / "ck.ckpt"
    save_checkpoint(
        p, model,
        {"params": state.params, "batch_stats": state.batch_stats},
        opt_state=state.opt_state, epoch=0, step=1,
        classes=CLASSES, model_name="r",
    )
    _, _, meta = load_checkpoint(p)
    template = tx.init(state.params)
    restored = restore_opt_state(meta, template)
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # without the bytes, the template passes through untouched
    assert restore_opt_state({}, template) is template


def test_trainer_resume_optimizer_wiring(tmp_path):
    """--resume-optimizer: the Trainer restores saved AdamW moments into its
    initial state (and ignores them without the flag)."""
    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    state = make_state(model, tx)
    step = make_train_step(
        model, tx,
        dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
             label_smoothing=0.01),
    )
    imgs, labels, mask = fake_batch(model)
    state, _, _ = jax.jit(step)(
        state, jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(mask),
        jax.random.key(0),
    )
    p = tmp_path / "ck.ckpt"
    save_checkpoint(p, model,
                    {"params": state.params, "batch_stats": state.batch_stats},
                    opt_state=state.opt_state, classes=CLASSES, step=1)

    pairs = [make_pair_dirs(tmp_path, "x", n_images=3)]
    defn = write_defn(tmp_path / "d.yml", dataset_pairs=pairs)
    base = {
        "learning_rate": 1e-3, "decay_factor": 10.0, "weight_decay": 5e-2,
        "label_smoothing": 0.01, "iou_weight": 5.0, "no_obj_weight": 0.5,
        "epochs": 1, "batch_size": 2, "anchor_w": 0.08, "anchor_h": 0.1,
        "model": "quarter_filters", "half": False, "rgb": False,
        "image_hw": (48, 64), "normalize_images": False,
        "dataset_split_override": None,
        "dataset_descriptor_file": str(defn), "use_wandb": False,
        "pretrained_path": str(p),
    }
    t = Trainer(dict(base, resume_optimizer=True,
                     model_save_dir=str(tmp_path / "r1")))
    t.init()
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(t.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    t2 = Trainer(dict(base, model_save_dir=str(tmp_path / "r2")))
    t2.init()
    # default: fresh optimizer (reference behavior) - second moments zero
    assert any(
        np.asarray(l).sum() == 0.0 and np.asarray(a).sum() != 0.0
        for l, a in zip(jax.tree.leaves(t2.state.opt_state),
                        jax.tree.leaves(state.opt_state))
    )

    # a checkpoint WITHOUT saved optimizer state must warn, not silently
    # start AdamW fresh while logging LR as if the resume were exact
    p2 = tmp_path / "noopt.ckpt"
    save_checkpoint(p2, model,
                    {"params": state.params, "batch_stats": state.batch_stats},
                    classes=CLASSES, step=1)
    import warnings as _warnings

    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        t3 = Trainer(dict(base, resume_optimizer=True,
                          pretrained_path=str(p2),
                          model_save_dir=str(tmp_path / "r3")))
        t3.init()
    assert any("no saved optimizer state" in str(r.message) for r in rec)
    # and the LR log clock falls back to this run's own step counter
    assert t3._lr_step_offset == t3.global_step


def test_trainer_checkpoint_rank_gated(tmp_path, monkeypatch):
    """Only process 0 writes checkpoints (reference rank-gates saves in
    _validate): concurrent multi-host writers would race on the tmp file
    and could rename a torn checkpoint into place."""
    model = tiny_model()
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    state = make_state(model, tx)
    t = Trainer.__new__(Trainer)
    t.model = model
    t.state = state
    t.epoch = 0
    t.global_step = 0
    t.config = {"class_names": CLASSES, "normalize_images": False}
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    t.checkpoint(tmp_path / "best.ckpt", model_name="x")
    assert not (tmp_path / "best.ckpt").exists()
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    t.checkpoint(tmp_path / "best.ckpt", model_name="x")
    assert (tmp_path / "best.ckpt").exists()


# ------------------------------------------------------- preemption / resume
def _resume_base_config(tmp_path, pairs=None):
    if pairs is None:
        pairs = [
            make_pair_dirs(tmp_path, str(i), n_images=6, seed=i)
            for i in range(2)
        ]
    defn = write_defn(
        tmp_path / "resume_d.yml",
        dataset_pairs=pairs,
        split={"train": 0.75, "val": 0.25},
    )
    return {
        "learning_rate": 1e-3, "decay_factor": 10.0, "weight_decay": 5e-2,
        "label_smoothing": 0.01, "iou_weight": 5.0, "no_obj_weight": 0.5,
        "classify_weight": 1.0, "epochs": 4, "batch_size": 4,
        "anchor_w": 0.1, "anchor_h": 0.15, "model": "quarter_filters",
        "half": False, "rgb": False, "image_hw": (40, 56),
        "pretrained_path": None, "normalize_images": False,
        "dataset_split_override": None,
        "dataset_descriptor_file": str(defn),
        "name": "resume", "note": None, "tags": None,
        "wandb_entity": None, "wandb_project": None, "use_wandb": False,
        "model_save_dir": str(tmp_path / "run_full"),
    }


def test_resume_requires_pretrained(tmp_path):
    cfg = dict(_resume_base_config(tmp_path), resume=True)
    t = Trainer(cfg)
    with pytest.raises(ValueError, match="--resume .* --from-pretrained"):
        t.init()


def test_resume_without_name_continues_in_place(tmp_path):
    """--resume with neither --name nor a save dir must continue IN the
    interrupted run's directory: a fresh timestamped dir would inherit the
    min_val_loss watermark, never write best.ckpt there, and the final
    test pass would score last-epoch params instead of the best ones."""
    from pathlib import Path

    base = _resume_base_config(tmp_path)
    t = Trainer(dict(base, epochs=1))
    t.init()
    t.train()
    run_dir = Path(base["model_save_dir"])
    latest = run_dir / "latest.ckpt"
    assert latest.exists()

    cfgR = dict(base, epochs=2, pretrained_path=str(latest), resume=True,
                model_save_dir=None, name=None)
    tR = Trainer(cfgR)
    tR.init()
    assert Path(tR.model_save_dir).resolve() == run_dir.resolve()
    # an explicit redirect still wins
    cfgE = dict(base, epochs=2, pretrained_path=str(latest), resume=True,
                model_save_dir=str(tmp_path / "elsewhere"))
    tE = Trainer(cfgE)
    tE.init()
    assert Path(tE.model_save_dir).resolve() == (
        tmp_path / "elsewhere"
    ).resolve()


def test_resume_exact_continuation(tmp_path):
    """An epoch-boundary SIGTERM stop + --resume replays the uninterrupted
    run bit-for-bit: params, BN stats, optimizer count, min-val-loss
    watermark and the epoch counter all carry over (the rng stream is
    step-keyed and the shuffle is epoch-keyed, so nothing drifts)."""
    from pathlib import Path

    base = _resume_base_config(tmp_path)

    # run A: 4 epochs uninterrupted
    tA = Trainer(dict(base))
    tA.init()
    tA.train()
    full_latest = Path(base["model_save_dir"]) / "latest.ckpt"
    _, varsA, metaA = load_checkpoint(full_latest)
    assert metaA["next_epoch"] == 4

    # run B1: same config, stop at the end of epoch 1 (signal lands while
    # the per-epoch latest.ckpt write runs -> consensus boundary stop)
    cfgB = dict(base, model_save_dir=str(tmp_path / "run_int"))
    tB = Trainer(cfgB)
    tB.init()
    orig_ckpt = tB.checkpoint

    def ckpt_hook(path, model_name, **kw):
        orig_ckpt(path, model_name, **kw)
        if Path(path).name == "latest.ckpt" and tB.epoch == 1:
            tB._stop_requested = True

    tB.checkpoint = ckpt_hook
    assert tB.train() is None  # interrupted: no test pass
    int_latest = Path(cfgB["model_save_dir"]) / "latest.ckpt"
    _, _, metaB = load_checkpoint(int_latest)
    assert metaB["next_epoch"] == 2
    assert metaB["min_val_loss"] is not None  # epoch-0 validation recorded

    # run B2: --resume from the interrupted checkpoint
    cfgR = dict(
        base,
        model_save_dir=str(tmp_path / "run_resumed"),
        pretrained_path=str(int_latest),
        resume=True,
    )
    tR = Trainer(cfgR)
    tR.init()
    assert tR._start_epoch == 2
    assert tR.tuning is False  # resume is NOT a BN-frozen fine-tune
    assert tR.min_val_loss == pytest.approx(metaB["min_val_loss"])
    tR.train()

    _, varsR, metaR = load_checkpoint(
        Path(cfgR["model_save_dir"]) / "latest.ckpt"
    )
    assert metaR["next_epoch"] == 4
    flatA = jax.tree.leaves(varsA)
    flatR = jax.tree.leaves(varsR)
    assert len(flatA) == len(flatR)
    for a, r in zip(flatA, flatR):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))


def test_sigterm_mid_epoch_checkpoint(tmp_path):
    """A mid-epoch stop (single-process) checkpoints latest.ckpt with
    next_epoch = the UNFINISHED epoch, so --resume replays it from the
    top instead of skipping it."""
    base = _resume_base_config(tmp_path)
    base["model_save_dir"] = str(tmp_path / "run_mid")
    t = Trainer(base)
    t.init()

    # the signal lands while step 1 is in flight (a flag set BEFORE train()
    # is deliberately cleared at entry as stale); the in-flight step
    # completes, the pre-step check fires before step 2
    orig_step = t._train_step

    def step_hook(state, imgs, labels, mask, rng):
        t._stop_requested = True
        return orig_step(state, imgs, labels, mask, rng)

    t._train_step = step_hook
    assert t.train() is None
    p = (tmp_path / "run_mid") / "latest.ckpt"
    assert p.exists()
    _, _, meta = load_checkpoint(p)
    assert meta["next_epoch"] == 0  # epoch 0 never finished
    assert meta["step"] >= 1  # but the in-flight step completed first

    # and the resumed run starts at epoch 0 and completes normally
    cfgR = dict(
        base,
        model_save_dir=str(tmp_path / "run_mid2"),
        pretrained_path=str(p),
        resume=True,
        epochs=1,
    )
    tR = Trainer(cfgR)
    tR.init()
    assert tR._start_epoch == 0
    tR.train()
    assert ((tmp_path / "run_mid2") / "latest.ckpt").exists()


def test_sigterm_stale_flag_cleared_at_entry(tmp_path):
    """A _stop_requested left over from a previous interrupted train() on
    the same Trainer must not abort a fresh train() after one step."""
    base = _resume_base_config(tmp_path)
    base["model_save_dir"] = str(tmp_path / "run_stale")
    base["epochs"] = 1
    t = Trainer(base)
    t.init()
    t._stop_requested = True  # stale, e.g. from a prior interrupted run
    t.train()
    _, _, meta = load_checkpoint((tmp_path / "run_stale") / "latest.ckpt")
    assert meta["next_epoch"] == 1  # ran to completion, not interrupted


def test_sigterm_during_final_step_completes_epoch(tmp_path):
    """A SIGTERM that lands during an epoch's FINAL step must not mark the
    fully-completed epoch as unfinished: the loop exhausts naturally and
    the epoch-boundary consensus stop records next_epoch = epoch+1, so
    --resume does not double-train a whole epoch of applied updates."""
    base = _resume_base_config(tmp_path)
    base["model_save_dir"] = str(tmp_path / "run_final")
    t = Trainer(base)
    t.init()
    steps_per_epoch = len(t.train_dataloader)
    assert steps_per_epoch >= 2
    orig_step = t._train_step
    calls = []

    def step_hook(state, imgs, labels, mask, rng):
        calls.append(1)
        if len(calls) == steps_per_epoch:  # epoch 0's final step in flight
            t._stop_requested = True
        return orig_step(state, imgs, labels, mask, rng)

    t._train_step = step_hook
    assert t.train() is None  # still an interrupted (boundary) stop
    assert len(calls) == steps_per_epoch  # no extra step dispatched
    _, _, meta = load_checkpoint((tmp_path / "run_final") / "latest.ckpt")
    assert meta["next_epoch"] == 1  # epoch 0 complete - replay NOT needed
    assert meta["step"] == steps_per_epoch


def test_sigterm_real_signal(tmp_path):
    """The trainer's SIGTERM handler is actually installed during train():
    a real signal delivered mid-run stops at the next epoch boundary with
    a resumable checkpoint (this is the TPU-pod/SLURM preemption path)."""
    import os
    import signal as _signal

    base = _resume_base_config(tmp_path)
    base["model_save_dir"] = str(tmp_path / "run_sig")
    t = Trainer(base)
    t.init()
    orig_flush = t._flush_train_logs
    fired = []

    def flush_hook(pending, epoch, window_imgs, window_start):
        r = orig_flush(pending, epoch, window_imgs, window_start)
        if not fired:
            fired.append(1)
            os.kill(os.getpid(), _signal.SIGTERM)
        return r

    t._flush_train_logs = flush_hook
    prev_disposition = _signal.getsignal(_signal.SIGTERM)
    assert t.train() is None
    # the previous SIGTERM disposition is restored afterwards: a second
    # SIGTERM would no longer be swallowed by the trainer's handler
    assert _signal.getsignal(_signal.SIGTERM) is prev_disposition
    _, _, meta = load_checkpoint((tmp_path / "run_sig") / "latest.ckpt")
    # flush fires at the end of epoch 0 -> boundary stop, epoch 0 complete
    assert meta["next_epoch"] == 1


def test_checkpoint_interval_throttles_latest(tmp_path, monkeypatch):
    """--checkpoint-interval N writes latest.ckpt only every N epochs
    (plus the final epoch): on big models the per-epoch state fetch+write
    dominates wall time (docs/perf-notes.md round 5)."""
    pairs = [make_pair_dirs(tmp_path, "ci", n_images=6)]
    defn = write_defn(
        tmp_path / "d.yml", dataset_pairs=pairs,
        split={"train": 0.75, "val": 0.25},
    )
    config = {
        "learning_rate": 1e-3, "decay_factor": 10.0, "weight_decay": 5e-2,
        "label_smoothing": 0.01, "iou_weight": 5.0, "no_obj_weight": 0.5,
        "classify_weight": 1.0, "epochs": 5, "batch_size": 4,
        "anchor_w": 0.1, "anchor_h": 0.15, "model": "quarter_filters",
        "half": False, "rgb": False, "image_hw": (40, 56),
        "pretrained_path": None, "normalize_images": False,
        "dataset_split_override": None,
        "dataset_descriptor_file": str(defn),
        "name": "ci", "note": None, "tags": None,
        "wandb_entity": None, "wandb_project": None, "use_wandb": False,
        "model_save_dir": str(tmp_path / "run"),
        "checkpoint_interval": 3,
    }
    trainer = Trainer(config)
    trainer.init()

    writes = []
    real_ckpt = Trainer.checkpoint

    def spy(self, path, **kw):
        from pathlib import Path

        writes.append(Path(path).name)
        return real_ckpt(self, path, **kw)

    monkeypatch.setattr(Trainer, "checkpoint", spy)
    trainer.train()
    # 5 epochs at interval 3: latest at epoch 3 and at the final epoch 5
    assert writes.count("latest.ckpt") == 2
    assert (tmp_path / "run" / "latest.ckpt").exists()
