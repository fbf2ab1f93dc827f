"""Training orchestration.

TPU-native re-design of the reference Trainer (reference: yogo/train.py:44-665).
The reference's DDP machinery (mp.spawn per GPU, NCCL process groups, TCPStore
rendezvous, DistributedSampler) collapses into a single-controller SPMD
program: one jitted train step over a 1-D device mesh with the batch sharded
on the "data" axis and parameters replicated; XLA inserts the gradient
all-reduce over ICI.

Recipe parity (reference: yogo/train.py:206-223,295-342):
  AdamW(lr 3e-4, wd 5e-2), cosine schedule stepped per-batch to lr/decay_factor,
  elementwise gradient clamp +-clip_value, validation every 4 epochs,
  best/latest checkpointing on mean val loss, post-train test of the best
  checkpoint.

Divergences (documented):
  - BatchNorm uses global-batch statistics under GSPMD (sync-BN) rather than
    DDP's per-replica stats; running stats stay replicated.
  - Ragged final batches are padded with a validity mask instead of being
    shape-ragged (one compiled program; identical loss normalization).
"""

from __future__ import annotations

import math
import signal
import sys
import time
import warnings
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from yogo_tpu.data.definition import DatasetDefinition
from yogo_tpu.data.loader import DataLoader, get_dataloader
from yogo_tpu.data.transforms import random_flips
from yogo_tpu.losses import yogo_loss
from yogo_tpu.metrics import DeviceMetrics, Metrics
from yogo_tpu.models.yogo import YOGO
from yogo_tpu.parallel.mesh import (
    data_sharded,
    fsdp_sharding_tree,
    get_mesh,
    get_mesh_2d,
    n_data,
    space_sharded,
    validate_spatial_height,
    fetch_replicated,
    local_rows,
    pad_batch_to_multiple,
    prefetch_to_device,
    put_with_shardings,
    replicated,
    shard_batch,
)
from yogo_tpu.utils.checkpoint import (
    load_any,
    restore_opt_state,
    save_checkpoint,
)
from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df
from yogo_tpu.utils.logging import RunLogger


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(
    learning_rate: float,
    weight_decay: float,
    decay_factor: float,
    total_steps: int,
    clip_value: float = 1.0,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """AdamW + per-step cosine decay to lr/decay_factor + elementwise grad
    clamp (the reference clamps via per-parameter backward hooks,
    reference: yogo/model.py:75-77)."""
    schedule = optax.cosine_decay_schedule(
        init_value=learning_rate,
        decay_steps=max(total_steps, 1),
        alpha=1.0 / decay_factor,
    )
    tx = optax.chain(
        optax.clip(clip_value),
        optax.adamw(learning_rate=schedule, weight_decay=weight_decay),
    )

    def host_schedule(step: int) -> float:
        """Closed-form host twin of `schedule` for logging: the optax
        schedule is jnp-backed, so evaluating it eagerly dispatches a tiny
        program to the default device per call (~28 ms each through the
        dev-harness relay)."""
        t = min(max(float(step), 0.0), float(max(total_steps, 1)))
        frac = 0.5 * (1.0 + math.cos(math.pi * t / max(total_steps, 1)))
        alpha = 1.0 / decay_factor
        return learning_rate * ((1.0 - alpha) * frac + alpha)

    return tx, host_schedule


def make_train_step(
    model: YOGO,
    tx: optax.GradientTransformation,
    loss_kwargs: Dict[str, float],
    augment: bool = True,
    tuning: bool = False,
    remat: str = "none",
    accumulate: int = 1,
) -> Callable:
    """Build the pure train step: (state, imgs, labels, img_mask, rng) ->
    (state, loss, components). Augmentation (paired flips) runs on device
    inside the step.

    tuning=True is the fine-tune BN-freeze path: BatchNorm normalizes with
    the loaded running stats and never updates them (the reference loads
    `--from-pretrained` checkpoints with tuning=True, which puts BN modules
    in eval; reference: yogo/model.py:67-70,134, yogo/train.py:136-148).

    remat selects activation rematerialization for the backward pass
    (trades recompute FLOPs for activation HBM; useful at large batch):
      "none"   - store all activations (default),
      "blocks" - save only block-boundary activations (the checkpoint_name
                 markers in models/yogo.py ConvStack); conv/bn/act
                 intermediates are recomputed during bwd,
      "full"   - save nothing; recompute the whole forward during bwd.

    accumulate > 1 (extension - the reference has no gradient accumulation)
    takes micro-batch stacks (A, b, ...) and lax.scans over them before ONE
    optimizer update: activation memory stays that of a single micro-batch
    while the effective batch is A*b. Gradients and the loss are
    accumulated weighted by each micro-batch's real-image count, so the
    result is EXACTLY the big-batch loss/gradient for any padding-mask
    pattern (under frozen BN; with live BN each micro-batch normalizes with
    its own statistics, like running the small batches sequentially -
    tests/test_train.py pins the frozen-BN equivalence). The cosine
    schedule ticks once per optimizer step."""
    if remat not in ("none", "blocks", "full"):
        raise ValueError(f"remat must be none|blocks|full, got {remat!r}")
    if accumulate < 1:
        raise ValueError(f"accumulate must be >= 1, got {accumulate}")

    def forward_and_grad(params, batch_stats, imgs, labels, img_mask, rng_drop):
        """Count-weighted micro-batch grad: returns unnormalized-sum loss
        scaled so Σ_micro / Σ_count == the exact big-batch quantities."""

        def loss_fn(p):
            variables = {"params": p, "batch_stats": batch_stats}
            if tuning:
                out = model.apply(
                    variables,
                    imgs,
                    train=True,
                    tuning=True,
                    rngs={"dropout": rng_drop},
                )
                new_model_state = {"batch_stats": batch_stats}
            else:
                out, new_model_state = model.apply(
                    variables,
                    imgs,
                    train=True,
                    mutable=True,
                    rngs={"dropout": rng_drop},
                )
            loss, comps = yogo_loss(
                out, labels, image_mask=img_mask, **loss_kwargs
            )
            return loss, (comps, new_model_state)

        wrapped = loss_fn
        if remat == "blocks":
            wrapped = jax.checkpoint(
                loss_fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "yogo_block"
                ),
            )
        elif remat == "full":
            wrapped = jax.checkpoint(loss_fn)

        return jax.value_and_grad(wrapped, has_aux=True)(params)

    def step(state: TrainState, imgs, labels, img_mask, rng):
        rng = jax.random.fold_in(rng, state.step)

        if accumulate == 1:
            rng_flip, rng_drop = jax.random.split(rng)
            x = imgs.astype(model.compute_dtype)
            if augment:
                x, labels = random_flips(rng_flip, x, labels)
            (loss, (comps, new_ms)), grads = forward_and_grad(
                state.params, state.batch_stats, x, labels, img_mask, rng_drop
            )
            new_bstats = new_ms["batch_stats"]
        else:
            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            zero_comps = {
                "iou_loss": 0.0,
                "objectness_loss": 0.0,
                "classification_loss": 0.0,
            }

            def micro(carry, xs):
                bstats, gacc, lacc, cacc, wacc = carry
                mi, ml, mm, idx = xs
                r = jax.random.fold_in(rng, idx)
                rng_flip, rng_drop = jax.random.split(r)
                x = mi.astype(model.compute_dtype)
                if augment:
                    x, ml = random_flips(rng_flip, x, ml)
                (loss, (comps, new_ms)), g = forward_and_grad(
                    state.params, bstats, x, ml, mm, rng_drop
                )
                # weight by the micro-batch's real-image count: loss/grad
                # came back divided by max(count, 1), so count * value
                # recovers the unnormalized sums (zero for all-pad micros)
                w = jnp.sum(mm.astype(jnp.float32))
                gacc = jax.tree.map(lambda a, b: a + w * b, gacc, g)
                lacc = lacc + w * loss
                cacc = jax.tree.map(lambda a, b: a + w * b, cacc, comps)
                # an all-pad micro (final short group) has zero loss weight
                # but live BN would still fold its duplicated rows into the
                # running stats - keep the previous stats for those
                carried_bstats = jax.tree.map(
                    lambda new, old: jnp.where(w > 0, new, old),
                    new_ms["batch_stats"],
                    bstats,
                )
                return (carried_bstats, gacc, lacc, cacc, wacc + w), None

            (new_bstats, gsum, lsum, csum, wsum), _ = jax.lax.scan(
                micro,
                (state.batch_stats, zero_grads, 0.0, zero_comps, 0.0),
                (imgs, labels, img_mask, jnp.arange(accumulate)),
            )
            denom = jnp.maximum(wsum, 1.0)
            grads = jax.tree.map(lambda a: a / denom, gsum)
            loss = lsum / denom
            comps = jax.tree.map(lambda a: a / denom, csum)

        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bstats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, loss, comps

    return step


def make_eval_step(
    model: YOGO, loss_kwargs: Dict[str, float], quant_params=None
) -> Callable:
    """(variables, imgs, labels, img_mask) -> (loss, decoded inference preds).

    quant_params (from ops.quant.quantize_conv_stack) evaluates the int8
    inference path instead of the float forward - `yogo test --quantize`
    measures PTQ accuracy on a real test split with the exact program
    `yogo infer --quantize` serves (params/batch_stats args are then unused;
    the folded int8 weights live inside quant_params)."""

    def step(params, batch_stats, imgs, labels, img_mask):
        if quant_params is not None:
            from yogo_tpu.ops.quant import family_quant_forward

            out_train = family_quant_forward(model)(
                model, quant_params, imgs, inference=False
            )
        else:
            variables = {"params": params, "batch_stats": batch_stats}
            out_train = model.apply(
                variables, imgs.astype(model.compute_dtype), train=False
            )
        loss, _ = yogo_loss(out_train, labels, image_mask=img_mask, **loss_kwargs)
        # inference-mode preds (softmaxed classes) for metrics
        probs = jax.nn.softmax(out_train[:, 5:], axis=1)
        preds_inf = jnp.concatenate([out_train[:, :5], probs], axis=1)
        return loss, preds_inf

    return step


class Trainer:
    """Single-controller trainer. `config` mirrors the reference's wandb
    config dict keys (reference: yogo/train.py:612-643)."""

    # LR-log clock offset vs global_step (set by _init_training_tools;
    # class-level default keeps partially-constructed Trainers working)
    _lr_step_offset = 0

    def __init__(self, config: Dict[str, Any]):
        self.config = config
        # --spatial-parallel N: 2-D (data, space) mesh - image rows split
        # over N devices with XLA-inserted conv halo exchanges. The scale-UP
        # axis for activation pressure (a per-device batch shard's
        # activations shrink Nx), orthogonal to data parallelism.
        self._spatial = int(config.get("spatial_parallel", 1) or 1)
        if self._spatial > 1 and jax.process_count() > 1:
            local_dev = len(jax.local_devices())
            if local_dev % self._spatial:
                # get_mesh_2d reshapes the process-major global device list
                # into (data, space) rows; a row must not straddle hosts or
                # every conv halo exchange would ride DCN instead of ICI
                raise ValueError(
                    f"spatial_parallel={self._spatial} must divide the "
                    f"per-process device count {local_dev} under multi-host"
                )
        self.mesh = (
            get_mesh_2d(self._spatial) if self._spatial > 1 else get_mesh()
        )
        self.epoch = 0
        self.global_step = 0
        self.tuning = False
        self.min_val_loss = float("inf")
        self._start_epoch = 0
        self._stop_requested = False
        self.model_save_dir: Optional[Path] = None
        self._initialized = False

    # ----------------------------------------------------------------- init
    def init(self) -> None:
        self._init_dataset_definition()
        self._init_model()
        self._init_dataset()
        self._init_training_tools()
        self._init_logger()
        self._initialized = True

    def _init_dataset_definition(self) -> None:
        self.dataset_definition = DatasetDefinition.from_yaml(
            Path(self.config["dataset_descriptor_file"])
        )
        self.config["class_names"] = self.dataset_definition.classes

    def _init_model(self) -> None:
        cfg = self.config
        pretrained = cfg.get("pretrained_path")
        compute_dtype = jnp.bfloat16 if cfg.get("half") else jnp.float32
        # fine-tuning from a checkpoint freezes BatchNorm (reference loads
        # pretrained models with tuning=True: yogo/model.py:134)
        self.tuning = not (pretrained is None or pretrained == "none")
        self._pretrained_meta = None
        resume = bool(cfg.get("resume"))
        if resume and (pretrained is None or pretrained == "none"):
            raise ValueError(
                "--resume continues an interrupted run and needs its "
                "checkpoint: pass --from-pretrained <run_dir>/latest.ckpt"
            )
        if pretrained is None or pretrained == "none":
            self.model = YOGO.create(
                img_size=cfg["image_hw"],
                anchor_w=cfg["anchor_w"],
                anchor_h=cfg["anchor_h"],
                num_classes=len(cfg["class_names"]),
                is_rgb=cfg.get("rgb", False),
                normalize_images=cfg.get("normalize_images", False),
                model_version=cfg.get("model") or "base_model",
                compute_dtype=compute_dtype,
            )
            self.variables = self.model.init(
                jax.random.key(cfg.get("seed", 0))
            )
            self.global_step = 0
        else:
            model, variables, meta = load_any(pretrained)
            self._pretrained_meta = meta
            if list(model.img_size) != list(cfg["image_hw"]):
                raise RuntimeError(
                    "mismatch in pretrained network image resize shape and "
                    f"current resize shape: pretrained network image_hw = "
                    f"{model.img_size}, requested image_hw = {cfg['image_hw']}"
                )
            self.model = model.with_compute_dtype(compute_dtype)
            self.variables = variables
            self.global_step = meta.get("step", 0)
            cfg["normalize_images"] = self.model.normalize_images
            cfg["model"] = self.model.model_version
            # the --rgb-images help text promises "overridden if loading a
            # checkpoint"; without this an RGB checkpoint gets 1-channel
            # batches and fails on input-channel mismatch
            cfg["rgb"] = self.model.is_rgb
            if resume:
                # exact continuation of the SAME run (preemption recovery),
                # not a fine-tune: BatchNorm keeps training, the epoch
                # counter / best-val-loss tracker pick up where the
                # checkpoint left them, and AdamW moments + schedule count
                # must come along (the rng stream is step-keyed, so the
                # resumed run replays the uninterrupted run bit-for-bit)
                self.tuning = False
                cfg["resume_optimizer"] = True
                self._start_epoch = int(
                    meta.get("next_epoch", meta.get("epoch", -1) + 1)
                )
                if meta.get("min_val_loss") is not None:
                    self.min_val_loss = float(meta["min_val_loss"])
                if not cfg.get("model_save_dir") and not cfg.get("name"):
                    # continue IN the interrupted run's directory rather
                    # than forking a fresh timestamped one: the restored
                    # min_val_loss watermark would suppress best.ckpt in a
                    # new dir (no post-resume val beats it), and the final
                    # test pass would then score last-epoch params while
                    # the real best sat unread in the old dir
                    cfg["model_save_dir"] = str(
                        Path(pretrained).resolve().parent
                    )
        self.Sx, self.Sy = self.model.grid

    def _init_dataset(self) -> None:
        loaders = get_dataloader(
            self.dataset_definition,
            self.config["batch_size"],
            Sx=self.Sx,
            Sy=self.Sy,
            image_hw=self.config["image_hw"],
            rgb=self.config.get("rgb", False),
            normalize_images=self.config.get("normalize_images", False),
            split_fraction_override=self.config.get("dataset_split_override"),
            shard=(jax.process_index(), jax.process_count()),
            packed_cache=self.config.get("packed_cache"),
        )
        self.train_dataloader = loaders["train"]
        self.validate_dataloader = loaders.get("val")
        self.test_dataloader = loaders.get("test")
        if self.validate_dataloader is None:
            warnings.warn("no validation dataset found")
        if self.test_dataloader is None:
            warnings.warn("no test dataset found")

    def _init_training_tools(self) -> None:
        cfg = self.config
        # with gradient accumulation the optimizer steps once per A loader
        # batches, so the cosine schedule's horizon is the optimizer-step
        # count (ceil: a final short group still steps once)
        self._accumulate = max(int(cfg.get("accumulate_grad_batches", 1) or 1), 1)
        steps_per_epoch = -(-len(self.train_dataloader) // self._accumulate)
        total_steps = cfg["epochs"] * steps_per_epoch
        self.tx, self.lr_schedule = make_optimizer(
            learning_rate=cfg["learning_rate"],
            weight_decay=cfg["weight_decay"],
            decay_factor=cfg["decay_factor"],
            total_steps=total_steps,
            clip_value=cfg.get("clip_value", 1.0),
        )
        self.loss_kwargs = dict(
            no_obj_weight=cfg["no_obj_weight"],
            iou_weight=cfg["iou_weight"],
            classify_weight=cfg.get("classify_weight", df.CLASSIFY_WEIGHT),
            label_smoothing=cfg["label_smoothing"],
        )
        opt_state = self.tx.init(self.variables["params"])
        # --resume-optimizer: exact resume restores AdamW moments from the
        # checkpoint (extension: the reference restores neither optimizer
        # nor schedule state, yogo/train.py:136-148 - off by default)
        restored_opt = False
        if cfg.get("resume_optimizer") and self._pretrained_meta is not None:
            if "_opt_state_bytes" in self._pretrained_meta:
                opt_state = restore_opt_state(self._pretrained_meta, opt_state)
                restored_opt = True
            else:
                # .pth files (and any ckpt saved without opt_state) carry
                # no optimizer state: say so instead of silently starting
                # AdamW fresh while the LR log pretends an exact resume
                warnings.warn(
                    "--resume-optimizer: the checkpoint has no saved "
                    "optimizer state (reference .pth files never do) - "
                    "AdamW starts fresh and the LR schedule/log run on "
                    "this run's clock"
                )
        # the optax schedule counts steps from THIS run's optimizer init
        # (tx.init -> count 0) unless --resume-optimizer restored the saved
        # count; the logged "LR" must tick on the same clock, or fine-tune
        # runs log mid-decay values while actually at the cosine start
        self._lr_step_offset = 0 if restored_opt else self.global_step
        self.state = TrainState(
            params=self.variables["params"],
            batch_stats=self.variables.get("batch_stats", {}),
            opt_state=opt_state,
            step=jnp.asarray(self.global_step, jnp.int32),
        )

        rep = replicated(self.mesh)
        dat = data_sharded(self.mesh)
        msk = data_sharded(self.mesh, ndim=1)
        # images: rows over the "space" axis too (= dat on a 1-D mesh);
        # labels stay batch-sharded only - the grid height Sy is typically
        # odd/prime and GSPMD reshards it where the loss consumes it
        if self._spatial > 1:
            validate_spatial_height(self.mesh, self.model.img_size[0])
        img_shd = space_sharded(self.mesh)
        # --fsdp: params/moments/batch_stats sharded over the data axis
        # (ZeRO/fsdp - XLA all-gathers weights at use, reduce-scatters
        # grads); otherwise everything replicated
        if self.config.get("fsdp"):
            state_shd = TrainState(
                params=fsdp_sharding_tree(self.mesh, self.state.params),
                batch_stats=fsdp_sharding_tree(
                    self.mesh, self.state.batch_stats
                ),
                opt_state=fsdp_sharding_tree(self.mesh, self.state.opt_state),
                step=rep,
            )
            # multi-host safe: each process assembles only its addressable
            # shards from its (identical) host copy of the state
            self.state = put_with_shardings(self.state, state_shd)
        else:
            state_shd = rep
        step_fn = make_train_step(
            self.model, self.tx, self.loss_kwargs, tuning=self.tuning,
            remat=self.config.get("remat", "none"),
            accumulate=self._accumulate,
        )
        if self._accumulate > 1:
            # micro-batch stacks (A, b, ...): batch axis sharded at axis 1,
            # the accumulation axis stays unsharded (it is scanned). These
            # are TRAIN-step-only: the eval step below keeps the plain
            # rank-4 batch shardings (img_shd/dat/msk)
            img_in = space_sharded(self.mesh, ndim=5, h_axis=3, batch_axis=1)
            dat_in = data_sharded(self.mesh, ndim=5, batch_axis=1)
            msk_in = data_sharded(self.mesh, ndim=2, batch_axis=1)
        else:
            img_in, dat_in, msk_in = img_shd, dat, msk
        self._train_step = jax.jit(
            step_fn,
            in_shardings=(state_shd, img_in, dat_in, msk_in, rep),
            out_shardings=(state_shd, rep, rep),
            donate_argnums=(0,),
        )
        eval_fn = make_eval_step(self.model, self.loss_kwargs)
        eval_param_shd = (
            (state_shd.params, state_shd.batch_stats)
            if self.config.get("fsdp")
            else (rep, rep)
        )
        self._eval_step = jax.jit(
            eval_fn,
            in_shardings=(*eval_param_shd, img_shd, dat, msk),
            out_shardings=(rep, rep),
        )
        self._rng = jax.random.key(self.config.get("seed", 0))

    def _init_logger(self) -> None:
        cfg = self.config
        run_dir = cfg.get("model_save_dir")
        name = cfg.get("name") or f"run_{int(time.time())}"
        if run_dir is None:
            run_dir = Path("trained_models") / name
        self.model_save_dir = Path(run_dir)
        self.logger = RunLogger(
            log_dir=self.model_save_dir,
            config=cfg,
            use_wandb=cfg.get("use_wandb", True),
            wandb_entity=cfg.get("wandb_entity"),
            wandb_project=cfg.get("wandb_project"),
            name=cfg.get("name"),
            notes=cfg.get("note"),
            tags=cfg.get("tags"),
            enabled=jax.process_index() == 0,
        )
        self.logger.update_config(
            {
                "Sx": self.Sx,
                "Sy": self.Sy,
                "training set size": f"{len(self.train_dataloader.dataset)} images",
                "validation set size": (
                    f"{len(self.validate_dataloader.dataset)} images"
                    if self.validate_dataloader
                    else "0 images"
                ),
                "testing set size": (
                    f"{len(self.test_dataloader.dataset)} images"
                    if self.test_dataloader
                    else "0 images"
                ),
            }
        )

    # ----------------------------------------------------------- checkpoint
    def checkpoint(self, filename: Path, model_name: str, **kwargs) -> None:
        # multi-host FSDP shards the state ACROSS hosts: replicating it for
        # the write is an all-gather every process must join, so the fetch
        # happens before the rank gate (single-process/replicated state it
        # degenerates to a plain device fetch)
        host_state = fetch_replicated(
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
            }
        )
        if jax.process_index() != 0:
            # the reference rank-gates saves (yogo/train.py _validate);
            # replicated state is identical everywhere, and concurrent
            # writers on a shared filesystem would race on the tmp file
            return
        # resume metadata: which epoch a --resume run should start at, and
        # the best-val-loss watermark so best.ckpt isn't overwritten by a
        # worse post-resume validation (getattr: tests build bare Trainers)
        kwargs.setdefault("next_epoch", getattr(self, "epoch", -1) + 1)
        mvl = getattr(self, "min_val_loss", float("inf"))
        kwargs.setdefault(
            "min_val_loss", float(mvl) if np.isfinite(mvl) else None
        )
        save_checkpoint(
            filename,
            self.model,
            {
                "params": host_state["params"],
                "batch_stats": host_state["batch_stats"],
            },
            opt_state=host_state["opt_state"],
            epoch=self.epoch,
            step=int(self.state.step),
            classes=self.config["class_names"],
            model_name=model_name,
            **kwargs,
        )

    # ----------------------------------------------------------------- train
    def train(self) -> Optional[Tuple]:
        if not self._initialized:
            raise RuntimeError("trainer not initialized")

        profile_steps = int(self.config.get("profile_steps", 0) or 0)
        # --from-pretrained starts global_step at the checkpoint's step, so
        # the profile gate must count steps of THIS run, not absolute steps
        # (a `== 1` gate silently never fired on fine-tune runs)
        profile_start = self.global_step + 1
        commit_interval = max(
            1, int(self.config.get("log_commit_interval", 100) or 100)
        )
        # graceful preemption (aux subsystem; the reference has none): a
        # SIGTERM - the grace signal TPU-pod/SLURM preemption delivers -
        # finishes the in-flight step, checkpoints latest.ckpt, and exits
        # cleanly so the follow-up run continues with --resume. Registered
        # only on the main thread (signal.signal raises elsewhere). The
        # previous disposition may legitimately be None (installed from C),
        # so "never installed" needs its own sentinel for the restore.
        self._stop_requested = False  # a stale flag from a prior train()
        not_installed = object()
        prev_sigterm = not_installed
        try:
            prev_sigterm = signal.signal(
                signal.SIGTERM,
                lambda s, f: setattr(self, "_stop_requested", True),
            )
        except ValueError:
            pass
        try:
            return self._train_epochs(profile_steps, profile_start,
                                      commit_interval)
        finally:
            # restored in ALL exits - including exceptions out of the epoch
            # loop (otherwise the lambda leaks process-wide and SIGTERM is
            # silently swallowed for the life of the host) - and only AFTER
            # the interrupted-path grace-window checkpoint inside, so a
            # repeated SIGTERM during that save stays absorbed
            if prev_sigterm is not not_installed:
                # signal.signal REJECTS None as a handler even though it
                # RETURNS None for a C-installed one (verified: TypeError);
                # the closest restorable disposition is the default
                signal.signal(
                    signal.SIGTERM,
                    signal.SIG_DFL if prev_sigterm is None else prev_sigterm,
                )

    def _train_epochs(
        self, profile_steps: int, profile_start: int, commit_interval: int
    ) -> Optional[Tuple]:
        tracing = False
        interrupted = mid_epoch_stop = False
        for epoch in range(self._start_epoch, self.config["epochs"]):
            self.epoch = epoch
            self.train_dataloader.set_epoch(epoch)

            # Per-step losses are buffered as device arrays and fetched once
            # per commit interval: a float(loss) each step would serialize
            # host<->device and defeat async dispatch (the reference likewise
            # commits its wandb log every 100 steps, yogo/train.py:329-339).
            pending: list = []
            window_start = time.perf_counter()
            window_imgs = 0
            for imgs, labels, mask in prefetch_to_device(
                self.train_dataloader, self.mesh,
                spatial_first=self._spatial > 1,
                accumulate=self._accumulate,
            ):
                if self._stop_requested and jax.process_count() == 1:
                    # single-process: stop mid-epoch before dispatching the
                    # next step (the checkpoint below records this epoch as
                    # unfinished, a --resume replays it from the top).
                    # Checking BEFORE the step - not after it - means a
                    # signal that lands during the epoch's final step lets
                    # the loop exhaust naturally, so a fully-completed epoch
                    # is recorded complete instead of being replayed.
                    # Multi-host ranks may receive the signal at different
                    # steps, so they keep the loop in lockstep and agree at
                    # the epoch boundary instead - breaking here would
                    # desync the collectives inside the jitted step.
                    interrupted = mid_epoch_stop = True
                    break
                # optional jax.profiler trace of the first few hot-loop steps
                # (aux tracing subsystem; the reference has only a Timer)
                if profile_steps and self.global_step == profile_start:
                    jax.profiler.start_trace(
                        str(self.model_save_dir / "profile")
                    )
                    tracing = True
                if profile_steps and self.global_step >= profile_start + profile_steps:
                    jax.profiler.stop_trace()
                    tracing = False
                    profile_steps = 0

                # a stacked (A, b, ...) accumulation group carries A*b images
                batch_imgs = imgs.shape[0] * (
                    imgs.shape[1] if imgs.ndim == 5 else 1
                )
                self.state, loss, comps = self._train_step(
                    self.state, imgs, labels, mask, self._rng
                )
                self.global_step += 1
                window_imgs += batch_imgs
                pending.append((self.global_step, loss, comps))
                if self.global_step % commit_interval == 0:
                    window_start = self._flush_train_logs(
                        pending, epoch, window_imgs, window_start
                    )
                    window_imgs = 0
            if pending:
                self._flush_train_logs(pending, epoch, window_imgs, window_start)
            if interrupted:
                break

            if epoch % 4 == 0:
                self._validate()

            # every-epoch latest.ckpt: the preemption-recovery anchor (the
            # reference writes latest only at non-best validations). State
            # is unchanged since _validate, so this supersedes rather than
            # duplicates a latest write there. checkpoint_interval
            # (extension, default 1) throttles the cadence: on big nets
            # with short epochs the D2H fetch + disk write of hundreds of
            # MB per epoch can dominate wall time (measured: 594 MB
            # convnext state at ~58 s/epoch overhead vs a 1.7 s compute
            # epoch - docs/perf-notes.md round 5); a preemption between
            # writes just replays at most interval-1 epochs on --resume.
            ckpt_interval = max(
                1, int(self.config.get("checkpoint_interval", 1) or 1)
            )
            is_last = epoch + 1 >= self.config["epochs"]
            if self.model_save_dir is not None and (
                (epoch + 1) % ckpt_interval == 0 or is_last
            ):
                self.checkpoint(
                    self.model_save_dir / "latest.ckpt",
                    model_name=self.logger.run_name or "recent_run_latest",
                )
            stop = self._stop_requested
            if jax.process_count() > 1:
                # consensus: stop iff ANY rank saw the signal, decided at
                # the same point of the same epoch on every rank
                from jax.experimental import multihost_utils

                stop = bool(
                    np.max(
                        multihost_utils.process_allgather(
                            np.asarray(stop, np.int32)
                        )
                    )
                )
            if stop:
                interrupted = True
                break

        if tracing:
            # the profile window reached the end of training before the
            # in-loop stop step: finalize so the trace is actually flushed
            jax.profiler.stop_trace()

        if interrupted:
            # preemption exit: persist state for --resume and return
            # without the best-reload/test pass (the grace window is short)
            if self.model_save_dir is not None and mid_epoch_stop:
                # a mid-epoch stop leaves this epoch unfinished: a --resume
                # must replay it from the top
                self.checkpoint(
                    self.model_save_dir / "latest.ckpt",
                    model_name=self.logger.run_name or "recent_run_latest",
                    next_epoch=self.epoch,
                )
            elif self.model_save_dir is not None and (
                (self.epoch + 1)
                % max(1, int(self.config.get("checkpoint_interval", 1) or 1))
                != 0
            ):
                # boundary stop on an epoch the checkpoint_interval
                # throttle skipped: write now so --resume loses nothing
                self.checkpoint(
                    self.model_save_dir / "latest.ckpt",
                    model_name=self.logger.run_name or "recent_run_latest",
                )
            print(
                "training interrupted by SIGTERM: state saved to "
                f"{(self.model_save_dir or Path('.')) / 'latest.ckpt'} - "
                "continue with `yogo train ... --from-pretrained "
                "<that file> --resume`",
                file=sys.stderr,
            )
            self.logger.finish()
            return None

        # reload best checkpoint and evaluate on the test split
        # (reference: yogo/train.py:344-361)
        if jax.process_count() > 1:
            # rank 0 may still be writing best.ckpt from the final
            # _validate(); without a barrier another rank can read a
            # partially-written file (or miss it entirely), desyncing
            # params across ranks before the collective test() below
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("yogo:best-ckpt-written")
        best = (self.model_save_dir or Path(".")) / "best.ckpt"
        if best.exists():
            _, variables, meta = load_any(best)
            self.state = self.state.replace(
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
            )
        else:
            warnings.warn(f"no best model found at {best} for testing...")

        test_metrics = None
        if self.test_dataloader is not None:
            # when best.ckpt was never written (e.g. no validation split),
            # the params here are still the TRAINING mesh's device arrays -
            # under --fsdp they are sharded, and test() jits against its
            # own fresh mesh with replicated in_shardings; fetch to host so
            # the final pass never feeds cross-mesh-committed arrays
            test_metrics = self.test(
                self.test_dataloader,
                self.config,
                self.model,
                fetch_replicated({
                    "params": self.state.params,
                    "batch_stats": self.state.batch_stats,
                }),
                fast_eval=self.config.get("fast_eval", True),
                fast_eval_max_detections=self.config.get(
                    "fast_eval_max_detections", 256
                ),
                fast_eval_max_labels=self.config.get(
                    "fast_eval_max_labels", 256
                ),
            )
            if test_metrics is not None:
                self._log_test_metrics(*test_metrics)
        else:
            warnings.warn("no test metrics found - test_dataloader is empty")

        self.logger.finish()
        return test_metrics

    def _flush_train_logs(
        self, pending: list, epoch: int, window_imgs: int, window_start: float
    ) -> float:
        """Fetch the buffered per-step device scalars in one transfer and emit
        the per-step log records. Returns the new window start time. The
        fetch of the newest loss also acts as the honest step-rate fence
        (see CLAUDE.md: async timing lies unless a scalar is pulled)."""
        host_vals = jax.device_get([(ls, c) for _, ls, c in pending])
        now = time.perf_counter()
        rate = window_imgs / max(now - window_start, 1e-9)
        last_step = pending[-1][0]
        for (step, _, _), (loss, comps) in zip(pending, host_vals):
            self.logger.log(
                {
                    "train loss": float(loss),
                    "epoch": epoch,
                    "LR": float(self.lr_schedule(step - self._lr_step_offset)),
                    "images/sec": rate,
                    **{k: float(v) for k, v in comps.items()},
                },
                step=step,
                commit=step == last_step,
            )
        pending.clear()
        return now

    # -------------------------------------------------------------- validate
    def _validate(self) -> None:
        if self.validate_dataloader is None:
            return
        nd = n_data(self.mesh)
        losses = []  # device scalars: fetch ONCE after the loop (each
        # float(loss) would serialize a full dispatch+fetch round trip
        # per batch - ~28 ms each through the dev relay)
        last_batch = None
        for imgs, labels, mask in self.validate_dataloader:
            imgs, labels, mask = pad_batch_to_multiple(
                imgs, labels, mask, nd
            )
            imgs_d, labels_d, mask_d = shard_batch(
                self.mesh, imgs, labels, mask,
                spatial_first=self._spatial > 1,
            )
            loss, preds = self._eval_step(
                self.state.params, self.state.batch_stats, imgs_d, labels_d, mask_d
            )
            losses.append(loss)
            last_batch = (imgs, preds)
        if not losses:
            return
        mean_val_loss = float(np.mean(jax.device_get(losses)))

        log: Dict[str, Any] = {"val loss": mean_val_loss}
        if jax.process_index() == 0 and last_batch is not None:
            try:
                from yogo_tpu.utils.drawing import draw_yogo_prediction

                img = draw_yogo_prediction(
                    np.asarray(last_batch[0][0]),
                    np.asarray(last_batch[1][0]),
                    labels=self.config["class_names"],
                    images_are_normalized=self.config.get(
                        "normalize_images", False
                    ),
                )
                if self.model_save_dir is not None:
                    img.save(self.model_save_dir / "validation_bbs.png")
            except Exception as e:  # drawing must never kill training
                warnings.warn(f"could not draw validation image: {e}")

        if mean_val_loss < self.min_val_loss:
            self.min_val_loss = mean_val_loss
            log["best_val_loss"] = mean_val_loss
            self.checkpoint(
                self.model_save_dir / "best.ckpt",
                model_name=self.logger.run_name or "recent_run_best",
            )
        # (the reference writes latest.ckpt here when not best,
        # yogo/train.py _validate; this trainer writes latest at EVERY
        # epoch end instead - same state, strictly fresher cadence)
        self.logger.log(log, step=self.global_step)

    # ------------------------------------------------------------------ test
    @staticmethod
    def test(
        test_dataloader: DataLoader,
        config: Dict[str, Any],
        model: YOGO,
        variables: Dict[str, Any],
        include_mAP: bool = True,
        include_background: bool = False,
        quantize: bool = False,
        fast_eval: bool = False,
        fast_eval_max_detections: int = 256,
        fast_eval_max_labels: int = 256,
    ) -> Optional[Tuple]:
        """Full test pass: loss + Metrics over the test loader. Returns the
        reference's metric tuple (reference: yogo/train.py:446-528).

        quantize=True (extension) evaluates the int8 PTQ inference path
        (the `yogo infer --quantize` program), calibrated on the first test
        batch - so PTQ accuracy can be measured on a real dataset.

        fast_eval=True (extension) accumulates metrics ON DEVICE
        (metrics/device_metrics.py): the whole per-batch update is one
        jitted program and predictions are never fetched to the host, so
        eval tracks the forward pass instead of the per-image Hungarian
        loop. Greedy matching + 1/4096-binned mAP scores; the integer
        counters are exact (see the module docstring). The device engine's
        state is fixed-capacity: fast_eval_max_detections /
        fast_eval_max_labels bound the per-image detections and GT boxes
        (the host engine caps detections at 1024 and labels not at all) -
        DeviceMetrics warns at compute() when a scene overflowed; raise
        these (`--fast-eval-max-detections`) for denser datasets."""
        Trainer._check_keys(config)
        if test_dataloader is None or len(test_dataloader) == 0:
            return None

        mesh = get_mesh()
        if fast_eval:
            # the engines agree except in constructed cases; say so once
            # per eval so a user comparing against reference numbers knows
            # which knob to turn (divergence constructions:
            # tests/test_device_metrics.py)
            print(
                "fast-eval: device metrics engine (greedy max-IoU "
                "matching, mAP scores binned to 1/4096; integer counters "
                "exact). Engines can differ only when detections compete "
                "for overlapping ground truths - --no-fast-eval restores "
                "the host-exact Hungarian engine.",
                file=sys.stderr,
            )
            # SPMD metrics: predictions stay batch-sharded on the mesh (no
            # all-gather of the prediction tensor) and every device
            # scatter-adds its shard into the replicated accumulators
            metrics: Any = DeviceMetrics(
                classes=config["class_names"],
                include_mAP=include_mAP,
                include_background=include_background,
                max_detections=fast_eval_max_detections,
                max_labels=fast_eval_max_labels,
                mesh=mesh,
            )
        else:
            metrics = Metrics(
                classes=config["class_names"],
                include_mAP=include_mAP,
                include_background=include_background,
            )
        loss_kwargs = dict(
            no_obj_weight=config["no_obj_weight"],
            iou_weight=config["iou_weight"],
            classify_weight=config.get("classify_weight", df.CLASSIFY_WEIGHT),
            label_smoothing=config["label_smoothing"],
        )
        quant_params = None
        if quantize:
            from yogo_tpu.ops.quant import family_quant_plan

            # validates the family (ValueError on one with no int8 path)
            # BEFORE a test batch is consumed for calibration
            build_qp, _, _, _ = family_quant_plan(model, variables)
            calib = next(iter(test_dataloader))[0]  # len checked above
            quant_params = build_qp([np.asarray(calib)])
        eval_fn = make_eval_step(model, loss_kwargs, quant_params=quant_params)
        rep = replicated(mesh)
        dat = data_sharded(mesh)
        msk = data_sharded(mesh, ndim=1)
        eval_step = jax.jit(
            eval_fn,
            in_shardings=(rep, rep, dat, dat, msk),
            # fast-eval consumes predictions sharded in place; the host
            # engine needs the replicated (gathered) tensor to slice rows
            out_shardings=(rep, dat if fast_eval else rep),
        )

        total_loss = 0.0
        n_batches = 0
        for imgs, labels, mask in test_dataloader:
            imgs, labels, mask = pad_batch_to_multiple(
                imgs, labels, mask, mesh.size
            )
            imgs_d, labels_d, mask_d = shard_batch(mesh, imgs, labels, mask)
            loss, preds = eval_step(
                variables["params"],
                variables.get("batch_stats", {}),
                imgs_d,
                labels_d,
                mask_d,
            )
            total_loss += float(loss)
            n_batches += 1
            # keep the compiled batch shape: the mask excludes padded tail
            # images inside the jitted formatter (a boolean slice here would
            # recompile it per distinct tail size)
            # preds is replicated with the GLOBAL batch dim while labels/
            # mask are this process's LOCAL loader shard: score the local
            # rows - the reference's post-train test on rank 0 likewise
            # scores that rank's DistributedSampler shard (reference:
            # yogo/train.py:356-361, yogo_dataloader.py:249-253)
            if fast_eval:
                # keep predictions on device AND sharded: the SPMD update
                # consumes the global batch-sharded arrays directly - no
                # D2H and no all-gather of the prediction tensor at all.
                # NOTE (multi-process): this scores the GLOBAL batch, i.e.
                # the union of every rank's loader shard = the full test
                # set, where the host engine (like the reference's rank-0
                # test, yogo/train.py:356-361) scores only this rank's rows.
                metrics.update(preds, labels_d, image_mask=mask_d)
            else:
                preds_np = local_rows(np.asarray(preds), labels.shape[0])
                metrics.update(preds_np, labels, image_mask=mask)

        (
            mAP,
            confusion,
            accuracy,
            roc,
            precision,
            recall,
            calibration_error,
            num_obj_missed_by_class,
            num_obj_extra_by_class,
            total_num_true_objects,
        ) = metrics.compute()

        return (
            total_loss / max(n_batches, 1),
            mAP,
            confusion,
            accuracy,
            roc,
            precision,
            recall,
            calibration_error,
            num_obj_missed_by_class,
            num_obj_extra_by_class,
            total_num_true_objects,
            config["class_names"],
        )

    @staticmethod
    def _check_keys(config: Dict[str, Any]) -> None:
        required = (
            "class_names",
            "iou_weight",
            "no_obj_weight",
            "label_smoothing",
            "half",
        )
        for key in required:
            if key not in config:
                raise ValueError(
                    f"{key} is required in config (full list of keys: {required})"
                )

    def _log_test_metrics(self, *metrics) -> None:
        (
            mean_test_loss,
            mAP,
            confusion,
            accuracy,
            roc,
            precision,
            recall,
            calibration_error,
            num_obj_missed_by_class,
            num_obj_extra_by_class,
            total_num_true_objects,
            class_names,
        ) = metrics
        summary = {
            "test loss": mean_test_loss,
            "test mAP": mAP.get("map"),
            "test mAP (full)": {
                k: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k, v in mAP.items()
            },
            "test precision": float(np.mean(precision)),
            "test recall": float(np.mean(recall)),
            "calibration error": calibration_error,
            "num obj missed by class": num_obj_missed_by_class.tolist(),
            "num obj extra by class": num_obj_extra_by_class.tolist(),
            "total num true objects": int(total_num_true_objects[0]),
            "per-class precision": {
                f"test precision {cn}": float(precision[i])
                for i, cn in enumerate(class_names)
            },
            "per-class recall": {
                f"test recall {cn}": float(recall[i])
                for i, cn in enumerate(class_names)
            },
            "test confusion": confusion.tolist(),
            "test accuracy": accuracy.tolist(),
            # archived metric files must record which engine produced them:
            # fast-eval (default) = device greedy matching with 1/4096-
            # binned mAP scores; host = reference-exact Hungarian
            "eval engine": (
                "device-fast-eval"
                if self.config.get("fast_eval", True)
                else "host-hungarian"
            ),
        }
        self.logger.summary(summary)


def do_training(args) -> None:
    """Build a config dict from parsed args and run training - the CLI entry
    (reference: yogo/train.py:606-656, minus the mp.spawn/NCCL machinery:
    JAX is single-controller)."""
    config = {
        "learning_rate": args.learning_rate,
        "decay_factor": args.lr_decay_factor,
        "weight_decay": args.weight_decay,
        "label_smoothing": args.label_smoothing,
        "iou_weight": args.iou_weight,
        "no_obj_weight": args.no_obj_weight,
        "classify_weight": args.classify_weight,
        "epochs": args.epochs,
        "batch_size": args.batch_size,
        "device": str(jax.devices()[0]),
        "anchor_w": df.ANCHOR_W,
        "anchor_h": df.ANCHOR_H,
        "model": args.model,
        "half": args.half,
        "rgb": args.rgb_images,
        "image_hw": tuple(args.image_hw),
        "pretrained_path": args.from_pretrained,
        "normalize_images": args.normalize_images,
        "dataset_split_override": args.dataset_split_override,
        "dataset_descriptor_file": args.dataset_descriptor_file,
        "jax-version": jax.__version__,
        "python-version": sys.version,
        "name": args.name,
        "note": args.note,
        "tags": args.tags,
        "wandb_entity": args.wandb_entity,
        "wandb_project": args.wandb_project,
        "use_wandb": getattr(args, "wandb", True),
        "profile_steps": getattr(args, "profile_steps", 0),
        "resume": getattr(args, "resume", False),
        "resume_optimizer": getattr(args, "resume_optimizer", False),
        "remat": getattr(args, "remat", "none"),
        "spatial_parallel": getattr(args, "spatial_parallel", 1),
        "fsdp": getattr(args, "fsdp", False),
        "accumulate_grad_batches": getattr(args, "accumulate_grad_batches", 1),
        "packed_cache": getattr(args, "packed_cache", None),
        "checkpoint_interval": getattr(args, "checkpoint_interval", 1),
        "fast_eval": getattr(args, "fast_eval", False),
        "fast_eval_max_detections": getattr(
            args, "fast_eval_max_detections", 256
        ),
        "fast_eval_max_labels": getattr(args, "fast_eval_max_labels", 256),
    }
    trainer = Trainer(config)
    trainer.init()
    trainer.train()
