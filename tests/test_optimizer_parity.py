"""Optimizer-recipe parity: our optax chain (elementwise grad clamp ->
AdamW with per-step cosine decay) must track torch's
AdamW + CosineAnnealingLR + clamp_(-1, 1) hooks step for step
(reference: yogo/train.py:206-223 builds the optimizer,
yogo/model.py:75-77 registers the clamp hooks). The loss and forward are
already oracle-checked elsewhere; this pins the last unchecked piece of
the training recipe - identical params after N updates given identical
gradients.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from yogo_tpu.train import make_optimizer  # noqa: E402

LR = 3e-4
WD = 5e-2
DECAY_FACTOR = 10.0
TOTAL_STEPS = 20
N_UPDATES = 12


def _run_ours(w0, grads):
    import jax.numpy as jnp

    tx, _ = make_optimizer(LR, WD, DECAY_FACTOR, total_steps=TOTAL_STEPS)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
    return np.asarray(params["w"], np.float64)


def _run_torch(w0, grads):
    w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([w], lr=LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=TOTAL_STEPS, eta_min=LR / DECAY_FACTOR
    )
    for g in grads:
        opt.zero_grad()
        # reference: per-parameter backward hooks clamp the gradient
        # elementwise to +-1 (yogo/model.py:75-77)
        w.grad = torch.from_numpy(np.clip(g, -1.0, 1.0).copy())
        opt.step()
        sched.step()
    return w.detach().numpy().astype(np.float64)


def test_adamw_cosine_clamp_matches_torch():
    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 0.5, (4, 7)).astype(np.float32)
    # gradients spanning the clamp boundary (values in [-3, 3])
    grads = [
        rng.normal(0, 1.5, w0.shape).astype(np.float32)
        for _ in range(N_UPDATES)
    ]
    ours = _run_ours(w0, grads)
    theirs = _run_torch(w0, grads)
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-7)


def test_schedule_matches_torch_lr_trace():
    """The host logging twin of the schedule must equal torch's
    CosineAnnealingLR.get_last_lr() at every step."""
    _, host_schedule = make_optimizer(LR, WD, DECAY_FACTOR, TOTAL_STEPS)
    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([w], lr=LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=TOTAL_STEPS, eta_min=LR / DECAY_FACTOR
    )
    for step in range(TOTAL_STEPS + 1):
        np.testing.assert_allclose(
            host_schedule(step),
            sched.get_last_lr()[0],
            rtol=1e-9,
            err_msg=f"step {step}",
        )
        opt.step()
        sched.step()
