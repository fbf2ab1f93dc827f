"""Cross-framework training parity (short): the torch reference model and
our production train step, same init (bridged), same data, same batch
order, dropout zeroed, flips off - per-step losses must track.

The full experiment (300 steps + held-out detection agreement vs a
self-parity control) is tools/head_to_head.py; its committed receipt is
docs/h2h_receipt.json. This test pins the coupled early phase cheaply so
a regression in any one piece (bridge, forward, loss, optimizer,
schedule) breaks CI. Reference loop: yogo/train.py:295-341.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.data_fixtures import torch_reference_yogo_loss  # noqa: E402
from tests.reference_helper import (  # noqa: E402
    import_reference_model,
    reference_available,
)

STEPS = 25

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="torch reference unavailable"
)


def test_training_trajectories_track():
    import tools.head_to_head as h2h

    torch.manual_seed(0)
    mod, mdefns = import_reference_model()
    tnet = mod.YOGO(
        img_size=(h2h.H, h2h.W),
        anchor_w=h2h.ANCHOR_W,
        anchor_h=h2h.ANCHOR_H,
        num_classes=h2h.N_CLASSES,
        model_func=mdefns.get_model_func("half_filters"),
    )
    for m in tnet.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.p = 0.0
    topt = torch.optim.AdamW(tnet.parameters(), lr=h2h.LR, weight_decay=h2h.WD)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(
        topt, T_max=STEPS, eta_min=h2h.LR / h2h.DECAY
    )

    import jax.numpy as jnp

    from yogo_tpu.models import defns
    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.utils.torch_bridge import state_dict_to_variables

    # scoped registration: model.defn resolves from the registry on every
    # apply, so the context must span training; the registry is guaranteed
    # back to the reference's 12 models afterwards, regardless of import
    # order
    with defns.temporary_model(h2h.half_filters_nodrop):
        model = YOGO.create(
            (h2h.H, h2h.W),
            h2h.ANCHOR_W,
            h2h.ANCHOR_H,
            h2h.N_CLASSES,
            model_version="half_filters_nodrop",
            compute_dtype=jnp.float32,
        )
        Sx, Sy = model.grid
        variables = state_dict_to_variables(tnet.state_dict(), model.defn)
        loss_kwargs = dict(
            no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
            label_smoothing=0.01,
        )

        imgs, grids, _ = h2h.gen_split(64, seed=1, Sx=Sx, Sy=Sy)
        rng = np.random.default_rng(7)
        batches = [rng.permutation(64)[:16] for _ in range(STEPS)]

        torch_losses = []
        tnet.train()
        for bi in batches:
            x_np = imgs[bi].astype(np.float32)[:, None]
            topt.zero_grad(set_to_none=True)
            t_out = tnet(torch.from_numpy(x_np))
            t_loss, _ = torch_reference_yogo_loss(
                t_out, torch.from_numpy(grids[bi]), **loss_kwargs
            )
            t_loss.backward()
            topt.step()
            tsched.step()
            torch_losses.append(float(t_loss.detach()))

        ours_losses, _ = h2h.run_ours(
            model, variables, imgs, grids, batches, loss_kwargs
        )

    ours = np.asarray(ours_losses)
    theirs = np.asarray(torch_losses)
    rel = np.abs(ours - theirs) / (np.abs(theirs) + 1e-9)
    assert rel[0] < 1e-4, f"step-0 loss gap {rel[0]:.2e}"
    assert rel[:10].max() < 5e-2, f"first-10 max gap {rel[:10].max():.2%}"
    assert np.median(rel) < 5e-2, f"median gap {np.median(rel):.2%}"
    assert theirs[-3:].mean() < theirs[0], "torch loss did not descend"
    assert ours[-3:].mean() < ours[0], "our loss did not descend"
