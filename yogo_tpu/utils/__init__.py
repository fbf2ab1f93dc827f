from yogo_tpu.ops.postprocess import (  # noqa: F401
    format_preds,
    format_to_numpy,
)
from yogo_tpu.utils.drawing import (  # noqa: F401
    Timer,
    bbox_colour,
    draw_yogo_prediction,
    iter_in_chunks,
)
from yogo_tpu.utils.wandb_helpers import (  # noqa: F401
    choose_device,
    get_free_port,
    get_wandb_confusion,
    get_wandb_roc,
)

__all__ = (
    "Timer",
    "bbox_colour",
    "choose_device",
    "draw_yogo_prediction",
    "format_preds",
    "format_to_numpy",
    "get_free_port",
    "get_wandb_confusion",
    "get_wandb_roc",
    "iter_in_chunks",
)
