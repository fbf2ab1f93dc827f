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

__all__ = (
    "Timer",
    "bbox_colour",
    "draw_yogo_prediction",
    "format_preds",
    "format_to_numpy",
    "iter_in_chunks",
)
