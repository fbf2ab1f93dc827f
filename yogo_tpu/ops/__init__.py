from yogo_tpu.ops.boxes import (  # noqa: F401
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    complete_box_iou_loss,
    elementwise_box_iou,
    encode_label_grid,
)
from yogo_tpu.ops.grid import (  # noqa: F401
    cell_offsets,
    encode_label_grid_np,
    grid_size,
)
from yogo_tpu.ops.nms import batched_nms, nms_fixed, nms_numpy  # noqa: F401
from yogo_tpu.ops.postprocess import (  # noqa: F401
    PredictionLabelMatch,
    count_class_predictions,
    count_cells_for_formatted_preds,
    format_preds,
    format_preds_and_labels,
    format_preds_and_labels_v2,
    format_preds_batched,
    format_to_numpy,
    match_preds_and_labels,
)
