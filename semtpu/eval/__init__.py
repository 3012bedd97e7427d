from semtpu.eval.metrics import (
    whole_image_iou,
    instance_iou,
    roc_rates,
    youden_index,
)
from semtpu.eval.sweep import evaluate_predictions, threshold_sweep
