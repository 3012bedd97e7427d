from semtpu.eval.metrics import (
    whole_image_iou,
    instance_iou,
    roc_rates,
    youden_index,
    rand_error,
    variation_of_information,
    pixel_error,
)
from semtpu.eval.sweep import evaluate_predictions, threshold_sweep
