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
from semtpu.eval.topo import (
    pixel_error_maximal_fscore,
    foreground_restricted_rand_error,
    warping_error,
    warp_ground_truth,
)
