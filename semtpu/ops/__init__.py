from semtpu.ops.thresholds import threshold_otsu, threshold_li
from semtpu.ops.filters import gaussian_filter, maximum_filter
from semtpu.ops.edt import distance_transform_edt
from semtpu.ops.morphology import (
    binary_erosion,
    binary_dilation,
    binary_opening,
    binary_fill_holes,
    eight_to_four_connected,
)
from semtpu.ops.connected import label
from semtpu.ops.watershed import peak_local_max, watershed, segment
