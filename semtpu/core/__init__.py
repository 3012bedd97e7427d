from semtpu.core.imageproc import (
    normalize_minmax,
    contrast_clip,
    preprocess_image,
)
from semtpu.core.tiling import (
    tile_grid,
    tile_image,
    stitch_image,
    OverlapMode,
)
