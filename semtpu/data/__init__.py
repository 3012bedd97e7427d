from semtpu.data.io import (
    get_image_file_paths_from_directory,
    load_and_preprocess_images,
    save_image,
)
from semtpu.data.dataset import SegmentationDataset, PairedDomainDataset, ArrayDataset
