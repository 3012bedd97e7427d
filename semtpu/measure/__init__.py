from semtpu.measure.measure import Measure
from semtpu.measure.filtering import filter_gan_masks, apply_mean_intensity_filter
