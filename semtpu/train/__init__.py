from semtpu.train.losses import (
    weighted_bce,
    lsgan_real_loss,
    lsgan_fake_loss,
    mae_loss,
    wasserstein_d_loss,
    wasserstein_g_loss,
)
from semtpu.train.schedules import (
    step_decay_schedule,
    linear_decay_schedule,
    cyclegan_linear_decay_schedule,
)
from semtpu.train.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
