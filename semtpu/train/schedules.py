"""Learning-rate schedules as optax step-indexed functions.

- UNet step decay: x0.5 after every 10th epoch (`UNet_Segmentation.py:233-237`)
- UNet linear decay: lr * (1 - epoch/E) (`UNet_Segmentation.py:239-244`)
- CycleGAN linear decay: constant until 0.75*E, then linear to 0
  (`CycleGAN.py:310-317`)
"""
from __future__ import annotations


def step_decay_schedule(base_lr: float, steps_per_epoch: int,
                        drop: float = 0.5, epochs_drop: int = 10):
    def schedule(step):
        epoch = step // steps_per_epoch
        n_drops = (epoch + 1) // epochs_drop
        return base_lr * (drop ** n_drops)
    return schedule


def linear_decay_schedule(base_lr: float, steps_per_epoch: int, total_epochs: int):
    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * (1.0 - epoch / float(total_epochs))
    return schedule


def cyclegan_linear_decay_schedule(base_lr: float, steps_per_epoch: int,
                                   total_epochs: int, decay_epoch: int | None = None):
    if decay_epoch is None:
        decay_epoch = int(0.75 * total_epochs)

    import jax.numpy as jnp

    def schedule(step):
        epoch = step // steps_per_epoch
        frac = (epoch - decay_epoch) / float(max(total_epochs - decay_epoch, 1))
        decayed = base_lr * (1.0 - frac)
        return jnp.where(epoch < decay_epoch, base_lr, decayed)
    return schedule
