"""semtpu — TPU-native automated SEM/TEM particle segmentation framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
BAMresearch/automatic-sem-image-segmentation (reference v1.2.0):

- WGAN-GP particle-shape generator                  (semtpu.models.wgan)
- synthetic mask simulator                          (semtpu.sim)
- CycleGAN sim->SEM style transfer                  (semtpu.models.cyclegan)
- MultiRes-UNet segmentation                        (semtpu.models.multires_unet)
- tiling / stitching engine                         (semtpu.core.tiling)
- device-native watershed / EDT / CC-labeling       (semtpu.ops)
- particle measurements & filtering                 (semtpu.measure)
- IoU / ROC / Youden evaluation                     (semtpu.eval)
- full pipeline orchestrator (StartProcess parity)  (semtpu.pipeline)

All hot paths are jitted XLA computations designed for TPU: batched tile
inference, mesh-sharded data-parallel training (jax.sharding), and
compiler-friendly iterative formulations of the classical vision ops.
"""

__version__ = "0.1.0"
