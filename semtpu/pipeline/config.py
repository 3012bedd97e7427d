"""Pipeline options surface — StartProcess parity.

Every constant of the reference orchestrator
(`Releases/Version 1.2.0/StartProcess.py:13-43`) with the same name
(lower-cased), default, and meaning. GPU-placement knobs
(USE_GPUS_NO / ALLOW_MEMORY_GROWTH / USE_GPU_FOR_WHOLE_IMAGE_INFERENCE)
are replaced by the mesh: training shards batches over all devices, and
whole-image inference needs no CPU fallback on TPU (the reference falls
back because full images exceed GPU memory, `StartProcess.py:22-27`).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class PipelineConfig:
    # General setup (StartProcess.py:14-23)
    root_dir: str = os.path.abspath("./")
    input_dir_masks: str | None = None        # default: <root>/Input_Masks
    input_dir_images: str | None = None       # default: <root>/Input_Images
    output_dir_cyclegan: str | None = None    # default: <root>/Output_Masks_CycleGAN
    output_dir_unet: str | None = None        # default: <root>/Output_Masks_UNet
    tile_size_w: int = 384
    tile_size_h: int = 384
    num_simulated_masks: int = 1000
    run_inference_on_whole_image: bool = True
    dark_background: bool = True

    # WGAN + simulator (StartProcess.py:31-33, 70-86)
    wgan_batch_size: int = 64
    wgan_epochs: int = 1000
    wgan_n_z: int = 128
    max_particle_overlap: float | None = 0.5
    sim_min_no_of_particles: int = 100
    sim_max_no_of_particles: int = 150
    sim_use_perlin_noise: bool = True
    sim_perlin_noise_threshold: float = 0.5
    sim_perlin_noise_frequency: int = 4
    sim_use_normal_distribution: bool = True
    sim_use_random_rotation: str = "DISABLE"   # DISABLE | RANDOM | PERLIN
    sim_grid_type: str = "DISABLE"             # DISABLE | HEXAGONAL | CUBIC

    # CycleGAN (StartProcess.py:34-38, 89-104)
    cyclegan_batch_size: int = 5
    cyclegan_epochs: int = 50
    cyclegan_use_skips: bool = False
    cyclegan_filters: int = 64
    cyclegan_label_smoothing_factor: float = 0.0
    cyclegan_gaussian_noise_value: float = 0.0
    cyclegan_lambda_identity_a: float = 0.5
    cyclegan_lambda_identity_b: float = 0.5
    cyclegan_use_binary_crossentropy: bool = False
    cyclegan_use_resize_convolution: bool = False
    cyclegan_num_residual_blocks: int = 9
    cyclegan_checkpoint_every: int = 1   # reference saves per epoch; raise on
                                         # slow links (a checkpoint ships ~180MB)
    # which checkpoint step 4 renders from: None = latest run's final model
    # (reference behavior: "most recent model", `CycleGAN.py:228`); a
    # checkpoint name/path (e.g. "checkpoints_020"); or "auto" = render a
    # small mask sample with EVERY saved checkpoint and pick the one whose
    # fake SEM images keep the most mask pixels through the step-5 Li
    # intensity filter (a render-quality proxy: late-epoch generators drift
    # toward sparse/washed-out renders that the Li filter rejects —
    # keep-rate 0.50 @ep20 vs 0.30 @ep50 measured in round 2, RESULTS.md)
    cyclegan_checkpoint: str | None = None
    # activation remat in the CycleGAN generators' backward passes
    # ("none" | "blocks" | "full"); a pure performance knob — set from the
    # measured roofline experiment (PROFILE_CYCLEGAN.json), quality config
    # unchanged
    cyclegan_remat: str = "none"
    # fuse same-parameter applications inside the train step (generator
    # adv+cycle+identity as one batch-3B forward, each discriminator's
    # real+pooled as one batch-2B forward); a pure performance knob with
    # per-sample-identical math (see CycleGANConfig.fused_applications),
    # measured by scripts/profile_cyclegan.py --modes fused
    cyclegan_fused_applications: bool = False
    # overlap cadence checkpoint writes with training; default off — the
    # on-device state snapshot + background fetch RESOURCE_EXHAUSTs the
    # tunneled v5e (see CycleGANConfig.async_checkpoint)
    cyclegan_async_checkpoint: bool = False
    # auto-resume an interrupted step-3 run: if the latest CycleGAN run dir
    # has checkpoints_* but no final `model/`, reload the newest checkpoint
    # (exact state: optimizer moments, pools, step, schedule geometry) and
    # continue from that epoch in the same run dir. The ~2 h CycleGAN stage
    # is the only one long enough to need this (TPU tunnel outages observed
    # mid-run); False always starts a fresh run dir.
    cyclegan_resume: bool = True
    gaussian_blur_amount: float = 0.0
    invert_images: bool = False                # TEM/bright-background variant

    # UNet (StartProcess.py:39-42, 149-175)
    unet_batch_size: int = 5
    # gradient microbatches per optimizer step (unet_batch_size % M == 0):
    # lets effective batches >= 10 train past the bf16[N,384,384,16]
    # layout-padding compile wall measured in PROFILE_UNET.json; 1 = off
    unet_grad_microbatches: int = 1
    unet_epochs: int = 50
    unet_contrast_optimization_range: tuple = (0.5, 99.5)
    # randomized contrast-window augmentation on UNet training images
    # (reference `UNet_Segmentation.py:22,83-87`; default off like upstream)
    unet_use_brightness_contrast_augmentation: bool = False
    unet_filters: int = 16
    unet_bn_momentum: float = 0.99
    # checkpoint-selection rule for checkpoint_lowest_loss: "loss" (train
    # loss, the reference rule `UNet_Segmentation.py:262-264`) or
    # "val_loss" (the UNet overfits the synthetic domain after ~10 epochs;
    # val-loss selection generalizes better to real images — RESULTS.md)
    unet_checkpoint_monitor: str = "loss"
    # epochs without monitored improvement before stopping; 0 = run all
    unet_early_stopping_patience: int = 0
    # mid-run resume checkpoints for step 6a (epochs between saves are the
    # most that an interruption can lose); 0 disables
    unet_checkpoint_every: int = 5
    # auto-resume an interrupted step-6a run (same contract as
    # cyclegan_resume: latest run dir with checkpoints_* but no model/)
    unet_resume: bool = True
    # record finished steps in <root>/.completed_steps and skip them on
    # re-runs of the same command — the unattended-recovery flow
    # (scripts/run_with_retry.py relaunches the FULL command after a
    # wedge; without this, a completed ~2 h step 3 would retrain from
    # scratch and its new renders would void step 6a's exact resume).
    # Default off: deliberately re-running a step retrains it (reference
    # rerun semantics).
    skip_completed_steps: bool = False
    unet_threshold: float = -1.0
    # extra capability beyond the reference: average step-6b sigmoid maps
    # over the 4-flip group at inference (matches the trainer's x4 flip
    # augmentation set); default off = reference behavior
    unet_tta_flips: bool = False
    # full 8-element dihedral group (4 flips x 90-degree rotation)
    unet_tta_dihedral: bool = False
    unet_watershed_lines: bool = True
    unet_min_distance: int = 9
    min_overlap: int = 2
    manage_overlap_mode: int = 2
    # bottom rows that are instrument metadata, not sample: excluded from the
    # CycleGAN SEM domain and zeroed in inference outputs (reference crop
    # convention [0:712, 0:1024]: `Predict_Classes_And_Measure.py:27-28`,
    # `Calculate_Scores.py:203`). 0 disables.
    metadata_bar_rows: int = 0

    # optional second-stage classifier (step 7): auto-filter particles by
    # per-pixel class score before measuring
    # (`Other Scripts/Predict_Classes_And_Measure.py:223-357`). The step is
    # a no-op unless a trained classifier checkpoint dir is configured.
    classifier_model_dir: str | None = None
    classifier_filters: int = 16
    classifier_score_threshold: float = 0.5

    # use_dataloader (StartProcess.py:43) controlled RAM usage in the
    # reference's UNet stage; here it selects the host-streaming data path
    # (dataset stays in host RAM, each scan chunk's uint8 slice is uploaded)
    # instead of replicating the whole dataset into HBM
    use_dataloader: bool = False

    seed: int = 0

    def __post_init__(self):
        r = self.root_dir
        self.input_dir_masks = self.input_dir_masks or os.path.join(r, "Input_Masks")
        self.input_dir_images = self.input_dir_images or os.path.join(r, "Input_Images")
        self.output_dir_cyclegan = self.output_dir_cyclegan or os.path.join(
            r, "Output_Masks_CycleGAN")
        self.output_dir_unet = self.output_dir_unet or os.path.join(
            r, "Output_Masks_UNet")

    # -- derived paths (directory contract, HelperFunctions.py:188-238) ------
    @property
    def wgan_dir(self): return os.path.join(self.root_dir, "1_WGAN")

    @property
    def wgan_model_dir(self): return os.path.join(self.wgan_dir, "Models")

    @property
    def wgan_output_dir(self): return os.path.join(self.wgan_dir, "Output_Images")

    @property
    def cyclegan_dir(self): return os.path.join(self.root_dir, "2_CycleGAN")

    @property
    def cyclegan_model_dir(self): return os.path.join(self.cyclegan_dir, "Models")

    @property
    def train_a_dir(self): return os.path.join(self.cyclegan_dir, "data", "trainA")

    @property
    def train_b_dir(self): return os.path.join(self.cyclegan_dir, "data", "trainB")

    @property
    def test_a_dir(self): return os.path.join(self.cyclegan_dir, "data", "testA")

    @property
    def test_b_dir(self): return os.path.join(self.cyclegan_dir, "data", "testB")

    @property
    def generated_a_dir(self):
        return os.path.join(self.cyclegan_dir, "generate_images", "A")

    @property
    def generated_b_dir(self):
        return os.path.join(self.cyclegan_dir, "generate_images", "B")

    @property
    def filtered_masks_dir(self):
        return os.path.join(self.cyclegan_dir, "generate_images",
                            "Synthetic_Masks_Filtered")

    @property
    def unet_dir(self): return os.path.join(self.root_dir, "3_UNet")

    @property
    def unet_model_dir(self): return os.path.join(self.unet_dir, "Models")


def initialize_directories(cfg: PipelineConfig) -> None:
    """Create the on-disk contract (`HelperFunctions.py:188-238`)."""
    for d in (
        cfg.wgan_dir, cfg.wgan_output_dir, cfg.wgan_model_dir,
        cfg.cyclegan_dir,
        os.path.join(cfg.cyclegan_dir, "data"),
        os.path.join(cfg.cyclegan_dir, "generate_images"),
        os.path.join(cfg.cyclegan_dir, "images"),
        cfg.cyclegan_model_dir,
        cfg.test_a_dir, cfg.test_b_dir, cfg.train_a_dir, cfg.train_b_dir,
        cfg.generated_a_dir, cfg.generated_b_dir, cfg.filtered_masks_dir,
        cfg.output_dir_cyclegan,
        cfg.unet_dir, cfg.unet_model_dir,
        cfg.output_dir_unet,
    ):
        os.makedirs(d, exist_ok=True)
