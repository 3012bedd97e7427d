"""Pipeline orchestrator: steps 0-6b in one process.

Replaces `StartProcess.py:55-221`. The reference spawns one OS subprocess
per step to work around TensorFlow not releasing GPU memory
(`StartProcess.py:46`, SURVEY.md §2.7); JAX has no such leak pattern, so
steps are plain function calls in one process. The per-step entry points
are preserved so a run is resumable at any step (all inter-step state is
the on-disk directory contract, exactly as in the reference).
"""
from __future__ import annotations

import os
import random
import shutil
import time
from datetime import datetime

import numpy as np

from semtpu.pipeline.config import PipelineConfig, initialize_directories
from semtpu.data.io import (get_image_file_paths_from_directory,
                            load_and_preprocess_images, load_uint8_stack,
                            save_image)
from semtpu.core.tiling import tile_image
from semtpu.measure.filtering import filter_gan_masks


class Pipeline:
    def __init__(self, config: PipelineConfig | None = None, mesh=None):
        self.cfg = config or PipelineConfig()
        self.mesh = mesh
        self._wgan = None
        self._mask_hw = None

    # ------------------------------------------------------------- step 0
    def step_0_prepare(self):
        """Init directories + tile real images into trainA
        (`HelperFunctions.py:188-287`)."""
        cfg = self.cfg
        print("Step 0: Initializing directories and preparing images...")
        initialize_directories(cfg)

        imgs = load_and_preprocess_images(cfg.input_dir_images,
                                          normalization_range=None,
                                          output_channels=1)
        if cfg.metadata_bar_rows > 0:
            # drop the instrument metadata bar so it never enters the
            # CycleGAN SEM domain (reference crop convention: 1024x712,
            # `Predict_Classes_And_Measure.py:27-28`, `Calculate_Scores.py:203`)
            imgs = imgs[:, :imgs.shape[1] - cfg.metadata_bar_rows]
        filenames = get_image_file_paths_from_directory(cfg.input_dir_images)
        rnd = random.Random(cfg.seed)

        # disk-prep tiling is host IO work; keep it on the CPU backend
        # (avoids shipping float tile stacks over the accelerator link)
        import jax
        try:
            cpu_ctx = jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:
            import contextlib
            cpu_ctx = contextlib.nullcontext()
        for i, img in enumerate(imgs):
            with cpu_ctx:
                tiles = np.asarray(tile_image(img, cfg.tile_size_h, cfg.tile_size_w,
                                              min_overlap=0,
                                              normalization_range=(0, 255)),
                                   dtype=np.uint8)
            f = os.path.basename(filenames[i])
            ext = os.path.splitext(f)[-1]
            for j, tile in enumerate(tiles):
                # drop background-dominant tiles (`HelperFunctions.py:250`)
                if self._keep_tile(tile, img):
                    save_image(tile[:, :, 0], os.path.join(
                        cfg.train_a_dir, f.replace(ext, f"-{j}{ext}")))

        # 5 random test images
        train_files = get_image_file_paths_from_directory(cfg.train_a_dir)
        for f in rnd.sample(train_files, min(5, len(train_files))):
            shutil.copy(f, cfg.test_a_dir)

        # random-crop/flip augmentation up to num_simulated_masks
        n_have = len(get_image_file_paths_from_directory(cfg.train_a_dir))
        i = 0
        attempts = 0
        while n_have + i < cfg.num_simulated_masks and attempts < 100 * cfg.num_simulated_masks:
            attempts += 1
            r = rnd.randint(0, imgs.shape[0] - 1)
            img = imgs[r]
            if img.shape[0] <= cfg.tile_size_h or img.shape[1] <= cfg.tile_size_w:
                break
            a = rnd.randint(0, img.shape[0] - cfg.tile_size_h - 1)
            b = rnd.randint(0, img.shape[1] - cfg.tile_size_w - 1)
            tile = img[a:a + cfg.tile_size_h, b:b + cfg.tile_size_w]
            if rnd.random() > 0.5:
                tile = np.fliplr(tile)
            if rnd.random() > 0.5:
                tile = np.flipud(tile)
            if self._keep_tile(tile, img):
                f = os.path.basename(filenames[r])
                ext = os.path.splitext(f)[-1]
                save_image(tile[:, :, 0].astype(np.uint8), os.path.join(
                    cfg.train_a_dir, f.replace(ext, f"-aug_{i}{ext}")))
                i += 1

    def _keep_tile(self, tile, img) -> bool:
        if self.cfg.dark_background:
            return float(np.mean(tile)) >= 1.1 * float(np.mean(img))
        return float(np.mean(tile)) <= 0.9 * float(np.mean(img))

    # ------------------------------------------------------------- step 1
    def _load_input_masks(self):
        from semtpu.train.wgan import prepare_mask_dataset
        cfg = self.cfg
        raw = load_and_preprocess_images(cfg.input_dir_masks,
                                         threshold_value=0.5,
                                         normalization_range=(-1, 1),
                                         output_channels=1)
        data, hw = prepare_mask_dataset(list(raw))
        self._mask_hw = hw
        return data, hw

    def _wgan_trainer(self, hw):
        from semtpu.train.wgan import WGANTrainer, WGANConfig
        cfg = self.cfg
        wcfg = WGANConfig(img_h=hw[0], img_w=hw[1], latent_dim=cfg.wgan_n_z,
                          batch_size=cfg.wgan_batch_size, epochs=cfg.wgan_epochs,
                          seed=cfg.seed)
        return WGANTrainer(wcfg, mesh=self.mesh)

    def step_1_train_wgan(self):
        from semtpu.data.dataset import ArrayDataset
        cfg = self.cfg
        print("Step 1: Training WGAN...")
        data, hw = self._load_input_masks()
        trainer = self._wgan_trainer(hw)
        prefix = time.strftime("%Y-%m-%d_%H-%M-%S", time.localtime())
        trainer.fit(ArrayDataset(data),
                    model_dir=os.path.join(cfg.wgan_model_dir, prefix),
                    output_dir=os.path.join(cfg.wgan_output_dir, prefix),
                    monitor_every=20)
        self._wgan = trainer
        return trainer

    # ------------------------------------------------------------- step 2
    def step_2_simulate_masks(self):
        from semtpu.sim import MaskSimulator, SimulatorConfig
        cfg = self.cfg
        print("Step 2: Simulating fake masks...")
        if self._wgan is None:
            _, hw = self._load_input_masks()
            self._wgan = self._wgan_trainer(hw)
            self._wgan.load(cfg.wgan_model_dir)
        num_masks = max(cfg.num_simulated_masks,
                        len(os.listdir(cfg.train_a_dir)))
        scfg = SimulatorConfig(
            img_width=cfg.tile_size_w, img_height=cfg.tile_size_h,
            min_no_of_particles=cfg.sim_min_no_of_particles,
            max_no_of_particles=cfg.sim_max_no_of_particles,
            use_perlin_noise=cfg.sim_use_perlin_noise,
            perlin_noise_threshold=cfg.sim_perlin_noise_threshold,
            perlin_noise_frequency=cfg.sim_perlin_noise_frequency,
            use_normal_distribution=cfg.sim_use_normal_distribution,
            use_random_rotation=cfg.sim_use_random_rotation,
            grid_type=cfg.sim_grid_type,
            max_overlap=cfg.max_particle_overlap,
            seed=cfg.seed)
        sim = MaskSimulator(scfg, self._mask_hw)
        sim.simulate(self._wgan.sample_device, num_masks, output_dir=cfg.train_b_dir)

        # 5 random test masks (`WassersteinGAN.py:534-540`)
        rnd = random.Random(cfg.seed)
        files = [f for f in os.listdir(cfg.train_b_dir)
                 if f.endswith((".tif", ".png", ".bmp"))]
        for f in rnd.sample(files, min(5, len(files))):
            shutil.copy(os.path.join(cfg.train_b_dir, f), cfg.test_b_dir)

    # ------------------------------------------------------------- step 3
    def _cyclegan_trainer(self):
        from semtpu.train.cyclegan import CycleGANTrainer, CycleGANConfig
        cfg = self.cfg
        ccfg = CycleGANConfig(
            tile_h=cfg.tile_size_h, tile_w=cfg.tile_size_w,
            filters=cfg.cyclegan_filters,
            num_residual_blocks=cfg.cyclegan_num_residual_blocks,
            batch_size=cfg.cyclegan_batch_size, epochs=cfg.cyclegan_epochs,
            use_skip_connection=cfg.cyclegan_use_skips,
            use_binary_crossentropy=cfg.cyclegan_use_binary_crossentropy,
            use_resize_convolution=cfg.cyclegan_use_resize_convolution,
            label_smoothing_factor=cfg.cyclegan_label_smoothing_factor,
            gaussian_noise_value=cfg.cyclegan_gaussian_noise_value,
            lambda_identity_a=cfg.cyclegan_lambda_identity_a,
            lambda_identity_b=cfg.cyclegan_lambda_identity_b,
            invert_images=cfg.invert_images,
            stream_from_host=cfg.use_dataloader,
            remat=cfg.cyclegan_remat,
            fused_applications=cfg.cyclegan_fused_applications,
            async_checkpoint=cfg.cyclegan_async_checkpoint,
            seed=cfg.seed)
        return CycleGANTrainer(ccfg, mesh=self.mesh)

    def _load_domain(self, path_or_dir, binary_scale: bool, invert: bool = False):
        r = (0, 1) if binary_scale else (-1, 1)
        imgs = load_and_preprocess_images(path_or_dir, normalization_range=r,
                                          output_channels=1)
        if invert:
            imgs = imgs * -1.0
        return imgs

    def step_3_train_cyclegan(self):
        from semtpu.data.dataset import PairedDomainDataset
        cfg = self.cfg
        print("Step 3: Training CycleGAN...")
        trainer = self._cyclegan_trainer()
        bce = cfg.cyclegan_use_binary_crossentropy
        # raw uint8 stacks + loader specs: device-resident with on-device
        # decode (4x less upload; exact loader parity)
        train_a = load_uint8_stack(cfg.train_a_dir)
        train_b = load_uint8_stack(cfg.train_b_dir)
        a_pre = dict(normalization_range=(-1, 1), invert=cfg.invert_images)
        b_pre = dict(normalization_range=(0, 1) if bce else (-1, 1))
        test_a = self._load_domain(cfg.test_a_dir, False, cfg.invert_images)
        test_b = self._load_domain(cfg.test_b_dir, bce)
        model_dir, start_epoch = self._train_run_dir(
            cfg.cyclegan_model_dir, cfg.cyclegan_resume, trainer)
        trainer.fit(PairedDomainDataset(train_a, train_b, a_pre, b_pre),
                    model_dir=model_dir,
                    image_dir=os.path.join(cfg.cyclegan_dir, "images",
                                           os.path.basename(model_dir)),
                    test_a=test_a, test_b=test_b,
                    checkpoint_every=cfg.cyclegan_checkpoint_every,
                    monitor_every=cfg.cyclegan_checkpoint_every,
                    start_epoch=start_epoch)
        self._cyclegan = trainer
        return trainer

    def _resume_point(self, model_root: str,
                      enabled: bool = True) -> tuple[str | None, int]:
        """(run_dir, epoch) of an interrupted training run to continue, or
        (None, 0). Interrupted = the latest run dir under `model_root` has
        `checkpoints_NNN` but no final `model/` (a completed `fit` always
        writes `model/`)."""
        from semtpu.train.checkpoint import latest_checkpoint
        if not enabled:
            return None, 0
        run = latest_checkpoint(model_root)
        if run is None or os.path.isfile(
                os.path.join(run, "model", "_CHECKPOINT_METADATA")):
            return None, 0
        ckpts = sorted((e for e in os.listdir(run)
                        if e.startswith("checkpoints_")
                        and ".orbax-checkpoint-tmp" not in e  # interrupted save
                        and os.path.isfile(
                            os.path.join(run, e, "_CHECKPOINT_METADATA"))),
                       key=lambda e: int(e.split("_")[-1]))
        if not ckpts:
            return None, 0
        return run, int(ckpts[-1].split("_")[-1])

    def _cyclegan_resume_point(self) -> tuple[str | None, int]:
        return self._resume_point(self.cfg.cyclegan_model_dir,
                                  enabled=self.cfg.cyclegan_resume)

    def _train_run_dir(self, model_root: str, enabled: bool,
                       trainer) -> tuple[str, int]:
        """Resume-or-fresh run-dir selection shared by steps 3 and 6a:
        continue the latest interrupted run (load its newest checkpoint
        into `trainer`) or mint a fresh timestamped dir."""
        model_dir, start_epoch = self._resume_point(model_root, enabled)
        if model_dir is None:
            prefix = time.strftime("%Y-%m-%d_%H-%M-%S", time.localtime())
            return os.path.join(model_root, prefix), 0
        ckpt = os.path.join(model_dir, f"checkpoints_{start_epoch:03d}")
        print(f"  resuming interrupted run {os.path.basename(model_dir)} "
              f"from epoch {start_epoch} ({ckpt})")
        trainer.load(ckpt)
        return model_dir, start_epoch

    # ------------------------------------------------------------- step 4
    def _resolve_cyclegan_checkpoint(self) -> str:
        """Map `cfg.cyclegan_checkpoint` to a loadable path.

        None -> the model dir (trainer.load picks the latest run's final
        model, matching the reference's "most recent model" rule,
        `CycleGAN.py:228`); a name/path -> that checkpoint; "auto" -> the
        Li-keep-rate selection heuristic (see PipelineConfig)."""
        from semtpu.train.checkpoint import latest_checkpoint
        cfg = self.cfg
        sel = cfg.cyclegan_checkpoint
        if not sel:
            return cfg.cyclegan_model_dir
        def is_ckpt(p):
            return os.path.isfile(os.path.join(p, "_CHECKPOINT_METADATA"))

        if sel != "auto":
            if is_ckpt(sel):
                return sel
            run = latest_checkpoint(cfg.cyclegan_model_dir) or cfg.cyclegan_model_dir
            path = os.path.join(run, sel)
            if not is_ckpt(path):
                raise FileNotFoundError(
                    f"cyclegan_checkpoint {sel!r} not found under {run}")
            return path
        return self._select_cyclegan_checkpoint_auto()

    def _select_cyclegan_checkpoint_auto(self, sample: int = 16) -> str:
        """Pick the saved checkpoint whose B->A renders keep the most mask
        pixels through the step-5 Li mean-intensity filter.

        Renders `sample` simulated masks with every checkpoint of the
        latest run and measures keep-rate = (mask pixels surviving
        `apply_mean_intensity_filter`) / (mask pixels). Dense, consistent
        renders keep ~0.5; washed-out late-epoch renders drop to ~0.3
        (round-2 measurement). Persists the per-checkpoint scores next to
        the checkpoints as `checkpoint_selection.csv`."""
        from semtpu.train.checkpoint import latest_checkpoint
        from semtpu.measure.filtering import apply_mean_intensity_filter
        cfg = self.cfg
        run = latest_checkpoint(cfg.cyclegan_model_dir)
        if run is None:
            return cfg.cyclegan_model_dir
        cands = sorted(e for e in os.listdir(run)
                       if (e == "model" or e.startswith("checkpoints_"))
                       and ".orbax-checkpoint-tmp" not in e
                       and os.path.isfile(os.path.join(
                           run, e, "_CHECKPOINT_METADATA")))
        if len(cands) <= 1:
            return cfg.cyclegan_model_dir
        files_b = get_image_file_paths_from_directory(cfg.train_b_dir)[:sample]
        masks = load_uint8_stack(files_b)
        trainer = self._cyclegan_trainer()
        trainer.create_state()
        best, best_rate, rows = None, -1.0, []
        for cand in cands:
            trainer.load(os.path.join(run, cand), params_only=True)
            fakes = trainer.run_inference_batched(masks, source_domain="B")
            kept = total = 0
            for k in range(len(masks)):
                mask = masks[k] if masks[k].ndim == 2 else masks[k][:, :, 0]
                filt = apply_mean_intensity_filter(
                    fakes[k], mask, dark_background=cfg.dark_background,
                    do_watershed_and_four_connectivity=False)
                kept += int((filt > 0).sum())
                total += int((mask > 127).sum())
            rate = kept / max(total, 1)
            rows.append((cand, rate))
            print(f"  checkpoint {cand}: Li keep-rate {rate:.3f}")
            if rate > best_rate:
                best, best_rate = cand, rate
        with open(os.path.join(run, "checkpoint_selection.csv"), "w") as fh:
            fh.write("checkpoint;li_keep_rate\n")
            for cand, rate in rows:
                fh.write(f"{cand};{rate:.5f}\n")
        print(f"  selected {best} (keep-rate {best_rate:.3f})")
        return os.path.join(run, best)

    def step_4_cyclegan_inference(self):
        cfg = self.cfg
        print("Step 4: Generating fake SEM images and pre-segmenting real images...")
        trainer = getattr(self, "_cyclegan", None)
        if trainer is None or cfg.cyclegan_checkpoint:
            # an explicit/auto checkpoint choice overrides the in-process
            # final-epoch state left by step 3
            if trainer is None:
                trainer = self._cyclegan_trainer()
                trainer.create_state()
            # inference-only: skip pools/optimizer state (5x less upload)
            trainer.load(self._resolve_cyclegan_checkpoint(), params_only=True)
            self._cyclegan = trainer

        # B -> A: render all simulated masks as fake SEM images (tiles),
        # batched and uint8 end-to-end
        files_b = get_image_file_paths_from_directory(cfg.train_b_dir)
        masks = load_uint8_stack(files_b)
        trainer.run_inference_batched(masks, cfg.generated_a_dir, files_b,
                                      source_domain="B")

        # A -> B: pre-segment the real images
        files_a = get_image_file_paths_from_directory(cfg.input_dir_images)
        images = load_and_preprocess_images(files_a, normalization_range=(-1, 1))
        trainer.run_inference(images, cfg.generated_b_dir, files_a,
                              source_domain="A",
                              tile_images=not cfg.run_inference_on_whole_image,
                              min_overlap=cfg.min_overlap,
                              manage_overlap_mode=cfg.manage_overlap_mode)

    # ------------------------------------------------------------- step 5
    def step_5_filter_masks(self):
        cfg = self.cfg
        print("Step 5: Postprocessing CycleGAN output images...")
        filter_gan_masks(img_path=cfg.generated_a_dir,
                         msk_path=cfg.train_b_dir,
                         out_path=cfg.filtered_masks_dir,
                         gaussian_blur_amount=cfg.gaussian_blur_amount,
                         do_watershed_and_four_connectivity=False,
                         dark_background=cfg.dark_background)
        filter_gan_masks(img_path=cfg.input_dir_images,
                         msk_path=cfg.generated_b_dir,
                         out_path=cfg.output_dir_cyclegan,
                         do_watershed_and_four_connectivity=True,
                         dark_background=cfg.dark_background)

    # ------------------------------------------------------------- step 6
    def _unet_trainer(self):
        from semtpu.train.unet import UNetTrainer, UNetConfig
        cfg = self.cfg
        ucfg = UNetConfig(filters=cfg.unet_filters,
                          batch_size=cfg.unet_batch_size,
                          grad_microbatches=cfg.unet_grad_microbatches,
                          epochs=cfg.unet_epochs,
                          tile_h=cfg.tile_size_h, tile_w=cfg.tile_size_w,
                          contrast_optimization_range=cfg.unet_contrast_optimization_range,
                          bn_momentum=cfg.unet_bn_momentum,
                          use_brightness_contrast_augmentation=(
                              cfg.unet_use_brightness_contrast_augmentation),
                          stream_from_host=cfg.use_dataloader,
                          checkpoint_monitor=cfg.unet_checkpoint_monitor,
                          early_stopping_patience=cfg.unet_early_stopping_patience,
                          seed=cfg.seed)
        return UNetTrainer(ucfg, mesh=self.mesh)

    def step_6a_train_unet(self):
        from semtpu.data.dataset import SegmentationDataset
        cfg = self.cfg
        print("Step 6a: Training MultiRes UNet...")
        img_files = get_image_file_paths_from_directory(cfg.generated_a_dir)
        pairs = [(f, os.path.join(cfg.filtered_masks_dir, os.path.basename(f)))
                 for f in img_files]
        pairs = [(i, m) for i, m in pairs if os.path.isfile(m)]
        imgs = load_uint8_stack([p[0] for p in pairs])
        masks = load_uint8_stack([p[1] for p in pairs])
        i_pre = dict(normalization_range=(0, 1),
                     contrast_optimization_range=cfg.unet_contrast_optimization_range)
        m_pre = dict(normalization_range=(0, 1), threshold=0.5)
        train_ds = SegmentationDataset(imgs, masks, "train",
                                       image_preproc=i_pre, mask_preproc=m_pre)
        val_ds = SegmentationDataset(imgs, masks, "val",
                                     image_preproc=i_pre, mask_preproc=m_pre)
        trainer = self._unet_trainer()
        model_dir, start_epoch = self._train_run_dir(
            cfg.unet_model_dir, cfg.unet_resume, trainer)
        trainer.fit(train_ds, val_ds, model_dir=model_dir,
                    checkpoint_every=cfg.unet_checkpoint_every,
                    start_epoch=start_epoch)
        self._unet = trainer
        return trainer

    def step_6b_unet_inference(self):
        cfg = self.cfg
        print("Step 6b: Segmenting real images with UNet...")
        trainer = getattr(self, "_unet", None)
        if trainer is None:
            trainer = self._unet_trainer()
            trainer.load(cfg.unet_model_dir)
            self._unet = trainer
        files = get_image_file_paths_from_directory(cfg.input_dir_images)
        images = load_and_preprocess_images(
            files, normalization_range=(0, 1),
            contrast_optimization_range=cfg.unet_contrast_optimization_range)
        trainer.run_inference(images, files, cfg.output_dir_unet,
                              tile_images=not cfg.run_inference_on_whole_image,
                              threshold=cfg.unet_threshold,
                              watershed_lines=cfg.unet_watershed_lines,
                              min_distance=cfg.unet_min_distance,
                              min_overlap=cfg.min_overlap,
                              manage_overlap_mode=cfg.manage_overlap_mode,
                              zero_bottom_rows=cfg.metadata_bar_rows,
                              tta_flips=cfg.unet_tta_flips,
                              tta_dihedral=cfg.unet_tta_dihedral)

    # ------------------------------------------------------------- step 7
    def step_7_classify_and_measure(self):
        """Optional second-stage classifier over the UNet raw maps:
        auto-filter particles by mean class score and write the
        `Results_*.csv` size table (`Predict_Classes_And_Measure.py:300-357`).
        No-op unless `classifier_model_dir` is configured."""
        cfg = self.cfg
        if not cfg.classifier_model_dir:
            print("Step 7: no classifier_model_dir configured — skipping.")
            return
        print("Step 7: Classifying and measuring UNet segmentations...")
        from semtpu.classify import main as classify_main
        import shutil as _sh
        # the classification-only contract wants <masks_root>/<tag>/<stem>.tif
        masks_root = os.path.join(cfg.root_dir, "Masks_Predicted")
        tag_dir = os.path.join(masks_root, "UNet")
        os.makedirs(tag_dir, exist_ok=True)
        for f in os.listdir(cfg.output_dir_unet):
            if f.endswith("_raw.tif"):
                _sh.copy(os.path.join(cfg.output_dir_unet, f),
                         os.path.join(tag_dir, f.replace("_raw", "")))
        h = None
        files = get_image_file_paths_from_directory(cfg.input_dir_images)
        if files:
            from PIL import Image as PILImage
            h = PILImage.open(files[0]).height - cfg.metadata_bar_rows
        classify_main([
            "classification-only",
            "--classifier", cfg.classifier_model_dir,
            "--classifier-filters", str(cfg.classifier_filters),
            "--images", cfg.input_dir_images,
            "--output", cfg.root_dir,
            "--masks-root", masks_root,
            "--threshold", str(cfg.classifier_score_threshold),
            "--tile-h", str(cfg.tile_size_h), "--tile-w", str(cfg.tile_size_w),
        ] + (["--image-height", str(h)] if h else []))

    # ---------------------------------------------------------------- all
    STEPS = {
        "0": "step_0_prepare",
        "1": "step_1_train_wgan",
        "2": "step_2_simulate_masks",
        "3": "step_3_train_cyclegan",
        "4": "step_4_cyclegan_inference",
        "5": "step_5_filter_masks",
        "6a": "step_6a_train_unet",
        "6b": "step_6b_unet_inference",
        "7": "step_7_classify_and_measure",
    }

    def run(self, steps: list[str] | None = None):
        """Run the given steps (default: all). With
        `cfg.skip_completed_steps`, steps recorded in
        `<root>/.completed_steps` are skipped and each step is recorded
        there as it finishes — so re-running the SAME command after an
        interruption (the `run_with_retry` flow) redoes only unfinished
        work, with steps 3/6a additionally auto-resuming mid-run. Default
        off: re-running a step deliberately retrains it (reference
        semantics)."""
        print(f"Start: {datetime.now()}")
        marker = os.path.join(self.cfg.root_dir, ".completed_steps")
        done = set()
        if self.cfg.skip_completed_steps and os.path.isfile(marker):
            done = set(open(marker).read().split())
        for s in steps or list(self.STEPS):
            if s in done:
                print(f"Step {s}: already completed, skipping "
                      f"(skip_completed_steps)")
                continue
            t0 = time.time()
            getattr(self, self.STEPS[s])()
            dt = time.time() - t0
            # per-step wall clock, appended so resumed runs keep history
            # (reference only prints start/end stamps, StartProcess.py:179,221)
            with open(os.path.join(self.cfg.root_dir, "timings.txt"),
                      "a") as fh:
                fh.write(f"{datetime.now():%Y-%m-%d %H:%M:%S} step {s} "
                         f"{dt:.1f} s\n")
            print(f"Step {s} took {dt:.1f} s")
            if self.cfg.skip_completed_steps:
                with open(marker, "a") as fh:
                    fh.write(s + "\n")
        print(f"Finished: {datetime.now()}")
