"""MultiRes-UNet training + tiled inference (the pipeline's step 6).

Replaces the reference harness (`UNet_Segmentation.py:147-351`):

- class-balanced weighted BCE with the dataset-derived weighting
- Adam(1e-3) with step decay x0.5 / 10 epochs (or linear decay)
- best-loss checkpointing + CSV epoch log (same columns)
- inference: tiled (batched across ALL tiles at once — the reference runs
  tiles one at a time at batch size 1, `UNet_Segmentation.py:339`) or
  whole-image (shape-polymorphic module, no rebuild+weight-copy), followed
  by the on-device threshold/Otsu + watershed + 4-connectivity stack.

The train step is a single jitted computation over the data-parallel mesh:
batches sharded on 'data', parameters replicated, gradient all-reduce
inserted by XLA.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from semtpu.models.multires_unet import MultiResUNet
from semtpu.core.tiling import tile_image, stitch_image
from semtpu.data.dataset import SegmentationDataset, apply_flip
from semtpu.ops import segment, eight_to_four_connected
from semtpu.parallel import get_mesh, shard_batch, replicate
from semtpu.train.losses import weighted_bce
from semtpu.train.schedules import step_decay_schedule, linear_decay_schedule
from semtpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                     latest_checkpoint, truncate_epoch_csv,
                                     fetch_packed)


class TrainState(train_state.TrainState):
    batch_stats: Any = None


@dataclass
class UNetConfig:
    filters: int = 16
    output_channels: int = 1
    batch_size: int = 5
    epochs: int = 50
    learning_rate: float = 1e-3
    lr_decay: str | float = "STEP_DECAY"   # STEP_DECAY | LINEAR_DECAY | weight-decay float
    tile_h: int = 384
    tile_w: int = 384
    contrast_optimization_range: tuple = (0.5, 99.5)
    # randomized percentile-window contrast augmentation on training images
    # (`UNet_Segmentation.py:83-87`); applied on device inside the gather
    use_brightness_contrast_augmentation: bool = False
    # host-streaming data path (the reference's use_dataloader): the raw
    # uint8 dataset stays in host RAM and only each scan-chunk's slice is
    # uploaded, so HBM holds one chunk instead of the whole dataset. Use
    # for datasets beyond the HBM budget; device-resident is faster.
    stream_from_host: bool = False
    # which metric drives the checkpoint_lowest_loss snapshot: "loss"
    # (train loss — the reference's rule, `UNet_Segmentation.py:262-264`)
    # or "val_loss" (better generalization to the real domain: the UNet
    # overfits the synthetic CycleGAN renders after ~10 epochs while the
    # train loss keeps falling — measured in round 2, RESULTS.md)
    checkpoint_monitor: str = "loss"
    # stop training after this many epochs without monitored-metric
    # improvement; 0 disables (reference behavior: always run all epochs)
    early_stopping_patience: int = 0
    bn_momentum: float = 0.99
    # split each optimizer step's batch into M sequentially-scanned
    # gradient microbatches (batch_size % M == 0). Round-4 finding
    # (PROFILE_UNET.json): the fused backward pass materializes
    # bf16[N,384,384,16] temps that XLA layout-pads N->16 and C->128
    # (576 MB each), so train batches >= 10 fail to compile on a 16 GB
    # chip. M microbatches keep every temp at the compiling bs<=8 shape
    # while the OPTIMIZER step sees the full batch: gradients accumulate
    # to exactly the full-batch mean (valid-sample weighted), metrics
    # aggregate identically; only BatchNorm moments are computed per
    # microbatch (training-at-b statistics, standard grad-accumulation
    # semantics). 1 disables.
    grad_microbatches: int = 1
    compute_dtype: Any = jnp.bfloat16
    seed: int = 0


class UNetTrainer:
    def __init__(self, config: UNetConfig | None = None, mesh=None):
        self.config = config or UNetConfig()
        self.mesh = mesh if mesh is not None else get_mesh()
        self.model = MultiResUNet(filters=self.config.filters,
                                  output_channels=self.config.output_channels,
                                  bn_momentum=self.config.bn_momentum,
                                  dtype=self.config.compute_dtype)
        self.state: TrainState | None = None
        self._weighting = 1.0
        self._steps_per_epoch = 1

    # -- state ---------------------------------------------------------------
    def create_state(self, weighting: float, steps_per_epoch: int,
                     sample_shape=None) -> TrainState:
        cfg = self.config
        self._weighting = float(weighting)
        if sample_shape is None:
            sample_shape = (1, cfg.tile_h, cfg.tile_w, 1)
        rng = jax.random.PRNGKey(cfg.seed)
        variables = jax.jit(partial(self.model.init, train=False))(
            rng, jnp.zeros(sample_shape, jnp.float32))

        self._steps_per_epoch = int(steps_per_epoch)
        tx = self._build_tx(steps_per_epoch)

        state = TrainState.create(apply_fn=self.model.apply,
                                  params=variables["params"], tx=tx,
                                  batch_stats=variables["batch_stats"])
        self.state = replicate(state, self.mesh)
        return self.state

    def _shard_constraint(self, x):
        """Constrain a gathered batch to the data-parallel sharding."""
        if len(self.mesh.devices.reshape(-1)) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P("data"))
            return jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, sh), x)
        return x

    # -- steps ---------------------------------------------------------------
    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, images_all, masks_all, img_idx, aug,
                   key=None, valid=None):
        """One step; batches are gathered ON DEVICE from the resident
        dataset arrays (only the tiny index vectors cross the host link).

        `valid` (B,) marks real samples when the batch was padded up to a
        multiple of the mesh size: losses/gradients/metrics reduce over
        valid samples only, so the EFFECTIVE global batch is exactly the
        configured one on any mesh. Padded rows repeat real samples (they
        only influence the BatchNorm running statistics, a resample of the
        same batch)."""
        from semtpu.train.losses import masked_mean
        images = self._shard_constraint(images_all.gather_train(img_idx, key))
        masks = self._shard_constraint(masks_all.gather(img_idx))
        images = apply_flip(images, aug)
        masks = apply_flip(masks, aug)
        w = self._weighting

        def loss_fn(params):
            preds, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            loss = weighted_bce(masks, preds, w, valid)
            return loss, (preds, updates["batch_stats"])

        (loss, (preds, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        metrics = {
            "loss": loss,
            "mae": masked_mean(jnp.abs(masks - preds), valid),
            "acc": masked_mean((preds > 0.5) == (masks > 0.5), valid),
        }
        return state, metrics

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_steps_scan(self, state: TrainState, images_all, masks_all,
                         img_idx, aug, key=None, valid=None):
        """K training steps in ONE executable via lax.scan.

        img_idx/aug: (K, B). Dispatch latency dominates per-step cost on
        remote/tunneled runtimes (and is non-trivial everywhere); scanning K
        steps per dispatch amortizes it K-fold. Returns summed metrics.
        `key` seeds the per-step brightness/contrast augmentation draws.
        `valid` (B,) masks padded samples (see train_step).
        """
        from semtpu.train.losses import masked_mean
        w = self._weighting
        step_keys = (jax.random.split(key, img_idx.shape[0])
                     if key is not None else jnp.zeros((img_idx.shape[0], 2),
                                                       jnp.uint32))

        M = self.config.grad_microbatches

        def body(state, xs):
            idx, a, k = xs
            k = k if (images_all.aug_contrast and key is not None) else None
            if M <= 1:
                images = apply_flip(
                    self._shard_constraint(images_all.gather_train(idx, k)), a)
                masks = apply_flip(self._shard_constraint(masks_all.gather(idx)), a)

                def loss_fn(params):
                    preds, updates = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        images, train=True, mutable=["batch_stats"])
                    return (weighted_bce(masks, preds, w, valid),
                            (preds, updates["batch_stats"]))

                (loss, (preds, new_stats)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(grads=grads).replace(
                    batch_stats=new_stats)
                m = jnp.stack([loss, masked_mean(jnp.abs(masks - preds), valid),
                               masked_mean((preds > 0.5) == (masks > 0.5), valid)])
                return state, m

            # -- gradient microbatching (cfg.grad_microbatches > 1) --------
            # inner scan over M microbatches of b = B/M samples each: every
            # forward/backward runs at batch b (below the bs>=10 layout-
            # padding compile wall, PROFILE_UNET.json), the optimizer step
            # runs once at the full batch. Per-microbatch losses/metrics
            # are scaled by (valid samples in microbatch / valid in batch),
            # so their SUM is the exact valid-weighted mean over the batch
            # and the accumulated gradient is the exact valid-weighted mean
            # of per-microbatch gradients (BatchNorm normalizes each
            # microbatch by its own moments — "train at batch b with M-step
            # gradient averaging", standard grad-accumulation semantics).
            B = idx.shape[0]
            if B % M:
                raise ValueError(f"batch {B} not divisible by "
                                 f"grad_microbatches {M}")
            b = B // M
            v_full = (valid if valid is not None
                      else jnp.ones((B,), jnp.float32))
            v_total = jnp.maximum(jnp.sum(v_full), 1.0)

            def micro(carry, mxs):
                grads_acc, stats, m_acc = carry
                midx, ma, mv, j = mxs
                mk = jax.random.fold_in(k, j) if k is not None else None
                images = apply_flip(self._shard_constraint(
                    images_all.gather_train(midx, mk)), ma)
                masks = apply_flip(self._shard_constraint(
                    masks_all.gather(midx)), ma)
                v_mb = jnp.sum(mv)
                scale = v_mb / v_total

                def loss_fn(params):
                    preds, updates = state.apply_fn(
                        {"params": params, "batch_stats": stats},
                        images, train=True, mutable=["batch_stats"])
                    loss = weighted_bce(masks, preds, w, mv)
                    return loss * scale, (loss, preds, updates["batch_stats"])

                (_, (loss, preds, new_stats)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                m = jnp.stack([loss,
                               masked_mean(jnp.abs(masks - preds), mv),
                               masked_mean((preds > 0.5) == (masks > 0.5), mv)
                               ]) * scale
                return (grads_acc, new_stats, m_acc + m), None

            init = (jax.tree.map(jnp.zeros_like, state.params),
                    state.batch_stats, jnp.zeros((3,), jnp.float32))
            (grads, stats, m), _ = jax.lax.scan(
                micro, init,
                (idx.reshape(M, b), a.reshape(M, b),
                 v_full.reshape(M, b), jnp.arange(M)))
            state = state.apply_gradients(grads=grads).replace(
                batch_stats=stats)
            return state, m

        state, ms = jax.lax.scan(body, state, (img_idx, aug, step_keys))
        return state, jnp.sum(ms, axis=0)

    @partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, images_all, masks_all, img_idx, aug,
                  valid=None):
        from semtpu.train.losses import masked_mean
        images = self._shard_constraint(images_all.gather(img_idx))
        masks = self._shard_constraint(masks_all.gather(img_idx))
        images = apply_flip(images, aug)
        masks = apply_flip(masks, aug)
        preds = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        return {
            "loss": weighted_bce(masks, preds, self._weighting, valid),
            "mae": masked_mean(jnp.abs(masks - preds), valid),
            "acc": masked_mean((preds > 0.5) == (masks > 0.5), valid),
        }

    # -- fit -----------------------------------------------------------------
    def fit(self, train_ds: SegmentationDataset, val_ds: SegmentationDataset | None = None,
            model_dir: str | None = None, log_every: int = 0,
            checkpoint_every: int = 0, start_epoch: int = 0) -> dict:
        """Train for `cfg.epochs` epochs. `checkpoint_every=K` saves a full
        resume checkpoint (optimizer + best-loss monitor + patience state)
        as `checkpoints_NNN` every K epochs; `start_epoch > 0` resumes an
        interrupted run after `self.load(checkpoints_{start_epoch:03d})` —
        skipped epochs replay their host-RNG draws (shuffles + aug keys),
        so the continuation is bit-identical to an uninterrupted run
        (`tests/test_resume.py`)."""
        cfg = self.config
        n_dev = len(self.mesh.devices.reshape(-1))
        # the EFFECTIVE global batch is exactly cfg.batch_size on any mesh:
        # the physical batch pads up to a multiple of the device count with
        # repeated samples that a `valid` mask removes from every loss,
        # gradient, and metric (an 8-device run trains the same operating
        # point as the single-chip run that set the quality numbers)
        gb = cfg.batch_size
        bs = -(-gb // n_dev) * n_dev
        pad = bs - gb
        valid = (jnp.asarray(np.concatenate([np.ones(gb, np.float32),
                                             np.zeros(pad, np.float32)]))
                 if pad else None)
        steps_per_epoch = max(len(train_ds) // gb, 1)

        if self.state is None:
            h, w = train_ds.images.shape[1:3]
            self.create_state(train_ds.class_weighting(), steps_per_epoch,
                              sample_shape=(1, h, w, 1))

        rng = np.random.default_rng(cfg.seed)
        # per-chunk augmentation keys are built on HOST (raw uint32 pairs ==
        # old-style PRNG keys) so no extra device dispatch rides every chunk
        aug_rng = np.random.default_rng(cfg.seed + 7)
        history = {"loss": [], "val_loss": [], "mae": [], "acc": [],
                   "val_mae": [], "val_acc": []}
        monitor = cfg.checkpoint_monitor
        if monitor not in ("loss", "val_loss"):
            raise ValueError(f"checkpoint_monitor must be 'loss' or "
                             f"'val_loss', got {monitor!r}")
        if monitor == "val_loss" and (val_ds is None or len(val_ds) == 0):
            monitor = "loss"   # no validation split to monitor
        best_loss = np.inf
        epochs_since_best = 0
        best_weights = None
        if start_epoch:
            restored = getattr(self, "_restored_monitor", {})
            best_loss = float(restored.get("best_loss", np.inf))
            epochs_since_best = int(restored.get("epochs_since_best", 0))
            if "best_params" in restored:
                best_weights = (restored["best_params"],
                                restored["best_batch_stats"])
        if start_epoch > cfg.epochs:
            raise ValueError(
                f"start_epoch {start_epoch} > epochs {cfg.epochs}: the "
                "resumed run has nothing to train — raise epochs to the "
                "interrupted run's budget, or start a fresh run")
        csv_path = os.path.join(model_dir, "training_log.csv") if model_dir else None
        if csv_path:
            os.makedirs(model_dir, exist_ok=True)
            if start_epoch and os.path.isfile(csv_path):
                truncate_epoch_csv(csv_path, start_epoch)
            else:
                with open(csv_path, "a") as fh:
                    fh.write("epoch;loss;mae;acc;val_loss;val_mae;val_acc;seconds\n")

        # training data lives on device for the whole run (per step only the
        # index vectors cross the host link) — or stays in host RAM with
        # per-chunk uploads when streaming
        from semtpu.data.dataset import (as_device_images, DeviceImages,
                                         slice_device_images)
        streaming = cfg.stream_from_host
        if streaming:
            if train_ds.images.dtype != np.uint8 or train_ds.masks.dtype != np.uint8:
                raise ValueError(
                    "stream_from_host requires raw uint8 datasets with "
                    "loader-preproc dicts (float32 streams would ship 4x "
                    "the bytes); load with preproc specs instead")
            host_imgs = DeviceImages.from_uint8(
                train_ds.images, host=True,
                aug_contrast=cfg.use_brightness_contrast_augmentation,
                **(train_ds.image_preproc or {}))
            host_masks = DeviceImages.from_uint8(
                train_ds.masks, host=True, **(train_ds.mask_preproc or {}))
            dev_imgs = dev_masks = None
        else:
            dev_imgs = as_device_images(
                train_ds.images, self.mesh, train_ds.image_preproc,
                aug_contrast=cfg.use_brightness_contrast_augmentation)
            dev_masks = as_device_images(train_ds.masks, self.mesh,
                                         train_ds.mask_preproc)
        dev_val = None
        if val_ds is not None and len(val_ds) > 0:
            dev_val = (as_device_images(val_ds.images, self.mesh, val_ds.image_preproc),
                       as_device_images(val_ds.masks, self.mesh, val_ds.mask_preproc))

        keys = ("loss", "mae", "acc")
        if len(train_ds) < gb:
            raise ValueError(
                f"dataset ({len(train_ds)} items) yields no full batch at "
                f"batch size {gb}; add data or reduce batch_size")

        def pad_batch(rows):
            """(n, gb, ...) -> (n, bs, ...) by cycling real samples."""
            if not pad:
                return rows
            extra = rows[:, np.arange(pad) % gb]
            return np.concatenate([rows, extra], axis=1)

        SCAN_CHUNK = 16   # steps per dispatch (amortizes launch latency)
        for epoch in range(cfg.epochs):
            n_steps = len(train_ds) // gb
            idx = train_ds.index.copy()
            rng.shuffle(idx)
            if epoch < start_epoch:
                # completed before the interruption: replay this epoch's
                # aug-key draws without any device work
                for _ in range(0, n_steps, SCAN_CHUNK):
                    aug_rng.integers(0, 2**32, size=2, dtype=np.uint32)
                continue
            t0 = time.time()
            msum = jnp.zeros(len(keys))
            idx = pad_batch(idx[:n_steps * gb].reshape(n_steps, gb, 2))
            for c0 in range(0, n_steps, SCAN_CHUNK):
                chunk = idx[c0:c0 + SCAN_CHUNK]
                sub = jnp.asarray(aug_rng.integers(0, 2**32, size=2,
                                                   dtype=np.uint32))
                if streaming:
                    sel = chunk[:, :, 0].reshape(-1)
                    ch_imgs = slice_device_images(host_imgs, sel)
                    ch_masks = slice_device_images(host_masks, sel)
                    local = np.arange(sel.size, dtype=np.int32).reshape(
                        chunk.shape[0], bs)
                    self.state, sums = self.train_steps_scan(
                        self.state, ch_imgs, ch_masks, jnp.asarray(local),
                        jnp.asarray(chunk[:, :, 1]), sub, valid)
                else:
                    self.state, sums = self.train_steps_scan(
                        self.state, dev_imgs, dev_masks,
                        jnp.asarray(chunk[:, :, 0]),
                        jnp.asarray(chunk[:, :, 1]), sub, valid)
                msum = msum + sums
            train_m = dict(zip(keys, np.asarray(jax.device_get(msum)) / n_steps))

            val_m = {}
            if dev_val is not None:
                vsum = jnp.zeros(len(keys))
                vidx = val_ds.index
                n_v = 0
                for b in range(max(len(vidx) // gb, 0)):
                    sel = pad_batch(vidx[b * gb:(b + 1) * gb][None])[0]
                    metrics = self.eval_step(self.state, dev_val[0], dev_val[1],
                                             jnp.asarray(sel[:, 0]),
                                             jnp.asarray(sel[:, 1]), valid)
                    vsum = vsum + jnp.stack([metrics[k] for k in keys])
                    n_v += 1
                if n_v:
                    val_m = {f"val_{k}": v for k, v in zip(
                        keys, np.asarray(jax.device_get(vsum)) / n_v)}

            dt = time.time() - t0
            for k in ("loss", "mae", "acc"):
                history[k].append(train_m[k])
                history[f"val_{k}"].append(val_m.get(f"val_{k}", np.nan))
            if csv_path:
                with open(csv_path, "a") as fh:
                    fh.write(f"{epoch};{train_m['loss']};{train_m['mae']};{train_m['acc']};"
                             f"{val_m.get('val_loss', '')};{val_m.get('val_mae', '')};"
                             f"{val_m.get('val_acc', '')};{dt:.2f}\n")
            if log_every and epoch % log_every == 0:
                print(f"epoch {epoch}: loss={train_m['loss']:.4f} "
                      f"val_loss={val_m.get('val_loss', float('nan')):.4f} ({dt:.1f}s)")

            monitored = (train_m["loss"] if monitor == "loss"
                         else val_m.get("val_loss", train_m["loss"]))
            improved = monitored < best_loss
            if improved:
                best_loss = monitored
                epochs_since_best = 0
                if monitor == "val_loss":
                    # keep the best-val weights to restore at the end (the
                    # final `model` save is what inference loads)
                    best_weights = (jax.device_get(self.state.params),
                                    jax.device_get(self.state.batch_stats))
                if model_dir:
                    # weights-only: a best-model snapshot, not a resume point
                    self.save(os.path.join(model_dir, "checkpoint_lowest_loss"),
                              include_opt=False)
            else:
                epochs_since_best += 1
            if model_dir and checkpoint_every and (epoch + 1) % checkpoint_every == 0:
                extra = {"best_loss": np.float32(best_loss),
                         "epochs_since_best": np.int32(epochs_since_best)}
                if best_weights is not None:
                    # best weights must live IN this checkpoint: the
                    # checkpoint_lowest_loss snapshot keeps being
                    # overwritten after this save, so at restore time it
                    # can reflect a LATER epoch than this checkpoint —
                    # reusing it would break the bit-identical-resume
                    # contract exactly when an improvement lands between
                    # the cadence save and the interruption
                    extra["best_params"] = best_weights[0]
                    extra["best_batch_stats"] = best_weights[1]
                self.save(os.path.join(model_dir, f"checkpoints_{epoch + 1:03d}"),
                          extra=extra)
            if (not improved and cfg.early_stopping_patience
                    and epochs_since_best >= cfg.early_stopping_patience):
                print(f"early stop at epoch {epoch}: no {monitor} "
                      f"improvement in {epochs_since_best} epochs "
                      f"(best {best_loss:.4f})")
                break

        if best_weights is not None:
            # val-loss monitoring restores the best-val weights so the final
            # `model` (what step-6b inference loads) IS the selected model;
            # its optimizer state remains the last epoch's (resume restarts
            # from the restored weights, not the overfit tail)
            self.state = self.state.replace(
                params=replicate(best_weights[0], self.mesh),
                batch_stats=replicate(best_weights[1], self.mesh))
        if model_dir:
            self.save(os.path.join(model_dir, "model"))
        return history

    def _build_tx(self, steps_per_epoch: int):
        cfg = self.config
        if isinstance(cfg.lr_decay, float):
            return optax.adamw(cfg.learning_rate, weight_decay=cfg.lr_decay)
        if cfg.lr_decay == "LINEAR_DECAY":
            return optax.adam(linear_decay_schedule(cfg.learning_rate,
                                                    steps_per_epoch, cfg.epochs))
        return optax.adam(step_decay_schedule(cfg.learning_rate, steps_per_epoch))

    # -- persistence ---------------------------------------------------------
    def save(self, path: str, include_opt: bool = True,
             extra: dict | None = None):
        """Checkpoint. `include_opt=True` (default) persists optimizer
        moments + step + schedule geometry, so `load` resumes EXACTLY;
        False writes a weights-only snapshot (3x smaller). `extra` merges
        additional state into the payload (mid-run resume checkpoints use
        it for the best-loss monitor / early-stop counters)."""
        dev = {"params": self.state.params,
               "batch_stats": self.state.batch_stats}
        if include_opt:
            dev["opt_state"] = self.state.opt_state
            dev["step"] = self.state.step
        # one transfer per dtype instead of leafwise (train/checkpoint.py)
        payload = fetch_packed(dev)
        payload["weighting"] = np.float32(self._weighting)
        if include_opt:
            payload["step"] = np.int32(payload["step"])
            payload["steps_per_epoch"] = np.int32(self._steps_per_epoch)
        if extra:
            payload.update(extra)
        save_checkpoint(path, payload)

    def load(self, path_or_model_dir: str):
        """Restore a checkpoint. When optimizer state was saved, the
        optimizer (including the LR-schedule position) is reconstructed so
        continued training is EXACTLY the run that wrote the checkpoint;
        weights-only checkpoints restore with a fresh no-op optimizer
        (inference / fine-tune-from-weights)."""
        from semtpu.train.checkpoint import restructure_opt_state
        path = path_or_model_dir
        if not os.path.isdir(os.path.join(path, "params")) and os.path.isdir(path):
            # model dir: pick latest run, prefer final model over best-loss ckpt
            run = latest_checkpoint(path) or path
            for cand in ("model", "checkpoint_lowest_loss"):
                if os.path.isdir(os.path.join(run, cand)):
                    path = os.path.join(run, cand)
                    break
        payload = load_checkpoint(path)
        self._weighting = float(payload.get("weighting", 1.0))
        if "opt_state" in payload:
            self._steps_per_epoch = int(payload["steps_per_epoch"])
            tx = self._build_tx(self._steps_per_epoch)
            state = TrainState.create(apply_fn=self.model.apply,
                                      params=payload["params"], tx=tx,
                                      batch_stats=payload["batch_stats"])
            state = state.replace(
                step=jnp.asarray(payload["step"], jnp.int32),
                opt_state=restructure_opt_state(payload["opt_state"],
                                                state.opt_state))
        else:
            state = TrainState.create(apply_fn=self.model.apply,
                                      params=payload["params"],
                                      tx=optax.identity(),
                                      batch_stats=payload["batch_stats"])
        self.state = replicate(state, self.mesh)
        # monitor/early-stop state of a mid-run resume checkpoint, if any —
        # fit(start_epoch=...) picks it up so the best-loss tracking and
        # patience counter continue exactly
        self._restored_monitor = {
            k: payload[k] for k in ("best_loss", "epochs_since_best",
                                    "best_params", "best_batch_stats")
            if k in payload}
        return self.state

    # -- inference -----------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def _forward(self, state, images):
        return state.apply_fn({"params": state.params,
                               "batch_stats": state.batch_stats},
                              images, train=False)

    def predict_image(self, image: np.ndarray, tile_images: bool = True,
                      min_overlap: int = 2, manage_overlap_mode: int = 2,
                      tta_flips: bool = False,
                      tta_dihedral: bool = False) -> np.ndarray:
        """Raw sigmoid map for one (H, W, 1) image, tiled or whole.

        `tta_flips=True` averages the map over the 4-element flip group
        (identity / horizontal / vertical / both) — test-time augmentation
        matching the x4 flip set the trainer augments with
        (`UNet_Segmentation.py` flip augmentation). `tta_dihedral=True`
        extends to the full 8-element dihedral group (the 4 flips composed
        with a 90-degree rotation); non-square images recompile the forward
        once for the transposed shape. Extra capability beyond the
        reference (which predicts once); default off.
        """
        if image.ndim == 2:
            image = image[:, :, None]
        if not (tta_flips or tta_dihedral):
            return self._predict_once(image, tile_images, min_overlap,
                                      manage_overlap_mode)
        rots = (0, 1) if tta_dihedral else (0,)
        acc, n = None, 0
        for k in rots:
            base = np.rot90(image, k, axes=(0, 1))
            for fh, fv in ((False, False), (True, False),
                           (False, True), (True, True)):
                view = base[:, ::-1] if fh else base
                view = view[::-1] if fv else view
                out = self._predict_once(np.ascontiguousarray(view),
                                         tile_images, min_overlap,
                                         manage_overlap_mode)
                out = out[:, ::-1] if fh else out
                out = out[::-1] if fv else out
                out = np.rot90(out, -k, axes=(0, 1))
                acc = out if acc is None else acc + out
                n += 1
        return acc / float(n)

    def _predict_once(self, image: np.ndarray, tile_images: bool,
                      min_overlap: int, manage_overlap_mode: int) -> np.ndarray:
        cfg = self.config
        if tile_images:
            tiles = tile_image(image, cfg.tile_h, cfg.tile_w, min_overlap=min_overlap)
            preds = self._forward(self.state, tiles)   # all tiles in ONE batch
            out = stitch_image(preds, image.shape[1], image.shape[0],
                               min_overlap=min_overlap,
                               manage_overlap_mode=manage_overlap_mode)
        else:
            out = self._forward(self.state, image[None])[0]
        return np.asarray(out)

    def run_inference(self, images: np.ndarray, output_names: list[str] | None = None,
                      output_directory: str | None = None, tile_images: bool = True,
                      threshold: float = -1.0, watershed_lines: bool = True,
                      min_distance: int = 9, min_overlap: int = 2,
                      manage_overlap_mode: int = 2,
                      zero_bottom_rows: int = 0,
                      tta_flips: bool = False,
                      tta_dihedral: bool = False) -> list[np.ndarray]:
        """Full inference + instance postprocessing for a batch of images.

        Saves `<stem>_raw.tif` (raw float map) and `<stem>.tif` (binary
        instance mask) per image when `output_directory` is given — the
        reference's output contract (`UNet_Segmentation.py:344-351`).
        `zero_bottom_rows` clears an instrument metadata bar from the raw
        map before segmentation (reference crop convention [0:712, 0:1024],
        `Predict_Classes_And_Measure.py:27-28`).
        """
        from PIL import Image as PILImage
        results = []
        for i in range(len(images)):
            raw = self.predict_image(images[i], tile_images=tile_images,
                                     min_overlap=min_overlap,
                                     manage_overlap_mode=manage_overlap_mode,
                                     tta_flips=tta_flips,
                                     tta_dihedral=tta_dihedral)[:, :, 0]
            if zero_bottom_rows > 0:
                raw = raw.copy()
                raw[raw.shape[0] - zero_bottom_rows:] = 0.0
            if output_directory and output_names:
                stem = os.path.splitext(os.path.basename(output_names[i]))[0]
                PILImage.fromarray(raw).save(
                    os.path.join(output_directory, stem + "_raw.tif"))
            u8 = raw - raw.min()
            u8 = (u8 / max(u8.max(), 1e-12) * 255).astype(np.uint8)
            inst = segment(u8, threshold=float(threshold),
                           apply_watershed=watershed_lines,
                           min_distance=min_distance, dark_background=True)
            inst = np.asarray(eight_to_four_connected(inst))
            if output_directory and output_names:
                stem = os.path.splitext(os.path.basename(output_names[i]))[0]
                PILImage.fromarray(inst).save(
                    os.path.join(output_directory, stem + ".tif"))
            results.append(inst)
        return results
