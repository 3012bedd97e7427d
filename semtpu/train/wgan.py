"""WGAN-GP training (pipeline step 1): particle-shape generator.

Parity with the reference harness + model
(`Releases/Version 1.2.0/WassersteinGAN.py:26-373,700-720`):

- 3 critic steps per generator step, gradient penalty weight 10
- gradient penalty on normal(0,1)-alpha-interpolated images (the reference
  draws alpha from a *normal*, not uniform, distribution —
  `WassersteinGAN.py:97` — preserved here)
- Adam(2e-4, beta1=0.5, beta2=0.9) for both nets
- input masks: 4x flip augmentation, binarize at 0.5, zero-pad to the max
  size rounded up to a multiple of 16, normalized to [-1, 1]
- metrics: d_loss, d_total_loss, g_loss, grad_penalty, grad_norm
- sample-grid monitor every N epochs + CSV log + final checkpoint

The whole (3 critic + 1 generator) update compiles into ONE jitted,
donated step over the data-parallel mesh; the penalty's grad-of-grad is a
plain `jax.grad` through the critic w.r.t. its input inside the critic's
loss, which XLA differentiates without the reference's GradientTape /
autograd backend split.
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
from flax import struct

from semtpu.models.wgan import WGANGenerator, WGANDiscriminator
from semtpu.data.dataset import ArrayDataset
from semtpu.parallel import get_mesh, shard_batch, replicate
from semtpu.train.losses import wasserstein_d_loss, wasserstein_g_loss
from semtpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                     latest_checkpoint, fetch_packed)


@struct.dataclass
class WGANState:
    g_params: Any
    g_stats: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


@dataclass
class WGANConfig:
    img_h: int = 64
    img_w: int = 64
    latent_dim: int = 128
    batch_size: int = 64
    epochs: int = 1000
    d_steps: int = 3
    gp_weight: float = 10.0
    learning_rate: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.9
    compute_dtype: Any = jnp.float32
    seed: int = 0


def prepare_mask_dataset(images: np.ndarray | list) -> tuple[np.ndarray, tuple[int, int]]:
    """Flip-augment x4 and zero-pad to max size rounded to a multiple of 16.

    `images`: list/array of (H, W, 1) masks already normalized to [-1, 1]
    and binarized (load with threshold_value=0.5, range (-1, 1)).
    Returns (stacked array, (H, W)).
    """
    imgs = []
    for im in images:
        imgs += [im, np.fliplr(im), np.flipud(im), np.flipud(np.fliplr(im))]
    max_h = max(im.shape[0] for im in imgs)
    max_w = max(im.shape[1] for im in imgs)
    max_h = -(-max_h // 16) * 16
    max_w = -(-max_w // 16) * 16
    out = np.full((len(imgs), max_h, max_w, 1), -1.0, dtype=np.float32)
    for i, im in enumerate(imgs):
        y0 = (max_h - im.shape[0]) // 2
        x0 = (max_w - im.shape[1]) // 2
        out[i, y0:y0 + im.shape[0], x0:x0 + im.shape[1], :] = im
    return out, (max_h, max_w)


class WGANTrainer:
    def __init__(self, config: WGANConfig | None = None, mesh=None):
        self.config = config or WGANConfig()
        self.mesh = mesh if mesh is not None else get_mesh()
        cfg = self.config
        self.generator = WGANGenerator(img_h=cfg.img_h, img_w=cfg.img_w,
                                       latent_dim=cfg.latent_dim,
                                       dtype=cfg.compute_dtype)
        self.discriminator = WGANDiscriminator(dtype=cfg.compute_dtype)
        self.g_tx = optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2)
        self.d_tx = optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2)
        self.state: WGANState | None = None

    def create_state(self) -> WGANState:
        cfg = self.config
        rng = jax.random.PRNGKey(cfg.seed)
        rg, rd = jax.random.split(rng)
        gvars = jax.jit(partial(self.generator.init, train=False))(
            rg, jnp.zeros((1, cfg.latent_dim)))
        dvars = jax.jit(partial(self.discriminator.init, train=False))(
            rd, jnp.zeros((1, cfg.img_h, cfg.img_w, 1)))
        state = WGANState(
            g_params=gvars["params"], g_stats=gvars["batch_stats"],
            d_params=dvars["params"],
            g_opt=self.g_tx.init(gvars["params"]),
            d_opt=self.d_tx.init(dvars["params"]),
            step=jnp.zeros((), jnp.int32))
        self.state = replicate(state, self.mesh)
        return self.state

    # -- forward helpers -----------------------------------------------------
    def _gen(self, params, stats, z, train):
        if train:
            return self.generator.apply({"params": params, "batch_stats": stats},
                                        z, train=True, mutable=["batch_stats"])
        return self.generator.apply({"params": params, "batch_stats": stats},
                                    z, train=False), None

    def _disc(self, params, x, rng, train):
        return self.discriminator.apply({"params": params}, x, train=train,
                                        rngs={"dropout": rng} if train else None)

    def _shard_constraint(self, x):
        if len(self.mesh.devices.reshape(-1)) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P("data"))
            return jax.lax.with_sharding_constraint(x, sh)
        return x

    # -- the fused (3 critic + 1 generator) step ------------------------------
    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: WGANState, data, idx, rng, valid=None):
        """One step; the batch is gathered ON DEVICE from the resident
        mask array (only the index vector crosses the host link).
        `valid` (B,) masks padded samples out of every loss/penalty term
        (exact configured-global-batch semantics on any mesh)."""
        from semtpu.train.losses import masked_mean
        real_images = self._shard_constraint(data.gather(idx))
        cfg = self.config
        batch = real_images.shape[0]

        def gradient_penalty(d_params, fake, real, key):
            alpha = jax.random.normal(key, (batch, 1, 1, 1))
            interp = real + alpha * (fake - real)

            def disc_sum(x):
                return jnp.sum(self._disc(d_params, x, key, True))

            grads = jax.grad(disc_sum)(interp)
            norm = jnp.sqrt(jnp.sum(grads ** 2, axis=(1, 2, 3)) + 1e-12)
            return (masked_mean((norm - 1.0) ** 2, valid),
                    masked_mean(norm, valid))

        g_params, g_stats, d_params = state.g_params, state.g_stats, state.d_params
        g_opt, d_opt = state.g_opt, state.d_opt
        d_cost = gp = gn = jnp.float32(0)

        keys = jax.random.split(rng, cfg.d_steps * 3 + 2)
        for i in range(cfg.d_steps):
            kz, kd, kgp = keys[3 * i], keys[3 * i + 1], keys[3 * i + 2]
            z = jax.random.normal(kz, (batch, cfg.latent_dim))
            (fake, g_updates) = self._gen(g_params, g_stats, z, True)
            fake, g_stats = fake, g_updates["batch_stats"]

            def d_loss_fn(dp):
                fake_logits = self._disc(dp, fake, kd, True)
                real_logits = self._disc(dp, real_images, kd, True)
                cost = wasserstein_d_loss(real_logits, fake_logits, valid)
                pen, norm = gradient_penalty(dp, fake, real_images, kgp)
                return cost + pen * cfg.gp_weight, (cost, pen, norm)

            (d_total, (d_cost, gp, gn)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_params)
            updates, d_opt = self.d_tx.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, updates)

        kz, kd = keys[-2], keys[-1]
        z = jax.random.normal(kz, (batch, cfg.latent_dim))

        def g_loss_fn(gp_):
            fake, g_updates = self._gen(gp_, g_stats, z, True)
            logits = self._disc(d_params, fake, kd, True)
            return wasserstein_g_loss(logits, valid), g_updates["batch_stats"]

        (g_loss, new_g_stats), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_params)
        updates, g_opt = self.g_tx.update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, updates)

        new_state = WGANState(g_params=g_params, g_stats=new_g_stats,
                              d_params=d_params, g_opt=g_opt, d_opt=d_opt,
                              step=state.step + 1)
        metrics = {"d_loss": d_cost, "d_total_loss": d_cost + gp * cfg.gp_weight,
                   "g_loss": g_loss, "grad_penalty": gp, "grad_norm": gn}
        return new_state, metrics

    @partial(jax.jit, static_argnums=0)
    def generate(self, state: WGANState, z):
        out, _ = self._gen(state.g_params, state.g_stats, z, False)
        return out

    def sample(self, n: int, seed: int = 0) -> np.ndarray:
        return np.asarray(self.sample_device(n, seed))

    def sample_device(self, n: int, seed: int = 0) -> jax.Array:
        """Samples as a DEVICE array (no host round-trip) — feed this to the
        mask simulator so generator outputs never cross the host link."""
        z = jax.random.normal(jax.random.PRNGKey(seed), (n, self.config.latent_dim))
        return self.generate(self.state, z)

    # -- fit ------------------------------------------------------------------
    def fit(self, dataset: ArrayDataset, model_dir: str | None = None,
            output_dir: str | None = None, monitor_every: int = 20,
            log_every: int = 0) -> dict:
        cfg = self.config
        if self.state is None:
            self.create_state()
        rng = np.random.default_rng(cfg.seed)
        key = jax.random.PRNGKey(cfg.seed + 1)
        history = {k: [] for k in ("d_loss", "d_total_loss", "g_loss",
                                   "grad_penalty", "grad_norm")}
        csv_path = os.path.join(model_dir, "training_log.csv") if model_dir else None
        if csv_path:
            os.makedirs(model_dir, exist_ok=True)
            with open(csv_path, "a") as fh:
                fh.write("epoch;" + ";".join(history) + ";seconds\n")

        n_dev = len(self.mesh.devices.reshape(-1))
        # effective global batch == the configured one on any mesh (small
        # mask sets are normal — a handful of user-drawn outlines x4 flips —
        # so clamp to one full-dataset batch like keras fit does); physical
        # batch pads to a multiple of the device count with a valid mask
        gb = min(cfg.batch_size, len(dataset))
        bs = -(-gb // n_dev) * n_dev
        pad = bs - gb
        valid = (jnp.asarray(np.concatenate([np.ones(gb, np.float32),
                                             np.zeros(pad, np.float32)]))
                 if pad else None)

        from semtpu.data.dataset import as_device_images
        dev_data = as_device_images(dataset.data, self.mesh, dataset.preproc)
        metric_keys = tuple(history)

        for epoch in range(cfg.epochs):
            t0 = time.time()
            msum = jnp.zeros(len(metric_keys))
            idx = rng.permutation(len(dataset.data))
            n_steps = len(idx) // gb
            for k_ in range(n_steps):
                key, sub = jax.random.split(key)
                row = idx[k_ * gb:(k_ + 1) * gb]
                if pad:
                    row = np.concatenate([row, row[np.arange(pad) % gb]])
                self.state, metrics = self.train_step(
                    self.state, dev_data, jnp.asarray(row), sub, valid)
                msum = msum + jnp.stack([metrics[kk] for kk in metric_keys])
            ep = dict(zip(metric_keys,
                          (np.asarray(jax.device_get(msum)) / n_steps).tolist()))
            for k in history:
                history[k].append(ep[k])
            if csv_path:
                with open(csv_path, "a") as fh:
                    fh.write(f"{epoch};" + ";".join(str(ep[k]) for k in history)
                             + f";{time.time() - t0:.2f}\n")
            if log_every and epoch % log_every == 0:
                print(f"epoch {epoch}: d={ep['d_loss']:.3f} g={ep['g_loss']:.3f} "
                      f"gp={ep['grad_penalty']:.3f}")
            if output_dir and monitor_every and epoch % monitor_every == 0:
                self._save_sample_grid(os.path.join(
                    output_dir, f"Epoch_{epoch:05d}.png"))

        if model_dir:
            self.save(os.path.join(model_dir, "model"))
        return history

    def _save_sample_grid(self, path: str, n: int = 9):
        from PIL import Image
        samples = self.sample(n)
        cols = 3
        rows = -(-n // cols)
        h, w = samples.shape[1:3]
        grid = np.zeros((rows * h, cols * w), np.uint8)
        for i in range(n):
            r, c = divmod(i, cols)
            grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = (
                samples[i, :, :, 0] * 127.5 + 127.5).astype(np.uint8)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(grid).save(path)

    # -- persistence ----------------------------------------------------------
    def save(self, path: str, include_opt: bool = True):
        """Checkpoint; `include_opt=True` persists both Adam states + step
        so `load` resumes training EXACTLY."""
        dev = {"g_params": self.state.g_params,
               "g_stats": self.state.g_stats,
               "d_params": self.state.d_params}
        if include_opt:
            dev["g_opt"] = self.state.g_opt
            dev["d_opt"] = self.state.d_opt
            dev["step"] = self.state.step
        # one transfer per dtype instead of leafwise (train/checkpoint.py)
        payload = fetch_packed(dev)
        if include_opt:
            payload["step"] = np.int32(payload["step"])
        save_checkpoint(path, payload)

    def load(self, path_or_model_dir: str):
        from semtpu.train.checkpoint import restructure_opt_state
        path = path_or_model_dir
        if os.path.isdir(path) and not os.path.isdir(os.path.join(path, "g_params")):
            run = latest_checkpoint(path) or path
            if os.path.isdir(os.path.join(run, "model")):
                path = os.path.join(run, "model")
        payload = load_checkpoint(path)
        g_opt = self.g_tx.init(payload["g_params"])
        d_opt = self.d_tx.init(payload["d_params"])
        if "g_opt" in payload:
            g_opt = restructure_opt_state(payload["g_opt"], g_opt)
            d_opt = restructure_opt_state(payload["d_opt"], d_opt)
        state = WGANState(g_params=payload["g_params"], g_stats=payload["g_stats"],
                          d_params=payload["d_params"],
                          g_opt=g_opt, d_opt=d_opt,
                          step=jnp.asarray(payload.get("step", 0), jnp.int32))
        self.state = replicate(state, self.mesh)
        return self.state
