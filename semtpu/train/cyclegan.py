"""CycleGAN training + inference (pipeline steps 3-4).

Parity with the reference harness/model
(`Releases/Version 1.2.0/CycleGAN.py:20-317,512-807`):

- two generators (A->B "mask head", B->A) + two PatchGAN discriminators
- LSGAN adversarial loss vs label-smoothed targets, cycle loss lambda=10
  each (MAE, or BCE for A->B when `use_binary_crossentropy`), identity loss
  0.5 * lambda_cycle
- Adam(2e-4, beta1=0.5) x4 with linear LR decay from epoch 0.75*E
- 50-image history pools feeding the discriminators
- 14 loss trackers, per-epoch checkpoints, CSV log, A-B-A / B-A-B monitor
  panels with mask-edge overlays
- inference: batched tile->forward->stitch (vs the reference's bs=1 per-tile
  loop, `CycleGAN.py:273`) or whole-image via the shape-polymorphic
  generator (no rebuild+weight-copy), invert option for bright-background
  (TEM) data, per-image min-max -> uint8 outputs

TPU-native details:
- the train step runs as four jitted stages (fakes, gen_a update, gen_b
  update, disc update): a single fused graph holding every forward and
  backward at 384^2 exceeds 15.75G HBM (activations of multiple backwards
  kept live) and overwhelms fragile compile services; the stages run
  back-to-back on device with no host syncs between them. Each generator's
  gradients flow through (but not into) the other network's outputs — the
  reference's persistent-GradientTape semantics (`CycleGAN.py:762-763`).
- bfloat16 activations with float32 parameters and InstanceNorm statistics.
- the image pools live on device inside the train state; the reference's
  host-side pool (`CycleGAN.py:908-964`) is a per-batch host sync. Pool
  semantics (sequential fill, then 50% swap-with-random-slot) are
  reproduced exactly with a lax.scan over the batch.
- training data is device-resident (uint8 + on-device decode); per step
  only index vectors cross the host link.
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

from semtpu.models.cyclegan import ResNetGenerator, PatchGANDiscriminator
from semtpu.core.tiling import tile_image, stitch_image
from semtpu.data.dataset import PairedDomainDataset
from semtpu.parallel import get_mesh, shard_batch, replicate
from semtpu.train.losses import (lsgan_real_loss, lsgan_fake_loss, mae_loss,
                                 binary_crossentropy)
from semtpu.train.schedules import cyclegan_linear_decay_schedule
from semtpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                     latest_checkpoint, truncate_epoch_csv,
                                     AsyncSaver, fetch_packed)


@struct.dataclass
class PoolState:
    images: Any          # (pool_size, H, W, C)
    num: jnp.ndarray     # scalar int32


@struct.dataclass
class CycleGANState:
    gen_a: Any
    gen_b: Any
    disc_a: Any
    disc_b: Any
    opt_ga: Any
    opt_gb: Any
    opt_da: Any
    opt_db: Any
    pool_a: PoolState
    pool_b: PoolState
    step: jnp.ndarray


@dataclass
class CycleGANConfig:
    tile_h: int = 384
    tile_w: int = 384
    channels: int = 1
    filters: int = 64
    num_downsampling_gen: int = 3
    num_residual_blocks: int = 9
    num_upsampling_gen: int = 3
    num_downsampling_disc: int = 2
    batch_size: int = 5
    epochs: int = 50
    learning_rate: float = 2e-4
    use_linear_decay: bool = True
    lambda_cycle_a: float = 10.0
    lambda_cycle_b: float = 10.0
    lambda_identity_a: float = 0.5
    lambda_identity_b: float = 0.5
    use_binary_crossentropy: bool = False
    use_skip_connection: bool = False
    use_resize_convolution: bool = False
    label_smoothing_factor: float = 0.0
    gaussian_noise_value: float = 0.0
    invert_images: bool = False
    image_pool_size: int = 50
    # full train steps per dispatch (lax.scan over the staged step with
    # optimization barriers between stages). Amortizes dispatch latency —
    # the dominant per-step cost on remote/tunneled runtimes. 1 = the
    # legacy 4-dispatch step.
    scan_steps: int = 8
    # host-streaming data path (the reference's `use_dataloader` applies to
    # the CycleGAN Sequence too, `CycleGAN.py:454-479`): both domains stay
    # in host RAM as raw uint8 + loader specs and only each scan-chunk's
    # slice is uploaded, so HBM holds one chunk instead of both domains.
    # Device-resident (default) is faster; use this past the HBM budget.
    stream_from_host: bool = False
    # activation rematerialization in the generators' backward passes:
    # "none" (store everything), "blocks" (remat each residual block),
    # "full" (remat whole generator forwards). The step is HBM-bound at
    # ~19% MFU, so recompute FLOPs are nearly free if they cut activation
    # traffic — measured by scripts/profile_cyclegan.py.
    remat: str = "none"
    # bfloat16 activations (f32 params + InstanceNorm stats): halves the
    # backward-pass HBM footprint at 384^2 and doubles MXU throughput.
    # NOTE: the four train-step stages stay SEPARATE executables — merging
    # them makes XLA keep multiple backward passes' activations alive
    # (20.4G > 15.75G HBM at 384^2 bs5 even in bf16).
    compute_dtype: Any = jnp.bfloat16
    # fuse same-parameter network applications inside the step into one
    # larger-batch application: the generator loss's three forwards
    # (adversarial, cycle, identity — same params, same shapes) run as ONE
    # batch-3B application, and each discriminator's real+pooled forwards
    # as ONE batch-2B application. InstanceNorm normalizes per sample, so
    # the fused math is identical per sample (gradients differ only in
    # float summation order); with gaussian_noise > 0 the discriminator
    # noise is drawn once for the fused batch instead of twice from the
    # same key, which changes the draw (arguably more faithful to the
    # reference's per-call keras GaussianNoise). Measured by
    # scripts/profile_cyclegan.py --fused.
    fused_applications: bool = False
    # overlap cadence checkpoint writes with training (AsyncSaver). OFF by
    # default: the on-device snapshot doubles the ~1.1 GB optimizer-bearing
    # state (pools included) and the background device->host fetch contends
    # with training dispatches — on the tunneled v5e this deterministically
    # RESOURCE_EXHAUSTED at the first cadence save (run_s2, 3x reproduced
    # 2026-08-19). Synchronous saves cost ~160 s each (~12% of step-3
    # wall-clock at cadence 10) but are the proven path.
    async_checkpoint: bool = False
    seed: int = 0

    def __post_init__(self):
        assert not (self.use_binary_crossentropy and
                    (self.lambda_identity_a > 0 or self.lambda_identity_b > 0)), \
            "binary crossentropy cannot be combined with identity mapping " \
            "(reference CycleGAN.py:71)"


class CycleGANTrainer:
    def __init__(self, config: CycleGANConfig | None = None, mesh=None):
        self.config = cfg = config or CycleGANConfig()
        self.mesh = mesh if mesh is not None else get_mesh()
        common = dict(filters=cfg.filters,
                      num_downsampling=cfg.num_downsampling_gen,
                      num_residual_blocks=cfg.num_residual_blocks,
                      num_upsampling=cfg.num_upsampling_gen,
                      out_channels=cfg.channels,
                      use_skip_connection=cfg.use_skip_connection,
                      use_resize_convolution=cfg.use_resize_convolution,
                      remat_blocks=cfg.remat == "blocks",
                      dtype=cfg.compute_dtype)
        # gen_a: A->B (masks); sigmoid head when BCE
        self.gen_a = ResNetGenerator(sigmoid_head=cfg.use_binary_crossentropy, **common)
        self.gen_b = ResNetGenerator(sigmoid_head=False, **common)
        disc_common = dict(filters=2 * cfg.filters,
                           num_downsampling=cfg.num_downsampling_disc,
                           gaussian_noise=cfg.gaussian_noise_value,
                           dtype=cfg.compute_dtype)
        self.disc_a = PatchGANDiscriminator(**disc_common)
        self.disc_b = PatchGANDiscriminator(**disc_common)
        self.state: CycleGANState | None = None
        self._tx = None
        self._steps_per_epoch = 1
        self._snapshot_fn = None

    # -- loss selections (reference create_model, CycleGAN.py:116-121) -------
    def _cycle_loss_a(self, y_true, y_pred, valid=None):
        from semtpu.train.losses import masked_mean
        if self.config.use_binary_crossentropy:
            return masked_mean(binary_crossentropy(y_true, y_pred), valid)
        return mae_loss(y_true, y_pred, valid)

    def _make_tx(self, steps_per_epoch: int):
        cfg = self.config
        if cfg.use_linear_decay:
            sched = cyclegan_linear_decay_schedule(cfg.learning_rate,
                                                   max(steps_per_epoch, 1),
                                                   cfg.epochs)
        else:
            sched = cfg.learning_rate
        return optax.adam(sched, b1=0.5)

    def create_state(self, steps_per_epoch: int = 1) -> CycleGANState:
        cfg = self.config
        self._steps_per_epoch = int(steps_per_epoch)
        self._tx = self._make_tx(steps_per_epoch)
        rng = jax.random.PRNGKey(cfg.seed)
        k = jax.random.split(rng, 4)
        shape = (1, cfg.tile_h, cfg.tile_w, cfg.channels)
        ga = jax.jit(self.gen_a.init)(k[0], jnp.zeros(shape))["params"]
        gb = jax.jit(self.gen_b.init)(k[1], jnp.zeros(shape))["params"]
        da = jax.jit(partial(self.disc_a.init, train=False))(k[2], jnp.zeros(shape))["params"]
        db = jax.jit(partial(self.disc_b.init, train=False))(k[3], jnp.zeros(shape))["params"]
        pool_shape = (cfg.image_pool_size, cfg.tile_h, cfg.tile_w, cfg.channels)
        state = CycleGANState(
            gen_a=ga, gen_b=gb, disc_a=da, disc_b=db,
            opt_ga=self._tx.init(ga), opt_gb=self._tx.init(gb),
            opt_da=self._tx.init(da), opt_db=self._tx.init(db),
            pool_a=PoolState(images=jnp.zeros(pool_shape), num=jnp.int32(0)),
            pool_b=PoolState(images=jnp.zeros(pool_shape), num=jnp.int32(0)),
            step=jnp.zeros((), jnp.int32))
        self.state = replicate(state, self.mesh)
        return self.state

    # -- pool (exact reference semantics, vectorized scan) --------------------
    def _pool_query(self, pool: PoolState, images, rng,
                    valid=None) -> tuple[jax.Array, PoolState]:
        """50%-swap history pool. `valid` (B,) skips padded batch samples
        entirely (no pool mutation, no RNG-history change for real
        samples), so a padded multi-device batch leaves the pool state
        exactly as the unpadded batch would."""
        size = self.config.image_pool_size
        if size == 0:
            return images, pool
        # The pool's storage dtype is authoritative (float32 by default;
        # a bf16-cast state, e.g. profile_cyclegan --modes bf16params, makes
        # it bfloat16) — cast incoming fakes so dynamic_update_slice always
        # sees matching dtypes.
        images = images.astype(pool.images.dtype)

        def step(carry, xs):
            imgs, num = carry
            img, key, ok = xs
            k1, k2 = jax.random.split(key)
            p = jax.random.uniform(k1)
            slot = jax.random.randint(k2, (), 0, size)

            def insert(_):
                new_imgs = jax.lax.dynamic_update_slice(
                    imgs, img[None], (num,) + (0,) * img.ndim)
                return (new_imgs, num + 1), img

            def swap(_):
                stored = imgs[slot]
                new_imgs = jax.lax.dynamic_update_slice(
                    imgs, img[None], (slot,) + (0,) * img.ndim)
                take_stored = p > 0.5
                out = jnp.where(take_stored, stored, img)
                final = jnp.where(take_stored, new_imgs, imgs)
                return (final, num), out

            def active(_):
                return jax.lax.cond(num < size, insert, swap, None)

            def passthrough(_):
                return (imgs, num), img

            (imgs, num), out = jax.lax.cond(ok, active, passthrough, None)
            return (imgs, num), out

        keys = jax.random.split(rng, images.shape[0])
        ok = (jnp.ones(images.shape[0], bool) if valid is None
              else valid.astype(bool))
        (new_imgs, new_num), outs = jax.lax.scan(
            step, (pool.images, pool.num), (images, keys, ok))
        return outs, PoolState(images=new_imgs, num=new_num)

    # -- forwards -------------------------------------------------------------
    def _g(self, module, params, x):
        def apply(p, v):
            return module.apply({"params": p}, v)
        if self.config.remat == "full":
            apply = jax.checkpoint(apply)
        return apply(params, x)

    def _d(self, module, params, x, rng, train):
        rngs = {"noise": rng} if (train and self.config.gaussian_noise_value > 0) else None
        return module.apply({"params": params}, x, train=train, rngs=rngs)

    def _shard_constraint(self, x):
        if len(self.mesh.devices.reshape(-1)) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P("data"))
            return jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, sh), x)
        return x

    # -- the train step (four jitted stages) -----------------------------------
    # The step is split into (fakes, gen_a update, gen_b update, disc update)
    # executables: one fused graph holding all four networks' forwards and
    # backwards exceeds what fragile TPU compile services handle, and the
    # split loses nothing — stages are data-dependent and run back-to-back
    # on device with no host synchronization between them.

    @partial(jax.jit, static_argnums=0)
    def _fakes_step(self, gen_a, gen_b, data_a, data_b, idx_a, idx_b):
        real_a = self._shard_constraint(data_a.gather(idx_a))
        real_b = self._shard_constraint(data_b.gather(idx_b))
        fake_b = self._g(self.gen_a, gen_a, real_a)
        fake_a = self._g(self.gen_b, gen_b, real_b)
        return real_a, real_b, fake_a, fake_b

    def _gen_update(self, which: str, params, opt, disc_params, real_own,
                    real_other, fake_other, key, valid=None):
        """Update one generator. `real_own` is its source domain input,
        `real_other` the target domain, `fake_other` the other generator's
        (detached) translation of the target domain — the cycle input.
        Gradients flow through this generator's three applications only
        (reference persistent-tape semantics, `CycleGAN.py:762-763`).
        `valid` (B,) removes padded batch samples from every loss term."""
        cfg = self.config
        smooth = cfg.label_smoothing_factor
        gen = self.gen_a if which == "a" else self.gen_b
        disc = self.disc_b if which == "a" else self.disc_a
        lam = cfg.lambda_cycle_a if which == "a" else cfg.lambda_cycle_b
        lam_id = cfg.lambda_identity_a if which == "a" else cfg.lambda_identity_b
        cyc_fn = self._cycle_loss_a if which == "a" else mae_loss

        def loss_fn(p):
            if cfg.fused_applications:
                # one batch-(2|3)B application instead of 2-3 batch-B ones:
                # same params, same shapes; InstanceNorm is per-sample so
                # each slice computes exactly what its separate call would
                b = real_own.shape[0]
                parts = [real_own, fake_other] + (
                    [real_other] if lam_id > 0 else [])
                outs = self._g(gen, p, jnp.concatenate(parts, axis=0))
                fake, cycled = outs[:b], outs[b:2 * b]
                same = outs[2 * b:] if lam_id > 0 else None
            else:
                fake = self._g(gen, p, real_own)        # adv branch
                cycled = self._g(gen, p, fake_other)    # cycle branch
                same = self._g(gen, p, real_other) if lam_id > 0 else None
            logits = self._d(disc, jax.lax.stop_gradient(disc_params),
                             fake, key, True)
            adv = lsgan_real_loss(logits, smooth, valid)
            cyc = cyc_fn(real_other, cycled, valid) * lam
            if lam_id > 0:
                ident = mae_loss(real_other, same, valid) * lam * lam_id
            else:
                ident = jnp.float32(0)
            total = adv + cyc + ident
            return total, (adv, cyc, ident)

        (total, (adv, cyc, ident)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = self._tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return params, opt, {"g": total, "adv": adv, "cyc": cyc, "id": ident}

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _gen_a_step(self, gen_a, opt_ga, disc_b, real_a, real_b, fake_a, key,
                    valid=None):
        return self._gen_update("a", gen_a, opt_ga, disc_b, real_a, real_b,
                                fake_a, key, valid)

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _gen_b_step(self, gen_b, opt_gb, disc_a, real_a, real_b, fake_b, key,
                    valid=None):
        return self._gen_update("b", gen_b, opt_gb, disc_a, real_b, real_a,
                                fake_b, key, valid)

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2, 3, 4, 5, 6))
    def _disc_step(self, disc_a, disc_b, opt_da, opt_db, pool_a, pool_b,
                   real_a, real_b, fake_a, fake_b, rng, valid=None):
        return self._disc_core(disc_a, disc_b, opt_da, opt_db, pool_a, pool_b,
                               real_a, real_b, fake_a, fake_b, rng, valid)

    def _disc_core(self, disc_a, disc_b, opt_da, opt_db, pool_a, pool_b,
                   real_a, real_b, fake_a, fake_b, rng, valid=None):
        cfg = self.config
        smooth = cfg.label_smoothing_factor
        k = jax.random.split(rng, 4)
        pooled_a, pool_a = self._pool_query(pool_a, fake_a, k[0], valid)
        pooled_b, pool_b = self._pool_query(pool_b, fake_b, k[1], valid)

        def disc_loss(disc_params):
            da, db = disc_params
            if cfg.fused_applications:
                # one batch-2B application per discriminator; the noise rng
                # (if enabled) draws once over the fused batch instead of
                # twice from the same key
                b = real_a.shape[0]
                logits_a = self._d(self.disc_a, da,
                                   jnp.concatenate([real_a, pooled_a], 0),
                                   k[2], True)
                real_logits_a, fake_logits_a = logits_a[:b], logits_a[b:]
                logits_b = self._d(self.disc_b, db,
                                   jnp.concatenate([real_b, pooled_b], 0),
                                   k[3], True)
                real_logits_b, fake_logits_b = logits_b[:b], logits_b[b:]
            else:
                real_logits_a = self._d(self.disc_a, da, real_a, k[2], True)
                fake_logits_a = self._d(self.disc_a, da, pooled_a, k[2], True)
                real_logits_b = self._d(self.disc_b, db, real_b, k[3], True)
                fake_logits_b = self._d(self.disc_b, db, pooled_b, k[3], True)
            d_real_a = lsgan_real_loss(real_logits_a, smooth, valid)
            d_fake_a = lsgan_fake_loss(fake_logits_a, smooth, valid)
            d_real_b = lsgan_real_loss(real_logits_b, smooth, valid)
            d_fake_b = lsgan_fake_loss(fake_logits_b, smooth, valid)
            d_a = (d_real_a + d_fake_a) * 0.5
            d_b = (d_real_b + d_fake_b) * 0.5
            return d_a + d_b, dict(d_a=d_a, d_b=d_b, d_real_a=d_real_a,
                                   d_fake_a=d_fake_a, d_real_b=d_real_b,
                                   d_fake_b=d_fake_b)

        (_, daux), disc_grads = jax.value_and_grad(disc_loss, has_aux=True)(
            (disc_a, disc_b))
        up_da, opt_da = self._tx.update(disc_grads[0], opt_da, disc_a)
        disc_a = optax.apply_updates(disc_a, up_da)
        up_db, opt_db = self._tx.update(disc_grads[1], opt_db, disc_b)
        disc_b = optax.apply_updates(disc_b, up_db)
        return disc_a, disc_b, opt_da, opt_db, pool_a, pool_b, daux

    def train_step(self, state: CycleGANState, data_a, data_b, idx_a, idx_b,
                   rng, valid=None):
        """One full step; batches gathered ON DEVICE from the resident
        domain arrays (only index vectors cross the host link per step).
        `valid` (B,) masks padded batch samples out of every loss, metric,
        and pool update (exact configured-global-batch semantics on any
        mesh)."""
        k = jax.random.split(rng, 3)
        real_a, real_b, fake_a, fake_b = self._fakes_step(
            state.gen_a, state.gen_b, data_a, data_b, idx_a, idx_b)
        gen_a, opt_ga, ma = self._gen_a_step(state.gen_a, state.opt_ga,
                                             state.disc_b, real_a, real_b,
                                             fake_a, k[0], valid)
        gen_b, opt_gb, mb = self._gen_b_step(state.gen_b, state.opt_gb,
                                             state.disc_a, real_a, real_b,
                                             fake_b, k[1], valid)
        disc_a, disc_b, opt_da, opt_db, pool_a, pool_b, daux = self._disc_step(
            state.disc_a, state.disc_b, state.opt_da, state.opt_db,
            state.pool_a, state.pool_b, real_a, real_b, fake_a, fake_b, k[2],
            valid)

        new_state = CycleGANState(
            gen_a=gen_a, gen_b=gen_b, disc_a=disc_a, disc_b=disc_b,
            opt_ga=opt_ga, opt_gb=opt_gb, opt_da=opt_da, opt_db=opt_db,
            pool_a=pool_a, pool_b=pool_b, step=state.step + 1)
        metrics = {"g_a": ma["g"], "g_adv_a": ma["adv"], "g_cyc_a": ma["cyc"],
                   "g_id_a": ma["id"], "g_b": mb["g"], "g_adv_b": mb["adv"],
                   "g_cyc_b": mb["cyc"], "g_id_b": mb["id"]}
        metrics.update(daux)
        return new_state, metrics

    # the metric order of train_steps_scan's summed output vector
    METRIC_KEYS = ("g_a", "g_b", "g_adv_a", "g_adv_b", "g_cyc_a", "g_cyc_b",
                   "g_id_a", "g_id_b", "d_a", "d_b", "d_real_a", "d_fake_a",
                   "d_real_b", "d_fake_b")

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_steps_scan(self, state: CycleGANState, data_a, data_b,
                         idx_a, idx_b, keys, valid=None):
        """K full train steps in ONE executable (lax.scan over the staged
        step). idx_a/idx_b: (K, B); keys: (K, 2) uint32.

        The four stages stay sequenced inside the body via
        `lax.optimization_barrier`: one unconstrained fused graph lets XLA
        keep several backward passes' activations alive simultaneously
        (20.4G > 15.75G HBM at 384^2 bs5), while barrier-threaded staging
        bounds the peak at the largest single stage — the same memory
        profile as the 4-dispatch step, at 1/(4K) of its dispatch count.
        Returns (state, summed metrics vector in METRIC_KEYS order).
        """

        def barrier(*vals):
            flat, tree = jax.tree.flatten(vals)
            return jax.tree.unflatten(tree, jax.lax.optimization_barrier(flat))

        def body(state, xs):
            ia, ib, key = xs
            k = jax.random.split(key, 3)
            # stage 1: current-step translations (both generators, no grads)
            real_a = self._shard_constraint(data_a.gather(ia))
            real_b = self._shard_constraint(data_b.gather(ib))
            fake_b = self._g(self.gen_a, state.gen_a, real_a)
            fake_a = self._g(self.gen_b, state.gen_b, real_b)
            state, real_a, real_b, fake_a, fake_b = barrier(
                state, real_a, real_b, fake_a, fake_b)

            # stage 2: generator A update
            gen_a, opt_ga, ma = self._gen_update(
                "a", state.gen_a, state.opt_ga, state.disc_b,
                real_a, real_b, fake_a, k[0], valid)
            state, gen_a, opt_ga, ma, real_a, real_b, fake_a, fake_b = barrier(
                state, gen_a, opt_ga, ma, real_a, real_b, fake_a, fake_b)

            # stage 3: generator B update
            gen_b, opt_gb, mb = self._gen_update(
                "b", state.gen_b, state.opt_gb, state.disc_a,
                real_b, real_a, fake_b, k[1], valid)
            state, gen_a, opt_ga, gen_b, opt_gb, ma, mb, real_a, real_b, \
                fake_a, fake_b = barrier(
                    state, gen_a, opt_ga, gen_b, opt_gb, ma, mb,
                    real_a, real_b, fake_a, fake_b)

            # stage 4: both discriminators + history pools
            disc_a, disc_b, opt_da, opt_db, pool_a, pool_b, daux = \
                self._disc_core(state.disc_a, state.disc_b, state.opt_da,
                                state.opt_db, state.pool_a, state.pool_b,
                                real_a, real_b, fake_a, fake_b, k[2], valid)

            new_state = CycleGANState(
                gen_a=gen_a, gen_b=gen_b, disc_a=disc_a, disc_b=disc_b,
                opt_ga=opt_ga, opt_gb=opt_gb, opt_da=opt_da, opt_db=opt_db,
                pool_a=pool_a, pool_b=pool_b, step=state.step + 1)
            m = {"g_a": ma["g"], "g_adv_a": ma["adv"], "g_cyc_a": ma["cyc"],
                 "g_id_a": ma["id"], "g_b": mb["g"], "g_adv_b": mb["adv"],
                 "g_cyc_b": mb["cyc"], "g_id_b": mb["id"], **daux}
            return new_state, jnp.stack([m[kk] for kk in self.METRIC_KEYS])

        state, ms = jax.lax.scan(body, state, (idx_a, idx_b, keys))
        return state, jnp.sum(ms, axis=0)

    # -- fit -------------------------------------------------------------------
    def fit(self, dataset: PairedDomainDataset, model_dir: str | None = None,
            image_dir: str | None = None, test_a=None, test_b=None,
            checkpoint_every: int = 1, monitor_every: int = 1,
            log_every: int = 0, start_epoch: int = 0) -> dict:
        """Train for `cfg.epochs` epochs. `start_epoch > 0` resumes an
        interrupted run after `self.load(checkpoints_{start_epoch:03d})`:
        epochs below it are skipped but their host-RNG draws (permutations
        + step keys) are replayed, so a resumed run consumes the exact data
        order of an uninterrupted one — combined with the checkpoint's
        optimizer/pool/step state the continuation is bit-identical
        (`tests/test_resume.py`)."""
        cfg = self.config
        n_dev = len(self.mesh.devices.reshape(-1))
        # effective global batch == cfg.batch_size on any mesh: physical
        # batch pads to a multiple of the device count; a valid-mask keeps
        # padded samples out of every loss, gradient, metric, and pool
        # update (an 8-chip run trains the SAME operating point as the
        # single-chip run)
        gb = cfg.batch_size
        bs = -(-gb // n_dev) * n_dev
        pad = bs - gb
        valid = (jnp.asarray(np.concatenate([np.ones(gb, np.float32),
                                             np.zeros(pad, np.float32)]))
                 if pad else None)
        steps_per_epoch = max(len(dataset) // gb, 1)
        if self.state is None:
            self.create_state(steps_per_epoch)

        rng = np.random.default_rng(cfg.seed)
        key = jax.random.PRNGKey(cfg.seed + 1)
        history: dict[str, list] = {}
        if start_epoch > cfg.epochs:
            raise ValueError(
                f"start_epoch {start_epoch} > epochs {cfg.epochs}: the "
                "resumed run has nothing to train — raise epochs to the "
                "interrupted run's budget, or start a fresh run")
        csv_path = os.path.join(model_dir, "training_log.csv") if model_dir else None
        if model_dir:
            os.makedirs(model_dir, exist_ok=True)
        if csv_path:
            truncate_epoch_csv(csv_path, start_epoch)

        if len(dataset) < gb:
            raise ValueError(
                f"dataset ({len(dataset)} items) yields no full batch at "
                f"batch size {gb}; add data or reduce batch_size")

        def pad_batch(rows):
            """(k, gb) index rows -> (k, bs) by cycling real samples."""
            if not pad:
                return rows
            extra = rows[:, np.arange(pad) % gb]
            return np.concatenate([rows, extra], axis=1)

        # both domains live on device for the whole run — or stay in host
        # RAM with per-chunk uploads when streaming (use_dataloader parity)
        from semtpu.data.dataset import (as_device_images, DeviceImages,
                                         slice_device_images)
        streaming = cfg.stream_from_host
        if streaming:
            if (np.asarray(dataset.a).dtype != np.uint8
                    or np.asarray(dataset.b).dtype != np.uint8):
                raise ValueError(
                    "stream_from_host requires raw uint8 domains with "
                    "loader-preproc dicts (float32 streams would ship 4x "
                    "the bytes); load with preproc specs instead")
            host_a = DeviceImages.from_uint8(dataset.a, host=True,
                                             **(dataset.a_preproc or {}))
            host_b = DeviceImages.from_uint8(dataset.b, host=True,
                                             **(dataset.b_preproc or {}))
            dev_a = dev_b = None
        else:
            dev_a = as_device_images(dataset.a, self.mesh, dataset.a_preproc)
            dev_b = as_device_images(dataset.b, self.mesh, dataset.b_preproc)
        metric_keys = self.METRIC_KEYS
        scan_k = max(int(cfg.scan_steps), 1)
        # per-chunk step keys are built on HOST (raw uint32 pairs == old-style
        # PRNG keys): no extra device dispatch rides every chunk
        key_rng = np.random.default_rng(cfg.seed + 1)

        ckpt_saver = AsyncSaver()
        for epoch in range(cfg.epochs):
            ia = rng.permutation(len(dataset.a))
            ib = rng.permutation(len(dataset.b))
            n_steps = min(len(ia), len(ib)) // gb
            if epoch < start_epoch:
                # completed before the interruption: replay this epoch's
                # key draws without any device work
                if scan_k > 1:
                    pos = 0
                    while pos < n_steps:
                        k_ = min(scan_k, n_steps - pos)
                        key_rng.integers(0, 2**32, size=(k_, 2),
                                         dtype=np.uint32)
                        pos += k_
                else:
                    for _ in range(n_steps):
                        key, _ = jax.random.split(key)
                continue
            t0 = time.time()
            msum = jnp.zeros(len(metric_keys))
            if scan_k > 1:
                pos = 0
                while pos < n_steps:
                    k_ = min(scan_k, n_steps - pos)
                    sl_a = pad_batch(ia[pos * gb:(pos + k_) * gb].reshape(k_, gb))
                    sl_b = pad_batch(ib[pos * gb:(pos + k_) * gb].reshape(k_, gb))
                    keys = key_rng.integers(0, 2**32, size=(k_, 2),
                                            dtype=np.uint32)
                    if streaming:
                        ch_a = slice_device_images(host_a, sl_a.reshape(-1))
                        ch_b = slice_device_images(host_b, sl_b.reshape(-1))
                        local = np.arange(sl_a.size, dtype=np.int32).reshape(
                            k_, bs)
                        self.state, sums = self.train_steps_scan(
                            self.state, ch_a, ch_b, jnp.asarray(local),
                            jnp.asarray(local), jnp.asarray(keys), valid)
                    else:
                        self.state, sums = self.train_steps_scan(
                            self.state, dev_a, dev_b, jnp.asarray(sl_a),
                            jnp.asarray(sl_b), jnp.asarray(keys), valid)
                    msum = msum + sums
                    pos += k_
            else:
                for k_ in range(n_steps):
                    key, sub = jax.random.split(key)
                    sl_a = pad_batch(ia[k_ * gb:(k_ + 1) * gb][None])[0]
                    sl_b = pad_batch(ib[k_ * gb:(k_ + 1) * gb][None])[0]
                    if streaming:
                        ch_a = slice_device_images(host_a, sl_a)
                        ch_b = slice_device_images(host_b, sl_b)
                        local = np.arange(bs, dtype=np.int32)
                        self.state, metrics = self.train_step(
                            self.state, ch_a, ch_b, jnp.asarray(local),
                            jnp.asarray(local), sub, valid)
                    else:
                        self.state, metrics = self.train_step(
                            self.state, dev_a, dev_b, jnp.asarray(sl_a),
                            jnp.asarray(sl_b), sub, valid)
                    msum = msum + jnp.stack([metrics[kk] for kk in metric_keys])
            ep = dict(zip(metric_keys,
                          (np.asarray(jax.device_get(msum)) / n_steps).tolist()))
            for kk, v in ep.items():
                history.setdefault(kk, []).append(v)
            if csv_path:
                new = not os.path.isfile(csv_path)
                with open(csv_path, "a") as fh:
                    if new:
                        fh.write("epoch;" + ";".join(sorted(ep)) + ";seconds\n")
                    fh.write(f"{epoch};" + ";".join(str(ep[kk]) for kk in sorted(ep))
                             + f";{time.time() - t0:.2f}\n")
            if log_every and epoch % log_every == 0:
                print(f"epoch {epoch}: g_a={ep['g_a']:.3f} g_b={ep['g_b']:.3f} "
                      f"d_a={ep['d_a']:.3f} d_b={ep['d_b']:.3f}")
            if model_dir and checkpoint_every and (epoch + 1) % checkpoint_every == 0:
                ckpt_path = os.path.join(model_dir,
                                         f"checkpoints_{epoch + 1:03d}")
                if cfg.async_checkpoint:
                    self.save_async(ckpt_path, ckpt_saver)
                else:
                    self.save(ckpt_path)
            if (image_dir is not None and test_a is not None
                    and test_b is not None and monitor_every
                    and (epoch + 1) % monitor_every == 0):
                self.save_monitor_panels(test_a, test_b, image_dir, epoch + 1)

        ckpt_saver.wait()  # last cadence save must be on disk before the
        # final save / checkpoint auto-selection read the run dir back
        if model_dir:
            self.save(os.path.join(model_dir, "model"))
        return history

    # -- monitor panels (reference GANMonitor, CycleGAN.py:810-905) -----------
    def save_monitor_panels(self, test_a, test_b, output_dir: str, epoch: int,
                            num_img: int = 2):
        from PIL import Image
        from semtpu.ops.morphology import binary_erosion
        os.makedirs(output_dir, exist_ok=True)

        def norm8(x):
            x = x - x.min()
            return (x / max(x.max(), 1e-12) * 255).astype(np.uint8)

        for tag, first, g1m, g2m in (("A-B-A", test_a, "a", "b"),
                                     ("B-A-B", test_b, "b", "a")):
            n = min(num_img, len(first))
            h, w = first.shape[1:3]
            panel = np.zeros((n * h, 4 * w, 3), np.uint8)
            for i in range(n):
                x0 = jnp.asarray(first[i:i + 1])
                g1 = self.gen_a if g1m == "a" else self.gen_b
                g2 = self.gen_a if g2m == "a" else self.gen_b
                p1 = np.asarray(self._g(g1, getattr(self.state, f"gen_{g1m}"), x0))[0]
                p2 = np.asarray(self._g(g2, getattr(self.state, f"gen_{g2m}"),
                                        jnp.asarray(p1[None])))[0]
                imgs8 = [norm8(np.asarray(first[i])[:, :, 0]),
                         norm8(p1[:, :, 0]), norm8(p2[:, :, 0])]
                msk_src = imgs8[1] if tag == "A-B-A" else imgs8[0]
                msk = msk_src > 127
                edge = msk ^ np.asarray(binary_erosion(msk, 2))
                base = imgs8[0] if tag == "A-B-A" else imgs8[1]
                overlay = (base * 0.7).astype(np.uint8)
                for j in range(3):
                    panel[i * h:(i + 1) * h, 0:w, j] = imgs8[0]
                    panel[i * h:(i + 1) * h, w:2 * w, j] = imgs8[1]
                    panel[i * h:(i + 1) * h, 2 * w:3 * w, j] = imgs8[2]
                    if j == 0:
                        panel[i * h:(i + 1) * h, 3 * w:4 * w, j] = np.maximum(
                            overlay, (edge * 255).astype(np.uint8))
                    else:
                        panel[i * h:(i + 1) * h, 3 * w:4 * w, j] = overlay
            Image.fromarray(panel).save(
                os.path.join(output_dir, f"{tag}_Epoch_{epoch:05d}.tif"))

    # -- inference -------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 2))
    def _gen_forward(self, params, which: str, x):
        module = self.gen_a if which == "a" else self.gen_b
        return module.apply({"params": params}, x)

    @partial(jax.jit, static_argnums=(0, 2, 5))
    def _translate_u8(self, params, which: str, di, idx, invert_out: bool):
        """Device-resident batch translation: decode uint8 inputs, run the
        generator, per-image min-max -> uint8 — only bytes cross the link."""
        x = di.gather(idx)
        module = self.gen_a if which == "a" else self.gen_b
        y = module.apply({"params": params}, x)
        if invert_out:
            y = -y
        mn = jnp.min(y, axis=(1, 2, 3), keepdims=True)
        mx = jnp.max(y, axis=(1, 2, 3), keepdims=True)
        y = (y - mn) / jnp.maximum(mx - mn, 1e-12)
        return (y * 255).astype(jnp.uint8)

    def run_inference_batched(self, images_u8: "np.ndarray",
                              output_directory: str | None = None,
                              file_names: list | None = None,
                              source_domain: str = "A", batch: int = 32):
        """Translate a uniform uint8 stack in device-resident batches.

        The fast path for rendering the ~1000 simulated masks as fake SEM
        tiles (pipeline step 4 B->A): the reference pushes one float tile
        per call (`CycleGAN.py:273`); this ships raw bytes both ways.
        """
        from semtpu.data.dataset import DeviceImages, as_device_images
        from PIL import Image as PILImage
        cfg = self.config
        which = "a" if "a" in source_domain.lower() else "b"
        params = self.state.gen_a if which == "a" else self.state.gen_b
        invert_in = cfg.invert_images and which == "a"
        invert_out = cfg.invert_images and which == "b"
        di = as_device_images(images_u8, self.mesh,
                              dict(normalization_range=(-1, 1),
                                   invert=invert_in))
        n = len(images_u8)
        outs = []
        for s0 in range(0, n, batch):
            idx = jnp.arange(s0, min(s0 + batch, n))
            res = np.asarray(self._translate_u8(params, which, di, idx,
                                                invert_out))[:, :, :, 0]
            outs.append(res)
            if output_directory and file_names:
                for k in range(res.shape[0]):
                    PILImage.fromarray(res[k]).save(os.path.join(
                        output_directory,
                        os.path.basename(file_names[s0 + k])))
        return np.concatenate(outs)

    def run_inference(self, images, output_directory: str | None = None,
                      file_names: list[str] | None = None, source_domain: str = "A",
                      tile_images: bool = False, min_overlap: int = 2,
                      manage_overlap_mode: int = 2) -> list[np.ndarray]:
        """Translate images with the generator of `source_domain`.

        images: list/array of (H, W, 1) float32 in [-1, 1]. Returns uint8
        per-image min-max normalized outputs (reference contract,
        `CycleGAN.py:224-286`).
        """
        cfg = self.config
        which = "a" if "a" in source_domain.lower() else "b"
        params = self.state.gen_a if which == "a" else self.state.gen_b
        out = []
        for i in range(len(images)):
            img = np.asarray(images[i], np.float32)
            if img.ndim == 2:
                img = img[:, :, None]
            if which == "a" and cfg.invert_images:
                img = img * -1.0
            if tile_images:
                tiles = tile_image(img, cfg.tile_h, cfg.tile_w, min_overlap=min_overlap)
                preds = self._gen_forward(params, which, tiles)
                res = np.asarray(stitch_image(preds, img.shape[1], img.shape[0],
                                              min_overlap=min_overlap,
                                              manage_overlap_mode=manage_overlap_mode))
            else:
                res = np.asarray(self._gen_forward(params, which,
                                                   jnp.asarray(img[None])))[0]
            res = res[:, :, 0]
            if which == "b" and cfg.invert_images:
                res = res * -1.0
            res = res - res.min()
            res = (res / max(res.max(), 1e-12) * 255).astype(np.uint8)
            out.append(res)
            if output_directory and file_names:
                from PIL import Image
                Image.fromarray(res).save(os.path.join(
                    output_directory, os.path.basename(file_names[i])))
        return out

    # -- persistence ------------------------------------------------------------
    def save(self, path: str, include_opt: bool = True):
        """Checkpoint. `include_opt=True` (default) persists the four Adam
        states, both history pools, the step counter and the schedule
        geometry, so `load` resumes training EXACTLY (the reference saves
        whole optimizer-bearing models per epoch, `CycleGAN.py:203-204`);
        False writes the four networks only (4x smaller)."""
        s = self.state
        dev = {k: getattr(s, k)
               for k in ("gen_a", "gen_b", "disc_a", "disc_b")}
        if include_opt:
            for k in ("opt_ga", "opt_gb", "opt_da", "opt_db"):
                dev[k] = getattr(s, k)
            dev["pool_a_images"], dev["pool_a_num"] = (s.pool_a.images,
                                                       s.pool_a.num)
            dev["pool_b_images"], dev["pool_b_num"] = (s.pool_b.images,
                                                       s.pool_b.num)
            dev["step"] = s.step
        # packed fetch: one transfer per dtype instead of ~900 leafwise
        # round-trips through the tunnel (train/checkpoint.py)
        payload = fetch_packed(dev)
        if include_opt:
            for k in ("pool_a_num", "pool_b_num", "step"):
                payload[k] = np.int32(payload[k])
            payload["steps_per_epoch"] = np.int32(self._steps_per_epoch)
        save_checkpoint(path, payload)

    def save_async(self, path: str, saver: AsyncSaver):
        """`save(include_opt=True)` without blocking the epoch loop.

        The train step donates `self.state`'s buffers, so the payload is
        first copied on-device (one jitted dispatch, ~ms at HBM speed) into
        fresh buffers the next epoch cannot invalidate; `saver` then pulls
        the copy host-side and writes Orbax in a background thread. On a
        tunneled device this hides the ~1.1 GB fetch that run_t0 measured
        at ~160 s per cadence save (6 saves = ~12% of step-3 wall-clock).
        Written bytes are identical to the synchronous path."""
        s = self.state
        dev = {k: getattr(s, k) for k in
               ("gen_a", "gen_b", "disc_a", "disc_b",
                "opt_ga", "opt_gb", "opt_da", "opt_db", "step")}
        dev["pool_a_images"], dev["pool_a_num"] = s.pool_a.images, s.pool_a.num
        dev["pool_b_images"], dev["pool_b_num"] = s.pool_b.images, s.pool_b.num
        if self._snapshot_fn is None:
            self._snapshot_fn = jax.jit(
                lambda t: jax.tree.map(jnp.copy, t))
        snap = self._snapshot_fn(dev)
        spe = np.int32(self._steps_per_epoch)

        def post(host):
            for k in ("pool_a_num", "pool_b_num", "step"):
                host[k] = np.int32(host[k])
            host["steps_per_epoch"] = spe
            return host

        saver.save(path, snap, post=post)

    def load(self, path_or_model_dir: str, params_only: bool = False):
        """Restore a checkpoint. `params_only=True` ships ONLY the four
        networks' parameters to the device — skipping pools + optimizer
        moments cuts the upload ~5x (a full-budget checkpoint is ~1.1 GB,
        which dominates load time on a tunneled TPU); use it for
        inference-only loads (pipeline step 4, checkpoint selection)."""
        from semtpu.train.checkpoint import restructure_opt_state
        path = path_or_model_dir
        if os.path.isdir(path) and not os.path.isdir(os.path.join(path, "gen_a")):
            run = latest_checkpoint(path) or path
            cands = sorted(e for e in os.listdir(run)
                           if (e == "model" or e.startswith("checkpoints_"))
                           and ".orbax-checkpoint-tmp" not in e)
            if cands:
                path = os.path.join(run, "model" if "model" in cands else cands[-1])
        payload = load_checkpoint(path)
        if params_only:
            if self.state is None:
                self.create_state()
            self.state = self.state.replace(
                gen_a=replicate(payload["gen_a"], self.mesh),
                gen_b=replicate(payload["gen_b"], self.mesh),
                disc_a=replicate(payload["disc_a"], self.mesh),
                disc_b=replicate(payload["disc_b"], self.mesh))
            return self.state
        if "opt_ga" in payload:
            self._steps_per_epoch = int(payload["steps_per_epoch"])
            self._tx = self._make_tx(self._steps_per_epoch)
            state = CycleGANState(
                gen_a=payload["gen_a"], gen_b=payload["gen_b"],
                disc_a=payload["disc_a"], disc_b=payload["disc_b"],
                opt_ga=restructure_opt_state(payload["opt_ga"],
                                             self._tx.init(payload["gen_a"])),
                opt_gb=restructure_opt_state(payload["opt_gb"],
                                             self._tx.init(payload["gen_b"])),
                opt_da=restructure_opt_state(payload["opt_da"],
                                             self._tx.init(payload["disc_a"])),
                opt_db=restructure_opt_state(payload["opt_db"],
                                             self._tx.init(payload["disc_b"])),
                pool_a=PoolState(images=jnp.asarray(payload["pool_a_images"]),
                                 num=jnp.asarray(payload["pool_a_num"], jnp.int32)),
                pool_b=PoolState(images=jnp.asarray(payload["pool_b_images"]),
                                 num=jnp.asarray(payload["pool_b_num"], jnp.int32)),
                step=jnp.asarray(payload["step"], jnp.int32))
            self.state = replicate(state, self.mesh)
            return self.state
        if self.state is None:
            self.create_state()
        self.state = self.state.replace(
            gen_a=replicate(payload["gen_a"], self.mesh),
            gen_b=replicate(payload["gen_b"], self.mesh),
            disc_a=replicate(payload["disc_a"], self.mesh),
            disc_b=replicate(payload["disc_b"], self.mesh))
        return self.state
