"""Benchmark: semtpu hot paths on real TPU hardware.

STDOUT carries exactly ONE JSON line (the driver contract):
{"metric", "value", "unit", "vs_baseline"} — the headline UNet
tiled-inference throughput. Secondary metrics (train-step throughput for
all three trainers + an XLA-cost-analysis MFU estimate for the UNet
forward) go to STDERR and BENCH_DETAILS.json next to this file.

vs_baseline: speedup over the *reference's execution pattern* measured on
the SAME chip — a per-tile batch-size-1 loop with a host round-trip per
tile, which is exactly how the reference serves tiles
(`Releases/Version 1.2.0/UNet_Segmentation.py:339`, `CycleGAN.py:273`).
Same model, same hardware; the ratio isolates the framework's contribution
(batched device-resident tiling vs per-tile dispatch).

Timing notes for this environment: the TPU is reached through a tunnel
where `block_until_ready` does not actually fence execution — only host
readbacks do — so every timed region ends in a scalar fetch. A persistent
compilation cache avoids re-paying the remote compiles each round.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

# bf16 peak of one TPU v5e (v5 lite) chip; used only for the MFU estimate
PEAK_BF16_FLOPS = 197e12
# HBM bandwidth of one v5e chip; used only for the roofline estimate
PEAK_HBM_BYTES = 819e9


def _roofline(lowerable, args, dt, details, prefix):
    """Best-effort XLA cost analysis -> MFU + HBM-bandwidth utilization.

    `bytes accessed` sums per-HLO traffic and overcounts fused reuse, so
    the BW number is an upper bound on true utilization — still the right
    diagnostic for conv stacks at small batch, which sit against the HBM
    roof, not the MXU roof. NOTE: XLA counts a lax.scan body ONCE
    regardless of trip count, so for K-step scan chunks pass the PER-STEP
    dt (chunk dt / K) — flops/bytes are then per-step too.
    """
    try:
        cost = lowerable.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))
        hbm_raw = byts / dt / PEAK_HBM_BYTES
        details[f"{prefix}_tflops"] = round(flops / 1e12, 2)
        details[f"{prefix}_mfu"] = round(flops / dt / PEAK_BF16_FLOPS, 4)
        # raw cost-analysis bytes overcount fused reuse, so the raw ratio
        # can exceed 1.0; publish the physically-bounded figure and keep
        # the raw ratio separately for roofline cross-round comparisons
        details[f"{prefix}_hbm_util_est"] = round(min(hbm_raw, 1.0), 3)
        details[f"{prefix}_hbm_util_raw_costmodel"] = round(hbm_raw, 3)
        log(f"# {prefix}: {flops / 1e12:.2f} TFLOP, "
            f"MFU {flops / dt / PEAK_BF16_FLOPS * 100:.1f}%, "
            f"HBM ~{min(hbm_raw, 1.0) * 100:.0f}% of "
            f"{PEAK_HBM_BYTES / 1e9:.0f} GB/s"
            + (f" (at the roof; raw cost-model ratio {hbm_raw:.2f} "
               f"overcounts fused reuse)" if hbm_raw > 1.0
               else " (upper bound)"))
    except Exception as e:
        log(f"# {prefix} cost analysis unavailable: {e}")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _timed(fn, warm=1, iters=3):
    for _ in range(warm):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_unet_inference(jax, jnp, details):
    from semtpu.models.multires_unet import MultiResUNet

    model = MultiResUNet(filters=16, dtype=jnp.bfloat16)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 1), jnp.float32))

    # scalar-output forwards so one host fetch fences the whole computation
    fwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x, train=False)))

    # 9 tiles/image x 32 images; the PROFILE_UNET.json batch sweep measured
    # 610 tiles/s at 288 vs 427 at the previous 72 (throughput is HBM-
    # traffic-bound per tile, but larger batches amortize layout-padding
    # waste on the 16-channel stages)
    BATCH = 288
    xb = jnp.asarray(np.random.default_rng(0).random((BATCH, 384, 384, 1)),
                     jnp.float32)

    dt = _timed(lambda: float(fwd(variables, xb)), warm=2, iters=5)
    tiles_per_sec = BATCH / dt

    # space-to-depth repacked forward (models/s2d.py): same parameters, same
    # function, full-res stages evaluated at 192^2 x 4C to cut the measured
    # 128-lane padding waste (PROFILE_UNET.json). Exactness is pinned by
    # tests/test_s2d.py; here we time it against the plain forward and the
    # headline takes the faster path (both recorded in BENCH_DETAILS.json).
    try:
        from semtpu.models.s2d import unet_apply_s2d
        fwd_s2d = jax.jit(lambda v, x: jnp.sum(
            unet_apply_s2d(v, x, filters=16, dtype=jnp.bfloat16)))
        dt_s2d = _timed(lambda: float(fwd_s2d(variables, xb)), warm=2, iters=5)
        s2d_tiles = BATCH / dt_s2d
        details["unet_inference_tiles_per_sec_s2d"] = round(s2d_tiles, 2)
        log(f"# unet s2d inference: {s2d_tiles:.1f} tiles/s "
            f"({'adopted' if s2d_tiles > tiles_per_sec else 'slower than plain'})")
        tiles_per_sec = max(tiles_per_sec, s2d_tiles)
    except Exception as e:
        log(f"# s2d inference path failed: {e}")

    # XLA cost analysis -> model FLOPs -> MFU against the chip's bf16 peak
    try:
        cost = fwd.lower(variables, xb).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        mfu = flops / dt / PEAK_BF16_FLOPS
        details["unet_forward_flops_per_batch"] = flops
        details["unet_inference_mfu"] = round(mfu, 4)
        log(f"# unet fwd: {flops / 1e12:.2f} TFLOP/batch, "
            f"MFU {mfu * 100:.1f}% of {PEAK_BF16_FLOPS / 1e12:.0f} TF bf16 peak")
    except Exception as e:  # cost analysis is best-effort across backends
        log(f"# cost analysis unavailable: {e}")

    # reference pattern: per-tile bs=1 dispatch, host sync per tile
    float(fwd(variables, xb[:1]))
    t0 = time.perf_counter()
    N1 = 10
    for i in range(N1):
        float(fwd(variables, xb[i:i + 1]))
    ref_tiles_per_sec = N1 / (time.perf_counter() - t0)

    details["unet_inference_tiles_per_sec"] = round(tiles_per_sec, 2)
    details["reference_pattern_tiles_per_sec"] = round(ref_tiles_per_sec, 2)
    log(f"# unet inference: {tiles_per_sec:.1f} tiles/s "
        f"(bs=1 dispatch pattern: {ref_tiles_per_sec:.1f})")
    return tiles_per_sec, ref_tiles_per_sec


def bench_unet_train(jax, jnp, details):
    from semtpu.train.unet import UNetTrainer, UNetConfig
    from semtpu.data.dataset import as_device_images

    K, bs = 16, 5
    tr = UNetTrainer(UNetConfig(filters=16, batch_size=bs, epochs=50))
    tr.create_state(weighting=4.0, steps_per_epoch=160)
    rng = np.random.default_rng(0)
    imgs = (rng.random((40, 384, 384)) * 255).astype(np.uint8)
    masks = ((rng.random((40, 384, 384)) > 0.7) * 255).astype(np.uint8)
    di = as_device_images(imgs, tr.mesh, dict(normalization_range=(0, 1)))
    dm = as_device_images(masks, tr.mesh,
                          dict(normalization_range=(0, 1), threshold=0.5))
    idx = jnp.asarray(rng.integers(0, 40, (K, bs)))
    aug = jnp.asarray(rng.integers(0, 4, (K, bs)))

    def step():
        s, m = tr.train_steps_scan(tr.state, di, dm, idx, aug)
        tr.state = s
        return float(m[0])

    dt = _timed(step, warm=1, iters=3)
    sps = K / dt
    details["unet_train_steps_per_sec"] = round(sps, 2)
    log(f"# unet train (16f, 384^2, bs{bs}): {sps:.2f} steps/s "
        f"({dt / K * 1000:.0f} ms/step)")
    _roofline(jax.jit(lambda s, i, a: tr.train_steps_scan(s, di, dm, i, a)),
              (tr.state, idx, aug), dt / K, details, "unet_train_step")


def bench_wgan_train(jax, jnp, details):
    from semtpu.train.wgan import WGANTrainer, WGANConfig
    from semtpu.data.dataset import as_device_images

    bs = 64
    tr = WGANTrainer(WGANConfig(img_h=64, img_w=64, batch_size=bs))
    tr.create_state()
    rng = np.random.default_rng(0)
    data = ((rng.random((128, 64, 64)) > 0.5) * 255).astype(np.uint8)
    di = as_device_images(data, tr.mesh,
                          dict(normalization_range=(-1, 1), threshold=0.5))
    idx = jnp.asarray(rng.integers(0, 128, (bs,)))
    keys = [jnp.asarray(rng.integers(0, 2**32, 2, dtype=np.uint32))
            for _ in range(8)]

    def step(i=[0]):
        s, m = tr.train_step(tr.state, di, idx, keys[i[0] % len(keys)])
        tr.state = s
        i[0] += 1
        return float(m["d_loss"]) if "d_loss" in m else float(list(m.values())[0])

    dt = _timed(step, warm=1, iters=3)
    details["wgan_train_steps_per_sec"] = round(1.0 / dt, 2)
    log(f"# wgan train (64^2, bs{bs}, fused 3-critic+gen): "
        f"{1.0 / dt:.2f} steps/s ({dt * 1000:.0f} ms/step)")


def bench_cyclegan_train(jax, jnp, details):
    from semtpu.train.cyclegan import CycleGANTrainer, CycleGANConfig
    from semtpu.data.dataset import as_device_images

    K, bs = 8, 5
    # fused_applications is the measured-best step (0.377 vs 0.713 s/step,
    # PROFILE_CYCLEGAN.json) with per-sample-identical math
    # (tests/test_cyclegan.py::test_fused_applications_match_baseline);
    # bench records the configuration run_s3 validated end-to-end.
    tr = CycleGANTrainer(CycleGANConfig(scan_steps=K, fused_applications=True))
    tr.create_state(steps_per_epoch=32)
    rng = np.random.default_rng(0)
    a = (rng.random((40, 384, 384)) * 255).astype(np.uint8)
    b = ((rng.random((40, 384, 384)) > 0.7) * 255).astype(np.uint8)
    dev_a = as_device_images(a, tr.mesh, dict(normalization_range=(-1, 1)))
    dev_b = as_device_images(b, tr.mesh,
                             dict(normalization_range=(-1, 1), threshold=0.5))
    ia = jnp.asarray(rng.integers(0, 40, (K, bs)))
    ib = jnp.asarray(rng.integers(0, 40, (K, bs)))
    ks = jnp.asarray(rng.integers(0, 2**32, (K, 2), dtype=np.uint32))

    def chunk():
        s, m = tr.train_steps_scan(tr.state, dev_a, dev_b, ia, ib, ks)
        tr.state = s
        return float(m[0])

    dt = _timed(chunk, warm=1, iters=2)
    sps = K / dt
    details["cyclegan_train_steps_per_sec"] = round(sps, 2)
    log(f"# cyclegan train (384^2, bs{bs}, {K}-step scan): {sps:.2f} steps/s "
        f"({dt / K * 1000:.0f} ms/step)")
    _roofline(jax.jit(lambda s, a_, b_, k: tr.train_steps_scan(
                  s, dev_a, dev_b, a_, b_, k)),
              (tr.state, ia, ib, ks), dt / K, details, "cyclegan_train_step")


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    # fail FAST and clearly if the tunneled TPU is unreachable (outages
    # observed lasting hours; backend init alone can block ~25 min) —
    # probe from a subprocess so a hang cannot wedge the bench itself
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(float(jnp.ones(()) * 2))"],
            timeout=120, capture_output=True)
        if probe.returncode != 0:
            log("# TPU backend unavailable (probe failed):")
            log(probe.stderr.decode()[-500:])
            print(json.dumps({"metric": "unet_tiled_inference_throughput",
                              "value": 0, "unit": "tiles/s/chip",
                              "vs_baseline": 0,
                              "error": "tpu_unavailable"}))
            return 1
    except subprocess.TimeoutExpired:
        log("# TPU probe timed out after 120 s (tunnel wedged)")
        print(json.dumps({"metric": "unet_tiled_inference_throughput",
                          "value": 0, "unit": "tiles/s/chip",
                          "vs_baseline": 0, "error": "tpu_wedged"}))
        return 1

    details = {}
    tiles_per_sec, ref_tiles_per_sec = bench_unet_inference(jax, jnp, details)
    for fn in (bench_unet_train, bench_wgan_train, bench_cyclegan_train):
        try:
            fn(jax, jnp, details)
        except Exception as e:   # secondary metrics must never sink the bench
            log(f"# {fn.__name__} failed: {e}")

    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAILS.json"), "w") as fh:
            json.dump(details, fh, indent=1)
    except OSError as e:
        log(f"# could not write BENCH_DETAILS.json: {e}")

    print(json.dumps({
        "metric": "unet_tiled_inference_tiles_per_sec_per_chip",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_sec / ref_tiles_per_sec, 2),
    }))


if __name__ == "__main__":
    sys.exit(main() or 0)
