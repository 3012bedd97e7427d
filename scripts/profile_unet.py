"""UNet MFU/HBM experiment (VERDICT r3 weak #8): put measurements behind
the "HBM-bound at 16-32 channels" explanation for the low UNet MFU.

Three controlled sweeps on the real chip, all on the 384x384 tile shape the
pipeline actually serves (`UNet_Segmentation.py:290-351` analog):

1. inference batch sweep (36/72/144/288): if the 5.3% MFU at batch 72 were
   dispatch/latency overhead, throughput would keep rising with batch; if
   the step is HBM-bound, tiles/s is flat (activation traffic scales
   linearly with batch).
2. channel sweep (filters 16 vs 32 vs 64): conv FLOPs scale ~x4 per
   doubling, activation bytes ~x2. Time scaling ~x2 => HBM-roofline;
   ~x4 => MXU-bound. This is the direct test of "tiny contractions cannot
   feed the 128x128 MXU".
3. train-step batch sweep (5/10/20): if time/sample falls with batch the
   step at the reference's bs=5 is weight/overhead-dominated and DP
   scaling projections should use the measured exponent, not 1.0.

Writes PROFILE_UNET.json next to the repo root and prints a summary.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES = 819e9


def _timed(fn, warm=2, iters=4):
    for _ in range(warm):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def _cost(lowered_compiled):
    cost = lowered_compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return (float(cost.get("flops", 0.0)),
            float(cost.get("bytes accessed", 0.0)))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from semtpu.models.multires_unet import MultiResUNet

    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0])}

    # ---- 1. inference batch sweep (filters=16, bf16) ----------------------
    model = MultiResUNet(filters=16, dtype=jnp.bfloat16)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 1), jnp.float32))
    fwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x, train=False)))

    out["inference_batch_sweep"] = {}
    for batch in (36, 72, 144, 288):
        x = jnp.asarray(rng.random((batch, 384, 384, 1)), jnp.float32)
        c = fwd.lower(variables, x).compile()
        dt = _timed(lambda: float(fwd(variables, x)))
        flops, byts = _cost(c)
        out["inference_batch_sweep"][str(batch)] = {
            "tiles_per_s": round(batch / dt, 1),
            "ms_per_batch": round(dt * 1e3, 1),
            "mfu": round(flops / dt / PEAK_BF16_FLOPS, 4),
            "hbm_util_est": round(byts / dt / PEAK_HBM_BYTES, 3),
        }
        print(f"# inference bs={batch}: {batch/dt:.1f} tiles/s, "
              f"MFU {flops/dt/PEAK_BF16_FLOPS*100:.1f}%, "
              f"HBM~{byts/dt/PEAK_HBM_BYTES*100:.0f}%", flush=True)

    # ---- 2. channel sweep (batch=72) --------------------------------------
    out["inference_channel_sweep"] = {}
    x72 = jnp.asarray(rng.random((72, 384, 384, 1)), jnp.float32)
    for filters in (16, 32, 64):
        m = MultiResUNet(filters=filters, dtype=jnp.bfloat16)
        v = jax.jit(partial(m.init, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 1), jnp.float32))
        f = jax.jit(lambda v, x: jnp.sum(m.apply(v, x, train=False)))
        c = f.lower(v, x72).compile()
        dt = _timed(lambda: float(f(v, x72)))
        flops, byts = _cost(c)
        out["inference_channel_sweep"][str(filters)] = {
            "tiles_per_s": round(72 / dt, 1),
            "ms_per_batch": round(dt * 1e3, 1),
            "tflops_per_batch": round(flops / 1e12, 2),
            "mfu": round(flops / dt / PEAK_BF16_FLOPS, 4),
            "hbm_util_est": round(byts / dt / PEAK_HBM_BYTES, 3),
        }
        print(f"# inference filters={filters}: {72/dt:.1f} tiles/s, "
              f"{flops/1e12:.2f} TF/batch, "
              f"MFU {flops/dt/PEAK_BF16_FLOPS*100:.1f}%, "
              f"HBM~{byts/dt/PEAK_HBM_BYTES*100:.0f}%", flush=True)

    # ---- 3. train-step batch sweep (filters=16) ---------------------------
    from semtpu.train.unet import UNetTrainer, UNetConfig
    from semtpu.data.dataset import as_device_images

    imgs = (rng.random((40, 384, 384)) * 255).astype(np.uint8)
    masks = ((rng.random((40, 384, 384)) > 0.7) * 255).astype(np.uint8)
    # NOTE first run finding: bs=10 RESOURCE_EXHAUSTs the 16 GB chip — the
    # backward pass materializes bf16[10,384,384,16] temps in a
    # {3,0,2,1:T(8,128)} layout, padding N 10->16 and C 16->128 (12.8x,
    # 576 MB per temp). Sublane-aligned batches avoid the pathological
    # layout; probe them explicitly and record OOMs as data.
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_UNET.json")

    def _save():
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)

    _save()
    out["train_batch_sweep"] = {}
    K = 8
    for bs in (5, 8, 10, 16, 20):
        try:
            tr = UNetTrainer(UNetConfig(filters=16, batch_size=bs, epochs=50))
            tr.create_state(weighting=4.0, steps_per_epoch=160)
            di = as_device_images(imgs, tr.mesh,
                                  dict(normalization_range=(0, 1)))
            dm = as_device_images(
                masks, tr.mesh,
                dict(normalization_range=(0, 1), threshold=0.5))
            idx = jnp.asarray(rng.integers(0, 40, (K, bs)))
            aug = jnp.asarray(rng.integers(0, 4, (K, bs)))

            def step():
                s, m = tr.train_steps_scan(tr.state, di, dm, idx, aug)
                tr.state = s
                return float(m[0])

            dt = _timed(step, warm=1, iters=3) / K
            out["train_batch_sweep"][str(bs)] = {
                "ms_per_step": round(dt * 1e3, 1),
                "ms_per_sample": round(dt * 1e3 / bs, 2),
                "samples_per_s": round(bs / dt, 1),
            }
            print(f"# train bs={bs}: {dt*1e3:.0f} ms/step, "
                  f"{dt*1e3/bs:.1f} ms/sample", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            out["train_batch_sweep"][str(bs)] = {"error": msg}
            print(f"# train bs={bs}: FAILED ({msg})", flush=True)
        _save()
        # free the trainer's device buffers before the next size
        tr = di = dm = None

    _save()
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
