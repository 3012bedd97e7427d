"""Measure microbatched UNet train steps past the bs>=10 compile wall.

PROFILE_UNET.json (round 4) recorded that plain train batches >= 10 fail to
compile on a 16 GB chip (XLA layout-pads the fused backward's
bf16[N,384,384,16] temps N->16, C->128 = 576 MB each). UNetConfig.
grad_microbatches=M scans M microbatches of B/M samples per optimizer step
so every temp keeps the compiling bs<=8 shape (semtpu/train/unet.py;
exactness tests in tests/test_unet_train.py). This script demonstrates the
workaround at the operating points the wall blocked — effective batches
16/20/32 — and records ms/sample next to the plain bs 5/8 controls.

Writes PROFILE_UNET_MB.json. Run on the real chip when idle (first compile
of each size is slow through the tunnel).
"""
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_semtpu"))


def _timed(fn, warm=1, iters=3):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from semtpu.train.unet import UNetTrainer, UNetConfig
    from semtpu.data.dataset import as_device_images

    rng = np.random.default_rng(0)
    imgs = (rng.random((40, 384, 384)) * 255).astype(np.uint8)
    masks = ((rng.random((40, 384, 384)) > 0.7) * 255).astype(np.uint8)
    out = {"device": str(jax.devices()[0]), "points": {}}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_UNET_MB.json")
    K = 8
    # (batch, microbatches): plain controls, then the sizes the wall blocked
    for bs, M in ((5, 1), (8, 1), (16, 2), (20, 4), (32, 4)):
        key = f"bs{bs}_m{M}"
        tr = di = dm = None
        try:
            tr = UNetTrainer(UNetConfig(filters=16, batch_size=bs, epochs=50,
                                        grad_microbatches=M))
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
            out["points"][key] = {
                "batch": bs, "microbatches": M,
                "ms_per_step": round(dt * 1e3, 1),
                "ms_per_sample": round(dt * 1e3 / bs, 2),
                "samples_per_s": round(bs / dt, 1),
            }
            print(f"# bs={bs} M={M}: {dt*1e3:.0f} ms/step, "
                  f"{dt*1e3/bs:.1f} ms/sample", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            out["points"][key] = {"batch": bs, "microbatches": M,
                                  "error": msg}
            print(f"# bs={bs} M={M}: FAILED ({msg})", flush=True)
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
