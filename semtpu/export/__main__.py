"""Export CLI: `python -m semtpu.export --checkpoint <dir> --output <dir>`.

Converts a trained UNet checkpoint (or a pipeline run's 3_UNet/Models tree)
into a portable StableHLO inference artifact for `semtpu.infer` — the
frozen-graph converter analog (`ImageJ Plugin/Convert_Models_to_TF112/`).
"""
from __future__ import annotations

import argparse


def main(argv=None):
    from semtpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(prog="semtpu.export", description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="UNet checkpoint dir (or a Models/ tree; latest run used)")
    p.add_argument("--output", required=True, help="artifact output directory")
    p.add_argument("--filters", type=int, default=16)
    p.add_argument("--tile-h", type=int, default=384)
    p.add_argument("--tile-w", type=int, default=384)
    args = p.parse_args(argv)

    from semtpu.train.unet import UNetTrainer, UNetConfig
    from semtpu.export import export_unet

    trainer = UNetTrainer(UNetConfig(filters=args.filters, tile_h=args.tile_h,
                                     tile_w=args.tile_w))
    trainer.load(args.checkpoint)
    export_unet(trainer, args.output, tile_h=args.tile_h, tile_w=args.tile_w)
    print(f"Exported StableHLO artifact to {args.output}")


if __name__ == "__main__":
    main()
