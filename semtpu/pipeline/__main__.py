"""CLI: `python -m semtpu.pipeline [--steps 0,1,2,...] [options]`.

The reference's entry point is `python StartProcess.py` with constants
edited in the file (`StartProcess.py:13-43`); here every constant is a flag
with the same default, plus `--steps` for resuming at any stage and
`--config` for a JSON overrides file.
"""
from __future__ import annotations

import argparse
import dataclasses
import json

from semtpu.pipeline.config import PipelineConfig
from semtpu.pipeline.run import Pipeline


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="semtpu.pipeline",
                                description=__doc__)
    p.add_argument("--steps", default=None,
                   help="comma-separated subset of 0,1,2,3,4,5,6a,6b (default: all)")
    p.add_argument("--config", default=None, help="JSON file with config overrides")
    for f in dataclasses.fields(PipelineConfig):
        name = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=None, metavar="BOOL")
        elif isinstance(f.default, int) and not isinstance(f.default, bool):
            p.add_argument(name, type=int, default=None)
        elif isinstance(f.default, float):
            p.add_argument(name, type=float, default=None)
        elif isinstance(f.default, tuple):
            p.add_argument(name, type=lambda s: tuple(float(x) for x in s.split(",")),
                           default=None)
        else:
            p.add_argument(name, type=str, default=None)
    return p


def main(argv=None):
    from semtpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    overrides = {}
    if args.config:
        with open(args.config) as fh:
            overrides.update(json.load(fh))
    for f in dataclasses.fields(PipelineConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            overrides[f.name] = v
    cfg = PipelineConfig(**overrides)
    steps = args.steps.split(",") if args.steps else None
    Pipeline(cfg).run(steps)


if __name__ == "__main__":
    main()
