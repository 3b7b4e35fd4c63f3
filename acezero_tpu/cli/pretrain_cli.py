"""Encoder pretraining CLI.

Trains the scene-agnostic feature encoder on a corpus of procedurally
generated scenes (or any prepared corpus) and writes a reference-compatible
`ace_encoder_pretrained.pt`. See acezero_tpu/pretrain/encoder_pretrain.py.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from acezero_tpu.pretrain import PretrainConfig, pretrain_encoder


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO)

    from acezero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(
        description="Pretrain the ACE feature encoder on synthetic scenes.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("output", type=Path, help="output encoder .pt path")
    p.add_argument("--num_scenes", type=int, default=8)
    p.add_argument("--views_per_scene", type=int, default=24)
    p.add_argument("--image_height", type=int, default=192)
    p.add_argument("--image_width", type=int, default=256)
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch_images", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=0.002)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--low_texture_frac", type=float, default=0.0,
                   help="fraction of texture-poor scenes in the corpus")
    p.add_argument("--photometric", action="store_true",
                   help="per-view exposure/vignette/noise nuisances")
    p.add_argument("--across_frac", type=float, default=0.0,
                   help="fraction of convergent-view (look=across) scenes")
    args = p.parse_args(argv)

    cfg = PretrainConfig(
        num_scenes=args.num_scenes,
        views_per_scene=args.views_per_scene,
        image_h=args.image_height,
        image_w=args.image_width,
        steps=args.steps,
        batch_images=args.batch_images,
        learning_rate=args.learning_rate,
        seed=args.seed,
        low_texture_frac=args.low_texture_frac,
        photometric=args.photometric,
        across_frac=args.across_frac,
    )
    pretrain_encoder(cfg, output_path=args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
