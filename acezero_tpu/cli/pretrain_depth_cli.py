"""Seed-depth head pretraining CLI.

Trains the in-process monocular seed-depth head (models.depthnet) on the
procedural corpus and writes `tpu_depth_v1.pt`-style weights — the hermetic
substitute for the reference's torch.hub ZoeDepth seed depth
(/root/reference/dataset_io.py:189-234).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO)

    from acezero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(
        description="Pretrain the seed-depth head on synthetic scenes.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("output", type=Path, help="output depth-head .pt path")
    p.add_argument("--encoder_path", type=Path, required=True)
    p.add_argument("--num_scenes", type=int, default=64)
    p.add_argument("--views_per_scene", type=int, default=16)
    p.add_argument("--image_height", type=int, default=240)
    p.add_argument("--image_width", type=int, default=320)
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--batch_images", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=97)
    p.add_argument("--width_mult", type=int, default=1,
                   help="depth-head hidden-width multiplier (capacity probe)")
    p.add_argument("--corpus", choices=("v4", "v5"), default="v5",
                   help="corpus preset: v4 = the shipped default head's corpus "
                        "(reproduces weights/tpu_depth_v4.pt's recipe from HEAD); "
                        "v5 = octave/look mixtures (the round-4 measured negative "
                        "result for the ring collapse)")
    args = p.parse_args(argv)

    from acezero_tpu.pretrain.depth_pretrain import (
        DepthPretrainConfig,
        pretrain_depth_head,
    )

    cfg = DepthPretrainConfig(
        num_scenes=args.num_scenes,
        views_per_scene=args.views_per_scene,
        image_h=args.image_height,
        image_w=args.image_width,
        steps=args.steps,
        batch_images=args.batch_images,
        learning_rate=args.learning_rate,
        seed=args.seed,
        corpus=args.corpus,
        width_mult=args.width_mult,
    )
    result = pretrain_depth_head(cfg, args.encoder_path, args.output)
    print(f"final loss: {result['final_loss']:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
