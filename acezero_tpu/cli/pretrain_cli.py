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
    p.add_argument("--focal_min", type=float, default=0.7,
                   help="min per-scene focal as a fraction of image width")
    p.add_argument("--focal_max", type=float, default=1.4,
                   help="max per-scene focal as a fraction of image width")
    p.add_argument("--texture_octaves_max", type=int, default=1,
                   help="scenes draw 1..N texture octaves (multi-scale blocks)")
    p.add_argument("--coarse_supervision", action="store_true",
                   help="use the order-0 warped-map supervision instead of "
                        "exact ray-cast GT (legacy v2/v3 recipe)")
    p.add_argument("--contrastive_weight", type=float, default=0.0,
                   help="correspondence-InfoNCE weight (same-scene view pairs)")
    p.add_argument("--pitch_frac", type=float, default=0.0,
                   help="fraction of corpus views tilted steeply toward floor/ceiling")
    p.add_argument("--far_pair_frac", type=float, default=0.0,
                   help="fraction of contrastive pairs at arbitrary ring separation")
    p.add_argument("--candidates", type=int, default=1,
                   help="train N candidate encoders (different training "
                        "seeds, shared corpus) and keep the best by the "
                        "feature-matching + short-fit quality probes")
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
        focal_min=args.focal_min,
        focal_max=args.focal_max,
        texture_octaves_max=args.texture_octaves_max,
        exact_supervision=not args.coarse_supervision,
        contrastive_weight=args.contrastive_weight,
        pitch_frac=args.pitch_frac,
        far_pair_frac=args.far_pair_frac,
    )
    if args.candidates > 1:
        from acezero_tpu.pretrain.encoder_pretrain import pretrain_encoder_select

        pretrain_encoder_select(cfg, n_candidates=args.candidates, output_path=args.output)
    else:
        pretrain_encoder(cfg, output_path=args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
