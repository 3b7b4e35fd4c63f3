"""Registration CLI — flag-compatible with the reference register_mapping.py.

Relocalizes all images matching the glob against a trained scene map (head
checkpoint) and writes `poses_<session>.txt` next to the network, exactly
like /root/reference/register_mapping.py:160-276.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import jax

from acezero_tpu.data.scene import load_scene
from acezero_tpu.io.pose_files import write_pose_file
from acezero_tpu.models import torch_io
from acezero_tpu.models.encoder import init_encoder_params
from acezero_tpu.registration.driver import RegistrationConfig, register_frames
from acezero_tpu.registration.ransac import RansacConfig

_logger = logging.getLogger(__name__)


def _strtobool(x: str) -> bool:
    return x.strip().lower() in ("1", "true", "yes", "y", "on")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Register images against a trained scene map (TPU-native).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("rgb_files", type=str)
    parser.add_argument("network", type=Path, help="scene head checkpoint (.pt)")
    parser.add_argument("--encoder_path", type=Path, default=None)
    parser.add_argument("--session", "-sid", default="")
    parser.add_argument("--image_resolution", type=int, default=480)
    parser.add_argument("--num_data_workers", type=int, default=12)
    parser.add_argument("--hypotheses", "-hyps", type=int, default=64)
    parser.add_argument("--hypotheses_max_tries", type=int, default=16,
                        help="re-sampling attempts per hypothesis. NOTE: the reference "
                             "defaults to 1e6 lazy retries; this build evaluates tries as a "
                             "fixed batched dimension, so the default matches the "
                             "orchestrated value (16). Raise moderately for very "
                             "low-inlier scenes.")
    parser.add_argument("--threshold", "-t", type=float, default=10)
    parser.add_argument("--inlieralpha", "-ia", type=float, default=100)
    parser.add_argument("--maxpixelerror", "-maxerrr", type=float, default=100)
    parser.add_argument("--render_visualization", type=_strtobool, default=False)
    parser.add_argument("--render_target_path", type=Path, default=Path("renderings"))
    parser.add_argument("--render_flipped_portrait", type=_strtobool, default=False)
    parser.add_argument("--render_pose_conf_threshold", type=int, default=5000)
    parser.add_argument("--render_map_depth_filter", type=int, default=10)
    parser.add_argument("--render_camera_z_offset", type=int, default=4)
    parser.add_argument("--render_marker_size", type=float, default=0.03)
    parser.add_argument("--base_seed", type=int, default=1305)
    parser.add_argument("--confidence_threshold", type=float, default=1000)
    parser.add_argument("--max_estimates", type=int, default=-1)
    parser.add_argument("--use_external_focal_length", type=float, default=-1)
    return parser


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    from acezero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    use_heuristic = args.use_external_focal_length < 0
    scene = load_scene(
        args.rgb_files,
        image_short_size=args.image_resolution,
        use_heuristic_focal_length=use_heuristic,
        external_focal_length=(None if use_heuristic else args.use_external_focal_length),
    )

    head_cfg, head_params = torch_io.load_head(args.network)
    head_params = jax.tree.map(jax.numpy.asarray, head_params)
    if args.encoder_path is not None and Path(args.encoder_path).exists():
        encoder_params = jax.tree.map(jax.numpy.asarray, torch_io.load_encoder(args.encoder_path))
    else:
        _logger.warning("No encoder checkpoint — random encoder weights.")
        encoder_params = init_encoder_params(jax.random.PRNGKey(args.base_seed))

    cfg = RegistrationConfig(
        ransac=RansacConfig(
            hypotheses=args.hypotheses,
            max_tries=args.hypotheses_max_tries,
            inlier_threshold=args.threshold,
            inlier_alpha=args.inlieralpha,
            max_reproj_error=args.maxpixelerror,
        ),
        confidence_threshold=args.confidence_threshold,
        max_estimates=args.max_estimates,
        base_seed=args.base_seed,
    )
    entries = register_frames(encoder_params, head_params, head_cfg, scene, cfg)

    out = Path(args.network).parent / f"poses_{args.session}.txt"
    write_pose_file(out, entries)
    _logger.info("Wrote %d poses to %s", len(entries), out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
