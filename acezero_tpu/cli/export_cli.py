"""Export CLIs: point clouds and camera meshes from reconstruction outputs.

Equivalents of /root/reference/export_point_cloud.py and export_cameras.py.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import jax

from acezero_tpu.data.scene import load_scene
from acezero_tpu.export.cameras import export_camera_meshes
from acezero_tpu.export.point_cloud import export_point_cloud_from_network
from acezero_tpu.io.pose_files import read_pose_file
from acezero_tpu.models import torch_io
from acezero_tpu.models.encoder import init_encoder_params

_logger = logging.getLogger(__name__)


def _strtobool(x: str) -> bool:
    return x.strip().lower() in ("1", "true", "yes", "y", "on")


def point_cloud_main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(
        description="Export an ACE0 point cloud to PLY.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("output_file", type=Path)
    p.add_argument("--visualization_buffer", type=Path, default=None,
                   help="export directly from a saved visualizer state pickle "
                        "instead of running network inference")
    p.add_argument("--network", type=Path, default=None)
    p.add_argument("--pose_file", type=Path, default=None)
    p.add_argument("--encoder_path", type=Path, default=None)
    p.add_argument("--rgb_files", type=str, default=None,
                   help="optional glob; defaults to the files named in the pose file")
    p.add_argument("--image_resolution", type=int, default=480)
    p.add_argument("--pose_file_conf_threshold", type=int, default=1000)
    p.add_argument("--dense_point_cloud", type=_strtobool, default=False)
    p.add_argument("--filter_depth", type=float, default=100.0)
    p.add_argument("--convention", type=str, default="opencv", choices=["opencv", "opengl"])
    args = p.parse_args(argv)

    if args.visualization_buffer is not None:
        # reference export_point_cloud.py --visualization_buffer path: dump
        # the accumulated visualizer cloud without re-running the network
        import pickle

        import numpy as np

        from acezero_tpu.io.ply import write_ply_points

        with open(args.visualization_buffer, "rb") as f:
            state = pickle.load(f)
        xyz = np.asarray(state["cloud_xyz"], np.float32)
        rgb = (np.asarray(state["cloud_rgb"]) * 255).clip(0, 255).astype(np.uint8)
        if args.convention == "opengl":
            xyz = xyz.copy()
            xyz[:, 1:] = -xyz[:, 1:]
        write_ply_points(args.output_file, xyz, rgb)
        _logger.info("Exported %d buffered points to %s", xyz.shape[0], args.output_file)
        return 0

    if args.network is None or args.pose_file is None:
        raise SystemExit("--network and --pose_file are required (or --visualization_buffer)")

    entries = read_pose_file(args.pose_file, confidence_threshold=args.pose_file_conf_threshold)
    scene = load_scene(
        args.rgb_files if args.rgb_files else None,
        ace_pose_file=args.pose_file,
        ace_pose_file_conf_threshold=args.pose_file_conf_threshold,
        image_short_size=args.image_resolution,
    )

    head_cfg, head_params = torch_io.load_head(args.network)
    head_params = jax.tree.map(jax.numpy.asarray, head_params)
    if args.encoder_path is not None and Path(args.encoder_path).exists():
        encoder_params = jax.tree.map(jax.numpy.asarray, torch_io.load_encoder(args.encoder_path))
    else:
        _logger.warning("No encoder checkpoint — random encoder weights.")
        encoder_params = init_encoder_params(jax.random.PRNGKey(0))

    export_point_cloud_from_network(
        args.output_file,
        encoder_params,
        head_params,
        head_cfg,
        scene,
        entries,
        filter_depth=args.filter_depth,
        dense=args.dense_point_cloud,
        convention=args.convention,
    )
    return 0


def cameras_main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(
        description="Export confidence-colored camera frustums to PLY.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("pose_file", type=Path)
    p.add_argument("output_file", type=Path)
    p.add_argument("--marker_size", type=float, default=0.03)
    p.add_argument("--confidence_max", type=float, default=2000)
    args = p.parse_args(argv)

    entries = read_pose_file(args.pose_file)
    export_camera_meshes(args.output_file, entries, args.marker_size, args.confidence_max)
    _logger.info("Wrote %d camera frustums to %s", len(entries), args.output_file)
    return 0
