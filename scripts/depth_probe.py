#!/usr/bin/env python3
"""Seed-depth quality probe across capture regimes.

Measures the learned seed-depth head (models.depthnet — the hermetic
replacement for the reference's torch.hub ZoeDepth,
/root/reference/dataset_io.py:189-234) directly against GT depth on the
held-out scene family, per regime:

- raw-rel:   median |pred - gt| / gt (absolute scale included)
- shape-rel: same after per-image median-scale alignment — the metric that
  matters for a seed image, since the reconstruction's global scale is free
- scale-cv:  coefficient of variation of the per-image scale factor

Unlike single-run ring reconstructions (chaotic: measured spans of tens of
points across numerically equivalent configs), per-frame depth error is a
stable, per-image statistic — this is the honest way to compare depth heads.

Usage:
  python scripts/depth_probe.py --head weights/tpu_depth_v4.pt \
      --encoder weights/tpu_encoder_v6.pt [--scenes_dir results/heldout/scenes]
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(REPO))

_logger = logging.getLogger("depth_probe")


def probe_scene(est, scene_dir: Path, stride: int = 6) -> dict:
    from PIL import Image

    raws, shapes, scales = [], [], []
    for f in sorted(scene_dir.glob("frame_*.png"))[::stride]:
        img = np.asarray(Image.open(f).convert("RGB"))
        gt = np.load(str(f).replace(".png", "_depth.npy")).astype(np.float64)
        pred = est(img)
        v = gt > 0
        raws.append(float(np.median(np.abs(pred[v] - gt[v]) / gt[v])))
        s = float(np.median(gt[v]) / np.median(pred[v]))
        shapes.append(float(np.median(np.abs(pred[v] * s - gt[v]) / gt[v])))
        scales.append(s)
    return {
        "raw_rel": float(np.median(raws)),
        "shape_rel": float(np.median(shapes)),
        "scale_cv": float(np.std(scales) / np.mean(scales)),
        "n_frames": len(raws),
    }


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--head", type=Path, default=REPO / "weights/tpu_depth_v4.pt")
    p.add_argument("--encoder", type=Path, default=REPO / "weights/tpu_encoder_v6.pt")
    p.add_argument("--base_dir", type=Path, default=REPO / "results/heldout",
                   help="scenes are generated/read under <base_dir>/scenes/<name>")
    p.add_argument("--scenes", type=str, default=None,
                   help="comma list to subset the held-out scene family")
    p.add_argument("--views", type=int, default=60)
    p.add_argument("--out", type=Path, default=None, help="append a JSONL row here")
    args = p.parse_args(argv)

    from acezero_tpu.data.depth import learned_depth_estimator

    # scene list + generator kwargs shared with the held-out accuracy suite
    sys.path.insert(0, str(REPO / "scripts"))
    from heldout_benchmark import SCENES, make_scene_dir  # type: ignore

    est = learned_depth_estimator(args.head, encoder_path=args.encoder)

    names = set(args.scenes.split(",")) if args.scenes else None
    rows = {}
    for name, kwargs in SCENES:
        if names and name not in names:
            continue
        scene_dir = make_scene_dir(args.base_dir, name, kwargs, args.views, 480, 640)
        rows[name] = probe_scene(est, scene_dir)
        _logger.info(
            "%-24s raw-rel %.3f  shape-rel %.3f  scale-cv %.3f",
            name, rows[name]["raw_rel"], rows[name]["shape_rel"], rows[name]["scale_cv"],
        )

    import subprocess

    try:
        sha = subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001
        sha = "unknown"
    summary = {
        "head": str(args.head.name),
        "encoder": str(args.encoder.name),
        "git_sha": sha,
        "scenes": rows,
        "median_shape_rel": float(np.median([r["shape_rel"] for r in rows.values()])),
    }
    print(json.dumps(summary))
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(summary) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
