#!/usr/bin/env python3
"""Held-out accuracy benchmark: scenes the framework was never tuned on.

Addresses the "accuracy evidence is synthetic and self-tuned" critique: the
scene family below uses generator seeds (7000+) and type mixes never touched
during development, spanning the tight-geometry 7-Scenes-chess-like regime
plus harder variants (occluders, photometric nuisances, texture-poor walls,
outward-looking rings). Each scene runs R times with different pipeline
seeds; the report gives the full distribution, not the best run.

Usage:
  python scripts/heldout_benchmark.py --out results/heldout \
      --encoder_path weights/tpu_encoder_v3.pt --runs 3
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(REPO))

_logger = logging.getLogger("heldout")

# (name, generator kwargs) — seeds 7000+ are reserved for this file and must
# never be used in tests or pretraining corpora.
#
# Suite v2: scenes render with texture_octaves=3 (multi-scale structure).
# The original single-octave family is *pathologically self-similar* — a
# lattice shift of the one hashed-block scale maps the texture onto itself,
# and reconstructions split into two internally-consistent "ghost sheets"
# (measured: good-good 2.6deg, bad-bad 1.2deg, cross 14.2deg relative-pose
# error). No real scene is a single-scale random checkerboard; one such
# scene is kept, clearly named, as an aliasing stress case.
SCENES = [
    # forward-facing scan regime — the geometry class of the BASELINE north
    # star (7-Scenes chess is a handheld desk scan, not a 360 ring): no loop
    # to close, so accuracy isolates map/registration quality from ring drift
    ("sweep_a", dict(seed=7007, look="sweep", focal=525.0, n_occluders=2,
                     texture_octaves=3)),
    ("sweep_b", dict(seed=7008, look="sweep", focal=560.0, n_occluders=3,
                     texture_octaves=3)),
    # 360-ring regime (Mip-360-style geometry; accumulates loop drift)
    ("chesslike_a", dict(seed=7001, look="across", focal=520.0, n_occluders=2,
                         texture_octaves=3)),
    ("chesslike_b", dict(seed=7002, look="across", focal=560.0, n_occluders=3,
                         texture_octaves=3)),
    ("photometric", dict(seed=7003, look="across", focal=540.0, photometric=True,
                         texture_octaves=3)),
    ("lowtexture", dict(seed=7004, look="across", focal=520.0, texture_strength=0.5,
                        texture_octaves=3)),
    ("outward_ring", dict(seed=7005, look="outward", focal=500.0,
                          texture_octaves=3)),
    # aliasing stress case (expected to fail the 5cm/5deg bar; reported
    # separately so the ghost-sheet failure mode stays visible)
    ("alias_stress_onescale", dict(seed=7001, look="across", focal=520.0,
                                   n_occluders=2)),
]


def make_scene_dir(base: Path, name: str, kwargs: dict, views: int, h: int, w: int) -> Path:
    from PIL import Image

    from acezero_tpu.data.synthetic import render_scene

    out = base / "scenes" / name
    if (out / "focal_length.txt").exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    scene = render_scene(views, h=h, w=w, **kwargs)
    for i in range(views):
        Image.fromarray(scene.images_u8[i]).save(out / f"frame_{i:04d}.png")
        np.save(out / f"frame_{i:04d}_depth.npy", scene.depth[i])
        np.savetxt(out / f"frame_{i:04d}_pose.txt", scene.poses_c2w[i])
    (out / "focal_length.txt").write_text(f"{scene.focal}\n")
    return out


def run_one(scene_dir: Path, out_dir: Path, encoder_path: Path, run_seed: int,
            use_depth_files: bool, unknown_focal: bool = False) -> dict:
    from acezero_tpu.evalpose import evaluate_poses
    from acezero_tpu.io.pose_files import load_pose_files_glob, read_pose_file
    from acezero_tpu.reconstruct import AceZeroConfig, AceZeroPipeline

    focal = float((scene_dir / "focal_length.txt").read_text())
    cfg = AceZeroConfig(
        rgb_files=str(scene_dir / "*.png"),
        results_folder=out_dir,
        depth_files=str(scene_dir / "*_depth.npy") if use_depth_files else None,
        # unknown-focal mode exercises the reference's Mip-360 path: the
        # heuristic 70%-diagonal init + per-round gradient refinement
        # (/root/reference/ace_zero.py:296-305, refine_calibration.py:21-53)
        use_external_focal_length=-1.0 if unknown_focal else focal,
        encoder_path=encoder_path,
        random_seed=run_seed,
        base_seed=run_seed + 784,
    )
    t0 = time.time()
    pipeline = AceZeroPipeline(cfg)
    result = pipeline.run()
    wall = time.time() - t0

    entries = read_pose_file(out_dir / "poses_final.txt")
    gt = load_pose_files_glob(str(scene_dir / "*_pose.txt"))
    errors = evaluate_poses(entries, gt, alignment_conf_threshold=500)
    extra = {}
    if unknown_focal:
        f_est = float(np.median([e.focal_length for e in entries]))
        extra = {"focal_est": f_est, "focal_rel_err": abs(f_est - focal) / focal}
    return {
        **extra,
        "acc_5cm5deg": errors.accuracy,  # percent
        "median_rot_deg": errors.median_rot_deg,
        "median_t_cm": errors.median_trans_cm,
        "reg_rate_500": result["registration_rates"][0],
        "iterations": result["iterations"],
        "rate_history": result.get("rate_history"),
        "wall_minutes": wall / 60.0,
    }


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=Path, default=REPO / "results" / "heldout")
    p.add_argument("--encoder_path", type=Path, default=REPO / "weights" / "tpu_encoder_v2.pt")
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--views", type=int, default=60)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--scenes", type=str, default=None, help="comma list to subset")
    p.add_argument("--unknown_focal", action="store_true",
                   help="withhold the GT focal: heuristic 70%%-diagonal init + "
                        "gradient calibration refinement (the Mip-360 path)")
    p.add_argument("--learned_depth", action="store_true",
                   help="use the learned seed-depth estimator instead of depth files")
    args = p.parse_args(argv)

    from acezero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    names = set(args.scenes.split(",")) if args.scenes else None
    report_path = args.out / "REPORT.jsonl"
    args.out.mkdir(parents=True, exist_ok=True)

    # provenance stamp on every row (round-2 review: stale rows from older
    # encoders were indistinguishable from current ones)
    import subprocess

    try:
        sha = subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001
        sha = "unknown"
    stamp = {
        "encoder": Path(args.encoder_path).name,
        "git_sha": sha,
        "depth": "learned" if args.learned_depth else "files",
        "focal": "unknown" if args.unknown_focal else "known",
    }

    for name, kwargs in SCENES:
        if names and name not in names:
            continue
        scene_dir = make_scene_dir(args.out, name, kwargs, args.views, args.height, args.width)
        for r in range(args.runs):
            run_dir = args.out / f"{name}_run{r}"
            rec = {"scene": name, "run": r, **stamp}
            try:
                rec.update(
                    run_one(scene_dir, run_dir, args.encoder_path, 1305 + 17 * r,
                            use_depth_files=not args.learned_depth,
                            unknown_focal=args.unknown_focal)
                )
            except Exception as exc:  # noqa: BLE001
                rec["error"] = repr(exc)
                _logger.exception("%s run %d failed", name, r)
            with open(report_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            _logger.info("RESULT %s", json.dumps(rec))

    print(write_summary(args.out))
    return 0


def write_summary(out_dir: Path) -> str:
    """Regenerate REPORT.md from the ENTIRE jsonl (not just this invocation),
    grouped by scene and provenance, so the table always reflects every
    recorded row."""
    report_path = out_dir / "REPORT.jsonl"
    records = []
    if report_path.exists():
        for line in report_path.read_text().splitlines():
            if line.strip():
                records.append(json.loads(line))
    by_key: dict[tuple, list] = {}
    scene_order: list[str] = [s for s, _ in SCENES]
    for rec in records:
        if "acc_5cm5deg" not in rec:
            continue
        key = (rec["scene"], rec.get("encoder", "?"), rec.get("git_sha", "?"),
               rec.get("depth", "files"), rec.get("focal", "known"))
        by_key.setdefault(key, []).append(rec["acc_5cm5deg"])
    lines = [
        "| scene | encoder | sha | depth | focal | runs | acc@5cm/5deg (min / median / max) |",
        "|---|---|---|---|---|---|---|",
    ]
    def order(key):
        scene = key[0]
        return (scene_order.index(scene) if scene in scene_order else 99, key)
    for key in sorted(by_key, key=order):
        accs = sorted(by_key[key])
        scene, enc, sha_k, depth, focal_mode = key
        lines.append(
            f"| {scene} | {enc} | {sha_k} | {depth} | {focal_mode} | {len(accs)} | "
            f"{accs[0]:.1f}% / {accs[len(accs)//2]:.1f}% / {accs[-1]:.1f}% |"
        )
    summary = "\n".join(lines)
    (out_dir / "REPORT.md").write_text(summary + "\n")
    return summary


if __name__ == "__main__":
    raise SystemExit(main())
