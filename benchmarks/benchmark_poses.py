#!/usr/bin/env python3
"""View-synthesis benchmark entry point (python -m benchmarks.benchmark_poses).

Equivalent of /root/reference/benchmarks/benchmark_poses.py: ACE pose file ->
transforms.json -> ns-train nerfacto|splatfacto -> ns-eval -> PSNR/SSIM/LPIPS.
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

from acezero_tpu.export.nerfstudio_runner import NerfBenchmarkConfig, run_benchmark


def main() -> int:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(
        description="Benchmark ACE0 poses via novel view synthesis.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--pose_file", type=Path, required=True)
    parser.add_argument("--output_dir", type=Path, required=True)
    parser.add_argument("--images_glob_pattern", type=str, required=True)
    parser.add_argument("--split_json", type=Path, default=None)
    parser.add_argument("--method", choices=["nerfacto", "splatfacto"], default="nerfacto")
    args = parser.parse_args()

    results = run_benchmark(
        args.pose_file,
        args.images_glob_pattern,
        args.output_dir,
        NerfBenchmarkConfig(method=args.method),
        split_file=args.split_json,
    )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
