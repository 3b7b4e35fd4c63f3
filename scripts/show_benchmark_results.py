#!/usr/bin/env python3
"""Print PSNR/SSIM/LPIPS tables from benchmark output folders.

Equivalent of /root/reference/scripts/show_benchmark_results.py.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from acezero_tpu.export.nerfstudio_runner import collect_results  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser(description="Show benchmark results.")
    parser.add_argument("results_root", type=Path)
    args = parser.parse_args()

    rows = collect_results(args.results_root)
    if not rows:
        print(f"No eval.json files under {args.results_root}")
        return 1
    print(f"{'scene':40s} {'psnr':>8s} {'ssim':>8s} {'lpips':>8s}")
    for path, r in rows.items():
        print(
            f"{Path(path).parent.parent.name:40s} "
            f"{r.get('psnr', float('nan')):8.2f} "
            f"{r.get('ssim', float('nan')):8.3f} "
            f"{r.get('lpips', float('nan')):8.3f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
