"""Nerfstudio benchmark runner exercised against stub executables.

The reference shells out to `ns-train` / `ns-eval` from a dedicated conda
environment (/root/reference/benchmarks/run_nerfstudio.py:26-85). A real
Nerfstudio install is not available in-env, but the runner's own work —
transforms.json conversion, command-line construction, expected directory
layout, eval.json parsing — is fully testable with fake executables on PATH
that record their argv and emit the artifacts the real CLIs produce.
"""

import json
import os
import stat

import numpy as np
import pytest
from PIL import Image
from scipy.spatial.transform import Rotation

from acezero_tpu.export.nerfstudio_runner import (
    NerfBenchmarkConfig,
    collect_results,
    run_benchmark,
)
from acezero_tpu.io.pose_files import PoseFileEntry, write_pose_file

NS_TRAIN_STUB = """#!/bin/sh
# record argv, then create the run directory layout ns-train produces
printf '%s\\n' "$@" > "{bindir}/ns_train_argv.txt"
outdir=""
method="$1"
prev=""
for a in "$@"; do
  if [ "$prev" = "--output-dir" ]; then outdir="$a"; fi
  prev="$a"
done
mkdir -p "$outdir/$method/$method/run"
echo "stub: true" > "$outdir/$method/$method/run/config.yml"
"""

NS_EVAL_STUB = """#!/bin/sh
printf '%s\\n' "$@" > "{bindir}/ns_eval_argv.txt"
outpath=""
prev=""
for a in "$@"; do
  if [ "$prev" = "--output-path" ]; then outpath="$a"; fi
  prev="$a"
done
cat > "$outpath" <<'EOF'
{{"results": {{"psnr": 24.5, "ssim": 0.81, "lpips": 0.21}}}}
EOF
"""


@pytest.fixture
def stub_bin(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, body in (("ns-train", NS_TRAIN_STUB), ("ns-eval", NS_EVAL_STUB)):
        script = bindir / name
        script.write_text(body.format(bindir=bindir))
        script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")
    return bindir


@pytest.fixture
def pose_scene(tmp_path, rng):
    files, entries = [], []
    for i in range(16):
        p = tmp_path / f"img_{i:03d}.png"
        Image.fromarray(rng.uniform(0, 255, (48, 64)).astype(np.uint8)).save(p)
        pose = np.eye(4)
        pose[:3, :3] = Rotation.random(random_state=np.random.RandomState(i)).as_matrix()
        pose[:3, 3] = rng.normal(size=3)
        entries.append(PoseFileEntry(str(p), pose, 500.0, 2000.0))
        files.append(str(p))
    pose_file = tmp_path / "poses_final.txt"
    write_pose_file(pose_file, entries)
    return tmp_path, pose_file


def test_run_benchmark_end_to_end(stub_bin, pose_scene, tmp_path):
    scene_dir, pose_file = pose_scene
    out = tmp_path / "bench_out"

    results = run_benchmark(
        pose_file,
        str(scene_dir / "*.png"),
        out,
        NerfBenchmarkConfig(method="nerfacto"),
    )

    # eval.json metrics parsed through
    assert results == {"psnr": 24.5, "ssim": 0.81, "lpips": 0.21}

    # ns-train command line: method, data/output dirs, preload heuristic
    # (16 frames <= 3500 -> images-on-gpu True), filename eval mode
    train_argv = (stub_bin / "ns_train_argv.txt").read_text().splitlines()
    assert train_argv[0] == "nerfacto"
    assert train_argv[train_argv.index("--data") + 1] == str(out)
    assert train_argv[train_argv.index("--output-dir") + 1] == str(out / "runs")
    gpu_idx = train_argv.index("--pipeline.datamanager.images-on-gpu")
    assert train_argv[gpu_idx + 1] == "True"
    assert train_argv[train_argv.index("--eval-mode") + 1] == "filename"
    assert "nerfstudio-data" in train_argv

    # ns-eval pointed at the config ns-train wrote, inside the expected layout
    eval_argv = (stub_bin / "ns_eval_argv.txt").read_text().splitlines()
    config_path = eval_argv[eval_argv.index("--load-config") + 1]
    assert config_path == str(out / "runs" / "nerfacto" / "nerfacto" / "run" / "config.yml")

    # transforms.json written next to the run
    with open(out / "transforms.json") as f:
        transforms = json.load(f)
    assert len(transforms["frames"]) == 16

    # collect_results (show_benchmark_results behavior) finds the eval.json
    collected = collect_results(out)
    assert len(collected) == 1
    assert next(iter(collected.values()))["psnr"] == 24.5


def test_run_benchmark_missing_cli(pose_scene, tmp_path, monkeypatch):
    scene_dir, pose_file = pose_scene
    monkeypatch.setenv("PATH", str(tmp_path / "empty"))
    with pytest.raises(RuntimeError, match="ns-train"):
        run_benchmark(pose_file, str(scene_dir / "*.png"), tmp_path / "o")


def test_splatfacto_method_and_test_cap(stub_bin, pose_scene, tmp_path):
    scene_dir, pose_file = pose_scene
    out = tmp_path / "bench_splat"
    run_benchmark(
        pose_file,
        str(scene_dir / "*.png"),
        out,
        NerfBenchmarkConfig(method="splatfacto", max_test_images=1),
    )
    train_argv = (stub_bin / "ns_train_argv.txt").read_text().splitlines()
    assert train_argv[0] == "splatfacto"
    with open(out / "transforms.json") as f:
        transforms = json.load(f)
    assert len(transforms["test_filenames"]) == 1
