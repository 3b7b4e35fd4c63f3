"""Torch checkpoint interop (host-side, torch-cpu).

The reference ecosystem exchanges weights as torch state dicts:
  - `ace_encoder_pretrained.pt` — the scene-agnostic pretrained encoder;
  - `iterationX.pt` — head-only, fp16 (~4MB), the "scene map" artifact
    (/root/reference/ace_trainer.py:681-694), with the architecture inferred
    from the state dict when loading (/root/reference/ace_network.py:201-232).

This module converts those formats to/from our HWIO / (cin, cout) pytrees so
checkpoints remain drop-in compatible in both directions.
"""

from __future__ import annotations

import math
import re
from pathlib import Path

import numpy as np

from acezero_tpu.models.head import HeadConfig

_HEAD_DENSE_KEYS = ["res3_conv1", "res3_conv2", "res3_conv3", "fc1", "fc2", "fc3", "head_skip"]


def _torch():
    import torch  # local import: torch is host-side interop only

    return torch


def _conv_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _hwio_to_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(3, 2, 0, 1))


def _dense_from_torch(w: np.ndarray) -> np.ndarray:
    """torch 1x1 conv weight (cout, cin, 1, 1) -> dense (cin, cout)."""
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def _dense_to_torch(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)[:, :, None, None]


def _to_numpy(state_dict) -> dict:
    return {k: np.asarray(v.detach().to("cpu").float().numpy()) for k, v in state_dict.items()}


def load_state_dict(path: str | Path) -> dict:
    torch = _torch()
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return _to_numpy(sd)


def import_encoder_state_dict(sd: dict) -> dict:
    """torch encoder state dict -> encoder param pytree (HWIO convs)."""
    params = {}
    for key in sd:
        if key.endswith(".weight"):
            name = key[: -len(".weight")]
            params[name] = {
                "w": _conv_to_hwio(sd[key]).astype(np.float32),
                "b": sd[name + ".bias"].astype(np.float32),
            }
    return params


def export_encoder_state_dict(params: dict, half: bool = False):
    torch = _torch()

    def t(x):
        out = torch.from_numpy(np.ascontiguousarray(x))
        return out.half() if half else out

    sd = {}
    for name, p in params.items():
        sd[name + ".weight"] = t(_hwio_to_conv(np.asarray(p["w"], np.float32)))
        sd[name + ".bias"] = t(np.asarray(p["b"], np.float32))
    return sd


def import_head_state_dict(sd: dict) -> tuple[HeadConfig, dict]:
    """torch head state dict -> (HeadConfig, head param pytree).

    The architecture is inferred from the weights exactly as the reference
    does (/root/reference/ace_network.py:201-232): extra-block count from
    `<i>c0.weight` keys, homogeneous output from fc3's output width.
    """
    pattern = re.compile(r"^(\d+)c0\.weight$")
    num_blocks = sum(1 for k in sd if pattern.match(k))
    use_homogeneous = sd["fc3.weight"].shape[0] == 4
    in_channels = sd["res3_conv1.weight"].shape[1]
    head_channels = sd["res3_conv1.weight"].shape[0]

    kwargs = {}
    if "max_scale" in sd:
        kwargs["homogeneous_max_scale"] = float(sd["max_scale"].reshape(-1)[0])
        kwargs["homogeneous_min_scale"] = float(sd["min_scale"].reshape(-1)[0])
    cfg = HeadConfig(
        num_head_blocks=num_blocks,
        use_homogeneous=use_homogeneous,
        in_channels=in_channels,
        head_channels=head_channels,
        **kwargs,
    )

    params: dict = {"blocks": []}
    for key in _HEAD_DENSE_KEYS:
        if key + ".weight" in sd:
            params[key] = {
                "w": _dense_from_torch(sd[key + ".weight"]).astype(np.float32),
                "b": sd[key + ".bias"].astype(np.float32),
            }
    for i in range(num_blocks):
        params["blocks"].append(
            {
                f"c{j}": {
                    "w": _dense_from_torch(sd[f"{i}c{j}.weight"]).astype(np.float32),
                    "b": sd[f"{i}c{j}.bias"].astype(np.float32),
                }
                for j in range(3)
            }
        )
    params["mean"] = sd["mean"].reshape(3).astype(np.float32)
    return cfg, params


def export_head_state_dict(params: dict, cfg: HeadConfig, half: bool = True):
    """Head param pytree -> torch state dict (fp16 by default, ~4MB).

    Emits the same keys (including the scale buffers) the reference writes,
    so the artifact round-trips through `Regressor.create_from_state_dict`.
    """
    torch = _torch()

    def t(x):
        out = torch.from_numpy(np.asarray(x, np.float32).copy())
        return out.half() if half else out

    sd = {}
    for key in _HEAD_DENSE_KEYS:
        if key in params:
            sd[key + ".weight"] = t(_dense_to_torch(np.asarray(params[key]["w"], np.float32)))
            sd[key + ".bias"] = t(np.asarray(params[key]["b"], np.float32))
    for i, block in enumerate(params["blocks"]):
        for j in range(3):
            sd[f"{i}c{j}.weight"] = t(_dense_to_torch(np.asarray(block[f"c{j}"]["w"], np.float32)))
            sd[f"{i}c{j}.bias"] = t(np.asarray(block[f"c{j}"]["b"], np.float32))

    if cfg.use_homogeneous:
        max_scale = np.array([cfg.homogeneous_max_scale], np.float32)
        min_scale = np.array([cfg.homogeneous_min_scale], np.float32)
        sd["max_scale"] = t(max_scale)
        sd["min_scale"] = t(min_scale)
        sd["max_inv_scale"] = t(1.0 / max_scale)
        sd["h_beta"] = t(np.array([math.log(2.0) / (1.0 - 1.0 / max_scale[0])], np.float32))
        sd["min_inv_scale"] = t(1.0 / min_scale)
    sd["mean"] = t(np.asarray(params["mean"], np.float32).reshape(1, 3, 1, 1))
    return sd


def save_head(path: str | Path, params: dict, cfg: HeadConfig, half: bool = True) -> None:
    torch = _torch()
    torch.save(export_head_state_dict(params, cfg, half=half), str(path))


def load_head(path: str | Path) -> tuple[HeadConfig, dict]:
    return import_head_state_dict(load_state_dict(path))


def save_encoder(path: str | Path, params: dict, half: bool = False) -> None:
    torch = _torch()
    torch.save(export_encoder_state_dict(params, half=half), str(path))


def load_encoder(path: str | Path) -> dict:
    return import_encoder_state_dict(load_state_dict(path))
