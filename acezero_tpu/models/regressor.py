"""Scene-coordinate regressor: frozen encoder + scene head bundle.

The in-process analogue of the reference `Regressor`
(/root/reference/ace_network.py:152-270): `create_*` constructors mirror the
reference factory surface (from encoder / from full state dict / from split
encoder+head dicts) and artifacts stay .pt-compatible via torch_io.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from pathlib import Path

import jax
import jax.numpy as jnp

from acezero_tpu.models import torch_io
from acezero_tpu.models.encoder import encoder_apply, init_encoder_params
from acezero_tpu.models.head import HeadConfig, head_apply_flat, head_apply_image, init_head_params

OUTPUT_SUBSAMPLE = 8  # total encoder stride; reference ace_network.py:159


@dataclass
class Regressor:
    encoder_params: dict
    head_params: dict
    head_cfg: HeadConfig

    # --- constructors -----------------------------------------------------

    @classmethod
    def create_new(
        cls,
        key: jax.Array,
        mean: jax.Array,
        num_head_blocks: int = 1,
        use_homogeneous: bool = True,
        num_encoder_features: int = 512,
    ) -> "Regressor":
        ekey, hkey = jax.random.split(key)
        cfg = HeadConfig(
            num_head_blocks=num_head_blocks,
            use_homogeneous=use_homogeneous,
            in_channels=num_encoder_features,
        )
        return cls(
            encoder_params=init_encoder_params(ekey, num_encoder_features),
            head_params=init_head_params(hkey, cfg, mean),
            head_cfg=cfg,
        )

    @classmethod
    def create_from_encoder(
        cls,
        key: jax.Array,
        encoder_params: dict,
        mean: jax.Array,
        num_head_blocks: int = 1,
        use_homogeneous: bool = True,
    ) -> "Regressor":
        num_features = encoder_params["res2_conv3"]["w"].shape[-1]
        cfg = HeadConfig(
            num_head_blocks=num_head_blocks,
            use_homogeneous=use_homogeneous,
            in_channels=num_features,
        )
        return cls(
            encoder_params=encoder_params,
            head_params=init_head_params(key, cfg, mean),
            head_cfg=cfg,
        )

    @classmethod
    def create_from_split_state_dict(
        cls, encoder_pt: str | Path, head_pt: str | Path
    ) -> "Regressor":
        encoder_params = torch_io.load_encoder(encoder_pt)
        head_cfg, head_params = torch_io.load_head(head_pt)
        return cls(encoder_params=encoder_params, head_params=head_params, head_cfg=head_cfg)

    def with_new_head(self, key: jax.Array, mean: jax.Array) -> "Regressor":
        """Fresh head on the same encoder (used by the final refit)."""
        return replace(self, head_params=init_head_params(key, self.head_cfg, mean))

    # --- forward ----------------------------------------------------------

    def get_features(self, images_nhwc: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
        return encoder_apply(self.encoder_params, images_nhwc, compute_dtype)

    def get_scene_coordinates_flat(self, features: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
        return head_apply_flat(self.head_params, self.head_cfg, features, compute_dtype)

    def get_scene_coordinates_image(self, features_nhwc: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
        return head_apply_image(self.head_params, self.head_cfg, features_nhwc, compute_dtype)

    def forward(self, images_nhwc: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
        """(N, H, W, 1) images -> (N, H/8, W/8, 3) scene coordinates."""
        return self.get_scene_coordinates_image(
            self.get_features(images_nhwc, compute_dtype), compute_dtype
        )

    # --- artifacts --------------------------------------------------------

    def save_head(self, path: str | Path) -> None:
        torch_io.save_head(path, jax.device_get(self.head_params), self.head_cfg)
