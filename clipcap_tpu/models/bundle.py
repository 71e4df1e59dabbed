"""CaptionerBundle: the runtime handle tying params + configs + tokenizer.

The reference's CLIPCaptionModel instance plays this role (a
LightningModule holding language_model/tokenizer/visual_encoder/
clip_project, model.py:25-78). Here models are pure functions, so the
bundle is a thin frozen container with jitted conveniences used by the
samplers, validator and CLIs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core.config import CaptionerConfig, ViTConfig
from ..lm.registry import get_lm
from . import captioner, vit


@dataclasses.dataclass
class CaptionerBundle:
    params: dict  # {"mapper", "lm", ["visual"]}
    cap_cfg: CaptionerConfig
    lm_cfg: Any
    tokenizer: Any
    vit_cfg: Optional[ViTConfig] = None  # config of params["visual"] if present

    def __post_init__(self):
        self.lm = get_lm(self.cap_cfg.lm_type)
        self._encode_image = None
        self._project = jax.jit(
            lambda p, x: captioner.project_prefix(p, self.cap_cfg, x)
        )
        # multi-chip decode hooks (set by enable_tensor_parallel)
        self.cache_constraint = None
        self.tp_mesh = None

    # --- multi-chip -------------------------------------------------------------

    def enable_tensor_parallel(self, model_parallel: int,
                               data_parallel: Optional[int] = None):
        """Shard the LM for tensor-parallel KV-cached decode.

        Builds a (data, model) mesh, lays the GPT-J params out head-/width-
        sharded over the model axis (parallel/tp.py) and installs the
        engine's cache_constraint hook so the KV cache stays sharded across
        every decode step. The reference's closest analog is the manual
        two-GPU placement in caption_me.py:49-50; here the layout is a real
        tensor-parallel decomposition over the mesh.
        """
        import jax as _jax

        from ..core.mesh import MeshSpec, make_mesh
        from ..lm.registry import normalize_lm_type
        from ..parallel.tp import gptj_decode_shardings

        if normalize_lm_type(self.cap_cfg.lm_type) != "gptj":
            raise ValueError(
                "tensor-parallel decode is implemented for GPT-J (heads and "
                "MLP widths divide the model axis); GPT2-XL's 25 heads do "
                "not split — use data parallelism (see PARITY.md)"
            )
        n_dev = len(_jax.devices())
        dp = data_parallel or max(1, n_dev // model_parallel)
        mesh = make_mesh(MeshSpec(data=dp, model=model_parallel))
        sh = gptj_decode_shardings(mesh, self.params["lm"])
        self.params["lm"] = _jax.device_put(self.params["lm"], sh.params)
        self.cache_constraint = sh.constrain_cache
        self.tp_mesh = mesh
        return mesh

    # --- visual ---------------------------------------------------------------

    def encode_image(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """[B, 3, H, W] -> visual features (BLIP tokens or CLIP features)."""
        if "visual" not in self.params or self.vit_cfg is None:
            raise ValueError("bundle has no visual encoder (precomputed-prefix mode)")
        if self._encode_image is None:
            mode = "tokens" if self.vit_cfg.style == "blip" else (
                "tokens_proj" if self.cap_cfg.mapper.use_all_features else "pooled"
            )
            self._encode_image = jax.jit(
                lambda px: vit.apply(self.params["visual"], self.vit_cfg, px, output=mode)
            )
        return self._encode_image(pixels)

    # --- mapper / LM ------------------------------------------------------------

    def project_prefix(self, visual_features: jnp.ndarray) -> jnp.ndarray:
        return self._project(self.params, visual_features)

    def prefix_from_pixels(self, pixels: jnp.ndarray) -> jnp.ndarray:
        return self.project_prefix(self.encode_image(pixels))

    def embed_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.lm.embed_tokens(self.params["lm"], tokens)

    def forward(self, tokens, prefix, mask=None):
        return captioner.forward(
            self.params, self.cap_cfg, self.lm_cfg, tokens, prefix, mask
        )
