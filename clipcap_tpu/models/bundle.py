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
        # multi-chip decode hooks (set by enable_tensor_parallel /
        # enable_data_parallel_decode)
        self.cache_constraint = None
        self.tp_mesh = None
        self._decode_sharding = None  # None | "tp" | "dp"
        # int8 weight-streaming decode (set by enable_int8_decode)
        self._int8_lm = None
        self._int8_lm_params = None

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
        if self._int8_lm is not None:
            raise ValueError(
                "int8 decode and tensor-parallel decode are mutually "
                "exclusive (the TP shardings describe the bf16 layout)"
            )
        if self._decode_sharding is not None:
            raise ValueError(
                f"{self._decode_sharding} decode sharding already enabled"
            )
        n_dev = len(_jax.devices())
        dp = data_parallel or max(1, n_dev // model_parallel)
        mesh = make_mesh(MeshSpec(data=dp, model=model_parallel))
        sh = gptj_decode_shardings(mesh, self.params["lm"])
        self.params["lm"] = _jax.device_put(self.params["lm"], sh.params)
        self.cache_constraint = sh.constrain_cache
        self.tp_mesh = mesh
        self._decode_sharding = "tp"
        return mesh

    def enable_data_parallel_decode(self, data_parallel: Optional[int] = None):
        """Shard decode over the batch axis: params replicated on every
        chip, KV cache batch-sharded (parallel/dp.py) — the generation
        equivalent of the reference's DDP and the multi-chip scale-out
        for GPT-2 (whose 25 heads do not split tensor-parallel). Composes
        with enable_int8_decode (the int8 caches' scale slabs shard like
        k/v); mutually exclusive with tensor-parallel decode.
        """
        import jax as _jax

        from ..core.mesh import MeshSpec, make_mesh
        from ..parallel.dp import dp_decode_shardings

        if self._decode_sharding is not None:
            raise ValueError(
                f"{self._decode_sharding} decode sharding already enabled"
            )
        dp = data_parallel or len(_jax.devices())
        mesh = make_mesh(MeshSpec(data=dp, model=1))
        sh = dp_decode_shardings(mesh)
        self.params["lm"] = _jax.device_put(
            self.params["lm"], sh.params(self.params["lm"])
        )
        if self._int8_lm_params is not None:
            self._int8_lm_params = _jax.device_put(
                self._int8_lm_params, sh.params(self._int8_lm_params)
            )
        self.cache_constraint = sh.constrain_cache
        self.tp_mesh = mesh
        self._decode_sharding = "dp"
        return mesh

    # --- int8 decode ------------------------------------------------------------

    def enable_int8_decode(self):
        """Quantize the LM once for int8 weight-streaming decode.

        Decode is HBM-bound (the per-token weight + KV stream); int8
        weights with per-output-channel scales and an int8 KV cache halve
        it — measured 425 vs 327 captions/s on GPT2-XL at batch 256
        (bench.py). Only the *decode* surface switches (lm_decode /
        lm_decode_params, used by the samplers, beam search and
        cli/infer); forward/loss and embed_text keep the full-precision
        params. Greedy tokens can differ from the bf16 path at
        quantization boundaries (tests/test_gpt2_int8.py bounds the
        disagreement).
        """
        from ..lm.registry import normalize_lm_type

        if self._decode_sharding == "tp":
            raise ValueError(
                "int8 decode and tensor-parallel decode are mutually "
                "exclusive (the TP shardings describe the bf16 layout)"
            )
        t = normalize_lm_type(self.cap_cfg.lm_type)
        if t == "gpt2":
            from . import gpt2 as m

            mod = m.gpt2_int8
        elif t == "gptj":
            from . import gptj as m

            mod = m.gptj_int8
        elif t == "t5":
            from . import t5 as m

            # t5's linears dispatch on quantized leaves (ops.quant.linear),
            # so the regular module drives the int8 params directly; int8
            # is what fits T0-11B (22 GB bf16) on a 16 GB chip at all
            mod = m
        else:
            raise ValueError(
                f"int8 decode is implemented for gpt2/gptj/t5, not {t!r}"
            )
        self._int8_lm_params = jax.jit(m.quantize_params)(self.params["lm"])
        self._int8_lm = mod
        return self

    @property
    def lm_decode(self):
        """The LM module decode paths should drive (int8 when enabled)."""
        return self._int8_lm if self._int8_lm is not None else self.lm

    @property
    def lm_decode_params(self):
        return (self._int8_lm_params if self._int8_lm_params is not None
                else self.params["lm"])

    def make_serving_engine(self, settings, slots: int = 256, **kw):
        """Continuous-batching engine over this bundle's decode LM.

        Returns a decode.serving.ServingEngine bound to lm_decode (int8
        when enabled); drive it with `eng.serve(requests,
        bundle.lm_decode_params, prefix_pool=...)` where the pool rows are
        project_prefix outputs. Requires a ring-capable LM (GPT-2/GPT-J —
        see decode/serving.py).
        """
        from ..decode.serving import ServingEngine

        # activation dtype must track the params (a bf16 step over f32
        # weights would change the scan-carry dtype mid-layer); the
        # embedding table is full-precision in every decode param set,
        # including the int8 ones ("wte" gpt2/gptj, "shared" t5)
        p = self.lm_decode_params
        kw.setdefault("dtype", p.get("wte", p.get("shared")).dtype)
        return ServingEngine(
            self.lm_decode, self.lm_cfg,
            prefix_len=self.cap_cfg.mapper.prefix_length,
            settings=settings, slots=slots, **kw,
        )

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
