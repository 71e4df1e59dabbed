"""CLIP ModifiedResNet parity vs a torch oracle built from the published
architecture (anti-aliased bottlenecks + attention pooling), sharing
weights through the OpenAI-checkpoint import path.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax.numpy as jnp

from clipcap_tpu.models.clip_resnet import ResNetConfig, apply
from clipcap_tpu.tools.import_weights import (
    clip_resnet_config_from_state_dict,
    clip_resnet_from_openai_state_dict,
)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.AvgPool2d(stride) if stride > 1 else nn.Identity(),
                nn.Conv2d(inplanes, planes * 4, 1, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class TorchModifiedResNet(nn.Module):
    def __init__(self, layers, width, output_dim, heads, image_size):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0], stride=1)
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        embed_dim = width * 32
        self.heads = heads
        spacial = image_size // 32
        self.attn_pos = nn.Parameter(torch.randn(spacial**2 + 1, embed_dim) / embed_dim**0.5)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)

    def _make_layer(self, planes, blocks, stride):
        layers = [TorchBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self._inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        b, c, h, w = x.shape
        x = x.reshape(b, c, h * w).permute(2, 0, 1)
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.attn_pos[:, None, :]
        out, _ = F.multi_head_attention_forward(
            query=x[:1], key=x, value=x, embed_dim_to_check=c,
            num_heads=self.heads,
            q_proj_weight=self.q_proj.weight, k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight, in_proj_weight=None,
            in_proj_bias=torch.cat([self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
            out_proj_weight=self.c_proj.weight, out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True, training=False, need_weights=False,
        )
        return out.squeeze(0)

    def openai_state_dict(self):
        """Rename to the OpenAI checkpoint layout (visual.* keys)."""
        sd = {}
        for k, v in self.state_dict().items():
            k = k.replace("attn_pos", "attnpool.positional_embedding")
            for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
                if k.startswith(proj):
                    k = "attnpool." + k
            # downsample Sequential indices: 0=avgpool(no params),1=conv,2=bn
            k = k.replace("downsample.1", "downsample.0").replace("downsample.2", "downsample.1")
            sd["visual." + k] = v
        return sd


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    cfg = ResNetConfig(layers=(1, 1, 1, 1), width=16, output_dim=24, heads=8,
                       image_size=64)
    oracle = TorchModifiedResNet(cfg.layers, cfg.width, cfg.output_dim,
                                 cfg.heads, cfg.image_size).eval()
    # randomize BN running stats so the import path is actually exercised
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    sd = oracle.openai_state_dict()
    params = clip_resnet_from_openai_state_dict(sd, cfg)
    return oracle, params, cfg, sd


def test_config_derivation(models):
    _, _, cfg, sd = models
    derived = clip_resnet_config_from_state_dict(sd)
    assert derived.layers == cfg.layers
    assert derived.width == cfg.width
    assert derived.output_dim == cfg.output_dim
    assert derived.heads == cfg.width * 32 // 64
    assert derived.image_size == cfg.image_size


def test_forward_parity(models):
    oracle, params, cfg, _ = models
    torch.manual_seed(1)
    pixels = torch.randn(2, 3, cfg.image_size, cfg.image_size)
    with torch.no_grad():
        want = oracle(pixels).numpy()
    got = apply(params, cfg, jnp.asarray(pixels.numpy()))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_known_variants():
    for name in ("RN50", "RN101", "RN50x4", "RN50x16", "RN50x64"):
        cfg = ResNetConfig.variant(name)
        assert cfg.heads == cfg.width // 2
