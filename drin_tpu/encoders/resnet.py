# -*- coding: utf-8 -*-
"""ResNet encoder in flax, numerics-compatible with HF ``ResNetModel``
(``microsoft/resnet-152``: bottleneck v1, stem 7x7/2 + maxpool 3x3/2, stages
[3, 8, 36, 3] at widths [256, 512, 1024, 2048]).

The reference uses it frozen for image-region features
(``preprocess/resnet.py:87-102``: conv map [B, 2048, 7, 7] -> 49 regions) and
for object-crop pooling (``resnet.py:159-162``: pooler_output).  This flax
version runs NHWC (TPU-native conv layout) and in inference mode (BatchNorm
running statistics as parameters — the encoders are always frozen here, as in
the reference).

Outputs: ``last_hidden_state`` [B, H', W', C'] (NHWC; reshape(B, H'*W', C')
matches the reference's region ordering) and ``pooler_output`` [B, C'].
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ResNetConfig:
    def __init__(
        self,
        embedding_size: int = 64,
        hidden_sizes: Sequence[int] = (256, 512, 1024, 2048),
        depths: Sequence[int] = (3, 8, 36, 3),  # resnet-152
        downsample_in_first_stage: bool = False,
        downsample_in_bottleneck: bool = False,
        num_channels: int = 3,
        bn_eps: float = 1e-5,
    ):
        self.embedding_size = embedding_size
        self.hidden_sizes = tuple(hidden_sizes)
        self.depths = tuple(depths)
        self.downsample_in_first_stage = downsample_in_first_stage
        self.downsample_in_bottleneck = downsample_in_bottleneck
        self.num_channels = num_channels
        self.bn_eps = bn_eps


class BatchNorm(nn.Module):
    """Inference-mode BatchNorm: running stats are parameters (frozen
    encoders only)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return x * inv + (bias - mean * inv)


class ConvLayer(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    act: bool = True
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        x = nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(k // 2, k // 2)] * 2,
            use_bias=False,
            name="conv",
        )(x)
        x = BatchNorm(self.features, self.bn_eps, name="bn")(x)
        return nn.relu(x) if self.act else x


class BottleneckLayer(nn.Module):
    features: int
    stride: int = 1
    reduction: int = 4
    shortcut: bool = False
    downsample_in_bottleneck: bool = False
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        residual = x
        if self.shortcut:
            residual = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="shortcut_conv")(x)
            residual = BatchNorm(self.features, self.bn_eps, name="shortcut_bn")(residual)
        red = self.features // self.reduction
        s_first = self.stride if self.downsample_in_bottleneck else 1
        s_mid = self.stride if not self.downsample_in_bottleneck else 1
        x = ConvLayer(red, 1, s_first, bn_eps=self.bn_eps, name="conv0")(x)
        x = ConvLayer(red, 3, s_mid, bn_eps=self.bn_eps, name="conv1")(x)
        x = ConvLayer(self.features, 1, 1, act=False, bn_eps=self.bn_eps, name="conv2")(x)
        return nn.relu(x + residual)


class ResNetModel(nn.Module):
    cfg: ResNetConfig

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: [B, H, W, 3] NHWC, normalized."""
        c = self.cfg
        x = ConvLayer(c.embedding_size, 7, 2, bn_eps=c.bn_eps, name="embedder")(pixel_values)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        in_ch = c.embedding_size
        for si, (width, depth) in enumerate(zip(c.hidden_sizes, c.depths)):
            stride = (2 if c.downsample_in_first_stage else 1) if si == 0 else 2
            for li in range(depth):
                shortcut = li == 0 and (in_ch != width or stride != 1)
                x = BottleneckLayer(
                    width,
                    stride=stride if li == 0 else 1,
                    shortcut=shortcut,
                    downsample_in_bottleneck=c.downsample_in_bottleneck,
                    bn_eps=c.bn_eps,
                    name=f"stage{si}_layer{li}",
                )(x)
                in_ch = width
        pooled = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1,1)
        return x, pooled


# ---------------------------------------------------------------------------


def _conv(w) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.asarray(w).transpose(2, 3, 1, 0).copy()


def _bn(sd: Mapping, prefix: str) -> dict:
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }


def resnet_params_from_torch(sd: Mapping, cfg: ResNetConfig, prefix: str = "") -> dict:
    """HF ``ResNetModel.state_dict()`` -> flax params."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params = {
        "embedder": {
            "conv": {"kernel": _conv(sd["embedder.embedder.convolution.weight"])},
            "bn": _bn(sd, "embedder.embedder.normalization"),
        }
    }
    for si, depth in enumerate(cfg.depths):
        for li in range(depth):
            p = f"encoder.stages.{si}.layers.{li}"
            layer: dict = {}
            if p + ".shortcut.convolution.weight" in sd:
                layer["shortcut_conv"] = {"kernel": _conv(sd[p + ".shortcut.convolution.weight"])}
                layer["shortcut_bn"] = _bn(sd, p + ".shortcut.normalization")
            for ci in range(3):
                layer[f"conv{ci}"] = {
                    "conv": {"kernel": _conv(sd[f"{p}.layer.{ci}.convolution.weight"])},
                    "bn": _bn(sd, f"{p}.layer.{ci}.normalization"),
                }
            params[f"stage{si}_layer{li}"] = layer
    return params


def config_from_torch(torch_cfg) -> ResNetConfig:
    return ResNetConfig(
        embedding_size=torch_cfg.embedding_size,
        hidden_sizes=torch_cfg.hidden_sizes,
        depths=torch_cfg.depths,
        downsample_in_first_stage=torch_cfg.downsample_in_first_stage,
        downsample_in_bottleneck=getattr(torch_cfg, "downsample_in_bottleneck", False),
        num_channels=torch_cfg.num_channels,
    )
