"""2D BEV backbone (reference: backbones_2d/base_bev_backbone.py BaseBEVBackbone).

Config-driven down/up branches + concat. NHWC layout (TPU-native); convs run in
the module compute dtype (bf16 by default on TPU) with fp32 params and fp32 BN.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    transpose: bool = False
    padding: object = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.transpose:
            x = nn.ConvTranspose(
                self.features, (self.kernel, self.kernel),
                strides=(self.stride, self.stride), padding="SAME", use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        else:
            x = nn.Conv(
                self.features, (self.kernel, self.kernel),
                strides=(self.stride, self.stride), padding=self.padding,
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )(x)
        return nn.relu(x).astype(self.dtype)


class BaseBEVBackbone(nn.Module):
    """config keys: LAYER_NUMS, LAYER_STRIDES, NUM_FILTERS, UPSAMPLE_STRIDES,
    NUM_UPSAMPLE_FILTERS."""

    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[float]
    num_upsample_filters: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        """x: (B, H, W, C) → (B, H/out_stride, W/out_stride, sum(upsample filters))."""
        ups = []
        for i, num_layers in enumerate(self.layer_nums):
            x = ConvBNReLU(
                self.num_filters[i], stride=self.layer_strides[i], dtype=self.dtype,
                name=f"block{i}_down",
            )(x, train)
            for j in range(num_layers):
                x = ConvBNReLU(
                    self.num_filters[i], dtype=self.dtype, name=f"block{i}_conv{j}"
                )(x, train)
            if i < len(self.upsample_strides):
                stride = self.upsample_strides[i]
                if stride >= 1:
                    up = ConvBNReLU(
                        self.num_upsample_filters[i], kernel=int(stride),
                        stride=int(stride), transpose=True, dtype=self.dtype,
                        name=f"deblock{i}",
                    )(x, train)
                else:
                    # fractional "upsample" = downsample conv, kernel = stride
                    # = round(1/s), no padding (reference base_bev_backbone.py:60-70)
                    k = int(round(1 / stride))
                    up = ConvBNReLU(
                        self.num_upsample_filters[i], kernel=k, stride=k,
                        padding="VALID", dtype=self.dtype, name=f"deblock{i}",
                    )(x, train)
                ups.append(up)
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0] if ups else x


class ResConvBlock(nn.Module):
    """2D residual basic block (reference base_bev_backbone.py BasicBlock).
    `downsample` forces the conv+BN shortcut even at stride 1 / matching
    channels — the reference passes downsample=True for every level-leading
    block (base_bev_backbone.py:280)."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32,
                         param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32,
                         param_dtype=jnp.float32)(y)
        if (self.downsample or self.stride != 1
                or identity.shape[-1] != self.features):
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32, name="shortcut")(identity)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.99, epsilon=1e-3,
                                    dtype=jnp.float32, param_dtype=jnp.float32,
                                    name="shortcut_bn")(identity)
        return nn.relu(y + identity.astype(y.dtype)).astype(self.dtype)


class BaseBEVResBackbone(nn.Module):
    """Residual-block BEV backbone (reference BaseBEVResBackbone) — same
    config surface as BaseBEVBackbone."""

    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[float]
    num_upsample_filters: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        ups = []
        for i, num_layers in enumerate(self.layer_nums):
            x = ResConvBlock(self.num_filters[i], stride=self.layer_strides[i],
                             downsample=True, dtype=self.dtype,
                             name=f"block{i}_down")(x, train)
            for j in range(num_layers):
                x = ResConvBlock(self.num_filters[i], dtype=self.dtype,
                                 name=f"block{i}_res{j}")(x, train)
            if i < len(self.upsample_strides):
                stride = self.upsample_strides[i]
                if stride >= 1:
                    up = ConvBNReLU(self.num_upsample_filters[i],
                                    kernel=int(stride), stride=int(stride),
                                    transpose=True, dtype=self.dtype,
                                    name=f"deblock{i}")(x, train)
                else:
                    k = int(round(1 / stride))
                    up = ConvBNReLU(self.num_upsample_filters[i], kernel=k,
                                    stride=k, padding="VALID",
                                    dtype=self.dtype, name=f"deblock{i}")(x, train)
                ups.append(up)
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0] if ups else x


class BaseBEVBackboneV1(nn.Module):
    """V1 variant — reference-exact dataflow (base_bev_backbone.py:182-204,
    the PillarNet/2D-sparse neck): the FINE map (x_conv4) is deblocked RAW,
    the coarse map (x_conv5) runs blocks[1] then deblocks[1], and blocks[0]
    refines the CONCATENATION — so NUM_FILTERS[0] must equal
    sum(NUM_UPSAMPLE_FILTERS). Each block is a stride-1 leading conv plus
    LAYER_NUMS[i] convs (all conv-BN-ReLU, bias-free, BN eps 1e-3)."""

    layer_nums: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[float]
    num_upsample_filters: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    def _block(self, i, x, train):
        x = ConvBNReLU(self.num_filters[i], dtype=self.dtype,
                       name=f"block{i}_in")(x, train)
        for j in range(self.layer_nums[i]):
            x = ConvBNReLU(self.num_filters[i], dtype=self.dtype,
                           name=f"block{i}_conv{j}")(x, train)
        return x

    def _deblock(self, i, x, train):
        stride = self.upsample_strides[i]
        if stride >= 1:
            return ConvBNReLU(self.num_upsample_filters[i],
                              kernel=int(stride), stride=int(stride),
                              transpose=True, dtype=self.dtype,
                              name=f"deblock{i}")(x, train)
        k = int(round(1 / stride))
        return ConvBNReLU(self.num_upsample_filters[i], kernel=k,
                          stride=k, padding="VALID", dtype=self.dtype,
                          name=f"deblock{i}")(x, train)

    @nn.compact
    def __call__(self, feature_maps, train: bool):
        assert len(feature_maps) == len(self.layer_nums) == 2
        x4, x5 = feature_maps
        ups = [self._deblock(0, x4.astype(self.dtype), train)]
        ups.append(self._deblock(1, self._block(1, x5.astype(self.dtype),
                                                train), train))
        x = jnp.concatenate(ups, axis=-1)
        return self._block(0, x, train)
