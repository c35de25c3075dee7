"""DDNDeepLabV3 — the reference's actual depth-distribution network.

Reference: pcdet/models/backbones_3d/vfe/image_vfe_modules/ffn/ddn/
ddn_deeplabv3.py (torchvision deeplabv3_resnet50/101 with
`feat_extract_layer: layer1`) + ddn_template.py:108-143 (forward: backbone →
features from layer1, classifier logits bilinearly resized to the feature
shape; preprocess = ImageNet normalization with zero-padded pixels kept 0).

TPU-native flax rebuild of that torchvision graph so the reference's
pretrained `deeplabv3_resnet101_coco` / CaDDN checkpoints convert weight-for-
weight (train/torch_convert.deeplab_ddn_mapping):

* ResNet-50/101 bottleneck backbone with the DeepLab stride→dilation rewrite
  (torchvision `replace_stride_with_dilation=[False, True, True]`): layer3/4
  keep stride 1 and dilate 2/4, first block of each dilated layer using the
  previous dilation — output stride 8.
* DeepLabHead = ASPP (1×1 + three 3×3 branches at rates 12/24/36 + global
  pooling branch, 5·256 → 256 projection) → 3×3 conv → BN → ReLU → 1×1.
* NHWC layout, bf16-friendly; BN in fp32. `jax.image.resize(..., "linear")`
  matches torch `F.interpolate(mode="bilinear", align_corners=False)`.

Structure is config-selectable next to the compact `ddn.DDN` (CaDDN's
`VFE.DDN.NAME`); the return contract matches: (features, depth_logits).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

RESNET_LAYERS = {"ResNet50": (3, 4, 6, 3), "ResNet101": (3, 4, 23, 3)}


def _bn(dtype, name):
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


def _conv(ch, k, name, stride=1, dilation=1, bias=False, dtype=jnp.float32):
    pad = dilation * (k // 2)
    return nn.Conv(ch, (k, k), strides=(stride, stride),
                   kernel_dilation=(dilation, dilation),
                   padding=((pad, pad), (pad, pad)), use_bias=bias,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1×1 → 3×3 (stride/dilation) → 1×1 (4×)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        idn = x
        y = _conv(self.planes, 1, "conv1", dtype=d)(x)
        y = nn.relu(_bn(d, "bn1")(y, use_running_average=not train))
        y = _conv(self.planes, 3, "conv2", stride=self.stride,
                  dilation=self.dilation, dtype=d)(y.astype(d))
        y = nn.relu(_bn(d, "bn2")(y, use_running_average=not train))
        y = _conv(self.planes * 4, 1, "conv3", dtype=d)(y.astype(d))
        y = _bn(d, "bn3")(y, use_running_average=not train)
        if self.downsample:
            idn = _conv(self.planes * 4, 1, "down_conv", stride=self.stride,
                        dtype=d)(x)
            idn = _bn(d, "down_bn")(idn, use_running_average=not train)
        return nn.relu(y + idn).astype(d)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (torchvision segmentation ASPP):
    1×1 + 3×3@rates + image pooling, projected 5·256 → 256."""

    channels: int = 256
    rates: Tuple[int, ...] = (12, 24, 36)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        ra = not train
        branches = []
        y = _conv(self.channels, 1, "aspp_conv0", dtype=d)(x)
        branches.append(nn.relu(_bn(d, "aspp_bn0")(y, use_running_average=ra)))
        for j, r in enumerate(self.rates):
            y = _conv(self.channels, 3, f"aspp_conv{j + 1}", dilation=r,
                      dtype=d)(x)
            branches.append(
                nn.relu(_bn(d, f"aspp_bn{j + 1}")(y, use_running_average=ra)))
        # image-pooling branch: global average → 1×1 conv → broadcast back
        # (bilinear upsample of a 1×1 map is a constant fill)
        p = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        p = _conv(self.channels, 1, "aspp_pool_conv", dtype=d)(p.astype(d))
        p = nn.relu(_bn(d, "aspp_pool_bn")(p, use_running_average=ra))
        branches.append(jnp.broadcast_to(p, branches[0].shape))
        y = jnp.concatenate([b.astype(d) for b in branches], axis=-1)
        y = _conv(self.channels, 1, "aspp_project", dtype=d)(y)
        y = nn.relu(_bn(d, "aspp_project_bn")(y, use_running_average=ra))
        # torchvision ASPP ends in Dropout(0.5); the trainer threads no
        # dropout rng (CaDDN's DDN is pretrained-frozen in the reference
        # recipe), so it only engages when a 'dropout' rng is supplied
        if train and self.has_rng("dropout"):
            y = nn.Dropout(0.5, deterministic=False)(y)
        return y.astype(d)


class DDNDeepLabV3(nn.Module):
    """deeplabv3_resnet50/101 DDN: images (B, H, W, 3) in [0, 1] →
    (features (B, H/4, W/4, 256) from layer1, logits (B, H/4, W/4, classes)).

    `num_classes` = depth bins + 1 (the reference's 'beyond range' bin).
    """

    num_classes: int
    layers: Tuple[int, int, int, int] = RESNET_LAYERS["ResNet101"]
    pretrained_preprocess: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        d = self.dtype
        x = images.astype(jnp.float32)
        if self.pretrained_preprocess:
            # ddn_template.preprocess: ImageNet-normalize, zero-padded
            # pixels stay exactly 0
            pad = x == 0
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            x = jnp.where(pad, 0.0, x)
        x = x.astype(d)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=d, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = nn.relu(_bn(d, "bn1")(x, use_running_average=not train)).astype(d)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # (planes, stride, dilation of first block, dilation of rest)
        plan = [
            (64, 1, 1, 1),
            (128, 2, 1, 1),
            (256, 1, 1, 2),   # replace_stride_with_dilation: stride 2 → dil 2
            (512, 1, 2, 4),   # first block keeps the previous dilation
        ]
        feats = None
        for li, ((planes, stride, dil0, dil), n) in enumerate(
                zip(plan, self.layers), start=1):
            for i in range(n):
                down = i == 0 and (stride != 1 or x.shape[-1] != planes * 4)
                x = Bottleneck(
                    planes, stride=stride if i == 0 else 1,
                    dilation=dil0 if i == 0 else dil, downsample=down,
                    dtype=d, name=f"layer{li}_{i}",
                )(x, train)
            if li == 1:
                feats = x  # feat_extract_layer: layer1

        y = ASPP(dtype=d, name="aspp")(x, train)
        y = _conv(256, 3, "head_conv", dtype=d)(y)
        y = nn.relu(_bn(d, "head_bn")(y, use_running_average=not train))
        y = nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=d,
                    param_dtype=jnp.float32, name="head_out")(y.astype(d))
        # bilinear resize to the layer1 feature shape (align_corners=False)
        logits = jax.image.resize(
            y.astype(jnp.float32),
            y.shape[:1] + feats.shape[1:3] + y.shape[-1:], method="linear",
        )
        return feats, logits
