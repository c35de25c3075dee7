"""Reference-exact ENet (tools/PENet/model.py:3-234 + basic.py) — the
pretrained-checkpoint path for the pseudo-label factory's depth completion.

`models/depth_completion.py` keeps the compact TPU-first nets used for
from-scratch factory training; this module mirrors the reference topology
parameter-for-parameter so released PENet checkpoints (`pe.pth.tar`)
convert through `train/torch_convert.enet_mapping` — pinned by
tests/test_reference_parity.py::TestENetParity against the reference's own
torch module.

Structure (model.py): two geo-conditioned ResNet encoders (rgb+d, then
d+rgb_depth with skip concats from the rgb decoder), mirrored decoders
with additive skips, confidence-softmax fusion of the two depth maps.
BasicBlockGeo (basic.py:279-327) concatenates the geometry feature BEFORE
conv1 as (x, g1) and BEFORE conv2 as (g2, out) — note the swapped order —
and its downsample conv consumes the (x, g1) concat. The geometry feature
unprojects with the reference's hardcoded 352×1216 image plane.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _bn(name, x, train):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=jnp.float32, param_dtype=jnp.float32, name=name,
    )(x.astype(jnp.float32))


class ConvBnReLU(nn.Module):
    """convbnrelu (basic.py:58): conv(no bias) → BN → ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=self.padding,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = _bn("bn", x, train)
        return nn.relu(x).astype(self.dtype)


class DeconvBnReLU(nn.Module):
    """deconvbnrelu (basic.py:65): ConvTranspose(k=5, s=2, p=2, op=1 — the
    torch padding maps to explicit lax lo/hi (k−1−p, k−1−p+op)) → BN → ReLU."""

    features: int
    kernel: int = 5
    stride: int = 2
    padding: int = 2
    output_padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        lo = self.kernel - 1 - self.padding
        hi = lo + self.output_padding
        x = nn.ConvTranspose(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((lo, hi), (lo, hi)), use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)
        x = _bn("bn", x, train)
        return nn.relu(x).astype(self.dtype)


class BasicBlockGeo(nn.Module):
    """basic.py:279-327. g1 concat as (x, g1) before conv1; g2 concat as
    (g2, out) before conv2; downsample (1×1 conv + BN) over (x, g1) when
    stride != 1 or channels change."""

    inplanes: int
    planes: int
    stride: int = 1
    geoplanes: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, g1, g2, train: bool):
        xg = jnp.concatenate([x, g1.astype(x.dtype)], axis=-1) \
            if g1 is not None else x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv1")(xg)
        out = _bn("bn1", out, train)
        out = nn.relu(out).astype(self.dtype)
        if g2 is not None:
            out = jnp.concatenate([g2.astype(out.dtype), out], axis=-1)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv2")(out)
        out = _bn("bn2", out, train)
        identity = x
        if self.stride != 1 or self.inplanes != self.planes:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32, name="down_conv")(xg)
            identity = _bn("down_bn", identity, train)
        return nn.relu(out + identity.astype(out.dtype)).astype(self.dtype)


def sparse_downsample_close(d, mask, large: float = 600.0):
    """SparseDownSampleClose (basic.py:141-153): stride-2 max-pool of the
    NEAREST valid depth."""
    enc = -(1.0 - mask) * large - d
    d2 = -nn.max_pool(enc, (2, 2), strides=(2, 2))
    m2 = nn.max_pool(mask, (2, 2), strides=(2, 2))
    return d2 - (1.0 - m2) * large, m2


def geometry_feature(z, vnorm, unorm, h, w, ch, cw, fh, fw):
    """GeometryFeature (basic.py:270-277): unproject to (x, y, z)."""
    x = z * (0.5 * h * (vnorm + 1.0) - ch) / fh
    y = z * (0.5 * w * (unorm + 1.0) - cw) / fw
    return jnp.concatenate([x, y, z], axis=-1)


# (inplanes, planes, stride) ladders, model.py:21-52
RGB_LAYERS = [(32, 64, 2), (64, 64, 1), (64, 128, 2), (128, 128, 1),
              (128, 256, 2), (256, 256, 1), (256, 512, 2), (512, 512, 1),
              (512, 1024, 2), (1024, 1024, 1)]
DEPTH_LAYERS = [(32, 64, 2), (64, 64, 1), (128, 128, 2), (128, 128, 1),
                (256, 256, 2), (256, 256, 1), (512, 512, 2), (512, 512, 1),
                (1024, 1024, 2), (1024, 1024, 1)]
RGB_DECODER = [(8, 512), (6, 256), (4, 128), (2, 64), (0, 32)]
FUSION_DECODER = [512, 256, 128, 64, 32]


class ENetRef(nn.Module):
    """model.py ENet with convolutional_layer_encoding='xyz' (geoplanes 3).

    __call__(rgb (B,H,W,3), d (B,H,W,1), position (B,H,W,2) [unorm, vnorm],
    K (B,3,3)) → dict with rgb_depth / d_depth / output (+ the concat
    feature maps the PENet_Cx CSPN stages consume)."""

    geoplanes: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, d, position, K, train: bool = False):
        unorm = position[..., 0:1]
        vnorm = position[..., 1:2]
        f352 = K[:, 1, 1][:, None, None, None]
        c352 = K[:, 1, 2][:, None, None, None]
        f1216 = K[:, 0, 0][:, None, None, None]
        c1216 = K[:, 0, 2][:, None, None, None]

        avg = lambda t: nn.avg_pool(t, (2, 2), strides=(2, 2))
        vns, uns = [vnorm], [unorm]
        for _ in range(5):
            vns.append(avg(vns[-1]))
            uns.append(avg(uns[-1]))
        valid = jnp.where(d > 0, 1.0, 0.0)
        ds, ms = [d], [valid]
        for _ in range(5):
            d2, m2 = sparse_downsample_close(ds[-1], ms[-1])
            ds.append(d2)
            ms.append(m2)
        # geometry features at each scale — the reference hardcodes the
        # 352×1216 KITTI-crop plane (model.py:122-127)
        geo = [
            geometry_feature(ds[i], vns[i], uns[i], 352 / 2 ** i,
                             1216 / 2 ** i, c352, c1216, f352, f1216)
            for i in range(6)
        ]

        gp = self.geoplanes

        def block(name, spec, x, g1, g2):
            inp, out, st = spec
            return BasicBlockGeo(inp, out, st, gp, dtype=self.dtype,
                                 name=name)(x, g1, g2, train)

        # --- rgb branch ---
        rgb_feature = ConvBnReLU(32, kernel=5, padding=2, dtype=self.dtype,
                                 name="rgb_conv_init")(
            jnp.concatenate([rgb, d], axis=-1).astype(self.dtype), train)
        r = [rgb_feature]
        for i, spec in enumerate(RGB_LAYERS, start=1):
            # layer i consumes (geo_s{i//2+1}, geo_s{(i+1)//2+1}) in the
            # reference's 1-based naming (model.py:149-158)
            r.append(block(f"rgb_encoder_layer{i}", spec, r[-1],
                           geo[i // 2], geo[(i + 1) // 2]))
        rgb10 = r[10]

        plus = {}
        x = rgb10
        for lvl, ch in RGB_DECODER:
            x = DeconvBnReLU(ch, dtype=self.dtype,
                             name=f"rgb_decoder_layer{lvl}")(x, train)
            x = x + (r[lvl] if lvl > 0 else rgb_feature)
            plus[lvl] = x
        rgb_output = DeconvBnReLU(2, kernel=3, stride=1, padding=1,
                                  output_padding=0, dtype=self.dtype,
                                  name="rgb_decoder_output")(plus[0], train)
        rgb_depth = rgb_output[..., 0:1]
        rgb_conf = rgb_output[..., 1:2]

        # --- depth branch (skip concats from the rgb decoder) ---
        sp = ConvBnReLU(32, kernel=5, padding=2, dtype=self.dtype,
                        name="depth_conv_init")(
            jnp.concatenate([d, rgb_depth], axis=-1).astype(self.dtype),
            train)
        s = [sp]
        for i, spec in enumerate(DEPTH_LAYERS, start=1):
            x_in = s[-1]
            if i in (3, 5, 7, 9):  # cat rgb decoder skip (model.py:187-199)
                x_in = jnp.concatenate([plus[i - 1], s[-1]], axis=-1)
            s.append(block(f"depth_layer{i}", spec, x_in,
                           geo[i // 2], geo[(i + 1) // 2]))

        # --- fusion decoder ---
        x = rgb10 + s[10]
        dec = {}
        for j, ch in enumerate(FUSION_DECODER, start=1):
            x = DeconvBnReLU(ch, dtype=self.dtype,
                             name=f"decoder_layer{j}")(x, train)
            dec[j] = x
            if j < 5:
                x = x + s[10 - 2 * j]
        depth_output = ConvBnReLU(2, dtype=self.dtype,
                                  name="decoder_layer6")(dec[5], train)
        d_depth = depth_output[..., 0:1]
        d_conf = depth_output[..., 1:2]

        conf = jnp.concatenate([rgb_conf, d_conf], axis=-1).astype(jnp.float32)
        conf = nn.softmax(conf, axis=-1)
        output = (conf[..., 0:1] * rgb_depth.astype(jnp.float32)
                  + conf[..., 1:2] * d_depth.astype(jnp.float32))
        return {
            "rgb_depth": rgb_depth, "d_depth": d_depth, "output": output,
            # CSPN guide features (model.py:229-234)
            "feat_s1": jnp.concatenate([plus[0], dec[5]], axis=-1),
            "feat_s2": jnp.concatenate([plus[2], dec[4]], axis=-1),
            "feat_s4": jnp.concatenate([plus[4], dec[3]], axis=-1),
        }
