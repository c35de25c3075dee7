"""Torch→flax checkpoint converter: numerical equality against torch layers.

Builds torch modules mirroring the reference architecture (BaseBEVBackbone
block layout, SeparateHead stacks — standard OpenPCDet structures), runs them
on random input, converts their state_dict with the documented transforms,
and asserts our flax modules produce identical outputs (eval mode, fp32).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dfu3d_tpu.train import torch_convert as tc


def _sync_bn_torch(bn):
    with torch.no_grad():
        bn.weight.copy_(torch.randn_like(bn.weight) * 0.2 + 1.0)
        bn.bias.copy_(torch.randn_like(bn.bias) * 0.1)
        bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.5)
        bn.running_var.copy_(torch.rand_like(bn.running_var) + 0.5)


class TestLayerTransforms:
    def test_conv2d(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 10, 12, 6).astype(np.float32)
        conv = torch.nn.Conv2d(6, 8, 3, stride=2, padding=1, bias=False)
        with torch.no_grad():
            out_t = conv(torch.tensor(x.transpose(0, 3, 1, 2)))
        out_t = out_t.numpy().transpose(0, 2, 3, 1)
        import flax.linen as nn
        m = nn.Conv(8, (3, 3), strides=(2, 2), padding=1, use_bias=False)
        out_j = m.apply(
            {"params": {"kernel": jnp.asarray(tc.t_conv2d(conv.weight.detach().numpy()))}},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)

    def test_convtranspose2d(self):
        rng = np.random.RandomState(1)
        x = rng.randn(1, 8, 8, 16).astype(np.float32)
        convt = torch.nn.ConvTranspose2d(16, 24, 2, stride=2, bias=False)
        with torch.no_grad():
            out_t = convt(torch.tensor(x.transpose(0, 3, 1, 2)))
        out_t = out_t.numpy().transpose(0, 2, 3, 1)
        import flax.linen as nn
        m = nn.ConvTranspose(24, (2, 2), strides=(2, 2), padding="SAME",
                             use_bias=False)
        out_j = m.apply(
            {"params": {"kernel": jnp.asarray(
                tc.t_convtranspose2d(convt.weight.detach().numpy()))}},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)

    def test_linear_and_bn(self):
        rng = np.random.RandomState(2)
        x = rng.randn(40, 10).astype(np.float32)
        lin = torch.nn.Linear(10, 32, bias=False)
        bn = torch.nn.BatchNorm1d(32, eps=1e-3, momentum=0.01)
        _sync_bn_torch(bn)
        bn.eval()
        with torch.no_grad():
            out_t = bn(lin(torch.tensor(x))).numpy()

        from dfu3d_tpu.models.vfe import MaskedBatchNorm
        kernel = tc.t_linear(lin.weight.detach().numpy())
        y = np.asarray(jnp.asarray(x) @ jnp.asarray(kernel))
        mbn = MaskedBatchNorm()
        variables = {
            "params": {"scale": jnp.asarray(bn.weight.detach().numpy()),
                       "bias": jnp.asarray(bn.bias.detach().numpy())},
            "batch_stats": {"mean": jnp.asarray(bn.running_mean.numpy()),
                            "var": jnp.asarray(bn.running_var.numpy())},
        }
        out_j = mbn.apply(variables, jnp.asarray(y), jnp.ones(40, bool), False)
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-4, atol=1e-4)

    def test_spconv_layout(self):
        # spconv 2.x (Cout, kz, ky, kx, Cin): offset (ix, iy, iz) must land at
        # K index (ix*ky + iy)*kz + iz (kernel_offsets order)
        kz = ky = kx = 3
        cin, cout = 2, 4
        w = np.zeros((cout, kz, ky, kx, cin), np.float32)
        w[:, 0, 1, 2, :] = 7.0  # iz=0, iy=1, ix=2
        out = tc.t_spconv(w)
        k_index = (2 * ky + 1) * kz + 0
        assert out.shape == (27, cin, cout)
        assert np.all(out[k_index] == 7.0)
        mask = np.ones(27, bool)
        mask[k_index] = False
        assert np.all(out[mask] == 0.0)


class TestBEVBackboneEquality:
    """Full-module equality: torch replica of the reference BaseBEVBackbone
    (blocks = ZeroPad+Conv+BN+ReLU + n×(Conv+BN+ReLU); deblocks) vs ours."""

    def _torch_backbone(self, layer_nums, strides, filters, up_strides,
                        up_filters, c_in):
        blocks, deblocks = torch.nn.ModuleList(), torch.nn.ModuleList()
        cin = c_in
        for i, n in enumerate(layer_nums):
            layers = [
                torch.nn.ZeroPad2d(1),
                torch.nn.Conv2d(cin, filters[i], 3, stride=strides[i], bias=False),
                torch.nn.BatchNorm2d(filters[i], eps=1e-3, momentum=0.01),
                torch.nn.ReLU(),
            ]
            for _ in range(n):
                layers += [
                    torch.nn.Conv2d(filters[i], filters[i], 3, padding=1, bias=False),
                    torch.nn.BatchNorm2d(filters[i], eps=1e-3, momentum=0.01),
                    torch.nn.ReLU(),
                ]
            blocks.append(torch.nn.Sequential(*layers))
            cin = filters[i]
            s = up_strides[i]
            if s >= 1:
                up = torch.nn.ConvTranspose2d(filters[i], up_filters[i],
                                              int(s), stride=int(s), bias=False)
            else:
                k = int(round(1 / s))
                up = torch.nn.Conv2d(filters[i], up_filters[i], k, stride=k,
                                     bias=False)
            deblocks.append(torch.nn.Sequential(
                up, torch.nn.BatchNorm2d(up_filters[i], eps=1e-3, momentum=0.01),
                torch.nn.ReLU(),
            ))
        return blocks, deblocks

    def test_forward_equality(self):
        torch.manual_seed(0)
        layer_nums, strides = [3, 5, 5], [2, 2, 2]
        filters, up_strides, up_filters = [64, 128, 256], [0.5, 1, 2], [128, 128, 128]
        blocks, deblocks = self._torch_backbone(
            layer_nums, strides, filters, up_strides, up_filters, 64)
        for m in list(blocks.modules()) + list(deblocks.modules()):
            if isinstance(m, (torch.nn.BatchNorm2d,)):
                _sync_bn_torch(m)
        blocks.eval(), deblocks.eval()

        rng = np.random.RandomState(3)
        x = rng.randn(1, 64, 64, 64).astype(np.float32)  # NHWC (H=W=64)
        with torch.no_grad():
            t = torch.tensor(x.transpose(0, 3, 1, 2))
            ups = []
            for i in range(len(layer_nums)):
                t = blocks[i](t)
                ups.append(deblocks[i](t))
            out_t = torch.cat(ups, dim=1).numpy().transpose(0, 2, 3, 1)

        # torch state_dict with reference-style key prefix
        state = {}
        for i in range(len(layer_nums)):
            for k, v in blocks[i].state_dict().items():
                state[f"backbone_2d.blocks.{i}.{k}"] = v.numpy()
            for k, v in deblocks[i].state_dict().items():
                state[f"backbone_2d.deblocks.{i}.{k}"] = v.numpy()

        from dfu3d_tpu.models.backbone_2d import BaseBEVBackbone

        model = BaseBEVBackbone(
            layer_nums=layer_nums, layer_strides=strides, num_filters=filters,
            upsample_strides=up_strides, num_upsample_filters=up_filters,
        )
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
        mapping = {
            k: v for k, v in tc.centerpoint_pillar_mapping(
                layer_nums=layer_nums).items()
            if k[1] == "backbone_2d"
        }
        # our tree root here has no 'backbone_2d' prefix — rebase the mapping
        mapping = {
            (k[0],) + k[2:]: v for k, v in mapping.items()
        }
        new_vars, report = tc.apply_mapping(variables, state, mapping)
        assert not report["missing_in_torch"], report["missing_in_torch"][:4]
        out_j = model.apply(
            {"params": new_vars["params"], "batch_stats": new_vars["batch_stats"]},
            jnp.asarray(x), False,
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


class TestFlagshipMappingCoverage:
    def test_all_flagship_params_mapped(self):
        """Every param/stat of the flagship CenterPoint-pillar has a mapping
        entry (no silently-unconverted weights)."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from __graft_entry__ import _flagship, _synthetic_batch

        cfg, grid, model = _flagship(dtype=jnp.float32, tiny=True)
        batch = _synthetic_batch(1, 1024, 16, 12.0)
        variables = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0)}, batch, train=False,
                method=lambda m, b, train: m._features(b, train),
            )
        )
        mapping = tc.centerpoint_pillar_mapping()
        flat = jax.tree_util.tree_flatten_with_path(variables)[0]
        unmapped = []
        for path, _ in flat:
            key = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
            if key not in mapping:
                unmapped.append(key)
        assert not unmapped, unmapped[:8]


class TestSwinMapping:
    """Swin converter: numerical parity of the two non-trivial pieces (patch
    merging input ordering; windowed attention qkv packing + relative
    position bias indexing) against torch emulations of the reference
    modules (swin_utils.py PatchMerging, swin.py WindowMSA)."""

    def test_patch_merging_equivalence(self):
        rng = np.random.RandomState(0)
        c, h, w = 6, 8, 10
        x = rng.randn(1, h, w, c).astype(np.float32)

        # torch emulation of the reference PatchMerging (Unfold k=2 s=2 on
        # NCHW → LayerNorm(4C) → Linear(4C, 2C, bias=False))
        unfold = torch.nn.Unfold(kernel_size=2, stride=2)
        ln = torch.nn.LayerNorm(4 * c)
        red = torch.nn.Linear(4 * c, 2 * c, bias=False)
        with torch.no_grad():
            ln.weight.copy_(torch.randn_like(ln.weight) * 0.3 + 1.0)
            ln.bias.copy_(torch.randn_like(ln.bias) * 0.1)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y = unfold(xt).transpose(1, 2)  # (1, L, 4C)
        want = red(ln(y)).detach().numpy()

        from dfu3d_tpu.models.image.swin import PatchMerging

        pm = PatchMerging(dim=c)
        variables = pm.init(jax.random.PRNGKey(0), jnp.asarray(
            x.reshape(1, h * w, c)), h, w)
        state = {
            "m.norm.weight": ln.weight.detach().numpy(),
            "m.norm.bias": ln.bias.detach().numpy(),
            "m.reduction.weight": red.weight.detach().numpy(),
        }
        mapping = {
            ("params", "norm", "scale"): ("m.norm.weight", tc.t_merge_norm),
            ("params", "norm", "bias"): ("m.norm.bias", tc.t_merge_norm),
            ("params", "reduction", "kernel"): (
                "m.reduction.weight", tc.t_merge_reduction),
        }
        converted, report = tc.apply_mapping(variables, state, mapping)
        assert not report["missing_in_torch"]
        got, _, _ = pm.apply(converted, jnp.asarray(x.reshape(1, h * w, c)),
                             h, w)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_window_attention_equivalence(self):
        rng = np.random.RandomState(1)
        ws, heads, c = 4, 2, 8
        n = ws * ws
        x = rng.randn(3, n, c).astype(np.float32)

        qkv = torch.nn.Linear(c, 3 * c)
        proj = torch.nn.Linear(c, c)
        table = torch.randn((2 * ws - 1) ** 2, heads) * 0.5

        # torch emulation of the reference WindowMSA forward (standard Swin
        # attention; index formula equals ours — see swin_mapping docstring)
        def torch_msa(xt):
            b, n_, c_ = xt.shape
            d = c_ // heads
            q, k, v = qkv(xt).reshape(b, n_, 3, heads, d).permute(
                2, 0, 3, 1, 4)
            attn = (q * d ** -0.5) @ k.transpose(-2, -1)
            hh, ww = np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
            flat = np.stack([hh.ravel(), ww.ravel()])
            rel = flat[:, :, None] - flat[:, None, :] + ws - 1
            idx = torch.from_numpy(rel[0] * (2 * ws - 1) + rel[1])
            bias = table[idx.reshape(-1)].reshape(n_, n_, heads)
            attn = attn + bias.permute(2, 0, 1)[None]
            attn = attn.softmax(-1)
            out = (attn @ v).transpose(1, 2).reshape(b, n_, c_)
            return proj(out)

        want = torch_msa(torch.from_numpy(x)).detach().numpy()

        from dfu3d_tpu.models.image.swin import WindowAttention

        wa = WindowAttention(dim=c, num_heads=heads, window_size=ws)
        variables = wa.init(jax.random.PRNGKey(0), jnp.asarray(x))
        state = {
            "a.qkv.weight": qkv.weight.detach().numpy(),
            "a.qkv.bias": qkv.bias.detach().numpy(),
            "a.proj.weight": proj.weight.detach().numpy(),
            "a.proj.bias": proj.bias.detach().numpy(),
            "a.rpb": table.numpy(),
        }
        mapping = {
            ("params", "qkv", "kernel"): ("a.qkv.weight", tc.t_linear),
            ("params", "qkv", "bias"): ("a.qkv.bias", tc.t_identity),
            ("params", "proj", "kernel"): ("a.proj.weight", tc.t_linear),
            ("params", "proj", "bias"): ("a.proj.bias", tc.t_identity),
            ("params", "relative_position_bias_table"): ("a.rpb", tc.t_identity),
        }
        converted, report = tc.apply_mapping(variables, state, mapping)
        assert not report["missing_in_torch"]
        got = wa.apply(converted, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_full_mapping_coverage(self):
        """Every param of a tiny SwinTransformer is covered by swin_mapping
        and every mapped torch key is consumed (shapes agree)."""
        from dfu3d_tpu.models.image.swin import SwinTransformer

        depths, out_indices = (1, 1), (0, 1)
        model = SwinTransformer(embed_dim=8, depths=depths, num_heads=(2, 2),
                                window_size=4, patch_size=4,
                                out_indices=out_indices)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        mapping = tc.swin_mapping(depths=depths, out_indices=out_indices,
                                  prefix="ib", ours_prefix=())
        flat = jax.tree_util.tree_flatten_with_path(variables)[0]
        keys = set()
        unmapped = []
        for path, leaf in flat:
            key = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
            keys.add(key)
            if key not in mapping:
                unmapped.append(key)
        assert not unmapped, unmapped[:8]
        # fake torch state with exactly the right shapes → full conversion
        state = {}
        for ours, (ref_key, transform) in mapping.items():
            leaf = None
            for path, lf in flat:
                key = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
                if key == ours:
                    leaf = np.asarray(lf)
            shape = leaf.shape
            if transform is tc.t_linear:
                shape = (shape[1], shape[0])
            elif transform is tc.t_conv2d:
                shape = (shape[3], shape[2], shape[0], shape[1])
            elif transform is tc.t_merge_reduction:
                shape = (shape[1], shape[0])
            state[ref_key] = rngless = np.random.RandomState(0).randn(
                *shape).astype(np.float32)
        converted, report = tc.apply_mapping(variables, state, mapping)
        assert not report["missing_in_torch"], report["missing_in_torch"][:5]
        assert len(report["converted"]) == len(mapping)


class TestFusedHeadEquality:
    """Torch per-tower SeparateHead stacks (the reference layout) → fused
    head conversion must produce identical outputs."""

    def test_fused_conversion_equality(self):
        torch.manual_seed(5)
        num_heads, cm = 2, 8
        hm_counts = (1, 2)
        branch_dict = (("center", 2), ("center_z", 1), ("dim", 3), ("rot", 2))

        # torch towers: {name}.0.0 conv, .0.1 bn, .1 out (reference
        # SeparateHead, center_head.py:12-47)
        towers = {}
        state = {}
        for h in range(num_heads):
            branches = branch_dict + (("hm", hm_counts[h]),)
            for name, oc in branches:
                conv0 = torch.nn.Conv2d(cm, cm, 3, padding=1)
                bn0 = torch.nn.BatchNorm2d(cm, eps=1e-5, momentum=0.1)
                _sync_bn_torch(bn0)
                out = torch.nn.Conv2d(cm, oc, 3, padding=1)
                bn0.eval()
                towers[(h, name)] = (conv0, bn0, out)
                pre = f"dense_head.heads_list.{h}.{name}"
                state[f"{pre}.0.0.weight"] = conv0.weight.detach().numpy()
                state[f"{pre}.0.0.bias"] = conv0.bias.detach().numpy()
                state[f"{pre}.0.1.weight"] = bn0.weight.detach().numpy()
                state[f"{pre}.0.1.bias"] = bn0.bias.detach().numpy()
                state[f"{pre}.0.1.running_mean"] = bn0.running_mean.numpy()
                state[f"{pre}.0.1.running_var"] = bn0.running_var.numpy()
                state[f"{pre}.1.weight"] = out.weight.detach().numpy()
                state[f"{pre}.1.bias"] = out.bias.detach().numpy()

        rng = np.random.RandomState(6)
        x = rng.randn(1, 12, 12, cm).astype(np.float32)
        want = {}
        with torch.no_grad():
            t = torch.tensor(x.transpose(0, 3, 1, 2))
            for (h, name), (conv0, bn0, out) in towers.items():
                y = out(torch.relu(bn0(conv0(t))))
                want[(h, name)] = y.numpy().transpose(0, 2, 3, 1)

        from dfu3d_tpu.models.center_head import FusedSeparateHeads

        specs = []
        for h in range(num_heads):
            for name, oc in branch_dict + (("hm", hm_counts[h]),):
                specs.append((h, name, oc))
        model = FusedSeparateHeads(
            branch_specs=tuple(specs), num_heads=num_heads, num_conv=2,
            mid_channels=cm)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
        mapping = {
            (k[0],) + k[2:]: v
            for k, v in tc.centerpoint_pillar_mapping(
                num_heads=num_heads, hm_counts=hm_counts,
                branch_dict=branch_dict).items()
            if len(k) > 2 and k[2] == "fused_heads"
        }
        # rebase: drop the dense_head/fused_heads scope (module tested bare)
        mapping = {(k[0],) + k[2:]: v for k, v in mapping.items()}
        new_vars, report = tc.apply_mapping(variables, state, mapping)
        assert not report["missing_in_torch"], report["missing_in_torch"][:4]
        preds = model.apply(
            {"params": new_vars["params"],
             "batch_stats": new_vars["batch_stats"]},
            jnp.asarray(x), False)
        for h in range(num_heads):
            for name, oc in branch_dict + (("hm", hm_counts[h]),):
                np.testing.assert_allclose(
                    np.asarray(preds[h][name]), want[(h, name)],
                    rtol=2e-4, atol=2e-4, err_msg=f"head {h} {name}")


class TestCenterHeadFallback:
    def test_nonuniform_depths_use_per_tower_heads(self):
        """CenterHead must fall back to per-tower SeparateHead when branch
        conv depths differ (fusion requires uniform num_conv)."""
        from dfu3d_tpu.models.center_head import CenterHead

        head = CenterHead(
            class_names=["Car"], class_names_each_head=[["Car"]],
            shared_conv_channel=8, num_hm_conv=3,  # ≠ branch num_conv (2)
            head_order=["center", "center_z", "dim", "rot"],
            head_dict={
                "center": {"out_channels": 2, "num_conv": 2},
                "center_z": {"out_channels": 1, "num_conv": 2},
                "dim": {"out_channels": 3, "num_conv": 2},
                "rot": {"out_channels": 2, "num_conv": 2},
            },
            point_cloud_range=[0, -10, -3, 20, 10, 1],
            voxel_size=[0.1, 0.1, 0.2], feature_map_stride=8,
        )
        x = jnp.zeros((1, 8, 8, 8))
        variables = head.init(jax.random.PRNGKey(0), x, False)
        params = variables["params"]
        assert "head_0" in params and "fused_heads" not in params
        preds = head.apply(variables, x, False,
                           mutable=["batch_stats"])[0]
        assert set(preds[0]) == {"center", "center_z", "dim", "rot", "hm"}

    def test_uniform_depths_use_fused(self):
        from dfu3d_tpu.models.center_head import CenterHead

        head = CenterHead(
            class_names=["Car"], class_names_each_head=[["Car"]],
            shared_conv_channel=8, num_hm_conv=2,
            head_order=["center", "center_z", "dim", "rot"],
            head_dict={
                "center": {"out_channels": 2, "num_conv": 2},
                "center_z": {"out_channels": 1, "num_conv": 2},
                "dim": {"out_channels": 3, "num_conv": 2},
                "rot": {"out_channels": 2, "num_conv": 2},
            },
            point_cloud_range=[0, -10, -3, 20, 10, 1],
            voxel_size=[0.1, 0.1, 0.2], feature_map_stride=8,
        )
        x = jnp.zeros((1, 8, 8, 8))
        variables = head.init(jax.random.PRNGKey(0), x, False)
        assert "fused_heads" in variables["params"]
        preds = head.apply(variables, x, False, mutable=["batch_stats"])[0]
        assert preds[0]["hm"].shape[-1] == 1
        assert preds[0]["dim"].shape[-1] == 3


class TestDeepLabDDN:
    """DDNDeepLabV3 converter: full-graph logits equality against a plain-
    torch mirror of the torchvision deeplabv3 graph (torchvision itself is
    not installed here; the mirror reproduces its module/state-dict layout —
    backbone.layerL.I.{conv,bn,downsample}, classifier.0 ASPP — exactly, so
    the mapping keys are the real checkpoint keys)."""

    LAYERS = (2, 2, 2, 2)
    NUM_CLASSES = 11

    def _torch_model(self):
        import torch.nn as tnn

        def bottleneck(cin, planes, stride=1, dilation=1):
            m = tnn.Module()
            m.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            m.bn1 = tnn.BatchNorm2d(planes)
            m.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                 padding=dilation, dilation=dilation,
                                 bias=False)
            m.bn2 = tnn.BatchNorm2d(planes)
            m.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            m.bn3 = tnn.BatchNorm2d(planes * 4)
            if stride != 1 or cin != planes * 4:
                m.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                    tnn.BatchNorm2d(planes * 4))
            else:
                m.downsample = None

            def fwd(x, m=m):
                idn = x
                y = tnn.functional.relu(m.bn1(m.conv1(x)))
                y = tnn.functional.relu(m.bn2(m.conv2(y)))
                y = m.bn3(m.conv3(y))
                if m.downsample is not None:
                    idn = m.downsample(x)
                return tnn.functional.relu(y + idn)

            m.forward = fwd
            return m

        # torchvision resnet._make_layer with
        # replace_stride_with_dilation=[False, True, True]
        model = tnn.Module()
        backbone = tnn.Module()
        backbone.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        backbone.bn1 = tnn.BatchNorm2d(64)
        inplanes, dilation = 64, 1
        plan = [(64, 1, False), (128, 2, False), (256, 2, True),
                (512, 2, True)]
        for li, ((planes, stride, dilate), n) in enumerate(
                zip(plan, self.LAYERS), start=1):
            prev = dilation
            if dilate:
                dilation *= stride
                stride = 1
            blocks = [bottleneck(inplanes, planes, stride, prev)]
            inplanes = planes * 4
            blocks += [bottleneck(inplanes, planes, 1, dilation)
                       for _ in range(n - 1)]
            setattr(backbone, f"layer{li}", tnn.Sequential(*blocks))
        model.backbone = backbone

        def aspp_branch(k, rate=None):
            conv = (tnn.Conv2d(2048, 256, 1, bias=False) if k == 1 else
                    tnn.Conv2d(2048, 256, 3, padding=rate, dilation=rate,
                               bias=False))
            return tnn.Sequential(conv, tnn.BatchNorm2d(256), tnn.ReLU())

        aspp = tnn.Module()
        aspp.convs = tnn.ModuleList(
            [aspp_branch(1)] + [aspp_branch(3, r) for r in (12, 24, 36)]
            + [tnn.Sequential(tnn.AdaptiveAvgPool2d(1),
                              tnn.Conv2d(2048, 256, 1, bias=False),
                              tnn.BatchNorm2d(256), tnn.ReLU())])
        aspp.project = tnn.Sequential(
            tnn.Conv2d(5 * 256, 256, 1, bias=False), tnn.BatchNorm2d(256),
            tnn.ReLU(), tnn.Dropout(0.5))

        def aspp_fwd(x, aspp=aspp):
            res = [c(x) for c in aspp.convs[:4]]
            p = aspp.convs[4](x)
            res.append(tnn.functional.interpolate(
                p, size=x.shape[-2:], mode="bilinear", align_corners=False))
            return aspp.project(torch.cat(res, dim=1))

        aspp.forward = aspp_fwd
        model.classifier = tnn.Sequential(
            aspp, tnn.Conv2d(256, 256, 3, padding=1, bias=False),
            tnn.BatchNorm2d(256), tnn.ReLU(),
            tnn.Conv2d(256, self.NUM_CLASSES, 1))
        return model

    def test_logits_equality(self):
        from dfu3d_tpu.models.image.deeplab import DDNDeepLabV3

        torch.manual_seed(0)
        model = self._torch_model()
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                _sync_bn_torch(mod)
        model.eval()

        rng = np.random.RandomState(3)
        img = rng.randn(1, 64, 96, 3).astype(np.float32)
        with torch.no_grad():
            x = torch.tensor(img.transpose(0, 3, 1, 2))
            x = torch.nn.functional.relu(
                model.backbone.bn1(model.backbone.conv1(x)))
            x = torch.nn.functional.max_pool2d(x, 3, stride=2, padding=1)
            feats_t = model.backbone.layer1(x)
            x = model.backbone.layer4(model.backbone.layer3(
                model.backbone.layer2(feats_t)))
            out = model.classifier(x)
            # ddn_template.forward: logits resized to the layer1 feature map
            logits_t = torch.nn.functional.interpolate(
                out, size=feats_t.shape[-2:], mode="bilinear",
                align_corners=False).numpy().transpose(0, 2, 3, 1)
        feats_t = feats_t.numpy().transpose(0, 2, 3, 1)

        ddn = DDNDeepLabV3(num_classes=self.NUM_CLASSES, layers=self.LAYERS,
                           pretrained_preprocess=False)
        variables = ddn.init(jax.random.PRNGKey(0), jnp.asarray(img),
                             train=False)
        state = {k: v.detach().numpy()
                 for k, v in model.state_dict().items()}
        mapping = tc.deeplab_ddn_mapping(layers=self.LAYERS)
        new_vars, report = tc.apply_mapping(variables, state, mapping)
        assert not report["missing_in_torch"], report["missing_in_torch"][:8]
        assert not report["unmatched_ours"], report["unmatched_ours"][:8]

        feats_j, logits_j = ddn.apply(new_vars, jnp.asarray(img), train=False)
        np.testing.assert_allclose(np.asarray(feats_j), feats_t,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(logits_j), logits_t,
                                   rtol=2e-4, atol=3e-4)
