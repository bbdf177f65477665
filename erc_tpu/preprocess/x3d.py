"""X3D video backbone in flax (reference: mmaction/models/backbones/x3d.py).

Progressive-expansion 3D CNN: (1,3,3) spatial stem + (5,1,1) channelwise
temporal stem, four stages of X3D bottlenecks — 1×1×1 expand,
3×3×3 *channelwise* conv, SE (se_style='half': even-indexed blocks),
swish, 1×1×1 project, residual — then a 1×1×1 conv5.  Default expansion
factors are X3D-M's (γ_w=1, γ_b=2.25, γ_d=2.2 → stages [3,5,11,7],
feat_dim 432), matching the checkpoints the reference extracts with
(mmaction x3d.py:253-309).

``port_torch_x3d`` maps the mmaction state_dict naming
(conv1_s.conv / layer{i}.{b}.conv2.bn / se_module.fc1 / downsample …)
onto this module; conv kernels go OIDHW → DHWIO.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _round_width(width, multiplier, min_width=8, divisor=8):
    if not multiplier:
        return int(width)
    width *= multiplier
    min_width = min_width or divisor
    out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if out < 0.9 * width:
        out += divisor
    return int(out)


def _round_repeats(repeats, multiplier):
    if not multiplier:
        return int(repeats)
    return int(math.ceil(multiplier * repeats))


class SEModule(nn.Module):
    channels: int
    reduction: float

    @nn.compact
    def __call__(self, x):
        # x: [B, T, H, W, C]
        bottleneck = _round_width(self.channels, self.reduction)
        s = x.mean(axis=(1, 2, 3), keepdims=True)
        s = nn.relu(nn.Conv(bottleneck, (1, 1, 1), name="fc1")(s))
        s = jax.nn.sigmoid(nn.Conv(self.channels, (1, 1, 1), name="fc2")(s))
        return x * s


def swish(x):
    return x * jax.nn.sigmoid(x)


class BlockX3D(nn.Module):
    inplanes: int
    planes: int
    outplanes: int
    spatial_stride: int = 1
    use_se: bool = False
    se_ratio: float = 1 / 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5)
        identity = x
        out = nn.Conv(self.planes, (1, 1, 1), use_bias=False, name="conv1_conv")(x)
        out = nn.relu(bn(name="conv1_bn")(out))
        s = self.spatial_stride
        out = nn.Conv(
            self.planes, (3, 3, 3), strides=(1, s, s), padding=((1, 1),) * 3,
            feature_group_count=self.planes, use_bias=False, name="conv2_conv",
        )(out)
        out = bn(name="conv2_bn")(out)
        if self.use_se:
            out = SEModule(self.planes, self.se_ratio, name="se_module")(out)
        out = swish(out)
        out = nn.Conv(self.outplanes, (1, 1, 1), use_bias=False, name="conv3_conv")(out)
        out = bn(name="conv3_bn")(out)
        if self.spatial_stride != 1 or x.shape[-1] != self.outplanes:
            identity = nn.Conv(
                self.outplanes, (1, 1, 1), strides=(1, s, s), use_bias=False,
                name="downsample_conv",
            )(x)
            identity = bn(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class X3D(nn.Module):
    """Input [B, T, H, W, 3] → pooled feature [B, feat_dim]."""

    gamma_w: float = 1.0
    gamma_b: float = 2.25
    gamma_d: float = 2.2
    base_channels: int = 24
    stage_blocks: Sequence[int] = (1, 2, 5, 3)
    spatial_strides: Sequence[int] = (2, 2, 2, 2)
    se_style: str = "half"
    se_ratio: float = 1 / 16

    @property
    def feat_dim(self) -> int:
        base = _round_width(self.base_channels, self.gamma_w)
        return int(base * 2 ** (len(self.stage_blocks) - 1) * self.gamma_b)

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5)
        base = _round_width(self.base_channels, self.gamma_w)
        blocks = [_round_repeats(b, self.gamma_d) for b in self.stage_blocks]

        x = nn.Conv(
            base, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1)),
            use_bias=False, name="conv1_s_conv",
        )(x)
        x = nn.Conv(
            base, (5, 1, 1), strides=(1, 1, 1), padding=((2, 2), (0, 0), (0, 0)),
            feature_group_count=base, use_bias=False, name="conv1_t_conv",
        )(x)
        x = nn.relu(bn(name="conv1_t_bn")(x))

        layer_inplanes = base
        for i, nb in enumerate(blocks):
            inplanes = base * 2**i
            planes = int(inplanes * self.gamma_b)
            for b in range(nb):
                use_se = (
                    True if self.se_style == "all" else (b % 2 == 0)
                )
                x = BlockX3D(
                    layer_inplanes if b == 0 else inplanes,
                    planes,
                    inplanes,
                    spatial_stride=self.spatial_strides[i] if b == 0 else 1,
                    use_se=use_se,
                    se_ratio=self.se_ratio,
                    name=f"layer{i + 1}_{b}",
                )(x, train=train)
            layer_inplanes = inplanes

        x = nn.Conv(self.feat_dim, (1, 1, 1), use_bias=False, name="conv5_conv")(x)
        x = nn.relu(bn(name="conv5_bn")(x))
        return x.mean(axis=(1, 2, 3))  # global spatio-temporal pool


def port_torch_x3d(state_dict: Dict[str, Any], prefix: str = "backbone.",
                   model: X3D = None) -> Dict[str, Any]:
    """mmaction X3D state_dict → flax {params, batch_stats}."""
    model = model or X3D()

    def get(k):
        v = state_dict[prefix + k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(dst, src):
        params[dst] = {"kernel": get(src + ".weight").transpose(2, 3, 4, 1, 0)}

    def bnm(dst, src):
        params[dst] = {"scale": get(src + ".weight"), "bias": get(src + ".bias")}
        stats[dst] = {"mean": get(src + ".running_mean"), "var": get(src + ".running_var")}

    conv("conv1_s_conv", "conv1_s.conv")
    conv("conv1_t_conv", "conv1_t.conv")
    bnm("conv1_t_bn", "conv1_t.bn")
    blocks = [_round_repeats(b, model.gamma_d) for b in model.stage_blocks]
    for i, nb in enumerate(blocks):
        for b in range(nb):
            base = f"layer{i + 1}.{b}"
            dst = f"layer{i + 1}_{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}_conv"] = {
                    "kernel": get(f"{base}.conv{ci}.conv.weight").transpose(2, 3, 4, 1, 0)
                }
                bp[f"conv{ci}_bn"] = {
                    "scale": get(f"{base}.conv{ci}.bn.weight"),
                    "bias": get(f"{base}.conv{ci}.bn.bias"),
                }
                bs[f"conv{ci}_bn"] = {
                    "mean": get(f"{base}.conv{ci}.bn.running_mean"),
                    "var": get(f"{base}.conv{ci}.bn.running_var"),
                }
            if prefix + f"{base}.se_module.fc1.weight" in state_dict:
                bp["se_module"] = {
                    "fc1": {
                        "kernel": get(f"{base}.se_module.fc1.weight").transpose(2, 3, 4, 1, 0),
                        "bias": get(f"{base}.se_module.fc1.bias"),
                    },
                    "fc2": {
                        "kernel": get(f"{base}.se_module.fc2.weight").transpose(2, 3, 4, 1, 0),
                        "bias": get(f"{base}.se_module.fc2.bias"),
                    },
                }
            if prefix + f"{base}.downsample.conv.weight" in state_dict:
                bp["downsample_conv"] = {
                    "kernel": get(f"{base}.downsample.conv.weight").transpose(2, 3, 4, 1, 0)
                }
                bp["downsample_bn"] = {
                    "scale": get(f"{base}.downsample.bn.weight"),
                    "bias": get(f"{base}.downsample.bn.bias"),
                }
                bs["downsample_bn"] = {
                    "mean": get(f"{base}.downsample.bn.running_mean"),
                    "var": get(f"{base}.downsample.bn.running_var"),
                }
            params[dst] = bp
            stats[dst] = bs
    conv("conv5_conv", "conv5.conv")
    bnm("conv5_bn", "conv5.bn")
    return {"params": params, "batch_stats": stats}
