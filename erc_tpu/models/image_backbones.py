"""Image backbones for the legacy semi-supervised CIFAR/STL track.

Flax ports of the two backbones the reference's image strategies
actually train (reference models/wideresnet.py:18-154 and
models/resnet_cifar.py:10-141); the remaining resnet variants
(resnet.py / resnet_stl.py / resneta.py / preresnet.py) are
torchvision-style permutations of the same blocks and share these
implementations' structure.  NHWC layout (TPU conv-native), BatchNorm
with torch momentum semantics (flax ``momentum = 1 − torch_momentum``),
features returned after global average pooling like the reference
(classification heads live in the strategies, not the backbone).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def _conv(ch: int, k: int = 3, stride: int = 1, name: str | None = None):
    return nn.Conv(
        ch, (k, k), strides=(stride, stride), padding=[(k // 2, k // 2)] * 2,
        use_bias=False, kernel_init=nn.initializers.kaiming_normal(), name=name,
    )


class _BN(nn.Module):
    """BatchNorm2d with torch ``momentum`` semantics (reference wideresnet
    uses momentum=0.001 → flax momentum 0.999; resnet_cifar default 0.1)."""

    torch_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=1.0 - self.torch_momentum,
            epsilon=1e-5,
        )(x)


class BasicBlockPreAct(nn.Module):
    """Pre-activation wide-resnet block (wideresnet.py:18-51): bn→lrelu→
    conv→bn→lrelu→[dropout]→conv, shortcut from the pre-activation when
    ``pre_res_act`` (the first block of stage 1)."""

    out_chan: int
    stride: int = 1
    drop_rate: float = 0.0
    pre_res_act: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        in_chan = x.shape[-1]
        act1 = nn.leaky_relu(_BN(0.001, name="bn1")(x, train), 0.1)
        r = _conv(self.out_chan, 3, self.stride, name="conv1")(act1)
        r = nn.leaky_relu(_BN(0.001, name="bn2")(r, train), 0.1)
        if self.drop_rate > 0:
            r = nn.Dropout(self.drop_rate)(r, deterministic=not train)
        r = _conv(self.out_chan, 3, 1, name="conv2")(r)
        shortcut = act1 if self.pre_res_act else x
        if in_chan != self.out_chan or self.stride != 1:
            shortcut = _conv(self.out_chan, 1, self.stride, name="downsample")(shortcut)
        return shortcut + r


class WideResnet(nn.Module):
    """WRN-n-k (wideresnet.py:67-154): conv → 3 stages of (n−4)/6 pre-act
    blocks at widths 16k/32k/64k → bn → lrelu → global avg pool.
    feature_dim = 64·k."""

    k: int = 2
    n: int = 28
    drop_rate: float = 0.0

    @property
    def feature_dim(self) -> int:
        return 64 * self.k

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (self.n - 4) % 6 == 0
        bnum = (self.n - 4) // 6
        widths = [16] + [self.k * 16 * (2 ** i) for i in range(3)]
        h = _conv(widths[0], 3, 1, name="conv1")(x)
        for stage, (w, stride) in enumerate(zip(widths[1:], (1, 2, 2))):
            for b in range(bnum):
                h = BasicBlockPreAct(
                    w,
                    stride=stride if b == 0 else 1,
                    drop_rate=self.drop_rate,
                    pre_res_act=(stage == 0 and b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(h, train)
        h = nn.leaky_relu(_BN(0.001, name="bn_last")(h, train), 0.1)
        return h.mean(axis=(1, 2))  # AdaptiveAvgPool2d((1,1)) + flatten


class BasicBlock(nn.Module):
    """Post-activation CIFAR block (resnet_cifar.py:10-40)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        out = nn.relu(_BN(name="bn1")(_conv(self.planes, 3, self.stride, name="conv1")(x), train))
        out = _BN(name="bn2")(_conv(self.planes, 3, 1, name="conv2")(out), train)
        sc = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            sc = _BN(name="bn_sc")(_conv(self.planes, 1, self.stride, name="conv_sc")(x), train)
        return nn.relu(out + sc)


class Bottleneck(nn.Module):
    """Bottleneck block, expansion 4 (resnet_cifar.py:43-76)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        out = nn.relu(_BN(name="bn1")(_conv(self.planes, 1, 1, name="conv1")(x), train))
        out = nn.relu(_BN(name="bn2")(_conv(self.planes, 3, self.stride, name="conv2")(out), train))
        out = _BN(name="bn3")(_conv(4 * self.planes, 1, 1, name="conv3")(out), train)
        sc = x
        if self.stride != 1 or x.shape[-1] != 4 * self.planes:
            sc = _BN(name="bn_sc")(_conv(4 * self.planes, 1, self.stride, name="conv_sc")(x), train)
        return nn.relu(out + sc)


class ResNetCifar(nn.Module):
    """CIFAR-stem ResNet (3×3 stem, no maxpool; resnet_cifar.py:79-141)."""

    num_blocks: Sequence[int] = (2, 2, 2, 2)
    bottleneck: bool = False

    @property
    def feature_dim(self) -> int:
        return 2048 if self.bottleneck else 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(_BN(name="bn1")(_conv(64, 3, 1, name="conv1")(x), train))
        block = Bottleneck if self.bottleneck else BasicBlock
        for stage, (planes, nb) in enumerate(zip((64, 128, 256, 512), self.num_blocks)):
            for b in range(nb):
                h = block(
                    planes, stride=(1 if stage == 0 or b > 0 else 2),
                    name=f"layer{stage + 1}_{b}",
                )(h, train)
        return h.mean(axis=(1, 2))


def resnet18() -> ResNetCifar:
    return ResNetCifar((2, 2, 2, 2), bottleneck=False)


def resnet50() -> ResNetCifar:
    return ResNetCifar((3, 4, 6, 3), bottleneck=True)


def wideresnet_28_2() -> WideResnet:
    return WideResnet(k=2, n=28)
