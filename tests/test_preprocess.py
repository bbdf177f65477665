"""Preprocess stacks: flax ResNet-50 port parity vs torch, TSN machinery,
text encoder pipeline with a random tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_torch_resnet50():
    """torchvision-layout ResNet-50 built from torch.nn primitives."""
    torch = pytest.importorskip("torch")
    from torch import nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU()
            self.downsample = downsample

        def forward(self, x):
            r = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                r = self.downsample(x)
            return self.relu(out + r)

    class R50(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            inplanes = 64
            layers = []
            for planes, blocks, stride in [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]:
                downsample = nn.Sequential(
                    nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )
                blist = [Bottleneck(inplanes, planes, stride, downsample)]
                inplanes = planes * 4
                for _ in range(1, blocks):
                    blist.append(Bottleneck(inplanes, planes))
                layers.append(nn.Sequential(*blist))
            self.layer1, self.layer2, self.layer3, self.layer4 = layers

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return x.mean(dim=(2, 3))

    return R50()


@pytest.mark.slow
def test_resnet50_port_matches_torch():
    torch = pytest.importorskip("torch")
    from erc_tpu.preprocess.video import ResNet50, port_torch_resnet

    tmod = _tiny_torch_resnet50().eval()
    # randomize BN stats so the test exercises running-stat porting
    with torch.no_grad():
        for m in tmod.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()

    variables = port_torch_resnet(tmod.state_dict())
    model = ResNet50()
    got = np.asarray(
        model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_tsn_segment_sampling_and_extract_shapes():
    from erc_tpu.preprocess.video import TSNExtractor

    ex = TSNExtractor(n_segments=4, crop_size=32)
    idx = ex.sample_segments(40)
    assert len(idx) == 4 and (idx < 40).all()
    frames = np.random.default_rng(1).integers(0, 255, (12, 48, 64, 3)).astype(np.uint8)
    feat = ex.extract(frames)
    assert feat.shape == (2048,)
    assert np.isfinite(feat).all()


def test_crop_speaker_half():
    from erc_tpu.preprocess.video import crop_speaker_half

    frame = np.zeros((480, 720, 3), np.uint8)
    m = crop_speaker_half(frame, "M")
    f = crop_speaker_half(frame, "F")
    assert m.shape == (245, 360, 3)
    assert f.shape == (245, 360, 3)


def test_text_encoder_with_random_tiny_model():
    from transformers import FlaxRobertaModel, RobertaConfig, AutoTokenizer

    cfg = RobertaConfig(
        vocab_size=100, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=64,
    )
    model = FlaxRobertaModel(cfg)

    class DummyTok:
        def __call__(self, sentences, **kw):
            n = len(sentences)
            L = kw.get("max_length", 8)
            rng = np.random.default_rng(0)
            ids = rng.integers(4, 100, (n, L))
            am = np.ones((n, L), np.int32)
            return {"input_ids": ids, "attention_mask": am}

    from erc_tpu.preprocess.lexical import TextEncoder

    enc = TextEncoder(model, DummyTok(), mode="sbert", max_tokens=8, batch_size=4)
    out = enc.encode([f"sent {i}" for i in range(6)])
    assert out.shape == (6, 16)
    assert np.isfinite(out).all()
    maps = enc.encode_dialogues({"d1": ["a", "b"], "d2": ["c"]})
    assert maps["d1"].shape == (2, 16) and maps["d2"].shape == (1, 16)


# -------------------------------------------------------------------- TSM
def test_temporal_shift_matches_reference_math():
    """jax temporal_shift == the reference's zero-padded channel-fold
    shift (preprocess/video/tsm_model.py:42-59), exactly."""
    torch = pytest.importorskip("torch")
    from erc_tpu.preprocess.video import temporal_shift

    def ref_shift(x, n_segment, fold_div):
        nt, c, h, w = x.size()
        x = x.view(nt // n_segment, n_segment, c, h, w)
        fold = c // fold_div
        out = torch.zeros_like(x)
        out[:, :-1, :fold] = x[:, 1:, :fold]
        out[:, 1:, fold : 2 * fold] = x[:, :-1, fold : 2 * fold]
        out[:, :, 2 * fold :] = x[:, :, 2 * fold :]
        return out.view(nt, c, h, w)

    rng = np.random.default_rng(0)
    for n_seg, n_div, c in ((4, 8, 16), (3, 8, 17), (2, 4, 8)):
        x = rng.normal(size=(2 * n_seg, c, 3, 5)).astype(np.float32)
        want = ref_shift(torch.from_numpy(x), n_seg, n_div).numpy()
        got = np.asarray(
            temporal_shift(jnp.asarray(x.transpose(0, 2, 3, 1)), n_seg, n_div)
        ).transpose(0, 3, 1, 2)
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_tsm_recognizer_port_matches_torch():
    """Whole-recognizer parity: torch TSN+TSM (blockres shift on every
    block's conv1, avg consensus, new_fc head — tsm_model.py:619-770)
    ported into TSMRecognizer matches the torch forward."""
    torch = pytest.importorskip("torch")
    from torch import nn as tnn

    from erc_tpu.preprocess.tsm import TSMRecognizer, port_torch_tsm

    n_seg, num_class = 4, 5

    class TemporalShift(tnn.Module):  # reference wrapper (tsm_model.py:26-59)
        def __init__(self, net, n_segment, n_div):
            super().__init__()
            self.net = net
            self.n_segment = n_segment
            self.n_div = n_div

        def forward(self, x):
            nt, c, h, w = x.size()
            xs = x.view(nt // self.n_segment, self.n_segment, c, h, w)
            fold = c // self.n_div
            out = torch.zeros_like(xs)
            out[:, :-1, :fold] = xs[:, 1:, :fold]
            out[:, 1:, fold : 2 * fold] = xs[:, :-1, fold : 2 * fold]
            out[:, :, 2 * fold :] = xs[:, :, 2 * fold :]
            return self.net(out.view(nt, c, h, w))

    base = _tiny_torch_resnet50()
    for layer in (base.layer1, base.layer2, base.layer3, base.layer4):
        for b in layer:  # blockres, n_round=1 (R50: layer3 has 6 < 23 blocks)
            b.conv1 = TemporalShift(b.conv1, n_seg, 8)

    class TorchTSM(tnn.Module):
        def __init__(self):
            super().__init__()
            self.base_model = base
            self.new_fc = tnn.Linear(2048, num_class)

        def forward(self, x):  # x: [N, T, C, H, W]
            n, t = x.shape[:2]
            feats = self.base_model(x.reshape((n * t,) + x.shape[2:]))
            logits = self.new_fc(feats)  # eval: dropout is identity
            return logits.view(n, t, -1).mean(dim=1)  # avg consensus

    tmod = TorchTSM().eval()
    with torch.no_grad():
        for m in tmod.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(1).normal(size=(2, n_seg, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()

    variables = port_torch_tsm(tmod.state_dict())
    model = TSMRecognizer(num_class=num_class, n_segment=n_seg)
    got = np.asarray(
        model.apply(variables, jnp.asarray(x.transpose(0, 1, 3, 4, 2)), train=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_tsn_extract_batch_matches_single_path():
    # device-side normalization of the uint8 batch path ≡ the single-clip
    # host-normalized forward + consensus mean
    import jax.numpy as jnp

    from erc_tpu.preprocess.video import IMAGENET_MEAN, IMAGENET_STD, TSNExtractor

    ex = TSNExtractor(n_segments=2, crop_size=32)
    clips = np.random.default_rng(3).integers(0, 255, (2, 2, 32, 32, 3)).astype(np.uint8)
    got = ex.extract_batch(clips)
    assert got.shape == (2, 2048)
    for b in range(2):
        x = (clips[b].astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD
        want = np.asarray(ex._fwd(ex.variables, jnp.asarray(x))).mean(0)
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-4)


def test_x3d_extract_batch_matches_single_path():
    import jax.numpy as jnp

    from erc_tpu.preprocess.video import IMAGENET_MEAN, IMAGENET_STD, X3DExtractor
    from erc_tpu.preprocess.x3d import X3D

    model = X3D(gamma_w=0.5, gamma_b=2.0, gamma_d=0.2, base_channels=16,
                stage_blocks=(1, 1, 1, 1))
    ex = X3DExtractor(n_frames=2, crop_size=16, model=model)
    clips = np.random.default_rng(4).integers(0, 255, (2, 2, 16, 16, 3)).astype(np.uint8)
    got = ex.extract_batch(clips)
    assert got.shape == (2, model.feat_dim)
    x = (clips.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD
    want = np.asarray(ex._fwd(ex.variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
