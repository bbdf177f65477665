"""Benchmark video feature extraction: the TPU TSN-R50 / X3D-M paths vs
an equal-FLOPs torch-CPU reference forward, head-to-head in this
container.

The reference extracts per-utterance video features with mmaction's
recognizer forward (`feature_extraction=True`) driven one clip at a time
(/root/reference/preprocess/video/extractor.py:170-227; TSN-R50 consensus
over 8 segments, or X3D-M over 16 frames).  mmaction+mmcv are not
installed here, so — exactly like bench.py's torch COGMEN baseline — the
reference rate is a faithful plain-torch ResNet-50 bottleneck stack at
equal FLOPs (conv layout/widths/strides of torchvision/mmaction R50),
consensus-mean over the segment axis, one utterance per call on this
host's single core.  Host video DECODE is charged to neither side: both
stacks consume pre-decoded uint8 frames (the reference pays decord, we
pay cv2/ffmpeg — both host-bound and identical in kind).

Rates reported (same three-tier protocol as scripts/bench_acoustic.py —
inputs are PRE-generated so synthesis is charged to neither side):

- ``torch_cpu_tsn``: reference-equivalent TSN-R50 utt/s (1 core);
- ``tsn_device`` / ``x3d_device``: the jit on resident uint8 batches —
  per-chip compute rate (what a PCIe-attached production host
  approaches); normalization happens on device (TSNExtractor.extract_batch).
- ``tsn_e2e_tunnel`` / ``x3d_e2e_tunnel``: this rig's honest end-to-end —
  per-batch uint8 upload (~9.6 MB per 8-utterance TSN batch) + feature
  fetch through the axon tunnel's ~30 MB/s link, reported so nobody
  mistakes the device rate for what this test rig delivers.

Usage: python scripts/bench_video_extract.py [--reps=8] [--tsn-batch=8]
       [--x3d-batch=4] [--no-torch] [--no-x3d]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CROP = 224
TSN_SEGMENTS = 8   # reference TSN test pipeline: 8 segment centers
X3D_FRAMES = 16    # X3D-M clip length


def _force(x):
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[0]))


def torch_resnet50_tsn(utterances, steps):
    """Plain-torch R50 (torchvision layout: 7×7/2 stem, [3,4,6,3]
    bottlenecks, widths 64-512, global pool) + consensus mean — the
    compute of mmaction recognizer2d feature extraction, one utterance
    per call like the reference's extractor loop."""
    import torch
    from torch import nn

    torch.set_num_threads(max(torch.get_num_threads(), 8))

    class Bottleneck(nn.Module):
        def __init__(self, cin, planes, stride, down):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.down = (
                nn.Sequential(nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                              nn.BatchNorm2d(planes * 4))
                if down else None
            )
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            idt = self.down(x) if self.down else x
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idt)

    layers = [nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
              nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1)]
    cin = 64
    for planes, blocks, stride in [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]:
        for bi in range(blocks):
            layers.append(Bottleneck(cin, planes, stride if bi == 0 else 1, bi == 0))
            cin = planes * 4
    layers += [nn.AdaptiveAvgPool2d(1), nn.Flatten()]
    model = nn.Sequential(*layers).eval()

    mean = torch.tensor([123.675, 116.28, 103.53]).view(1, 3, 1, 1)
    std = torch.tensor([58.395, 57.12, 57.375]).view(1, 3, 1, 1)
    clips = [
        torch.from_numpy(u.transpose(0, 3, 1, 2).astype(np.float32))
        for u in utterances[: steps + 1]
    ]
    with torch.no_grad():
        model((clips[0] - mean) / std).mean(0)  # warmup
        t0 = time.perf_counter()
        for clip in clips[1 : steps + 1]:
            model((clip - mean) / std).mean(0)
        dt = time.perf_counter() - t0
    return steps / dt


def bench_device(fwd, variables, batch_u8, reps):
    """Rate on a RESIDENT device batch: upload once, time reps."""
    import jax.numpy as jnp

    dev = jnp.asarray(batch_u8)
    _force(dev)
    _force(fwd(variables, dev))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fwd(variables, dev)
    _force(out)
    return batch_u8.shape[0] * reps / (time.perf_counter() - t0)


def bench_e2e(extract_batch, batches, reps):
    """Honest end-to-end: per-call uint8 upload + full feature fetch."""
    extract_batch(batches[0])  # warm
    t0 = time.perf_counter()
    n = 0
    for i in range(reps):
        feats = extract_batch(batches[i % len(batches)])
        n += len(feats)
    # extract_batch returns np — the fetch is already synchronous
    return n / (time.perf_counter() - t0)


def main(argv):
    reps, tsn_b, x3d_b = 8, 8, 4
    do_torch, do_x3d = True, True
    for a in argv:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--tsn-batch="):
            tsn_b = int(a.split("=", 1)[1])
        elif a.startswith("--x3d-batch="):
            x3d_b = int(a.split("=", 1)[1])
        elif a == "--no-torch":
            do_torch = False
        elif a == "--no-x3d":
            do_x3d = False

    from erc_tpu.parallel.cache import enable_persistent_cache

    enable_persistent_cache()

    rng = np.random.default_rng(0)
    out = {"protocol": "pre-generated uint8 frames; decode charged to neither side"}

    # ---- pre-generate inputs (identical content for both stacks) ----
    tsn_batches = [
        rng.integers(0, 255, (tsn_b, TSN_SEGMENTS, CROP, CROP, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    tsn_utts = [u for b in tsn_batches for u in b]

    if do_torch:
        out["torch_cpu_tsn_utt_s"] = round(
            torch_resnet50_tsn(tsn_utts, steps=min(4, len(tsn_utts) - 1)), 3
        )
        print(f"torch-CPU TSN-R50 (1 utt/call): {out['torch_cpu_tsn_utt_s']} utt/s",
              flush=True)

    from erc_tpu.preprocess.video import TSNExtractor

    tsn = TSNExtractor(n_segments=TSN_SEGMENTS, crop_size=CROP)
    dev_rate = bench_device(tsn._batch_fwd, tsn.variables, tsn_batches[0], reps)
    out["tsn_device_utt_s"] = round(dev_rate, 1)
    out["tsn_device_frames_s"] = round(dev_rate * TSN_SEGMENTS, 1)
    print(f"TSN-R50 device (B={tsn_b} resident): {dev_rate:.1f} utt/s "
          f"({dev_rate * TSN_SEGMENTS:.0f} frames/s)", flush=True)

    e2e = bench_e2e(tsn.extract_batch, tsn_batches, reps)
    out["tsn_e2e_tunnel_utt_s"] = round(e2e, 1)
    print(f"TSN-R50 e2e through tunnel: {e2e:.1f} utt/s", flush=True)

    if do_torch and out.get("torch_cpu_tsn_utt_s"):
        out["tsn_device_vs_torch"] = round(
            out["tsn_device_utt_s"] / out["torch_cpu_tsn_utt_s"], 1
        )

    if do_x3d:
        from erc_tpu.preprocess.video import X3DExtractor

        x3d = X3DExtractor(n_frames=X3D_FRAMES, crop_size=CROP)
        xb = [
            rng.integers(0, 255, (x3d_b, X3D_FRAMES, CROP, CROP, 3), dtype=np.uint8)
            for _ in range(2)
        ]
        dev_rate = bench_device(x3d._batch_fwd, x3d.variables, xb[0], reps)
        out["x3d_device_utt_s"] = round(dev_rate, 1)
        out["x3d_device_frames_s"] = round(dev_rate * X3D_FRAMES, 1)
        print(f"X3D-M device (B={x3d_b} resident): {dev_rate:.1f} utt/s "
              f"({dev_rate * X3D_FRAMES:.0f} frames/s)", flush=True)
        e2e = bench_e2e(x3d.extract_batch, xb, reps)
        out["x3d_e2e_tunnel_utt_s"] = round(e2e, 1)
        print(f"X3D-M e2e through tunnel: {e2e:.1f} utt/s", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
