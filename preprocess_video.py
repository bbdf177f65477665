"""Video feature re-extraction entry (reference: preprocess_video.py →
preprocess/video/extractor.py:170-227): walk every dialogue avi, slice
per-utterance frame spans from the transcript timestamps, crop the
speaker's half-frame, and run the flax TSN-R50 (or X3D) backbone.

    python preprocess_video.py --dataset=iemocap-cogmen-video-4 \
        --checkpoint=/path/tsn_r50.pth [--backbone=tsn|x3d] [--out=...]

Requires the IEMOCAP_full_release tree (avis + transcripts) under the
dataset root and the cogmen feature pkl (for the dump-sentence alignment,
reference iemocap_feature.py:157-225).  Decode uses cv2.
"""

import os
import pickle

import numpy as np

from erc_tpu.core.params import BaseParams


def main(argv=None):
    p = BaseParams()
    p.dataset = "iemocap-cogmen-video-4"
    p.checkpoint = None
    p.backbone = p.choice("tsn", "x3d")
    p.out = None
    p.n_segments = 8
    p.release_dir = "IEMOCAP_full_release"
    p.prefix = ""
    p.finalize(argv)

    from erc_tpu.data.registry import get_root, pick_datas
    from erc_tpu.preprocess.video_walk import extract_dialogue_features

    # resolve the alignment table through the registry like the reference
    # (datas/__init__.py:78-81 → iemocap_feature.video_cogmen)
    n_class = int(p.dataset.rsplit("-", 1)[-1])
    root = get_root(p.dataset)
    clips = pick_datas(root, p.dataset, release_dir=p.release_dir)
    print(f"aligned {len(clips)} dialogue videos")

    from erc_tpu.preprocess.video import TSNExtractor, X3DExtractor

    if p.backbone == "x3d":
        cls, kw = X3DExtractor, {}
    else:
        cls, kw = TSNExtractor, {"n_segments": int(p.n_segments)}
    if p.get("checkpoint"):
        ex = cls.from_torch_checkpoint(p.checkpoint, **kw)
    else:
        ex = cls(**kw)
        print("warning: no --checkpoint given — random backbone weights")

    feats = extract_dialogue_features(clips, ex.extract, log=print)

    prefix = p.get("prefix") or p.backbone
    sub = "iemocap_4" if n_class == 4 else "iemocap"
    out = p.get("out") or os.path.join(root, "cogmen", sub, f"{prefix}_vfeat.pkl")
    out_dir = os.path.dirname(out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump(feats, f)
    n_ok = sum(1 for v in feats.values() if len(v))
    print(f"wrote {out}: {n_ok}/{len(feats)} dialogues extracted")


if __name__ == "__main__":
    main()
