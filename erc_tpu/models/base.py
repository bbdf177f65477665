"""Shared ERC params: the dataset-name grammar → model dims derivation.

Port of MMBaseParams (reference: track_mm/mmbase.py:22-127): the dataset
string ``{dataset}-{feature_set}-[replacements]-{n_classes}`` drives hidden
dims, class names and speaker counts.  ``synthetic-*`` names reuse the same
grammar (synthetic-cogmen-6 has iemocap-cogmen geometry).
"""

from __future__ import annotations

from erc_tpu.core.params import BaseParams
from erc_tpu.train import optim as optim_factory


class MMBaseParams(BaseParams):
    def __init__(self):
        super().__init__()
        self.seed = 1
        self.module = None
        self.method = None

        self.class_names = []
        self.modality = self.choice("atv", "av", "at", "tv", "t", "a", "v")
        self.n_speakers = 2

        self.batch_first = True
        self.speaker_onehot = False
        self.balance_data = False
        self.evalute_stage = False

        self.hidden_text = 100
        self.hidden_audio = 100
        self.hidden_visual = 100
        self.hidden_all = 300
        self.reimplement = False

        self.mosei_metric = "multiemo"
        self.confusion_matrix = True

        self.epoch = 10
        self.train.batch_size = 32
        self.test.batch_size = 32
        self.device = 0  # accepted for CLI parity; placement is mesh-driven

        # data pipeline (TPU additions)
        self.max_seq_len = 128
        # 0 = single bucket (pad to max_seq_len); >0 = pad to a multiple.
        # Default 16: measured on IEMOCAP/MELD-shaped length mixes
        # (scripts/bench_padding.py), fill rises 38->80% / 8->51% and
        # epoch dia/s +45% vs single-bucket at <=8 compiled programs
        # (persistent-cached); GroupedLoader keeps steps_per_call groups
        # shape-pure across bucket transitions.  0 restores one-compile.
        self.length_bucket = 16
        self.sort_by_length = True
        # >1: lax.scan K optimizer steps per dispatch (identical results).
        # Wins when per-dispatch latency dominates (directly-attached
        # chips); on slow host links the spc=1 placed-prefetch pipeline
        # (uploads overlap compute) is faster — both compose with prefetch.
        self.steps_per_call = 1
        # eval-stage grouping, independent of the train knob: 0 = inherit
        # steps_per_call.  Eval has no per-step logging cadence to preserve,
        # so tunnel-attached hosts can scan eval (K batches per dispatch,
        # measured 2.4-5x eval dia/s) while keeping spc=1 training
        self.eval_steps_per_call = 0
        # bf16 fwd/bwd with f32 master params/optimizer (halves activation
        # HBM traffic); float32 default for bit-level parity runs
        self.compute_dtype = self.choice("float32", "bfloat16")
        # host→device batch transfer dtype: bfloat16 halves the bytes the
        # input pipeline ships per step (features are quantized once at
        # transfer; steps upcast to compute_dtype at entry).  The win is
        # proportional to host-link bandwidth — measured ~2x end-to-end on
        # a tunnel-attached host, invisible next to PCIe
        self.transfer_dtype = self.choice("float32", "bfloat16")
        self.eval_per_epoch = 1
        # val-split stage: evaluate() runs at the eval cadence when the
        # dataset has a real val split (MOSEI valid_id, MMIN folds);
        # --select_on=val saves best_val on val wF1 instead of test f1
        self.eval_val = True
        self.select_on = self.choice("test", "val")
        self.data_root = None

        self.optim = optim_factory.create_optim("Adam", lr=1e-3)

    @property
    def n_classes(self) -> int:
        return round(float(self.dataset.split("-")[-1]))

    def iparams(self):
        super().iparams()
        ds = self.dataset
        if self.get("debug"):
            self.train.batch_size = 2
            self.test.batch_size = 2

        if "mosei" not in ds:
            self.mosei_metric = ""

        if "iemocap" in ds or ("synthetic" in ds and "cogmen" in ds):
            if self.n_classes == 4:
                self.class_names = ["hap", "sad", "neu", "ang"]
            elif self.n_classes == 6:
                self.class_names = ["hap", "sad", "neu", "ang", "exc", "fru"]
            if "cogmen" in ds or "synthetic" in ds:
                # synthetic-iemocap-* generates cogmen-shaped features
                # (data/synthetic._DIMS) — grammar must agree
                self.hidden_audio = 100
                self.hidden_text = 100
                self.hidden_visual = 512
        elif "meld" in ds:
            self.class_names = [
                "neutral", "sad", "mad", "scared", "powerful", "peaceful", "joyful"
            ]
            self.n_speakers = 9
            if "mmgcn" in ds or "synthetic" in ds:
                self.hidden_audio = 300
                self.hidden_text = 600
                self.hidden_visual = 342
        elif "mosei" in ds:
            self.class_names = ["hap", "sad", "disgust", "fear", "surprise", "ang"]
            self.hidden_text = 300
            self.hidden_audio = 74
            self.hidden_visual = 35

        if "pad80" in ds:
            self.hidden_audio = 80
        elif "fbank" in ds:
            self.hidden_audio = 640
        elif "is10" in ds:
            self.hidden_audio = 1584

        if "sbert" in ds or "robert" in ds:
            self.hidden_text = 768

        hv = None
        if "tsn" in ds:
            hv = 2048
        if hv:
            if "v+" in ds:
                self.hidden_visual += hv
            else:
                self.hidden_visual = hv

        self.hidden_all = 0
        if "t" in self.modality:
            self.hidden_all += self.hidden_text
        if "a" in self.modality:
            self.hidden_all += self.hidden_audio
        if "v" in self.modality:
            self.hidden_all += self.hidden_visual

    # modality-ordered (dim per modality char) — collate concat order
    def modality_dims(self):
        d = {"a": self.hidden_audio, "t": self.hidden_text, "v": self.hidden_visual}
        return {m: d[m] for m in self.modality}
