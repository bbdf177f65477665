"""cogmen_mosei — the reference ships this as a byte-identical copy of
cogmen.py (same md5, SURVEY §1 L2) pointed at MOSEI; kept as an alias for
CLI parity (``--module=cogmen_mosei --dataset=mosei-emo-sbert-6``)."""

from functools import partial

from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer
from erc_tpu.train.trainer import main as _main


class COGMENMoseiParams(COGMENParams):
    def __init__(self):
        super().__init__()
        self.dataset = "mosei-emo-sbert-6"
        self.n_speakers = 1


ParamsType = COGMENMoseiParams

main = partial(_main, COGMENTrainer, COGMENMoseiParams)
