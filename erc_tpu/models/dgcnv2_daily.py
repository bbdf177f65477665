"""dgcnv2_daily — the DailyDialog token track as a runnable experiment
(reference DialogueGCN_DailyModel, dgcnv2_models.py:776-927):

    python train_mm.py --module=dgcnv2_daily --dataset=dailydialog-token-7

CNNFeatureExtractor over token ids feeding the dgcnv2 graph pipeline; the
model, batcher and trainer live in erc_tpu/models/dgcnv2.py.
"""

from erc_tpu.models.dgcnv2 import (  # noqa: F401
    DGCNV2DailyParams,
    DGCNV2DailyTrainer,
    daily_main as main,
)

ParamsType = DGCNV2DailyParams
