"""mmin_miss2 — the reference ships this as a near-byte-identical copy of
mmin_miss (track_mm/mmin_miss2.py); kept as an alias for CLI parity
(``--module=mmin_miss2``)."""

from erc_tpu.models.mmin_miss import (  # noqa: F401
    MMINMissParams,
    MMINMissTrainer,
    ParamsType,
    main,
)
