from erc_tpu.core.params import Params, BaseParams
from erc_tpu.core.meter import Meter, Record
from erc_tpu.core.logger import Logger
