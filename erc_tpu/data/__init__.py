from erc_tpu.data.registry import pick_datas, regist_data, n_classes_of
from erc_tpu.data.collate import ERCBatcher
from erc_tpu.data.loader import DialogueLoader
