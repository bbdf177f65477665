"""Dataset-name registry with the reference's name grammar.

``{dataset}-{feature_set}-[replacements]-{n_classes}`` — the trailing -N is
the class count (reference: mmdatasets/const.py:34-36); the middle tokens
select feature swaps (reference: datas/__init__.py:14-114).  Additional
``synthetic-*`` names generate data in-memory for tests/benchmarks.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Dict

from erc_tpu.data import dailydialog, iemocap_raw, readers, synthetic


def default_roots() -> Dict[str, str]:
    """Dataset roots; override via ERC_TPU_DATA_ROOT or .erc_tpurc.json."""
    from erc_tpu.core.machine import cfg_get

    base = cfg_get(
        "data_root", env="ERC_TPU_DATA_ROOT", default=os.path.expanduser("~/erc_data")
    )
    return {
        "iemocap": os.path.join(base, "iemocap"),
        "meld": os.path.join(base, "meld"),
        "mosi": os.path.join(base, "mosi"),
        "mosei": os.path.join(base, "mosei"),
        "dailydialog": os.path.join(base, "dailydialog"),
        "synthetic": base,
    }


def _mmin_loader(root, split="train", **kw):
    from erc_tpu.data import mmin

    return mmin.iemocap_mmin_4(root, split)


regist_data: Dict[str, Callable] = {
    # raw-corpus utterance views (reference datas/__init__.py:18-31; needs
    # the IEMOCAP_full_release tree, no feature dumps)
    "iemocap-audio-raw-9": iemocap_raw.iemocap_audio,
    "iemocap-audio-4": iemocap_raw.iemocap_audio_subset("4"),
    "iemocap-audio-v1-4": iemocap_raw.iemocap_audio_subset("4.1"),
    "iemocap-audio-6": iemocap_raw.iemocap_audio_subset("6"),
    "iemocap-text-4": iemocap_raw.iemocap_text_subset("4"),
    "iemocap-text-v1-4": iemocap_raw.iemocap_text_subset("4.1"),
    "iemocap-text-6": iemocap_raw.iemocap_text_subset("6"),
    "iemocap-ta-4": iemocap_raw.iemocap_text_audio_subset("4"),
    "iemocap-ta-v1-4": iemocap_raw.iemocap_text_audio_subset("4.1"),
    "iemocap-ta-6": iemocap_raw.iemocap_text_audio_subset("6"),
    "iemocap-cogmen-6": partial(readers.iemocap_cogmen_6),
    "iemocap-cogmen-sbert-6": partial(readers.iemocap_cogmen_6, text="sbert"),
    "iemocap-cogmen-robert-6": partial(readers.iemocap_cogmen_6, text="robert"),
    "iemocap-cogmen-tsn-6": partial(readers.iemocap_cogmen_6, visual="tsn"),
    "iemocap-cogmen-tsn-v+-6": partial(readers.iemocap_cogmen_6, visual="tsn+"),
    "iemocap-cogmen-sbert-tsn-6": partial(readers.iemocap_cogmen_6, text="sbert", visual="tsn"),
    "iemocap-cogmen-robert-tsn-6": partial(readers.iemocap_cogmen_6, text="robert", visual="tsn"),
    "iemocap-cogmen-sbert-tsn-v+-6": partial(readers.iemocap_cogmen_6, text="sbert", visual="tsn+"),
    "iemocap-cogmen-robert-tsn-v+-6": partial(readers.iemocap_cogmen_6, text="robert", visual="tsn+"),
    "iemocap-cogmen-4": partial(readers.iemocap_cogmen_4),
    "iemocap-cogmen-sbert-4": partial(readers.iemocap_cogmen_4, text="sbert"),
    "iemocap-cogmen-robert-4": partial(readers.iemocap_cogmen_4, text="robert"),
    "iemocap-cogmen-tsn-4": partial(readers.iemocap_cogmen_4, visual="tsn"),
    "iemocap-cogmen-tsnss-4": partial(readers.iemocap_cogmen_4, visual="tsnss"),
    "iemocap-cogmen-tsn-v+-4": partial(readers.iemocap_cogmen_4, visual="tsn+"),
    "iemocap-cogmen-tsnss-v+-4": partial(readers.iemocap_cogmen_4, visual="tsnss+"),
    "iemocap-cogmen-sbert-tsn-4": partial(readers.iemocap_cogmen_4, text="sbert", visual="tsn"),
    "iemocap-cogmen-robert-tsn-4": partial(readers.iemocap_cogmen_4, text="robert", visual="tsn"),
    "iemocap-cogmen-sbert-tsn-v+-4": partial(readers.iemocap_cogmen_4, text="sbert", visual="tsn+"),
    "iemocap-cogmen-robert-tsn-v+-4": partial(readers.iemocap_cogmen_4, text="robert", visual="tsn+"),
    "iemocap-cogmen-sbert-tsnss-4": partial(readers.iemocap_cogmen_4, text="sbert", visual="tsnss"),
    "iemocap-cogmen-robert-tsnss-4": partial(readers.iemocap_cogmen_4, text="robert", visual="tsnss"),
    "iemocap-cogmen-sbert-tsnss-v+-4": partial(readers.iemocap_cogmen_4, text="sbert", visual="tsnss+"),
    "iemocap-cogmen-robert-tsnss-v+-4": partial(readers.iemocap_cogmen_4, text="robert", visual="tsnss+"),
    "meld-mmgcn-7": partial(readers.meld_mmgcn_7, text=None),
    "meld-mmgcn-sbert-7": partial(readers.meld_mmgcn_7, text="sbert"),
    # extraction views (reference datas/__init__.py:73-81): sentence maps for
    # preprocess_text.py and transcript↔avi tables for preprocess_video.py
    "iemocap-cogmen-text-4": partial(readers.text_cogmen, n_class=4),
    "iemocap-cogmen-text-6": partial(readers.text_cogmen, n_class=6),
    "meld-mmgcn-text-7": readers.meld_mmgcn_text,
    "iemocap-cogmen-video-4": partial(readers.video_cogmen, n_class=4),
    "iemocap-cogmen-video-6": partial(readers.video_cogmen, n_class=6),
    # raw MOSEI views + the NAACL-19-CIM dump (datas/__init__.py:83-86)
    "mosei-text-any-7": readers.mosei_text,
    "mosei-interval-any-7": readers.mosei_interval,
    "mosei-cim-2": readers.mosei_cim,
    # MMIN utterance-level h5 dump (commented row datas/__init__.py:32)
    "iemocap-mmin-4": _mmin_loader,
    # DailyDialog token track (reference reader is a stub,
    # datas/text/dailydialog.py:12; real implementation in data/dailydialog.py)
    "dailydialog-token-7": dailydialog.dailydialog_token,
    "mosei-emo-sbert-6": partial(readers.mosei_adapted, text="sbert"),
    "mosei-sent-sbert-7": partial(readers.mosei_adapted, text="sbert", label_type="sent_7"),
    "mosei-sent-sbert-2": partial(readers.mosei_adapted, text="sbert", label_type="sent_2"),
    "mosei-multi-sbert-fbank-6": partial(
        readers.mosei_adapted, text="sbert", audio="fbank", label_type="multi"
    ),
    "mosei-emo-sbert-fbank-6": partial(
        readers.mosei_adapted, text="sbert", audio="fbank", label_type="emo"
    ),
    "mosei-emo-sbert-fbank-blc-6": partial(
        readers.mosei_adapted, text="sbert", audio="fbank", label_type="emo", balance=True
    ),
    "mosei-sent-sbert-fbank-7": partial(
        readers.mosei_adapted, text="sbert", audio="fbank", label_type="sent_7"
    ),
    "mosei-sent-sbert-fbank-2": partial(
        readers.mosei_adapted, text="sbert", audio="fbank", label_type="sent_2"
    ),
    "mosei-sent-sbert-fbank-+-2": partial(
        readers.mosei_adapted, text="sbert", audio="fbank", label_type="sent_2+"
    ),
    "mosei-emo-sbert-is10-6": partial(
        readers.mosei_adapted, text="sbert", audio="is10", label_type="emo"
    ),
    "mosei-sent-sbert-is10-7": partial(
        readers.mosei_adapted, text="sbert", audio="is10", label_type="sent_7"
    ),
    "mosei-sent-sbert-is10-2": partial(
        readers.mosei_adapted, text="sbert", audio="is10", label_type="sent_2"
    ),
    "mosei-sent-sbert-is10-+-2": partial(
        readers.mosei_adapted, text="sbert", audio="is10", label_type="sent_2+"
    ),
}


def _synthetic_loader(name: str):
    n_cls = n_classes_of(name)
    if "daily" in name:
        return lambda root, split="train", vocab_size=400, n_train=24, **kw: (
            synthetic.synthetic_daily(
                n_cls, split, vocab=int(vocab_size), n_train=int(n_train)
            )
        )
    if "mmin" in name:
        from erc_tpu.data import mmin

        return lambda root, split="train", **kw: mmin.synthetic_mmin(n_cls, split)
    if "mosei" in name:
        return lambda root, split="train", **kw: synthetic.synthetic_mosei(n_cls, split)
    # the corpus token picks the generated dims, which must agree with the
    # params grammar's (models/base.py) — an unrecognized name would
    # otherwise surface as a deep flax shape error at apply time
    if "meld" in name:
        prefix = "meld-mmgcn"
    elif "cogmen" in name or "iemocap" in name:
        prefix = "iemocap-cogmen"
    else:
        raise ValueError(
            f"unrecognized synthetic dataset {name!r}: use synthetic-cogmen-N,"
            " synthetic-iemocap-N, synthetic-meld-N, synthetic-mosei-N,"
            " synthetic-mmin-N or synthetic-daily-token-N"
        )
    return lambda root, split="train", **kw: synthetic.synthetic_erc(prefix, n_cls, split)


def n_classes_of(dataset_name: str) -> int:
    return round(float(dataset_name.split("-")[-1]))


# corpora whose readers expose a REAL validation split: MOSEI/MOSI carry
# valid_id lists (reference mosei_feature.py:131-143), DailyDialog ships a
# validation/ directory (data/dailydialog.py).  IEMOCAP/MELD readers alias
# val→test, so a val stage there would silently select on the test set.
_VAL_CORPORA = frozenset({"mosei", "mosi", "dailydialog"})
# feature sets with their own val folds regardless of corpus (MMIN h5 dumps)
_VAL_FEATURE_SETS = frozenset({"mmin"})


def dataset_has_val(dataset_name: str) -> bool:
    """Registry property: does this dataset have a real validation split?

    Parsed from the name grammar (corpus + feature-set tokens), NOT a
    substring match — a corpus name appearing as a feature tag elsewhere
    must not accidentally enable a val stage."""
    toks = dataset_name.split("-")
    corpus = toks[1] if toks[0] == "synthetic" and len(toks) > 1 else toks[0]
    return corpus in _VAL_CORPORA or bool(_VAL_FEATURE_SETS.intersection(toks))


def pick_datas(root, dataset_name: str, split: str = "train", **kw):
    """Resolve name → sample list (reference: datas/__init__.py:117-121).

    Extra kwargs flow to readers that take them (e.g. ``vocab_size`` for
    dailydialog-token-7); readers without matching parameters reject them
    loudly rather than silently ignoring a typo."""
    if dataset_name.startswith("synthetic-"):
        return _synthetic_loader(dataset_name)(root, split=split, **kw)
    fn = regist_data.get(dataset_name)
    assert fn is not None, f"unknown dataset {dataset_name!r}"
    return fn(root, split=split, **kw) if kw else fn(root, split=split)


def get_root(dataset_name: str) -> str:
    return default_roots()[dataset_name.split("-")[0]]
