"""Reader format parity: synthetic pickles in the exact reference layouts
(IEMOCAP cogmen 9-tuple, MELD 10-tuple, MOSEI 13-tuple) round-trip through
the readers, including feature-swap variants."""

import os
import pickle

import numpy as np
import pytest

from erc_tpu.data import readers


def _mk_iemocap(root, n_dial=3, n_cls=6):
    rng = np.random.default_rng(0)
    ids, spk, lab, txt, aud, vis, sent = {}, {}, {}, {}, {}, {}, {}
    keys = [f"Ses0{i}" for i in range(n_dial)]
    for k in keys:
        L = int(rng.integers(3, 6))
        ids[k] = [f"{k}_u{j}" for j in range(L)]
        spk[k] = [("M" if j % 2 == 0 else "F") for j in range(L)]
        lab[k] = rng.integers(0, n_cls, L).tolist()
        txt[k] = rng.normal(size=(L, 100)).astype(np.float32)
        aud[k] = rng.normal(size=(L, 100)).astype(np.float32)
        vis[k] = rng.normal(size=(L, 512)).astype(np.float32)
        sent[k] = [f"utt {j}" for j in range(L)]
    train_ids, test_ids = keys[:2], keys[2:]
    pkl = (ids, spk, lab, txt, aud, vis, sent, train_ids, test_ids)
    os.makedirs(os.path.join(root, "cogmen/iemocap"), exist_ok=True)
    with open(os.path.join(root, "cogmen/iemocap/IEMOCAP_features.pkl"), "wb") as f:
        pickle.dump(pkl, f)
    # sbert replacement map (768-d)
    sbert = {k: rng.normal(size=(len(sent[k]), 768)).astype(np.float32) for k in keys}
    with open(os.path.join(root, "cogmen/iemocap/sbert_map.pkl"), "wb") as f:
        pickle.dump(sbert, f)
    return keys, sbert


def test_iemocap_cogmen_reader(tmp_path):
    root = str(tmp_path)
    keys, sbert = _mk_iemocap(root)
    train = readers.iemocap_cogmen_6(root, "train")
    test = readers.iemocap_cogmen_6(root, "test")
    assert len(train) == 2 and len(test) == 1
    s = train[0]
    assert s["speakers"][0] == [1, 0] and s["speakers"][1] == [0, 1]  # M/F one-hot
    assert s["text"].shape[-1] == 100 and s["visual"].shape[-1] == 512
    # sbert swap
    train_sb = readers.iemocap_cogmen_6(root, "train", text="sbert")
    assert train_sb[0]["text"].shape[-1] == 768
    np.testing.assert_array_equal(train_sb[0]["text"], sbert[keys[0]])


def test_meld_reader(tmp_path):
    rng = np.random.default_rng(1)
    root = str(tmp_path)
    keys = ["d0", "d1"]
    mk = lambda D: {k: rng.normal(size=(4, D)).astype(np.float64) for k in keys}
    pkl = (
        {k: [f"{k}_{j}" for j in range(4)] for k in keys},
        {k: [[1] + [0] * 8 for _ in range(4)] for k in keys},  # 9-speaker one-hot
        {k: [0, 1, 2, 3] for k in keys},
        mk(600), mk(300), mk(342),
        {k: ["s"] * 4 for k in keys},
        ["d0"], ["d1"], None,
    )
    os.makedirs(os.path.join(root, "MMGCN"), exist_ok=True)
    with open(os.path.join(root, "MMGCN/MELD_features_raw.pkl"), "wb") as f:
        pickle.dump(pkl, f)
    train = readers.meld_mmgcn_7(root, "train")
    assert len(train) == 1
    assert train[0]["text"].dtype == np.float32  # astype cast applied
    assert train[0]["audio"].shape == (4, 342) or train[0]["audio"].shape == (4, 300)


def test_mosei_reader_label_modes(tmp_path):
    rng = np.random.default_rng(2)
    root = str(tmp_path)
    keys = ["v0", "v1"]
    emo = {k: np.concatenate(
        [rng.uniform(-3, 3, (5, 1)), rng.integers(0, 2, (5, 7)).astype(float)], 1
    ) for k in keys}
    mk = lambda D: {k: rng.normal(size=(5, D)).astype(np.float32) for k in keys}
    pkl = (
        ["v0"], ["v1"], [],  # train/test/valid ids
        {k: None for k in keys},  # intervals
        emo, mk(74), mk(300), mk(35),
        {k: ["s"] * 5 for k in keys},
        [], [], [], [],
    )
    with open(os.path.join(root, "MOSEI.adpated.pkl"), "wb") as f:
        pickle.dump(pkl, f)

    for mode, check in [
        ("emo", lambda s: s["label"].max() < 7),
        ("sent_2", lambda s: set(np.unique(s["label"])) <= {0, 1}),
        ("sent_7", lambda s: s["label"].max() < 7),
        ("multi", lambda s: s["label"].shape[-1] == 8),
    ]:
        train = readers.mosei_adapted(root, "train", label_type=mode)
        assert len(train) == 1
        assert check(train[0]), mode
        assert train[0]["emo_label"].shape == (5, 7)
        assert set(np.unique(train[0]["senti2_label"])) <= {0, 1}


def test_mosei_sentiment_bins():
    assert [readers.cmumosei_7(a) for a in (-3, -1.5, -0.5, 0, 0.5, 1.5, 2.5)] == list(range(7))
    assert readers.cmumosei_2(-0.1) == 0 and readers.cmumosei_2(0.0) == 1
    emo = np.array([[0, 0, 0, 0, 0, 0], [1, 0, 1, 0, 0, 0]])
    ml = readers.create_emotion_label(emo)
    np.testing.assert_array_equal(ml[0], [0, 0, 0, 0, 0, 0, 1])  # empty → class 6
    np.testing.assert_array_equal(ml[1], [1, 0, 1, 0, 0, 0, 0])


def test_train_end_to_end_from_disk_dump(tmp_path, monkeypatch):
    """The real-data path: a reference-layout pickle on disk reaches the
    trainer through ERC_TPU_DATA_ROOT → get_root → pick_datas → ERCBatcher
    → train() + test() (the exact flow a user with the licensed dumps
    runs)."""
    data_root = tmp_path / "data"
    _mk_iemocap(str(data_root / "iemocap"), n_dial=6)
    monkeypatch.setenv("ERC_TPU_DATA_ROOT", str(data_root))
    monkeypatch.setenv("ERC_TPU_EXPROOT", str(tmp_path / "exp"))

    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer

    p = COGMENParams()
    p.dataset = "iemocap-cogmen-6"
    p.epoch = 1
    p.train.batch_size = 4
    p.test.batch_size = 4
    p.max_seq_len = 8
    p.iparams()
    assert p.hidden_all == 712  # dataset-grammar dims (100+100+512)
    tr = COGMENTrainer(p)
    tr.train()
    res = tr.test()
    assert tr.global_steps > 0 and "f1" in res
