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


def test_extraction_views(tmp_path):
    """-text-/-video- extraction views resolve through the registry
    (reference datas/__init__.py:73-81)."""
    from erc_tpu.data.registry import pick_datas

    root = str(tmp_path)
    keys, _ = _mk_iemocap(root)
    sent = pick_datas(root, "iemocap-cogmen-text-6")
    assert set(sent) == set(keys) and sent[keys[0]][0] == "utt 0"

    # meld text view
    rng = np.random.default_rng(1)
    mkeys = ["d0"]
    pkl = (
        {k: ["u0"] for k in mkeys}, {k: [[1] + [0] * 8] for k in mkeys},
        {k: [0] for k in mkeys},
        {k: rng.normal(size=(1, 600)) for k in mkeys},
        {k: rng.normal(size=(1, 300)) for k in mkeys},
        {k: rng.normal(size=(1, 342)) for k in mkeys},
        {k: ["hello"] for k in mkeys}, ["d0"], [], None,
    )
    os.makedirs(os.path.join(root, "MMGCN"), exist_ok=True)
    with open(os.path.join(root, "MMGCN/MELD_features_raw.pkl"), "wb") as f:
        pickle.dump(pkl, f)
    msent = pick_datas(root, "meld-mmgcn-text-7")
    assert msent == {"d0": ["hello"]}


def test_mosei_views(tmp_path):
    """mosei-text-any-7 / mosei-interval-any-7 raw views
    (mosei_feature.py:226-250)."""
    from erc_tpu.data.registry import pick_datas

    root = str(tmp_path)
    pkl = (
        ["v0"], [], [],
        {"v0": [[0.0, 1.0]]},  # intervals
        {"v0": np.zeros((1, 8))}, {"v0": np.zeros((1, 74))},
        {"v0": np.zeros((1, 300))}, {"v0": np.zeros((1, 35))},
        {"v0": ["a sentence"]},
        [], [], [], [],
    )
    with open(os.path.join(root, "MOSEI.adpated.pkl"), "wb") as f:
        pickle.dump(pkl, f)
    assert pick_datas(root, "mosei-text-any-7") == {"v0": ["a sentence"]}
    assert pick_datas(root, "mosei-interval-any-7") == {"v0": [[0.0, 1.0]]}


def _mk_cim(root, n=3, L=4):
    rng = np.random.default_rng(3)
    os.makedirs(os.path.join(root, "CIM"), exist_ok=True)
    Lmax = L + 2

    def block(tag, ids_tag):
        return {
            f"{tag}_length": np.full(n, L, np.int64),
            f"{tag}EmoLabel" if tag != "train" else "trainEmoLabel":
                rng.integers(0, 2, (n, Lmax, 6)).astype(float),
            f"{tag}SentiLabel" if tag != "train" else "trainSentiLabel":
                rng.uniform(-3, 3, (n, Lmax, 1)),
            f"{tag}_data": rng.normal(size=(n, Lmax, 300)).astype(np.float32),
            f"{ids_tag}_idName": np.array([f"{tag}{i}" for i in range(n)]),
        }

    text = {**block("train", "train"), **block("valid", "valid"), **block("test", "test")}
    np.savez(os.path.join(root, "CIM/text.npz"), **text)
    feats = lambda D: {
        f"{t}_data": rng.normal(size=(n, Lmax, D)).astype(np.float32)
        for t in ("train", "valid", "test")
    }
    np.savez(os.path.join(root, "CIM/video.npz"), **feats(35))
    np.savez(os.path.join(root, "CIM/audio.npz"), **feats(74))


def test_mosei_cim_reader(tmp_path):
    """mosei-cim-2: CIM npz dumps → samples (mosei_feature.py:55-128)."""
    from erc_tpu.data.registry import pick_datas

    root = str(tmp_path)
    _mk_cim(root)
    for split in ("train", "val", "test"):
        samples = pick_datas(root, "mosei-cim-2", split=split)
        assert len(samples) == 3
        s = samples[0]
        assert s["text"].shape == (4, 300) and s["audio"].shape == (4, 74)
        assert s["visual"].shape == (4, 35)
        assert set(np.unique(s["label"])) <= {0, 1}
        assert s["emo_label"].shape == (4, 7)
        assert s["senti7_label"].max() < 7


def test_dailydialog_reader(tmp_path):
    """DailyDialog public format → token samples (the reference's reader is
    a stub, datas/text/dailydialog.py:12)."""
    from erc_tpu.data.dailydialog import build_vocab, dailydialog_token

    root = str(tmp_path)
    for split, dias in [
        ("train", [("hello there __eou__ hi __eou__", "0 4"),
                   ("how are you __eou__ fine thanks __eou__", "0 4")]),
        ("test", [("hello again __eou__ bye __eou__", "4 5")]),
    ]:
        sd = {"train": "train", "test": "test"}[split]
        os.makedirs(os.path.join(root, sd), exist_ok=True)
        with open(os.path.join(root, sd, f"dialogues_{sd}.txt"), "w") as f:
            f.write("\n".join(t for t, _ in dias) + "\n")
        with open(os.path.join(root, sd, f"dialogues_emotion_{sd}.txt"), "w") as f:
            f.write("\n".join(e for _, e in dias) + "\n")

    build_vocab.cache_clear()
    vocab = build_vocab(root, vocab_size=100)
    assert vocab["<pad>"] == 0 and vocab["<unk>"] == 1 and "hello" in vocab

    train = dailydialog_token(root, "train")
    assert len(train) == 2
    assert train[0]["label"] == [0, 4]
    assert train[0]["speakers"] == [0, 1]
    assert train[0]["tokens"][0] == [vocab["hello"], vocab["there"]]
    test = dailydialog_token(root, "test")
    # 'again'/'bye' not in train vocab? they are ('bye' only in test → UNK)
    assert test[0]["tokens"][1] == [1]  # "bye" → <unk>

    # registry resolution + helpful error when files are missing
    from erc_tpu.data.registry import pick_datas

    build_vocab.cache_clear()
    via_registry = pick_datas(root, "dailydialog-token-7", vocab_size=100)
    assert via_registry[0]["label"] == [0, 4]
    with pytest.raises(FileNotFoundError, match="synthetic-daily-token-7"):
        build_vocab.cache_clear()
        pick_datas(str(tmp_path / "nowhere"), "dailydialog-token-7")


def test_registry_covers_reference_keys():
    """Every active (non-commented) reference registry key resolves here,
    plus the deprecated-but-requested raw/ta/mmin rows (VERDICT r2 #5)."""
    from erc_tpu.data.registry import regist_data

    reference_active = [
        "iemocap-cogmen-6", "iemocap-cogmen-sbert-6", "iemocap-cogmen-robert-6",
        "iemocap-cogmen-tsn-6", "iemocap-cogmen-tsn-v+-6",
        "iemocap-cogmen-sbert-tsn-6", "iemocap-cogmen-robert-tsn-6",
        "iemocap-cogmen-sbert-tsn-v+-6", "iemocap-cogmen-robert-tsn-v+-6",
        "iemocap-cogmen-4", "iemocap-cogmen-sbert-4", "iemocap-cogmen-robert-4",
        "iemocap-cogmen-tsn-4", "iemocap-cogmen-tsnss-4",
        "iemocap-cogmen-tsn-v+-4", "iemocap-cogmen-tsnss-v+-4",
        "iemocap-cogmen-sbert-tsn-4", "iemocap-cogmen-robert-tsn-4",
        "iemocap-cogmen-sbert-tsn-v+-4", "iemocap-cogmen-robert-tsn-v+-4",
        "iemocap-cogmen-sbert-tsnss-4", "iemocap-cogmen-robert-tsnss-4",
        "iemocap-cogmen-sbert-tsnss-v+-4", "iemocap-cogmen-robert-tsnss-v+-4",
        "meld-mmgcn-7", "meld-mmgcn-sbert-7",
        "iemocap-cogmen-text-4", "iemocap-cogmen-text-6", "meld-mmgcn-text-7",
        "iemocap-cogmen-video-4", "iemocap-cogmen-video-6",
        "mosei-text-any-7", "mosei-interval-any-7", "mosei-cim-2",
        "mosei-emo-sbert-6", "mosei-sent-sbert-7", "mosei-sent-sbert-2",
        "mosei-multi-sbert-fbank-6", "mosei-emo-sbert-fbank-6",
        "mosei-emo-sbert-fbank-blc-6", "mosei-sent-sbert-fbank-7",
        "mosei-sent-sbert-fbank-2", "mosei-sent-sbert-fbank-+-2",
        "mosei-emo-sbert-is10-6", "mosei-sent-sbert-is10-7",
        "mosei-sent-sbert-is10-2", "mosei-sent-sbert-is10-+-2",
    ]
    deprecated_requested = [
        "iemocap-audio-raw-9", "iemocap-audio-4", "iemocap-audio-v1-4",
        "iemocap-audio-6", "iemocap-text-4", "iemocap-text-v1-4",
        "iemocap-text-6", "iemocap-ta-4", "iemocap-ta-v1-4", "iemocap-ta-6",
        "iemocap-mmin-4",
    ]
    missing = [k for k in reference_active + deprecated_requested if k not in regist_data]
    assert not missing, f"registry rows missing: {missing}"


def test_synthetic_names_dims_agree_with_grammar():
    """Every supported synthetic ERC name must give the same feature dims
    from the generator (data/synthetic._DIMS via the registry) and from the
    params grammar (models/base.py) — a mismatch surfaces as a deep flax
    shape error at apply time (round-3 burn-in finding)."""
    import pytest

    from erc_tpu.data.registry import pick_datas
    from erc_tpu.models.base import MMBaseParams

    for name in ("synthetic-cogmen-6", "synthetic-iemocap-4", "synthetic-meld-7"):
        p = MMBaseParams()
        p.dataset = name
        p.iparams()
        s = pick_datas("", name, split="train")[0]
        assert s["text"].shape[-1] == p.hidden_text, name
        assert s["audio"].shape[-1] == p.hidden_audio, name
        assert s["visual"].shape[-1] == p.hidden_visual, name

    with pytest.raises(ValueError, match="unrecognized synthetic"):
        pick_datas("", "synthetic-mmgcn-7", split="train")


def test_cli_checkdata(tmp_path, monkeypatch, capsys):
    """`python -m erc_tpu.cli checkdata` validates a feature-dump mount
    through the real reader stack: ok rows report split sizes + feature
    dims, absent dumps report the precise missing path, and the exit
    status distinguishes the two (the day-the-dumps-arrive diagnostic)."""
    from erc_tpu import cli

    data_root = tmp_path / "data"
    _mk_iemocap(str(data_root / "iemocap"), n_dial=6)
    monkeypatch.setenv("ERC_TPU_DATA_ROOT", str(data_root))

    # present dump: zero failures, row shows counts + dims
    assert cli._checkdata(["iemocap-cogmen-6"]) == 0
    out = capsys.readouterr().out
    assert "train: 2" in out and "test: 4" in out and "text=" in out

    # absent dump: both splits fail with the missing path named
    assert cli._checkdata(["meld-mmgcn-7"]) == 2
    out = capsys.readouterr().out
    assert "MISSING" in out and "MELD_features_raw.pkl" in out

    # unknown corpus: no root
    assert cli._checkdata(["nosuchcorpus-x-4"]) == 1
    out = capsys.readouterr().out
    assert "NO ROOT" in out

    # main() exit code: nonzero when a dataset is missing
    with pytest.raises(SystemExit):
        cli.main(["checkdata", "meld-mmgcn-7"])
