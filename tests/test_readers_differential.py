"""Differential reader parity: the REFERENCE's own loader code
(`/root/reference/mmdatasets/datas/mm/*.py`, imported with lumo stubbed)
and erc_tpu's readers run on the same synthetic fixture; sample dicts must
be elementwise-equal.  A shared misreading of the dump layout cannot pass
this — the reference loader is the oracle, not a hand-built replica.

Known, documented divergences (asserted explicitly, not papered over):
- visual='tsnss': the reference's `'tsn' in visual` check shadows its own
  `elif 'tsnss'` branch (iemocap_feature.py:378-381 — dead code), so the
  reference silently loads tsn_vfeat.pkl; erc_tpu loads the intended
  tsn_vfeat_ss.pkl (PARITY.md).
"""

import importlib.util
import os
import pickle
import sys
import types

import numpy as np
import pytest

REF_MM = "/root/reference/mmdatasets/datas/mm"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MM), reason="reference tree not present"
)


def _stub_lumo(tmp):
    """Install import stubs for the reference's lumo dependencies."""
    if "lumo" in sys.modules:
        return

    def load_pkl(fn):
        with open(fn, "rb") as f:
            return pickle.load(f)

    lumo = types.ModuleType("lumo")
    proc = types.ModuleType("lumo.proc")
    path = types.ModuleType("lumo.proc.path")
    path.cache_dir = lambda *a, **k: str(tmp)
    utils = types.ModuleType("lumo.utils")
    sio = types.ModuleType("lumo.utils.safe_io")
    sio.load_pkl = load_pkl
    lumo.proc, proc.path, lumo.utils, utils.safe_io = proc, path, utils, sio
    sys.modules.update(
        {
            "lumo": lumo,
            "lumo.proc": proc,
            "lumo.proc.path": path,
            "lumo.utils": utils,
            "lumo.utils.safe_io": sio,
        }
    )


def _import_ref(name, tmp):
    _stub_lumo(tmp)
    modname = f"_ref_{name}"
    if modname in sys.modules:
        return sys.modules[modname]
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REF_MM, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules[modname] = mod
    return mod


def _assert_samples_equal(ref_samples, got_samples, skip_keys=()):
    assert len(ref_samples) == len(got_samples)
    for r, g in zip(ref_samples, got_samples):
        keys = set(r) - set(skip_keys)
        assert keys <= set(g), f"missing keys: {keys - set(g)}"
        for k in keys:
            rv, gv = r[k], g[k]
            if isinstance(rv, np.ndarray) or isinstance(gv, np.ndarray):
                ra, ga = np.asarray(rv), np.asarray(gv)
                assert ra.shape == ga.shape, f"{k}: {ra.shape} vs {ga.shape}"
                assert ra.dtype == ga.dtype, f"{k}: {ra.dtype} vs {ga.dtype}"
                np.testing.assert_array_equal(ra, ga, err_msg=f"key {k}")
            else:
                assert rv == gv, f"key {k}: {rv!r} vs {gv!r}"


# ------------------------------------------------------------------ fixtures
def _mk_iemocap_fixture(root, subdir="cogmen/iemocap", pkl_name="IEMOCAP_features.pkl",
                        n_dial=4, n_cls=6, seed=0):
    rng = np.random.default_rng(seed)
    ids, spk, lab, txt, aud, vis, sent = {}, {}, {}, {}, {}, {}, {}
    keys = [f"Ses0{i}F" for i in range(n_dial)]
    for k in keys:
        L = int(rng.integers(3, 7))
        ids[k] = [f"{k}_u{j}" for j in range(L)]
        spk[k] = [("M" if int(b) else "F") for b in rng.integers(0, 2, L)]
        lab[k] = rng.integers(0, n_cls, L).tolist()
        txt[k] = rng.normal(size=(L, 100)).astype(np.float32)
        aud[k] = rng.normal(size=(L, 100)).astype(np.float32)
        vis[k] = rng.normal(size=(L, 512)).astype(np.float32)
        sent[k] = [f"utt {k} {j}" for j in range(L)]
    train_ids, test_ids = keys[:3], keys[3:]
    d = os.path.join(root, subdir)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, pkl_name), "wb") as f:
        pickle.dump((ids, spk, lab, txt, aud, vis, sent, train_ids, test_ids), f)
    # swap maps
    for name, dim in [("sbert_map.pkl", 768), ("robert_map.pkl", 1024),
                      ("tsn_vfeat.pkl", 2048), ("tsn_vfeat_ss.pkl", 2048),
                      ("x3d_vfeat.pkl", 192)]:
        m = {k: rng.normal(size=(len(sent[k]), dim)).astype(np.float32) for k in keys}
        with open(os.path.join(d, name), "wb") as f:
            pickle.dump(m, f)
    return keys


def _mk_meld_fixture(root, seed=1):
    rng = np.random.default_rng(seed)
    keys = [f"d{i}" for i in range(4)]
    ids = {k: [f"{k}_{j}" for j in range(5)] for k in keys}
    spk = {k: [list(np.eye(9, dtype=int)[j % 9]) for j in range(5)] for k in keys}
    lab = {k: rng.integers(0, 7, 5).tolist() for k in keys}
    mk = lambda D: {k: rng.normal(size=(5, D)).astype(np.float64) for k in keys}
    txt, aud, vis = mk(600), mk(300), mk(342)
    sent = {k: [f"s {j}" for j in range(5)] for k in keys}
    d = os.path.join(root, "MMGCN")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "MELD_features_raw.pkl"), "wb") as f:
        pickle.dump((ids, spk, lab, txt, aud, vis, sent, keys[:3], keys[3:], None), f)
    sb = {k: rng.normal(size=(5, 768)).astype(np.float64) for k in keys}
    with open(os.path.join(d, "sbert_map.pkl"), "wb") as f:
        pickle.dump(sb, f)


def _mk_mosei_fixture(root, seed=2):
    rng = np.random.default_rng(seed)
    keys = [f"v{i}" for i in range(6)]
    emo, aud, txt, vis, sent, interval = {}, {}, {}, {}, {}, {}
    for j, k in enumerate(keys):
        L = int(rng.integers(2, 5))
        lab = np.zeros((L, 8), np.float32)
        # sentiment column spans negative/zero/positive; emo columns sparse
        lab[:, 0] = rng.uniform(-3, 3, L).round(1)
        if j == 0:
            lab[:, 0] = 0.0  # all-zero sentiment dialogue (sent_2+ drop path)
        lab[np.arange(L), 1 + rng.integers(0, 6, L)] = rng.integers(0, 2, L)
        emo[k] = lab
        aud[k] = rng.normal(size=(L, 80)).astype(np.float32)
        txt[k] = rng.normal(size=(L, 300)).astype(np.float32)
        vis[k] = rng.normal(size=(L, 35)).astype(np.float32)
        sent[k] = [f"m {k} {i}" for i in range(L)]
        interval[k] = rng.uniform(0, 10, size=(L, 2)).astype(np.float32)
    train_id, test_id, valid_id = keys[:3], keys[3:5], keys[5:]
    pkl = (train_id, test_id, valid_id, interval, emo, aud, txt, vis, sent,
           [], [], [], [])
    with open(os.path.join(root, "MOSEI.adpated.pkl"), "wb") as f:
        pickle.dump(pkl, f)
    sb = {k: rng.normal(size=(len(sent[k]), 768)).astype(np.float32) for k in keys}
    with open(os.path.join(root, "sbert_map.pkl"), "wb") as f:
        pickle.dump(sb, f)
    fb = {k: rng.normal(size=(len(sent[k]), 480)).astype(np.float32) for k in keys}
    with open(os.path.join(root, "fbank480.pkl"), "wb") as f:
        pickle.dump(fb, f)
    is10 = {k: rng.normal(size=(len(sent[k]), 1582)).astype(np.float32) for k in keys}
    with open(os.path.join(root, "MOSEI.is10.pkl"), "wb") as f:
        pickle.dump(is10, f)


# --------------------------------------------------------------------- tests
def test_iemocap_cogmen_differential(tmp_path):
    from erc_tpu.data import readers

    root = str(tmp_path)
    _mk_iemocap_fixture(root)
    ref = _import_ref("iemocap_feature", tmp_path)

    for split in ("train", "test"):
        for text in ("", "sbert", "robert"):
            for visual in ("", "tsn", "tsn+", "x3d"):
                r = ref.iemocap_cogmen_6(root, split, text=text, visual=visual)
                g = readers.iemocap_cogmen_6(root, split, text=text, visual=visual)
                _assert_samples_equal(r, g)


def test_iemocap_cogmen_4_differential(tmp_path):
    from erc_tpu.data import readers

    root = str(tmp_path)
    _mk_iemocap_fixture(root, subdir="cogmen/iemocap_4",
                        pkl_name="IEMOCAP_features_4.pkl", n_cls=4, seed=7)
    ref = _import_ref("iemocap_feature", tmp_path)
    for split in ("train", "test"):
        r = ref.iemocap_cogmen_4(root, split, text="sbert", visual="tsn+")
        g = readers.iemocap_cogmen_4(root, split, text="sbert", visual="tsn+")
        # the reference comments out 'ids' in the 4-class variant
        _assert_samples_equal(r, g)


def test_iemocap_tsnss_documented_divergence(tmp_path):
    """The reference's tsnss branch is dead ('tsn' in 'tsnss' — the first
    branch wins, iemocap_feature.py:378-381); erc_tpu loads the intended
    ss features.  Assert BOTH behaviors so a silent change on either side
    is caught."""
    from erc_tpu.data import readers

    root = str(tmp_path)
    _mk_iemocap_fixture(root)
    ref = _import_ref("iemocap_feature", tmp_path)
    with open(os.path.join(root, "cogmen/iemocap/tsn_vfeat.pkl"), "rb") as f:
        tsn = pickle.load(f)
    with open(os.path.join(root, "cogmen/iemocap/tsn_vfeat_ss.pkl"), "rb") as f:
        tsn_ss = pickle.load(f)

    r = ref.iemocap_cogmen_6(root, "train", visual="tsnss")
    g = readers.iemocap_cogmen_6(root, "train", visual="tsnss")
    k0 = ref.trainsplit_cogmen(root)[0]
    np.testing.assert_array_equal(r[0]["visual"], tsn[k0])      # reference bug
    np.testing.assert_array_equal(g[0]["visual"], tsn_ss[k0])   # intended


def test_meld_differential(tmp_path):
    from erc_tpu.data import readers

    root = str(tmp_path)
    _mk_meld_fixture(root)
    ref = _import_ref("meld_feature", tmp_path)
    for split in ("train", "test"):
        for text in (None, "sbert"):
            r = ref.meld_mmgcn_7(root, split, text=text)
            g = readers.meld_mmgcn_7(root, split, text=text)
            _assert_samples_equal(r, g)
    # sentence extraction view
    assert ref.meld_mmgcn_text(root) == readers.meld_mmgcn_text(root)


def test_mosei_adapted_differential(tmp_path, capsys):
    from erc_tpu.data import readers

    root = str(tmp_path)
    _mk_mosei_fixture(root)
    ref = _import_ref("mosei_feature", tmp_path)
    for split in ("train", "test", "val"):
        for label_type in ("emo", "multi", "sent_2", "sent_2+", "sent_7"):
            for audio in (None, "fbank", "is10"):
                r = ref.mosei_adapted(root, split, audio=audio, label_type=label_type)
                g = readers.mosei_adapted(root, split, audio=audio, label_type=label_type)
                _assert_samples_equal(
                    r, g, skip_keys=("speakers",)
                )
                # reference uses [0] / [[0]] inconsistently across loaders;
                # erc_tpu normalizes to one one-hot row per dialogue
                assert all(len(np.shape(s["speakers"])) == 2 for s in g)
    r = ref.mosei_adapted(root, "train", text="sbert")
    g = readers.mosei_adapted(root, "train", text="sbert")
    _assert_samples_equal(r, g, skip_keys=("speakers",))


def test_mosei_sentiment_bins_differential(tmp_path):
    """cmumosei_7/cmumosei_2 over the full real-line including boundary
    values — binning drift would silently relabel the corpus."""
    ref = _import_ref("mosei_feature", tmp_path)
    from erc_tpu.data import readers

    grid = np.concatenate(
        [np.linspace(-3, 3, 241), np.array([-2.0, -1.0, 0.0, 1.0, 2.0])]
    )
    for a in grid:
        assert ref.cmumosei_7(a) == readers.cmumosei_7(a), a
        assert ref.cmumosei_2(a) == readers.cmumosei_2(a), a
    # multi-hot emotion label incl. the empty-row → class-6 fallback
    rng = np.random.default_rng(3)
    emo = (rng.uniform(size=(10, 6)) > 0.6).astype(np.float32)
    emo[3] = 0
    np.testing.assert_array_equal(
        ref.create_emotion_label(emo), readers.create_emotion_label(emo)
    )


def test_mmin_h5_differential(tmp_path):
    """MMIN2021 h5 + fold-npy path: reference iemocap_mmin_4
    (iemocap_feature.py:461-487) vs erc_tpu data/mmin.py on one fixture."""
    import h5py

    from erc_tpu.data import mmin

    root = str(tmp_path)
    base = os.path.join(root, "MMIN2021/IEMOCAP_features_2021")
    rng = np.random.default_rng(5)
    names = [f"Ses01F_impro0{i}_M00{i}" for i in range(6)]
    for sub, shape in [("V/denseface.h5", (50, 342)), ("A/comparE.h5", (40, 130)),
                       ("L/bert_large.h5", (22, 1024))]:
        os.makedirs(os.path.join(base, os.path.dirname(sub)), exist_ok=True)
        with h5py.File(os.path.join(base, sub), "w") as f:
            for n in names:
                f[n] = rng.normal(size=shape).astype(np.float32)
    tdir = os.path.join(base, "target", "1")
    os.makedirs(tdir, exist_ok=True)
    for tag, sel in [("trn", names[:4]), ("val", names[4:5]), ("tst", names[5:])]:
        onehot = np.eye(4, dtype=np.float32)[rng.integers(0, 4, len(sel))]
        np.save(os.path.join(tdir, f"{tag}_label.npy"), onehot)
        np.save(
            os.path.join(tdir, f"{tag}_int2name.npy"),
            np.array([[n.encode()] for n in sel]),
        )

    ref = _import_ref("iemocap_feature", tmp_path)
    for split in ("train", "val", "test"):
        r = ref.iemocap_mmin_4(root, split)
        g = mmin.iemocap_mmin_4(root, split)
        _assert_samples_equal(r, g)
