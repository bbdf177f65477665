"""Host-side corpus walkers on synthetic directory trees: raw IEMOCAP
(labels/transcripts/wavs), video transcript↔avi alignment + dialogue
extraction loop, MOSEI csd adaptation."""

import os

import numpy as np
import pytest


# ------------------------------------------------------------- IEMOCAP raw
def _mk_iemocap_tree(root):
    """Two sessions, one dialogue each, two utterances per dialogue."""
    spec = {
        "Session1": {
            "dia": "Ses01F_impro01",
            "utts": [
                ("Ses01F_impro01_F000", "Excuse me.", 6.29, 8.23,
                 ["Neutral", "Neutral", "Happiness"]),
                ("Ses01F_impro01_M001", "Yeah.", 9.1, 10.5,
                 ["Anger", "Frustration", "Anger"]),
            ],
        },
        "Session5": {
            "dia": "Ses05M_script01_1",
            "utts": [
                ("Ses05M_script01_1_M000", "I got it.", 1.0, 2.5,
                 ["Excited", "Excited"]),
                ("Ses05M_script01_1_F001", "Did you?", 3.0, 4.2,
                 ["Surprise", "Happiness", "Happiness"]),
            ],
        },
    }
    for sess, d in spec.items():
        cat = os.path.join(root, sess, "dialog/EmoEvaluation/Categorical")
        tra = os.path.join(root, sess, "dialog/transcriptions")
        wav = os.path.join(root, sess, "sentences/wav", d["dia"])
        for p in (cat, tra, wav):
            os.makedirs(p, exist_ok=True)
        with open(os.path.join(cat, d["dia"] + "_cat.txt"), "w") as f:
            for uid, _, _, _, votes in d["utts"]:
                for v in votes:
                    f.write(f"{uid} :{v}; ()\n")
        with open(os.path.join(tra, d["dia"] + ".txt"), "w") as f:
            for uid, sent, l, r, _ in d["utts"]:
                f.write(f"{uid} [{l:.4f}-{r:.4f}]: {sent}\n")
        for uid, *_ in d["utts"]:
            open(os.path.join(wav, uid + ".wav"), "wb").close()
    return spec


def test_iemocap_raw_walk(tmp_path):
    from erc_tpu.data import iemocap_raw as ir

    root = str(tmp_path)
    _mk_iemocap_tree(root)

    xs, ys = ir.iemocap_text(root, "train")
    assert xs == ["Excuse me.", "Yeah."]
    assert ys == ["Neutral", "Anger"]  # majority vote over annotators

    # Session5 only; records sort by utterance id (F001 < M000)
    xs5, ys5 = ir.iemocap_text(root, "test")
    assert ys5 == ["Happiness", "Excited"]

    ws, wys = ir.iemocap_audio(root, "train")
    assert all(w.endswith(".wav") and os.path.exists(w) for w in ws)
    assert wys == ["Neutral", "Anger"]

    wavs, sents, labels = ir.iemocap_text_audio(root, "test")
    assert sents == ["Did you?", "I got it."]

    # class subsetting: 6-way keeps Excited; 4-way drops it
    xs6, ys6 = ir.iemocap_text_subset("6")(root, "test")
    assert ys6 == [0, 4]
    xs4, ys4 = ir.iemocap_text_subset("4")(root, "test")
    assert xs4 == ["Did you?"] and ys4 == [0]
    # 4.1 folds Excited into Happiness
    _, y41 = ir.iemocap_text_subset("4.1")(root, "test")
    assert y41 == [0, 0]

    recs = ir.walk_utterances(root, "train")
    assert recs[0]["dialogue"] == "Ses01F_impro01"
    assert recs[0]["t_start"] == pytest.approx(6.29, abs=1e-3)


# --------------------------------------------------- video walk + alignment
def _mk_release_tree(root, dia="Ses01F_impro01"):
    tra = os.path.join(root, "Session1/dialog/transcriptions")
    avi = os.path.join(root, "Session1/dialog/avi/DivX")
    os.makedirs(tra), os.makedirs(avi)
    rows = [
        (f"{dia}_F000", 0.5, 1.0, "Excuse me."),
        (f"{dia}_M001", 1.2, 2.0, "Dropped by the dump."),  # not in the pkl
        (f"{dia}_F002", 2.1, 3.0, "Yeah."),
    ]
    with open(os.path.join(tra, dia + ".txt"), "w") as f:
        for uid, l, r, s in rows:
            f.write(f"{uid} [{l:.4f}-{r:.4f}]: {s}\n")
    open(os.path.join(avi, dia + ".avi"), "wb").close()
    return rows


def test_video_alignment_skips_dropped_rows(tmp_path):
    from erc_tpu.preprocess.video_walk import video_alignment

    dia = "Ses01F_impro01"
    _mk_release_tree(str(tmp_path), dia)
    clips = video_alignment(
        str(tmp_path),
        video_sentence={dia: ["Excuse me.", "Yeah."]},
        video_speakers={dia: [[0, 1], [1, 0]]},
        video_labels={dia: [2, 0]},
    )
    assert dia in clips
    stamps = clips[dia]["timestamp"]
    assert [s[0] for s in stamps] == [f"{dia}_F000", f"{dia}_F002"]
    assert stamps[1][1] == pytest.approx(2.1)
    assert clips[dia]["fn"].endswith(".avi")


def test_extract_dialogue_features_crop_and_fallback(tmp_path):
    from erc_tpu.preprocess.video_walk import extract_dialogue_features

    T, H, W = 40, 480, 720
    frames = np.zeros((T, H, W, 3), np.uint8)
    frames[:, :, : W // 2] = 1  # left half=1, right half=2
    frames[:, :, W // 2 :] = 2
    fps = 10.0

    seen = []

    def fake_extract(arr):
        seen.append(arr)
        return np.full(5, float(arr[0, 0, 0, 0]))

    clips = {
        "Ses01F_d": {  # 'F' in filename → f_left=True
            "fn": "/x/Ses01F_d.avi",
            "timestamp": [["u0", 0.5, 1.0], ["u1", 2.0, 3.0]],
            "speaker": [[1, 0], [0, 1]],  # gender flags 1 → left, 0 → right
        },
        "bad": {"fn": "/nonexistent.avi", "timestamp": [], "speaker": []},
    }
    out = extract_dialogue_features(
        clips, fake_extract, read_video=lambda fn: (frames, fps)
        if "Ses01F" in fn else (_ for _ in ()).throw(IOError("no")),
    )
    # utterance 0: gender=1 == f_left → LEFT half (value 1); utterance 1 → right
    assert out["Ses01F_d"].shape == (2, 5)
    assert out["Ses01F_d"][0, 0] == 1.0 and out["Ses01F_d"][1, 0] == 2.0
    # crop: rows 120:365, half width; frame span = round(t*fps)
    assert seen[0].shape == (round(1.0 * fps) - round(0.5 * fps), 245, W // 2, 3)
    # failure → [] fallback, loop continues
    assert out["bad"] == []


# -------------------------------------------------------------------- MOSEI
def test_mosei_adapt(tmp_path):
    from erc_tpu.preprocess.mosei import adapt_mosei

    rng = np.random.default_rng(0)

    def win(d=4, empty=False):
        w = np.zeros((5, d), np.float32)
        if not empty:
            w[1] = rng.normal(size=d)
            w[3] = rng.normal(size=d)
        return w

    ids = {
        "train": [["vidA", "0.0", "2.0"], ["vidA", "2.0", "4.0"]],
        "test": [["vidB", "0.0", "0.3"]],  # < 0.5s → invalid_time
        "valid": [["vidC", "1.0", "3.0"]],
    }
    align = {}
    for split, sid in ids.items():
        n = len(sid)
        align[split] = {
            "id": np.array(sid, dtype=object),
            "vision": np.stack([win(3) for _ in range(n)]),
            "audio": np.stack([win(4, empty=(split == "test")) for _ in range(n)]),
            "text": np.stack([win(6) for _ in range(n)]),
        }
    label_map = {
        ("vidA", 0.0, 2.0): np.arange(7, dtype=np.float32),
        ("vidA", 2.0, 4.0): np.ones(7, np.float32),
        ("vidB", 0.0, 0.3): np.zeros(7, np.float32),
        ("vidC", 1.0, 3.0): np.full(7, 2.0, np.float32),
    }
    ds = adapt_mosei(align, label_map)
    (train_id, test_id, valid_id, interval, emo, audio, glove, vision,
     sentence, e_vis, e_aud, e_txt, invalid) = ds
    assert train_id == ["vidA"] and test_id == ["vidB"] and valid_id == ["vidC"]
    assert vision["vidA"].shape == (2, 3) and emo["vidA"].shape == (2, 7)
    # mean over non-zero rows only
    w = align["train"]["vision"][0]
    np.testing.assert_allclose(vision["vidA"][0], w[[1, 3]].mean(0), rtol=1e-6)
    # empty audio (test split) → row-0 fallback + diagnostic
    assert ["vidB", 0.0, 0.3] in e_aud
    np.testing.assert_allclose(audio["vidB"][0], 0.0)
    # short utterance recorded but kept
    assert ["vidB", 0.0, 0.3] in invalid and len(interval["vidB"]) == 1
    # no transcripts → sentence falls back to the audio dict
    assert sentence is audio
    np.testing.assert_allclose(interval["vidA"], [[0.0, 2.0], [2.0, 4.0]])


# ---------------------------------------------------------------- openSMILE
def test_opensmile_segment_parse_collect(tmp_path):
    from erc_tpu.preprocess import opensmile as osm

    # synthetic 100Hz wav with recognizable ramp
    rate = 100
    sig = np.arange(400, dtype=np.int16)
    wav_root = tmp_path / "wavs"
    wav_root.mkdir()
    osm.write_wav(str(wav_root / "vidA.wav"), rate, sig)

    segs = osm.segment_wavs(
        {"vidA": np.array([[0.0, 1.0], [1.5, 3.0]], np.float32),
         "missing": np.array([[0.0, 1.0]], np.float32)},
        str(wav_root), str(tmp_path / "segs"),
    )
    assert [os.path.basename(s) for s in segs] == ["vidA_00.wav", "vidA_01.wav"]
    r0, s0 = osm.read_wav(segs[0])
    np.testing.assert_array_equal(s0, sig[0:100])
    _, s1 = osm.read_wav(segs[1])
    np.testing.assert_array_equal(s1, sig[150:300])

    # csv parse: openSMILE layout (header, then data row, trailing newline)
    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    for key, i, vals in (("vidA", 0, "1.5;2.5"), ("vidA", 1, "3.0;4.0"), ("vidB", 0, "9.0;8.0")):
        with open(csv_dir / f"{key}_{i:02d}.wav.csv", "w") as f:
            f.write("name;f1;f2\n" + f"'unknown';{vals}\n")
    feats = osm.collect_features(str(csv_dir))
    assert set(feats) == {"vidA", "vidB"}
    np.testing.assert_allclose(feats["vidA"], [[0, 1.5, 2.5], [0, 3.0, 4.0]])
    assert feats["vidB"].shape == (1, 3)
