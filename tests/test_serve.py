"""Inference engine: programmatic predict + HTTP round-trip."""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import os

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path_factory.mktemp("exp"))
    from erc_tpu.serve import InferenceEngine

    return InferenceEngine.from_module(
        "cogmen", dataset="synthetic-cogmen-6", max_seq_len=16, heartbeat=False
    )


def _dialogues(n=3):
    from erc_tpu.data.synthetic import synthetic_erc

    return synthetic_erc("iemocap-cogmen", 6, n_train=n, min_len=4, max_len=12)


def test_predict_shapes(engine):
    dialogues = _dialogues(3)
    res = engine.predict(dialogues)
    assert len(res) == 3
    for d, r in zip(dialogues, res):
        assert len(r["pred"]) == len(d["text"])
        assert len(r["probs"][0]) == 6
        assert all(l in ("hap", "sad", "neu", "ang", "exc", "fru") for l in r["labels"])


def test_http_round_trip(engine):
    from erc_tpu.serve import _serve_http

    port = 8431
    t = threading.Thread(
        target=_serve_http, args=(engine, "127.0.0.1", port), daemon=True
    )
    t.start()
    import time

    time.sleep(0.5)
    d = _dialogues(1)[0]
    payload = {
        "dialogues": [
            {
                "text": np.asarray(d["text"]).tolist(),
                "audio": np.asarray(d["audio"]).tolist(),
                "visual": np.asarray(d["visual"]).tolist(),
                "speakers": d["speakers"],
            }
        ]
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        out = json.loads(resp.read())
    assert len(out["results"][0]["pred"]) == len(d["text"])
