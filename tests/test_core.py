"""Core runtime tests: params constraints/CLI, meter/record, interp, seed, mesh."""

import json
import os

import numpy as np
import pytest

from erc_tpu.core.params import BaseParams, Params
from erc_tpu.core.meter import Meter, Record
from erc_tpu.core import interp
from erc_tpu.core.seed import RngPool
from erc_tpu.core.metrics_db import BestMetrics


class _P(BaseParams):
    def __init__(self):
        super().__init__()
        self.seed = 1
        self.modality = self.choice("atv", "av", "at", "t")
        self.lr = self.arange(0.1, 0.0, 1.0)
        self.train.batch_size = 32
        self.dataset = "iemocap-cogmen-6"


def test_params_defaults_and_choice():
    p = _P()
    assert p.modality == "atv"
    assert p.train.batch_size == 32
    with pytest.raises(ValueError):
        p.modality = "x"
    p.modality = "av"
    assert p.modality == "av"
    with pytest.raises(ValueError):
        p.lr = 2.0


def test_params_cli_dotted_overrides():
    p = _P()
    p.from_args(["--train.batch_size=8", "--seed", "7", "--debug", "--modality=at"])
    assert p.train.batch_size == 8
    assert p.seed == 7
    assert p.get("debug") is True
    assert p.modality == "at"


def test_params_roundtrip_and_hash(tmp_path):
    p = _P()
    h0 = p.hash()
    path = str(tmp_path / "p.json")
    p.to_json(path)
    q = _P()
    q.from_json_file(path)
    assert q.hash() == h0
    q.seed = 99
    assert q.hash() != h0


def test_params_get_missing_default():
    p = _P()
    assert p.get("nonexistent", 42) == 42
    assert p.get("seed", 42) == 1


def test_meter_record_aggregation():
    rec = Record()
    for i in range(4):
        m = Meter()
        m.mean.loss = float(i)  # 0,1,2,3 -> mean 1.5
        m.sum.acc = 2
        m.last.step = i
        m.max.peak = float(i % 3)
        rec.record(m)
    agg = rec.agg()
    assert agg["loss"] == pytest.approx(1.5)
    assert agg["acc"] == 8
    assert agg["step"] == 3
    assert agg["peak"] == 2.0


def test_meter_jax_values():
    import jax.numpy as jnp

    m = Meter()
    m.Lall = jnp.float32(2.5)
    d = m.todict()
    assert d["Lall"] == pytest.approx(2.5)


def test_interp_curves():
    lin = interp.Linear(0.0, 1.0, 0, 10)
    assert lin(0) == 0.0
    assert lin(5) == pytest.approx(0.5)
    assert lin(20) == 1.0
    cos = interp.Cos(1.0, 0.0, 0, 100)
    assert cos(0) == pytest.approx(1.0)
    assert cos(100) == pytest.approx(0.0)
    assert 0.4 < cos(50) < 0.6
    pd = interp.PowerDecay(1.0, 0.5, 10)
    assert pd(10) == pytest.approx(0.5)


def test_rng_pool_determinism():
    a, b = RngPool(7), RngPool(7)
    assert np.array_equal(a.key("dropout", 3), b.key("dropout", 3))
    assert not np.array_equal(a.key("dropout", 3), a.key("dropout", 4))
    assert not np.array_equal(a.key("dropout"), a.key("init"))
    r1 = a.numpy_rng("shuffle", 0).permutation(10)
    r2 = b.numpy_rng("shuffle", 0).permutation(10)
    assert np.array_equal(r1, r2)


def test_best_metrics_cas(tmp_path):
    db = BestMetrics(str(tmp_path / "m.json"))
    db.update_metric("f1", 0.5)
    db.update_metric("f1", 0.4)
    assert db.todict()["f1"] == 0.5
    out = db.update_metric_pair("f1", 0.7, "cls_f1", [0.1, 0.2])
    assert out["f1"] == 0.7 and out["cls_f1"] == [0.1, 0.2]
    db.update_metric_pair("f1", 0.6, "cls_f1", [0.9])
    assert db.todict()["cls_f1"] == [0.1, 0.2]
    db.flush()
    db2 = BestMetrics(str(tmp_path / "m.json"))
    assert db2.todict()["f1"] == 0.7


def test_mesh_sharding():
    import jax
    from erc_tpu.parallel.mesh import make_mesh, shard_batch, MeshSpec

    assert len(jax.devices()) == 8
    mesh = make_mesh(MeshSpec(data=8, model=1))
    batch = {"x": np.ones((16, 4), np.float32), "y": np.arange(16), "z": None}
    placed = shard_batch(batch, mesh)
    assert placed["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert placed["z"] is None
    np.testing.assert_array_equal(np.asarray(placed["y"]), np.arange(16))


def test_debug_flag_shrinks_batches():
    from erc_tpu.models.base import MMBaseParams

    p = MMBaseParams()
    p.dataset = "iemocap-cogmen-6"
    p.from_args(["--debug"])
    p.iparams()
    assert p.train.batch_size == 2 and p.test.batch_size == 2


def test_mmgcn_reimplement_lr():
    from erc_tpu.models.mmgcn import MMGCNParams

    p = MMGCNParams()
    p.dataset = "meld-mmgcn-7"
    p.reimplement = True
    p.iparams()
    assert abs(p.optim.lr - 0.0001) < 1e-12 and p.optim.weight_decay == 0
    assert p.n_speakers == 9 and p.hidden_text == 600
