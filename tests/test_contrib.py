"""contrib toolkit + fusion modules + analyse/cli."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from erc_tpu import contrib
from erc_tpu.ops.fusion import MatchingAttention, MMGatedAttention, SimpleAttention


def test_ema_update():
    ema = {"w": jnp.ones(3)}
    par = {"w": jnp.zeros(3)}
    out = contrib.ema_update(ema, par, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


def test_sharpen_and_mixup():
    p = jnp.asarray([[0.5, 0.5], [0.9, 0.1]])
    s = np.asarray(contrib.sharpen(p, T=0.5))
    np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-6)
    assert s[1, 0] > 0.9  # sharpened toward the mode
    key = jax.random.PRNGKey(0)
    x = jnp.ones((4, 3))
    y = jax.nn.one_hot(jnp.arange(4) % 2, 2)
    xm, ym, lam = contrib.mixup(key, x, y)
    assert xm.shape == x.shape and float(lam) >= 0.5


def test_loss_zoo():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    labels = jnp.asarray([0, 1])
    assert float(contrib.ce_loss(logits, labels)) < 0.2
    soft = jax.nn.one_hot(labels, 2)
    np.testing.assert_allclose(
        float(contrib.ce_loss(logits, soft)), float(contrib.ce_loss(logits, labels)), rtol=1e-6
    )
    assert float(contrib.kl_loss(logits, logits)) == pytest.approx(0.0, abs=1e-6)
    assert float(contrib.minent_loss(logits)) > 0
    za = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    l_pos = contrib.contrastive_loss(za, za)
    l_rand = contrib.contrastive_loss(za, jax.random.normal(jax.random.PRNGKey(2), (8, 16)))
    assert float(l_pos) < float(l_rand)


def test_memory_bank():
    bank, ptr = contrib.MemoryBank.init(4, 2)
    bank, ptr = contrib.MemoryBank.push(bank, ptr, jnp.ones((3, 2)))
    assert int(ptr) == 3
    bank, ptr = contrib.MemoryBank.push(bank, ptr, 2 * jnp.ones((2, 2)))
    assert int(ptr) == 1
    np.testing.assert_allclose(np.asarray(bank[3]), 2.0)
    np.testing.assert_allclose(np.asarray(bank[0]), 2.0)


@pytest.mark.parametrize("att_type", ["dot", "general", "general2", "concat"])
def test_matching_attention_variants(att_type):
    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], jnp.float32)
    mod = MatchingAttention(8, 8, alpha_dim=6, att_type=att_type)
    variables = mod.init(jax.random.PRNGKey(0), M, x, mask)
    pooled, alpha = mod.apply(variables, M, x, mask)
    assert pooled.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(alpha).sum(-1), 1.0, rtol=1e-4)
    if att_type == "general2":
        assert float(np.asarray(alpha)[0, 3:].sum()) < 1e-6  # masked out


def test_mm_gated_attention_shapes():
    rng = np.random.default_rng(1)
    a, v, l = (jnp.asarray(rng.normal(size=(3, 10)).astype(np.float32)) for _ in range(3))
    mod = MMGatedAttention(10, 10)
    params = mod.init(jax.random.PRNGKey(0), a, v, l, "atv")["params"]
    out = mod.apply({"params": params}, a, v, l, "atv")
    assert out.shape == (3, 30)
    mod2 = MMGatedAttention(10, 10)
    p2 = mod2.init(jax.random.PRNGKey(0), a, v, l, "av")["params"]
    assert mod2.apply({"params": p2}, a, v, l, "av").shape == (3, 10)


def test_analyse_collect(tmp_path):
    import json
    import os

    root = str(tmp_path)
    tdir = os.path.join(root, "experiment", "expA", "t1")
    os.makedirs(tdir)
    with open(os.path.join(tdir, "metrics.json"), "w") as f:
        json.dump({"f1": 0.8, "acc": 0.81}, f)
    from erc_tpu import analyse

    rows = analyse.collect_metrics(root=root)
    assert rows and rows[0]["f1"] == 0.8
    table = analyse.format_table(rows)
    assert "expA" in table and "0.8000" in table


def test_load_tb_events(tmp_path):
    """TB-event parsing (reference lumo/vis/parser_tb.py equivalent)."""
    from torch.utils.tensorboard import SummaryWriter

    from erc_tpu import analyse

    w = SummaryWriter(str(tmp_path))
    for step, v in enumerate([0.5, 0.25, 0.125]):
        w.add_scalar("train/Lall", v, step)
    w.flush()
    w.close()
    events = analyse.load_tb_events(str(tmp_path))
    assert "train/Lall" in events
    steps, vals = zip(*events["train/Lall"])
    assert steps == (0, 1, 2)
    assert abs(vals[2] - 0.125) < 1e-6


def test_cutmix_box_and_label_fraction(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from erc_tpu import contrib

    B, H, W, C = 4, 16, 16, 3
    x = jnp.stack([jnp.full((H, W, C), float(i)) for i in range(B)])
    y = jax.nn.one_hot(jnp.arange(B) % 2, 2)
    xm, ym, lam = jax.jit(lambda k: contrib.cutmix(k, x, y))(jax.random.PRNGKey(3))
    xm, ym = np.asarray(xm), np.asarray(ym)
    # label mix fraction equals the realized pixel fraction from the box
    for i in range(B):
        frac_own = (xm[i] == float(i)).mean()
        np.testing.assert_allclose(frac_own, float(lam), atol=1/(H*W) + 1e-6)
    np.testing.assert_allclose(ym.sum(-1), 1.0, atol=1e-6)
