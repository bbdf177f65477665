"""CIFAR/STL image backbones: shapes, param counts vs the reference torch
models, and a train-mode grad smoke (legacy semi-supervised track)."""

import jax
import jax.numpy as jnp
import numpy as np

from erc_tpu.models.image_backbones import (
    ResNetCifar, WideResnet, resnet18, resnet50, wideresnet_28_2,
)


def _n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_wideresnet_shapes_and_params():
    m = wideresnet_28_2()
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert feats.shape == (2, 64 * 2)
    # torch WRN-28-2 backbone (no fc) is ~1.467M conv+bn params
    n = _n_params(v["params"])
    assert 1_400_000 < n < 1_500_000, n


def test_resnet18_50_shapes():
    x = jnp.zeros((2, 32, 32, 3))
    for mk, dim, lo, hi in (
        (resnet18, 512, 11_000_000, 11_400_000),
        (resnet50, 2048, 23_000_000, 24_000_000),
    ):
        m = mk()
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, dim)
        n = _n_params(v["params"])
        assert lo < n < hi, (mk.__name__, n)


def test_wideresnet_train_mode_grads_and_batchstats():
    m = WideResnet(k=2, n=10, drop_rate=0.1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        feats, upd = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return (feats ** 2).mean(), upd

    (l, upd), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
    assert np.isfinite(float(l))
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert gn > 0
    # running stats actually update in train mode
    changed = jax.tree_util.tree_map(
        lambda a, b: bool((np.asarray(a) != np.asarray(b)).any()),
        v["batch_stats"], upd["batch_stats"],
    )
    assert any(jax.tree_util.tree_leaves(changed))
