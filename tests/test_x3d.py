"""X3D backbone: shapes, SE gating, and state-dict port round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from erc_tpu.preprocess.x3d import X3D, port_torch_x3d, _round_repeats, _round_width


def _tiny():
    return X3D(gamma_w=0.5, gamma_b=2.0, gamma_d=0.2, base_channels=16,
               stage_blocks=(1, 1, 1, 1))


def test_x3d_expansion_math():
    # X3D-M: stages [1,2,5,3] × γ_d=2.2 → [3,5,11,7]; feat 24·8·2.25 = 432
    m = X3D()
    assert [_round_repeats(b, m.gamma_d) for b in m.stage_blocks] == [3, 5, 11, 7]
    assert m.feat_dim == 432
    assert _round_width(24, 1.0) == 24


def test_x3d_forward_shapes():
    m = _tiny()
    x = jnp.zeros((1, 2, 16, 16, 3))
    variables = jax.jit(lambda r, xx: m.init(r, xx, train=False))(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, m.feat_dim)
    assert np.isfinite(np.asarray(out)).all()


def _flax_to_torch_sd(variables, model):
    """Inverse of port_torch_x3d: build an mmaction-named state_dict."""
    params, stats = variables["params"], variables["batch_stats"]
    sd = {}

    def conv(src_name, dst):
        sd["backbone." + dst + ".weight"] = np.asarray(src_name["kernel"]).transpose(4, 3, 0, 1, 2)

    def bn(node, stat, dst):
        sd["backbone." + dst + ".weight"] = np.asarray(node["scale"])
        sd["backbone." + dst + ".bias"] = np.asarray(node["bias"])
        sd["backbone." + dst + ".running_mean"] = np.asarray(stat["mean"])
        sd["backbone." + dst + ".running_var"] = np.asarray(stat["var"])

    conv(params["conv1_s_conv"], "conv1_s.conv")
    conv(params["conv1_t_conv"], "conv1_t.conv")
    bn(params["conv1_t_bn"], stats["conv1_t_bn"], "conv1_t.bn")
    blocks = [_round_repeats(b, model.gamma_d) for b in model.stage_blocks]
    for i, nb in enumerate(blocks):
        for b in range(nb):
            src = params[f"layer{i+1}_{b}"]
            sstat = stats[f"layer{i+1}_{b}"]
            base = f"layer{i+1}.{b}"
            for ci in (1, 2, 3):
                conv(src[f"conv{ci}_conv"], f"{base}.conv{ci}.conv")
                bn(src[f"conv{ci}_bn"], sstat[f"conv{ci}_bn"], f"{base}.conv{ci}.bn")
            if "se_module" in src:
                for fc in ("fc1", "fc2"):
                    sd[f"backbone.{base}.se_module.{fc}.weight"] = np.asarray(
                        src["se_module"][fc]["kernel"]
                    ).transpose(4, 3, 0, 1, 2)
                    sd[f"backbone.{base}.se_module.{fc}.bias"] = np.asarray(
                        src["se_module"][fc]["bias"]
                    )
            if "downsample_conv" in src:
                conv(src["downsample_conv"], f"{base}.downsample.conv")
                bn(src["downsample_bn"], sstat["downsample_bn"], f"{base}.downsample.bn")
    conv(params["conv5_conv"], "conv5.conv")
    bn(params["conv5_bn"], stats["conv5_bn"], "conv5.bn")
    return sd


def test_x3d_port_roundtrip():
    """flax → mmaction-named state_dict → port back ≡ identity (validates
    that the port covers every parameter with the right transposes)."""
    m = _tiny()
    x = jnp.zeros((1, 2, 16, 16, 3))
    variables = m.init(jax.random.PRNGKey(1), x, train=False)
    sd = _flax_to_torch_sd(variables, m)
    ported = port_torch_x3d(sd, model=m)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(ported["params"]))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path))
    out_a = m.apply(variables, x, train=False)
    out_b = m.apply(ported, x, train=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6)


def test_x3d_se_gating_changes_output():
    m_all = X3D(gamma_w=0.5, gamma_b=2.0, gamma_d=0.2, base_channels=16,
                stage_blocks=(1, 1), se_style="all")
    x = jnp.ones((1, 2, 16, 16, 3))
    v = m_all.init(jax.random.PRNGKey(0), x, train=False)
    names = jax.tree_util.tree_leaves_with_path(v["params"])
    assert any("se_module" in str(p) for p, _ in names)
