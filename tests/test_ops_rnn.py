"""Golden tests: scan-based RNNs vs torch packed-sequence RNNs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from erc_tpu.ops.rnn import BiRNN, TorchGRUCell


def _copy_rnn_weights(tmod, params, num_layers, bidirectional):
    """Overwrite flax BiRNN params with torch RNN weights."""
    p = dict(params)
    for layer in range(num_layers):
        sfxs = [f"_l{layer}"] + ([f"_l{layer}_reverse"] if bidirectional else [])
        for sfx in sfxs:
            p[f"w_ih{sfx}"] = jnp.asarray(getattr(tmod, f"weight_ih{sfx}").detach().numpy())
            p[f"w_hh{sfx}"] = jnp.asarray(getattr(tmod, f"weight_hh{sfx}").detach().numpy())
            p[f"b_ih{sfx}"] = jnp.asarray(getattr(tmod, f"bias_ih{sfx}").detach().numpy())
            p[f"b_hh{sfx}"] = jnp.asarray(getattr(tmod, f"bias_hh{sfx}").detach().numpy())
    return p


@pytest.mark.parametrize("cell,bidi,layers", [("lstm", True, 2), ("gru", True, 1), ("lstm", False, 1), ("gru", False, 2)])
def test_birnn_matches_torch_packed(cell, bidi, layers):
    torch.manual_seed(0)
    B, L, D, H = 3, 9, 12, 8
    lengths = np.array([9, 5, 2])
    x = np.random.default_rng(0).normal(size=(B, L, D)).astype(np.float32)
    mask = (np.arange(L)[None] < lengths[:, None]).astype(np.float32)

    cls = torch.nn.LSTM if cell == "lstm" else torch.nn.GRU
    tmod = cls(D, H, num_layers=layers, bidirectional=bidi, batch_first=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lengths), batch_first=True, enforce_sorted=False
    )
    with torch.no_grad():
        out_p, _ = tmod(packed)
    want, _ = torch.nn.utils.rnn.pad_packed_sequence(out_p, batch_first=True, total_length=L)
    want = want.numpy()

    mod = BiRNN(hidden_size=H, num_layers=layers, cell=cell, bidirectional=bidi)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))["params"]
    params = _copy_rnn_weights(tmod, params, layers, bidi)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_scan_multichain_matches_separate_scans(cell):
    """K chains through one scan ≡ K separate bidirectional scans (the
    CIM fused_rnn mechanism)."""
    from erc_tpu.ops.rnn import _scan_bidirectional, _scan_multichain

    rng = np.random.default_rng(0)
    B, L, H, G = 3, 7, 5, (4 if cell == "lstm" else 3)
    lengths = [7, 4, 6]
    mask = jnp.asarray(
        (np.arange(L)[None] < np.array(lengths)[:, None]).astype(np.float32)
    )
    parts = []
    for k, D in enumerate((6, 9, 4)):  # per-chain input dims differ
        xf = jnp.asarray(rng.normal(size=(B, L, G * H)).astype(np.float32))
        xb = jnp.asarray(rng.normal(size=(B, L, G * H)).astype(np.float32))
        whf = jnp.asarray(rng.normal(size=(G * H, H)).astype(np.float32))
        whb = jnp.asarray(rng.normal(size=(G * H, H)).astype(np.float32))
        bhf = jnp.asarray(rng.normal(size=(G * H,)).astype(np.float32))
        bhb = jnp.asarray(rng.normal(size=(G * H,)).astype(np.float32))
        parts.append((xf, xb, whf, whb, bhf, bhb))

    fused = _scan_multichain(parts, mask, lstm=(cell == "lstm"))
    for part, (got_f, got_b) in zip(parts, fused):
        want_f, want_b = _scan_bidirectional(*part[:2], mask, *part[2:],
                                             lstm=(cell == "lstm"))
        np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                                   atol=1e-6, rtol=1e-6)


def test_cim_fused_rnn_matches_unfused():
    """CIMModule(fused_rnn=True) ≡ fused_rnn=False on the same params."""
    from erc_tpu.models.cim import CIMModule

    rng = np.random.default_rng(1)
    B, L = 2, 6
    batch = {
        "attention_mask": jnp.asarray(
            (np.arange(L)[None] < np.array([6, 3])[:, None]).astype(np.float32)
        ),
        "audio_feature": jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32)),
        "visual_feature": jnp.asarray(rng.normal(size=(B, L, 10)).astype(np.float32)),
        "text_feature": jnp.asarray(rng.normal(size=(B, L, 12)).astype(np.float32)),
    }
    kw = dict(text_dim=12, audio_dim=8, visual_dim=10, hidden_size=16, n_classes=4)
    fused = CIMModule(fused_rnn=True, **kw)
    variables = fused.init(jax.random.PRNGKey(0), batch, deterministic=True)
    l2_f, l7_f = fused.apply(variables, batch, deterministic=True)
    l2_u, l7_u = CIMModule(fused_rnn=False, **kw).apply(
        variables, batch, deterministic=True
    )
    np.testing.assert_allclose(np.asarray(l2_f), np.asarray(l2_u), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l7_f), np.asarray(l7_u), atol=1e-5, rtol=1e-5)


def test_resolve_fused_rnn_policy():
    from erc_tpu.models.cim import CIMParams, resolve_fused_rnn

    p = CIMParams()  # train 16 / test 32 → latency regime
    assert resolve_fused_rnn(p) is True
    p.test.batch_size = 64
    assert resolve_fused_rnn(p) is False  # either stage past the crossover
    p.fused_rnn = "on"
    assert resolve_fused_rnn(p) is True
    p.fused_rnn = False
    assert resolve_fused_rnn(p) is False


def test_grucell_matches_torch():
    torch.manual_seed(1)
    B, D, H = 4, 6, 5
    tcell = torch.nn.GRUCell(D, H)
    x = np.random.default_rng(1).normal(size=(B, D)).astype(np.float32)
    h = np.random.default_rng(2).normal(size=(B, H)).astype(np.float32)
    with torch.no_grad():
        want = tcell(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    mod = TorchGRUCell(H)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h))["params"]
    params = {
        "w_ih": jnp.asarray(tcell.weight_ih.detach().numpy()),
        "w_hh": jnp.asarray(tcell.weight_hh.detach().numpy()),
        "b_ih": jnp.asarray(tcell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(tcell.bias_hh.detach().numpy()),
    }
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_grucell_default_hidden_is_zero():
    tcell = torch.nn.GRUCell(3, 4)
    x = np.ones((2, 3), np.float32)
    with torch.no_grad():
        want = tcell(torch.from_numpy(x)).numpy()
    mod = TorchGRUCell(4)
    params = {
        "w_ih": jnp.asarray(tcell.weight_ih.detach().numpy()),
        "w_hh": jnp.asarray(tcell.weight_hh.detach().numpy()),
        "b_ih": jnp.asarray(tcell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(tcell.bias_hh.detach().numpy()),
    }
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
