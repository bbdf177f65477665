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
