"""Scan-based recurrent layers with torch-compatible cell math.

Replaces the reference's cuDNN LSTM/GRU/GRUCell usage (dgcn SeqContext
packed biLSTM dgcn_models.py:10-33, mmgcn lstm_l mmgcn.py:69, cim biGRUs
cim.py:127-140, dagerc GRUCell pairs dagerc.py:90-91) with ``lax.scan``
over the utterance axis.  Packed-sequence semantics are reproduced with a
validity mask: hidden state carries through padded steps unchanged and
padded outputs are zero — numerically identical to
pack_padded_sequence → rnn → pad_packed_sequence for right-padded batches.

Gate math matches torch exactly (dual biases, (r,z,n)/(i,f,g,o) stacking),
so golden tests against torch.nn.GRU/LSTM validate the scan.

The per-step input projection is hoisted out of the scan as one big
[B, L, D] @ [D, GH] matmul (MXU-sized); only the [B, H] @ [H, GH]
hidden-to-hidden product stays sequential.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def gru_cell(x_proj, h, w_hh, b_hh):
    """One torch-math GRU step. x_proj = x @ W_ih^T + b_ih, shape [B, 3H]."""
    H = h.shape[-1]
    hp = h @ w_hh.T + b_hh
    xr, xz, xn = jnp.split(x_proj, 3, -1)
    hr, hz, hn = jnp.split(hp, 3, -1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_cell_proj(x_proj, h_proj, h):
    """GRU step with BOTH projections precomputed (x_proj = x@W_ihᵀ+b_ih,
    h_proj = h@W_hhᵀ+b_hh).  Lets callers hoist whichever side is loop-
    invariant and merge the other into a fused matmul (see DAGStack)."""
    xr, xz, xn = jnp.split(x_proj, 3, -1)
    hr, hz, hn = jnp.split(h_proj, 3, -1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def lstm_cell(x_proj, h, c, w_hh, b_hh):
    """One torch-math LSTM step. x_proj = x @ W_ih^T + b_ih, shape [B, 4H]."""
    hp = h @ w_hh.T + b_hh
    xi, xf, xg, xo = jnp.split(x_proj, 4, -1)
    hi, hf, hg, ho = jnp.split(hp, 4, -1)
    i = jax.nn.sigmoid(xi + hi)
    f = jax.nn.sigmoid(xf + hf)
    g = jnp.tanh(xg + hg)
    o = jax.nn.sigmoid(xo + ho)
    c2 = f * c + i * g
    return o * jnp.tanh(c2), c2


def _uniform_init(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class TorchGRUCell(nn.Module):
    """Standalone GRUCell (reference: dagerc.py:90-91 grus_c/grus_p)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x, h=None):
        H = self.hidden_size
        scale = 1.0 / jnp.sqrt(H)
        w_ih = self.param("w_ih", _uniform_init(scale), (3 * H, x.shape[-1]))
        w_hh = self.param("w_hh", _uniform_init(scale), (3 * H, H))
        b_ih = self.param("b_ih", _uniform_init(scale), (3 * H,))
        b_hh = self.param("b_hh", _uniform_init(scale), (3 * H,))
        if h is None:
            h = jnp.zeros(x.shape[:-1] + (H,), x.dtype)
        return gru_cell(x @ w_ih.T + b_ih, h, w_hh, b_hh)


def _scan_direction(cell, x_proj, mask, w_hh, b_hh, lstm: bool, reverse: bool):
    """Scan one direction over the L axis with pack/pad masking.

    x_proj: [B, L, GH], mask: [B, L] (1 = valid).
    Returns outputs [B, L, H] (zero at padded steps).
    """
    B = x_proj.shape[0]
    H = w_hh.shape[1]
    xs = jnp.swapaxes(x_proj, 0, 1)  # [L, B, GH]
    ms = jnp.swapaxes(mask, 0, 1)[..., None]  # [L, B, 1]

    if lstm:

        def step(carry, inp):
            h, c = carry
            xp, m = inp
            h2, c2 = lstm_cell(xp, h, c, w_hh, b_hh)
            h = m * h2 + (1 - m) * h
            c = m * c2 + (1 - m) * c
            return (h, c), m * h2

        init = (jnp.zeros((B, H), x_proj.dtype), jnp.zeros((B, H), x_proj.dtype))
    else:

        def step(carry, inp):
            h = carry
            xp, m = inp
            h2 = gru_cell(xp, h, w_hh, b_hh)
            h = m * h2 + (1 - m) * h
            return h, m * h2

        init = jnp.zeros((B, H), x_proj.dtype)

    _, ys = jax.lax.scan(step, init, (xs, ms), reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def _scan_bidirectional(x_proj_f, x_proj_b, mask, w_hh_f, w_hh_b, b_hh_f,
                        b_hh_b, lstm: bool):
    """BOTH directions in ONE scan (latency optimization).

    The reverse direction over a right-padded masked sequence equals a
    forward scan over the L-flipped inputs/mask with an L-flip of its
    outputs (the mask carry-through is symmetric).  Stacking the flipped
    reverse stream onto the batch axis halves the sequential step count
    (the usual TPU recurrence bottleneck) and doubles the per-step
    [B, H] × [H, GH] matmul batch — the same math, better MXU shape.
    Numerically identical to two `_scan_direction` calls (golden-tested
    against torch.nn.LSTM/GRU in test_ops_rnn).
    """
    (y_f, y_b), = _scan_multichain(
        [(x_proj_f, x_proj_b, w_hh_f, w_hh_b, b_hh_f, b_hh_b)], mask, lstm
    )
    return y_f, y_b


def _scan_multichain(parts, mask, lstm: bool):
    """K independent bidirectional recurrences in ONE scan.

    ``parts``: list of (x_proj_f, x_proj_b, w_hh_f, w_hh_b, b_hh_f, b_hh_b),
    all with the same hidden size and the same [B, L] mask.  Sequential
    scan steps are the recurrence bottleneck on TPU (each cell is a tiny
    latency-bound matmul), so K chains × 2 directions ride one scan as a
    [2K·B, H] batch: 1/K-th the sequential steps of K separate scans and
    per-step matmuls K× wider.  Per-chain math is untouched (each output
    element contracts only over its own chain's H), so results match the
    separate scans — CIM's three modality GRUs are the user (cim.py
    fused_rnn).  Returns [(y_f, y_b)] per chain.
    """
    K = len(parts)
    B = parts[0][0].shape[0]
    H = parts[0][2].shape[1]
    xs = jnp.concatenate(
        [jnp.swapaxes(p[0], 0, 1) for p in parts]
        + [jnp.swapaxes(p[1], 0, 1)[::-1] for p in parts],
        axis=1,
    )  # [L, 2KB, GH]
    ms_half = jnp.swapaxes(mask, 0, 1)[..., None]  # [L, B, 1]
    ms = jnp.concatenate([ms_half] * K + [ms_half[::-1]] * K, axis=1)
    w_hh = jnp.stack([p[2] for p in parts] + [p[3] for p in parts])  # [2K, GH, H]
    b_hh = jnp.stack([p[4] for p in parts] + [p[5] for p in parts])[:, None]

    def hh(h):  # [2KB, H] → [2KB, GH], per-chain/direction weights
        h2 = h.reshape(2 * K, B, H)
        return (
            jnp.einsum("dbh,dgh->dbg", h2, w_hh, preferred_element_type=jnp.float32)
            .astype(h.dtype) + b_hh
        ).reshape(2 * K * B, -1)

    if lstm:

        def step(carry, inp):
            h, c = carry
            xp, m = inp
            hp = hh(h)
            xi, xf, xg, xo = jnp.split(xp, 4, -1)
            hi, hf, hg, ho = jnp.split(hp, 4, -1)
            i = jax.nn.sigmoid(xi + hi)
            f = jax.nn.sigmoid(xf + hf)
            g = jnp.tanh(xg + hg)
            o = jax.nn.sigmoid(xo + ho)
            c2 = f * c + i * g
            h2 = o * jnp.tanh(c2)
            h = m * h2 + (1 - m) * h
            c = m * c2 + (1 - m) * c
            return (h, c), m * h2

        init = (jnp.zeros((2 * K * B, H), xs.dtype),
                jnp.zeros((2 * K * B, H), xs.dtype))
    else:

        def step(carry, inp):
            h = carry
            xp, m = inp
            hp = hh(h)
            xr, xz, xn = jnp.split(xp, 3, -1)
            hr, hz, hn = jnp.split(hp, 3, -1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h2 = (1.0 - z) * n + z * h
            h = m * h2 + (1 - m) * h
            return h, m * h2

        init = jnp.zeros((2 * K * B, H), xs.dtype)

    _, ys = jax.lax.scan(step, init, (xs, ms))  # [L, 2KB, H]
    ys_rev = ys[::-1]
    out = []
    for k in range(K):
        y_f = jnp.swapaxes(ys[:, k * B : (k + 1) * B], 0, 1)
        y_b = jnp.swapaxes(ys_rev[:, (K + k) * B : (K + k + 1) * B], 0, 1)
        out.append((y_f, y_b))
    return out


class BiRNN(nn.Module):
    """Multi-layer (optionally bidirectional) GRU/LSTM over padded [B, L, D].

    Matches torch.nn.LSTM/GRU(batch_first=True) with packed sequences.
    Dropout is applied between layers (not after the last), as in torch.
    """

    hidden_size: int  # per direction
    num_layers: int = 1
    cell: str = "lstm"  # 'lstm' | 'gru'
    bidirectional: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True,
                 return_parts: bool = False):
        """return_parts=True (1-layer bidirectional only) creates the same
        params but returns the pre-scan pieces
        (x_proj_f, x_proj_b, w_hh_f, w_hh_b, b_hh_f, b_hh_b) instead of
        running the recurrence — callers with several same-H encoders fuse
        them through ONE `_scan_multichain` (K× fewer sequential steps;
        see cim.py fused_rnn)."""
        H = self.hidden_size
        G = 4 if self.cell == "lstm" else 3
        scale = 1.0 / jnp.sqrt(H)
        directions = (False, True) if self.bidirectional else (False,)
        out = x
        for layer in range(self.num_layers):
            prm = {}
            for rev in directions:
                sfx = f"_l{layer}" + ("_reverse" if rev else "")
                prm[rev] = (
                    self.param(f"w_ih{sfx}", _uniform_init(scale), (G * H, out.shape[-1])),
                    self.param(f"w_hh{sfx}", _uniform_init(scale), (G * H, H)),
                    self.param(f"b_ih{sfx}", _uniform_init(scale), (G * H,)),
                    self.param(f"b_hh{sfx}", _uniform_init(scale), (G * H,)),
                )
            if self.bidirectional:
                # fused single scan over both directions (half the
                # sequential steps, 2B-row per-step matmuls)
                (wf, whf, bf, bhf), (wb, whb, bb, bhb) = prm[False], prm[True]
                if return_parts:
                    if self.num_layers != 1:
                        raise ValueError("return_parts needs num_layers=1")
                    return (out @ wf.T + bf, out @ wb.T + bb,
                            whf, whb, bhf, bhb)
                y_f, y_b = _scan_bidirectional(
                    out @ wf.T + bf, out @ wb.T + bb, mask,
                    whf, whb, bhf, bhb, self.cell == "lstm",
                )
                feats = [y_f, y_b]
            else:
                if return_parts:
                    raise ValueError("return_parts needs bidirectional=True")
                w_ih, w_hh, b_ih, b_hh = prm[False]
                feats = [
                    _scan_direction(
                        None, out @ w_ih.T + b_ih, mask, w_hh, b_hh,
                        self.cell == "lstm", False,
                    )
                ]
            out = jnp.concatenate(feats, -1) if len(feats) > 1 else feats[0]
            if self.dropout > 0 and layer < self.num_layers - 1 and not deterministic:
                out = nn.Dropout(self.dropout)(out, deterministic=False)
        return out
