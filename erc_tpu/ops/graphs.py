"""Vectorized dialogue-graph construction over padded [B, L] tensors.

The reference builds graphs with per-dialogue python loops producing flat
edge lists (reference: track_mm/cogmen_utils.py:109-172,
dgcn_models.py:51-118, dagerc.py:109-154, mmgcn_models.py:582-646).  All of
those graphs are deterministic functions of (lengths, speakers, window), so
on TPU we build them as masked dense tensors — static shapes, no host
sync, fully fusable by XLA.

Conventions:
    adjacency A[b, u, v] = 1  ⟺  edge  u → v  (v aggregates from u)
    All masks are float32 {0, 1} unless noted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def length_mask(lengths, max_len: int):
    """[B, L] validity mask from per-dialogue lengths."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)


def window_adjacency(lengths, max_len: int, wp: int, wf: int):
    """Windowed edge mask equal to the reference's ``edge_perms`` set.

    ``edge_perms(length, wp, wf)`` emits (u, v) for every u and every
    v ∈ [u-wp, u+wf] clipped to the dialogue (cogmen_utils.py:147-172);
    wp/wf = -1 means unbounded.  Returns A[b, u, v] ∈ {0,1}.
    """
    idx = jnp.arange(max_len)
    diff = idx[None, :] - idx[:, None]  # diff[u, v] = v - u
    band = jnp.ones((max_len, max_len), dtype=bool)
    if wp != -1:
        band &= diff >= -wp
    if wf != -1:
        band &= diff <= wf
    valid = length_mask(lengths, max_len)
    pair_valid = valid[:, :, None] * valid[:, None, :]
    return band[None].astype(jnp.float32) * pair_valid


def relation_ids(speakers, n_speakers: int):
    """Per-edge relation id matching the reference's edge-type grammar.

    edge_type_to_idx["{spk_u}{spk_v}{c}"] with c=0 if u<v else 1 and
    insertion order "jk0","jk1" (cogmen.py:124-129) gives
    rel(u→v) = 2*(spk_u*S + spk_v) + (0 if u<v else 1).
    Returns rel[b, u, v] int32; num_relations = 2*S².
    """
    L = speakers.shape[-1]
    su = speakers[:, :, None]
    sv = speakers[:, None, :]
    idx = jnp.arange(L)
    direction = (idx[:, None] >= idx[None, :]).astype(jnp.int32)  # u >= v → 1
    return 2 * (su * n_speakers + sv) + direction[None]


def same_speaker_mask(speakers, lengths=None, max_len=None):
    """s_mask[b, i, j] = 1 iff spk_i == spk_j (reference: dagerc.py:131-154)."""
    s = (speakers[:, :, None] == speakers[:, None, :]).astype(jnp.float32)
    return s


def dag_adjacency(speakers, lengths, max_len: int, windowp: int = 1):
    """DAG-ERC predecessor mask (reference: dagerc.py:109-129 ``get_adj_v1``).

    a[i, j] = 1 iff j < i and fewer than `windowp` same-speaker-as-i turns
    lie strictly between j and i.  (The loop marks every predecessor down to
    and including the windowp-th previous same-speaker turn.)
    """
    B = speakers.shape[0]
    same = (speakers[:, :, None] == speakers[:, None, :]).astype(jnp.int32)  # [B, i, k]
    # S[b, i, j] = number of k <= j with spk_k == spk_i
    S = jnp.cumsum(same, axis=-1)
    i_idx = jnp.arange(max_len)[:, None]
    j_idx = jnp.arange(max_len)[None, :]
    # Sii[b, i] = S[b, i, i-1]  (0 at i == 0)
    prev = jnp.broadcast_to(jnp.maximum(jnp.arange(max_len) - 1, 0)[None, :, None], (B, max_len, 1))
    Sii = jnp.take_along_axis(S, prev, axis=-1)  # [B, L, 1]
    Sii = jnp.where(jnp.arange(max_len)[None, :, None] > 0, Sii, 0)
    between = Sii - S  # [B, i, j] = same-speaker count in (j, i-1]
    adj = (j_idx[None] < i_idx[None]) & (between < windowp)
    valid = length_mask(lengths, max_len)
    pair_valid = valid[:, :, None] * valid[:, None, :]
    return adj.astype(jnp.float32) * pair_valid


def degree_normalize_sym(adj, eps: float = 0.0):
    """D^{-1/2} A D^{-1/2} with zero-degree guard (mmgcn_models.py:638-644).

    NB the double-where: ``where(d>0, rsqrt(d), 0)`` alone still evaluates
    rsqrt(0) in the backward pass and poisons gradients with NaN."""
    d = adj.sum(-1)
    d_safe = jnp.where(d > 0, d, 1.0)
    dinv = jnp.where(d > 0, jax_rsqrt(d_safe), 0.0)
    return adj * dinv[..., :, None] * dinv[..., None, :]


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)


def angular_similarity(x, valid, eps: float = 1e-12):
    """Pairwise 1 - arccos(0.99999·cos_sim)/π within a dialogue.

    (reference: mmgcn_models.py:604-611 intra-modal blocks.)
    x: [B, L, D]; valid: [B, L].  Invalid rows give 0 similarity.
    """
    # sqrt inside maximum: plain sqrt(0) on padded rows has inf gradient
    # and 0·inf = NaN poisons the backward pass
    norm = jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), eps * eps))
    xn = x / norm
    cos = jnp.einsum("bld,bmd->blm", xn, xn) * 0.99999
    # clip strictly inside ±1: bf16 matmuls can push self-cosines past 1,
    # and arccos' diverges at the boundary (clip-grad 0 · inf = NaN)
    sim = 1.0 - jnp.arccos(jnp.clip(cos, -0.99999, 0.99999)) / np.pi
    pv = valid[:, :, None] * valid[:, None, :]
    return sim * pv


def cross_modal_diag_similarity(x, y, valid, eps: float = 1e-12):
    """Per-utterance 1 - arccos(0.99999·cos(x_i, y_i))/π (mmgcn_models.py:621-634)."""
    nx = x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), eps * eps))
    ny = y / jnp.sqrt(jnp.maximum(jnp.sum(y * y, -1, keepdims=True), eps * eps))
    cos = jnp.sum(nx * ny, -1) * 0.99999
    sim = 1.0 - jnp.arccos(jnp.clip(cos, -0.99999, 0.99999)) / np.pi
    return sim * valid


def mmgcn_structured_adjacency(feats: list, valid):
    """MMGCN big adjacency in *structured* form, exploiting its block
    sparsity: intra-modal blocks are dense [L, L], cross-modal blocks are
    diagonal (mmgcn_models.py:614-634) — so A @ x costs M dense matmuls +
    M(M-1) elementwise products instead of one (M·L)² matmul (3× less for
    M=3).

    Returns (intra [M, B, L, L], cross [M, M, B, L]) with the same
    D^-1/2 A D^-1/2 normalization as mmgcn_big_adjacency; cross[m][m] = 0.
    """
    M = len(feats)
    B, L, _ = feats[0].shape
    intra = jnp.stack([angular_similarity(f, valid) for f in feats])  # [M, B, L, L]
    cross = jnp.zeros((M, M, B, L))
    for m in range(M):
        for n in range(M):
            if m != n:
                cross = cross.at[m, n].set(
                    cross_modal_diag_similarity(feats[m], feats[n], valid)
                )
    # degrees: row sum over the full (M·L) row of the big matrix
    deg = intra.sum(-1) + cross.sum(1)  # [M, B, L]
    deg_safe = jnp.where(deg > 0, deg, 1.0)  # double-where: no NaN grads
    dinv = jnp.where(deg > 0, 1.0 / jnp.sqrt(deg_safe), 0.0)
    intra = intra * dinv[:, :, :, None] * dinv[:, :, None, :]
    cross = cross * dinv[:, None] * dinv[None, :]
    return intra, cross


def structured_adj_matmul(intra, cross, x):
    """(A @ x) for the structured big adjacency.

    x: [B, M, L, D] → [B, M, L, D].
    out[m] = intra[m] @ x[m] + Σ_{n≠m} diag(cross[m,n]) · x[n]
    """
    dense = jnp.einsum(
        "mbuv,bmvd->bmud", intra, x, preferred_element_type=jnp.float32
    )
    diag = jnp.einsum("mnbl,bnld->bmld", cross, x)
    return dense + diag


def mmgcn_big_adjacency(feats: list, valid):
    """MMGCN's (M·L)² "big adjacency" in padded batch form.

    Reference (mmgcn_models.py:582-646) concatenates all dialogues into one
    block-diagonal graph; because blocks never interact, the padded batch
    form [B, M*L, M*L] is numerically identical per dialogue.
    Intra-modal blocks: full angular-similarity; cross-modal: diagonal only.
    Symmetric degree normalization over the whole M*L graph.
    """
    M = len(feats)
    B, L, _ = feats[0].shape
    blocks = []
    for m in range(M):
        row = []
        for n in range(M):
            if m == n:
                row.append(angular_similarity(feats[m], valid))
            else:
                diag = cross_modal_diag_similarity(feats[m], feats[n], valid)
                row.append(jnp.zeros((B, L, L)).at[..., jnp.arange(L), jnp.arange(L)].set(diag))
        blocks.append(jnp.concatenate(row, axis=-1))
    adj = jnp.concatenate(blocks, axis=-2)  # [B, M*L, M*L]
    return degree_normalize_sym(adj)
