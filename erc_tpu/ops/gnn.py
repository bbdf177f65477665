"""Dense masked graph-neural layers.

The reference runs torch_geometric scatter kernels over flat edge lists
(RGCNConv/TransformerConv track_mm/cogmen.py:61-74, GraphConv + vendored
PyG-1.4.2 RGCNConv dgcn_models.py:36-48 / models/rgcn.py:264-355, GCNII
spmm mmgcn_models.py:8-39).  At dialogue lengths ≤ 128, dense masked
message passing — batched [B, L, L] matmuls on the MXU — beats sparse
scatter on TPU by a wide margin and removes every host sync.

Adjacency convention matches ops.graphs: A[b, u, v] = edge u → v, so a
target node v aggregates over column u via ``einsum('buv,bue->bve')``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def _chunk_of(n: int, want: int) -> int:
    """Largest divisor of ``n`` that is ≤ ``want`` (scan chunking)."""
    c = max(1, min(want, n))
    while n % c:
        c -= 1
    return c


def _maybe_remat(body, mode):
    """Wrap a scan trip body in jax.checkpoint.

    mode False/'off' → no remat; True/'full' → full chunked remat;
    'dots' → dots_saveable policy (save matmul outputs, recompute the
    elementwise chain).  Measured v5e B=32/L=96 (round 4, AFTER the rbg
    dropout + support-split changes): full 1 856 > off 1 684 > dots 1 110
    dia/s — recompute is now cheaper than streaming per-layer residuals,
    so 'full' is the MMGCN default; 'dots' re-reads its saved dots during
    the recompute and loses both ways."""
    if not mode or mode == "off":
        return body
    if mode in (True, "full"):
        return jax.checkpoint(body)
    if mode == "dots":
        return jax.checkpoint(
            body, policy=jax.checkpoint_policies.dots_saveable
        )
    raise ValueError(f"unknown remat mode {mode!r}")


def _rbg_dropout_keys(rng, n: int):
    """Per-layer dropout keys on the ``rbg`` PRNG (XLA RngBitGenerator).

    Profiling the 64-layer GCNII train step (round 4) showed the default
    threefry mask draws dominating the scan forward (≈7 ms of an 11 ms
    trip at B=32: 118 M bits/step computed on the VPU); the hardware
    Philox generator produces the same-quality dropout masks at a small
    fraction of the cost.  Mask STREAMS differ from threefry — irrelevant
    for dropout; nothing checkpoints these keys."""
    data = jax.random.key_data(rng)  # threefry [2]·u32 from the trainer pool
    rbg = jax.random.wrap_key_data(jnp.tile(data, 2), impl="rbg")
    return jax.random.split(rbg, n)


def relational_message_passing(
    x, adj, rel, weights, edge_norm=None, aggr: str = "mean"
):
    """Core RGCN aggregation: out[v] = Σ_r agg_{u∈N_r(v)} (x_u @ W_r).

    x: [B, L, D]; adj: [B, L, L] (u→v); rel: [B, L, L] int; weights: [R, D, D'].
    aggr='mean' normalizes per (target, relation) — PyG ≥2.x RGCNConv /
    COGMEN semantics; aggr='add' is the vendored PyG-1.4.2 path (DGCN),
    optionally scaled by per-edge ``edge_norm`` [B, L, L].

    Runs as a ``lax.scan`` over relations so memory stays at [B, L, L]
    regardless of R (R = 2S² = 162 for MELD's 9 speakers).
    """
    R = weights.shape[0]
    B, L, D = x.shape
    Dout = weights.shape[-1]

    def body(acc, r):
        w = weights[r]
        a_r = adj * (rel == r)
        if edge_norm is not None:
            a_r = a_r * edge_norm
        if aggr == "mean":
            cnt = a_r.sum(axis=1)  # [B, v]: in-degree of v under relation r
            a_r = a_r / jnp.maximum(cnt, 1.0)[:, None, :]
        msg = jnp.einsum(
            "buv,bue->bve", a_r, x @ w, preferred_element_type=jnp.float32
        )
        return acc + msg, None

    # accumulate in f32 (matmul partials already are), cast at the boundary
    acc0 = jnp.zeros((B, L, Dout), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, jnp.arange(R))
    return out.astype(x.dtype)


class DenseRGCN(nn.Module):
    """Relational GCN over dense windowed adjacency.

    Equivalent math to PyG RGCNConv (root_weight + bias, optional
    num_bases basis decomposition; models/rgcn.py:264-355 for the 1.4.2
    'add'+edge_norm variant, PyG 2.x 'mean' for COGMEN).
    """

    out_features: int
    num_relations: int
    num_bases: Optional[int] = None
    aggr: str = "mean"

    @nn.compact
    def __call__(self, x, adj, rel, edge_norm=None):
        D, Dout, R = x.shape[-1], self.out_features, self.num_relations
        if self.num_bases is not None:
            # vendored-PyG init: uniform(±1/sqrt(num_bases * in_channels))
            scale = 1.0 / jnp.sqrt(self.num_bases * D)
            basis = self.param("basis", _uniform(scale), (self.num_bases, D, Dout))
            att = self.param("att", _uniform(scale), (R, self.num_bases))
            weights = jnp.einsum("rb,bde->rde", att, basis)
            root = self.param("root", _uniform(scale), (D, Dout))
            bias = self.param("bias", _uniform(scale), (Dout,))
        else:
            # PyG 2.x: glorot weights, zeros bias
            weights = self.param(
                "weight", nn.initializers.xavier_uniform(), (R, D, Dout)
            )
            root = self.param("root", nn.initializers.xavier_uniform(), (D, Dout))
            bias = self.param("bias", nn.initializers.zeros, (Dout,))
        out = relational_message_passing(x, adj, rel, weights, edge_norm, self.aggr)
        return out + x @ root + bias


class DenseTransformerConv(nn.Module):
    """PyG TransformerConv (heads=1, concat) on dense adjacency.

    out_v = W_skip x_v + Σ_{u∈N(v)} α_uv · W_val x_u,
    α = softmax_u( (W_q x_v)ᵀ(W_k x_u) / √d )  over incoming edges of v.
    (reference: cogmen.py:66 conv2)
    """

    out_features: int
    heads: int = 1

    @nn.compact
    def __call__(self, x, adj):
        d = self.out_features
        q = nn.Dense(d * self.heads, name="lin_query")(x)
        k = nn.Dense(d * self.heads, name="lin_key")(x)
        v = nn.Dense(d * self.heads, name="lin_value")(x)
        skip = nn.Dense(d * self.heads, name="lin_skip")(x)
        B, L, _ = x.shape
        H = self.heads
        qh = q.reshape(B, L, H, d)
        kh = k.reshape(B, L, H, d)
        vh = v.reshape(B, L, H, d)
        # scores[b, h, u, v] for edge u→v: q of target v, k of source u
        scores = jnp.einsum("bvhd,buhd->bhuv", qh, kh) / jnp.sqrt(d)
        big_neg = jnp.finfo(scores.dtype).min / 2
        scores = jnp.where(adj[:, None] > 0, scores, big_neg)
        alpha = jax.nn.softmax(scores, axis=2)  # over sources u
        alpha = jnp.where(adj[:, None] > 0, alpha, 0.0)
        out = jnp.einsum("bhuv,buhd->bvhd", alpha, vh).reshape(B, L, H * d)
        return out + skip


class DenseGraphConv(nn.Module):
    """PyG GraphConv (aggr='add'): out_v = W1 x_v + W2 Σ_{u∈N(v)} x_u.

    (reference: dgcn_models.py:42 conv2)
    """

    out_features: int

    @nn.compact
    def __call__(self, x, adj, edge_weight=None):
        a = adj if edge_weight is None else adj * edge_weight
        agg = jnp.einsum("buv,bud->bvd", a, x, preferred_element_type=jnp.float32)
        return nn.Dense(self.out_features, name="lin_rel")(agg) + nn.Dense(
            self.out_features, name="lin_root"
        )(x)


class GCNIIStack(nn.Module):
    """Deep GCNII (variant=True) as a single ``lax.scan`` over layers.

    Per layer l (1-indexed), reference mmgcn_models.py:27-39,344-394:
        θ_l = log(λ/l + 1)
        hi  = A x
        support = [hi, h0]     (variant)
        r   = (1-α) hi + α h0
        out = relu(θ_l · support @ W_l + (1-θ_l) · r)
    with dropout before every conv.
    """

    nlayers: int
    nhidden: int
    lamda: float = 0.5
    alpha: float = 0.1
    dropout: float = 0.0
    remat: object = False  # False | True/'full' | 'dots' (see _maybe_remat)
    # CHUNKED remat (jax.checkpoint around the ``chunk``-layer trip body).
    # History (v5e, B=32, L=96): in r3 remat lost (1 115 vs 1 446 dia/s —
    # recompute cost more than the saved residual traffic); after the r4
    # support-split + rbg-dropout restructure the trip got cheap enough
    # that 'full' WINS (off 1 684 / full 1 856 / dots 1 110 dia/s) and is
    # now MMGCN's default (models/mmgcn.py gcn_remat='full').  This class
    # keeps remat=False as the neutral library default; callers pick.
    chunk: int = 8  # layers per scan trip (= remat granularity)

    @nn.compact
    def __call__(self, x, adj, deterministic: bool = True):
        nh = self.nhidden
        scale = 1.0 / jnp.sqrt(nh)
        Ws = self.param("convs", _uniform(scale), (self.nlayers, 2 * nh, nh))
        h0 = x
        thetas = jnp.log(self.lamda / jnp.arange(1, self.nlayers + 1) + 1.0)
        if not deterministic and self.dropout > 0:
            keys = _rbg_dropout_keys(self.make_rng("dropout"), self.nlayers)
        else:
            keys = jax.random.wrap_key_data(
                jnp.zeros((self.nlayers, 4), jnp.uint32), impl="rbg"
            )

        keep = 1.0 - self.dropout

        # support matmul split (MXU restructure, VERDICT r3 item 2):
        # [hi, h0] @ W  ==  hi @ W[:nh] + h0 @ W[nh:].  h0 is CONSTANT
        # across layers, so its half is batched over the whole scan trip as
        # ONE [rows, nh] × [nh, C·nh] matmul (large N → near-full MXU
        # tiles) instead of riding the sequential per-layer chain; the
        # per-layer [·, 400]-concat materialization disappears entirely.
        def layer(h, W1, b2, theta, key):
            if not deterministic and self.dropout > 0:
                # pred+select, deliberately: a multiplicative bf16 mask
                # (compare→convert→mul) was measured SLOWER (2 383 vs
                # 2 677 dia/s bf16 B=32) despite the pred copy traffic in
                # the xplane trace — the select fuses better here
                mask = jax.random.bernoulli(key, keep, h.shape)
                h = jnp.where(mask, h / keep, 0.0)
            hi = jnp.einsum(
                "buv,bud->bvd", adj, h, preferred_element_type=jnp.float32
            ).astype(h0.dtype)
            r = (1 - self.alpha) * hi + self.alpha * h0
            out = theta * (hi @ W1 + b2) + (1 - theta) * r
            return nn.relu(out).astype(h0.dtype)

        # NOTE: adj is [B, v, u] here?  ops.graphs adjacency is u→v, but the
        # GCNII big-adj is symmetric after D^-1/2 A D^-1/2, so orientation
        # does not matter; we keep 'buv,bud->bvd' (aggregate over axis 1).
        C = _chunk_of(self.nlayers, self.chunk)

        def body(h, inp):
            Wc, thc, kc = inp
            # per-trip batched h0-half: one [B·L, nh] × [nh, C·nh] matmul
            b2c = jnp.einsum(
                "bud,cde->cbue", h0, Wc[:, nh:, :],
                preferred_element_type=jnp.float32,
            ).astype(h0.dtype)
            for t in range(C):
                h = layer(h, Wc[t, :nh, :], b2c[t], thc[t], kc[t])
            return h, None

        body = _maybe_remat(body, self.remat)
        T = self.nlayers // C
        h, _ = jax.lax.scan(
            body,
            h0,
            (
                Ws.reshape(T, C, 2 * nh, nh),
                thetas.reshape(T, C),
                keys.reshape(T, C),
            ),
        )
        return h


class GCNIIStackStructured(nn.Module):
    """GCNIIStack over MMGCN's *structured* big adjacency.

    x: [B, M, L, D]; adjacency = (intra [M, B, L, L], cross [M, M, B, L])
    from ops.graphs.mmgcn_structured_adjacency — ~3× fewer aggregation
    FLOPs than the dense (M·L)² form, numerically identical
    (test_mmgcn_structured)."""

    nlayers: int
    nhidden: int
    lamda: float = 0.5
    alpha: float = 0.1
    dropout: float = 0.0
    remat: object = False  # False | True/'full' | 'dots' — see _maybe_remat
    chunk: int = 8

    @nn.compact
    def __call__(self, x, intra, cross, deterministic: bool = True):
        from erc_tpu.ops.graphs import structured_adj_matmul

        nh = self.nhidden
        scale = 1.0 / jnp.sqrt(nh)
        Ws = self.param("convs", _uniform(scale), (self.nlayers, 2 * nh, nh))
        h0 = x
        thetas = jnp.log(self.lamda / jnp.arange(1, self.nlayers + 1) + 1.0)
        if not deterministic and self.dropout > 0:
            keys = _rbg_dropout_keys(self.make_rng("dropout"), self.nlayers)
        else:
            keys = jax.random.wrap_key_data(
                jnp.zeros((self.nlayers, 4), jnp.uint32), impl="rbg"
            )
        keep = 1.0 - self.dropout

        # same support-matmul split as GCNIIStack: h0's half of [hi,h0]@W
        # is batched per trip (one big-N matmul), the concat disappears
        def layer(h, W1, b2, theta, key):
            if not deterministic and self.dropout > 0:
                mask = jax.random.bernoulli(key, keep, h.shape)
                h = jnp.where(mask, h / keep, 0.0)
            hi = structured_adj_matmul(intra, cross, h).astype(h.dtype)
            r = (1 - self.alpha) * hi + self.alpha * h0
            out = theta * (hi @ W1 + b2) + (1 - theta) * r
            return nn.relu(out)

        C = _chunk_of(self.nlayers, self.chunk)

        def body(h, inp):
            Wc, thc, kc = inp
            b2c = jnp.einsum(
                "bmud,cde->cbmue", h0, Wc[:, nh:, :],
                preferred_element_type=jnp.float32,
            ).astype(h0.dtype)
            for t in range(C):
                h = layer(h, Wc[t, :nh, :], b2c[t], thc[t], kc[t])
            return h, None

        body = _maybe_remat(body, self.remat)
        T = self.nlayers // C
        h, _ = jax.lax.scan(
            body,
            h0,
            (
                Ws.reshape(T, C, 2 * nh, nh),
                thetas.reshape(T, C),
                keys.reshape(T, C),
            ),
        )
        return h
