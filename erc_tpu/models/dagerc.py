"""DAG-ERC: Directed Acyclic Graph network for conversational emotion.

TPU re-design of reference track_mm/dagerc.py + dagerc_models.py: a DAG
over past context (predecessors until the previous same-speaker turn,
windowp=1) with, per layer, a GAT gather over already-computed outputs and
a dual GRU (node-GRU + proxy-GRU) sequential recurrence (dagerc.py:156-198).

The O(L) python recurrence with a growing ``H1`` concat becomes, per
layer, a blockwise-prefix ``lax.scan``: all queries/input projections are
hoisted into whole-sequence matmuls, the attention against previous
blocks' V/K buffers runs once per ``dag_chunk`` positions on the MXU
(flash-style softmax combine, exact), and only a small per-position tail
stays sequential (DAGStack; optionally fused into one pallas kernel via
``--dag_impl=pallas``).  The reference's O(L²·D²) retransforms become
O(L·D²) + O(L²·D) attention.

Trainer parity: AdamW, grad-clip 5.0 (dagerc.py:230), ReduceLROnPlateau
(dagerc.py:212), reimplement hyperparameters (dagerc.py:45-67).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from erc_tpu.models.base import MMBaseParams
from erc_tpu.ops import graphs
from erc_tpu.ops.rnn import _uniform_init, gru_cell, gru_cell_proj
from erc_tpu.train import optim as optim_factory
from erc_tpu.train.trainer import Trainer, main as _main


class DAGERCParams(MMBaseParams):
    def __init__(self):
        super().__init__()
        self.train.batch_size = 8
        self.test.batch_size = 8
        self.num_heads = 10
        self.gnn_heads = 1
        self.gnn_layers = 4
        self.dropout = 0.0
        self.dataset = "iemocap-cogmen-6"
        self.epoch = 30
        self.optim = optim_factory.create_optim("AdamW", lr=1e-3)
        self.speaker_onehot = True
        self.windowp = 1
        self.hidden_dim = 300
        # DAGStack blocking: utterances per scan trip; remat of the block
        # body; and the within-block implementation.  auto = XLA for the
        # train step (the fused pallas kernel's hand-written backward loses
        # to XLA AD) but the PALLAS forward for the deterministic eval step
        # on single-chip TPU (measured +10% eval wall, BENCH_MATRIX.md);
        # --dag_impl=pallas/xla forces one form for both stages — see
        # DAGStack docstring and DAGERCTrainer.imodels for the resolution
        self.dag_chunk = 16
        # block-body remat ON by default (round 4): recomputing the
        # unrolled within-block tail in the backward beats streaming its
        # per-position residual saves — measured 2 599 vs 1 372 dia/s at
        # B=32 on v5e (the same traffic-vs-recompute flip as MMGCN's
        # gcn_remat; the tail is elementwise+small-matmul, cheap to redo)
        self.dag_remat = True
        self.dag_impl = self.choice("auto", "pallas", "xla")
        # final nodal attention over the stacked features ("" = identity,
        # the reference's reimplement default, dagerc.py:83)
        self.nodal_att_type = self.choice("", "global", "past")

    def iparams(self):
        super().iparams()
        if self.reimplement:
            if "iemocap" in self.dataset:
                self.dropout = 0.2
                self.epoch = 55
                self.train.batch_size = 16
                self.optim.lr = 0.0005
                self.gnn_layers = 4
            elif "meld" in self.dataset:
                self.optim.lr = 0.00001
                self.train.batch_size = 64
                self.epoch = 70
                self.dropout = 0.1
            elif "emorynlp" in self.dataset:
                self.optim.lr = 0.00005
                self.train.batch_size = 32
                self.epoch = 100
                self.dropout = 0.3
            elif "dailydialog" in self.dataset:
                self.gnn_layers = 3
                self.optim.lr = 0.00002
                self.train.batch_size = 64
                self.epoch = 50
                self.dropout = 0.3


ParamsType = DAGERCParams


class DAGLayer(nn.Module):
    """One DAG recurrence layer: GAT_dialoggcn_v1 gather + dual GRUCell.

    Scan carry: (H1, V0, V1, K) buffers [B, L, D]; V0/V1/K hold the
    Wr0/Wr1/key transforms of H1 rows, filled incrementally.
    """

    hidden_dim: int

    @nn.compact
    def __call__(self, H, adj, s_mask):
        D = self.hidden_dim
        B, L, _ = H.shape
        scale = 1.0 / jnp.sqrt(D)

        # GAT_dialoggcn_v1 params (dagerc_models.py:319-324): torch Linear
        # default init (kaiming-uniform ~ lecun-ish); we use uniform(±1/√fan)
        att_w = self.param("att_w", _uniform_init(1.0 / jnp.sqrt(2 * D)), (2 * D, 1))
        att_b = self.param("att_b", _uniform_init(1.0 / jnp.sqrt(2 * D)), (1,))
        wr0 = self.param("Wr0", _uniform_init(1.0 / jnp.sqrt(D)), (D, D))
        wr1 = self.param("Wr1", _uniform_init(1.0 / jnp.sqrt(D)), (D, D))
        # GRU cells (dagerc.py:90-91)
        pc = {
            n: self.param(f"gru_c_{n}", _uniform_init(scale), s)
            for n, s in (("w_ih", (3 * D, D)), ("w_hh", (3 * D, D)), ("b_ih", (3 * D,)), ("b_hh", (3 * D,)))
        }
        pp = {
            n: self.param(f"gru_p_{n}", _uniform_init(scale), s)
            for n, s in (("w_ih", (3 * D, D)), ("w_hh", (3 * D, D)), ("b_ih", (3 * D,)), ("b_hh", (3 * D,)))
        }

        wq, wk = att_w[:D, 0], att_w[D:, 0]  # split cat(Q,K) weight

        # hoisted input projections (per-position, MXU-batched)
        xproj_c = H @ pc["w_ih"].T + pc["b_ih"]  # gru_c input = H[l][:, i]
        q_att = H @ wq  # [B, L] query part of attention logits

        Hs = jnp.swapaxes(H, 0, 1)  # [L, B, D]
        xcs = jnp.swapaxes(xproj_c, 0, 1)  # [L, B, 3D]
        qs = jnp.swapaxes(q_att, 0, 1)  # [L, B]
        adjs = jnp.swapaxes(adj, 0, 1)  # [L, B, L] rows adj[:, i, :]
        sms = jnp.swapaxes(s_mask, 0, 1)  # [L, B, L]

        def step(carry, inp):
            H1, V0, V1, Kp = carry
            h_i, xc_i, q_i, adj_i, sm_i, i = inp
            # attention logits over all slots; adj_i already restricts to j<i
            alpha = q_i[:, None] + Kp + att_b[0]  # [B, L]
            alpha = alpha - (1.0 - adj_i) * 1e30
            attn = jax.nn.softmax(alpha, axis=-1)
            Vsel = V0 * sm_i[..., None] + V1 * (1.0 - sm_i[..., None])
            M = jnp.einsum("bl,bld->bd", attn, Vsel)
            M = jnp.where(i == 0, 0.0, M)
            C = gru_cell(xc_i, M, pc["w_hh"], pc["b_hh"])
            xp_m = M @ pp["w_ih"].T + pp["b_ih"]
            P = gru_cell(xp_m, h_i, pp["w_hh"], pp["b_hh"])
            h1 = C + P
            H1 = H1.at[:, i].set(h1)
            V0 = V0.at[:, i].set(h1 @ wr0.T)
            V1 = V1.at[:, i].set(h1 @ wr1.T)
            Kp = Kp.at[:, i].set(h1 @ wk)
            return (H1, V0, V1, Kp), h1

        zeros = jnp.zeros((B, L, D), H.dtype)
        init = (zeros, zeros, zeros, jnp.zeros((B, L), H.dtype))
        (_, _, _, _), ys = jax.lax.scan(
            step, init, (Hs, xcs, qs, adjs, sms, jnp.arange(L))
        )
        return jnp.swapaxes(ys, 0, 1)  # [B, L, D]


class DAGStack(nn.Module):
    """All DAG layers, each as a blockwise-prefix scan (flash-attention
    style).  Same math as chaining DAGLayer (parity-tested), restructured
    for the TPU memory system.

    Layers run *sequentially* (layer l's full input is layer l−1's full
    output), so each layer's attention queries ``q_i = h_in·w_q`` are all
    known before its scan starts.  Only the keys/values come from the
    layer's own outputs, so the scan goes over blocks of ``chunk``
    positions:

    - **prefix part** (one MXU matmul per block): attention of the whole
      block against all *previous* blocks' V0/V1/K buffers — the [B, L, D]
      buffers are streamed once per block instead of once per position
      (~chunk× less HBM traffic, which dominated the per-step form);
    - **within-block part** (unrolled loop of ``chunk`` tiny steps): the
      sequential dual-GRU recurrence against [B, chunk, D] live buffers;
    - the two softmax halves combine with the standard running-max
      rescaling (exact up to fp; masked columns keep their additive
      −1e30 so empty predecessor sets reproduce the reference softmax
      bit-for-bit at the semantic level — see the mask note below).

    Measured v5e (B=32, L=96): see BENCH_MATRIX.md.
    """

    hidden_dim: int
    n_layers: int
    chunk: int = 16
    remat: bool = False
    # 'pallas' fuses the within-block tail into one kernel with a
    # hand-written backward (ops/pallas/dag_block); measured v5e it wins
    # on the forward (3.4 vs 4.3 ms) but its backward loses to XLA AD
    # (45 vs 19 ms: Mosaic relayouts dominate the [B,C]×[B,C,D]
    # broadcast chain).  `impl` drives the grad-bearing (train) form;
    # `impl_eval` (empty = same as impl) lets the deterministic forward
    # take the kernel where it wins — DAGERCTrainer resolves dag_impl=auto
    # to impl='xla', impl_eval='pallas' on single-chip TPU (measured +10%
    # eval wall, BENCH_MATRIX.md).  The recurrence is latency-bound either
    # way — see BENCH_MATRIX.md for the roofline and large-batch points.
    impl: str = "auto"
    impl_eval: str = ""

    @nn.compact
    def __call__(self, H0, adj, s_mask, deterministic: bool = True):
        D = self.hidden_dim
        B, L, _ = H0.shape
        scale = 1.0 / jnp.sqrt(D)

        layers = []
        for l in range(self.n_layers):
            nm = f"layer_{l}"
            lp = {
                "att_w": self.param(f"{nm}_att_w", _uniform_init(1.0 / jnp.sqrt(2 * D)), (2 * D, 1)),
                "att_b": self.param(f"{nm}_att_b", _uniform_init(1.0 / jnp.sqrt(2 * D)), (1,)),
                "wr0": self.param(f"{nm}_Wr0", _uniform_init(scale), (D, D)),
                "wr1": self.param(f"{nm}_Wr1", _uniform_init(scale), (D, D)),
            }
            for cell in ("c", "p"):
                for pn, shp in (
                    ("w_ih", (3 * D, D)), ("w_hh", (3 * D, D)),
                    ("b_ih", (3 * D,)), ("b_hh", (3 * D,)),
                ):
                    lp[f"gru_{cell}_{pn}"] = self.param(
                        f"{nm}_gru_{cell}_{pn}", _uniform_init(scale), shp
                    )
            layers.append(lp)

        # pad L to a block multiple; padded rows carry zero adjacency and
        # their outputs are sliced off below
        C = max(1, min(self.chunk, L))
        Lp = -(-L // C) * C
        pad = Lp - L
        if pad:
            adjp = jnp.pad(adj, ((0, 0), (0, pad), (0, pad)))
            smp = jnp.pad(s_mask, ((0, 0), (0, pad), (0, pad)))
            H0p = jnp.pad(H0, ((0, 0), (0, pad), (0, 0)))
        else:
            adjp, smp, H0p = adj, s_mask, H0
        T = Lp // C

        # masks are ADDITIVE (−1e30), exactly like the per-step reference
        # form: when a row's predecessor set is empty the −1e30 cancels in
        # the softmax and the row falls back to softmax(raw logits) over
        # the unwritten (zero) keys — the reference's behavior on masked
        # positions.  Padded columns get −max-float so they drop out even
        # then.
        colpad = jnp.where(
            jnp.arange(Lp) < L, 0.0, jnp.finfo(H0.dtype).min
        ).astype(H0.dtype)
        addmask = -(1.0 - adjp) * 1e30 + colpad  # [B, Lp, Lp]

        # block-diagonal [T, B, C, C] views (within-block mask/speaker)
        def block_diag(m):
            return jnp.moveaxis(
                m.reshape(B, T, C, T, C).diagonal(axis1=1, axis2=3),
                (0, 3, 1, 2), (1, 0, 2, 3),
            )  # → [T, B, C, C]

        # `deterministic` is static at trace time, so the eval jit and the
        # train jit can resolve to different within-block forms while
        # sharing one parameter tree (the params above are form-agnostic).
        # Param init (also deterministic) stays on the XLA form — no point
        # paying the kernel compile before the first real eval.
        use_eval_impl = deterministic and not self.is_initializing()
        impl = (self.impl_eval or self.impl) if use_eval_impl else self.impl
        use_pallas = impl == "pallas"
        addmask_w = block_diag(addmask)
        sm_w = block_diag(smp)
        addmask_blk = jnp.moveaxis(addmask.reshape(B, T, C, Lp), 1, 0)
        sm_blk = jnp.moveaxis(smp.reshape(B, T, C, Lp), 1, 0)  # [T, B, C, Lp]
        NEG = jnp.finfo(H0.dtype).min / 2

        def run_layer(lp, h_in):
            """One DAG layer over all positions; h_in: [B, Lp, D]."""
            wq = lp["att_w"][:D, 0]
            wk = lp["att_w"][D:, 0]
            bias = lp["att_b"][0]
            # all projections that depend only on the layer INPUT are
            # hoisted into MXU-batched matmuls over every position at once:
            # q, the node-GRU input proj, and the proxy-GRU *hidden* proj
            # (its hidden state is h_in — dagerc_models.py:358 P = GRU(M, H))
            q = h_in @ wq  # [B, Lp]
            xc = h_in @ lp["gru_c_w_ih"].T + lp["gru_c_b_ih"]  # [B, Lp, 3D]
            hpp = h_in @ lp["gru_p_w_hh"].T + lp["gru_p_b_hh"]  # [B, Lp, 3D]
            # the two remaining M-dependent projections fuse into ONE matmul
            # per position, as does the (Wr0 | Wr1 | w_k) output transform
            Wm = jnp.concatenate(
                [lp["gru_c_w_hh"].T, lp["gru_p_w_ih"].T], axis=1
            )  # [D, 6D]
            bm = jnp.concatenate([lp["gru_c_b_hh"], lp["gru_p_b_ih"]])
            Wout = jnp.concatenate(
                [lp["wr0"].T, lp["wr1"].T, wk[:, None]], axis=1
            )  # [D, 2D+1]
            # per-gate stacks for the pallas kernel (Mosaic can't split at
            # non-128-aligned lane offsets, so the torch 3D packing stays
            # outside the kernel)
            Whc3 = jnp.stack(
                [lp["gru_c_w_hh"][g * D : (g + 1) * D].T for g in range(3)]
            )
            bhc3 = lp["gru_c_b_hh"].reshape(3, D)
            Wip3 = jnp.stack(
                [lp["gru_p_w_ih"][g * D : (g + 1) * D].T for g in range(3)]
            )
            bip3 = lp["gru_p_b_ih"].reshape(3, D)
            q_blk = jnp.moveaxis(q.reshape(B, T, C), 1, 0)  # [T, B, C]
            xc_blk = jnp.moveaxis(xc.reshape(B, T, C, 3 * D), 1, 0)
            hpp_blk = jnp.moveaxis(hpp.reshape(B, T, C, 3 * D), 1, 0)
            hin_blk = jnp.moveaxis(h_in.reshape(B, T, C, D), 1, 0)

            def block(carry, inp):
                V0, V1, K = carry  # [B, Lp, D] ×2, [B, Lp]
                qb, xcb, hppb, hb, amb, smb, amw, smw, t = inp
                # ---- prefix: this block's queries vs every column OUTSIDE
                # the current block.  Future columns' K/V rows are still
                # zero ("unwritten"), exactly like the per-step form — they
                # matter only for rows with empty predecessor sets, where
                # the cancelled −1e30 lets every column into the softmax
                # denominator (reference semantics on masked positions).
                j = jnp.arange(Lp)
                pre_cols = ((j < t * C) | (j >= t * C + C)).astype(H0.dtype)
                lpre = qb[:, :, None] + K[:, None, :] + bias + amb  # [B,C,Lp]
                lpre = jnp.where(pre_cols > 0, lpre, NEG)
                mp = lpre.max(-1)  # [B, C]; ≥ NEG (finite) by construction
                ep = jnp.exp(lpre - mp[..., None]) * pre_cols  # [B, C, Lp]
                den_p = ep.sum(-1)  # [B, C]
                e0 = ep * smb
                num0 = jnp.einsum("bcj,bjd->bcd", e0, V0)
                num1 = jnp.einsum("bcj,bjd->bcd", ep - e0, V1)
                # ---- within-block sequential recurrence
                if use_pallas:
                    from erc_tpu.ops.pallas.dag_block import dag_block

                    flag = (t == 0).astype(jnp.int32)[None]
                    h1b, V0w, V1w, Kw = dag_block(
                        flag, qb + bias,
                        xcb.reshape(B, C, 3, D), hppb.reshape(B, C, 3, D),
                        hb, num0 + num1, den_p, mp, amw, smw,
                        Whc3, bhc3, Wip3, bip3,
                        lp["wr0"].T, lp["wr1"].T, wk[:, None],
                    )
                    start = t * C
                    V0 = jax.lax.dynamic_update_slice(V0, V0w, (0, start, 0))
                    V1 = jax.lax.dynamic_update_slice(V1, V1w, (0, start, 0))
                    K = jax.lax.dynamic_update_slice(K, Kw, (0, start))
                    return (V0, V1, K), h1b
                V0w = jnp.zeros((B, C, D), H0.dtype)
                V1w = jnp.zeros((B, C, D), H0.dtype)
                Kw = jnp.zeros((B, C), H0.dtype)
                h1s = []
                for c in range(C):
                    lw = qb[:, c, None] + Kw + bias + amw[:, c]  # [B, C]
                    mw = lw.max(-1)  # [B]
                    ew = jnp.exp(lw - mw[:, None])
                    e0w = ew * smw[:, c]
                    n0w = jnp.einsum("bj,bjd->bd", e0w, V0w)
                    n1w = jnp.einsum("bj,bjd->bd", ew - e0w, V1w)
                    dnw = ew.sum(-1)
                    # combine the two softmax halves (running-max rescale)
                    m = jnp.maximum(mp[:, c], mw)
                    sp = jnp.exp(mp[:, c] - m)[:, None]
                    sw = jnp.exp(mw - m)[:, None]
                    den = den_p[:, c, None] * sp + dnw[:, None] * sw
                    M = (
                        (num0[:, c] + num1[:, c]) * sp + (n0w + n1w) * sw
                    ) / den
                    if c == 0:
                        M = jnp.where(t == 0, 0.0, M)
                    mm = M @ Wm + bm  # fused: node-GRU hidden ⊕ proxy-GRU input
                    Cg = gru_cell_proj(xcb[:, c], mm[:, : 3 * D], M)
                    P = gru_cell_proj(mm[:, 3 * D :], hppb[:, c], hb[:, c])
                    h1 = Cg + P
                    h1s.append(h1)
                    out = h1 @ Wout  # fused: (Wr0 | Wr1 | w_k)
                    V0w = V0w.at[:, c].set(out[:, :D])
                    V1w = V1w.at[:, c].set(out[:, D : 2 * D])
                    Kw = Kw.at[:, c].set(out[:, 2 * D])
                # fold the finished block into the prefix buffers (one DUS)
                start = t * C
                V0 = jax.lax.dynamic_update_slice(V0, V0w, (0, start, 0))
                V1 = jax.lax.dynamic_update_slice(V1, V1w, (0, start, 0))
                K = jax.lax.dynamic_update_slice(K, Kw, (0, start))
                return (V0, V1, K), jnp.stack(h1s, axis=1)  # [B, C, D]

            body = jax.checkpoint(block) if self.remat else block
            zeros = jnp.zeros((B, Lp, D), H0.dtype)
            init = (zeros, zeros, jnp.zeros((B, Lp), H0.dtype))
            _, ys = jax.lax.scan(
                body,
                init,
                (q_blk, xc_blk, hpp_blk, hin_blk, addmask_blk, sm_blk,
                 addmask_w, sm_w, jnp.arange(T)),
            )
            # ys: [T, B, C, D] → [B, Lp, D]
            return jnp.moveaxis(ys, 0, 1).reshape(B, Lp, D)

        outs = []
        h = H0p
        for lp in layers:
            h = run_layer(lp, h)
            outs.append(h[:, :L])
        return outs


class AttentiveNodeFeatures(nn.Module):
    """Final nodal attention over the stacked features
    (dagerc_models.py:425-466): alpha = softmax(tanh(transform(H) @ Hᵀ)),
    masked to valid (and, for 'past', causal) positions then renormalized.
    The reference's reimplement config keeps nodal_att_type=None
    (dagerc.py:83); this module backs the 'global'/'past' settings a user
    can select the same way (--nodal_att_type)."""

    @nn.compact
    def __call__(self, features, mask, nodal_att_type: str):
        # features [B, N, V]; mask [B, N] (1 = valid)
        m = mask[:, None, :].astype(features.dtype)  # (B, 1, N)
        if nodal_att_type == "past":
            N = features.shape[1]
            m = m * jnp.tril(jnp.ones((N, N), features.dtype))[None]
        x = nn.Dense(features.shape[-1], name="transform")(features)
        scores = jnp.einsum("bnv,bmv->bnm", x, features)
        alpha = jax.nn.softmax(jnp.tanh(scores), -1) * m
        alpha = alpha / jnp.maximum(alpha.sum(-1, keepdims=True), 1e-20)
        return jnp.einsum("bnm,bmv->bnv", alpha, features)


class DAGERCModule(nn.Module):
    """fused=True (default) runs the blockwise-prefix DAGStack (see its
    docstring); fused=False chains per-layer DAGLayer scans — the
    reference-shaped form kept as the parity oracle (test_dagerc_layer
    fused↔layered, test_model_torch_parity vs the reference loops)."""

    emb_dim: int
    n_classes: int
    gnn_layers: int = 4
    hidden_dim: int = 300
    windowp: int = 1
    drop_rate: float = 0.2
    fused: bool = True
    chunk: int = 16
    remat: bool = False
    impl: str = "auto"
    impl_eval: str = ""
    nodal_att_type: str = ""  # "" (None) | "global" | "past"

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        x = batch["input_tensor"]
        mask = batch["attention_mask"]
        speakers = batch["speaker_ids"]
        lengths = batch["text_length"]
        L = x.shape[1]

        adj = graphs.dag_adjacency(speakers, lengths, L, self.windowp)
        s_mask = graphs.same_speaker_mask(speakers)

        H0 = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(x))
        if self.fused:
            ys = DAGStack(
                self.hidden_dim, self.gnn_layers,
                chunk=self.chunk, remat=self.remat, impl=self.impl,
                impl_eval=self.impl_eval,
                name="stack",
            )(H0, adj, s_mask, deterministic=deterministic)
            Hs = [H0] + list(ys)
        else:
            Hs = [H0]
            for l in range(self.gnn_layers):
                Hs.append(DAGLayer(self.hidden_dim, name=f"layer_{l}")(Hs[-1], adj, s_mask))
        H = jnp.concatenate(Hs + [x], axis=-1)
        if self.nodal_att_type:
            H = AttentiveNodeFeatures(name="nodal_att")(
                H, mask, self.nodal_att_type
            )

        # out_mlp (dagerc.py:99-106); attentive_node_features is identity
        # for nodal_att_type=None (dagerc.py:83, dagerc_models.py:441-442)
        h = nn.relu(nn.Dense(self.hidden_dim, name="out_0")(H))
        h = nn.relu(nn.Dense(self.hidden_dim, name="out_1")(h))
        if not deterministic and self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate)(h, deterministic=False)
        return nn.Dense(self.n_classes, name="out_2")(h)


def resolve_dag_impl(dag_impl: str, backend: str, mesh_size: int):
    """Map the --dag_impl knob to (train_impl, eval_impl).

    'auto' keeps XLA for the grad-bearing train step (the pallas kernel's
    hand-written backward loses to XLA AD + block remat) but takes the
    fused pallas forward for the deterministic eval step on single-chip
    TPU, where it measured +10% eval wall (BENCH_MATRIX.md).  Multi-chip
    meshes stay on XLA: a pallas_call is a manually-partitioned custom
    call, and the eval batch axis is sharded by NamedSharding — the XLA
    form partitions for free, the kernel would not.
    """
    if dag_impl == "auto":
        if backend == "tpu" and mesh_size == 1:
            return "xla", "pallas"
        return "xla", "xla"
    return dag_impl, dag_impl


class DAGERCTrainer(Trainer):
    def imodels(self, params: ParamsType):
        impl, impl_eval = resolve_dag_impl(
            str(params.get("dag_impl", "auto")),
            jax.default_backend(), self.mesh.size,
        )
        self.model = DAGERCModule(
            emb_dim=params.hidden_all,
            n_classes=params.n_classes,
            gnn_layers=int(params.gnn_layers),
            hidden_dim=int(params.hidden_dim),
            windowp=int(params.windowp),
            drop_rate=float(params.dropout),
            chunk=int(params.get("dag_chunk", 16)),
            remat=bool(params.get("dag_remat", True)),
            impl=impl,
            impl_eval=impl_eval,
            nodal_att_type=str(params.get("nodal_att_type", "") or ""),
        )
        # grad clip 5.0 (dagerc.py:230)
        self.tx = optim_factory.build_optim(params.optim, grad_clip_norm=5.0)
        self.lr_sche = optim_factory.ReduceLROnPlateau(mode="min")


main = partial(_main, DAGERCTrainer, DAGERCParams)
