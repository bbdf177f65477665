"""Empirical cost split of the blockwise DAGStack on the chip.

The axon tunnel returns no op-level traces, so this ablates the layer
forward into its parts and times each (timing ends with a value fetch —
bench._force semantics):

  full        — the real blockwise layer (prefix matmuls + inner loop)
  prefix_only — drop the within-block sequential recurrence
  inner_only  — drop the prefix matmuls
  gru_only    — inner loop with attention ops removed (GRU chain alone)

Also times fwd vs fwd+bwd of the full form.  Numbers guide where the
next optimization (pallas fusion vs matmul restructure) should land.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from erc_tpu.ops.rnn import gru_cell_proj

B, L, D, NL, C = 32, 96, 300, 4, 16
T = L // C


def make_inputs(seed=0):
    r = np.random.default_rng(seed)
    H0 = jnp.asarray(r.normal(size=(B, L, D)).astype(np.float32))
    adj = jnp.asarray((r.random((B, L, L)) < 0.05).astype(np.float32))
    adj = adj * np.tril(np.ones((L, L), np.float32), -1)
    sm = jnp.asarray((r.random((B, L, L)) < 0.5).astype(np.float32))
    w = {
        "wq": jnp.asarray(r.normal(size=(D,)).astype(np.float32) * 0.05),
        "wk": jnp.asarray(r.normal(size=(D,)).astype(np.float32) * 0.05),
        "b": jnp.float32(0.0),
        "Wm": jnp.asarray(r.normal(size=(D, 6 * D)).astype(np.float32) * 0.05),
        "bm": jnp.zeros((6 * D,), jnp.float32),
        "Wxc": jnp.asarray(r.normal(size=(D, 3 * D)).astype(np.float32) * 0.05),
        "Whp": jnp.asarray(r.normal(size=(D, 3 * D)).astype(np.float32) * 0.05),
        "Wout": jnp.asarray(r.normal(size=(D, 2 * D + 1)).astype(np.float32) * 0.05),
    }
    return H0, adj, sm, w


def layer(h_in, adj, sm, w, mode="full"):
    addmask = -(1.0 - adj) * 1e30
    q = h_in @ w["wq"]
    xc = h_in @ w["Wxc"]
    hpp = h_in @ w["Whp"]
    q_blk = jnp.moveaxis(q.reshape(B, T, C), 1, 0)
    xc_blk = jnp.moveaxis(xc.reshape(B, T, C, 3 * D), 1, 0)
    hpp_blk = jnp.moveaxis(hpp.reshape(B, T, C, 3 * D), 1, 0)
    hin_blk = jnp.moveaxis(h_in.reshape(B, T, C, D), 1, 0)
    am_blk = jnp.moveaxis(addmask.reshape(B, T, C, L), 1, 0)
    sm_blk = jnp.moveaxis(sm.reshape(B, T, C, L), 1, 0)
    amw = jnp.moveaxis(addmask.reshape(B, T, C, T, C).diagonal(axis1=1, axis2=3), (0, 3, 1, 2), (1, 0, 2, 3))
    smw = jnp.moveaxis(sm.reshape(B, T, C, T, C).diagonal(axis1=1, axis2=3), (0, 3, 1, 2), (1, 0, 2, 3))
    NEG = jnp.finfo(jnp.float32).min / 2

    def block(carry, inp):
        V0, V1, K = carry
        qb, xcb, hppb, hb, amb, smb, amwb, smwb, t = inp
        j = jnp.arange(L)
        pre_cols = ((j < t * C) | (j >= t * C + C)).astype(jnp.float32)
        if mode in ("full", "prefix_only"):
            lpre = qb[:, :, None] + K[:, None, :] + amb
            lpre = jnp.where(pre_cols > 0, lpre, NEG)
            mp = lpre.max(-1)
            ep = jnp.exp(lpre - mp[..., None]) * pre_cols
            den_p = ep.sum(-1)
            e0 = ep * smb
            num0 = jnp.einsum("bcj,bjd->bcd", e0, V0)
            num1 = jnp.einsum("bcj,bjd->bcd", ep - e0, V1)
        else:
            mp = jnp.zeros((B, C)) + NEG
            den_p = jnp.zeros((B, C))
            num0 = num1 = jnp.zeros((B, C, D))
        V0w = jnp.zeros((B, C, D))
        V1w = jnp.zeros((B, C, D))
        Kw = jnp.zeros((B, C))
        h1s = []
        for c in range(C):
            if mode in ("full", "inner_only"):
                lw = qb[:, c, None] + Kw + amwb[:, c]
                mw = lw.max(-1)
                ew = jnp.exp(lw - mw[:, None])
                e0w = ew * smwb[:, c]
                n0w = jnp.einsum("bj,bjd->bd", e0w, V0w)
                n1w = jnp.einsum("bj,bjd->bd", ew - e0w, V1w)
                dnw = ew.sum(-1)
                m = jnp.maximum(mp[:, c], mw)
                sp = jnp.exp(mp[:, c] - m)[:, None]
                sw = jnp.exp(mw - m)[:, None]
                den = den_p[:, c, None] * sp + dnw[:, None] * sw
                M = ((num0[:, c] + num1[:, c]) * sp + (n0w + n1w) * sw) / jnp.maximum(den, 1e-20)
            elif mode == "prefix_only":
                M = (num0[:, c] + num1[:, c]) / jnp.maximum(den_p[:, c, None], 1e-20)
            else:  # gru_only
                M = hb[:, c] * 0.1
            mm = M @ w["Wm"] + w["bm"]
            Cg = gru_cell_proj(xcb[:, c], mm[:, : 3 * D], M)
            P = gru_cell_proj(mm[:, 3 * D :], hppb[:, c], hb[:, c])
            h1 = Cg + P
            h1s.append(h1)
            out = h1 @ w["Wout"]
            V0w = V0w.at[:, c].set(out[:, :D])
            V1w = V1w.at[:, c].set(out[:, D : 2 * D])
            Kw = Kw.at[:, c].set(out[:, 2 * D])
        start = t * C
        V0 = jax.lax.dynamic_update_slice(V0, V0w, (0, start, 0))
        V1 = jax.lax.dynamic_update_slice(V1, V1w, (0, start, 0))
        K = jax.lax.dynamic_update_slice(K, Kw, (0, start))
        return (V0, V1, K), jnp.stack(h1s, axis=1)

    zeros = jnp.zeros((B, L, D))
    init = (zeros, zeros, jnp.zeros((B, L)))
    _, ys = jax.lax.scan(
        block, init,
        (q_blk, xc_blk, hpp_blk, hin_blk, am_blk, sm_blk, amw, smw, jnp.arange(T)),
    )
    return jnp.moveaxis(ys, 0, 1).reshape(B, L, D)


def model(H0, adj, sm, w, mode):
    h = H0
    for _ in range(NL):
        h = layer(h, adj, sm, w, mode)
    return h


def timeit(fn, *args, reps=20):
    o = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[0]))
    return (time.perf_counter() - t0) / reps


def main():
    H0, adj, sm, w = make_inputs()
    for mode in ("full", "prefix_only", "inner_only", "gru_only"):
        f = jax.jit(lambda H0, adj, sm, w, m=mode: model(H0, adj, sm, w, m))
        dt = timeit(f, H0, adj, sm, w)
        print(f"fwd {mode:12s}: {dt*1e3:7.2f} ms")
    g = jax.jit(jax.grad(lambda H0, adj, sm, w: model(H0, adj, sm, w, "full").sum(), argnums=(0, 3)))
    dt = timeit(g, H0, adj, sm, w)
    print(f"fwd+bwd full    : {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
