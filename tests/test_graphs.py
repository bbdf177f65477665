"""Graph-construction parity: masked-dense formulations vs loopy oracles
that mirror the reference algorithms (cogmen_utils.edge_perms/batch_graphify,
dagerc.get_adj_v1/get_s_mask, mmgcn create_big_adj)."""

import numpy as np
import pytest

from erc_tpu.ops import graphs


def edge_perms_oracle(length, wp, wf):
    """Loopy re-derivation of cogmen_utils.py:147-172 semantics."""
    out = set()
    arr = np.arange(length)
    for j in range(length):
        if wp == -1 and wf == -1:
            eff = arr
        elif wp == -1:
            eff = arr[: min(length, j + wf + 1)]
        elif wf == -1:
            eff = arr[max(0, j - wp):]
        else:
            eff = arr[max(0, j - wp): min(length, j + wf + 1)]
        for item in eff:
            out.add((j, int(item)))
    return out


@pytest.mark.parametrize("wp,wf", [(5, 5), (10, 10), (-1, -1), (2, -1), (-1, 3), (1, 0)])
def test_window_adjacency_matches_edge_perms(wp, wf):
    lengths = np.array([7, 3, 12])
    L = 12
    adj = np.asarray(graphs.window_adjacency(lengths, L, wp, wf))
    for b, ln in enumerate(lengths):
        want = edge_perms_oracle(ln, wp, wf)
        got = {(u, v) for u in range(L) for v in range(L) if adj[b, u, v] > 0}
        assert got == want, f"b={b} len={ln}"


def test_relation_ids_match_edge_type_grammar():
    n_speakers = 2
    edge_type_to_idx = {}
    for j in range(n_speakers):
        for k in range(n_speakers):
            edge_type_to_idx[f"{j}{k}0"] = len(edge_type_to_idx)
            edge_type_to_idx[f"{j}{k}1"] = len(edge_type_to_idx)
    spk = np.array([[0, 1, 1, 0, 1]])
    rel = np.asarray(graphs.relation_ids(spk, n_speakers))
    for u in range(5):
        for v in range(5):
            c = "0" if u < v else "1"
            want = edge_type_to_idx[f"{spk[0, u]}{spk[0, v]}{c}"]
            assert rel[0, u, v] == want, (u, v)


def get_adj_v1_oracle(speakers, max_len, windowp):
    """Direct port of dagerc.py:109-129."""
    out = []
    for speaker in speakers:
        a = np.zeros((max_len, max_len))
        for i, s in enumerate(speaker):
            cnt = 0
            for j in range(i - 1, -1, -1):
                a[i, j] = 1
                if speaker[j] == s:
                    cnt += 1
                    if cnt == windowp:
                        break
        out.append(a)
    return np.stack(out)


@pytest.mark.parametrize("windowp", [1, 2, 3])
def test_dag_adjacency_matches_get_adj_v1(windowp):
    rng = np.random.default_rng(0)
    B, L = 4, 11
    spk = rng.integers(0, 2, (B, L))
    lengths = np.array([L, 7, 1, 5])
    adj = np.asarray(graphs.dag_adjacency(spk, lengths, L, windowp))
    for b in range(B):
        ln = lengths[b]
        want = get_adj_v1_oracle([spk[b, :ln].tolist()], ln, windowp)[0]
        np.testing.assert_array_equal(adj[b, :ln, :ln], want, err_msg=f"b={b}")
        # padded region all zero
        assert adj[b, ln:].sum() == 0 and adj[b, :, ln:].sum() == 0


def test_same_speaker_mask():
    spk = np.array([[0, 1, 0]])
    s = np.asarray(graphs.same_speaker_mask(spk))
    np.testing.assert_array_equal(s[0], [[1, 0, 1], [0, 1, 0], [1, 0, 1]])


def test_mmgcn_big_adjacency_matches_reference_loop():
    """Oracle ports mmgcn_models.py:582-646 (single dialogue, 3 modals)."""
    rng = np.random.default_rng(1)
    ln, D = 5, 8
    a, v, l = (rng.normal(size=(ln, D)).astype(np.float32) for _ in range(3))

    def cosblock(x):
        n = x / np.linalg.norm(x, axis=1, keepdims=True)
        cos = (n @ n.T) * 0.99999
        return 1 - np.arccos(np.clip(cos, -1, 1)) / np.pi

    feats = [a, v, l]
    M = 3
    big = np.zeros((M * ln, M * ln))
    for m in range(M):
        for n_ in range(M):
            if m == n_:
                big[m * ln:(m + 1) * ln, n_ * ln:(n_ + 1) * ln] = cosblock(feats[m])
            else:
                x, y = feats[m], feats[n_]
                nx = x / np.linalg.norm(x, axis=1, keepdims=True)
                ny = y / np.linalg.norm(y, axis=1, keepdims=True)
                cos = np.sum(nx * ny, 1) * 0.99999
                sim = 1 - np.arccos(np.clip(cos, -1, 1)) / np.pi
                big[m * ln:(m + 1) * ln, n_ * ln:(n_ + 1) * ln][np.arange(ln), np.arange(ln)] = sim
    d = big.sum(1)
    Dm = np.diag(d ** -0.5)
    want = Dm @ big @ Dm

    valid = np.ones((1, ln), np.float32)
    got = np.asarray(
        graphs.mmgcn_big_adjacency([f[None] for f in feats], valid)
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mmgcn_big_adjacency_padded_invariance():
    """Padding rows must not change the valid block (block-diagonal graph)."""
    rng = np.random.default_rng(2)
    ln, L, D = 4, 7, 6
    feats = [rng.normal(size=(1, ln, D)).astype(np.float32) for _ in range(2)]
    padded = [np.zeros((1, L, D), np.float32) for _ in range(2)]
    for f, p in zip(feats, padded):
        p[:, :ln] = f
    valid_s = np.ones((1, ln), np.float32)
    valid_p = np.zeros((1, L), np.float32)
    valid_p[:, :ln] = 1
    small = np.asarray(graphs.mmgcn_big_adjacency(feats, valid_s))[0]
    big = np.asarray(graphs.mmgcn_big_adjacency(padded, valid_p))[0]
    # extract the valid rows/cols of the padded version
    sel = np.concatenate([np.arange(ln), L + np.arange(ln)])
    np.testing.assert_allclose(big[np.ix_(sel, sel)], small, rtol=1e-5, atol=1e-6)
