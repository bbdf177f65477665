"""Native C++ collate runtime: build, bindings, numpy parity, prefetch."""

import numpy as np

from erc_tpu import native
from erc_tpu.data.loader import DialogueLoader, PrefetchLoader
from erc_tpu.data.collate import ERCBatcher
from erc_tpu.data.synthetic import synthetic_erc


def test_native_lib_builds():
    lib = native.get_lib()
    assert lib is not None, "libcollate.so failed to build (g++ missing?)"


def test_pack_rows_matches_numpy():
    rng = np.random.default_rng(0)
    rows = [rng.normal(size=(n, 7)).astype(np.float32) for n in (5, 2, 9)] + [None]
    lens = np.array([5, 2, 9, 0], np.int32)
    out = native.pack_rows(rows, lens, L=6, D=7)
    assert out.shape == (4, 6, 7)
    np.testing.assert_array_equal(out[0, :5], rows[0][:5])
    np.testing.assert_array_equal(out[0, 5:], 0)
    np.testing.assert_array_equal(out[2], rows[2][:6])  # truncated to L
    np.testing.assert_array_equal(out[3], 0)


def test_pack_labels_and_mask():
    rows = [np.array([1, 2, 3], np.int32), np.array([7], np.int32)]
    lens = np.array([3, 1], np.int32)
    lab = native.pack_labels(rows, lens, L=4, fill=-1)
    np.testing.assert_array_equal(lab, [[1, 2, 3, -1], [7, -1, -1, -1]])
    mask = native.fill_mask(lens, 4)
    np.testing.assert_array_equal(mask, [[1, 1, 1, 0], [1, 0, 0, 0]])


def test_collate_native_consistency():
    """ERCBatcher output is identical whether the .so loaded or not."""
    samples = synthetic_erc("iemocap-cogmen", 6, n_train=5, min_len=4, max_len=12)
    b = ERCBatcher("atv", 6, 2, max_len=16, pad_batch_to=8)
    out1 = b(samples)
    # force the numpy fallback
    saved = native._lib
    try:
        native._lib = None
        native._tried = True
        out2 = b(samples)
    finally:
        native._lib = saved
    for k in out1:
        if out1[k] is not None:
            np.testing.assert_array_equal(out1[k], out2[k], err_msg=k)


def test_prefetch_loader_same_batches():
    samples = synthetic_erc("iemocap-cogmen", 6, n_train=20, min_len=4, max_len=12)
    mk = lambda: DialogueLoader(
        samples, ERCBatcher("atv", 6, 2, max_len=16), batch_size=8, shuffle=True, seed=3
    )
    direct = list(mk())
    prefetched = list(PrefetchLoader(mk()))
    assert len(direct) == len(prefetched) == 3
    for a, b in zip(direct, prefetched):
        np.testing.assert_array_equal(a["input_tensor"], b["input_tensor"])
        np.testing.assert_array_equal(a["label"], b["label"])
