"""Round-5 regression tests: floor gating semantics, dryrun structure.

The throughput floors are product-level regression gates (README
"Benchmarks"); their *gating logic* must itself be tested or a refactor
could silently stop asserting anything (the r4 ADVICE found three such
soft spots: impl-blind floors, spc-blind gating, over-tight banded
bounds).
"""

import sys

sys.path.insert(0, ".")

import bench  # noqa: E402
import __graft_entry__ as graft  # noqa: E402

SLOW = {"train_dps": 1.0, "eval_dps": 1.0}
FAST = {"train_dps": 9e9, "eval_dps": 9e9}


def test_floor_key_resolution():
    # impl-keyed models resolve to their benched impl; 'auto' is unsized
    assert bench._floor_key("cogmen", "dense", 32) == ("cogmen", "dense", 32)
    assert bench._floor_key("dgcn", "banded", 32) == ("dgcn", "banded", 32)
    assert bench._floor_key("cogmen", "auto", 32) is None
    # impl-less models ignore the --graph-impl arg entirely
    assert bench._floor_key("dagerc", "dense", 128) == ("dagerc", None, 128)


def test_floors_assert_only_at_keyed_configs():
    # both floors trip at the parity config
    assert len(bench.check_floors("cogmen", "dense", SLOW, 32, 96, 8, ())) == 2
    # spc=1 measures per-batch dispatch — never asserted (ADVICE r4 low#3)
    assert bench.check_floors("cogmen", "dense", SLOW, 32, 96, 1, ()) == []
    # --set overrides change the program — never asserted
    assert bench.check_floors("cogmen", "dense", SLOW, 32, 96, 8, ("x=1",)) == []
    # non-keyed batch size — no floor
    assert bench.check_floors("cogmen", "dense", SLOW, 48, 96, 8, ()) == []
    # non-parity max_len — no floor
    assert bench.check_floors("cogmen", "dense", SLOW, 32, 64, 8, ()) == []
    # auto impl — no floor (resolution is the model's decision)
    assert bench.check_floors("cogmen", "auto", SLOW, 32, 96, 8, ()) == []


def test_floors_are_per_impl():
    # a rate that clears banded's floor but not dense's must FAIL for
    # dense and PASS for banded (VERDICT r4 weak#2 / ADVICE medium)
    mid = {"train_dps": 7000.0, "eval_dps": 22000.0}
    assert bench.check_floors("dgcn", "dense", mid, 32, 96, 8, ())  # fails
    assert bench.check_floors("dgcn", "banded", mid, 32, 96, 8, ()) == []


def test_max_throughput_rows_have_floors():
    # the measured operating points are gated too (VERDICT r4 weak#4)
    assert len(bench.check_floors("cogmen", "dense", SLOW, 256, 96, 8, ())) >= 1
    assert len(bench.check_floors("dagerc", None, SLOW, 128, 96, 8, ())) >= 1
    assert bench.check_floors("cogmen", "dense", FAST, 256, 96, 8, ()) == []


def test_every_floor_key_is_benchable():
    for model, impl, _bs in list(bench.THROUGHPUT_FLOORS_DPS) + list(
        bench.EVAL_FLOORS_DPS
    ):
        assert model in bench.MODEL_REGISTRY
        impl_key, impls = bench.MODEL_IMPLS[model]
        if impl_key is None:
            assert impl is None
        else:
            assert impl in impls


def test_device_tile_repeats_and_truncates():
    # the --zoo-floors staged-data cap: [K_u, ...] stacks tile up to the
    # exact target row count on device (repeat + truncate)
    import numpy as np

    tree = {"a": np.arange(12).reshape(2, 6), "b": np.ones((2, 3, 4))}
    out = bench._device_tile(tree, 16)
    assert out["a"].shape == (16, 6) and out["b"].shape == (16, 3, 4)
    np.testing.assert_array_equal(np.asarray(out["a"][:2]), tree["a"])
    np.testing.assert_array_equal(np.asarray(out["a"][2:4]), tree["a"])
    # non-divisible target truncates the last repeat
    out = bench._device_tile({"a": np.arange(9).reshape(3, 3)}, 8)
    assert out["a"].shape == (8, 3)
    np.testing.assert_array_equal(
        np.asarray(out["a"][6:]), np.arange(6).reshape(2, 3)
    )


def test_dryrun_covers_all_families_riskiest_first():
    fams = set(graft._dryrun_families())
    assert set(graft._DRYRUN_ORDER) == fams, "every family must run on DP"
    assert len(graft._DRYRUN_ORDER) == len(fams)
    # the r4-unconfirmed families lead
    assert graft._DRYRUN_ORDER[:3] == ["dgcnv2_daily", "mmin_base", "mmin_miss2"]
    # DP×TP hazard subset is a subset of the families, dagerc (the 153 s
    # outlier) last so the budget check skips it first
    assert set(graft._DP_TP_SUBSET) <= fams
    assert graft._DP_TP_SUBSET[-1] == "dagerc"
    assert graft._DRYRUN_BUDGET_S <= 720.0, "must fit the driver budget"
