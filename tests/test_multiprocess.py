"""Real multi-PROCESS validation (VERDICT r2 item 4).

Launches scripts/mp_worker.py as 2 actual OS processes federated over a
localhost coordinator (CPU backend, gloo collectives) — the
reference-equivalent surface is the DDP launch (lumo trainer.py:62-68 +
experiment.py:72-88) — plus a 1-process control, and asserts:

  * both workers federate into one 2-device jax runtime,
  * the broadcast test_name is shared (one run dir across processes),
  * each process's first-batch loader slice is a strided share whose
    union is exactly the single-process global batch,
  * the per-step training losses match the single-process run (the
    global batch is row-permuted across processes; mean CE is
    permutation-invariant),
  * test() reports identical metrics on every process (eval stats are
    allgathered before metric computation — no replica desync).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(nproc: int, tmp, steps: int = 3, timeout: int = 600, mode: str = "steps",
            epoch: int = 2, exproot: str = "", tag: str = ""):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    procs, outs = [], []
    for pid in range(nproc):
        out = str(tmp / f"mp_{tag}{nproc}_{pid}.json")
        outs.append(out)
        cmd = [
            sys.executable, WORKER,
            "--coordinator", f"localhost:{port}",
            "--num_processes", str(nproc),
            "--process_id", str(pid),
            "--out", out,
            "--steps", str(steps),
            "--mode", mode,
            "--epoch", str(epoch),
        ]
        if exproot:
            cmd += ["--exproot", exproot]
        procs.append(
            subprocess.Popen(
                cmd,
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for pr in procs:
        try:
            stdout, _ = pr.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for pr, log in zip(procs, logs):
        assert pr.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.load(open(o)) for o in outs]


@pytest.mark.multiprocess
def test_two_process_train_matches_single(tmp_path):
    single = _launch(1, tmp_path)[0]
    r0, r1 = _launch(2, tmp_path)

    # federated runtime: 2 global devices, 1 local each
    assert r0["device_count"] == 2 and r0["local_device_count"] == 1
    assert r1["device_count"] == 2 and r1["local_device_count"] == 1

    # one experiment dir: process 0 derives, broadcast shares it
    assert r0["test_name"] == r1["test_name"]

    # strided loader slices reassemble the single-process global batch
    lab0, lab1 = r0["first_batch_labels"], r1["first_batch_labels"]
    assert sorted(lab0 + lab1) == sorted(single["first_batch_labels"])
    assert len(lab0) > 0 and len(lab1) > 0

    # training losses equal the single-process trajectory (permutation-
    # invariant mean CE; same init/keys via the shared seed)
    np.testing.assert_allclose(r0["losses"], single["losses"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)

    # test() metrics identical across processes and equal to the control
    assert r0["n_test_rows"] == r1["n_test_rows"] == single["n_test_rows"]
    assert r0["test_f1"] == pytest.approx(r1["test_f1"], abs=0)
    assert r0["test_f1"] == pytest.approx(single["test_f1"], abs=1e-6)
    assert r0["test_Lall"] == pytest.approx(r1["test_Lall"], abs=0)
    assert r0["test_Lall"] == pytest.approx(single["test_Lall"], rel=2e-5)


@pytest.mark.multiprocess
def test_four_process_train_matches_single(tmp_path):
    """N=4 federation (VERDICT r3 item 6): four strided loader slices
    reassemble the global batch and the loss trajectory still equals the
    single-process control."""
    single = _launch(1, tmp_path, tag="s4_")[0]
    rs = _launch(4, tmp_path, tag="q_")

    for r in rs:
        assert r["device_count"] == 4 and r["local_device_count"] == 1
        assert r["test_name"] == rs[0]["test_name"]
        np.testing.assert_allclose(r["losses"], rs[0]["losses"], rtol=1e-6)
        assert r["n_test_rows"] == single["n_test_rows"]
        assert r["test_f1"] == pytest.approx(rs[0]["test_f1"], abs=0)

    all_labels = sorted(sum((r["first_batch_labels"] for r in rs), []))
    assert all_labels == sorted(single["first_batch_labels"])
    assert all(len(r["first_batch_labels"]) > 0 for r in rs)

    np.testing.assert_allclose(rs[0]["losses"], single["losses"],
                               rtol=2e-5, atol=2e-6)
    assert rs[0]["test_f1"] == pytest.approx(single["test_f1"], abs=1e-6)


@pytest.mark.multiprocess
def test_federated_preemption_resume(tmp_path):
    """Preemption-resume UNDER multi-process (VERDICT r3 item 6 /
    ADVICE r3 sibling-desync hazard): a 2-process run trains 2 epochs with
    epoch checkpoints, is killed, and is relaunched with --resume and a
    longer --epoch into a FRESH test dir.  Every process must restore the
    same sibling checkpoint (same eidx) — a split-brain resume (one
    process resuming, the other starting at epoch 0) would desync the
    collectives — and the continued trajectory must equal a 1-process
    straight-through control."""
    exproot = str(tmp_path / "shared_exp")

    # control: 3 epochs straight through, single process
    ctl = _launch(1, tmp_path, mode="full", epoch=3,
                  exproot=str(tmp_path / "ctl_exp"), tag="ctl_")[0]
    assert ctl["eidx_at_begin"] == 0 and len(ctl["checkpoints"]) > 0

    # phase A: 2-process run, 2 epochs, epoch checkpoints (process 0 writes)
    ph_a = _launch(2, tmp_path, mode="full", epoch=2, exproot=exproot, tag="a_")
    assert ph_a[0]["test_name"] == ph_a[1]["test_name"]
    assert ph_a[0]["checkpoints"], "phase A wrote no checkpoints"
    n_steps_per_epoch = len(ctl["losses"]) // 3
    np.testing.assert_allclose(ph_a[0]["losses"], ph_a[1]["losses"], rtol=1e-6)
    np.testing.assert_allclose(ph_a[0]["losses"],
                               ctl["losses"][: 2 * n_steps_per_epoch],
                               rtol=2e-5, atol=2e-6)

    # phase B: relaunch with --resume and --epoch=3 (fresh test dir, same
    # experiment root): AutoResume sibling fallback must fire on BOTH
    ph_b = _launch(2, tmp_path, mode="resume", epoch=3, exproot=exproot, tag="b_")
    assert ph_b[0]["test_name"] == ph_b[1]["test_name"]
    assert ph_b[0]["test_name"] != ph_a[0]["test_name"]  # fresh test dir
    for r in ph_b:
        # both processes restored the epoch-2 boundary — no split brain
        assert r["eidx_at_begin"] == 2, r
        assert len(r["losses"]) == n_steps_per_epoch
    np.testing.assert_allclose(ph_b[0]["losses"], ph_b[1]["losses"], rtol=1e-6)
    # continued trajectory equals the straight-through control's 3rd epoch
    np.testing.assert_allclose(ph_b[0]["losses"],
                               ctl["losses"][2 * n_steps_per_epoch:],
                               rtol=2e-5, atol=2e-6)
    assert ph_b[0]["global_steps"] == ctl["global_steps"]
