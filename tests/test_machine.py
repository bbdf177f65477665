"""Machine config (.erc_tpurc.json), git working-tree snapshots, CLI
init/extract verbs."""

import json
import os
import subprocess

import numpy as np


def _git(args, cwd):
    return subprocess.run(["git"] + args, cwd=cwd, capture_output=True, text=True)


def _mk_repo(tmp_path):
    repo = str(tmp_path / "proj")
    os.makedirs(repo)
    _git(["init", "-q"], repo)
    _git(["config", "user.email", "t@t"], repo)
    _git(["config", "user.name", "t"], repo)
    with open(os.path.join(repo, "a.py"), "w") as f:
        f.write("x = 1\n")
    _git(["add", "."], repo)
    _git(["commit", "-qm", "init"], repo)
    return repo


def test_git_snapshot_captures_working_tree(tmp_path):
    from erc_tpu.core import machine

    repo = _mk_repo(tmp_path)
    # uncommitted edit + untracked file
    with open(os.path.join(repo, "a.py"), "w") as f:
        f.write("x = 2\n")
    with open(os.path.join(repo, "new.txt"), "w") as f:
        f.write("hello\n")

    c1 = machine.git_snapshot(repo)
    assert c1
    # user's HEAD / index / worktree untouched
    assert _git(["rev-parse", "--abbrev-ref", "HEAD"], repo).stdout.strip() != machine.SNAPSHOT_BRANCH
    assert "new.txt" in _git(["status", "--porcelain"], repo).stdout
    # snapshot contains both changes
    show = _git(["show", f"{c1}:a.py"], repo).stdout
    assert show == "x = 2\n"
    assert _git(["show", f"{c1}:new.txt"], repo).stdout == "hello\n"
    # dedup: same tree → same commit
    assert machine.git_snapshot(repo) == c1
    # new change → new commit, parent chain on the branch
    with open(os.path.join(repo, "a.py"), "w") as f:
        f.write("x = 3\n")
    c2 = machine.git_snapshot(repo)
    assert c2 != c1
    assert _git(["rev-parse", f"{c2}^"], repo).stdout.strip() == c1
    # archive export
    out = str(tmp_path / "snap.zip")
    assert machine.archive_snapshot(c2, out, repo)
    assert os.path.getsize(out) > 0


def test_machine_config_layering(tmp_path, monkeypatch):
    from erc_tpu.core import machine

    repo = _mk_repo(tmp_path)
    with open(os.path.join(repo, ".erc_tpurc.json"), "w") as f:
        json.dump({"exproot": "/from/local", "data_root": "/from/local/data"}, f)
    monkeypatch.chdir(repo)
    machine.machine_config.cache_clear()
    try:
        assert machine.cfg_get("exproot", env="ERC_TPU_EXPROOT_X") == "/from/local"
        # env var wins
        monkeypatch.setenv("ERC_TPU_EXPROOT_X", "/from/env")
        assert machine.cfg_get("exproot", env="ERC_TPU_EXPROOT_X") == "/from/env"
    finally:
        machine.machine_config.cache_clear()


def test_cli_init_and_extract(tmp_path, monkeypatch):
    from erc_tpu import cli

    # init
    proj = str(tmp_path / "newproj")
    cli.main(["init", proj])
    assert os.path.isdir(os.path.join(proj, ".git"))
    assert os.path.exists(os.path.join(proj, ".erc_tpurc.json"))

    # extract a fake run
    monkeypatch.setenv("ERC_TPU_EXPROOT", str(tmp_path / "exp"))
    os.makedirs(tmp_path / "exp/experiment/myexp/t1")
    os.makedirs(tmp_path / "exp/blob/myexp/t1")
    with open(tmp_path / "exp/experiment/myexp/t1/params.yaml", "w") as f:
        f.write("a: 1\n")
    with open(tmp_path / "exp/blob/myexp/t1/model.ckpt", "wb") as f:
        f.write(b"\x00\x01")
    out = str(tmp_path / "run.zip")
    monkeypatch.chdir(tmp_path)
    cli.main(["extract", "myexp", "t1", out])
    import zipfile

    names = zipfile.ZipFile(out).namelist()
    assert "experiment/params.yaml" in names and "blob/model.ckpt" in names
