"""Sketch-parity tools (SURVEY §2.2 `sketch` row): VAD vs a loop oracle of
the reference's exact semantics, device-memory probe, model summary,
dataset mean/std."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- VAD oracle
# direct transcription of lumo/sketch/audio/unsupervised_vad.py:43-102 +
# audio_tools.py:27-53 (loops kept loops)


def _oracle_enframe(x, win_len, hop_len):
    x = np.squeeze(x)
    n_frames = 1 + int(np.floor((len(x) - win_len) / float(hop_len)))
    out = np.zeros((n_frames, win_len))
    for i in range(n_frames):
        out[i] = x[i * hop_len : i * hop_len + win_len]
    return out


def _oracle_deframe(x_framed, win_len, hop_len):
    n_frames = len(x_framed)
    n_samples = n_frames * hop_len + win_len
    x_samples = np.zeros((n_samples, 1))
    for i in range(n_frames):
        x_samples[i * hop_len : i * hop_len + win_len] = x_framed[i]
    return x_samples


def _oracle_log_nrg(xframes):
    win = xframes.shape[1]
    nrg = np.diagonal(np.dot(xframes + 1e-5, (xframes + 1e-5).T)) / float(win)
    raw = np.log(nrg) / float(win)
    return (raw - np.mean(raw)) / np.sqrt(np.var(raw))


def _oracle_nrg_vad(xframes, percent_thr, nrg_thr=0.0, context=5):
    m = np.mean(xframes, axis=1)
    xframes = xframes - np.tile(m, (xframes.shape[1], 1)).T
    n_frames = xframes.shape[0]
    xnrgs = _oracle_log_nrg(xframes)
    xvad = np.zeros((n_frames, 1))
    for i in range(n_frames):
        start = max(i - context, 0)
        end = min(i + context, n_frames - 1)
        n_above = np.sum(xnrgs[start:end] > nrg_thr)
        n_total = end - start + 1
        xvad[i] = 1.0 * ((float(n_above) / n_total) > percent_thr)
    return xvad


@pytest.mark.parametrize("percent_thr,context", [(0.5, 5), (0.3, 2), (0.8, 11)])
def test_energy_vad_matches_reference_loop(percent_thr, context):
    from erc_tpu.preprocess.vad import energy_vad, enframe

    rng = np.random.default_rng(0)
    # speech-like: alternating silence and loud bursts
    sig = rng.normal(0, 0.01, 4000)
    sig[800:1600] += rng.normal(0, 0.6, 800)
    sig[2800:3600] += rng.normal(0, 0.9, 800)
    frames = enframe(sig, 200, 80)
    np.testing.assert_allclose(frames, _oracle_enframe(sig, 200, 80))
    got = energy_vad(frames, percent_thr=percent_thr, context=context)
    want = _oracle_nrg_vad(frames.copy(), percent_thr, context=context).squeeze(-1)
    np.testing.assert_array_equal(got, want)


def test_deframe_matches_reference_loop():
    from erc_tpu.preprocess.vad import deframe

    rng = np.random.default_rng(1)
    vals = (rng.random(37) > 0.5).astype(float)
    got = deframe(vals, win_len=200, hop_len=80)
    want = _oracle_deframe(vals.reshape(-1, 1), 200, 80).squeeze(-1)
    np.testing.assert_array_equal(got, want)


def test_voiced_samples_strips_silence():
    from erc_tpu.preprocess.vad import voiced_samples

    rng = np.random.default_rng(2)
    fs = 16000
    sil = rng.normal(0, 0.001, fs)
    speech = rng.normal(0, 0.5, fs)
    sig = np.concatenate([sil, speech, sil])
    kept = voiced_samples(sig, fs)
    assert 0 < len(kept) < len(sig)
    # the kept samples should be dominated by the loud segment
    assert np.abs(kept).mean() > 2 * np.abs(sig).mean()


# ------------------------------------------------------------------- memstat
def test_device_memory_stats_shape():
    from erc_tpu.core import memstat

    stats = memstat.device_memory_stats()
    if stats is not None:  # CPU devices usually expose nothing
        assert stats["bytes_in_use"] >= 0
        if "bytes_limit" in stats:
            assert stats["bytes_free"] == stats["bytes_limit"] - stats["bytes_in_use"]


def test_live_array_summary_sees_known_array():
    from erc_tpu.core import memstat

    marker = jnp.zeros((173, 64), jnp.float32)  # distinctive shape
    marker.block_until_ready()
    rows = memstat.live_array_summary(top_k=1000)
    match = [r for r in rows if r["shape"] == (173, 64) and r["dtype"] == "float32"]
    assert match and match[0]["bytes"] >= 173 * 64 * 4
    assert all(rows[i]["bytes"] >= rows[i + 1]["bytes"] for i in range(len(rows) - 1))
    report = memstat.memory_report()
    assert isinstance(report, str) and report
    del marker


def test_memory_monitor_callback(monkeypatch):
    from erc_tpu.core import memstat
    from erc_tpu.train.callbacks import MemoryMonitor

    logged, warned = [], []

    class FakeLogger:
        def info(self, msg):
            logged.append(msg)

        def warn(self, *args):  # matches core.logger.Logger's API
            warned.append(" ".join(str(a) for a in args))

    class FakeTrainer:
        logger = FakeLogger()
        callbacks = []

    monkeypatch.setattr(
        memstat, "device_memory_stats",
        lambda device=None: {"bytes_in_use": 95 << 20, "peak_bytes_in_use": 96 << 20,
                             "bytes_limit": 100 << 20, "bytes_free": 5 << 20},
    )
    cb = MemoryMonitor(warn_frac=0.9)
    cb.train_epoch_end(FakeTrainer(), 0, None)
    assert logged and "peak=" in logged[0]
    assert len(warned) == 1  # above 90% -> census logged once
    cb.train_epoch_end(FakeTrainer(), 1, None)
    assert len(warned) == 1  # not repeated


# ------------------------------------------------------------------- summary
def test_summarize_model_counts():
    import flax.linen as nn

    from erc_tpu.core.summary import param_summary, summarize_model

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            x = nn.Dense(16, name="enc")(x)
            x = nn.relu(x)
            return nn.Dense(4, name="head")(x)

    m = Toy()
    x = jnp.zeros((2, 8), jnp.float32)
    text = summarize_model(m, {"params": jax.random.PRNGKey(0)}, x)
    total = 8 * 16 + 16 + 16 * 4 + 4
    assert f"Total params: {total:,}" in text
    assert "enc" in text and "head" in text
    assert "Output shape(s): 2x4" in text

    rows = param_summary(m.init(jax.random.PRNGKey(0), x)["params"], depth=1)
    assert {r["module"] for r in rows} == {"enc", "head"}
    assert sum(r["n_params"] for r in rows) == total
    assert all(r["bytes"] == r["n_params"] * 4 for r in rows)


def test_summarize_model_counts_non_trainable_collections():
    import flax.linen as nn

    from erc_tpu.core.summary import summarize_model

    class BNToy(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            x = nn.Dense(16, name="enc")(x)
            return nn.BatchNorm(use_running_average=True, name="bn")(x)

    m = BNToy()
    x = jnp.zeros((2, 8), jnp.float32)
    text = summarize_model(m, {"params": jax.random.PRNGKey(0)}, x)
    # batch_stats (mean+var, 16 each) are in the table and the total,
    # but not in the trainable count
    trainable = 8 * 16 + 16 + 2 * 16  # dense + BN scale/bias
    assert f"Total params: {trainable + 32:,}" in text
    assert f"Trainable params: {trainable:,}" in text
    assert f"Non-trainable params: {32:,}" in text
    assert "batch_stats/" in text


def test_summary_cli_on_cogmen(capsys, tmp_path, monkeypatch):
    from erc_tpu import cli

    monkeypatch.setenv("ERC_TPU_EXPROOT", str(tmp_path))
    cli.main(["summary", "cogmen", "synthetic-cogmen-6"])
    out = capsys.readouterr().out
    assert "Total params:" in out and "Params size (MB):" in out


# ------------------------------------------------------------- mean/std
def test_dataset_mean_std_matches_reference_math():
    from erc_tpu.contrib import dataset_mean_std

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (8, 9, 3)).astype(np.uint8) for _ in range(5)]

    # reference math (preprocess_mean_std.py:9-46), transcribed per channel
    want_mean = np.zeros(3)
    for img in imgs:
        for c in range(3):
            want_mean[c] += np.mean(img[:, :, c].astype(np.float64))
    want_mean /= len(imgs)
    diff = np.zeros(3)
    n = 0
    for img in imgs:
        for c in range(3):
            diff[c] += np.sum((img[:, :, c].astype(np.float64) - want_mean[c]) ** 2)
        n += img.shape[0] * img.shape[1]
    want_std = np.sqrt(diff / n)

    mean, std = dataset_mean_std(imgs)
    np.testing.assert_allclose(mean, want_mean / 255.0, rtol=1e-12)
    np.testing.assert_allclose(std, want_std / 255.0, rtol=1e-12)

    # (img, label) pair form
    mean2, _ = dataset_mean_std([(im, 0) for im in imgs])
    np.testing.assert_allclose(mean2, mean, rtol=1e-12)
