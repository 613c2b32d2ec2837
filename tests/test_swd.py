"""Tests for the SWD quality metric (metrics/swd.py) and the eval CLI.

The reference framework ships no quality metric (its results are qualitative
only, reference README.md:7-9); these tests pin the TPU-native SWD
implementation to the math of the progressive-growing paper's appendix A:
pyramid filters preserve DC, the Laplacian decomposition is exactly
invertible, identical image sets score exactly zero (common-random-numbers
patch sampling), degraded sets score above the real-vs-real floor, and the
minibatch streaming granularity does not change the result.
"""

import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pggan_tpu.metrics.swd import (
    _blur5,
    laplacian_levels,
    pyr_down,
    pyr_up,
    sliced_wasserstein,
    swd,
    swd_levels,
)


def _images(n, res, c=3, seed=0, smooth=True):
    """Structured test images: smooth random blobs (so pyramid levels carry
    real band-limited signal), float32 in [-1, 1], NHWC."""
    rng = np.random.RandomState(seed)
    x = rng.randn(n, res, res, c).astype(np.float32)
    if smooth:
        x = np.asarray(_blur5(_blur5(jnp.asarray(x))))
    return np.clip(x, -1, 1)


# ---------------------------------------------------------------- pyramids

def test_blur5_preserves_dc():
    ones = jnp.ones((2, 16, 16, 3))
    out = _blur5(ones)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_blur5_matches_numpy_reference():
    """The separable depthwise pair must equal a direct 5x5 outer-product
    convolution with reflect padding (independent NumPy implementation)."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 12, 12, 2).astype(np.float32)
    k1 = np.array([1, 4, 6, 4, 1], np.float64) / 16.0
    k2 = np.outer(k1, k1)
    xp = np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    want = np.zeros_like(x)
    for i in range(12):
        for j in range(12):
            window = xp[:, i:i + 5, j:j + 5, :]
            want[:, i, j, :] = np.einsum("nijc,ij->nc", window, k2)
    got = np.asarray(_blur5(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pyr_down_preserves_dc():
    out = pyr_down(jnp.full((1, 16, 16, 1), 3.5))
    assert out.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-6)


def test_pyr_up_preserves_dc():
    """ADVICE round-3 high finding: gain must apply ONCE across the separable
    pair. Zero-insertion leaves 1/4 sample density, so the expand filter
    needs total gain 4 — pyr_up(const) == const, not 4x const."""
    out = pyr_up(jnp.full((1, 8, 8, 1), 1.0))
    assert out.shape == (1, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_laplacian_reconstructs_input():
    """L_k = G_k - up(G_{k+1}) with the coarsest Gaussian kept means the
    pyramid inverts exactly: fold coarse-to-fine with the same pyr_up."""
    x = jnp.asarray(_images(2, 32, seed=3))
    levels = laplacian_levels(x, 3)
    assert [lv.shape[1] for lv in levels] == [32, 16, 8]
    recon = levels[-1]
    for lv in reversed(levels[:-1]):
        recon = pyr_up(recon) + lv
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_laplacian_band_energy_is_bounded():
    """With the correct expand gain, residual levels of a SMOOTH image carry
    much less energy than the image itself (the x-4*expected failure mode of
    the gain bug makes residuals ~3x the signal instead)."""
    x = jnp.asarray(_images(4, 32, seed=4, smooth=True))
    levels = laplacian_levels(x, 3)
    sig = float(jnp.mean(x ** 2))
    band = float(jnp.mean(levels[0] ** 2))
    assert band < 0.5 * sig, (band, sig)


# ------------------------------------------------------- sliced Wasserstein

def test_sliced_wasserstein_identical_is_zero():
    a = jnp.asarray(np.random.RandomState(0).randn(64, 20), jnp.float32)
    d = sliced_wasserstein(a, a, jax.random.PRNGKey(0), 2, 16)
    assert float(d) == 0.0


def test_sliced_wasserstein_1d_analytic():
    """With D=1 descriptors every unit direction is +-1 and |sorted diff| is
    sign-invariant, so SWD reduces exactly to the 1-D W1 distance
    mean|sort(a) - sort(b)|."""
    rng = np.random.RandomState(5)
    a = rng.randn(128, 1).astype(np.float32)
    b = (rng.randn(128, 1) * 2 + 1).astype(np.float32)
    want = np.mean(np.abs(np.sort(a[:, 0]) - np.sort(b[:, 0])))
    got = float(sliced_wasserstein(jnp.asarray(a), jnp.asarray(b),
                                   jax.random.PRNGKey(1), 4, 8))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sliced_wasserstein_orders_separations():
    rng = np.random.RandomState(6)
    a = jnp.asarray(rng.randn(64, 8), jnp.float32)
    near = a + 0.1 * jnp.asarray(rng.randn(64, 8), jnp.float32)
    far = a + 2.0 * jnp.asarray(rng.randn(64, 8), jnp.float32)
    k = jax.random.PRNGKey(2)
    assert float(sliced_wasserstein(a, near, k, 2, 16)) < \
        float(sliced_wasserstein(a, far, k, 2, 16))


# ----------------------------------------------------------------- swd()

SWD_KW = dict(nhoods_per_image=16, nhood_size=5, dir_repeats=2,
              dirs_per_repeat=16, min_res=8)


def test_swd_levels():
    assert swd_levels(64, 16) == [64, 32, 16]
    assert swd_levels(16, 16) == [16]


def test_swd_identical_sets_exactly_zero():
    """Common-random-numbers patch sampling: identical sets draw identical
    patches, so every level reports exactly 0 — no sampling-noise floor
    (round-3 VERDICT measured 27.6x1e3 on a.copy() with independent keys)."""
    a = _images(8, 32, seed=7)
    res = swd(a, a.copy(), jax.random.PRNGKey(0), minibatch=4, **SWD_KW)
    for k, v in res.items():
        assert v == 0.0, (k, v)


def test_swd_minibatch_invariant():
    """Patch keys fold the GLOBAL image index, so chunking granularity must
    not change the result at all."""
    a = _images(8, 32, seed=8)
    b = _images(8, 32, seed=9)
    k = jax.random.PRNGKey(3)
    r1 = swd(a, b, k, minibatch=8, **SWD_KW)
    r2 = swd(a, b, k, minibatch=2, **SWD_KW)
    for lv in r1:
        np.testing.assert_allclose(r1[lv], r2[lv], rtol=1e-4)


def test_swd_sensitivity_above_real_floor():
    """A degraded set must score clearly above the floor measured between two
    disjoint samples of the same distribution (a tight distribution — shared
    template + small smooth perturbations — so the finite-sample floor is
    small relative to the degradation signal)."""
    template = _images(1, 32, seed=20)

    def sample(n, seed):
        return np.clip(template + 0.3 * _images(n, 32, seed=seed), -1, 1)

    a = sample(16, 10)
    b = sample(16, 11)  # same distribution, different images
    noised = np.clip(
        b + 0.5 * np.random.RandomState(12).randn(*b.shape).astype(
            np.float32), -1, 1)
    k = jax.random.PRNGKey(4)
    floor = swd(a, b, k, minibatch=8, **SWD_KW)
    score = swd(a, noised, k, minibatch=8, **SWD_KW)
    # the degradation is high-frequency -> judge at the finest level, where
    # the added band lives (coarse levels dilute the average; measured:
    # finest 157 vs floor 61, avg only 131 vs 73 at this tiny sample size)
    assert score[32] > 2.0 * floor[32], (score, floor)
    assert score["avg"] > floor["avg"], (score, floor)


def test_swd_small_resolution_guard():
    a = _images(4, 8, seed=13)
    with pytest.raises(ValueError, match="min_res"):
        swd(a, a, jax.random.PRNGKey(0), min_res=16)
    with pytest.raises(ValueError, match="nhood_size"):
        swd(a, a, jax.random.PRNGKey(0), min_res=4, nhood_size=7)


def test_swd_reproducible():
    a = _images(8, 32, seed=14)
    b = _images(8, 32, seed=15)
    k = jax.random.PRNGKey(5)
    r1 = swd(a, b, k, minibatch=4, **SWD_KW)
    r2 = swd(a, b, k, minibatch=4, **SWD_KW)
    assert r1 == r2


# ----------------------------------------------------------- eval CLI e2e

def test_eval_cli_e2e(tmp_path):
    """Full eval CLI round-trip on a tiny generator snapshot + synthetic
    dataset: prints per-level scores with the real-vs-real floor and writes
    the JSON payload (cli/eval.py)."""
    from pggan_tpu.checkpoint import save_snapshot
    from pggan_tpu.cli.eval import cli_main
    from pggan_tpu.models.generator import Generator

    G = Generator(dataset_shape=(64, 3, 16, 16), fmap_base=64, fmap_max=16,
                  latent_size=8)
    params = G.init(jax.random.PRNGKey(0))
    snap = str(tmp_path / "network-snapshot-generator-000001.dat")
    save_snapshot(snap, G, params, depth=2, alpha=1.0)  # 16x16 output

    out_json = str(tmp_path / "eval.json")
    results, baseline = cli_main([
        "--generator_path", snap,
        "--dataset_class", "SyntheticDataset",
        "--SyntheticDataset.resolution", "16",
        "--SyntheticDataset.num_items", "64",
        "--num_samples", "16",
        "--minibatch", "8",
        "--nhoods_per_image", "16",
        "--nhood_size", "5",
        "--min_res", "8",
        "--dir_repeats", "2",
        "--dirs_per_repeat", "16",
        "--output_json", out_json,
    ])
    assert set(results) == {16, 8, "avg"}
    assert baseline is not None and set(baseline) == {16, 8, "avg"}
    assert all(np.isfinite(v) for v in results.values())
    # untrained G vs data must sit above the real-vs-real floor
    assert results["avg"] > baseline["avg"] > 0

    with open(out_json) as f:
        payload = json.load(f)
    assert payload["swd_avg"] == results["avg"]
    assert payload["swd_baseline_avg"] == baseline["avg"]
    assert payload["depth"] == 2
    # the paper's second metric rides along with its real-pair baseline
    assert 0.0 <= payload["msssim_fakes"] <= 1.0
    assert 0.0 <= payload["msssim_reals"] <= 1.0


def test_eval_history_mode(tmp_path):
    """--run_dir scores every snapshot (ema twins preferred) into a
    metric-vs-kimg JSONL curve."""
    from pggan_tpu.checkpoint import save_snapshot
    from pggan_tpu.cli.eval import cli_main
    from pggan_tpu.models.generator import Generator

    G = Generator(dataset_shape=(64, 3, 16, 16), fmap_base=64, fmap_max=16,
                  latent_size=8)
    run = tmp_path / "run"
    os.makedirs(run)
    for kimg, seed in ((1, 0), (2, 1)):
        params = G.init(jax.random.PRNGKey(seed))
        save_snapshot(str(run / f"network-snapshot-generator-{kimg:06}.dat"),
                      G, params, depth=2, alpha=1.0)
    # an ema twin for kimg 2 must be scored in place of the plain snapshot
    ema_params = G.init(jax.random.PRNGKey(7))
    save_snapshot(str(run / "network-snapshot-generator-ema-000002.dat"),
                  G, ema_params, depth=2, alpha=1.0)
    # a 4px depth-0 snapshot (below min_res) must be skipped, not abort
    save_snapshot(str(run / "network-snapshot-generator-000000.dat"),
                  G, G.init(jax.random.PRNGKey(9)), depth=0, alpha=1.0)

    rows = cli_main([
        "--run_dir", str(run),
        "--dataset_class", "SyntheticDataset",
        "--SyntheticDataset.resolution", "16",
        "--SyntheticDataset.num_items", "64",
        "--num_samples", "16", "--minibatch", "8",
        "--nhoods_per_image", "16", "--nhood_size", "5", "--min_res", "8",
        "--dir_repeats", "2", "--dirs_per_repeat", "16",
        "--real_baseline", "False", "--msssim", "False",
    ])
    assert len(rows) == 2
    assert rows[0]["generator_path"].endswith("generator-000001.dat")
    assert rows[1]["generator_path"].endswith("generator-ema-000002.dat")
    hist = os.path.join(str(run), "eval_history.jsonl")
    with open(hist) as f:
        lines = [json.loads(l) for l in f]
    assert [r["swd_avg"] for r in lines] == [r["swd_avg"] for r in rows]


def test_eval_rejects_min_res_below_nhood_size():
    """The flag-combination error must fail fast up front — inside history
    mode it would otherwise be swallowed by the per-snapshot skip and write
    an empty curve (round-4 review finding)."""
    from pggan_tpu.cli.eval import cli_main
    with pytest.raises(SystemExit, match="min_res"):
        cli_main([
            "--generator_path", "missing.dat",
            "--dataset_class", "SyntheticDataset",
            "--min_res", "4",  # below the default nhood_size 7
        ])


def test_eval_history_caches_stage_floors(tmp_path, monkeypatch):
    """History mode computes the real-vs-real floor ONCE per (depth, alpha)
    stage: k same-stage snapshots must cost k fake-scoring swd calls plus a
    single baseline call, not 2k."""
    from pggan_tpu.checkpoint import save_snapshot
    import pggan_tpu.cli.eval as ev
    from pggan_tpu.models.generator import Generator

    G = Generator(dataset_shape=(64, 3, 16, 16), fmap_base=64, fmap_max=16,
                  latent_size=8)
    run = tmp_path / "run"
    os.makedirs(run)
    for kimg, seed in ((1, 0), (2, 1)):
        save_snapshot(str(run / f"network-snapshot-generator-{kimg:06}.dat"),
                      G, G.init(jax.random.PRNGKey(seed)), depth=2, alpha=1.0)

    calls = {"n": 0}
    real_swd = ev.swd

    def counting_swd(*a, **k):
        calls["n"] += 1
        return real_swd(*a, **k)

    monkeypatch.setattr(ev, "swd", counting_swd)
    rows = ev.cli_main([
        "--run_dir", str(run),
        "--dataset_class", "SyntheticDataset",
        "--SyntheticDataset.resolution", "16",
        "--SyntheticDataset.num_items", "64",
        "--num_samples", "16", "--minibatch", "8",
        "--nhoods_per_image", "16", "--nhood_size", "5", "--min_res", "8",
        "--dir_repeats", "2", "--dirs_per_repeat", "16",
        "--msssim", "False",
    ])
    assert len(rows) == 2
    assert calls["n"] == 3  # 2 fake scorings + 1 shared baseline
    # both rows carry the identical cached floor
    assert rows[0]["swd_baseline_avg"] == rows[1]["swd_baseline_avg"]


def test_eval_history_resumes_interrupted_curve(tmp_path, monkeypatch):
    """An interrupted history pass leaves a partial eval_history.jsonl; the
    re-run must keep those rows, skip their snapshots (keyed by basename, so
    a different staging dir still counts), and score only the remainder."""
    from pggan_tpu.checkpoint import save_snapshot
    import pggan_tpu.cli.eval as ev
    from pggan_tpu.models.generator import Generator

    G = Generator(dataset_shape=(64, 3, 16, 16), fmap_base=64, fmap_max=16,
                  latent_size=8)
    run = tmp_path / "run"
    os.makedirs(run)
    for kimg, seed in ((1, 0), (2, 1), (3, 2)):
        save_snapshot(str(run / f"network-snapshot-generator-{kimg:06}.dat"),
                      G, G.init(jax.random.PRNGKey(seed)), depth=2, alpha=1.0)

    args = [
        "--run_dir", str(run),
        "--dataset_class", "SyntheticDataset",
        "--SyntheticDataset.resolution", "16",
        "--SyntheticDataset.num_items", "64",
        "--num_samples", "16", "--minibatch", "8",
        "--nhoods_per_image", "16", "--nhood_size", "5", "--min_res", "8",
        "--dir_repeats", "2", "--dirs_per_repeat", "16",
        "--real_baseline", "False", "--msssim", "False",
    ]
    full = ev.cli_main(args)
    assert len(full) == 3

    # Simulate the interruption: drop the last row, re-point the surviving
    # rows at a DIFFERENT directory (the staging-dir case), and re-run.
    hist = run / "eval_history.jsonl"
    with open(hist) as f:
        lines = [json.loads(l) for l in f]
    for r in lines[:2]:
        r["generator_path"] = os.path.join(
            "/elsewhere", os.path.basename(r["generator_path"]))
    with open(hist, "w") as f:
        for r in lines[:2]:
            f.write(json.dumps(r) + "\n")

    scored = []
    real_score = ev._score_snapshot

    def counting_score(path, *a, **k):
        scored.append(os.path.basename(path))
        return real_score(path, *a, **k)

    monkeypatch.setattr(ev, "_score_snapshot", counting_score)
    rows = ev.cli_main(args)
    assert scored == ["network-snapshot-generator-000003.dat"]
    assert len(rows) == 3
    assert [r["swd_avg"] for r in rows] == [r["swd_avg"] for r in full]

    # A row from a DIFFERENT run shares the kimg-numbered basename but not
    # the snapshot bytes: it must be re-scored and superseded, never
    # silently returned as this run's curve.
    with open(hist) as f:
        lines = [json.loads(l) for l in f]
    lines[0]["snapshot_bytes"] = lines[0]["snapshot_bytes"] + 1
    lines[0]["swd_avg"] = -1.0  # stale marker
    with open(hist, "w") as f:
        for r in lines:
            f.write(json.dumps(r) + "\n")
    scored.clear()
    rows = ev.cli_main(args)
    assert scored == ["network-snapshot-generator-000001.dat"]
    assert len(rows) == 3
    assert sorted(r["swd_avg"] for r in rows) == \
        sorted(r["swd_avg"] for r in full)
