"""AOT serving export (pggan_tpu/export.py + cli/export.py): a generator
snapshot freezes into a serialized StableHLO artifact whose round-tripped
execution matches the direct jitted apply bit-for-bit on the same backend.
The reference has no deployment path beyond unpickling live modules
(/root/reference/generate.py:27-40)."""

import json
import os

import numpy as np
import pytest

import jax

from pggan_tpu.checkpoint import save_snapshot
from pggan_tpu.export import export_generator, load_exported, save_exported
from pggan_tpu.models import Generator


@pytest.fixture(scope="module")
def tiny_g():
    G = Generator((1, 3, 32, 32), latent_size=16, fmap_base=64, fmap_max=32)
    params = G.init(jax.random.PRNGKey(0))
    return G, params


def test_roundtrip_matches_direct_apply(tiny_g, tmp_path):
    G, params = tiny_g
    depth, alpha, batch = 2, 0.5, 4
    exported = export_generator(G, params, depth, alpha, batch)
    artifact, sidecar = save_exported(
        exported, str(tmp_path / "gen"), {"depth": depth})
    assert artifact.endswith(".stablehlo") and os.path.exists(artifact)

    loaded = load_exported(artifact)
    z = np.random.RandomState(3).randn(batch, 16).astype(np.float32)
    got = np.asarray(loaded.call(z))
    want = np.asarray(jax.jit(
        lambda zz: G.apply(params, zz, depth, np.float32(alpha)))(z))
    assert got.shape == (batch, 16, 16, 3)  # depth 2 -> 16px, NHWC
    # same backend, same program: bitwise
    np.testing.assert_array_equal(got, want)

    info = json.load(open(sidecar))
    assert info["depth"] == depth
    assert info["artifact_bytes"] == os.path.getsize(artifact)
    assert "float32[4,16]" in info["in_avals"][0]


def test_batch_is_frozen(tiny_g):
    G, params = tiny_g
    exported = export_generator(G, params, 1, 1.0, 4)
    with pytest.raises(Exception, match="shape|rank|dim|incompatible"):
        exported.call(np.zeros((5, 16), np.float32))


def test_cli_end_to_end(tiny_g, tmp_path):
    G, params = tiny_g
    snap = tmp_path / "network-snapshot-generator-000001.dat"
    save_snapshot(str(snap), G, params, depth=2, alpha=1.0)
    from pggan_tpu.cli.export import cli_main
    out = tmp_path / "exported" / "gen"
    cli_main(["--generator_path", str(snap), "--out", str(out),
              "--batch", "3", "--verify", "True"])
    assert os.path.exists(str(out) + ".stablehlo")
    meta = json.load(open(str(out) + ".json"))
    assert meta["resolution"] == 16 and meta["batch"] == 3
    assert meta["source_snapshot"] == str(snap)


def test_cross_platform_export_serializes(tiny_g, tmp_path):
    """Exporting FOR tpu from a cpu host must lower and serialize (deploy
    artifacts are built off-device); execution is naturally skipped."""
    G, params = tiny_g
    exported = export_generator(G, params, 1, 1.0, 2, platforms=("tpu",))
    assert exported.platforms == ("tpu",)
    artifact, _ = save_exported(exported, str(tmp_path / "tpu_gen"), {})
    assert load_exported(artifact).platforms == ("tpu",)
