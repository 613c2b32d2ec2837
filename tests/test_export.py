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


def test_polymorphic_batch_serves_any_size(tiny_g, tmp_path):
    """batch <= 0 exports the symbolic dimension 'b': one artifact, any
    serving batch, values identical to the direct apply."""
    G, params = tiny_g
    exported = export_generator(G, params, 2, 1.0, -1)
    assert "b,16" in str(exported.in_avals[0]).replace(" ", "")
    artifact, sidecar = save_exported(
        exported, str(tmp_path / "poly"), {"batch": "polymorphic"})
    loaded = load_exported(artifact)
    direct = jax.jit(lambda zz: G.apply(params, zz, 2, np.float32(1.0)))
    for n in (2, 5):
        z = np.random.RandomState(n).randn(n, 16).astype(np.float32)
        np.testing.assert_allclose(np.asarray(loaded.call(z)),
                                   np.asarray(direct(z)), atol=1e-6)
    assert json.load(open(sidecar))["batch"] == "polymorphic"


def test_pallas_tail_stripped_from_artifacts():
    """Artifacts must carry the portable pure-XLA graph: Pallas lowers to
    Mosaic custom calls (not StableHLO-stable) on TPU hosts and to the
    interpret-mode *emulation* elsewhere — a cross-lowered TPU artifact
    built on a CPU host would otherwise silently embed the emulator."""
    G = Generator((1, 3, 128, 128), latent_size=16, fmap_base=512,
                  fmap_max=32)
    params = G.init(jax.random.PRNGKey(0))
    assert G._pallas_tail_start(5) is not None  # tail active at 128px
    exported = export_generator(G, params, 5, 1.0, 0, platforms=("tpu",))
    mlir = exported.mlir_module()
    # Pallas lowers to stablehlo.custom_call @tpu_custom_call (Mosaic); the
    # MLIR's loc() metadata embeds Python function names, so don't grep for
    # a bare "pallas" (this test's own name would match)
    assert "tpu_custom_call" not in mlir and "mosaic" not in mlir.lower()
    # the only custom calls allowed are jax_export's own portable
    # @shape_assertion guards on the symbolic batch dim
    import re
    targets = set(re.findall(r"custom_call @(\w+)", mlir))
    assert targets <= {"shape_assertion"}, targets
    # values still match the in-process Pallas path (interpret on CPU)
    exec_exported = export_generator(G, params, 5, 1.0, 0)
    z = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    got = np.asarray(exec_exported.call(z))
    want = np.asarray(jax.jit(
        lambda zz: G.apply(params, zz, 5, np.float32(1.0)))(z))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_stable_alpha_exports_fade_free_graph(tiny_g):
    """alpha == 1 exports the fade-free graph (no dead prev-toRGB + blend
    baked into the artifact) with values equal to the fade graph."""
    G, params = tiny_g
    exported = export_generator(G, params, 2, 1.0, 2)
    z = np.random.RandomState(1).randn(2, 16).astype(np.float32)
    want = np.asarray(jax.jit(
        lambda zz: G.apply(params, zz, 2, np.float32(1.0), fade=True))(z))
    np.testing.assert_allclose(np.asarray(exported.call(z)), want,
                               atol=1e-6)


def test_cross_platform_export_serializes(tiny_g, tmp_path):
    """Exporting FOR tpu from a cpu host must lower and serialize (deploy
    artifacts are built off-device); execution is naturally skipped."""
    G, params = tiny_g
    exported = export_generator(G, params, 1, 1.0, 2, platforms=("tpu",))
    assert exported.platforms == ("tpu",)
    artifact, _ = save_exported(exported, str(tmp_path / "tpu_gen"), {})
    assert load_exported(artifact).platforms == ("tpu",)
