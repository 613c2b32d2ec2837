"""Round-trip test for scripts/convert_torch_snapshot.py: a torch module with
the reference's structure (attribute names, OIHW weights, EMPIRICAL
equalized-LR constants — network.py:19) is pickled like the reference's
SaverPlugin does (plugins.py:158-166), converted, and the converted snapshot's
forward pass must match the torch module's at every depth and alpha."""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_torch_parity_network import (  # noqa: E402
    TDiscriminator,
    TGenerator,
    TPGConv,
    to_nhwc,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_converter():
    spec = importlib.util.spec_from_file_location(
        "convert_torch_snapshot",
        os.path.join(REPO, "scripts", "convert_torch_snapshot.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _reference_randomize(module, seed):
    """Re-init every PGConv the way the reference does (network.py:12-22):
    normal weights, then the EMPIRICAL constant c = sqrt(mean(w^2)) divided
    out and kept on the module — the converter must fold this exact c, not
    the closed-form He value it approximates."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, TPGConv):
            w = torch.randn(m.conv.weight.shape, generator=g) * 0.7
            c = float(torch.sqrt((w ** 2).mean()))
            m.conv.weight.data = w / c
            m.conv.bias.data = torch.randn(m.conv.bias.shape, generator=g) * .1
            m.c = c


SHAPE = (4, 3, 32, 32)  # R=5: depths 0..3
FMAPS = dict(fmap_base=128, fmap_max=32)


def test_generator_snapshot_roundtrip(tmp_path):
    from pggan_tpu.checkpoint import load_snapshot
    conv = _load_converter()

    tg = TGenerator(SHAPE, latent_size=16, **FMAPS)
    _reference_randomize(tg, 0)
    tg.latent_size = 16  # reference Generator carries this attr
    tg.depth, tg.alpha = 2, 0.4
    src = str(tmp_path / "network-snapshot-generator-000123.dat")
    torch.save(tg, src)

    out = str(tmp_path / "converted-generator.dat")
    assert conv.convert(src, out) == "generator"
    G, params, meta = load_snapshot(out)
    assert (meta["depth"], meta["alpha"]) == (2, 0.4)
    assert G.latent_size == 16 and G.num_channels == 3
    assert (G.fmap_base, G.fmap_max) == (128, 32)

    z = np.random.RandomState(1).randn(2, 16).astype(np.float32)
    tz = torch.from_numpy(z)
    for depth in range(G.max_depth + 1):
        for alpha in (0.0, 0.4, 1.0):
            tg.depth, tg.alpha = depth, alpha
            with torch.no_grad():
                want = to_nhwc(tg(tz).numpy())
            got = np.asarray(jax.jit(
                lambda p, zz, d=depth, a=alpha:
                G.apply(p, zz, d, a))(params, jnp.asarray(z)))
            np.testing.assert_allclose(
                got, want, rtol=2e-3, atol=2e-4,
                err_msg=f"converted G depth={depth} alpha={alpha}")


def test_discriminator_snapshot_roundtrip(tmp_path):
    from pggan_tpu.checkpoint import load_snapshot
    conv = _load_converter()

    td = TDiscriminator(SHAPE, **FMAPS)
    _reference_randomize(td, 7)
    td.depth, td.alpha = 3, 1.0
    src = str(tmp_path / "network-snapshot-discriminator-000123.dat")
    torch.save(td, src)

    out = str(tmp_path / "converted-discriminator.dat")
    assert conv.convert(src, out) == "discriminator"
    D, params, meta = load_snapshot(out)
    assert meta["depth"] == 3
    assert (D.fmap_base, D.fmap_max) == (128, 32)

    rng = np.random.RandomState(2)
    for depth in range(D.max_depth + 1):
        res = 4 * 2 ** depth
        x = rng.randn(3, res, res, 3).astype(np.float32)
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        for alpha in (0.0, 0.4, 1.0):
            td.depth, td.alpha = depth, alpha
            with torch.no_grad():
                want = td(tx).numpy()
            got = np.asarray(jax.jit(
                lambda p, xx, d=depth, a=alpha:
                D.apply(p, xx, d, a))(params, jnp.asarray(x)))
            np.testing.assert_allclose(
                got, want, rtol=2e-3, atol=2e-4,
                err_msg=f"converted D depth={depth} alpha={alpha}")
