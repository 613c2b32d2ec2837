"""CLI layer tests: reflective config system, train entry point end-to-end on
a tiny image folder, generate entry point from the produced snapshot
(SURVEY.md §2.7 parity)."""

import glob
import os

import numpy as np
import pytest

from pggan_tpu.utils.config import (
    create_params,
    generic_arg_parse,
    get_all_classes,
    get_structured_params,
)


class _Demo:
    def __init__(self, a, b=3, c="x", d=(1, 2)):
        pass


def test_create_params_defaults_only():
    params = create_params([_Demo])
    assert params == {"_Demo": {"b": 3, "c": "x", "d": (1, 2)}}


def test_create_params_excludes_and_overrides():
    params = create_params([_Demo], excludes={"_Demo": {"c"}},
                           overrides={"_Demo": {"b": 7}})
    assert params == {"_Demo": {"b": 7, "d": (1, 2)}}


def test_generic_arg_parse_literals():
    assert generic_arg_parse("3") == 3
    assert generic_arg_parse("3.5") == 3.5
    assert generic_arg_parse("(1, 2)") == (1, 2)
    assert generic_arg_parse("['ImageSaver']") == ["ImageSaver"]
    assert generic_arg_parse("True") is True
    assert generic_arg_parse("some/path.wav") == "some/path.wav"
    assert generic_arg_parse("'quoted'") == "quoted"
    assert generic_arg_parse("7", hinttype=str) == "7"


def test_generic_arg_parse_never_evals_code():
    # ast.literal_eval must reject expressions (the reference eval'd them)
    assert generic_arg_parse("__import__('os').getcwd()") == \
        "__import__('os').getcwd()"


def test_get_structured_params():
    flat = {"total_kimg": 3, "Generator.latent_size": 64,
            "Generator.fmap_base": 128, "SaverPlugin.network_snapshot_ticks": 2}
    out = get_structured_params(flat)
    assert out["total_kimg"] == 3
    assert out["Generator"] == {"latent_size": 64, "fmap_base": 128}
    assert out["SaverPlugin"] == {"network_snapshot_ticks": 2}


def test_train_parser_exposes_reference_flags():
    from pggan_tpu.cli.train import build_parser
    parser = build_parser()
    args = parser.parse_args([])
    flat = vars(args)
    # reference-parity flags
    for flag in ("total_kimg", "minibatch_size", "progressive_growing",
                 "iwass_lambda", "resume_network", "dataset_class",
                 "Generator.latent_size", "Generator.fmap_base",
                 "Discriminator.fmap_max", "DepthManager.minibatch_default",
                 "DepthManager.lod_training_nimg", "Trainer.D_training_repeats",
                 "SaverPlugin.network_snapshot_ticks",
                 "OutputGenerator.samples_count", "Adam.betas",
                 "DefaultImageFolderDataset.dir_path",
                 "SoundImageDataset.n_fft", "ImageSaver.resolution",
                 "SoundSaver.griffin_lim_iter"):
        assert flag in flat, flag
    assert flat["Adam.betas"] == (0.0, 0.99)
    assert flat["DepthManager.minibatch_overrides"] == {6: 14, 7: 6, 8: 3}
    # the reference's OldH5Dataset name registers its own arg group and
    # resolves as a --dataset_class value (drop-in migration, MIGRATION.md)
    assert "OldH5Dataset.h5_path" in flat
    import pggan_tpu.data.datasets as dataset_module
    from pggan_tpu.data import H5Dataset, OldH5Dataset
    assert issubclass(OldH5Dataset, H5Dataset)
    assert getattr(dataset_module, "OldH5Dataset") is OldH5Dataset


def _write_pngs(tmpdir, n=8, size=16):
    from PIL import Image
    rng = np.random.RandomState(0)
    os.makedirs(tmpdir, exist_ok=True)
    for i in range(n):
        Image.fromarray(rng.randint(0, 256, (size, size), dtype=np.uint8),
                        "L").save(os.path.join(tmpdir, f"i{i:02}.png"))


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    """Full CLI train run on a tiny 16x16 image folder."""
    from pggan_tpu.cli.train import cli_main
    root = tmp_path_factory.mktemp("cli")
    data_dir = str(root / "imgs")
    results = str(root / "results")
    _write_pngs(data_dir)
    cli_main([
        "--result_dir", results,
        "--exp_name", "t",
        "--dataset_class", "DefaultImageFolderDataset",
        "--DefaultImageFolderDataset.dir_path", data_dir,
        "--DefaultImageFolderDataset.preload", "True",
        "--num_data_workers", "2",
        "--total_kimg", "0.5",
        "--minibatch_size", "8",
        "--lr_rampup_kimg", "0.2",
        "--postprocessors", "['ImageSaver']",
        "--ImageSaver.samples_path", "samples",
        "--ImageSaver.resolution", "32",
        "--DepthManager.minibatch_default", "8",
        "--DepthManager.lod_training_nimg", "150",
        "--DepthManager.lod_transition_nimg", "150",
        "--DepthManager.tick_kimg_default", "0.128",
        "--DepthManager.tick_kimg_overrides", "{}",
        "--Trainer.tick_nimg_default", "128",
        "--Generator.latent_size", "16",
        "--Generator.fmap_base", "64",
        "--Generator.fmap_max", "32",
        "--Discriminator.fmap_base", "64",
        "--Discriminator.fmap_max", "32",
        "--SaverPlugin.network_snapshot_ticks", "2",
        "--OutputGenerator.samples_count", "4",
        "--data_parallel", "False",
    ])
    run_dir = glob.glob(os.path.join(results, "*-t"))[0]
    return run_dir


def test_cli_train_produces_artifacts(cli_run):
    run_dir = cli_run
    log = open(os.path.join(run_dir, "log.txt")).read()
    assert "tick" in log and "depth" in log
    assert glob.glob(os.path.join(run_dir, "network-snapshot-generator-*.dat"))
    assert glob.glob(os.path.join(run_dir, "training-state-*.dat"))
    assert glob.glob(os.path.join(run_dir, "samples", "fakes_*.png"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))


def test_cli_generate_from_snapshot(cli_run, tmp_path):
    from pggan_tpu.cli.generate import cli_main as gen_main
    snap = glob.glob(os.path.join(cli_run,
                                  "network-snapshot-generator-*.dat"))[0]
    out_dir = str(tmp_path / "gen")
    gen_main([
        "--generator_path", snap,
        "--num_samples", "4",
        "--postprocessors", "['ImageSaver']",
        "--ImageSaver.samples_path", out_dir,
        "--ImageSaver.resolution", "32",
        "--description", "smoke",
    ])
    assert os.path.exists(os.path.join(out_dir, "fakes_smoke.png"))


def test_cli_resume(cli_run):
    """Resume from the produced snapshot: schedule position must re-derive
    from the checkpointed nimg (reference SURVEY.md §3.5)."""
    from pggan_tpu.cli.train import cli_main
    results_root = os.path.dirname(cli_run)
    rel = os.path.join(os.path.basename(cli_run),
                       "network-snapshot-{}-000000.dat")
    data_dir = os.path.join(os.path.dirname(results_root), "imgs")
    cli_main([
        "--result_dir", results_root,
        "--exp_name", "resume",
        "--resume_network", rel,
        "--dataset_class", "DefaultImageFolderDataset",
        "--DefaultImageFolderDataset.dir_path", data_dir,
        "--DefaultImageFolderDataset.preload", "True",
        "--num_data_workers", "2",
        "--total_kimg", "0.6",
        "--minibatch_size", "8",
        "--postprocessors", "[]",
        "--DepthManager.minibatch_default", "8",
        "--DepthManager.lod_training_nimg", "150",
        "--DepthManager.lod_transition_nimg", "150",
        "--DepthManager.tick_kimg_default", "0.128",
        "--DepthManager.tick_kimg_overrides", "{}",
        "--Generator.latent_size", "16",
        "--Generator.fmap_base", "64",
        "--Generator.fmap_max", "32",
        "--Discriminator.fmap_base", "64",
        "--Discriminator.fmap_max", "32",
        "--data_parallel", "False",
    ])
    resume_dir = glob.glob(os.path.join(results_root, "*-resume"))[0]
    log = open(os.path.join(resume_dir, "log.txt")).read()
    assert "Restored full training state" in log or "Resuming" in log


def test_find_latest_snapshot_unit(tmp_path):
    """Selection rule: the run dir with the newest snapshot mtime wins, then
    the highest kimg inside it; generator files without a discriminator pair
    are skipped."""
    from pggan_tpu.cli.train import find_latest_snapshot
    root = str(tmp_path)
    import time
    # 000-a trained FURTHER (kimg 5) but is the older experiment
    for sub, kimgs in (("000-a", [0, 5]), ("001-b", [1, 2])):
        os.makedirs(os.path.join(root, sub))
        for kimg in kimgs:
            for net in ("generator", "discriminator"):
                p = os.path.join(
                    root, sub, f"network-snapshot-{net}-{kimg:06}.dat")
                open(p, "w").write("x")
    # orphan generator (no discriminator pair) with the newest mtime: skip
    orphan = os.path.join(root, "001-b", "network-snapshot-generator-000009.dat")
    open(orphan, "w").write("x")
    now = time.time()
    for i, p in enumerate(sorted(glob.glob(
            os.path.join(root, "**", "*.dat"), recursive=True))):
        os.utime(p, (now + i, now + i))
    os.utime(orphan, (now + 100, now + 100))
    # scrambled mtimes INSIDE the newest dir (rsync/cp -r): the kimg-1 file
    # carries the newest mtime but kimg 2 must still win within 001-b
    os.utime(os.path.join(root, "001-b",
                          "network-snapshot-generator-000001.dat"),
             (now + 50, now + 50))
    pat = find_latest_snapshot(root)
    assert pat == os.path.join("001-b", "network-snapshot-{}-000002.dat")


def test_cli_resume_latest(cli_run):
    """--resume_network latest: scans the results root and resumes the
    newest snapshot pair without hand-typing the pattern (SURVEY §5
    auto-resume-latest)."""
    from pggan_tpu.cli.train import cli_main
    results_root = os.path.dirname(cli_run)
    data_dir = os.path.join(os.path.dirname(results_root), "imgs")
    cli_main([
        "--result_dir", results_root,
        "--exp_name", "resumelatest",
        "--resume_network", "latest",
        "--dataset_class", "DefaultImageFolderDataset",
        "--DefaultImageFolderDataset.dir_path", data_dir,
        "--DefaultImageFolderDataset.preload", "True",
        "--num_data_workers", "2",
        "--total_kimg", "0.55",
        "--minibatch_size", "8",
        "--postprocessors", "[]",
        "--DepthManager.minibatch_default", "8",
        "--DepthManager.lod_training_nimg", "150",
        "--DepthManager.lod_transition_nimg", "150",
        "--DepthManager.tick_kimg_default", "0.128",
        "--DepthManager.tick_kimg_overrides", "{}",
        "--Generator.latent_size", "16",
        "--Generator.fmap_base", "64",
        "--Generator.fmap_max", "32",
        "--Discriminator.fmap_base", "64",
        "--Discriminator.fmap_max", "32",
        "--data_parallel", "False",
    ])
    resume_dir = glob.glob(os.path.join(results_root, "*-resumelatest"))[0]
    log = open(os.path.join(resume_dir, "log.txt")).read()
    assert "resume latest ->" in log


def test_cli_non_progressive(tmp_path):
    """--progressive_growing False trains a fixed-depth GAN (reference
    README.md:48): no DepthManager, depth = dataset.model_initial_depth."""
    from pggan_tpu.cli.train import cli_main
    data_dir = str(tmp_path / "imgs")
    results = str(tmp_path / "results")
    _write_pngs(data_dir)
    cli_main([
        "--result_dir", results,
        "--exp_name", "np",
        "--dataset_class", "DefaultImageFolderDataset",
        "--DefaultImageFolderDataset.dir_path", data_dir,
        "--DefaultImageFolderDataset.preload", "True",
        "--DefaultImageFolderDataset.model_initial_depth", "2",
        "--progressive_growing", "False",
        "--num_data_workers", "1",
        "--total_kimg", "0.15",
        "--minibatch_size", "8",
        "--Trainer.tick_nimg_default", "64",
        "--postprocessors", "[]",
        "--Generator.latent_size", "16",
        "--Generator.fmap_base", "64",
        "--Generator.fmap_max", "32",
        "--Discriminator.fmap_base", "64",
        "--Discriminator.fmap_max", "32",
        "--data_parallel", "False",
    ])
    run_dir = glob.glob(os.path.join(results, "*-np"))[0]
    log = open(os.path.join(run_dir, "log.txt")).read()
    assert "tick" in log
    assert "depth" not in log.splitlines()[-1]  # no progressive stats logged


def test_persistent_cache_knob(tmp_path, monkeypatch):
    """enable_persistent_compilation_cache: env opt-out, env path override,
    and the configured directory actually receiving jax's cache setting."""
    import jax

    from pggan_tpu.utils.misc import enable_persistent_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("PGGAN_XLA_CACHE", "0")
        assert enable_persistent_compilation_cache(str(tmp_path)) is None

        # an already-configured dir (conftest's tests/.jax_cache) wins: the
        # runtime helper must never hijack an explicit cache location
        monkeypatch.setenv("PGGAN_XLA_CACHE", str(tmp_path / "hijack"))
        assert enable_persistent_compilation_cache() == prev

        jax.config.update("jax_compilation_cache_dir", None)
        cache = tmp_path / "xla"
        monkeypatch.setenv("PGGAN_XLA_CACHE", str(cache))
        assert enable_persistent_compilation_cache() == str(cache)
        assert cache.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(cache)

        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.delenv("PGGAN_XLA_CACHE")
        arg = tmp_path / "explicit"
        assert enable_persistent_compilation_cache(str(arg)) == str(arg)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_top_level_tick_and_snapshot_flags_are_live(tmp_path, monkeypatch):
    """--tick_kimg_default / --image_snapshot_ticks must feed DepthManager /
    OutputGenerator (the reference carried both as dead config, train.py:31-32;
    round-3 VERDICT weak #5). The class-scoped flag wins when both are given."""
    import inspect

    import pggan_tpu.cli.train as train_mod

    captured = {}

    class DMRecorder(train_mod.DepthManager):
        def __init__(self, *args, **kwargs):
            captured["dm"] = kwargs
            super().__init__(*args, **kwargs)

        # keep the reflective flag generator seeing the real signature
        __init__.__signature__ = inspect.signature(
            train_mod.DepthManager.__init__)

    class OGRecorder(train_mod.OutputGenerator):
        def __init__(self, *args, **kwargs):
            captured["og"] = kwargs
            super().__init__(*args, **kwargs)

        __init__.__signature__ = inspect.signature(
            train_mod.OutputGenerator.__init__)

    # flag groups key off cls.__name__
    DMRecorder.__name__ = "DepthManager"
    OGRecorder.__name__ = "OutputGenerator"

    monkeypatch.setattr(train_mod, "DepthManager", DMRecorder)
    monkeypatch.setattr(train_mod, "OutputGenerator", OGRecorder)
    monkeypatch.setattr(train_mod.Trainer, "run", lambda self, kimg: None)

    data_dir = str(tmp_path / "imgs")
    _write_pngs(data_dir)
    base = [
        "--result_dir", str(tmp_path / "results"),
        "--exp_name", "deadcfg",
        "--dataset_class", "DefaultImageFolderDataset",
        "--DefaultImageFolderDataset.dir_path", data_dir,
        "--DefaultImageFolderDataset.preload", "True",
        "--Generator.latent_size", "8",
        "--Generator.fmap_base", "32",
        "--Generator.fmap_max", "16",
        "--Discriminator.fmap_base", "32",
        "--Discriminator.fmap_max", "16",
        "--data_parallel", "False",
        "--tick_kimg_default", "0.5",
        "--image_snapshot_ticks", "7",
    ]
    train_mod.cli_main(base)
    assert captured["dm"]["tick_kimg_default"] == 0.5
    assert captured["og"]["output_snapshot_ticks"] == 7

    captured.clear()
    train_mod.cli_main(base + [
        "--DepthManager.tick_kimg_default", "0.25",
        "--OutputGenerator.output_snapshot_ticks", "9",
    ])
    assert captured["dm"]["tick_kimg_default"] == 0.25
    assert captured["og"]["output_snapshot_ticks"] == 9


def test_resolve_generator_path_latest(tmp_path):
    """'latest' picks the newest run dir (by mtime) then the highest kimg,
    preferring the generator-ema twin when one exists (checkpoint.py)."""
    import time

    from pggan_tpu.checkpoint import resolve_generator_path

    root = str(tmp_path)

    def touch(sub, kimg, ema=False, t=None):
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        name = ("network-snapshot-generator-ema-{:06}.dat" if ema
                else "network-snapshot-generator-{:06}.dat").format(kimg)
        p = os.path.join(d, name)
        open(p, "w").close()
        if t is not None:
            os.utime(p, (t, t))
        return p

    now = time.time()
    touch("000-old", 99, t=now - 100)
    best = touch("001-new", 2, t=now)
    touch("001-new", 1, t=now - 1)

    # explicit paths pass through untouched
    assert resolve_generator_path("/some/where.dat", root) == "/some/where.dat"
    # newest dir wins over the older dir's higher kimg; then highest kimg
    assert resolve_generator_path("latest", root) == best
    # the ema twin of the winner is preferred when present
    ema = touch("001-new", 2, ema=True, t=now)
    assert resolve_generator_path("latest", root) == ema
    assert resolve_generator_path("latest", root, prefer_ema=False) == best

    with pytest.raises(SystemExit, match="no generator snapshots"):
        resolve_generator_path("latest", str(tmp_path / "empty"))
