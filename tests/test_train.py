"""End-to-end training smoke tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from colddiff.data.datasets import ArrayDataset, DataLoader, SyntheticDataset
from colddiff.diffusion import ColdDiffusion
from colddiff.models import UnetConvNext
from colddiff.operators import get_operator
from colddiff.train import Trainer


def make_trainer(tmp_path, **kw):
    op = get_operator("blur", image_size=16, timesteps=4, blur_routine="Constant",
                      kernel_size=3, kernel_std=1.0)
    d = ColdDiffusion(op=op, image_size=16, channels=3, sampling_routine="x0_step_down")
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    ds = SyntheticDataset(16, 3, length=64)
    defaults = dict(
        train_batch_size=8, train_num_steps=3, gradient_accumulate_every=2,
        save_and_sample_every=2, results_folder=str(tmp_path / "results"),
        num_workers=2,
    )
    defaults.update(kw)
    return Trainer(d, model, ds, **defaults)


def test_train_loop_updates_params_and_saves(tmp_path):
    assert len(jax.devices()) == 8, "tests must run on the virtual 8-device mesh"
    tr = make_trainer(tmp_path)
    p0 = jax.device_get(tr.state.params)
    tr.train(log_every=1)
    p1 = jax.device_get(tr.state.params)
    # params changed
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, p0, p1), 0.0,
    )
    assert diff > 0
    # sample grids + checkpoint written
    results = tmp_path / "results"
    assert (results / "og-1.png").exists()
    assert (results / "sample-1.png").exists()
    assert (results / "model").exists()
    # EMA warm: equals params during warmup at update steps
    ema = jax.device_get(tr.state.ema_params)


def test_checkpoint_resume_roundtrip(tmp_path):
    tr = make_trainer(tmp_path, train_num_steps=2, save_and_sample_every=100)
    tr.train(log_every=10)
    tr.save()
    tr2 = make_trainer(tmp_path, train_num_steps=2, save_and_sample_every=100,
                       load_path=str(tmp_path / "results" / "model"))
    assert tr2.step == 2
    a = jax.device_get(tr.state.params)
    b = jax.device_get(tr2.state.params)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, atol=0), a, b
    )


def test_restored_operator_samples_under_jit(tmp_path):
    """Regression: Orbax restores numpy leaves; a numpy cum[t] gather with a
    traced t inside the sampling scan raised TracerArrayConversionError when
    the restored diffusion was closed over by a jitted sampler (the exact
    CLI `test --load_path` path)."""
    from colddiff.sampling import all_sample

    tr = make_trainer(tmp_path, train_num_steps=0, save_and_sample_every=100)
    tr.save()
    tr2 = make_trainer(tmp_path, train_num_steps=0, save_and_sample_every=100,
                       load_path=str(tmp_path / "results" / "model"))

    d2, model, params = tr2.diffusion, tr2.model, tr2.state.params

    @jax.jit
    def run(img):
        # d2 closed over, as EvalHarness does -- numpy op leaves would break
        return all_sample(d2, lambda x, t: model.apply(params, x, t), img).img

    out = run(jnp.zeros((2, 16, 16, 3)))
    assert np.all(np.isfinite(np.asarray(out)))


def test_family_b_training_with_noise_endpoint(tmp_path):
    op = get_operator("noise", timesteps=6)
    d = ColdDiffusion(op=op, image_size=16, channels=3, sampling_routine="x0_step_down")
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    ds = SyntheticDataset(16, 3, length=32)
    tr = Trainer(d, model, ds, train_batch_size=8, train_num_steps=1,
                 save_and_sample_every=100, results_folder=str(tmp_path / "r"),
                 num_workers=1)
    tr.train(log_every=10)
    assert tr.step == 1


def test_remat_training_step(tmp_path):
    tr = make_trainer(tmp_path, train_num_steps=1, save_and_sample_every=100,
                      remat=True)
    tr.train(log_every=10)
    assert tr.step == 1


def test_checkpoint_includes_operator_state(tmp_path):
    from colddiff.operators import Snow

    op = Snow.create(image_size=16, timesteps=3, snow_level=1, random_snow=True,
                     seed=3)
    d = ColdDiffusion(op=op, image_size=16, channels=3)
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    ds = SyntheticDataset(16, 3, length=16)
    tr = Trainer(d, model, ds, train_batch_size=8, train_num_steps=0,
                 save_and_sample_every=10**9,
                 results_folder=str(tmp_path / "r"), num_workers=1)
    tr.save()
    # a fresh trainer with different snow state restores the saved fields
    op2 = Snow.create(image_size=16, timesteps=3, snow_level=1, random_snow=True,
                      seed=99)
    d2 = ColdDiffusion(op=op2, image_size=16, channels=3)
    tr2 = Trainer(d2, model, ds, train_batch_size=8, train_num_steps=0,
                  save_and_sample_every=10**9,
                  results_folder=str(tmp_path / "r2"), num_workers=1,
                  load_path=str(tmp_path / "r" / "model"))
    np.testing.assert_allclose(
        np.asarray(tr2.diffusion.op.snow), np.asarray(op.snow)
    )


def test_dataloader_shapes_and_determinism():
    ds = SyntheticDataset(8, 3, length=20, seed=1)
    dl = DataLoader(ds, batch_size=4, num_workers=2, seed=0)
    batches = list(dl)
    assert len(batches) == 5
    assert batches[0].shape == (4, 8, 8, 3)
    assert batches[0].dtype == np.float32
    # same item is deterministic
    np.testing.assert_allclose(ds[3], ds[3])


def test_array_dataset_cifar_aug():
    imgs = (np.random.default_rng(0).random((10, 16, 16, 3)) * 255).astype(np.uint8)
    ds = ArrayDataset(imgs, aug="cifar")
    x = ds[0]
    assert x.shape == (16, 16, 3) and x.min() >= -1.0 and x.max() <= 1.0


def test_bf16_flag_actually_computes_in_bf16(tmp_path):
    """Regression: casting only the input is a no-op (flax layers with
    dtype=None promote activations back to the fp32 param dtype); bf16=True
    must cast params at apply time so compute really runs in bf16, while the
    master params stay fp32."""
    import jax.numpy as jnp

    tr32 = make_trainer(tmp_path / "a", bf16=False)
    tr16 = make_trainer(tmp_path / "b", bf16=True)
    params = jax.device_get(tr32.state.params)
    tr16.state = tr16.state.replace(params=jax.device_get(tr16.state.params))

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)),
                    jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    y32 = np.asarray(tr32._denoise_fn(params, None, train=False)(x, t))
    y16 = np.asarray(tr16._denoise_fn(params, None, train=False)(x, t))
    d = np.max(np.abs(y32 - y16))
    assert d > 0.0, "bf16 path produced fp32-identical outputs (no-op cast)"
    assert d < 0.1, f"bf16 path diverged from fp32: {d}"
    # master params stay fp32
    for leaf in jax.tree_util.tree_leaves(tr16.state.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32


def test_debug_nans_flag_raises_on_nonfinite_batch(tmp_path):
    """The NaN sanitizer (SURVEY.md section 5): debug_nans=True must turn a
    non-finite loss into an immediate FloatingPointError instead of silently
    corrupting the run."""
    import pytest

    op = get_operator("blur", image_size=16, timesteps=4,
                      blur_routine="Constant", kernel_size=3, kernel_std=1.0)
    d = ColdDiffusion(op=op, image_size=16, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    bad = np.full((16, 16, 16, 3), np.nan, np.float32)
    try:
        tr = Trainer(
            d, model, ArrayDataset(bad),
            train_batch_size=8, train_num_steps=1, gradient_accumulate_every=2,
            save_and_sample_every=10**9, results_folder=str(tmp_path / "r"),
            num_workers=1, debug_nans=True,
        )
        # the sanitizer may fire in batch prep or in the jitted step --
        # either way the NaN must surface as an error, not a silent loss
        with pytest.raises(FloatingPointError):
            batch, batch2 = tr._next_superbatch()
            _, loss = tr._train_step(tr.state, tr.diffusion, batch, batch2)
            float(loss)
    finally:
        jax.config.update("jax_debug_nans", False)


def test_snapshot_small_dataset_does_not_hang(tmp_path):
    """A dataset smaller than the snapshot grid size must not leave the
    drop_last snapshot loader empty (cycle() would spin forever pre-fix;
    now the loader batch clamps to the dataset and cycle() raises loudly
    on a genuinely empty iterable)."""
    op = get_operator("blur", image_size=16, timesteps=4,
                      blur_routine="Constant", kernel_size=3, kernel_std=1.0)
    d = ColdDiffusion(op=op, image_size=16, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    ds = SyntheticDataset(16, 3, length=8)  # smaller than the n=36 default
    tr = Trainer(d, model, ds, train_batch_size=8, train_num_steps=0,
                 results_folder=str(tmp_path / "results"), num_workers=1)
    og, x_end = tr._snapshot_batch(36)
    assert og.shape[0] == 8 and x_end is None
    # a later, larger request rebuilds the cached loader instead of
    # silently returning the first call's batch size
    ds2 = SyntheticDataset(16, 3, length=64)
    tr2 = Trainer(d, model, ds2, train_batch_size=8, train_num_steps=0,
                  results_folder=str(tmp_path / "results2"), num_workers=1)
    first, _ = tr2._snapshot_batch(8)
    assert first.shape[0] == 8
    bigger, _ = tr2._snapshot_batch(36)
    assert bigger.shape[0] == 36


def test_cycle_raises_on_empty_iterable():
    import pytest

    from colddiff.utils import cycle

    it = cycle([])
    with pytest.raises(ValueError):
        next(it)


def test_restart_every_steps_boundary_and_resume(tmp_path):
    """Leak-aware long runs: train() checkpoints and returns "restart" at
    each --restart_every_steps boundary; a fresh auto_resume Trainer picks
    up exactly where the previous worker stopped (the machinery that bounds
    the axon host-RSS leak, docs/USAGE.md)."""
    kw = dict(train_num_steps=5, save_and_sample_every=100,
              restart_every_steps=2)
    tr = make_trainer(tmp_path, **kw)
    assert tr.train(log_every=10) == "restart"
    assert tr.step == 2
    assert (tmp_path / "results" / "model").exists()

    tr2 = make_trainer(tmp_path, auto_resume=True, **kw)
    assert tr2.step == 2
    assert tr2.train(log_every=10) == "restart"
    assert tr2.step == 4

    tr3 = make_trainer(tmp_path, auto_resume=True, **kw)
    assert tr3.train(log_every=10) == "done"
    assert tr3.step == 5


def test_restart_rss_threshold(tmp_path):
    """A tiny RSS threshold triggers the restart path immediately."""
    tr = make_trainer(tmp_path, train_num_steps=3, save_and_sample_every=100,
                      restart_rss_gb=0.001)
    assert tr.train(log_every=10) == "restart"
    assert tr.step == 1


def test_cli_restart_supervisor_loop(tmp_path, monkeypatch):
    """The CLI supervisor respawns workers while they exit with the restart
    code, appends --resume_training, marks children via env, and never
    builds a Trainer itself."""
    import importlib

    cli_main = importlib.import_module("colddiff.cli.main")

    calls = []
    rcs = iter([75, 75, 0])

    class R:
        def __init__(self, rc):
            self.returncode = rc

    def fake_run(argv, env=None):
        calls.append((argv, env))
        return R(next(rcs))

    monkeypatch.setattr("subprocess.run", fake_run)
    import pytest as _pytest

    argv = ["train", "--dataset", "synthetic", "--train_steps", "4",
            "--restart_every_steps", "2",
            "--save_folder", str(tmp_path / "out")]
    with _pytest.raises(SystemExit) as e:
        cli_main.main(argv)
    assert e.value.code == 0
    assert len(calls) == 3
    for child_argv, env in calls:
        assert child_argv[:3] == [__import__("sys").executable, "-m",
                                  "colddiff.cli.main"]
        assert "--resume_training" in child_argv
        assert env["COLDDIFF_RESTART_WORKER"] == "1"


def test_auto_resume_beats_load_path_for_restart_workers(tmp_path):
    """A warm-started (--load_path) run respawned by the restart supervisor
    must continue from its OWN rolling checkpoint, not re-load the original
    warm-start each time (which would loop the supervisor forever at the
    first boundary)."""
    # the "original" warm-start checkpoint: 1 step, saved elsewhere
    warm = make_trainer(tmp_path / "warm", train_num_steps=1,
                        save_and_sample_every=100)
    warm.train(log_every=10)
    # the actual run folder: progressed to step 3, rolling ckpt present
    run = make_trainer(tmp_path / "run", train_num_steps=3,
                       save_and_sample_every=100)
    run.train(log_every=10)
    # a respawned worker passes BOTH the original --load_path and
    # --resume_training; the rolling checkpoint must win
    tr = make_trainer(tmp_path / "run", train_num_steps=5,
                      save_and_sample_every=100,
                      load_path=str(tmp_path / "warm" / "results" / "model"),
                      auto_resume=True)
    assert tr.step == 3  # not 1


def test_snapshot_demixing_batches_share_one_size(tmp_path):
    """With a second (endpoint) dataset smaller than the snapshot size, og
    and x_end must come out the same length (demixing degrades og against
    x_end elementwise)."""
    op = get_operator("mix", timesteps=4)
    d = ColdDiffusion(op=op, image_size=16, channels=3,
                      sampling_routine="x0_step_down")
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    ds = SyntheticDataset(16, 3, length=64)
    ds2 = SyntheticDataset(16, 3, length=8, seed=1)
    tr = Trainer(d, model, ds, second_dataset=ds2, train_batch_size=8,
                 train_num_steps=0, results_folder=str(tmp_path / "r"),
                 num_workers=1)
    og, x_end = tr._snapshot_batch(36)
    assert og.shape[0] == x_end.shape[0] == 8
