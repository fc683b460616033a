import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinicube_tpu.config import Config, load_config
from infinicube_tpu.training.checkpoint import CheckpointManager, partial_restore
from infinicube_tpu.training.loop import LoopConfig, LossMeter, train
from infinicube_tpu.training.state import TrainConfig, TrainState, make_train_step
from infinicube_tpu.parallel.mesh import MeshConfig, make_mesh


def test_config_includes_interpolation_overrides(tmp_path):
    (tmp_path / "base.yaml").write_text(
        "a: 1\nnested:\n  b: 2\n  c: hello\n")
    (tmp_path / "main.yaml").write_text(
        "include_configs:\n  - base.yaml\nnested:\n  b: 3\n"
        "d: ${nested.c}_world\ne: ${a}\n")
    cfg = load_config(tmp_path / "main.yaml", overrides=["nested.c=bye",
                                                         "f.g=[1,2]"])
    assert cfg.a == 1 and cfg.nested.b == 3
    assert cfg.d == "hello_world"      # interpolation before overrides
    assert cfg.e == 1                  # whole-value interpolation keeps type
    assert cfg.nested.c == "bye"
    assert cfg.f.g == [1, 2]


def test_train_step_nan_guard_and_ema():
    cfg = TrainConfig(learning_rate=0.1, use_ema=True, grad_clip_value=1.0)
    params = {"w": jnp.array([1.0, 2.0])}

    def loss_fn(p, rng, batch):
        loss = jnp.sum(p["w"] * batch)
        return loss, {}

    step = jax.jit(make_train_step(cfg, loss_fn))
    state = TrainState.create(cfg, params)
    state, m = step(state, jax.random.PRNGKey(0), jnp.array([1.0, 1.0]))
    assert float(m["grad_finite"]) == 1.0
    w_after = np.asarray(state.params["w"])
    assert (w_after < np.array([1.0, 2.0])).all()
    # NaN batch: update skipped, counter incremented
    state2, m2 = step(state, jax.random.PRNGKey(0),
                      jnp.array([jnp.nan, 1.0]))
    assert float(m2["grad_finite"]) == 0.0
    np.testing.assert_array_equal(np.asarray(state2.params["w"]), w_after)
    assert int(state2.num_nan_skips) == 1


def test_checkpoint_roundtrip_and_partial_restore(tmp_path):
    cfg = TrainConfig()
    params = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    state = TrainState.create(cfg, params)
    mgr = CheckpointManager(tmp_path / "ck", save_interval_steps=1)
    mgr.save(3, state, force=True)
    mgr.wait()
    assert mgr.latest_step() == 3
    restored = mgr.restore(jax.tree.map(np.zeros_like, state))
    np.testing.assert_array_equal(np.asarray(restored.params["a"]),
                                  np.arange(4.0))
    # partial restore skips shape mismatches
    merged = partial_restore({"a": np.zeros(4), "b": {"c": np.zeros((3, 3))}},
                             {"a": np.ones(4), "b": {"c": np.ones((2, 2))}})
    np.testing.assert_array_equal(merged["a"], np.ones(4))
    assert merged["b"]["c"].shape == (3, 3)


def test_training_loop_reduces_loss(tmp_path):
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    params = {"w": jnp.zeros(3)}
    target = jnp.array([1.0, -2.0, 0.5])

    def loss_fn(p, rng, batch):
        pred = batch @ p["w"]
        gt = batch @ target
        loss = jnp.mean((pred - gt) ** 2)
        return loss, {}

    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)

    logs = []
    state = train(LoopConfig(max_steps=200, log_every=100, ckpt_every=1000,
                             ckpt_dir=str(tmp_path / "ck"), resume=False),
                  TrainConfig(learning_rate=0.05, use_ema=False),
                  params, loss_fn, batches(), jax.random.PRNGKey(0),
                  logger=lambda s, m: logs.append((s, m)), mesh=mesh)
    assert int(state.step) == 200
    assert logs[-1][1]["loss"] < logs[0][1]["loss"]
    np.testing.assert_allclose(np.asarray(state.params["w"]),
                               np.asarray(target), atol=0.2)


def test_loss_meter_nan_assert():
    m = LossMeter()
    m.update({"a": 1.0})
    m.update({"a": 3.0})
    assert m.means()["a"] == 2.0
    with pytest.raises(AssertionError):
        m.update({"a": float("nan")})


def test_train_cli_smoke(tmp_path):
    from infinicube_tpu.train import main
    main(["none", "--name", "smoke", "--logdir", str(tmp_path),
          "--exec", "max_steps=2", "log_every=1", "ckpt_every=1000",
          f"ckpt_dir={tmp_path}/ck",
          "diffusion.cube_dims=(8,8,8)", "diffusion.cube_ijk_min=(-4,-4,-4)",
          "diffusion.latent_voxel_size=(1.0,1.0,1.0)",
          "diffusion.latent_origin=(0.5,0.5,0.5)",
          "diffusion.latent_channels=2", "diffusion.model_channels=8",
          "diffusion.channel_mult=(1,2)", "diffusion.attention_ds=()",
          "diffusion.num_res_blocks=1", "diffusion.num_heads=2",
          "diffusion.transformer_depth=1", "diffusion.num_map_types=2"])
    assert (tmp_path / "smoke.jsonl").exists()


def test_resolve_checkpoint_paths(tmp_path):
    from infinicube_tpu.utils.run_resolve import resolve_checkpoint
    (tmp_path / "ckpt_5.npz").write_bytes(b"x")
    (tmp_path / "ckpt_9.npz").write_bytes(b"x")
    assert resolve_checkpoint(f"tb:{tmp_path}").name == "ckpt_9.npz"
    assert resolve_checkpoint("/some/local/path").name == "path"
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint(f"tb:{tmp_path}/empty")


def test_resolve_wandb_artifacts(tmp_path, monkeypatch):
    """wdb: references (reference wandb_util.py:75-233, load-bearing for
    resume) — run-path parse, model-type artifact filter, version pin, and
    the no-artifact error, exercised against a faked wandb API."""
    import sys
    import types
    from infinicube_tpu.utils.run_resolve import resolve_checkpoint

    class Art:
        def __init__(self, type_, version, path):
            self.type, self.version, self._p = type_, version, path

        def download(self):
            return str(self._p)

    arts = [Art("dataset", "v0", tmp_path / "d"),
            Art("model", "v0", tmp_path / "m0"),
            Art("model", "v1", tmp_path / "m1")]

    class Run:
        def logged_artifacts(self):
            return arts

    class Api:
        def run(self, run_path):
            assert run_path == "ent/proj/run7"
            return Run()

    fake = types.ModuleType("wandb")
    fake.Api = Api
    monkeypatch.setitem(sys.modules, "wandb", fake)

    # latest model artifact by default; version pin selects explicitly
    assert resolve_checkpoint("wdb:ent/proj/run7").name == "m1"
    assert resolve_checkpoint("wdb:ent/proj/run7:v0").name == "m0"
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint("wdb:ent/proj/run7:v9")


def test_default_val_fn_and_topk_monitor(tmp_path):
    """val_data without val_fn triggers the default EMA validation; its
    metrics drive top-k-on-metric checkpoint retention (ckpt_monitor)."""
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    params = {"w": jnp.zeros(3)}
    target = jnp.array([1.0, -2.0, 0.5])

    def loss_fn(p, rng, batch):
        pred = batch @ p["w"]
        gt = batch @ target
        loss = jnp.mean((pred - gt) ** 2)
        return loss, {"mse": loss}

    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)

    def val_data():
        vr = np.random.default_rng(1)
        for _ in range(2):
            yield jnp.asarray(vr.normal(size=(8, 3)), jnp.float32)

    logs = []
    state = train(
        LoopConfig(max_steps=60, log_every=20, val_every=20, val_batches=2,
                   ckpt_every=20, ckpt_dir=str(tmp_path / "ck"),
                   ckpt_keep=1, ckpt_monitor="val_loss", resume=False),
        TrainConfig(learning_rate=0.05, use_ema=True),
        params, loss_fn, batches(), jax.random.PRNGKey(0),
        logger=lambda s, m: logs.append((s, m)), val_data=val_data,
        mesh=mesh)
    assert int(state.step) == 60
    val_logs = [(s, m) for s, m in logs if "val/val_loss" in m]
    assert len(val_logs) >= 2            # default val_fn ran on schedule
    assert "val/mse" in val_logs[0][1]   # loss_fn metrics forwarded
    # val loss improves (EMA lags but must still trend down)
    assert val_logs[-1][1]["val/val_loss"] < val_logs[0][1]["val/val_loss"]
    # top-k retention kept a checkpoint
    mgr = CheckpointManager(str(tmp_path / "ck"), 1, 20, monitor="val_loss")
    assert mgr.latest_step() is not None


def test_trainable_substrings_freeze():
    """TrainConfig.trainable_substrings finetunes only matching params
    (reference turn_on_decoder decoder-only finetune, sunet.py:675-705)."""
    params = {"enc": {"w": jnp.ones(3)}, "dec": {"w": jnp.ones(3)}}

    def loss_fn(p, rng, batch):
        out = batch @ (p["enc"]["w"] + p["dec"]["w"])
        return jnp.mean(out ** 2), {}

    tc = TrainConfig(learning_rate=0.1, use_ema=False,
                     trainable_substrings=("dec",))
    state = TrainState.create(tc, params)
    step = jax.jit(make_train_step(tc, loss_fn))
    state, _ = step(state, jax.random.PRNGKey(0),
                    jnp.ones((4, 3), jnp.float32))
    np.testing.assert_array_equal(np.asarray(state.params["enc"]["w"]),
                                  np.ones(3))          # frozen
    assert np.abs(np.asarray(state.params["dec"]["w"]) - 1).max() > 1e-4


def test_gsm_lpips_config_plumbing(monkeypatch):
    """``lpips_checkpoint`` in the train config routes the GSM loss through
    the real LPIPS-VGG16 module (the reference trains with LPIPS,
    unified_loss.py:39-43) instead of the gradient proxy."""
    import infinicube_tpu.models.gsm.lpips as lpips_mod
    from infinicube_tpu.train import build_gsm

    calls = []
    real_lpips = lpips_mod.LPIPS

    class RecordingLPIPS(real_lpips):
        def apply(self, *a, **kw):
            calls.append(1)
            return real_lpips.apply(self, *a, **kw)

    monkeypatch.setattr(lpips_mod, "LPIPS", RecordingLPIPS)

    cfg = Config({"lpips_checkpoint": "random"})
    params, loss_fn, batches = build_gsm(cfg)
    total, metrics = loss_fn(params, jax.random.PRNGKey(0), next(batches))
    assert calls, "LPIPS module was not invoked"
    assert "perceptual" in metrics and np.isfinite(float(total))
