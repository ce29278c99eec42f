"""Epoch-loop bookkeeping (``train.py:437-466`` semantics) with stubbed steps.

The jitted steps and checkpointing are monkeypatched so the test exercises only
the control flow: best-checkpoint saves on improvement, patience-triggered
reload of the best state, forced saves at max_epoch/2-1 and max_epoch-1, and
the ``patience_reload`` gate (``finetune_after == -1``).
"""

import numpy as np

import mumpy_tpu.parallel.mesh as mesh_mod
import mumpy_tpu.train.trainer as trainer_mod
from mumpy_tpu.train.optim import OptimConfig
from mumpy_tpu.train.trainer import TrainLoopConfig, train_loop


class FakeState:
    def __init__(self, tag):
        self.tag = tag
        self.step = 0


def _run_loop(monkeypatch, tmp_path, val_losses, loop_kwargs=None):
    """Run train_loop with scripted per-epoch val losses; returns (events, state)."""
    events = []
    epoch = {"i": -1}

    def fake_make_jitted_steps(mesh=None, compute_dtype=None):
        def jtrain(state, batch, rng):
            return state, {"total": np.float32(0.5), "iou": 0.2, "focal": 0.3}

        def jval(state, batch):
            return {"total": np.float32(val_losses[epoch["i"]]), "iou": 0.2,
                    "focal": 0.3}

        return None, jtrain, jval

    monkeypatch.setattr(trainer_mod, "make_jitted_steps", fake_make_jitted_steps)

    class FakeAsyncSaver:  # records synchronously; wait() is a no-op
        def save(self, d, s, e, extra=None):
            events.append(("save", e))

        def wait(self):
            pass

    monkeypatch.setattr(
        trainer_mod, "ckpt_lib",
        type("L", (), {
            "save": staticmethod(
                lambda d, s, e, extra=None: events.append(("save", e))),
            "AsyncSaver": FakeAsyncSaver,
            "load_latest": staticmethod(
                lambda d, s: (events.append(("reload", None)) or FakeState("best"))),
        }),
    )
    monkeypatch.setattr(mesh_mod, "shard_batch", lambda b, m: b)

    def one_batch():
        yield {"image": np.zeros((1,)), "mask": np.zeros((1,))}

    def train_loader():  # called once per epoch, before val
        epoch["i"] += 1
        return one_batch()

    loaders = {"train": train_loader, "val": one_batch}

    cfg = TrainLoopConfig(
        model_name="loop_test", results_dir=str(tmp_path), max_epoch=len(val_losses),
        patience=1, smooth_curves=False, **(loop_kwargs or {}),
    )
    out = train_loop(FakeState("init"), loaders, cfg, OptimConfig(), iter_max=10)
    return events, out


def test_best_saves_and_forced_saves(monkeypatch, tmp_path):
    # strictly improving: a best-save every epoch plus forced saves at
    # max_epoch/2-1 and max_epoch-1 (``train.py:462-466``)
    events, _ = _run_loop(monkeypatch, tmp_path, [0.9, 0.8, 0.7, 0.6])
    saves = [e[1] for e in events if e[0] == "save"]
    assert saves == [0, 1, 1, 2, 3, 3]


def test_patience_reloads_best(monkeypatch, tmp_path):
    # improvement, then stall past patience=1 -> reload of the best checkpoint
    events, out = _run_loop(monkeypatch, tmp_path, [0.5, 0.9, 0.9, 0.9])
    assert ("reload", None) in events
    assert isinstance(out, FakeState) and out.tag == "best"


def test_patience_reload_fires_at_most_once(monkeypatch, tmp_path):
    # the reference gates the reload on ``not args.update_encoder`` and flips
    # that flag when it fires (``train.py:449-459``) — a second stall past
    # patience must NOT reload again
    events, _ = _run_loop(
        monkeypatch, tmp_path, [0.5, 0.9, 0.9, 0.9, 0.9, 0.9],
    )
    # epoch 2 trips patience -> one reload; epoch 3 improves vs the reset best
    # (1000); epochs 4-5 stall past patience again but the reload stays off
    assert [e for e in events if e[0] == "reload"] == [("reload", None)]


def test_patience_reload_gated_off(monkeypatch, tmp_path):
    # finetune_after == -1 maps to patience_reload=False (``train.py:449``)
    events, out = _run_loop(
        monkeypatch, tmp_path, [0.5, 0.9, 0.9, 0.9],
        loop_kwargs={"patience_reload": False},
    )
    assert ("reload", None) not in events
    assert getattr(out, "tag", None) == "init"


def test_image_grid_writer(tmp_path):
    """write_image_grid mirrors make_grid(normalize=True, scale_each=True):
    per-image min-max scaling, nrow layout, padded separators."""
    import numpy as np

    from mumpy_tpu.train.trainer import MetricsWriter

    logged = []

    class FakeTB:
        def add_image(self, tag, img, step):
            logged.append((tag, img, step))

        def add_scalar(self, *a):
            pass

        def close(self):
            pass

    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.tb = FakeTB()
    imgs = np.stack([np.full((4, 4), 5.0), np.arange(16.0).reshape(4, 4)])
    w.write_image_grid("prediction", imgs, step=7, nrow=2, padding=1)
    w.close()

    (tag, grid, step), = logged
    assert tag == "prediction" and step == 7
    assert grid.shape == (1, 4 + 2, 2 * (4 + 1) + 1)  # 1 row of 2, padding 1
    # image 2 scale_each: 0..15 -> 0..1
    np.testing.assert_allclose(grid[0, 1:5, 6:10].max(), 1.0, atol=1e-6)
    np.testing.assert_allclose(grid[0, 1:5, 6:10].min(), 0.0, atol=1e-6)


def test_train_step_returns_preds():
    """The jitted train step carries sigmoid predictions for the TB grids."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mumpy_tpu.configs.model_config import tiny_config
    from mumpy_tpu.train.optim import OptimConfig
    from mumpy_tpu.train.trainer import create_train_state, train_step

    cfg = tiny_config()
    state = create_train_state(cfg, OptimConfig(), iter_max=10,
                               rng=jax.random.PRNGKey(0))
    batch = {
        "image": jnp.zeros((2, 3, cfg.image_size, cfg.image_size, 3)),
        "mask": jnp.zeros((2, cfg.image_size * cfg.image_size)),
    }
    _, m = train_step(state, batch, jax.random.PRNGKey(0))
    preds = np.asarray(m["preds"])
    assert preds.shape == (2, cfg.image_size, cfg.image_size)
    assert ((preds >= 0) & (preds <= 1)).all()
