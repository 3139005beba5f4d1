"""Checkpoint round trips and decoder-only partial restore (SURVEY §5)."""

import numpy as np
import jax

from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.train import checkpoint as ckpt


def _model(fixed=False):
    return RENIModel(
        RENIConfig(
            latent_dim=4,
            hidden_layers=1,
            hidden_features=16,
            mapping_layers=1,
            mapping_features=16,
            fixed_decoder=fixed,
        )
    )


def test_roundtrip(tmp_path):
    model = _model()
    params = model.init(jax.random.PRNGKey(0), dataset_size=3)
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(
        path, params, model_config=model.config, metadata={"task": "FIT_DECODER", "epoch": 7}
    )
    loaded, meta = ckpt.load_checkpoint(path)
    assert meta["task"] == "FIT_DECODER" and meta["epoch"] == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        loaded,
    )


def test_model_config_restore(tmp_path):
    model = _model()
    params = model.init(jax.random.PRNGKey(1), dataset_size=2)
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, params, model_config=model.config)
    cfg = ckpt.load_model_config(path, fixed_decoder=True)
    assert cfg.latent_dim == 4
    assert cfg.fixed_decoder is True


def test_decoder_only_restore_new_dataset_size(tmp_path):
    model = _model()
    params = model.init(jax.random.PRNGKey(2), dataset_size=3)
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, params, model_config=model.config)

    fixed = _model(fixed=True)
    new = ckpt.load_decoder_only(path, fixed, dataset_size=11, key=jax.random.PRNGKey(3))
    assert new["latents"]["mu"].shape == (11, 4, 3)
    assert np.asarray(new["latents"]["mu"]).max() == 0.0  # fixed-decoder init
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params["decoder"],
        new["decoder"],
    )

    # the restored decoder decodes identically
    rng = np.random.default_rng(0)
    Z = jax.numpy.asarray(rng.normal(size=(1, 4, 3)).astype(np.float32))
    D = jax.numpy.asarray(rng.normal(size=(1, 10, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(model.apply(params, Z, D)), np.asarray(fixed.apply(new, Z, D))
    )


def test_opt_state_roundtrip(tmp_path):
    """Optimizer state (optax NamedTuples) survives the flat store."""
    import optax
    import jax.numpy as jnp

    model = _model()
    params = model.init(jax.random.PRNGKey(10), dataset_size=2)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    # advance it so moments are nonzero
    grads = jax.tree.map(jnp.ones_like, params)
    _, opt_state = opt.update(grads, opt_state, params)

    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, params, opt_state=opt_state)
    template = opt.init(params)
    restored = ckpt.load_opt_state(path, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        opt_state,
        restored,
    )
    # params load ignores the __opt__ leaves
    loaded, _ = ckpt.load_checkpoint(path)
    assert "__opt__" not in loaded


def test_latest_survives_bestk_retention(tmp_path):
    """Best-K retention must not defeat crash-resume: with a non-monotonic
    loss curve the newest epoch is kept as ``{task}_latest`` even after its
    best-by-loss file is pruned, and find_latest resolves a run dir to it."""
    import os

    from reni_tpu.cli.run import _BestTracker

    model = _model()
    params = model.init(jax.random.PRNGKey(20), dataset_size=2)
    save_dir = str(tmp_path / "checkpoints")
    tracker = _BestTracker(save_dir, "FIT_LATENT", model.config, keep=2)
    # loss spikes upward: epoch 12 is newest but worst
    for epoch, loss in ((4, 1.0), (8, 0.5), (12, 2.0)):
        tracker.maybe_save(params, epoch, loss)

    assert not os.path.exists(os.path.join(save_dir, "fit_latent_epoch=0012.npz"))
    latest = ckpt.find_latest(str(tmp_path))
    _, meta = ckpt.load_checkpoint(latest)
    assert meta["epoch"] == 12
    assert tracker.best_path.endswith("epoch=0008")

    # explicit file paths pass through untouched
    assert ckpt.find_latest(tracker.best_path) == tracker.best_path


def test_midtask_resume_exact(tmp_path):
    """Fit 10 epochs straight vs fit 4 -> checkpoint -> resume 6: identical
    parameters (exact LR schedule and adam moments)."""
    import jax.numpy as jnp

    from reni_tpu.core import sphere
    from reni_tpu.train import tasks
    from reni_tpu.train.optim import OptimConfig

    model = _model()
    params0 = model.init(jax.random.PRNGKey(11), dataset_size=2)
    d = np.asarray(sphere.get_directions(16))[0]
    rng = np.random.default_rng(12)
    images = jnp.asarray(
        np.stack([np.tanh(d @ rng.normal(size=(3, 3))) for _ in range(2)]).astype(
            np.float32
        )
    )

    def cfg(epochs):
        return tasks.TaskConfig(
            task="FIT_DECODER",
            optim=OptimConfig(lr_start=1e-3, lr_end=1e-4),
            batch_size=2,
            epochs=epochs,
            multi_res_training=False,
            final_resolution=(8, 16),
        )

    key = jax.random.PRNGKey(13)
    p_straight, m_straight = tasks.fit_task(
        model, params0, cfg(10), lambda r: images, key
    )

    saved = {}

    def save_cb(state, epoch, metrics, res):
        if epoch == 4:
            path = str(tmp_path / "mid")
            ckpt.save_checkpoint(
                path, state.params, metadata={"epoch": epoch},
                opt_state=state.opt_state, rng_key=state.key,
            )
            saved["path"] = path

    p_part, _ = tasks.fit_task(
        model, params0, cfg(10), lambda r: images, key,
        callback_every=2, callback=save_cb,
    )
    # straight-through with segmentation must equal unsegmented
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        p_straight,
        p_part,
    )

    mid_params, meta = ckpt.load_checkpoint(saved["path"])
    resume_key = ckpt.load_rng_key(saved["path"])
    p_resumed, m_resumed = tasks.fit_task(
        model, mid_params, cfg(10), lambda r: images, resume_key,
        start_epoch=meta["epoch"],
        initial_opt_state=lambda tmpl: ckpt.load_opt_state(saved["path"], tmpl),
    )
    assert m_resumed["fit_decoder_loss"].shape == (6,)
    np.testing.assert_allclose(
        m_resumed["fit_decoder_loss"], m_straight["fit_decoder_loss"][4:], rtol=1e-4
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        p_straight,
        p_resumed,
    )
