"""Training-task tests: batching, curriculum staging, LR schedule, and the
SURVEY §4(f) oracle — overfitting a single synthetic environment map."""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.train import losses, tasks
from reni_tpu.train.optim import OptimConfig, build_schedule


def test_make_batches_exact_and_ragged():
    idx, mask = tasks.make_batches(6, 3)
    assert idx.shape == (2, 3) and mask.sum() == 6
    idx, mask = tasks.make_batches(7, 3)
    assert idx.shape == (3, 3)
    assert mask.sum() == 7
    assert list(idx.reshape(-1)[:7]) == list(range(7))
    assert mask.reshape(-1)[7:].sum() == 0


def test_resolution_stages_published_config():
    cfg = tasks.TaskConfig(
        epochs=2400,
        initial_resolution=(16, 32),
        final_resolution=(64, 128),
        curriculum=(800, 1600),
    )
    assert cfg.resolution_stages() == [
        ((16, 32), 800),
        ((32, 64), 800),
        ((64, 128), 800),
    ]
    cfg_flat = dataclasses.replace(cfg, multi_res_training=False)
    assert cfg_flat.resolution_stages() == [((64, 128), 2400)]


def test_exponential_schedule_matches_reference_gamma():
    cfg = OptimConfig(lr_start=1e-2, lr_end=1e-4, epochs=100, steps_per_epoch=5)
    sched = build_schedule(cfg)
    gamma = math.exp(math.log(1e-4 / 1e-2) / 100)
    # during epoch 0: lr_start; during epoch 3: lr_start * gamma^3
    np.testing.assert_allclose(float(sched(0)), 1e-2, rtol=1e-6)
    np.testing.assert_allclose(float(sched(4)), 1e-2, rtol=1e-6)
    np.testing.assert_allclose(float(sched(15)), 1e-2 * gamma**3, rtol=1e-6)
    # after the full schedule the lr reaches lr_end
    np.testing.assert_allclose(float(sched(100 * 5)), 1e-4, rtol=1e-5)


def _synthetic_envmaps(n, width, seed=0):
    """Smooth band-limited env maps in [-1, 1], shape (n, H*W, 3)."""
    d = np.asarray(sphere.get_directions(width))[0]  # (P, 3)
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        w1 = rng.normal(size=(3, 3))
        w2 = rng.normal(size=(3, 3))
        img = np.tanh(d @ w1 + np.sin(2 * d) @ w2)
        out.append(img)
    return jnp.asarray(np.stack(out).astype(np.float32))


def test_fit_decoder_overfits_one_image():
    """AD, 1 image at 16x32 on CPU — loss must drop by >10x (oracle f)."""
    model = RENIModel(
        RENIConfig(
            model_type="AutoDecoder",
            equivariance="SO2",
            latent_dim=9,
            hidden_layers=2,
            hidden_features=64,
            output_activation=None,
        )
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=1)
    images = _synthetic_envmaps(1, 32)

    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-3, lr_end=1e-4, beta1=0.9, beta2=0.999),
        batch_size=1,
        epochs=300,
        multi_res_training=False,
        final_resolution=(16, 32),
    )
    params, metrics = tasks.fit_task(
        model, params, cfg, lambda res: images, jax.random.PRNGKey(1)
    )
    hist = metrics["fit_decoder_loss"]
    assert hist.shape == (300,)
    assert hist[-1] < hist[0] / 10.0, (hist[0], hist[-1])


def test_fit_decoder_vad_metrics_and_curriculum():
    model = RENIModel(
        RENIConfig(
            model_type="VariationalAutoDecoder",
            equivariance="SO2",
            latent_dim=5,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
        )
    )
    params = model.init(jax.random.PRNGKey(2), dataset_size=3)
    imgs_by_res = {
        (8, 16): _synthetic_envmaps(3, 16),
        (16, 32): _synthetic_envmaps(3, 32),
    }
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-4, lr_end=1e-5),
        batch_size=2,  # ragged: 3 images -> batches of 2 + masked 1
        epochs=20,
        multi_res_training=True,
        initial_resolution=(8, 16),
        final_resolution=(16, 32),
        curriculum=(10,),
        kld_weighting=1e-4,
    )
    params, metrics = tasks.fit_task(
        model, params, cfg, lambda res: imgs_by_res[res], jax.random.PRNGKey(3)
    )
    for k in ("fit_decoder_loss", "fit_decoder_mse_loss", "fit_decoder_kld_loss"):
        assert metrics[k].shape == (20,)
    assert np.isfinite(metrics["fit_decoder_loss"]).all()


def test_fit_latent_only_updates_mu():
    model = RENIModel(
        RENIConfig(
            model_type="VariationalAutoDecoder",
            equivariance="SO2",
            latent_dim=5,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
            fixed_decoder=True,
        )
    )
    params = model.init(jax.random.PRNGKey(4), dataset_size=2)
    decoder_before = jax.tree.map(np.asarray, params["decoder"])
    log_var_before = np.asarray(params["latents"]["log_var"])

    images = _synthetic_envmaps(2, 16, seed=7)
    cfg = tasks.TaskConfig(
        task="FIT_LATENT",
        optim=OptimConfig(lr_start=1e-1, lr_end=1e-2),
        batch_size=2,
        epochs=60,
        multi_res_training=False,
        final_resolution=(8, 16),
        prior_loss_weight=1e-7,
        cosine_similarity_weight=1e-4,
    )
    new_params, metrics = tasks.fit_task(
        model, params, cfg, lambda res: images, jax.random.PRNGKey(5)
    )
    # decoder and log_var untouched
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        decoder_before,
        new_params["decoder"],
    )
    np.testing.assert_array_equal(log_var_before, np.asarray(new_params["latents"]["log_var"]))
    # mu moved, loss decreased
    assert not np.allclose(np.asarray(new_params["latents"]["mu"]), 0.0)
    hist = metrics["fit_latent_loss"]
    assert hist[-1] < hist[0]


def test_fit_latent_masked_region_ignored():
    """Zeroed sineweight region produces zero gradient signal from there:
    training with a mask must match training on masked targets."""
    model = RENIModel(
        RENIConfig(
            model_type="AutoDecoder",
            equivariance="SO2",
            latent_dim=4,
            hidden_layers=1,
            hidden_features=16,
            output_activation=None,
            fixed_decoder=True,
        )
    )
    params = model.init(jax.random.PRNGKey(6), dataset_size=1)
    images = _synthetic_envmaps(1, 16, seed=9)
    garbage = images.at[:, :40, :].set(99.0)  # corrupt masked-out region

    width = 16
    sw = sphere.get_sineweight(width)
    mask = jnp.ones_like(sw).at[:, :40, :].set(0.0)

    from reni_tpu.train.optim import build_optimizer

    opt = build_optimizer(OptimConfig(lr_start=1e-1, lr_end=1e-1, epochs=10, steps_per_epoch=1))
    d = sphere.get_directions(width)

    def run(target):
        step = tasks.make_fit_latent_step(
            model, opt, d, sw * mask, alpha=0.0, beta=0.0
        )
        state = tasks.init_train_state(model, params, opt, jax.random.PRNGKey(7))
        batch = (target, jnp.asarray([0]), jnp.asarray([1.0]))
        for _ in range(5):
            state, m = jax.jit(step)(state, batch)
        return np.asarray(state.params["latents"]["Z"])

    np.testing.assert_allclose(run(images), run(garbage), atol=1e-6)


def test_curriculum_none_evenly_spaced():
    """CURRICULUM None -> doublings evenly spaced across the epochs (the
    documented fallback the reference never implemented)."""
    cfg = tasks.TaskConfig(
        epochs=900,
        initial_resolution=(16, 32),
        final_resolution=(64, 128),
        curriculum=(),
    )
    assert cfg.effective_curriculum() == (300, 600)
    assert cfg.resolution_stages() == [
        ((16, 32), 300),
        ((32, 64), 300),
        ((64, 128), 300),
    ]
    cfg.validate()  # must not assert

    # equal initial/final: no doublings
    flat = dataclasses.replace(
        cfg, initial_resolution=(64, 128), final_resolution=(64, 128)
    )
    assert flat.effective_curriculum() == ()
    assert flat.resolution_stages() == [((64, 128), 900)]
