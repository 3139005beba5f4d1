"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY §4 oracle g):
data-parallel training must be numerically equivalent to single-device."""

import numpy as np
import jax
import jax.numpy as jnp

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.parallel import mesh as pmesh
from reni_tpu.train import tasks
from reni_tpu.train.optim import OptimConfig


def _model():
    return RENIModel(
        RENIConfig(
            model_type="VariationalAutoDecoder",
            equivariance="SO2",
            latent_dim=4,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
        )
    )


def _synthetic(n, width, seed=0):
    d = np.asarray(sphere.get_directions(width))[0]
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack(
            [np.tanh(d @ rng.normal(size=(3, 3))) for _ in range(n)]
        ).astype(np.float32)
    )


def test_make_mesh_shapes():
    m = pmesh.make_mesh()
    assert m.shape == {"data": 8, "pixel": 1}
    m = pmesh.make_mesh(n_pixel=2)
    assert m.shape == {"data": 4, "pixel": 2}
    m = pmesh.make_mesh(n_data=2, n_pixel=4)
    assert m.shape == {"data": 2, "pixel": 4}


def test_pad_batch_to():
    assert pmesh.pad_batch_to(3, 4) == 4
    assert pmesh.pad_batch_to(8, 4) == 8
    assert pmesh.pad_batch_to(9, 8) == 16


def test_dp_training_matches_single_device():
    """Same seeds, same data: an 8-way data/pixel-sharded fit must produce
    the same parameters as the unsharded fit (GSPMD DP == DDP semantics)."""
    images = _synthetic(6, 16, seed=1)
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-4, lr_end=1e-5),
        batch_size=8,  # divisible by the data axis; 6 images -> masked rows
        epochs=5,
        multi_res_training=False,
        final_resolution=(8, 16),
        kld_weighting=1e-4,
    )

    model = _model()
    params0 = model.init(jax.random.PRNGKey(0), dataset_size=6)

    p_single, m_single = tasks.fit_task(
        model, params0, cfg, lambda res: images, jax.random.PRNGKey(1)
    )
    m = pmesh.make_mesh(n_data=4, n_pixel=2)
    p_shard, m_shard = tasks.fit_task(
        model, params0, cfg, lambda res: images, jax.random.PRNGKey(1), mesh=m
    )

    np.testing.assert_allclose(
        m_single["fit_decoder_loss"], m_shard["fit_decoder_loss"], rtol=2e-4
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        p_single,
        p_shard,
    )


def test_sharded_latent_rows_update_disjointly():
    """With DP over the batch, each device carries distinct dataset rows;
    after one epoch every latent row must have moved (replicated-table
    masked-update correctness, SURVEY §2c)."""
    images = _synthetic(8, 16, seed=2)
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-2, lr_end=1e-2),
        batch_size=8,
        epochs=1,
        multi_res_training=False,
        final_resolution=(8, 16),
    )
    model = _model()
    params0 = model.init(jax.random.PRNGKey(2), dataset_size=8)
    mu0 = np.asarray(params0["latents"]["mu"])
    m = pmesh.make_mesh()  # 8-way data parallel: one image per device
    p, _ = tasks.fit_task(
        model, params0, cfg, lambda res: images, jax.random.PRNGKey(3), mesh=m
    )
    moved = np.abs(np.asarray(p["latents"]["mu"]) - mu0).reshape(8, -1).max(axis=1)
    assert (moved > 0).all()
