"""Model-level tests: decomposed vs concat parity, equivariance of the full
decoder, init distributions, latent sampling, trainable masks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIConfig, RENIModel, replace_latents


def _model(equiv="SO2", conditioning="Cond-by-Concat", model_type="VariationalAutoDecoder",
           fixed=False, N=5, act="tanh"):
    cfg = RENIConfig(
        model_type=model_type,
        conditioning=conditioning,
        equivariance=equiv,
        latent_dim=N,
        hidden_layers=2,
        hidden_features=32,
        mapping_layers=2,
        mapping_features=32,
        output_activation=act,
        fixed_decoder=fixed,
    )
    return RENIModel(cfg)


def _zd(N, B=2, P=24, seed=0):
    rng = np.random.default_rng(seed)
    Z = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    D_np = rng.normal(size=(B, P, 3))
    D_np /= np.linalg.norm(D_np, axis=-1, keepdims=True)
    return Z, jnp.asarray(D_np.astype(np.float32))


@pytest.mark.parametrize("equiv", ["SO3", "SO2", "None"])
@pytest.mark.parametrize("conditioning", ["Cond-by-Concat", "FiLM"])
def test_decomposed_matches_concat(equiv, conditioning):
    """The decomposed first layer must be numerically equal to materialising
    the concatenated invariant encoding (the reference's computation)."""
    model = _model(equiv=equiv, conditioning=conditioning)
    params = model.init(jax.random.PRNGKey(0), dataset_size=4)
    Z, D = _zd(model.config.latent_dim)
    fast = np.asarray(model.apply(params, Z, D))
    ref = np.asarray(model.apply_concat(params, Z, D))
    np.testing.assert_allclose(fast, ref, atol=2e-5)


def test_so2_decoder_equivariance():
    """decode(Z @ R_y, D) == decode(Z, D @ R_y^{-1}) — rotating the latents
    rotates the decoded environment map (the paper's central property)."""
    model = _model(equiv="SO2")
    params = model.init(jax.random.PRNGKey(1), dataset_size=4)
    Z, D = _zd(model.config.latent_dim, seed=2)
    R = jnp.asarray(sphere.rotation_y(0.9).astype(np.float32))
    out_rotated_z = model.apply(params, Z @ R, D)
    out_rotated_d = model.apply(params, Z, D @ R.T)
    np.testing.assert_allclose(
        np.asarray(out_rotated_z), np.asarray(out_rotated_d), atol=1e-5
    )


def test_so3_decoder_equivariance():
    model = _model(equiv="SO3")
    params = model.init(jax.random.PRNGKey(2), dataset_size=4)
    Z, D = _zd(model.config.latent_dim, seed=3)
    rng = np.random.default_rng(4)
    R = jnp.asarray(sphere.random_rotation(rng).astype(np.float32))
    out_rotated_z = model.apply(params, Z @ R, D)
    out_rotated_d = model.apply(params, Z, D @ R.T)
    np.testing.assert_allclose(
        np.asarray(out_rotated_z), np.asarray(out_rotated_d), atol=1e-5
    )


def test_siren_init_distributions():
    """First layer ~ U(-1/in, 1/in); hidden ~ U(+-sqrt(6/in)/omega)."""
    model = _model(equiv="SO2", N=9)
    params = model.init(jax.random.PRNGKey(3), dataset_size=2)
    in_features = 2 * 9 + 81 + 2
    w0 = np.asarray(params["decoder"]["layers"][0]["w"])
    assert w0.shape[0] == in_features
    assert np.abs(w0).max() <= 1.0 / in_features + 1e-7
    w1 = np.asarray(params["decoder"]["layers"][1]["w"])
    bound = np.sqrt(6.0 / 32) / 30.0
    assert np.abs(w1).max() <= bound + 1e-7
    assert np.abs(w1).max() > bound * 0.9  # actually fills the range


def test_vad_latent_init_and_sampling():
    model = _model()
    params = model.init(jax.random.PRNGKey(4), dataset_size=100)
    lv = np.asarray(params["latents"]["log_var"])
    assert abs(lv.mean() + 5.0) < 0.5  # log_var ~ N(-5, 1)
    mu = np.asarray(params["latents"]["mu"])
    assert abs(mu.mean()) < 0.2 and abs(mu.std() - 1.0) < 0.2

    idx = jnp.asarray([0, 3, 7])
    Z, mu_rows, lv_rows = model.sample_latent(params, idx, jax.random.PRNGKey(5))
    assert Z.shape == (3, 5, 3)
    np.testing.assert_array_equal(np.asarray(mu_rows), mu[[0, 3, 7]])
    assert not np.allclose(np.asarray(Z), np.asarray(mu_rows))


def test_fixed_decoder_latents_zero_and_mask():
    model = _model(fixed=True)
    params = model.init(jax.random.PRNGKey(6), dataset_size=7)
    assert np.asarray(params["latents"]["mu"]).max() == 0.0
    mask = model.trainable_mask(params)
    assert mask["latents"]["mu"] is True
    assert mask["latents"]["log_var"] is False
    flat = jax.tree.leaves(mask["decoder"])
    assert not any(flat)


def test_apply_idx_fixed_uses_mu():
    model = _model(fixed=True)
    params = model.init(jax.random.PRNGKey(7), dataset_size=4)
    _, D = _zd(model.config.latent_dim, B=2, seed=8)
    out1 = model.apply_idx(params, jnp.asarray([0, 1]), D)
    out2 = model.apply(params, params["latents"]["mu"][jnp.asarray([0, 1])], D)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_replace_latents_keeps_decoder():
    model = _model()
    params = model.init(jax.random.PRNGKey(8), dataset_size=4)
    fixed_model = _model(fixed=True)
    new = replace_latents(fixed_model, params, jax.random.PRNGKey(9), dataset_size=11)
    assert new["latents"]["mu"].shape[0] == 11
    np.testing.assert_array_equal(
        np.asarray(new["decoder"]["layers"][0]["w"]),
        np.asarray(params["decoder"]["layers"][0]["w"]),
    )


def test_output_activations():
    for act, check in (("exp", lambda o: (o > 0).all()), ("tanh", lambda o: (np.abs(o) <= 1).all())):
        model = _model(act=act)
        params = model.init(jax.random.PRNGKey(10), dataset_size=2)
        Z, D = _zd(model.config.latent_dim, seed=11)
        out = np.asarray(model.apply(params, Z, D))
        assert check(out)


def test_broadcast_directions():
    model = _model()
    params = model.init(jax.random.PRNGKey(11), dataset_size=2)
    Z, D = _zd(model.config.latent_dim, B=3, P=10, seed=12)
    out_b = model.apply(params, Z, D[:1])
    assert out_b.shape == (3, 10, 3)


def test_apply_idx_polymorphic_int_and_list():
    """The reference dispatches forward on int / list / tensor idx
    (RENI.py:205-233); our apply_idx accepts all three."""
    model = _model(fixed=True)
    params = model.init(jax.random.PRNGKey(20), dataset_size=4)
    _, D = _zd(model.config.latent_dim, B=1, seed=21)
    out_int = model.apply_idx(params, 2, D)
    out_list = model.apply_idx(params, [2], D)
    out_arr = model.apply_idx(params, jnp.asarray([2]), D)
    assert out_int.shape == (1, 24, 3)
    np.testing.assert_array_equal(np.asarray(out_int), np.asarray(out_list))
    np.testing.assert_array_equal(np.asarray(out_int), np.asarray(out_arr))


def test_fast_sine_accuracy():
    """Polynomial sine/cosine: documented error bound over the SIREN
    pre-activation range (|x| < ~1e3)."""
    import numpy as np
    import jax.numpy as jnp

    from reni_tpu.core.fastmath import fast_cos, fast_sin

    rng = np.random.default_rng(0)
    x = (rng.normal(size=200_000) * 200).astype(np.float32)
    s_err = np.abs(np.asarray(fast_sin(jnp.asarray(x))) - np.sin(np.float64(x)))
    c_err = np.abs(np.asarray(fast_cos(jnp.asarray(x))) - np.cos(np.float64(x)))
    assert s_err.max() < 5e-6, s_err.max()
    assert c_err.max() < 6e-6, c_err.max()

    # the joint evaluator (shared range reduction, used by the kernel
    # backwards) must agree bitwise with the separate functions
    from reni_tpu.core.fastmath import fast_sincos

    s2, c2 = fast_sincos(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(fast_sin(jnp.asarray(x))))
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(fast_cos(jnp.asarray(x))))


def test_fast_sine_model_close_and_differentiable():
    """fast_sine=True decodes within a few 1e-5 of the exact path and its
    gradients are finite and close (both concat and FiLM conditioning)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from reni_tpu.models.reni import RENIConfig, RENIModel

    for conditioning in ("Cond-by-Concat", "FiLM"):
        cfg = RENIConfig(
            conditioning=conditioning,
            equivariance="SO2",
            latent_dim=6,
            hidden_layers=2,
            hidden_features=32,
            mapping_layers=2,
            mapping_features=32,
            output_activation="tanh",
        )
        exact = RENIModel(cfg)
        fast = RENIModel(dataclasses.replace(cfg, fast_sine=True))
        params = exact.init(jax.random.PRNGKey(0), dataset_size=2)
        rng = np.random.default_rng(1)
        Z = jnp.asarray(rng.normal(size=(2, 6, 3)).astype(np.float32))
        D = jnp.asarray(rng.normal(size=(2, 40, 3)).astype(np.float32))
        a = np.asarray(exact.apply(params, Z, D))
        b = np.asarray(fast.apply(params, Z, D))
        np.testing.assert_allclose(b, a, atol=1e-4)

        g_exact = jax.grad(lambda z: jnp.sum(exact.apply(params, z, D) ** 2))(Z)
        g_fast = jax.grad(lambda z: jnp.sum(fast.apply(params, z, D) ** 2))(Z)
        assert np.isfinite(np.asarray(g_fast)).all()
        np.testing.assert_allclose(
            np.asarray(g_fast), np.asarray(g_exact), atol=2e-3, rtol=2e-2
        )


def test_first_layer_init_scale():
    """FIRST_LAYER_INIT_SCALE multiplies only the first-layer weight bound
    (reference default 1/in preserved at 1.0)."""
    import dataclasses

    import numpy as np
    import jax

    from reni_tpu.models.reni import RENIConfig, RENIModel
    from reni_tpu.utils.config import get_cfg_defaults

    cfg = RENIConfig(latent_dim=8, hidden_layers=1, hidden_features=32)
    base = RENIModel(cfg).init(jax.random.PRNGKey(0), 2)
    wide = RENIModel(dataclasses.replace(cfg, first_layer_init_scale=2.0)).init(
        jax.random.PRNGKey(0), 2
    )
    w0b = np.abs(np.asarray(base["decoder"]["layers"][0]["w"]))
    w0w = np.abs(np.asarray(wide["decoder"]["layers"][0]["w"]))
    np.testing.assert_allclose(w0w, 2.0 * w0b, rtol=1e-6)  # same key: exact 2x
    # hidden layers untouched
    np.testing.assert_array_equal(
        np.asarray(base["decoder"]["layers"][1]["w"]),
        np.asarray(wide["decoder"]["layers"][1]["w"]),
    )

    # wired from the config tree
    tree = get_cfg_defaults()
    tree.RENI.FIRST_LAYER_INIT_SCALE = 3.0
    mc = RENIConfig.from_reni_cfg(tree.RENI, "FIT_DECODER")
    assert mc.first_layer_init_scale == 3.0
