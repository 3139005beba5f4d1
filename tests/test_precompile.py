"""Background stage precompilation (train/precompile.py).

Pins the three facts the feature rests on: (1) program_lengths predicts
exactly the static scan lengths the training loop dispatches, (2) an
AOT-precompiled stage program is a CACHE HIT for the real run_stage call
(zero XLA compiles observed on the stage program), (3) fit_task with
precompile=True trains bit-identically to precompile=False."""

import logging

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.train import precompile as pc
from reni_tpu.train import tasks
from reni_tpu.train.optim import OptimConfig, build_optimizer


def _tiny_model(dataset_size=3, latent_dim=5):
    model = RENIModel(
        RENIConfig(
            model_type="AutoDecoder",
            equivariance="SO2",
            latent_dim=latent_dim,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
        )
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=dataset_size)
    return model, params


def _envmaps(n, width, seed=0):
    d = np.asarray(sphere.get_directions(width))[0]
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack(
            [
                np.tanh(d @ rng.normal(size=(3, 3)))
                for _ in range(n)
            ]
        ).astype(np.float32)
    )


def _dispatched_lengths(n_epochs, S, B, callback_every, cap, monkeypatch):
    """Replay fit_task's callback segmentation over run_stage with a spy
    runner, recording the static lengths actually dispatched."""
    monkeypatch.setenv("RENI_TPU_MAX_SCAN_STEPS", str(cap))
    recorded = []

    def fake_runner(step_fn):
        def run(state, images, idx_b, bmask_b, length):
            recorded.append(length)
            return state, {"loss": jnp.zeros(length)}

        return run

    monkeypatch.setattr(tasks, "_scan_runner", fake_runner)
    state = {"x": jnp.zeros(())}
    images = jnp.zeros((S, 4, 3), jnp.float32)
    done = 0
    while done < n_epochs:
        seg = min(callback_every, n_epochs - done) if callback_every else n_epochs
        tasks.run_stage(None, state, images, seg, B)
        done += seg
    return recorded


@pytest.mark.parametrize(
    "n_epochs,S,B,callback_every,cap",
    [
        (20, 3, 2, None, 4096),  # one program
        (20, 3, 2, 7, 4096),  # callback remainder: 7,7,6
        (50, 7, 2, None, 10),  # cap chunking: nb=4 -> epp=2
        (50, 7, 2, 12, 10),  # both chunkings interact
        (5, 4, 4, 2, 1),  # cap below one epoch -> epp=1
    ],
)
def test_program_lengths_match_dispatches(
    n_epochs, S, B, callback_every, cap, monkeypatch
):
    recorded = _dispatched_lengths(n_epochs, S, B, callback_every, cap, monkeypatch)
    assert sum(recorded) == n_epochs
    nb = -(-S // B)
    assert sorted(set(recorded)) == pc.program_lengths(
        n_epochs, nb, callback_every
    )


def test_precompiled_stage_is_a_cache_hit():
    """After launch_stage_precompiles drains, the real run_stage call must
    not trigger any XLA compilation of the stage program."""
    S, B, res = 3, 2, (8, 16)
    model, params = _tiny_model(dataset_size=S)
    optimizer = build_optimizer(
        OptimConfig(lr_start=1e-3, lr_end=1e-4, epochs=4, steps_per_epoch=2)
    )
    state = tasks.init_train_state(model, params, optimizer, jax.random.PRNGKey(1))
    directions = sphere.get_directions(res[1])
    sineweight = sphere.get_sineweight(res[1])
    step_fn = tasks.make_fit_decoder_step(
        model, optimizer, directions, sineweight, kld_weighting=None
    )

    pool = pc.Precompiler(workers=1)
    n = pc.launch_stage_precompiles(
        pool,
        state=state,
        dataset_size=S,
        img_dtype=np.float32,
        stages=[(res, 4)],
        step_fn_of=lambda r: step_fn,
        batch_size=B,
        callback_every=None,
    )
    assert n == 1
    assert pool.drain(timeout=300), "background compile did not finish"
    assert pool.failures == 0

    # the committed staging the CLI performs (run_stage re-commits anyway —
    # the signature must be deterministic either way)
    images = jax.device_put(
        np.asarray(_envmaps(S, res[1])), jax.local_devices()[0]
    )

    logger = logging.getLogger("jax._src.dispatch")
    records: list[str] = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = _Capture(level=logging.DEBUG)
    old_level = logger.level
    logger.addHandler(handler)
    logger.setLevel(logging.DEBUG)
    try:
        state2, metrics = tasks.run_stage(step_fn, state, images, 4, B)
        jax.block_until_ready(metrics)
    finally:
        logger.removeHandler(handler)
        logger.setLevel(old_level)

    stage_compiles = [
        m for m in records if "Finished XLA compilation" in m and "jit(run)" in m
    ]
    assert not stage_compiles, stage_compiles
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_fit_task_precompile_equivalence():
    """precompile=True must train bit-identically to precompile=False
    across a multi-stage curriculum (same programs, same trajectory)."""
    S = 3
    model, params = _tiny_model(dataset_size=S)
    imgs = {(8, 16): _envmaps(S, 16), (16, 32): _envmaps(S, 32)}
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-4, lr_end=1e-5),
        batch_size=2,
        epochs=8,
        multi_res_training=True,
        initial_resolution=(8, 16),
        final_resolution=(16, 32),
        curriculum=(4,),
    )
    out = {}
    for flag in (False, True):
        p, metrics = tasks.fit_task(
            model,
            params,
            cfg,
            lambda res: imgs[tuple(res)],
            jax.random.PRNGKey(3),
            precompile=flag,
        )
        out[flag] = (p, metrics["fit_decoder_loss"])
    np.testing.assert_array_equal(
        np.asarray(out[False][1]), np.asarray(out[True][1])
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        out[False][0],
        out[True][0],
    )


def test_precompiler_failure_is_contained():
    pool = pc.Precompiler(workers=1)

    def boom():
        raise RuntimeError("synthetic compile failure")

    pool.submit("boom", boom)
    assert pool.drain(timeout=30)
    assert pool.failures == 1
    # the pool stays usable
    ran = []
    pool.submit("ok", lambda: ran.append(1))
    assert pool.drain(timeout=30)
    assert ran == [1]
