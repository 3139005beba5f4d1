"""Real multi-process distributed training (SURVEY §2c, the DDP analog).

Spawns a 2-process jax.distributed CPU cluster (2 local devices each -> a
4-device global mesh) and runs a data-sharded FIT_DECODER stage through the
same `sharded_stage_runner` the CLI uses; cross-process gradient psums go
through the distributed runtime's collectives. The result must match a
single-process fit on an identical 4-device mesh."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

import pytest

from tests.multihost_worker import synthetic_images


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "proc0.npz")
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), out],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    got = np.load(out)
    assert int(got["n_global_devices"]) == 4

    # identical fit on a single-process 4-device mesh (same seeds/data)
    from reni_tpu.models.reni import RENIConfig, RENIModel
    from reni_tpu.parallel import mesh as pmesh
    from reni_tpu.core import sphere
    from reni_tpu.train import tasks
    from reni_tpu.train.optim import OptimConfig, build_optimizer

    model = RENIModel(
        RENIConfig(
            model_type="VariationalAutoDecoder",
            equivariance="SO2",
            latent_dim=4,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
        )
    )
    params0 = model.init(jax.random.PRNGKey(0), dataset_size=6)
    opt = build_optimizer(
        OptimConfig(lr_start=1e-3, lr_end=1e-3, epochs=3, steps_per_epoch=1)
    )
    step = tasks.make_fit_decoder_step(
        model,
        opt,
        sphere.get_directions(16),
        sphere.get_sineweight(16),
        kld_weighting=1e-4,
    )
    images = jnp.asarray(synthetic_images(6, 16, seed=31))
    state = tasks.init_train_state(model, params0, opt, jax.random.PRNGKey(1))
    mesh = pmesh.make_mesh(n_data=4, n_pixel=1, devices=jax.devices()[:4])
    state, metrics = pmesh.sharded_stage_runner(mesh)(step, state, images, 3, 8)

    np.testing.assert_allclose(
        got["loss"], np.asarray(metrics["loss"]), rtol=2e-5
    )
    leaves, _ = jax.tree_util.tree_flatten(jax.device_get(state.params))
    for i, ref in enumerate(leaves):
        np.testing.assert_allclose(
            got[f"leaf{i}"], np.asarray(ref), atol=3e-5,
            err_msg=f"leaf {i} diverged between 2-process and single-process",
        )
