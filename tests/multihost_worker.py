"""One process of a small jax.distributed CPU cluster — the worker side of
tests/test_multihost.py.

Runs a data-sharded FIT_DECODER stage over the *global* mesh (devices from
every process; cross-process gradient psums ride the distributed runtime's
collectives — the actually-exercised analog of the reference's DDP/NCCL,
run.py:94-97). Process 0 writes the final params + per-epoch losses for the
test to compare against a single-process fit.

Usage: python multihost_worker.py <proc_id> <n_proc> <port> <out.npz>
(with JAX_PLATFORMS=cpu and xla_force_host_platform_device_count set).
"""

import sys


def synthetic_images(n, width, seed):
    # keep in lockstep with tests/test_multihost.py::_synthetic
    import numpy as np

    from reni_tpu.core import sphere

    d = np.asarray(sphere.get_directions(width))[0]
    rng = np.random.default_rng(seed)
    return np.stack(
        [np.tanh(d @ rng.normal(size=(3, 3))) for _ in range(n)]
    ).astype(np.float32)


def main():
    proc, nproc, port, out_path = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=proc,
    )
    import numpy as np
    import jax.numpy as jnp

    from reni_tpu.models.reni import RENIConfig, RENIModel
    from reni_tpu.parallel import mesh as pmesh, multihost
    from reni_tpu.core import sphere
    from reni_tpu.train import tasks
    from reni_tpu.train.optim import OptimConfig, build_optimizer

    assert jax.process_count() == nproc, jax.process_count()
    assert multihost.initialize() is True  # already-distributed: reports True
    mesh = multihost.global_mesh()

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

    from reni_tpu.train.checkpoint import fetch_tree as _fetch

    results = {}
    for shard_latents in (False, True):
        # shard_latents=True row-shards the latent tables ACROSS processes:
        # exercises put_sharded's global-array reshard, the jit'd pad/unpad
        # (6 rows on a 4-wide data axis), and checkpoint._fetch's allgather
        state = tasks.init_train_state(model, params0, opt, jax.random.PRNGKey(1))
        runner = pmesh.sharded_stage_runner(mesh, shard_latents=shard_latents)
        state, metrics = runner(step, state, images, 3, 8)
        results[shard_latents] = (
            np.asarray(metrics["loss"]),
            jax.tree_util.tree_flatten(_fetch(state.params))[0],
        )

    # multi-process STREAM_DATA: the host dataset (same on every process,
    # DDP semantics) streams per-step / per-super-slice; every process
    # contributes only its addressable shard of each transfer. chunk=2
    # exercises the shard_map'd collective-free chunk gather across
    # process boundaries (batch 2 pads to 4 on the 4-wide data axis, so
    # nb=2 and K=2: one super-slice per epoch).
    imgs_host = synthetic_images(6, 16, seed=31)
    stream_losses = {}
    for chunk in (1, 2):
        state = tasks.init_train_state(model, params0, opt, jax.random.PRNGKey(1))
        runner = tasks.streaming_stage_runner(mesh, chunk=chunk)
        state, metrics = runner(step, state, imgs_host, 3, 2)
        stream_losses[chunk] = (
            np.asarray(metrics["loss"]),
            jax.tree_util.tree_flatten(_fetch(state.params))[0],
        )

    # out-of-core streaming across processes (RENI_TEST_LDR_DIR): each host
    # must DECODE only its own addressable rows of every batch (put_rows +
    # locality-filtered prefetch) — the pod data-loader economy
    import os

    disk = None
    ldr_dir = os.environ.get("RENI_TEST_LDR_DIR")
    if ldr_dir:
        from reni_tpu.data.datasets import EnvironmentMapDataset

        ds = EnvironmentMapDataset(
            ldr_dir, False, [["normalize", [[0.5] * 3, [0.5] * 3]]], lazy=True
        )
        src = ds.row_source_at((8, 16))
        state = tasks.init_train_state(model, params0, opt, jax.random.PRNGKey(1))
        runner = tasks.streaming_stage_runner(mesh)
        state, metrics = runner(step, state, src, 2, 2)
        disk = (
            np.asarray(metrics["loss"]),
            jax.tree_util.tree_flatten(_fetch(state.params))[0],
        )
        with open(f"{out_path}.decodes.{proc}", "w") as f:
            f.write(str(src.decodes))

    if multihost.is_primary():
        loss, leaves = results[False]
        loss_sl, leaves_sl = results[True]
        extra = {}
        if disk is not None:
            extra["loss_disk"] = disk[0]
            extra.update(
                {f"dleaf{i}": np.asarray(l) for i, l in enumerate(disk[1])}
            )
        np.savez(
            out_path,
            loss=loss,
            loss_shard_latents=loss_sl,
            loss_stream1=stream_losses[1][0],
            loss_stream2=stream_losses[2][0],
            n_global_devices=jax.device_count(),
            **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)},
            **{f"sleaf{i}": np.asarray(l) for i, l in enumerate(leaves_sl)},
            **{f"st1leaf{i}": np.asarray(l)
               for i, l in enumerate(stream_losses[1][1])},
            **{f"st2leaf{i}": np.asarray(l)
               for i, l in enumerate(stream_losses[2][1])},
            **extra,
        )


if __name__ == "__main__":
    main()
