"""End-to-end trainer test: the full multi-task chain (FIT_DECODER ->
FIT_LATENT) through the CLI entry on a tiny synthetic LDR dataset."""

import os

import numpy as np
import pytest

from reni_tpu.cli.run import main
from reni_tpu.utils.config import get_cfg_defaults


@pytest.fixture()
def tiny_dataset(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, n in (("Train", 5), ("Test", 3)):
        d = tmp_path / "ldr" / split
        d.mkdir(parents=True)
        for i in range(n):
            arr = (rng.uniform(size=(16, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(d / f"img{i}.png"))
    return str(tmp_path / "ldr")


def _tiny_config(tmp_path, dataset_path):
    cfg = get_cfg_defaults()
    cfg.RENI.TASKS = ["FIT_DECODER", "FIT_LATENT"]
    cfg.RENI.MODEL_TYPE = "VariationalAutoDecoder"
    cfg.RENI.CONDITIONING = "Cond-by-Concat"
    cfg.RENI.LATENT_DIMENSION = 4
    cfg.RENI.HIDDEN_LAYERS = 1
    cfg.RENI.HIDDEN_FEATURES = 16
    cfg.RENI.OUTPUT_ACTIVATION = None
    for task in ("FIT_DECODER", "FIT_LATENT"):
        t = cfg.RENI[task]
        t.EPOCHS = 12
        t.BATCH_SIZE = 4
        t.MULTI_RES_TRAINING = True
        t.INITAL_RESOLUTION = [8, 16]
        t.FINAL_RESOLUTION = [16, 32]
        t.CURRICULUM = [6]
        t.LR_START = 1e-3
        t.LR_END = 1e-4
    cfg.DATASET.NAME = "RENI_LDR"
    cfg.DATASET.RENI_LDR.PATH = dataset_path
    cfg.DATASET.RENI_LDR.TRANSFORMS = [["normalize", [[0.5] * 3, [0.5] * 3]]]
    cfg.TRAINER.CHKPTS.EVERY_N_EPOCHS = 6
    cfg.TRAINER.LOGGER.EPOCHS_BETWEEN_EXAMPLES = 6
    cfg.TRAINER.LOGGER.NUMBER_OF_IMAGES = 2
    cfg.TRAINER.LOGGER.IMAGES_TO_SHOW = "random"
    cfg.TRAINER.LOGGER.TB.SAVE_DIR = str(tmp_path / "runs")
    return cfg


def test_full_multi_task_chain(tmp_path, tiny_dataset):
    cfg = _tiny_config(tmp_path, tiny_dataset)
    results, log_dir = main(cfg)

    assert set(results) == {"FIT_DECODER", "FIT_LATENT"}
    # decoder params of the two tasks are identical (frozen chain)
    p_dec = results["FIT_DECODER"][0]
    p_lat = results["FIT_LATENT"][0]
    # the latent task reloads the *best* decoder checkpoint, which may be any
    # epoch's weights — verify structure and that latents were optimised
    assert p_lat["latents"]["mu"].shape == (3, 4, 3)
    assert not np.allclose(np.asarray(p_lat["latents"]["mu"]), 0.0)

    # metrics recorded for both tasks with reference-style names
    m = results["FIT_DECODER"][1]
    assert m["fit_decoder_loss"].shape == (12,)
    assert "fit_latent_loss" in results["FIT_LATENT"][1]

    # artifacts: jsonl, checkpoints, example images
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))
    # learning-rate curve logged per task (reference run.py:86
    # LearningRateMonitor): present, decaying, inside [LR_END, LR_START]
    import json

    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    import math

    gamma = math.exp(math.log(1e-4 / 1e-3) / 12)
    for task_key in ("fit_decoder_lr", "fit_latent_lr"):
        pairs = [(r["step"], r[task_key]) for r in rows if task_key in r]
        assert pairs, f"{task_key} never logged"
        lrs = [v for _, v in pairs]
        assert all(a > b for a, b in zip(lrs, lrs[1:])), lrs
        # exactly the LR the optimizer used at that (1-based) epoch:
        # optax counts from 0, so epoch e trained at gamma^(e-1)
        for epoch, v in pairs:
            assert v == pytest.approx(1e-3 * gamma ** (epoch - 1), rel=1e-6)
    cks = os.listdir(os.path.join(log_dir, "checkpoints"))
    assert any(c.startswith("fit_decoder") for c in cks)
    assert any(c.startswith("fit_latent_final") for c in cks)
    imgs = os.listdir(os.path.join(log_dir, "images"))
    assert any(i.startswith("fit_decoder_images") for i in imgs)

    # TB.LOG_GRAPH analog: lowered StableHLO of the decoder forward
    assert os.path.exists(os.path.join(log_dir, "fit_decoder_graph.stablehlo.txt"))


def test_task_order_assertion(tmp_path, tiny_dataset):
    cfg = _tiny_config(tmp_path, tiny_dataset)
    cfg.RENI.TASKS = ["FIT_LATENT", "FIT_DECODER"]
    with pytest.raises(AssertionError):
        main(cfg)


def test_fit_inverse_via_cli(tmp_path, tiny_dataset):
    """FIT_DECODER -> FIT_INVERSE chain through the CLI, including periodic
    inverse checkpoints and scalar logging."""
    import numpy as np

    from reni_tpu.render import mesh as mesh_lib

    # write a small OBJ for the scene
    m = mesh_lib.make_uv_sphere(6, 12)
    obj = tmp_path / "sphere.obj"
    with open(obj, "w") as f:
        for v in m.verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in m.faces + 1:
            f.write(f"f {a} {b} {c}\n")

    cfg = _tiny_config(tmp_path, tiny_dataset)
    cfg.RENI.TASKS = ["FIT_DECODER", "FIT_INVERSE"]
    inv = cfg.RENI.FIT_INVERSE
    inv.EPOCHS = 8
    inv.BATCH_SIZE = 3
    inv.MULTI_RES_TRAINING = False
    inv.FINAL_RESOLUTION = [8, 16]
    inv.RENDER_RESOLUTION = 16
    inv.OBJECT_PATH = str(obj)
    inv.KD_VALUE = 0.5
    inv.LR_START = 1e-2
    inv.LR_END = 1e-3
    cfg.TRAINER.CHKPTS.EVERY_N_EPOCHS = 4

    results, log_dir = main(cfg)
    assert "FIT_INVERSE" in results
    metrics = results["FIT_INVERSE"][1]
    assert metrics["fit_inverse_loss"].shape == (8,)
    assert np.isfinite(metrics["fit_inverse_loss"]).all()
    cks = os.listdir(os.path.join(log_dir, "checkpoints"))
    assert any(c.startswith("fit_inverse_epoch=") for c in cks)
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        lines = f.read()
    assert "fit_inverse_loss" in lines

    # the evaluate CLI reports recovery quality for inverse checkpoints
    import yaml

    from reni_tpu.cli import evaluate

    cfg_yaml = str(tmp_path / "inv_eval.yaml")
    with open(cfg_yaml, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)
    report = evaluate.main(
        [
            "--checkpoint",
            os.path.join(log_dir, "checkpoints", "fit_inverse_final"),
            "--cfg_path", cfg_yaml,
            "--resolution", "8", "16",
        ]
    )
    assert -1.0 <= report["render_correlation_min"] <= 1.0
    assert report["render_correlation_mean"] >= report["render_correlation_min"]
    assert len(report["render_correlation_per_image"]) == 3
    assert report["envmap_rel_error"] >= 0.0


def test_evaluate_cli(tmp_path, tiny_dataset):
    """The evaluate CLI produces a full JSON report from a trained chain."""
    import json

    from reni_tpu.cli import evaluate

    cfg = _tiny_config(tmp_path, tiny_dataset)
    results, log_dir = main(cfg)
    ck = os.path.join(log_dir, "checkpoints", "fit_latent_final")

    cfg_yaml = str(tmp_path / "eval_cfg.yaml")
    import yaml

    with open(cfg_yaml, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)

    report = evaluate.main(
        [
            "--checkpoint", ck,
            "--cfg_path", cfg_yaml,
            "--resolution", "16", "32",
        ]
    )
    assert report["n_images"] == 3
    assert np.isfinite(report["psnr_mean"])
    assert report["self_consistency_psnr"] > 40
    json.dumps(report)  # serialisable


def test_resume_non_decoder_task_without_load_path(tmp_path, tiny_dataset):
    """--resume of a FIT_LATENT checkpoint must not require LOAD_PATH: the
    resume checkpoint carries full params (crash-recovery flow)."""
    cfg = _tiny_config(tmp_path, tiny_dataset)
    results, log_dir = main(cfg)

    cfg2 = _tiny_config(tmp_path, tiny_dataset)
    cfg2.RENI.TASKS = ["FIT_LATENT"]
    cfg2.RENI.FIT_LATENT.EPOCHS = 16  # resume from epoch 12 -> 4 more
    results2, _ = main(cfg2, resume=os.path.join(log_dir, "checkpoints"))
    m = results2["FIT_LATENT"][1]
    assert m["fit_latent_loss"].shape == (4,)
    assert np.isfinite(m["fit_latent_loss"]).all()


def test_use_pallas_knob_dispatches_kernel(tmp_path, tiny_dataset, monkeypatch):
    """TPU.USE_PALLAS must reach the model: a CLI training with the knob set
    dispatches through the fused kernel (interpret mode off-TPU)."""
    from reni_tpu.kernels import siren_pallas

    calls = {"n": 0}
    real = siren_pallas.fused_apply

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(siren_pallas, "fused_apply", spy)

    cfg = _tiny_config(tmp_path, tiny_dataset)
    cfg.RENI.TASKS = ["FIT_DECODER"]
    cfg.RENI.HIDDEN_FEATURES = 128  # kernel wants lane-aligned width
    t = cfg.RENI.FIT_DECODER
    t.EPOCHS = 2
    t.MULTI_RES_TRAINING = False
    t.FINAL_RESOLUTION = [8, 16]
    t.CURRICULUM = []
    cfg.TPU.USE_PALLAS = True
    cfg.TRAINER.LOGGER.LOG_IMAGES = False
    cfg.TRAINER.CHKPTS.SAVE = False
    results, _ = main(cfg)
    assert calls["n"] > 0, "USE_PALLAS did not dispatch the fused kernel"
    assert np.isfinite(results["FIT_DECODER"][1]["fit_decoder_loss"]).all()


def test_tpu_knobs_reach_model_config():
    from reni_tpu.models.reni import RENIConfig

    cfg = get_cfg_defaults()
    cfg.TPU.USE_PALLAS = True
    cfg.TPU.PRECISION = "float32"
    mc = RENIConfig.from_reni_cfg(cfg.RENI, "FIT_DECODER", tpu_cfg=cfg.TPU)
    assert mc.use_pallas is True and mc.pallas_trunk == "float32"
    mc = RENIConfig.from_reni_cfg(cfg.RENI, "FIT_DECODER")
    assert mc.use_pallas is False  # no TPU block: knobs off


def test_mesh_from_config():
    from reni_tpu.cli.run import _mesh_from_config

    cfg = get_cfg_defaults()
    assert _mesh_from_config(cfg.TPU) is None  # default 1x1: single-program
    cfg.TPU.MESH.DATA = 4
    cfg.TPU.MESH.PIXEL = 2
    m = _mesh_from_config(cfg.TPU)
    assert m.shape == {"data": 4, "pixel": 2, "model": 1}
    cfg.TPU.MESH.DATA = -1
    cfg.TPU.MESH.PIXEL = 1
    m = _mesh_from_config(cfg.TPU)
    # all 8 virtual devices
    assert m.shape == {"data": 8, "pixel": 1, "model": 1}
    cfg.TPU.MESH.DATA = -1
    cfg.TPU.MESH.MODEL = 2
    m = _mesh_from_config(cfg.TPU)
    assert m.shape == {"data": 4, "pixel": 1, "model": 2}


def test_film_chain_via_cli(tmp_path, tiny_dataset):
    """The reference's default conditioning (FiLM) through the full CLI chain."""
    cfg = _tiny_config(tmp_path, tiny_dataset)
    cfg.RENI.CONDITIONING = "FiLM"
    cfg.RENI.MAPPING_LAYERS = 2
    cfg.RENI.MAPPING_FEATURES = 16
    results, log_dir = main(cfg)
    m = results["FIT_DECODER"][1]
    assert np.isfinite(m["fit_decoder_loss"]).all()
    assert "FIT_LATENT" in results
    # FiLM checkpoints restore decoder-only across tasks (mapping included)
    p_lat = results["FIT_LATENT"][0]
    assert "mapping" in p_lat["decoder"]


def test_run_with_retries_recovers_from_crash(tmp_path, tiny_dataset, monkeypatch):
    """A crash between tasks: --retries resumes the chain from the newest
    checkpoint instead of dying (tunneled-TPU worker crash recovery)."""
    import reni_tpu.cli.run as R

    real_run_task = R.run_task
    crashed = {"done": False}

    def flaky_run_task(config, task, *a, **k):
        if task == "FIT_LATENT" and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("simulated TPU worker crash")
        return real_run_task(config, task, *a, **k)

    monkeypatch.setattr(R, "run_task", flaky_run_task)

    cfg = _tiny_config(tmp_path, tiny_dataset)
    results, log_dir = R.run_with_retries(cfg, retries=2)
    assert "FIT_LATENT" in results
    assert np.isfinite(results["FIT_LATENT"][1]["fit_latent_loss"]).all()
    # the retry reused the same run dir
    cks = os.listdir(os.path.join(log_dir, "checkpoints"))
    assert any(c.startswith("fit_decoder_final") for c in cks)
    assert any(c.startswith("fit_latent_final") for c in cks)


def test_auto_resume_plan(tmp_path):
    """The crash-retry policy: mid-task -> resume it; complete -> next task."""
    import time as _time

    import jax

    from reni_tpu.cli.run import _auto_resume_plan
    from reni_tpu.models.reni import RENIConfig, RENIModel
    from reni_tpu.train import checkpoint as ckpt

    cfg = get_cfg_defaults()
    cfg.RENI.TASKS = ["FIT_DECODER", "FIT_LATENT"]
    cfg.RENI.FIT_DECODER.EPOCHS = 12
    log_dir = str(tmp_path)
    ckdir = os.path.join(log_dir, "checkpoints")

    # no checkpoints: start from scratch
    tasks_list, resume, load = _auto_resume_plan(cfg, log_dir)
    assert tasks_list == ["FIT_DECODER", "FIT_LATENT"] and resume is None

    model = RENIModel(RENIConfig(latent_dim=4, hidden_layers=1, hidden_features=16))
    params = model.init(jax.random.PRNGKey(0), 2)

    # mid-task checkpoint: resume FIT_DECODER itself
    ckpt.save_checkpoint(
        os.path.join(ckdir, "fit_decoder_latest"), params,
        metadata={"task": "FIT_DECODER", "epoch": 6},
    )
    tasks_list, resume, load = _auto_resume_plan(cfg, log_dir)
    assert tasks_list == ["FIT_DECODER", "FIT_LATENT"]
    assert resume and resume.endswith("fit_decoder_latest") and load is None

    # completed task (epoch == EPOCHS): move on to FIT_LATENT from it
    _time.sleep(0.01)
    ckpt.save_checkpoint(
        os.path.join(ckdir, "fit_decoder_latest"), params,
        metadata={"task": "FIT_DECODER", "epoch": 12},
    )
    tasks_list, resume, load = _auto_resume_plan(cfg, log_dir)
    assert tasks_list == ["FIT_LATENT"]
    assert resume is None and load.endswith("fit_decoder_latest")

    # an already-TRIMMED task list (make_zoo restart path): the newest save
    # is a completed task OUTSIDE the list — the remaining chain must still
    # run, with that checkpoint as decoder source (never [] = "all done")
    trimmed = cfg.clone()
    trimmed.RENI.TASKS = ["FIT_LATENT"]
    tasks_list, resume, load = _auto_resume_plan(trimmed, log_dir)
    assert tasks_list == ["FIT_LATENT"]
    assert resume is None and load.endswith("fit_decoder_latest")

    # a PARTIAL foreign checkpoint must not be loaded as decoder source
    _time.sleep(0.01)
    ckpt.save_checkpoint(
        os.path.join(ckdir, "fit_decoder_latest"), params,
        metadata={"task": "FIT_DECODER", "epoch": 6},
    )
    tasks_list, resume, load = _auto_resume_plan(trimmed, log_dir)
    assert tasks_list == ["FIT_LATENT"] and resume is None
    assert load == trimmed.TRAINER.CHKPTS.LOAD_PATH


def test_shard_latents_cli_matches_replicated(tmp_path, tiny_dataset):
    """TPU.SHARD_LATENTS row-shards the latent tables through the CLI; the
    chain must reproduce the replicated-table run exactly."""
    from reni_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_pixel=2)
    losses = {}
    for shard in (False, True):
        cfg = _tiny_config(tmp_path, tiny_dataset)
        cfg.TRAINER.LOGGER.TB.SAVE_DIR = str(tmp_path / f"runs_sl{int(shard)}")
        cfg.TRAINER.LOGGER.LOG_IMAGES = False
        cfg.TPU.SHARD_LATENTS = shard
        results, _ = main(cfg, mesh=mesh)
        losses[shard] = {
            t: np.asarray(m[f"{t.lower()}_loss"]) for t, (_, m) in results.items()
        }
    for t in losses[False]:
        np.testing.assert_allclose(
            losses[False][t], losses[True][t], rtol=1e-5, err_msg=t
        )


def test_profile_flag_writes_trace(tmp_path, tiny_dataset):
    """--profile captures a jax.profiler trace of the chain."""
    cfg = _tiny_config(tmp_path, tiny_dataset)
    cfg.RENI.TASKS = ["FIT_DECODER"]
    cfg.RENI.FIT_DECODER.EPOCHS = 2
    cfg.RENI.FIT_DECODER.MULTI_RES_TRAINING = False
    cfg.TRAINER.LOGGER.LOG_IMAGES = False
    prof = tmp_path / "trace"
    main(cfg, profile_dir=str(prof))
    traces = list(prof.rglob("*.trace.json.gz")) + list(prof.rglob("*.xplane.pb"))
    assert traces, f"no trace artifacts under {prof}"


def test_hang_watchdog_exits_114(tmp_path):
    """RENI_TPU_HANG_EXIT_S: a wedged dispatch (simulated by a sleep with
    no progress notes) must hard-exit with the distinctive code 114 so a
    supervisor can rerun with --retries/--resume."""
    import subprocess
    import sys
    import time as _time

    code = (
        "import os, time\n"
        "from reni_tpu.cli import run\n"
        "run._arm_hang_watchdog()\n"
        "time.sleep(30)\n"  # simulated wedge: never calls _note_progress
        "raise SystemExit(0)\n"
    )
    t0 = _time.time()
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env={**os.environ, "RENI_TPU_HANG_EXIT_S": "1",
             "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"},
        timeout=120,
    )
    assert proc.returncode == 114
    assert _time.time() - t0 < 60


def test_cli_chain_with_stream_data(tmp_path, tiny_dataset):
    """TPU.STREAM_DATA: the full two-task chain through the host-resident /
    per-step-transfer trainer must reproduce the device-resident chain's
    loss trajectory exactly (same steps, same batches)."""
    cfg = _tiny_config(tmp_path, tiny_dataset)
    cfg.TRAINER.LOGGER.TB.SAVE_DIR = str(tmp_path / "runs_resident")
    results_res, _ = main(cfg)

    cfg2 = _tiny_config(tmp_path, tiny_dataset)
    cfg2.TPU.STREAM_DATA = True
    cfg2.TRAINER.LOGGER.TB.SAVE_DIR = str(tmp_path / "runs_stream")
    results_str, log_dir = main(cfg2)

    # ... and through STREAM_FROM_DISK (out-of-core: lazy decode +
    # prefetch) with chunked dispatches (STREAM_CHUNK)
    cfg3 = _tiny_config(tmp_path, tiny_dataset)
    cfg3.TPU.STREAM_FROM_DISK = True
    cfg3.TPU.STREAM_CHUNK = 2
    cfg3.TRAINER.LOGGER.TB.SAVE_DIR = str(tmp_path / "runs_disk")
    results_disk, _ = main(cfg3)

    for task in ("FIT_DECODER", "FIT_LATENT"):
        m_res = results_res[task][1][f"{task.lower()}_loss"]
        for other in (results_str, results_disk):
            np.testing.assert_allclose(
                np.asarray(m_res),
                np.asarray(other[task][1][f"{task.lower()}_loss"]),
                atol=1e-4, rtol=1e-4,
            )
    # artifacts exist as usual
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "fit_latent_final.npz"))


def test_retry_event_logged_in_metrics_jsonl(tmp_path, tiny_dataset, monkeypatch):
    """Fault history lands in the run's own metrics.jsonl: a crash retry
    appends a {"event": "retry"} record (VERDICT r4 #7 — chains report
    what they survived)."""
    import json as _json

    import reni_tpu.cli.run as R

    real_run_task = R.run_task
    crashed = {"done": False}

    def flaky_run_task(config, task, *a, **k):
        if task == "FIT_LATENT" and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("simulated TPU worker crash")
        return real_run_task(config, task, *a, **k)

    monkeypatch.setattr(R, "run_task", flaky_run_task)
    cfg = _tiny_config(tmp_path, tiny_dataset)
    results, log_dir = R.run_with_retries(cfg, retries=2)
    events = [
        _json.loads(l)
        for l in open(os.path.join(log_dir, "metrics.jsonl"))
        if '"event"' in l
    ]
    retries = [e for e in events if e["event"] == "retry"]
    assert retries and retries[0]["attempt"] == 1
    assert retries[0]["tasks"] == ["FIT_LATENT"]


def test_wall_clock_checkpoint_cadence(tmp_path, tiny_dataset, monkeypatch):
    """RENI_TPU_CKPT_WALL_S: with a tiny wall target, every segment's
    callback saves (epoch-off-schedule included) and segments shrink —
    a wedge can then lose only ~target seconds of work. Also pins the
    stage-end force-save (curriculum jump at epoch 6 with EVERY_N=5:
    6 % 5 != 0 yet a checkpoint at epoch 6 must exist)."""
    import json as _json

    import reni_tpu.cli.run as R

    monkeypatch.setenv("RENI_TPU_CKPT_WALL_S", "0.0001")
    cfg = _tiny_config(tmp_path, tiny_dataset)
    cfg.RENI.TASKS = ["FIT_DECODER"]
    cfg.TRAINER.CHKPTS.EVERY_N_EPOCHS = 5  # curriculum jump (6) is off-grid
    results, log_dir = R.main(cfg)
    cks = sorted(os.listdir(os.path.join(log_dir, "checkpoints")))
    # stage end (epoch 6) saved although 6 % 5 != 0
    assert any("fit_decoder_epoch=0006" in c for c in cks), cks
    # wall cadence shrank the segments: callbacks (scalar records) fire
    # every epoch instead of every 5 — a wedge loses ~wall seconds, not
    # EVERY_N_EPOCHS of arbitrarily slow epochs
    epochs = {
        r["step"]
        for r in map(_json.loads, open(os.path.join(log_dir, "metrics.jsonl")))
        if "fit_decoder_loss" in r
    }
    assert len(epochs) >= 10, sorted(epochs)  # every-5 alone gives 3


def test_rss_exit_checkpoints_and_exits_114(tmp_path, tiny_dataset):
    """RENI_TPU_RSS_EXIT_GB: when the process RSS exceeds the bound (the
    tunnel transport client retains every transfer's host bytes — r5
    measurement), the trainer checkpoints at the next segment boundary
    and exits 114 so the relaunch loop resumes with a fresh process."""
    import json as _json
    import subprocess
    import sys

    import yaml as _yaml

    cfg = _tiny_config(tmp_path, tiny_dataset)
    cfg.RENI.TASKS = ["FIT_DECODER"]
    cfg_path = str(tmp_path / "rss.yaml")
    with open(cfg_path, "w") as f:
        _yaml.safe_dump(cfg.to_dict(), f)
    proc = subprocess.run(
        [sys.executable, "-m", "reni_tpu.cli.run", "--cfg_path", cfg_path],
        env={**os.environ, "RENI_TPU_RSS_EXIT_GB": "0.001",
             "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"},
        timeout=300, capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 114, proc.stdout[-500:] + proc.stderr[-500:]
    assert "RENI_TPU_RSS_EXIT_GB" in proc.stdout
    run_dirs = sorted((tmp_path / "runs").rglob("metrics.jsonl"))
    assert run_dirs, list((tmp_path / "runs").rglob("*"))
    events = [
        _json.loads(l) for l in open(run_dirs[0]) if '"event"' in l
    ]
    assert any(e["event"] == "rss_exit" for e in events)
    # a checkpoint exists to resume from
    cks = list(run_dirs[0].parent.glob("checkpoints/*latest*"))
    assert cks
