"""Chip arbitration (utils/chiplock.py): the advisory lock that serializes
chip jobs on the shared tunneled worker, and the stop-file preemption that
lets bench.py measure an idle chip while a long queue run yields, then
resumes. Includes the process-relaunch auto-resume (`_find_resumable_run`)
the yield/hang exit codes rely on."""

import json
import os
import threading
import time

import numpy as np
import pytest

from reni_tpu.utils import chiplock


def test_hold_acquires_and_contends(tmp_path):
    lock = str(tmp_path / "chip.lock")
    with chiplock.hold_chip_lock(lock, wait_s=5.0, what="a") as got_a:
        assert got_a
        # a second holder (fresh fd, same process — flock treats open file
        # descriptions independently) must fail open after its wait budget
        t0 = time.monotonic()
        with chiplock.hold_chip_lock(lock, wait_s=0.1, what="b") as got_b:
            assert not got_b  # advisory: proceeded WITHOUT the lock
        assert time.monotonic() - t0 < 5.0
    # released: a third attempt acquires immediately
    with chiplock.hold_chip_lock(lock, wait_s=0.1, what="c") as got_c:
        assert got_c


def test_hold_none_is_noop():
    with chiplock.hold_chip_lock(None, what="off") as got:
        assert got is False


def test_preempt_acquires_free_lock_and_clears_stale_stop(tmp_path, monkeypatch):
    lock = str(tmp_path / "chip.lock")
    stop = str(tmp_path / "stop")
    monkeypatch.setenv("RENI_TPU_CHIP_LOCK", lock)
    monkeypatch.setenv("RENI_TPU_STOP_FILE", stop)
    open(stop, "w").close()  # stale request from a crashed preemptor
    with chiplock.preempt_and_hold(wait_s=2.0, what="bench") as exclusive:
        assert exclusive
        assert not os.path.exists(stop)  # consumed on acquisition


def test_preempt_disabled_by_empty_env(monkeypatch):
    monkeypatch.setenv("RENI_TPU_CHIP_LOCK", "")
    with chiplock.preempt_and_hold(wait_s=0.1, what="bench") as exclusive:
        assert exclusive  # explicitly opted out: treated as uncontended


def test_preempt_honors_disabled_stop_file(tmp_path, monkeypatch):
    """RENI_TPU_STOP_FILE="" disables the preemption half symmetrically:
    the preemptor must wait WITHOUT dropping a stop file anywhere."""
    lock = str(tmp_path / "chip.lock")
    monkeypatch.setenv("RENI_TPU_CHIP_LOCK", lock)
    monkeypatch.setenv("RENI_TPU_STOP_FILE", "")
    default_preexists = os.path.exists(chiplock.DEFAULT_STOP)
    with chiplock.hold_chip_lock(lock, wait_s=5.0, what="holder") as got:
        assert got
        with chiplock.preempt_and_hold(wait_s=0.5, what="bench") as exclusive:
            assert not exclusive  # timed out, contended
        assert os.path.exists(chiplock.DEFAULT_STOP) == default_preexists


def test_preempt_requests_yield_then_takes_lock(tmp_path, monkeypatch):
    """The full handshake: a holder sees the stop file appear, releases,
    and the preemptor takes over and consumes the request."""
    lock = str(tmp_path / "chip.lock")
    stop = str(tmp_path / "stop")
    monkeypatch.setenv("RENI_TPU_CHIP_LOCK", lock)
    monkeypatch.setenv("RENI_TPU_STOP_FILE", stop)

    outcome = {}

    def preemptor():
        with chiplock.preempt_and_hold(wait_s=30.0, what="bench") as exclusive:
            outcome["exclusive"] = exclusive
            outcome["stop_left"] = os.path.exists(stop)

    with chiplock.hold_chip_lock(lock, wait_s=5.0, what="holder") as got:
        assert got
        t = threading.Thread(target=preemptor)
        t.start()
        deadline = time.monotonic() + 20.0
        while not os.path.exists(stop):  # the yield request arrives
            assert time.monotonic() < deadline, "preemptor never asked"
            time.sleep(0.05)
        # holder yields by leaving the context (the trainer exits 115 here)
    t.join(timeout=30.0)
    assert not t.is_alive()
    assert outcome == {"exclusive": True, "stop_left": False}


def test_trainer_gates_off_on_cpu(monkeypatch):
    """Without explicit env the machinery must stay OFF on the CPU test
    platform — otherwise the suite (and the in-repo 2-process cluster
    tests) would serialize on a real /tmp lock."""
    monkeypatch.delenv("RENI_TPU_CHIP_LOCK", raising=False)
    monkeypatch.delenv("RENI_TPU_STOP_FILE", raising=False)
    assert chiplock.trainer_lock_path() is None
    assert chiplock.trainer_stop_path() is None


def test_maybe_yield_exits_115(tmp_path):
    stop = str(tmp_path / "stop")
    chiplock.maybe_yield(stop, what="bench-item")  # absent: no-op
    open(stop, "w").close()
    with pytest.raises(SystemExit) as ei:
        chiplock.maybe_yield(stop, what="bench-item")
    assert ei.value.code == chiplock.YIELD_EXIT_CODE
    assert not os.path.exists(stop)  # consumed


# --- trainer integration: yield at a segment boundary, then relaunch-resume


def test_cli_yield_and_relaunch_resume(tmp_path, monkeypatch):
    """A stop file makes the trainer force-checkpoint and exit 115 at the
    first segment boundary; a fresh `--retries` process then adopts the
    incomplete run (`_find_resumable_run`) and finishes the chain — the
    exact recovery loop behind bench.py preempting the chip queue."""
    from test_cli import _tiny_config
    from PIL import Image

    from reni_tpu.cli.run import _find_resumable_run, main, run_with_retries

    rng = np.random.default_rng(0)
    for split, n in (("Train", 5), ("Test", 3)):
        d = tmp_path / "ldr" / split
        d.mkdir(parents=True)
        for i in range(n):
            arr = (rng.uniform(size=(16, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(d / f"img{i}.png"))
    cfg = _tiny_config(tmp_path, str(tmp_path / "ldr"))
    cfg.TRAINER.LOGGER.LOG_IMAGES = False  # not under test; keep it fast

    # nothing to adopt before any run exists
    assert _find_resumable_run(cfg) == (None, None)

    stop = str(tmp_path / "stop")
    monkeypatch.setenv("RENI_TPU_STOP_FILE", stop)
    open(stop, "w").close()
    with pytest.raises(SystemExit) as ei:
        main(cfg)
    assert ei.value.code == chiplock.YIELD_EXIT_CODE
    assert not os.path.exists(stop), "yield must consume the request"

    run_root = os.path.join(str(tmp_path / "runs"))
    v0 = None
    for base, dirs, _ in os.walk(run_root):
        if "version_0" in dirs:
            v0 = os.path.join(base, "version_0")
    assert v0, "first attempt created no run dir"
    cks = os.listdir(os.path.join(v0, "checkpoints"))
    assert "fit_decoder_epoch=0006.npz" in cks  # saved before yielding
    assert not any(c.startswith("fit_decoder_final") for c in cks)

    # the relaunch (same command, --retries > 0) adopts version_0 mid-task
    adopt_dir, (tasks_list, resume, load) = _find_resumable_run(cfg)
    assert adopt_dir == v0
    assert tasks_list == ["FIT_DECODER", "FIT_LATENT"]
    assert resume and "fit_decoder" in resume and load is None

    results, log_dir = run_with_retries(cfg, retries=1)
    assert log_dir == v0, "relaunch must reuse the incomplete run dir"
    assert set(results) == {"FIT_DECODER", "FIT_LATENT"}
    # the decoder resumed at epoch 6: only the remaining epochs trained
    assert results["FIT_DECODER"][1]["fit_decoder_loss"].shape == (6,)
    cks = os.listdir(os.path.join(v0, "checkpoints"))
    assert any(c.startswith("fit_decoder_final") for c in cks)
    assert any(c.startswith("fit_latent_final") for c in cks)
    assert not os.path.exists(os.path.join(os.path.dirname(v0), "version_1"))

    # a completed chain is never adopted — the next launch starts fresh
    assert _find_resumable_run(cfg) == (None, None)

    # config identity gates adoption: an edited config must start fresh
    # even mid-chain (main() stored version_0's resolved config.json)
    assert os.path.exists(os.path.join(v0, "config.json"))
    for name in ("fit_latent_final", "fit_latent_latest",
                 "fit_latent_epoch=0012"):
        for ext in (".npz", ".json"):
            os.remove(os.path.join(v0, "checkpoints", name + ext))
    assert _find_resumable_run(cfg)[0] == v0  # incomplete again: adoptable
    edited = cfg.clone()
    edited.RENI.FIT_LATENT.EPOCHS = 24  # same auto-name, different config
    assert _find_resumable_run(edited) == (None, None)

    # the resumed LR curve continues the schedule, no restart from epoch 1
    with open(os.path.join(v0, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    dec_epochs = [r["step"] for r in rows if "fit_decoder_lr" in r]
    assert dec_epochs == sorted(dec_epochs)
    assert max(dec_epochs) == 12
