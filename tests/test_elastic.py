"""Failure detection / elastic recovery (SURVEY.md section 5 row 3):
heartbeat liveness, atomic step-numbered checkpoints, and the
restore-on-failure step loop."""

import json
import os
import time

import numpy as np
import pytest

from cuda_surf_tpu.parallel.elastic import (CheckpointDir, Heartbeat,
                                            run_elastic)


def test_checkpoint_dir_roundtrip_and_prune(tmp_path):
    ck = CheckpointDir(str(tmp_path), keep=2)
    assert ck.load_latest() == (-1, None)
    for s in (3, 7, 12):
        ck.save(s, {"x": np.full(4, s), "k": np.int64(s)})
    step, state = ck.load_latest()
    assert step == 12
    np.testing.assert_array_equal(state["x"], np.full(4, 12))
    # keep=2 pruned the oldest
    assert ck.steps() == [7, 12]


def test_checkpoint_ignores_torn_write(tmp_path):
    ck = CheckpointDir(str(tmp_path))
    ck.save(5, {"x": np.arange(3)})
    # simulate a kill mid-write: temp file present, never renamed
    with open(os.path.join(str(tmp_path), "elastic_000000009.npz.tmp.123"),
              "wb") as f:
        f.write(b"garbage")
    step, state = ck.load_latest()
    assert step == 5
    np.testing.assert_array_equal(state["x"], np.arange(3))


def test_heartbeat_publishes_and_detects_stall(tmp_path):
    hb_path = str(tmp_path / "hb.json")
    hb = Heartbeat(hb_path, interval=0.05, stall_timeout=0.2).start()
    try:
        hb.beat(4)
        time.sleep(0.15)
        payload = Heartbeat.read(hb_path, dead_after=5.0)
        assert payload["step"] == 4 and not payload["dead"]
        assert not hb.stalled()
        time.sleep(0.25)              # no beat() -> loop is stalled...
        assert hb.stalled()
        # ...but the publisher thread keeps the file fresh (a wedged
        # collective keeps the process alive while progress stops)
        payload = Heartbeat.read(hb_path, dead_after=5.0)
        assert not payload["dead"]
    finally:
        hb.stop()
    assert Heartbeat.read(str(tmp_path / "missing.json"))["dead"]


def _stepper():
    """Deterministic state update: x_{k+1} = 3 x_k + k (mod 2^31)."""
    def step(k, state):
        return {"x": (state["x"] * 3 + k) % (2 ** 31)}
    return step


def test_run_elastic_no_failures_matches_plain_loop(tmp_path):
    ck = CheckpointDir(str(tmp_path))
    out = run_elastic(_stepper(), {"x": np.int64(1)}, n_steps=25,
                      ckpt=ck, ckpt_every=10)
    ref = {"x": np.int64(1)}
    for k in range(25):
        ref = _stepper()(k, ref)
    assert int(out["x"]) == int(ref["x"])
    assert ck.steps()[-1] == 24          # final checkpoint written


def test_run_elastic_recovers_from_transient_failure(tmp_path):
    ck = CheckpointDir(str(tmp_path))
    fail_at = {"steps": {13, 17}}        # each fails exactly once
    base = _stepper()

    def step(k, state):
        if k in fail_at["steps"]:
            fail_at["steps"].discard(k)
            raise RuntimeError(f"injected failure at {k}")
        return base(k, state)

    restarts = []
    out = run_elastic(step, {"x": np.int64(1)}, n_steps=30, ckpt=ck,
                      ckpt_every=5, max_restarts=3,
                      on_restart=lambda k, e: restarts.append(k))
    assert restarts == [13, 17]
    ref = {"x": np.int64(1)}
    for k in range(30):
        ref = base(k, ref)
    assert int(out["x"]) == int(ref["x"])


def test_run_elastic_gives_up_after_max_restarts(tmp_path):
    ck = CheckpointDir(str(tmp_path))

    def always_fail(k, state):
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        run_elastic(always_fail, {"x": np.int64(0)}, n_steps=5,
                    ckpt=ck, max_restarts=2)


def test_run_elastic_resumes_after_process_restart(tmp_path):
    """External-restart path: a second run_elastic call on the same
    checkpoint dir continues where the killed process left off."""
    ck = CheckpointDir(str(tmp_path))
    base = _stepper()

    class Kill(Exception):
        pass

    def step(k, state):
        if k == 22:
            raise Kill()                 # simulates SIGKILL mid-run
        return base(k, state)

    with pytest.raises(Kill):
        run_elastic(step, {"x": np.int64(1)}, n_steps=40, ckpt=ck,
                    ckpt_every=10, max_restarts=0)
    # "new process": same call, failure gone
    out = run_elastic(base, {"x": np.int64(1)}, n_steps=40, ckpt=ck,
                      ckpt_every=10)
    ref = {"x": np.int64(1)}
    for k in range(40):
        ref = base(k, ref)
    assert int(out["x"]) == int(ref["x"])
