"""bench.py capture-hardening regression tests (CPU).

BENCH_r04 lost both temporal metrics to `INVALID_ARGUMENT: TPU backend
error`: `bench_train_dispatch` created its donated TrainState directly from
the caller's `variables` (TrainState.create aliases, donation invalidates),
so the first spatial train bench destroyed the params AND batch_stats the
temporal benches then consumed. These tests pin the fix (tree copy before
the donated state) and the resilient-capture helper that keeps one bad
dispatch from erasing a metric.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bench as bench_mod

from .helpers import tiny_batch, tiny_poser


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    model = tiny_poser()
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, B=2, T=1).items()}
    variables = model.init(
        {"params": jax.random.key(0), "droppath": jax.random.key(1)},
        batch,
        phase="inference",
    )
    return model, variables, batch, rng


def test_bench_train_dispatch_does_not_alias_callers_tree(setup, monkeypatch):
    """The donated TrainState must be built from COPIES: donation on real
    hardware invalidates every aliased leaf of the caller's `variables`
    (CPU never donates, so this asserts on object identity instead)."""
    from cs_vit_tpu.train import TrainState

    model, variables, batch, _ = setup
    seen = {}
    orig = TrainState.create.__func__

    def spy(cls, vs, tx):
        seen["ids"] = {id(leaf) for leaf in jax.tree.leaves(vs)}
        return orig(cls, vs, tx)

    monkeypatch.setattr(TrainState, "create", classmethod(spy))
    bench_mod.bench_train_dispatch(model, variables, batch, iters=1)
    caller_ids = {
        id(leaf)
        for leaf in jax.tree.leaves(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}
        )
    }
    assert seen["ids"], "spy never saw the state tree"
    assert not (seen["ids"] & caller_ids), (
        "bench_train_dispatch aliases the caller's variables into the "
        "donated state — the BENCH_r04 temporal-failure bug"
    )


def test_bench_sequence_spatial_then_temporal_then_predict(setup):
    """The exact r4 failure composition: spatial dispatch bench, then
    temporal dispatch bench, then a predict from the same `variables`."""
    model, variables, batch, rng = setup
    t_sp = bench_mod.bench_train_dispatch(model, variables, batch, iters=1)
    # T=5: >=3 frames survive the realtime-supervision slicing (bench.py's
    # production temporal bench runs T=7; 5 keeps this CPU test fast)
    tbatch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, B=2, T=5).items()}
    t_tt = bench_mod.bench_train_dispatch(
        model, variables, tbatch, iters=1, phase="temporal"
    )
    assert t_sp > 0 and t_tt > 0
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        tbatch["patches"], tbatch["square_bboxes"], tbatch["timestamp"],
        tbatch["focal"], tbatch["princpt"], "inference",
        method=model.predict,
    )
    assert np.isfinite(np.asarray(out["joint_cam"])).all()


def test_run_resilient_success_no_degraded():
    extra = {}
    res, desc = bench_mod.run_resilient(
        "x", [("primary", lambda: 42)], extra)
    assert res == 42 and desc == "primary"
    assert "degraded" not in extra and "x_error" not in extra


def test_run_resilient_retry_marks_degraded():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return 7

    extra = {}
    res, desc = bench_mod.run_resilient("x", [("primary", flaky)], extra)
    assert res == 7 and desc == "primary"
    assert extra["degraded"] is True
    assert extra["degraded_detail"] == ["x:retry"]


def test_run_resilient_fallback_and_total_failure():
    def boom():
        raise RuntimeError("dead")

    extra = {}
    res, desc = bench_mod.run_resilient(
        "t", [("primary", boom), ("half-batch", lambda: 1)], extra)
    assert res == 1 and desc == "half-batch"
    assert extra["degraded"] is True
    assert extra["degraded_detail"] == ["t:half-batch"]

    extra2 = {}
    res, desc = bench_mod.run_resilient(
        "t", [("primary", boom), ("half-batch", boom)], extra2)
    assert res is None and desc is None
    assert extra2["t_error"].startswith("RuntimeError")


def test_run_resilient_dedupes_floor_batch_fallbacks():
    """--train-batch at the floor makes the half-batch fallback collide with
    the primary; the duplicate desc must be dropped, not re-run as a
    mislabeled fallback."""
    calls = {"n": 0}

    def count_and_boom():
        calls["n"] += 1
        raise RuntimeError("dead")

    extra = {}
    res, _ = bench_mod.run_resilient(
        "t",
        [("dispatch-b16", count_and_boom), ("dispatch-b16", count_and_boom),
         ("chain-b16", lambda: 9)],
        extra,
    )
    assert res == 9
    assert calls["n"] == 2  # primary retried once, duplicate never ran
    assert extra["degraded_detail"] == ["t:chain-b16"]
