"""Training stack tests: schedules, masked optimizer, train step, sharding,
NaN-skip, checkpoint roundtrip + strict=False merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cs_vit_tpu.parallel import make_mesh, replicate_state, shard_batch
from cs_vit_tpu.train import (
    TrainState,
    build_optimizer,
    make_train_step,
    merge_params,
    restore_checkpoint,
    save_checkpoint,
    scaled_lr,
    warmup_cosine_schedule,
)

from .helpers import tiny_batch, tiny_poser


def test_lr_scaling():
    assert np.isclose(scaled_lr(1e-4, 4, 11), np.sqrt(44 / 44) * 1e-4)
    assert np.isclose(scaled_lr(1e-4, 8, 22), np.sqrt(4) * 1e-4)


def test_warmup_cosine_schedule_shape():
    sched = warmup_cosine_schedule(
        max_lr=1.0, min_lr=0.1, warmup_epochs=1, annealing_epochs=2, steps_per_epoch=10
    )
    # warmup: linear from 0
    assert float(sched(0)) == 0.0
    assert np.isclose(float(sched(5)), 0.5)
    assert np.isclose(float(sched(10)), 1.0)
    # end of annealing -> min_lr, then constant
    assert np.isclose(float(sched(30)), 0.1, atol=1e-6)
    assert np.isclose(float(sched(100)), 0.1, atol=1e-6)
    # midpoint of cosine
    assert np.isclose(float(sched(20)), 0.1 + (1 - 0.1) * 0.5, atol=1e-6)


@pytest.fixture(scope="module")
def setup_train():
    rng = np.random.default_rng(0)
    model = tiny_poser()
    batch = tiny_batch(rng, B=4, T=1)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(
        {"params": jax.random.key(0), "droppath": jax.random.key(1)},
        jbatch,
        phase="inference",
    )
    tx = build_optimizer(variables["params"], "spatial", 1e-3)
    state = TrainState.create(variables, tx)
    return model, tx, state, jbatch


def test_train_step_updates_only_phase_params(setup_train):
    model, tx, state, batch = setup_train
    step = make_train_step(model, tx, "spatial", donate=False)
    new_state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped"]) == 0.0
    assert int(new_state.step) == 1

    # spatial-trained params moved; temporal params identical
    def max_delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert max_delta(state.params["backbone"], new_state.params["backbone"]) > 0
    assert (
        max_delta(
            state.params["pose_temporal_encoder"],
            new_state.params["pose_temporal_encoder"],
        )
        == 0.0
    )


def test_train_step_skips_nan_batch(setup_train):
    model, tx, state, batch = setup_train
    bad = dict(batch)
    bad["joint_cam"] = batch["joint_cam"].at[0, 0, 0, 0].set(jnp.nan)
    step = make_train_step(model, tx, "spatial", donate=False)
    new_state, metrics = step(state, bad, jax.random.key(0))
    assert float(metrics["skipped"]) == 1.0
    assert int(new_state.step) == 0
    # params unchanged
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_nan_skip_where_impl_matches_cond(setup_train):
    """The predicated ('where') NaN-skip must reproduce the lax.cond impl:
    identical accepted-step updates, identical untouched state on a
    non-finite loss (BASELINE.md r5 A/B knob)."""
    model, tx, state, batch = setup_train
    cond_step = make_train_step(model, tx, "spatial", donate=False)
    where_step = make_train_step(
        model, tx, "spatial", donate=False, nan_skip_impl="where"
    )

    s_cond, m_cond = cond_step(state, batch, jax.random.key(3))
    s_where, m_where = where_step(state, batch, jax.random.key(3))
    assert float(m_where["skipped"]) == 0.0
    np.testing.assert_allclose(
        float(m_where["loss"]), float(m_cond["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_where["grad_norm"]), float(m_cond["grad_norm"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(s_cond.params), jax.tree.leaves(s_where.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )

    bad = dict(batch)
    bad["joint_cam"] = batch["joint_cam"].at[0, 0, 0, 0].set(jnp.nan)
    new_state, metrics = where_step(state, bad, jax.random.key(0))
    assert float(metrics["skipped"]) == 1.0
    assert int(new_state.step) == 0
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(new_state.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_data_parallel_8dev(setup_train):
    """Batch sharded over an 8-device mesh must match single-device results."""
    model, tx, state, batch = setup_train
    step = make_train_step(model, tx, "spatial", donate=False)

    ref_state, ref_metrics = step(state, batch, jax.random.key(7))

    mesh = make_mesh(n_data=8)
    sharded_batch = shard_batch(
        {k: np.repeat(np.asarray(v), 2, axis=0) for k, v in batch.items()}, mesh
    )
    dp_state = replicate_state(state, mesh)
    dp_state, dp_metrics = step(dp_state, sharded_batch, jax.random.key(7))
    assert np.isfinite(float(dp_metrics["loss"]))
    # doubled batch = same per-sample data duplicated -> identical loss value
    # up to reduction order for deterministic modules; droppath rng differs per
    # shard so compare only coarsely.
    assert abs(float(dp_metrics["loss"]) - float(ref_metrics["loss"])) < 1.0


def test_train_step_shard_map_8dev(setup_train):
    """Explicit-SPMD (shard_map) step: per-device local batches + pmean'd
    grads must match the single-device step. This is the path multi-chip
    training takes (the fused Pallas kernel has no GSPMD partitioning rule,
    so the plain-jit path would replicate it)."""
    model, tx, state, batch = setup_train
    ref_step = make_train_step(model, tx, "spatial", donate=False)
    ref_state, ref_metrics = ref_step(state, batch, jax.random.key(7))

    # 2-device mesh, each shard = one full copy of the reference batch, so
    # per-shard BatchNorm statistics (torch-DDP local-BN semantics, which
    # shard_map reproduces) equal the single-device ones
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    sm_step = make_train_step(model, tx, "spatial", donate=False, mesh=mesh)
    sharded_batch = shard_batch(
        {k: np.concatenate([np.asarray(v)] * 2, axis=0) for k, v in batch.items()},
        mesh,
    )
    dp_state = replicate_state(state, mesh)
    dp_state, dp_metrics = sm_step(dp_state, sharded_batch, jax.random.key(7))
    assert np.isfinite(float(dp_metrics["loss"]))
    assert dp_metrics["joint_cam_pred"].shape[0] == 8
    # identical per-shard data -> same loss up to per-shard droppath rng
    assert abs(float(dp_metrics["loss"]) - float(ref_metrics["loss"])) < 1.0
    # params remain replicated and in sync across shards after the update
    leaf = jax.tree.leaves(dp_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_eval_step_shard_map_8dev(setup_train):
    from cs_vit_tpu.train import make_eval_step

    model, tx, state, batch = setup_train
    mesh = make_mesh(n_data=8)
    ev = make_eval_step(model, mesh=mesh)
    big = shard_batch(
        {k: np.repeat(np.asarray(v), 2, axis=0) for k, v in batch.items()}, mesh
    )
    pred = ev(state.params, state.batch_stats, big)
    assert pred["joint_cam"].shape[0] == 8
    assert np.isfinite(np.asarray(pred["joint_cam"])).all()


def test_checkpoint_roundtrip(tmp_path, setup_train):
    model, tx, state, batch = setup_train
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "epoch": 3,
    }
    path = save_checkpoint(str(tmp_path), 3, payload)
    assert path.endswith("checkpoint_3")

    restored = restore_checkpoint(
        str(tmp_path / "checkpoint"), target=payload
    )
    for a, b in zip(jax.tree.leaves(payload["params"]), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored["epoch"]) == 3


def test_merge_params_strict_false():
    template = {"a": {"w": np.zeros((2, 2))}, "b": {"w": np.zeros(3)}}
    loaded = {"a": {"w": np.ones((2, 2))}, "c": {"w": np.ones(5)}, "b": {"w": np.ones(4)}}
    merged, skipped = merge_params(template, loaded)
    np.testing.assert_array_equal(merged["a"]["w"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["b"]["w"], np.zeros(3))  # shape mismatch kept
    assert "b/w" in skipped


def test_train_step_bfloat16_mixed_precision(setup_train):
    import jax.numpy as jnp

    model, tx, state, batch = setup_train
    step = make_train_step(
        model, tx, "spatial", donate=False, compute_dtype=jnp.bfloat16
    )
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    # master params and batch stats remain f32
    assert all(
        l.dtype == np.float32
        for l in jax.tree.leaves(new_state.params)
        if np.issubdtype(l.dtype, np.floating)
    )
    assert all(
        l.dtype == np.float32
        for l in jax.tree.leaves(new_state.batch_stats)
        if np.issubdtype(l.dtype, np.floating)
    )
    # and parameters actually moved
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(
            jax.tree.leaves(state.params["backbone"]),
            jax.tree.leaves(new_state.params["backbone"]),
        )
    )
    assert moved


def test_temporal_phase_stops_backbone_gradient():
    """In the temporal phase the backbone receives exactly zero gradient."""
    import jax.numpy as jnp

    from .helpers import tiny_batch, tiny_poser

    rng = np.random.default_rng(3)
    model = tiny_poser(temporal_supervision="full")
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, B=2, T=5).items()}
    variables = model.init(
        {"params": jax.random.key(0), "droppath": jax.random.key(1)},
        batch, phase="inference",
    )
    params, stats = variables["params"], variables["batch_stats"]

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, batch, phase="temporal",
            rngs={"droppath": jax.random.key(2)}, mutable=["batch_stats"],
        )
        return out["loss"]

    g = jax.grad(loss_fn)(params)
    assert all(float(jnp.abs(l).max()) == 0.0 for l in jax.tree.leaves(g["backbone"]))
    assert any(
        float(jnp.abs(l).max()) > 0
        for l in jax.tree.leaves(g["pose_temporal_encoder"])
    )


def test_device_prefetch_yields_sharded_batches():
    from cs_vit_tpu.parallel import make_mesh
    from cs_vit_tpu.parallel.prefetch import device_prefetch

    mesh = make_mesh(n_data=8)
    host_batches = [
        {
            "patches": np.full((8, 2, 4, 4, 3), float(i), np.float32),
            "imgs_path": [f"p{i}"],
            "flip": [False],
        }
        for i in range(3)
    ]
    out = list(device_prefetch(iter(host_batches), mesh))
    assert len(out) == 3
    for i, b in enumerate(out):
        assert "imgs_path" not in b and "flip" not in b
        assert b["patches"].shape == (8, 2, 4, 4, 3)
        assert float(np.asarray(b["patches"]).max()) == float(i)
        # sharded along axis 0 over the data mesh
        assert len(b["patches"].sharding.device_set) == 8


def test_device_prefetch_propagates_errors():
    from cs_vit_tpu.parallel import make_mesh
    from cs_vit_tpu.parallel.prefetch import device_prefetch

    mesh = make_mesh(n_data=8)

    def gen():
        yield {"patches": np.zeros((8, 1), np.float32)}
        raise RuntimeError("loader exploded")

    with pytest.raises(RuntimeError, match="loader exploded"):
        list(device_prefetch(gen(), mesh))


def test_train_step_tensor_parallel_8dev(setup_train):
    """Megatron-style model-axis sharding (GSPMD, `parallel/tp.py`) must match
    the single-device step bit-for-bit up to reduction order: global-jit
    semantics are unchanged, only the layout (and the inserted collectives)
    differ. Beyond-reference capability — SURVEY.md §2.7 has DP only."""
    from cs_vit_tpu.parallel import poser_param_specs, shard_state_tp
    from jax.sharding import PartitionSpec as P

    model, tx, state, batch = setup_train
    ref_step = make_train_step(model, tx, "spatial", donate=False)
    ref_state, ref_metrics = ref_step(state, batch, jax.random.key(7))

    mesh = make_mesh(n_data=4, n_model=2)
    specs = poser_param_specs(state.params, 2)
    assert any(s != P() for s in jax.tree.leaves(specs)), "no param sharded"

    tp_state = shard_state_tp(state, tx, mesh)
    tp_batch = shard_batch(batch, mesh)
    tp_step = make_train_step(model, tx, "spatial", donate=False)
    new_tp, tp_metrics = tp_step(tp_state, tp_batch, jax.random.key(7))

    assert np.isclose(
        float(tp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    # Adam divides a reduction-order-sized grad difference by sqrt(nu)+eps,
    # so near-zero-gradient elements can move by up to ~lr either way; bound
    # the per-element difference by a few lr (1e-3) rather than grad-scale.
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(new_tp.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=3e-3, rtol=1e-2,
        )


def test_stateful_clip_matches_optax():
    """clip_by_global_norm_stateful ≡ optax.clip_by_global_norm, plus the
    stored norm (the reference logs clip_grad_norm_'s return value,
    ref `scripts/finetune.py:225`)."""
    import optax

    from cs_vit_tpu.train import clip_by_global_norm_stateful, last_grad_norm

    rng = np.random.default_rng(3)
    tree = {
        "a": jnp.asarray(rng.normal(size=(7, 5)), jnp.float32),
        "b": [jnp.asarray(rng.normal(size=(3,)), jnp.float32)],
    }
    for scale in (0.1, 100.0):  # below and above the threshold
        grads = jax.tree.map(lambda g: g * scale, tree)
        ref = optax.clip_by_global_norm(5.0)
        ours = clip_by_global_norm_stateful(5.0)
        ref_out, _ = ref.update(grads, ref.init(grads))
        our_out, new_state = ours.update(grads, ours.init(grads))
        for a, b in zip(jax.tree.leaves(ref_out), jax.tree.leaves(our_out)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(
            float(new_state.grad_norm), float(optax.global_norm(grads)),
            rtol=1e-6,
        )


def test_train_step_grad_norm_from_clip_state(setup_train):
    """The logged grad_norm is the clip's trainable-subset norm — no second
    full-tree optax.global_norm pass in the step."""
    model, tx, state, batch = setup_train
    step = make_train_step(model, tx, "spatial", donate=False)
    new_state, metrics = step(state, batch, jax.random.key(0))
    from cs_vit_tpu.train import last_grad_norm

    stored = last_grad_norm(new_state.opt_state)
    assert stored is not None
    assert np.isclose(float(metrics["grad_norm"]), float(stored), rtol=1e-6)
    assert float(metrics["grad_norm"]) > 0.0


def test_opt_state_resume_migration(tmp_path, setup_train):
    """Checkpoints saved before the stateful clip (plain optax.clip_by_global_norm,
    EmptyState — no grad_norm leaf) must still resume: merge_restored_tree walks
    the new opt_state structure over the raw restore and injects the fresh
    grad_norm leaf while adopting every Adam moment (ADVICE r2 medium)."""
    import optax

    from cs_vit_tpu.models.poser import phase_trainable_mask
    from cs_vit_tpu.train import merge_restored_tree

    model, tx, state, batch = setup_train

    # old-style optimizer: same chain but with optax's stateless clip
    mask = phase_trainable_mask(state.params, "spatial")
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    old_tx = optax.multi_transform(
        {
            "train": optax.chain(
                optax.clip_by_global_norm(5.0),
                optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01),
            ),
            "freeze": optax.set_to_zero(),
        },
        labels,
    )
    old_state = TrainState.create(
        {"params": state.params, "batch_stats": state.batch_stats}, old_tx
    )
    # take one real step so Adam moments are non-trivial
    old_step = make_train_step(model, old_tx, "spatial", donate=False)
    old_state, _ = old_step(old_state, batch, jax.random.key(7))

    payload = {
        "params": jax.device_get(old_state.params),
        "batch_stats": jax.device_get(old_state.batch_stats),
        "opt_state": jax.device_get(old_state.opt_state),
        "step": jax.device_get(old_state.step),
        "epoch": 5,
    }
    save_checkpoint(str(tmp_path), 5, payload)

    # new-style resume target (stateful clip adds the grad_norm leaf)
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": 0,
    }
    raw = restore_checkpoint(str(tmp_path / "checkpoint"))
    merged, fresh = merge_restored_tree(target, raw)

    assert int(merged["epoch"]) == 5
    assert int(merged["step"]) == 1
    # every fresh (non-adopted) leaf is the migration-injected clip state
    assert fresh and all("grad_norm" in p for p in fresh), fresh
    # Adam moments were adopted, not re-initialised
    old_leaves = {p: l for p, l in jax.tree_util.tree_flatten_with_path(
        jax.device_get(old_state.opt_state))[0]}
    new_leaves = jax.tree_util.tree_flatten_with_path(merged["opt_state"])[0]
    adopted = 0
    for p, l in new_leaves:
        key = p
        if key in old_leaves and np.shape(old_leaves[key]) == np.shape(l):
            np.testing.assert_allclose(
                np.asarray(l, np.float64), np.asarray(old_leaves[key], np.float64),
                rtol=1e-6,
            )
            adopted += 1
    assert adopted > 0

    # and the merged state is usable: one more step with the NEW tx runs
    resumed = TrainState.create(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]}, tx
    ).replace(opt_state=merged["opt_state"], step=merged["step"])
    new_step = make_train_step(model, tx, "spatial", donate=False)
    resumed, metrics = new_step(resumed, batch, jax.random.key(8))
    assert np.isfinite(float(metrics["loss"]))
