"""Tests: column-random-update optimizer, misc utils, IH26M legacy metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cs_vit_tpu.evaluation.ih26m_metrics import (
    aggregate_results,
    bbox_iou,
    evaluate_sample,
    print_eval_result,
)
from cs_vit_tpu.train.sparse_update import column_random_update_adamw, mask_random_columns
from cs_vit_tpu.utils.misc import calculate_gradient_norm, stat_tree_memory


def test_mask_random_columns():
    tx = mask_random_columns(num_columns_to_update=2, seed=0)
    grads = {"w": jnp.ones((4, 6)), "b": jnp.ones((6,))}
    state = tx.init(grads)
    masked, state = tx.update(grads, state)
    w = np.asarray(masked["w"])
    nz_cols = np.nonzero(w.sum(0))[0]
    assert len(nz_cols) == 2                    # exactly 2 columns kept
    np.testing.assert_array_equal(np.asarray(masked["b"]), 1.0)  # 1-D untouched
    # next step draws a different subset (counter-keyed PRNG)
    masked2, _ = tx.update(grads, state)
    nz2 = np.nonzero(np.asarray(masked2["w"]).sum(0))[0]
    assert len(nz2) == 2


def test_column_random_adamw_runs():
    import optax

    # weight_decay=0 so only the masked-gradient columns move (AdamW decay
    # touches every parameter, matching the reference superclass behavior)
    tx = column_random_update_adamw(1e-2, num_columns_to_update=1, weight_decay=0.0)
    params = {"w": jnp.ones((3, 4))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3, 4))}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    delta = np.asarray(new["w"]) - 1.0
    # only one column moved
    moved_cols = np.nonzero(np.abs(delta).sum(0))[0]
    assert len(moved_cols) == 1


def test_gradient_norm_quirk():
    grads = {"a": jnp.asarray([3.0, 4.0])}  # L2 norm 5, squared 25
    assert np.isclose(calculate_gradient_norm(grads, compat=True), 12.5)
    assert np.isclose(calculate_gradient_norm(grads, compat=False), 5.0)
    stats = stat_tree_memory(grads)
    assert stats["num_arrays"] == 1 and stats["total_bytes"] == 8


def test_bbox_iou():
    assert bbox_iou([0, 0, 2, 2], [0, 0, 2, 2]) == 1.0
    assert bbox_iou([0, 0, 2, 2], [2, 2, 4, 4]) == 0.0
    assert np.isclose(bbox_iou([0, 0, 2, 2], [1, 0, 3, 2]), 2 / 6)


def make_two_hand_sample(rng, hand_type="interacting", err=0.0):
    from cs_vit_tpu.mano import sh_joint_regressor, synthetic_assets

    reg = sh_joint_regressor(synthetic_assets(seed=0))
    joint_gt = rng.normal(scale=30, size=(42, 3))
    joint_out = joint_gt + err
    mesh_gt = rng.normal(scale=30, size=(1556, 3))
    mesh_out = mesh_gt + err
    return dict(
        joint_gt=joint_gt,
        joint_out=joint_out,
        joint_valid=np.ones(42),
        hand_type=hand_type,
        sh_joint_regressor=reg,
        mesh_gt=mesh_gt,
        mesh_out=mesh_out,
        rel_trans_gt=joint_gt[21] - joint_gt[0],
        rel_trans_out=joint_gt[21] - joint_gt[0] + err,
        bboxes_out=[np.asarray([0, 0, 10, 10]), np.asarray([5, 5, 15, 15])],
        bboxes_gt=[np.asarray([0, 0, 10, 10]), None],
    )


def test_ih26m_metrics_zero_error(rng, capsys):
    s = evaluate_sample(**make_two_hand_sample(rng, "interacting", err=0.0))
    agg = aggregate_results([s])
    assert np.isclose(agg["mpjpe_ih"], 0.0, atol=1e-9)
    assert np.isclose(agg["mpvpe_ih"], 0.0, atol=1e-9)
    assert np.isclose(agg["rrve"], 0.0, atol=1e-9)
    assert np.isclose(agg["mrrpe"], 0.0, atol=1e-9)
    assert agg["bbox_iou"] == 1.0
    print_eval_result(agg)
    assert "MPJPE" in capsys.readouterr().out


def test_ih26m_metrics_known_offset(rng):
    """Uniform translation: root-aligned MPJPE/MPVPE vanish, MRRPE stays 0,
    but a LEFT-hand-only translation shows up in MRRPE and RRVE."""
    base = make_two_hand_sample(rng, "interacting", err=0.0)
    # shift only the left hand joints/mesh and the predicted rel_trans by +5mm x
    base["joint_out"] = base["joint_out"].copy()
    base["joint_out"][21:, 0] += 5.0
    base["rel_trans_out"] = base["rel_trans_gt"] + np.asarray([5.0, 0, 0])
    s = evaluate_sample(**base)
    agg = aggregate_results([s])
    # root-aligned joints: a rigid shift of the whole left hand cancels
    assert np.isclose(agg["mpjpe_ih"], 0.0, atol=1e-9)
    assert np.isclose(agg["mrrpe"], 5.0)

    sh = evaluate_sample(**make_two_hand_sample(rng, "right", err=1.0))
    agg_sh = aggregate_results([sh])
    # uniform +1mm offset cancels under root alignment too
    assert np.isclose(agg_sh["mpjpe_sh"], 0.0, atol=1e-9)
    assert np.isnan(agg_sh["mpjpe_ih"])
