"""Tests for transformer modules: numpy oracles + torch-builtin parity."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cs_vit_tpu.models import modules as M


def test_torch_batchnorm_matches_torch(rng):
    import torch

    x = rng.normal(size=(4, 7, 16)).astype(np.float32)
    bn = M.TorchBatchNorm()
    variables = bn.init(jax.random.key(0), jnp.asarray(x), use_running_average=False)

    tbn = torch.nn.BatchNorm1d(16, momentum=0.1, eps=1e-5)
    tbn.train()

    # A couple of training steps: outputs and running stats must track torch.
    params = variables["params"]
    stats = variables["batch_stats"]
    for step in range(3):
        xs = rng.normal(size=(4, 7, 16)).astype(np.float32) * (step + 1)
        out, mutated = bn.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(xs),
            use_running_average=False,
            mutable=["batch_stats"],
        )
        stats = mutated["batch_stats"]
        # torch BatchNorm1d wants [B, C, L]
        t_out = tbn(torch.from_numpy(xs).permute(0, 2, 1)).permute(0, 2, 1)
        np.testing.assert_allclose(np.asarray(out), t_out.detach().numpy(), atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(stats["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), tbn.running_var.numpy(), atol=1e-5
    )

    # Eval mode: uses running stats.
    tbn.eval()
    xs = rng.normal(size=(2, 5, 16)).astype(np.float32)
    out = bn.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(xs),
        use_running_average=True,
    )
    t_out = tbn(torch.from_numpy(xs).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out), t_out.detach().numpy(), atol=1e-5)


def mha_oracle(x, ctx, params, num_heads, compat_scale=True):
    """Numpy attention oracle with the reference's sqrt(d_h)-multiply quirk."""

    def dense(inp, p):
        return inp @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    B, L, D = x.shape
    S = ctx.shape[1]
    hd = D // num_heads
    q = dense(x, params["query"]).reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
    k = dense(ctx, params["key"]).reshape(B, S, num_heads, hd).transpose(0, 2, 1, 3)
    v = dense(ctx, params["value"]).reshape(B, S, num_heads, hd).transpose(0, 2, 1, 3)
    scale = math.sqrt(hd) if compat_scale else 1 / math.sqrt(hd)
    scores = np.einsum("bhld,bhsd->bhls", q, k) * scale
    scores -= scores.max(axis=-1, keepdims=True)
    w = np.exp(scores)
    w /= w.sum(axis=-1, keepdims=True)
    out = np.einsum("bhls,bhsd->bhld", w, v).transpose(0, 2, 1, 3).reshape(B, L, D)
    return dense(out, params["output"])


@pytest.mark.parametrize("compat", [True, False])
def test_mha_matches_oracle(rng, compat):
    x = rng.normal(size=(2, 3, 32)).astype(np.float32)
    ctx = rng.normal(size=(2, 9, 32)).astype(np.float32)
    mha = M.MHA(embed_dim=32, num_heads=4, compat_scale=compat)
    variables = mha.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(ctx))
    out = mha.apply(variables, jnp.asarray(x), jnp.asarray(ctx))
    ref = mha_oracle(x, ctx, variables["params"], num_heads=4, compat_scale=compat)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_mha_compat_scale_differs(rng):
    """The quirk must actually change the result (guards silent regressions)."""
    x = rng.normal(size=(1, 3, 32)).astype(np.float32)
    a = M.MHA(32, 4, compat_scale=True)
    va = a.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(x))
    out_a = a.apply(va, jnp.asarray(x), jnp.asarray(x))
    b = M.MHA(32, 4, compat_scale=False)
    out_b = b.apply(va, jnp.asarray(x), jnp.asarray(x))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_ffn_gelu_is_exact_erf(rng):
    import torch

    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    ffn = M.FeedForwardNetwork(dim=16)
    variables = ffn.init(jax.random.key(1), jnp.asarray(x))
    out = ffn.apply(variables, jnp.asarray(x))

    p = variables["params"]
    h = x @ np.asarray(p["fc1"]["kernel"]) + np.asarray(p["fc1"]["bias"])
    h = torch.nn.functional.gelu(torch.from_numpy(h)).numpy()  # exact erf
    ref = h @ np.asarray(p["fc2"]["kernel"]) + np.asarray(p["fc2"]["bias"])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_encoder_block_shapes_and_residual(rng):
    x = rng.normal(size=(2, 6, 32)).astype(np.float32)
    blk = M.EncoderBlock(dim=32, num_heads=4)
    variables = blk.init(jax.random.key(0), jnp.asarray(x), train=False)
    out = blk.apply(variables, jnp.asarray(x), train=False)
    assert out.shape == x.shape
    out_t, _ = blk.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    assert not np.allclose(np.asarray(out), np.asarray(out_t))  # BN mode matters


def test_decoder_and_crossattn_blocks(rng):
    x = rng.normal(size=(2, 3, 32)).astype(np.float32)
    ref = rng.normal(size=(2, 10, 32)).astype(np.float32)
    for cls in (M.DecoderBlock, M.CrossAttnDecoder):
        blk = cls(dim=32, num_heads=4)
        variables = blk.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(ref))
        out = blk.apply(variables, jnp.asarray(x), jnp.asarray(ref))
        assert out.shape == x.shape


def test_trope_positional_encoding(rng):
    """Continuous-time RoPE: phase is (t_last - t) * inv_freq over feature pairs."""
    D = 8
    x = rng.normal(size=(2, 4, D)).astype(np.float32)
    t = np.cumsum(rng.uniform(10, 40, size=(2, 4)), axis=1).astype(np.float32)
    pe = M.PositionalEncoding(d_model=D, mode="trope")
    variables = pe.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t))
    out = np.asarray(pe.apply(variables, jnp.asarray(x), jnp.asarray(t)))

    inv_freq = 1.0 / (10000 ** (np.arange(0, D, 2) / D))
    tp = t[:, -1:] - t
    freqs = tp[..., None] * inv_freq
    cos, sin = np.cos(freqs), np.sin(freqs)
    xr = x.reshape(2, 4, D // 2, 2)
    ref = np.stack(
        [xr[..., 0] * cos - xr[..., 1] * sin, xr[..., 0] * sin + xr[..., 1] * cos],
        axis=-1,
    ).reshape(2, 4, D)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # Last frame gets zero phase -> unchanged.
    np.testing.assert_allclose(out[:, -1], x[:, -1], atol=1e-6)


def test_absolute_pe_adds_learned_embedding(rng):
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    pe = M.PositionalEncoding(d_model=16, mode="absolute")
    variables = pe.init(jax.random.key(0), jnp.asarray(x))
    out = pe.apply(variables, jnp.asarray(x))
    expected = x + np.asarray(variables["params"]["pe"])[None, :5]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_rope2d_rotation_preserves_pairnorm(rng):
    """2D RoPE is a pure rotation after the radial embedding add."""
    D, P = 16, 4
    x = rng.normal(size=(2, P * P, D)).astype(np.float32)
    rope = M.RoPE2DPositionalEncoding(embed_dim=D, num_p=P, num_q=P, num_point=8)
    variables = rope.init(jax.random.key(0), jnp.asarray(x))
    out = np.asarray(rope.apply(variables, jnp.asarray(x)))
    assert out.shape == x.shape

    # Reconstruct the pre-rotation (x + radial emb) and compare pair norms.
    emb = np.asarray(variables["params"]["embedding"])
    bound = rope.bind(variables)
    dist_emb = (
        emb[np.asarray(bound._floor)] * (1 - np.asarray(bound._alpha))
        + emb[np.asarray(bound._ceil)] * np.asarray(bound._alpha)
    )
    pre = x.reshape(2, P, P, D) + dist_emb[None]
    pre_norm = np.linalg.norm(pre.reshape(2, P * P, D // 2, 2), axis=-1)
    post_norm = np.linalg.norm(out.reshape(2, P * P, D // 2, 2), axis=-1)
    np.testing.assert_allclose(post_norm, pre_norm, atol=1e-4)


def test_continuous_angle_embedding(rng):
    emb = M.ContinuousAngleEmbedding(output_dim=32, num_freq=8)
    angles = jnp.asarray(rng.uniform(0, 4 * np.pi, size=(6,)).astype(np.float32))
    variables = emb.init(jax.random.key(0), angles)
    out = emb.apply(variables, angles)
    assert out.shape == (6, 32)
    # 2-pi periodic by construction (angles mod max_angle)
    out2 = emb.apply(variables, angles + 2 * np.pi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)
