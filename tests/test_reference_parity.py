"""Numerical parity vs the ACTUAL reference torch modules.

Imports `cs_vit.net.transformer_module` / `latent_transformers` from the
read-only reference checkout (these need only torch/transformers/einops, not
smplx/kornia), loads their random-init weights into our flax modules through
the checkpoint converter, and compares outputs. This pins down the
intentionally replicated quirks: sqrt(d_h)-multiplied attention scores,
BatchNorm1d block norms, trope RoPE, 2D polar RoPE, the swapped scale/angle
embedders, and the Fourier angle embedding.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "cs_vit")), reason="reference not mounted"
)
torch = pytest.importorskip("torch")

from cs_vit_tpu.models import modules as M  # noqa: E402
from cs_vit_tpu.models.latent import ScaleRotComplexEmbedTransformationGroup  # noqa: E402
from cs_vit_tpu.train.convert import convert_submodule_state_dict  # noqa: E402


def _load_reference_net():
    """Import the reference's net modules directly, bypassing the package
    __init__ (which needs torchvision/smplx not present here)."""
    import importlib
    import types

    pkg = types.ModuleType("refnet")
    pkg.__path__ = [os.path.join(REF, "cs_vit", "net")]
    sys.modules.setdefault("refnet", pkg)
    tm = importlib.import_module("refnet.transformer_module")
    lt = importlib.import_module("refnet.latent_transformers")
    return tm, lt


try:
    tm, lt = _load_reference_net()
except Exception as e:  # pragma: no cover
    pytest.skip(f"cannot import reference modules: {e}", allow_module_level=True)

D, H = 32, 4


def to_sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_mha_parity(rng):
    torch.manual_seed(0)
    ref = tm.MHA(D, H).eval()
    x = rng.normal(size=(2, 5, D)).astype(np.float32)
    ctx = rng.normal(size=(2, 9, D)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()

    params, _ = convert_submodule_state_dict(to_sd(ref), "mha")
    ours = M.MHA(D, H, compat_scale=True).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ctx)
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


@pytest.mark.parametrize("train", [False, True])
def test_encoder_block_parity(rng, train):
    torch.manual_seed(1)
    ref = tm.EncoderBlock(D, H)
    ref.train(train)
    x = rng.normal(size=(3, 6, D)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()

    params, stats = convert_submodule_state_dict(to_sd(ref), "encoder_block")
    blk = M.EncoderBlock(D, H)
    variables = {"params": params, "batch_stats": stats}
    if train:
        ours, _ = blk.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    else:
        ours = blk.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-4)


def test_decoder_block_parity(rng):
    torch.manual_seed(2)
    ref = tm.DecoderBlock(D, H).eval()
    x = rng.normal(size=(2, 3, D)).astype(np.float32)
    r = rng.normal(size=(2, 7, D)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x), torch.from_numpy(r)).numpy()
    params, stats = convert_submodule_state_dict(to_sd(ref), "decoder_block")
    ours = M.DecoderBlock(D, H).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), jnp.asarray(r)
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_cross_attn_decoder_parity(rng):
    torch.manual_seed(3)
    ref = tm.CrossAttnDecoder(D, H).eval()
    x = rng.normal(size=(2, 1, D)).astype(np.float32)
    r = rng.normal(size=(2, 7, D)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x), torch.from_numpy(r)).numpy()
    params, stats = convert_submodule_state_dict(to_sd(ref), "cross_attn_decoder")
    ours = M.CrossAttnDecoder(D, H).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), jnp.asarray(r)
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_trope_positional_encoding_parity(rng):
    torch.manual_seed(4)
    ref = tm.PositionalEncoding(D, mode="trope").eval()
    x = rng.normal(size=(2, 5, D)).astype(np.float32)
    t = np.cumsum(rng.uniform(10, 50, size=(2, 5)), axis=1).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    pe = M.PositionalEncoding(d_model=D, mode="trope")
    variables = pe.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t))
    ours = pe.apply(variables, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-4)


def test_absolute_pe_parity(rng):
    torch.manual_seed(5)
    ref = tm.PositionalEncoding(D, mode="absolute").eval()
    x = rng.normal(size=(2, 5, D)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    params = {"pe": ref.pe.weight.detach().numpy()}
    ours = M.PositionalEncoding(d_model=D, mode="absolute").apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-6)


def test_rope2d_parity(rng):
    torch.manual_seed(6)
    P = 4
    ref = tm.RoPE2DPositionalEncoding(D, P, P, num_point=8).eval()
    x = rng.normal(size=(2, P * P, D)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    params = {"embedding": ref.embedding.detach().numpy()}
    ours = M.RoPE2DPositionalEncoding(
        embed_dim=D, num_p=P, num_q=P, num_point=8
    ).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_continuous_angle_embedding_parity(rng):
    torch.manual_seed(7)
    ref = tm.ContinuousAngleEmbedding(output_dim=D, num_freq=32).eval()
    angles = rng.uniform(0, 4 * np.pi, size=(6,)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(angles.copy())).numpy()
    params, _ = convert_submodule_state_dict(to_sd(ref), "angle_embedder")
    ours = M.ContinuousAngleEmbedding(output_dim=D, num_freq=32).apply(
        {"params": params}, jnp.asarray(angles)
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_scale_rot_complex_group_parity(rng):
    """The full latent group incl. the swapped-embedder quirk (ref :331-336)."""
    torch.manual_seed(8)
    P = 4
    ref = lt.ScaleRotComplexEmbedTransformationGroup(
        num_layers=2, embed_dim=D, num_heads=H, num_p=P, num_q=P
    ).eval()
    x = rng.normal(size=(2, P * P, D)).astype(np.float32)
    scale = (rng.uniform(0.8, 1.2, size=(2,))).astype(np.float32)
    angle = rng.uniform(0, 2 * np.pi, size=(2,)).astype(np.float32)
    with torch.no_grad():
        expected = ref.do_sr(
            torch.from_numpy(x), torch.from_numpy(scale.copy()), torch.from_numpy(angle.copy())
        ).numpy()

    params, stats = convert_submodule_state_dict(to_sd(ref), "sr_complex:2")
    ours = ScaleRotComplexEmbedTransformationGroup(
        num_layers=2, embed_dim=D, num_heads=H, num_p=P, num_q=P,
        compat_scale=True, compat_swap=True,
    ).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(angle),
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-4)


def test_lora_compatible_mha_parity(rng):
    """Deprecated LoraCompatibleMHA (ref `transformer_module.py:209-232`):
    q/k/v pre-projections + standard torch MultiheadAttention."""
    import warnings

    torch.manual_seed(7)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        ref = tm.LoraCompatibleMHA(D, H).eval()
    q = rng.normal(size=(2, 5, D)).astype(np.float32)
    kv = rng.normal(size=(2, 9, D)).astype(np.float32)
    with torch.no_grad():
        expected = ref(
            torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv)
        ).numpy()

    params, _ = convert_submodule_state_dict(to_sd(ref), "lora_mha")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        ours = M.LoraCompatibleMHA(D, H).apply(
            {"params": params}, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv)
        )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)
