"""TI subsystem tests: HF parity (ViT / MAE decoder / DINOv2), LoRA merge,
support loss, TI_ViT forward, TI-DINO step functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cs_vit_tpu.models.dinov2 import Dinov2Backbone, Dinov2Config, convert_hf_dinov2_state_dict
from cs_vit_tpu.models.ti import (
    TIDinoTransGroup,
    TIDinoViT,
    TIViT,
    dino_forward,
    dino_stage_mask,
    support_loss,
    ti_forward,
    update_teacher,
)
from cs_vit_tpu.models.vit import (
    ViTConfig,
    ViTEncoder,
    ViTMAEDecoderConfig,
    ViTMAEDecoderNoMask,
    convert_hf_mae_decoder_state_dict,
    convert_hf_vit_state_dict,
    merge_lora_params,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY_VIT = ViTConfig(
    image_size=32, patch_size=8, hidden_size=16, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=32,
)


def test_vit_encoder_matches_hf(rng):
    hf_cfg = transformers.ViTConfig(
        image_size=32, patch_size=8, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False).eval()
    model = ViTEncoder(TINY_VIT)
    params = convert_hf_vit_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, TINY_VIT
    )
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    out = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_mae_decoder_matches_hf_nomask(rng):
    """HF ViTMAEDecoder with identity ids_restore == the NoMask variant."""
    from transformers.models.vit_mae.modeling_vit_mae import ViTMAEDecoder

    hf_cfg = transformers.ViTMAEConfig(
        image_size=32, patch_size=8, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        decoder_hidden_size=16, decoder_num_hidden_layers=2,
        decoder_num_attention_heads=2, decoder_intermediate_size=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    hf_cfg._attn_implementation = "eager"  # bare submodule needs this resolved
    num_patches = (32 // 8) ** 2
    torch.manual_seed(1)
    hf_dec = ViTMAEDecoder(hf_cfg, num_patches=num_patches).eval()

    cfg = ViTMAEDecoderConfig(
        hidden_size=16, decoder_hidden_size=16, decoder_num_hidden_layers=2,
        decoder_num_attention_heads=2, decoder_intermediate_size=32, patch_size=8,
    )
    dec = ViTMAEDecoderNoMask(cfg, num_patches)
    params = convert_hf_mae_decoder_state_dict(
        {k: v.numpy() for k, v in hf_dec.state_dict().items()}, cfg
    )

    tokens = rng.normal(size=(2, num_patches + 1, 16)).astype(np.float32)
    ids_restore = torch.arange(num_patches)[None].repeat(2, 1)
    with torch.no_grad():
        ref = hf_dec(torch.from_numpy(tokens), ids_restore).logits.numpy()
    out = dec.apply({"params": params}, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_dinov2_matches_hf(rng):
    hf_cfg = transformers.Dinov2Config(
        image_size=32, patch_size=8, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, mlp_ratio=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(2)
    hf = transformers.Dinov2Backbone(hf_cfg).eval()
    cfg = Dinov2Config(
        image_size=32, patch_size=8, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, mlp_ratio=2,
    )
    model = Dinov2Backbone(cfg)
    params = convert_hf_dinov2_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg
    )
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        fm = hf(torch.from_numpy(x)).feature_maps[0].numpy()  # [B,D,h,w]
    ref = fm.reshape(2, 16, -1).transpose(0, 2, 1)
    out = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_lora_merge_equivalence(rng):
    """Model with LoRA deltas == merged plain model on the same inputs."""
    model_lora = ViTEncoder(TINY_VIT, lora_rank=2)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    params = model_lora.init(jax.random.key(0), x)["params"]

    # randomize lora_B so the delta is nonzero (it init-zeros like peft)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    for k in flat:
        if k[-1] == "lora_B":
            flat[k] = jnp.asarray(rng.normal(scale=0.1, size=flat[k].shape), jnp.float32)
    params = tu.unflatten_dict(flat)

    out_lora = model_lora.apply({"params": params}, x, deterministic=True)

    merged = merge_lora_params(params)
    model_plain = ViTEncoder(TINY_VIT, lora_rank=None)
    out_merged = model_plain.apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_merged), atol=1e-5)


def test_support_loss_branches():
    # mean norm far below support -> quadratic branch, positive
    small = jnp.ones((4, 8)) * 0.01
    v1 = support_loss(small, support=4.0)
    assert float(v1) > 0
    # mean norm far above support -> log branch, positive
    big = jnp.ones((4, 8)) * 100.0
    v2 = support_loss(big, support=4.0)
    assert float(v2) > 0
    # at the support boundary ~ 0
    at = jnp.zeros((4, 8)).at[:, 0].set(4.0)
    v3 = support_loss(at, support=4.0)
    assert abs(float(v3)) < 1e-4


def test_tivit_forward_losses(rng):
    dec_cfg = ViTMAEDecoderConfig(
        hidden_size=16, decoder_hidden_size=16, decoder_num_hidden_layers=1,
        decoder_num_attention_heads=2, decoder_intermediate_size=32, patch_size=8,
    )
    model = TIViT(TINY_VIT, decoder_config=dec_cfg, ti_loss=True)
    imgs = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, imgs
    )
    out, _ = model.apply(
        variables, imgs, train=True,
        rngs={"latent": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    for k in ("total", "latent", "support", "recons"):
        assert np.isfinite(float(out["logs"]["scalar"][k])), k
    assert float(out["logs"]["scalar"]["recons"]) > 0
    assert out["recons"].shape == (2, 16, 8 * 8 * 3)


@pytest.fixture(scope="module")
def dino_setup():
    rng = np.random.default_rng(5)
    cfg = Dinov2Config(
        image_size=32, patch_size=8, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, mlp_ratio=2,
    )
    student = TIDinoViT(cfg)
    imgs = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    svars = student.init(jax.random.key(0), imgs)
    trans = TIDinoTransGroup(embed_dim=16, num_heads=2, num_p=4)
    patches = student.apply(svars, imgs)
    tvars = trans.init(jax.random.key(1), patches, jnp.ones(2), jnp.zeros(2))
    return student, trans, svars, tvars, imgs


def test_dino_forward_and_center(dino_setup):
    student, trans, svars, tvars, imgs = dino_setup
    center = jnp.zeros((16, 16))  # [L=16, D=16]
    loss, logs, new_center = dino_forward(
        student, trans, svars, svars["params"], tvars, center, imgs,
        jax.random.key(3),
    )
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(new_center), 0.0)

    # gradient flows only into MLP leaves under the APLA mask
    mask = dino_stage_mask(svars["params"])
    leaves = jax.tree.leaves(mask)
    assert any(leaves) and not all(leaves)

    def loss_fn(params):
        full = {"params": params}
        l, _, _ = dino_forward(
            student, trans, full, svars["params"], tvars, center, imgs,
            jax.random.key(3),
        )
        return l

    g = jax.grad(loss_fn)(svars["params"])
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_ti_forward_trains_trans_group(dino_setup):
    student, trans, svars, tvars, imgs = dino_setup

    def loss_fn(tparams):
        l, _ = ti_forward(
            student, trans, svars["params"], {**tvars, "params": tparams},
            imgs, jax.random.key(4),
        )
        return l

    g = jax.grad(loss_fn)(tvars["params"])
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_update_teacher_ema(dino_setup):
    student, trans, svars, tvars, imgs = dino_setup
    teacher = jax.tree.map(lambda x: x * 0.0, svars["params"])
    new_teacher = update_teacher(teacher, svars["params"], momentum=0.9)
    for t, s in zip(jax.tree.leaves(new_teacher), jax.tree.leaves(svars["params"])):
        np.testing.assert_allclose(np.asarray(t), 0.1 * np.asarray(s), rtol=1e-5)


def test_image_latent_transformer_group(rng):
    from cs_vit_tpu.models.latent import ImageLatentTransformerGroup, compose_hf_cr_hr

    grp = ImageLatentTransformerGroup(num_layers=1, embed_dim=16, num_heads=2)
    x = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
    angle = jnp.asarray([0.3, 1.2], jnp.float32)
    variables = grp.init(jax.random.key(0), x, angle, "init")
    for op in ("hf", "cr", "hr"):
        out = grp.apply(variables, x, angle, op)
        assert out.shape == x.shape

    # composition law: cr ∘ cr -> cr with angles added
    op, a = compose_hf_cr_hr("cr", 0.5, "cr", 0.25)
    assert op == "cr" and np.isclose(a, 0.75)
    op, a = compose_hf_cr_hr("hf", None, "cr", 0.25)
    assert op == "hr" and np.isclose(a, 0.25)
    op, a = compose_hf_cr_hr("hr", 0.5, "hf", None)
    assert op == "cr" and np.isclose(a, -0.5)
