import jax, jax.numpy as jnp, numpy as np
import sys, os; sys.path.insert(0, "/root/repo")
from cs_vit_tpu.models.swinv2 import SwinV2Block, SwinV2Config

def make(impl, res, ws, shift, dim, heads):
    cfg = SwinV2Config(image_size=res*4, patch_size=4, embed_dim=dim,
                       depths=(1,), num_heads=(heads,), window_size=ws, drop_path_rate=0.0)
    return SwinV2Block(config=cfg, dim=dim, resolution=(res,res), num_heads=heads,
                       shift_size=shift, drop_path_rate=0.0, attention_impl=impl)

rng = np.random.default_rng(0)
# production-like geometries (small batch): stage0-like, stage1-like, stage2-like, stage3-like
cases = [
    dict(res=64, ws=16, shift=0, dim=128, heads=4,  B=4),
    dict(res=64, ws=16, shift=8, dim=128, heads=4,  B=4),
    dict(res=32, ws=16, shift=8, dim=256, heads=8,  B=4),
    dict(res=16, ws=16, shift=0, dim=512, heads=16, B=8),
    dict(res=8,  ws=8,  shift=0, dim=1024, heads=32, B=8),
]
for c in cases:
    B = c.pop("B")
    x = jnp.asarray(rng.normal(size=(B, c["res"]*c["res"], c["dim"])), jnp.float32)
    ref = make("xla", **c); fus = make("fused", **c)
    params = ref.init(jax.random.key(0), x)
    yr = np.asarray(ref.apply(params, x))
    yf = np.asarray(fus.apply(params, x))
    err = np.max(np.abs(yr - yf)) / (np.abs(yr).max() + 1e-9)
    print(c, "rel_err", err)
    assert err < 2e-2, c
print("TPU PARITY OK")
