"""Per-stage timing of the DINER flagship train step on TPU (honest sync)."""
import time
import jax
import jax.numpy as jnp

from diner_tpu.data.synthetic import make_sphere_scene
from diner_tpu.models.pixelnerf import PixelNeRFConfig
from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
from diner_tpu.renderer import RendererConfig, render_rays
from diner_tpu.train.diner import DinerConfig, create_state, make_train_step
from diner_tpu.geometry import gen_rays
from diner_tpu.ops.sampling import sample_depthguided, fill_up_uniform

RAY_BATCH = 1024

cfg = DinerConfig(
    nerf=PixelNeRFConfig(
        encoder=SpatialEncoderConfig(backbone="resnet34", num_layers=4,
                                     image_padding=64, padding_pe=4),
        d_hidden=512, compute_dtype="bfloat16",
    ),
    renderer=RendererConfig(n_samples=40, n_depth_candidates=1000,
                            n_gaussian=15, white_bkgd=False),
    ray_batch_size=RAY_BATCH, znear=0.8, zfar=2.4,
)
batch = make_sphere_scene(H=512, W=640, nv=4)
model, state = create_state(cfg, jax.random.PRNGKey(0), batch)


def timeit(name, fn, *args, iters=5):
    # vary a dummy arg via fold_in to break the relay's same-args cache
    out = fn(*args, jax.random.PRNGKey(0))
    jax.tree_util.tree_map(
        lambda x: jax.device_get(x.ravel()[0]) if hasattr(x, "ravel") else x,
        out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args, jax.random.PRNGKey(i + 1))
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:45s} {dt * 1e3:8.2f} ms")
    return dt


variables = {"params": state.params, "batch_stats": state.batch_stats}
SB = batch["target_rgb"].shape[0]
H, W = batch["target_rgb"].shape[1:3]


@jax.jit
def encode_fwd(key):
    k = jax.random.uniform(key, ())  # perturb to defeat arg cache
    ctx, _ = model.apply(variables, batch["src_rgbs"] * (1 + 0 * k),
                         batch["src_depths"], batch["src_depth_stds"],
                         batch["src_extrinsics"], batch["src_intrinsics"],
                         train=True, method="encode",
                         mutable=["batch_stats"])
    return ctx.latent


ctx, _ = model.apply(variables, batch["src_rgbs"], batch["src_depths"],
                     batch["src_depth_stds"], batch["src_extrinsics"],
                     batch["src_intrinsics"], train=True, method="encode",
                     mutable=["batch_stats"])
znear = jnp.full((SB,), cfg.znear)
zfar = jnp.full((SB,), cfg.zfar)
rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                W, H, znear, zfar).reshape(SB, H * W, 8)[:, :RAY_BATCH]


@jax.jit
def sampler_only(key):
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, (SB, RAY_BATCH, 1000))
    g = jax.random.normal(k2, (SB, RAY_BATCH, 15))
    z = sample_depthguided(rays, ctx.view_maps(), 40, 1000, u, g, 15)
    uf = jax.random.uniform(k3, (SB, RAY_BATCH, 40))
    return fill_up_uniform(z, rays, uf)


@jax.jit
def render_fwd(key):
    def field_fn(c, xyz, vd):
        return model.apply(variables, c, xyz, vd, method="field")
    out = render_rays(field_fn, ctx, rays, key, cfg.renderer)
    return out.rgb


@jax.jit
def field_fwd(key):
    xyz = jax.random.uniform(key, (SB, RAY_BATCH * 40, 3)) * 0.2
    vd = jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), xyz.shape)
    return model.apply(variables, ctx, xyz, vd, method="field")


step = jax.jit(make_train_step(model, cfg))


def full_step(key):
    s2, m = step(state, batch, key)
    return m["total"]


timeit("encode fwd (4x512x640 resnet34)", encode_fwd)
try:
    timeit("sampler (1000 cand, fused maps)", sampler_only)
except Exception as e:
    print("sampler_only failed:", e)
timeit("render fwd (sampler+field+composite)", render_fwd)
timeit("FULL train step (fwd+bwd+adam)", full_step)
