"""Worker process for the REAL 2-process jax.distributed test.

Launched by tests/test_multiprocess.py as
``python tests/mp_worker.py <process_id> <num_processes> <coordinator>``.
Each process brings 2 virtual CPU devices, so the global runtime spans 4
devices across 2 OS processes — the JAX-native analogue of the reference's
``torch.distributed.init_process_group`` workers
(``deps/TransMVSNet/train.py:376-381``).

Exercises, in order: jax.distributed.initialize (through
diner_tpu.parallel.initialize), a cross-process psum, the metric
all-reduce (utils/meters.py), the global barrier, and one sharded DINER
train step over the global ('data', 'rays') mesh. Prints machine-checkable
``CHECK <name> <value>`` lines; exits nonzero on any failure.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# drop any inherited device-count flag (pytest's conftest sets =8; with a
# duplicated flag the last occurrence wins)
_kept = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if not f.startswith("--xla_force_host_platform_device_count")]
os.environ["XLA_FLAGS"] = " ".join(
    ["--xla_force_host_platform_device_count=2"] + _kept)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    # relay-backed PJRT plugins pin the platform at import; re-assert cpu
    # BEFORE distributed init (allowed: config update, not a backend call)
    from diner_tpu.utils.platform import respect_env_platform
    respect_env_platform()

    from diner_tpu.parallel import initialize
    initialize(coordinator_address=coord, num_processes=nproc, process_id=pid)

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert len(jax.local_devices()) == 2
    print(f"CHECK process_count {jax.process_count()}", flush=True)

    # 1. cross-process psum over all 4 global devices: each device
    # contributes (its global index + 1); total must be 1+2+3+4 = 10.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from diner_tpu.parallel import make_global_array

    devices = np.asarray(jax.devices())
    mesh1d = Mesh(devices, ("d",))
    vals = np.arange(1.0, 2 * nproc + 1, dtype=np.float32)
    garr = make_global_array(vals, NamedSharding(mesh1d, P("d")))
    total = jax.jit(shard_map(lambda x: jax.lax.psum(x, "d"),
                              mesh=mesh1d, in_specs=P("d"),
                              out_specs=P()))(garr)
    total = float(np.asarray(total)[0])
    assert abs(total - sum(range(1, 2 * nproc + 1))) < 1e-6, total
    print(f"CHECK psum {total}", flush=True)

    # 2. cross-process metric reduction (reference reduce_scalar_outputs)
    from diner_tpu.utils import meters
    out = meters.reduce_scalar_dict({"loss": float(pid)})  # mean over procs
    expect = sum(range(nproc)) / nproc
    assert abs(out["loss"] - expect) < 1e-6, out
    print(f"CHECK reduce {out['loss']}", flush=True)

    # 3. global barrier (reference synchronize())
    meters.synchronize("mp-test")
    print("CHECK barrier ok", flush=True)

    # 4. one sharded DINER train step over the global mesh
    from diner_tpu.data.synthetic import make_sphere_scene
    from diner_tpu.models.pixelnerf import PixelNeRFConfig
    from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
    from diner_tpu.renderer import RendererConfig
    from diner_tpu.parallel import (
        make_mesh, make_parallel_train_step, replicate_pytree, shard_batch)
    from diner_tpu.train.diner import DinerConfig, create_state

    cfg = DinerConfig(
        nerf=PixelNeRFConfig(
            encoder=SpatialEncoderConfig(backbone="resnet18", num_layers=2,
                                         image_padding=4, padding_pe=2),
            d_hidden=32),
        renderer=RendererConfig(n_samples=4, n_depth_candidates=16,
                                n_gaussian=1, white_bkgd=True),
        ray_batch_size=16, lr=5e-4)
    batch = make_sphere_scene(H=16, W=16, nv=2, sb=2)
    model, state = create_state(cfg, jax.random.PRNGKey(0), batch)

    mesh = make_mesh(2 * nproc, data_parallel=2)  # data=2 x rays=nproc
    state = replicate_pytree(state, mesh)
    pstep = make_parallel_train_step(model, cfg, mesh, donate_state=False)
    state2, metrics = pstep(state, shard_batch(batch, mesh),
                            jax.random.PRNGKey(1))
    loss = float(np.asarray(jax.device_get(metrics["total"])))
    assert np.isfinite(loss), loss
    print(f"CHECK train_step_loss {loss:.6f}", flush=True)

    jax.distributed.shutdown()
    print("CHECK done ok", flush=True)


if __name__ == "__main__":
    main()
