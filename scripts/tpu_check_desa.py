"""On-hardware validation of the v2 fused DESA kernel (chunked rank +
in-kernel A matrices) against the XLA dense-eval module path."""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from keypointfusion_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from keypointfusion_tpu.models.desa import DESA
from keypointfusion_tpu.kernels.desa_dense_pallas import desa_dense_fused

print("device:", jax.devices()[0].device_kind, flush=True)

b, n, j, c = 4, 1024, 21, 128
rng = np.random.RandomState(0)
pcl_feat = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
node_feat = jnp.asarray(rng.randn(b, j, c).astype(np.float32))
pcl_xyz = jnp.asarray(rng.uniform(-0.9, 0.9, (b, n, 3)).astype(np.float32))
node_xyz = jnp.asarray(rng.uniform(-0.7, 0.7, (b, j, 3)
                                   ).astype(np.float32))

model = DESA(c, (128, 128), (64, 64, 64), (0.1, 0.2, 0.4))
variables = jax.jit(model.init)(jax.random.PRNGKey(0), pcl_feat, node_feat,
                                pcl_xyz, node_xyz)


@jax.jit
def xla_path(pcl_feat, node_feat, pcl_xyz, node_xyz):
    return model.apply(variables, pcl_feat, node_feat, pcl_xyz, node_xyz)


@jax.jit
def kern_path(pcl_feat, node_feat, pcl_xyz, node_xyz):
    return desa_dense_fused(
        variables['params'], variables['batch_stats'], pcl_feat, node_feat,
        pcl_xyz, node_xyz, mlp_precision='highest')


want = jax.device_get(xla_path(pcl_feat, node_feat, pcl_xyz, node_xyz))
got = jax.device_get(kern_path(pcl_feat, node_feat, pcl_xyz, node_xyz))
diff = np.abs(got - want)
rel = diff.max() / max(np.abs(want).max(), 1e-9)
print(f"desa v2 on-device max|diff| = {diff.max():.3e} (rel {rel:.3e})",
      flush=True)
assert diff.max() < 5e-3, "DESA v2 HARDWARE MISMATCH"
print("ok", flush=True)
