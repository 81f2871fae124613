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
    # force f32-exact matmuls: the module's Dense layers run at DEFAULT
    # precision, which on TPU is bf16 multiplies — this reference must be
    # at least as precise as the kernel under test
    with jax.default_matmul_precision('highest'):
        return model.apply(variables, pcl_feat, node_feat, pcl_xyz,
                           node_xyz)


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

# Mismatching (b, j) pairs must be explained by a support point sitting AT
# an in-ball boundary (kernel and XLA HIGHEST d2 round differently, so
# membership d2 < r^2 can flip for boundary points, changing the
# masked-max set). A clear-margin mismatch is a real lowering bug.
from keypointfusion_tpu.ops.pairwise import pairwise_sqdist

sup = jnp.concatenate([pcl_xyz, node_xyz], axis=1)
d2 = np.asarray(jax.jit(pairwise_sqdist)(node_xyz, sup))
bad = np.argwhere(diff.max(-1) > 1e-3)
unexplained = 0
for bb, jj in bad:
    margin = min(np.abs(d2[bb, jj] - r * r).min() /
                 max(r * r, 1e-12) for r in (0.1, 0.2, 0.4))
    if margin > 1e-5:
        unexplained += 1
print(f"mismatch (b,j): {len(bad)}  unexplained (clear margin): "
      f"{unexplained}", flush=True)
assert unexplained == 0, "DESA v2 HARDWARE MISMATCH beyond boundary flips"
print("ok", flush=True)
