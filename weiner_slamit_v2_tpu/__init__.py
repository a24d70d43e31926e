"""weiner_slamit_v2_tpu: a TPU-native visual SLAM framework (JAX/XLA/Pallas).

Brand-new implementation of the capability set of the reference
(serviceberry3/weiner_slamit_v2, an Android ORB-SLAM2 fork) — see SURVEY.md.
"""

import jax as _jax

# Geometry/BA numerics need true f32 matmuls on TPU (the default bf16-in-f32
# matmul precision breaks pose-optimization conditioning). Kernels that can
# tolerate bf16 opt in explicitly via lax precision arguments.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import config, geometry, io  # noqa: F401, E402

