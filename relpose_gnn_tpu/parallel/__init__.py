"""Device-mesh and sharding utilities (data / tensor parallel)."""

from relpose_gnn_tpu.parallel.mesh import create_mesh  # noqa: F401
from relpose_gnn_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding, param_sharding, replicate)
