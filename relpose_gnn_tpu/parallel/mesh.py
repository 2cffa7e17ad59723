"""Device mesh construction.

The reference is single-GPU only (SURVEY.md §2.4: no DataParallel/DDP/
torch.distributed anywhere); scaling here is a first-class design instead:
a 2-D `Mesh` with a `data` axis (batch sharding; gradient all-reduce over ICI
inserted by the compiler) and a `model` axis (tensor-parallel sharding of the
wide GNN/edge-MLP weight matrices).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(n_data: int | None = None, n_model: int = 1,
                devices=None) -> Mesh:
    """Build a (data, model) mesh over `devices` (default: all devices).

    With `n_data=None` the data axis absorbs all devices not used by the
    model axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        assert n % n_model == 0, (n, n_model)
        n_data = n // n_model
    want = n_data * n_model
    assert want <= n, (n_data, n_model, n)
    # a mesh smaller than the machine is fine (e.g. dp-only eval on a
    # subset); take the first `want` devices — but say so, because a typo'd
    # config on a real multi-chip machine would otherwise quietly idle the
    # remaining chips (ADVICE r2 #2)
    if want < n:
        import logging
        logging.getLogger("relpose_gnn_tpu").warning(
            "mesh uses %d of %d available devices (data=%d x model=%d); "
            "%d device(s) will sit idle", want, n, n_data, n_model,
            n - want)
    arr = np.asarray(devices[:want]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    """1x1 mesh on the default device (bench / single-chip eval)."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                (DATA_AXIS, MODEL_AXIS))
