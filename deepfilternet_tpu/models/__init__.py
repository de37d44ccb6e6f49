"""Model zoo dispatch (reference: df/model.py:9-24).

`init_model(name)` resolves the MODEL config key (default deepfilternet3)
and returns (params, state, cfg, module) where module exposes
`forward`, `streaming_init`, `streaming_cell`, and `ModelParams`.
"""

from __future__ import annotations

import importlib
from typing import Optional

import jax

from deepfilternet_tpu.config import config

_MODEL_MODULES = {
    "deepfilternet3": ("deepfilternet_tpu.models.dfnet3", "init_dfnet3", "ModelParams3"),
    "deepfilternet2": ("deepfilternet_tpu.models.dfnet2", "init_dfnet2", "ModelParams2"),
    "deepfilternet": ("deepfilternet_tpu.models.dfnet1", "init_dfnet1", "ModelParams1"),
    "deepfilternetmf": ("deepfilternet_tpu.models.dfnetmf", "init_dfnetmf", "ModelParamsMF"),
}


def model_module(name: Optional[str] = None):
    name = (name or config("MODEL", default="deepfilternet3", section="train")).lower()
    if name not in _MODEL_MODULES:
        raise ValueError(f"Unknown model {name!r}; available: {sorted(_MODEL_MODULES)}")
    mod_name, init_name, params_name = _MODEL_MODULES[name]
    mod = importlib.import_module(mod_name)
    return mod, getattr(mod, init_name), getattr(mod, params_name)


def init_model(name: Optional[str] = None, seed: int = 42):
    mod, init_fn, _ = model_module(name)
    params, state, cfg = init_fn(jax.random.PRNGKey(seed))
    return params, state, cfg, mod
