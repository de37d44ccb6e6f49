"""Seeding utilities (reference: df/utils.py check_manual_seed + util.rs).

A process-global seed gate mirroring the reference's "RNG errors unless
seeded" discipline (util.rs:55-62): call `seed_everything` once; helpers
derive deterministic per-purpose generators from it.
"""

from __future__ import annotations

import random
from typing import Optional

import numpy as np

_GLOBAL_SEED: Optional[int] = None


def seed_everything(seed: int) -> int:
    global _GLOBAL_SEED
    _GLOBAL_SEED = int(seed)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return seed


def get_seed() -> int:
    if _GLOBAL_SEED is None:
        raise RuntimeError("seed_everything() must be called before using seeded RNGs")
    return _GLOBAL_SEED


def derive_rng(*stream: int) -> np.random.Generator:
    """Deterministic generator for a given purpose tuple."""
    return np.random.default_rng([get_seed(), *stream])


def jax_key(*stream: int):
    import jax

    key = jax.random.PRNGKey(get_seed())
    for s in stream:
        key = jax.random.fold_in(key, s)
    return key
