"""Exponential mean/unit normalization of features.

Reference semantics (/root/reference/libDF/src/lib.rs:12-13, 184-204,
234-278): per-band first-order IIR trackers

    s_t = (1 - alpha) * x_t + alpha * s_{t-1}

with mean-norm output ``(x_t - s_t) / 40`` over ERB bands (state
initialized linspace(-60, -90) dB) and unit-norm output ``x_t / sqrt(s_t)``
over the complex DF bins with ``x_t = |spec_t|`` (state initialized
linspace(1e-3, 1e-4)).

TPU-first formulation: the recurrence is a linear first-order scan, which we
evaluate in O(log T) depth with `jax.lax.associative_scan` over the
composition ``(a2, b2) ∘ (a1, b1) = (a1*a2, a2*b1 + b2)`` — no sequential
per-frame loop on the offline path. The streaming path carries `s` in the
scan cell (`*_step` functions).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MEAN_NORM_INIT = (-60.0, -90.0)
UNIT_NORM_INIT = (1e-3, 1e-4)


def get_norm_alpha(sr: int, hop_size: int, tau: float) -> float:
    """Decay factor for a given time constant, rounded below 1.0.

    Mirrors df/utils.py:111-127 / tract.rs:989-999: round at increasing
    precision until the value is strictly < 1.0.
    """
    a_ = math.exp(-(hop_size / sr) / tau)
    precision = 3
    a = 1.0
    while a >= 1.0:
        a = round(a_, precision)
        precision += 1
    return a


@lru_cache(maxsize=None)
def mean_norm_init(nb_erb: int) -> np.ndarray:
    return np.linspace(MEAN_NORM_INIT[0], MEAN_NORM_INIT[1], nb_erb, dtype=np.float32)


@lru_cache(maxsize=None)
def unit_norm_init(nb_freqs: int) -> np.ndarray:
    return np.linspace(UNIT_NORM_INIT[0], UNIT_NORM_INIT[1], nb_freqs, dtype=np.float32)


def _ema_scan(x: jnp.ndarray, s0: jnp.ndarray, alpha: float, axis: int) -> jnp.ndarray:
    """All states s_t of ``s_t = alpha*s_{t-1} + (1-alpha)*x_t`` along `axis`.

    Parallel prefix (associative_scan): element t is represented by the
    affine map ``s -> a_t * s + b_t`` with a_t = alpha, b_t = (1-alpha)x_t,
    composed left-to-right, then applied to s0.
    """
    a = jnp.full_like(x, alpha)
    b = (1.0 - alpha) * x

    def compose(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    aa, bb = jax.lax.associative_scan(compose, (a, b), axis=axis)
    s0e = jnp.expand_dims(s0, axis=axis) if s0.ndim < x.ndim else s0
    return aa * s0e + bb


def erb_norm(
    erb_feats: jnp.ndarray, alpha: float, state: jnp.ndarray | None = None, axis: int = -2
) -> jnp.ndarray:
    """Mean-normalize dB-scale ERB features over time.

    erb_feats: [..., T, E]; state: [..., E] (default linspace init).
    Returns (x - s) / 40 with s the exponential mean track.
    """
    e = erb_feats.shape[-1]
    if state is None:
        state = jnp.broadcast_to(
            jnp.asarray(mean_norm_init(e)), erb_feats.shape[:-2] + (e,)
        )
    s = _ema_scan(erb_feats, state, alpha, axis=axis)
    return (erb_feats - s) / 40.0


def unit_norm(
    spec: jnp.ndarray, alpha: float, state: jnp.ndarray | None = None, axis: int = -2
) -> jnp.ndarray:
    """Unit-normalize a complex spectrogram slice over time.

    spec: [..., T, F'] complex; state: [..., F'].
    Returns spec / sqrt(s) with s tracking |spec|.
    """
    f = spec.shape[-1]
    if state is None:
        state = jnp.broadcast_to(jnp.asarray(unit_norm_init(f)), spec.shape[:-2] + (f,))
    mag = jnp.abs(spec)
    s = _ema_scan(mag, state, alpha, axis=axis)
    return spec / jnp.sqrt(s).astype(spec.dtype if not jnp.iscomplexobj(spec) else jnp.float32)


# -- streaming cells ---------------------------------------------------------


def erb_norm_step(
    state: jnp.ndarray, x: jnp.ndarray, alpha: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One frame of band_mean_norm_erb (lib.rs:244-251). x,state: [..., E]."""
    s = x * (1.0 - alpha) + state * alpha
    return s, (x - s) / 40.0


def unit_norm_step(
    state: jnp.ndarray, x: jnp.ndarray, alpha: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One frame of band_unit_norm (lib.rs:253-260). x complex [..., F']."""
    s = jnp.abs(x) * (1.0 - alpha) + state * alpha
    return s, x / jnp.sqrt(s)
