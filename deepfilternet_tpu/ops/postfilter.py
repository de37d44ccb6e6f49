"""Valin-style perceptual post-filter.

Reference: libDF/src/lib.rs:446-471 (spectral form over enhanced vs noisy
spectra) and df/modules.py:240-249 / deepfilternet3.py:448-454 (mask form).
Slightly over-attenuates noisy bins:

    g      = clamp(|e| / |x|, eps, 1)
    g_sin  = g * sin(pi * g / 2)
    pf     = (1 + beta) / (1 + beta * (g / g_sin)^2)
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.1415926535897932384626433


def post_filter(
    noisy: jnp.ndarray, enhanced: jnp.ndarray, beta: float = 0.02, eps: float = 1e-12
) -> jnp.ndarray:
    """Spectral post-filter applied to `enhanced` given the noisy reference.

    Matches post_filter (lib.rs:446-471): per-bin gain ratio, clamped to
    [eps, 1]; returns the filtered enhanced spectrum.
    """
    g = jnp.clip(jnp.abs(enhanced) / (jnp.abs(noisy) + eps), eps, 1.0)
    g_sin = g * jnp.sin(g * (PI / 2.0))
    pf = (1.0 + beta) / (1.0 + beta * (g / g_sin) ** 2)
    return enhanced * pf.astype(jnp.float32)


def post_filter_mask(mask: jnp.ndarray, beta: float = 0.02, eps: float = 1e-12) -> jnp.ndarray:
    """Mask-domain variant (df/modules.py:240-249), used by Mask.pf."""
    mask_sin = mask * jnp.sin(PI * mask / 2.0)
    return (1.0 + beta) * mask / (1.0 + beta * (mask / jnp.clip(mask_sin, eps)) ** 2)
