"""Deep filtering: complex multi-frame MAC over the low-frequency bins.

Reference: df/multiframe.py:40-181 and tract.rs:724-767. The enhanced bin is

    y[t, f] = sum_n  x[t - (N-1-lookahead) + n, f] * c[n, t, f]

for the first `nb_df` bins (N = df_order); upper bins keep the ERB gain-
masked values. Offline we build the N time shifts as a stacked tensor (a
static roll, no gather) and contract with the coefficients on the VPU;
streaming keeps an N-frame ring buffer in the scan carry.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _shift_time(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """x delayed by `shift` frames along `axis` with zero padding (shift>=0
    delays: out[t] = x[t-shift])."""
    if shift == 0:
        return x
    pad = [(0, 0)] * x.ndim
    if shift > 0:
        pad[axis] = (shift, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, x.shape[axis])
        return jnp.pad(x, pad)[tuple(sl)]
    else:
        pad[axis] = (0, -shift)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(-shift, x.shape[axis] - shift)
        return jnp.pad(x, pad)[tuple(sl)]


def spec_unfold(spec: jnp.ndarray, order: int, lookahead: int = 0, time_axis: int = -2
                ) -> jnp.ndarray:
    """[..., T, F] -> [..., T, F, N]: frame t, tap n = spec[t - (N-1-la) + n]."""
    axis = time_axis % spec.ndim
    taps = [
        _shift_time(spec, order - 1 - lookahead - n, axis) for n in range(order)
    ]
    return jnp.stack(taps, axis=-1)


def deep_filter_offline(
    spec: jnp.ndarray,
    coefs: jnp.ndarray,
    nb_df: int,
    lookahead: int = 0,
) -> jnp.ndarray:
    """Apply DF coefficients offline.

    spec: [..., T, F] complex (full band).
    coefs: [..., N, T, F'] complex with F' == nb_df.
    Returns spec with the first nb_df bins replaced by the filtered output.
    """
    order = coefs.shape[-3]
    low = spec[..., :nb_df]
    un = spec_unfold(low, order, lookahead, time_axis=-2)  # [..., T, F', N]
    coefs_t = jnp.moveaxis(coefs, -3, -1)  # [..., T, F', N]
    y = jnp.sum(un * coefs_t, axis=-1)
    return jnp.concatenate([y, spec[..., nb_df:]], axis=-1)


def deep_filter(
    ring: jnp.ndarray, spec_lo: jnp.ndarray, coefs: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming DF step with ring buffer (tract.rs:724-767 semantics,
    lookahead 0: the newest frame is the current one).

    ring: [..., N-1, F'] previous low-band frames (oldest first).
    spec_lo: [..., F'] current frame's low bins.
    coefs: [..., N, F'] complex filter for this frame.
    Returns (new_ring, filtered [..., F']).
    """
    buf = jnp.concatenate([ring, spec_lo[..., None, :]], axis=-2)  # [..., N, F']
    y = jnp.sum(buf * coefs, axis=-2)
    new_ring = buf[..., 1:, :]
    return new_ring, y
