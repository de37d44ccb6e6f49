"""Feature extraction frontend: ERB band energies and normalized complex bins.

Matches DFState::feat_erb / feat_cplx (/root/reference/libDF/src/lib.rs:
206-221): per-band mean power via the normalized ERB filterbank, dB scale
``10*log10(x + 1e-10)``, exponential mean norm; and the low-frequency
complex bins divided by the square root of an exponential magnitude track.

The band-energy reduction is a [*, F] x [F, E] matmul on the MXU; norms use
the parallel scan in `norms.py`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from deepfilternet_tpu.ops.erb import erb_fb_matrices
from deepfilternet_tpu.ops.norms import erb_norm, unit_norm


def erb_band_energies(spec: jnp.ndarray, widths, db: bool = True) -> jnp.ndarray:
    """[..., F] complex -> [..., E] mean band power (optionally dB).

    compute_band_corr (lib.rs:280-295) with x == p reduces to mean |x|^2
    per band, i.e. a matmul with the column-normalized ERB matrix.
    """
    fb = jnp.asarray(erb_fb_matrices(widths, normalized=True, inverse=False))
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    e = power @ fb
    if db:
        e = 10.0 * jnp.log10(e + 1e-10)
    return e


def erb_feat(
    spec: jnp.ndarray,
    widths,
    alpha: float,
    state: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full ERB feature path: band dB energies + exponential mean norm.

    spec: [..., T, F] complex -> [..., T, E] float32.
    """
    e = erb_band_energies(spec, widths, db=True)
    return erb_norm(e, alpha, state=state).astype(jnp.float32)


def spec_feat(
    spec: jnp.ndarray,
    nb_df: int,
    alpha: float,
    state: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Unit-normalized complex features over the first nb_df bins.

    spec: [..., T, F] complex -> [..., T, nb_df] complex64.
    """
    return unit_norm(spec[..., :nb_df], alpha, state=state).astype(jnp.complex64)


def apply_interp_band_gain(
    spec: jnp.ndarray, gains: jnp.ndarray, widths
) -> jnp.ndarray:
    """Broadcast per-band gains to bins and multiply (lib.rs:314-326).

    spec: [..., F] complex; gains: [..., E] real.
    """
    inv = jnp.asarray(erb_fb_matrices(widths, normalized=True, inverse=True))
    bin_gains = gains @ inv  # [..., F]
    return spec * bin_gains.astype(jnp.float32)
