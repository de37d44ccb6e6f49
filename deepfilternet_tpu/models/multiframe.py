"""Multi-frame filtering ops: DF, CRM, multi-frame Wiener filter, MVDR.

Reference: df/multiframe.py:40-452. All functions operate on complex
spectrogram tensors [B, T, F] (time-major inside the model) and N-tap
frame windows built with `ops.df_op.spec_unfold`. The MfWf/MfMvdr weight
solves are batched N x N complex linear systems (N = df_order, typically
5) — tiny per-bin solves that XLA batches efficiently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deepfilternet_tpu.ops.df_op import spec_unfold


def psd(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Correlation matrices over an N-frame window (multiframe.py:110-122).

    x: [..., T, F] complex -> Rxx [..., T, F, N, N] with
    Rxx[m, n] = x_n * conj(x_m) summed over nothing (instantaneous outer
    product of the unfolded frame vector).
    """
    xw = spec_unfold(x, n, lookahead=0, time_axis=-2)  # [..., T, F, N]
    return jnp.einsum("...n,...m->...mn", xw, jnp.conj(xw))


def crm(spec: jnp.ndarray, coefs: jnp.ndarray) -> jnp.ndarray:
    """Complex ratio mask (multiframe.py:210-218): elementwise multiply."""
    return spec * coefs


def _tik_reg(mat: jnp.ndarray, reg: float = 1e-7, eps: float = 1e-8) -> jnp.ndarray:
    """Tikhonov regularization on the diagonal (multiframe.py:436-452)."""
    c = mat.shape[-1]
    eye = jnp.eye(c, dtype=mat.dtype)
    trace = jnp.real(jnp.trace(mat, axis1=-2, axis2=-1))[..., None, None]
    return mat + (trace * reg + eps) * eye


def _enforce_hermitian(r: jnp.ndarray) -> jnp.ndarray:
    """Zero imaginary diagonal, mirror lower triangle conj into upper."""
    lower = jnp.tril(r, k=-1)
    diag = jnp.real(jnp.diagonal(r, axis1=-2, axis2=-1))  # [..., N]
    eye = jnp.eye(r.shape[-1], dtype=r.dtype)
    return lower + jnp.swapaxes(jnp.conj(lower), -1, -2) + diag[..., None, :] * eye


def _prep_cov(
    r: jnp.ndarray,
    cholesky_decomp: bool,
    inverse: bool,
    enforce_constraints: bool,
) -> jnp.ndarray:
    if cholesky_decomp:
        if enforce_constraints:
            r = jnp.tril(r)  # upper triangle (excl. diagonal) must be zero
        r = r @ jnp.swapaxes(jnp.conj(r), -1, -2)
    elif enforce_constraints and not inverse:
        r = _enforce_hermitian(r)
    return r


def _mf_weights(
    r: jnp.ndarray, ifc: jnp.ndarray, inverse: bool, dload: float, eps: float
) -> jnp.ndarray:
    """w = R^-1 ifc (solve) or R_inv @ ifc (estimated inverse input)."""
    if not inverse:
        r = _tik_reg(r, dload, eps)
        return jnp.linalg.solve(r, ifc[..., None])[..., 0]
    return jnp.einsum("...nm,...m->...n", r, ifc)


def mf_wf(
    spec: jnp.ndarray,
    ifc: jnp.ndarray,
    r: jnp.ndarray,
    nb_df: int,
    order: int,
    lookahead: int = 0,
    cholesky_decomp: bool = False,
    inverse: bool = True,
    enforce_constraints: bool = True,
    eps: float = 1e-8,
    dload: float = 1e-7,
) -> jnp.ndarray:
    """Multi-frame Wiener filter (multiframe.py:221-314).

    spec: [B, T, F] complex; ifc: [B, T, F', N] complex speech inter-frame
    correlation; r: [B, T, F', N, N] complex (inverse) noisy covariance (or
    its cholesky factor). Returns spec with the first nb_df bins filtered.
    """
    r = _prep_cov(r, cholesky_decomp, inverse, enforce_constraints)
    w = _mf_weights(r, ifc, inverse, dload, eps)  # [B, T, F', N]
    un = spec_unfold(spec[..., :nb_df], order, lookahead, time_axis=-2)  # [B,T,F',N]
    y = jnp.sum(un * w, axis=-1)
    return jnp.concatenate([y, spec[..., nb_df:]], axis=-1)


def mf_mvdr(
    spec: jnp.ndarray,
    ifc: jnp.ndarray,
    r: jnp.ndarray,
    nb_df: int,
    order: int,
    lookahead: int = 0,
    cholesky_decomp: bool = False,
    inverse: bool = True,
    enforce_constraints: bool = True,
    eps: float = 1e-8,
    dload: float = 1e-7,
) -> jnp.ndarray:
    """Multi-frame MVDR beamformer (multiframe.py:317-413).

    Same I/O as mf_wf but r is the (inverse) *noise* covariance; weights
    are normalized by the distortionless constraint with the last IFC tap
    as steering reference.
    """
    r = _prep_cov(r, cholesky_decomp, inverse, enforce_constraints)
    numerator = _mf_weights(r, ifc, inverse, dload, eps)  # [B,T,F',N]
    denominator = jnp.einsum("...n,...n->...", jnp.conj(ifc), numerator)
    scale = jnp.conj(ifc[..., -1:])
    w = numerator * scale / (jnp.real(denominator)[..., None] + eps)
    un = spec_unfold(spec[..., :nb_df], order, lookahead, time_axis=-2)
    y = jnp.sum(un * w, axis=-1)
    return jnp.concatenate([y, spec[..., nb_df:]], axis=-1)


def wf_r_factor(inverse: bool, cholesky_decomp: bool) -> float:
    """Normalization factor for network-estimated covariances (MfWf)."""
    return {(True, True): 2e3, (True, False): 3e7,
            (False, True): 2e-4, (False, False): 5e-6}[(inverse, cholesky_decomp)]


def mvdr_r_factor(inverse: bool, cholesky_decomp: bool) -> float:
    return {(True, True): 2e4, (True, False): 3e8,
            (False, True): 5e-5, (False, False): 1e-6}[(inverse, cholesky_decomp)]
