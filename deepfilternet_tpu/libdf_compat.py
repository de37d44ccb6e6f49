"""pyDF-compatible API shim (reference: pyDF/src/lib.rs, module `libdf`).

Drop-in equivalents of the reference's Rust-backed Python bindings so code
written against `libdf` ports directly:

    from deepfilternet_tpu.libdf_compat import DF, erb, erb_inv, erb_norm, \
        unit_norm, unit_norm_init
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from deepfilternet_tpu.ops import istft as _istft
from deepfilternet_tpu.ops import stft as _stft
from deepfilternet_tpu.ops.erb import erb_fb_matrices, erb_widths
from deepfilternet_tpu.ops.norms import erb_norm as _erb_norm
from deepfilternet_tpu.ops.norms import unit_norm as _unit_norm
from deepfilternet_tpu.ops.norms import unit_norm_init as _unit_norm_init
from deepfilternet_tpu.ops.stft import Stft, vorbis_window


class DF:
    """pyclass DF equivalent (pyDF/src/lib.rs:14-136).

    Stateless between calls (analysis/synthesis reset by default, matching
    the binding's `reset: Option<bool> = true`).
    """

    def __init__(self, sr: int, fft_size: int, hop_size: int,
                 nb_bands: Optional[int] = None,
                 min_nb_erb_freqs: Optional[int] = None):
        assert hop_size * 2 <= fft_size
        self._cfg = Stft(sr=sr, fft_size=fft_size, hop_size=hop_size)
        self._nb_bands = nb_bands if nb_bands is not None else 32
        self._min_nb_freqs = min_nb_erb_freqs if min_nb_erb_freqs is not None else 1

    def analysis(self, input: np.ndarray, reset: bool = True) -> np.ndarray:
        """[C, T] float32 -> [C, T//hop, F] complex64."""
        return np.asarray(_stft(jnp.asarray(np.atleast_2d(input)), self._cfg))

    def synthesis(self, input: np.ndarray, reset: bool = True) -> np.ndarray:
        """[C, T', F] complex -> [C, T'*hop] float32."""
        return np.asarray(_istft(jnp.asarray(input), self._cfg))

    def erb_widths(self) -> np.ndarray:
        return np.asarray(
            erb_widths(self._cfg.sr, self._cfg.fft_size, self._nb_bands,
                       self._min_nb_freqs),
            np.uint64,
        )

    def fft_window(self) -> np.ndarray:
        return vorbis_window(self._cfg.fft_size)

    def sr(self) -> int:
        return self._cfg.sr

    def fft_size(self) -> int:
        return self._cfg.fft_size

    def hop_size(self) -> int:
        return self._cfg.hop_size

    def nb_erb(self) -> int:
        return self._nb_bands

    def reset(self):
        pass  # stateless between calls


def erb(input: np.ndarray, erb_fb: np.ndarray, db: Optional[bool] = None
        ) -> np.ndarray:
    """Band energies over ERB widths; input complex [..., T, F]
    (pyDF/src/lib.rs:142-192)."""
    widths = tuple(int(w) for w in np.asarray(erb_fb))
    fb = erb_fb_matrices(widths, normalized=True, inverse=False)
    power = np.abs(np.asarray(input)) ** 2
    out = power @ fb
    if db is None or db:
        out = 10.0 * np.log10(out + 1e-10)
    return out.astype(np.float32)


def erb_inv(gains: np.ndarray, erb_fb: np.ndarray) -> np.ndarray:
    widths = tuple(int(w) for w in np.asarray(erb_fb))
    inv = erb_fb_matrices(widths, normalized=True, inverse=True)
    return (np.asarray(gains) @ inv).astype(np.float32)


def erb_norm(erb: np.ndarray, alpha: float,
             state: Optional[np.ndarray] = None) -> np.ndarray:
    """[C, T, E] -> normalized (pyDF/src/lib.rs:252-274)."""
    return np.asarray(_erb_norm(jnp.asarray(erb), alpha,
                                state=None if state is None else jnp.asarray(state)))


def unit_norm(spec: np.ndarray, alpha: float,
              state: Optional[np.ndarray] = None) -> np.ndarray:
    """[C, T, F'] complex -> unit-normalized (pyDF/src/lib.rs:276-298)."""
    return np.asarray(_unit_norm(jnp.asarray(spec), alpha,
                                 state=None if state is None else jnp.asarray(state)))


def unit_norm_init(num_freq_bins: int) -> np.ndarray:
    """Linspace init state [1, F'] (pyDF/src/lib.rs:300-309)."""
    return _unit_norm_init(num_freq_bins)[None, :].copy()
