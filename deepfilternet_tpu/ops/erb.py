"""ERB (equivalent rectangular bandwidth) filterbank construction.

Semantics match the reference's integer band-width algorithm
(/root/reference/libDF/src/lib.rs:42-100): `nb_bands` bands whose integer
bin widths exactly partition the `fft_size/2+1` rfft bins, with a minimum
number of bins per band enforced and the overflow tracked so later bands
shrink accordingly.

All of this runs at trace time in NumPy — the widths are static Python
ints, and the filterbank is materialized as two dense matrices so that the
band-energy reduction and the band→bin gain broadcast both compile to
single MXU matmuls instead of gather loops.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np

_ERB_SCALE = 9.265
_ERB_Q = 24.7


def freq2erb(freq_hz: float) -> float:
    """Hz -> ERB scale (lib.rs:42-44)."""
    return _ERB_SCALE * math.log1p(freq_hz / (_ERB_Q * _ERB_SCALE))


def erb2freq(n_erb: float) -> float:
    """ERB scale -> Hz (lib.rs:45-47)."""
    return _ERB_Q * _ERB_SCALE * (math.exp(n_erb / _ERB_SCALE) - 1.0)


@lru_cache(maxsize=None)
def erb_widths(sr: int, fft_size: int, nb_bands: int, min_nb_freqs: int) -> Tuple[int, ...]:
    """Integer bin width per ERB band; widths sum to fft_size//2+1.

    Exact re-derivation of erb_fb (lib.rs:68-100): bands are equally spaced
    on the ERB scale between 0 Hz and Nyquist; each band's nominal upper
    bin is `round(f / bin_width)`; a band narrower than `min_nb_freqs` is
    widened and the surplus is deducted from subsequent bands; the final
    band absorbs the +1 bin for the Nyquist bin and any accumulated excess.
    """
    nyq_freq = sr / 2
    freq_width = sr / fft_size
    erb_low = freq2erb(0.0)
    erb_high = freq2erb(nyq_freq)
    widths = np.zeros(nb_bands, dtype=np.int64)
    step = (erb_high - erb_low) / nb_bands
    prev_freq = 0
    freq_over = 0
    for i in range(1, nb_bands + 1):
        f = erb2freq(erb_low + i * step)
        fb = int(round(f / freq_width))
        nb_freqs = fb - prev_freq - freq_over
        if nb_freqs < min_nb_freqs:
            freq_over = min_nb_freqs - nb_freqs
            nb_freqs = min_nb_freqs
        else:
            freq_over = 0
        widths[i - 1] = nb_freqs
        prev_freq = fb
    widths[nb_bands - 1] += 1
    too_large = int(widths.sum()) - (fft_size // 2 + 1)
    if too_large > 0:
        widths[nb_bands - 1] -= too_large
    assert int(widths.sum()) == fft_size // 2 + 1, "ERB widths must cover all rfft bins"
    return tuple(int(w) for w in widths)


@lru_cache(maxsize=None)
def _erb_fb_matrices_cached(
    widths: Tuple[int, ...], normalized: bool, inverse: bool
) -> np.ndarray:
    """Dense [n_freqs, nb_bands] (fwd) or [nb_bands, n_freqs] (inverse) matrix.

    Mirrors df/modules.py:206-223: the forward matrix averages the power of
    the bins of each band when `normalized` (each column sums to 1/width per
    entry); the inverse matrix broadcasts per-band gains back to bins (all
    ones when `normalized`, else row-normalized).
    """
    n_freqs = int(sum(widths))
    nb_bands = len(widths)
    fb = np.zeros((n_freqs, nb_bands), dtype=np.float32)
    start = 0
    for i, w in enumerate(widths):
        fb[start : start + w, i] = 1.0
        start += w
    if inverse:
        fb = fb.T.copy()
        if not normalized:
            fb /= fb.sum(axis=1, keepdims=True)
    else:
        if normalized:
            fb /= fb.sum(axis=0, keepdims=True)
    return fb


def erb_fb_matrices(
    widths: Sequence[int], normalized: bool = True, inverse: bool = False
) -> np.ndarray:
    return _erb_fb_matrices_cached(tuple(int(w) for w in widths), normalized, inverse)
