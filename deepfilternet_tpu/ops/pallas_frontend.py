"""Pallas TPU kernel: fused streaming analysis frontend.

One VMEM-resident kernel per frame computing, for a tile of streams:

    buf      = [analysis_mem | frame]                  (concat)
    spec     = buf @ windowed-DFT (re, im)             (MXU)
    power    = re^2 + im^2                             (VPU)
    erb      = 10*log10(power @ erb_fb + 1e-10)        (MXU + VPU)
    mean_s'  = (1-a)*erb + a*mean_s                    (VPU)
    feat_erb = (erb - mean_s') / 40
    unit_s'  = (1-a)*sqrt(power_lo) + a*unit_s
    feat_c   = spec_lo * rsqrt(unit_s')

replacing the chain of 8 XLA ops in the scan cell (lib.rs:206-221 +
frame_analysis semantics). The jnp implementation in streaming.py is the
numerics oracle; `fused_analysis_frontend` matches it to ~1e-5 and can be
dropped into the streaming cell via StreamingRuntime(use_pallas=True).

The DF-bin padding: nb_df=96 is padded to 128 lanes inside the kernel
outputs to satisfy TPU tiling; callers slice.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfilternet_tpu.ops.erb import erb_fb_matrices, erb_widths
from deepfilternet_tpu.ops.stft import dft_matrices


def _kernel(
    mem_ref,        # [Ts, D]   analysis memory (fft - hop)
    frame_ref,      # [Ts, H]   new hop
    mean_ref,       # [Ts, E]
    unit_ref,       # [Ts, Fp]  (padded to 128)
    cos_ref,        # [N, F]
    sin_ref,        # [N, F]
    fb_ref,         # [F, E]
    # outputs
    newmem_ref,     # [Ts, D]
    re_ref,         # [Ts, F]
    im_ref,         # [Ts, F]
    fe_ref,         # [Ts, E]
    fc_re_ref,      # [Ts, Fp]
    fc_im_ref,      # [Ts, Fp]
    newmean_ref,    # [Ts, E]
    newunit_ref,    # [Ts, Fp]
    *,
    alpha: float,
    nb_df: int,
):
    buf = jnp.concatenate([mem_ref[:], frame_ref[:]], axis=-1)  # [Ts, N]
    re = jnp.dot(buf, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(buf, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    erb = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    erb_db = 10.0 * jnp.log10(erb + 1e-10)
    mean_s = erb_db * (1.0 - alpha) + mean_ref[:] * alpha
    fe = (erb_db - mean_s) / 40.0

    fp = unit_ref.shape[-1]
    power_lo = power[:, :fp]
    mag_lo = jnp.sqrt(power_lo)
    unit_s = mag_lo * (1.0 - alpha) + unit_ref[:] * alpha
    scale = jax.lax.rsqrt(unit_s)

    hop = frame_ref.shape[-1]
    newmem_ref[:] = buf[:, hop:]
    re_ref[:] = re
    im_ref[:] = im
    fe_ref[:] = fe
    fc_re_ref[:] = re[:, :fp] * scale
    fc_im_ref[:] = im[:, :fp] * scale
    newmean_ref[:] = mean_s
    newunit_ref[:] = unit_s


@functools.partial(
    jax.jit, static_argnames=("fft_size", "hop_size", "nb_erb", "nb_df",
                              "min_nb_erb_freqs", "alpha", "tile")
)
def fused_analysis_frontend(
    analysis_mem: jnp.ndarray,  # [S, fft-hop]
    frame: jnp.ndarray,         # [S, hop]
    mean_state: jnp.ndarray,    # [S, E]
    unit_state: jnp.ndarray,    # [S, F']
    *,
    fft_size: int = 960,
    hop_size: int = 480,
    nb_erb: int = 32,
    nb_df: int = 96,
    min_nb_erb_freqs: int = 2,
    alpha: float = 0.99,
    tile: int = 256,
):
    """Returns (new_mem, spec_re, spec_im, feat_erb, fc_re, fc_im,
    new_mean_state, new_unit_state)."""
    s = analysis_mem.shape[0]
    d = fft_size - hop_size
    f = fft_size // 2 + 1
    cos_m, sin_m = dft_matrices(fft_size, hop_size)
    widths = erb_widths(48000, fft_size, nb_erb, min_nb_erb_freqs)
    fb = erb_fb_matrices(widths, normalized=True, inverse=False)

    tile = min(tile, s)
    assert s % tile == 0, f"streams {s} must be divisible by tile {tile}"
    grid = (s // tile,)

    def row_spec(cols):
        return pl.BlockSpec((tile, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((s, d), jnp.float32),       # new mem
        jax.ShapeDtypeStruct((s, f), jnp.float32),       # re
        jax.ShapeDtypeStruct((s, f), jnp.float32),       # im
        jax.ShapeDtypeStruct((s, nb_erb), jnp.float32),  # feat erb
        jax.ShapeDtypeStruct((s, nb_df), jnp.float32),   # fc re
        jax.ShapeDtypeStruct((s, nb_df), jnp.float32),   # fc im
        jax.ShapeDtypeStruct((s, nb_erb), jnp.float32),  # new mean
        jax.ShapeDtypeStruct((s, nb_df), jnp.float32),   # new unit
    )
    kernel = functools.partial(_kernel, alpha=alpha, nb_df=nb_df)
    interpret = jax.devices()[0].platform not in ("tpu",)
    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            row_spec(d),
            row_spec(hop_size),
            row_spec(nb_erb),
            row_spec(nb_df),
            full_spec(fft_size, f),
            full_spec(fft_size, f),
            full_spec(f, nb_erb),
        ],
        out_specs=(
            row_spec(d),
            row_spec(f),
            row_spec(f),
            row_spec(nb_erb),
            row_spec(nb_df),
            row_spec(nb_df),
            row_spec(nb_erb),
            row_spec(nb_df),
        ),
        out_shape=out_shapes,
    )(
        analysis_mem, frame, mean_state, unit_state,
        jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(fb),
    )
