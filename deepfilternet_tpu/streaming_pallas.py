"""PallasStreamingRuntime: the whole-cell-kernel streaming runtime.

Drop-in alternative to StreamingRuntime for DFN3-family models that runs
the entire per-frame pipeline as one Pallas TPU program looping frames
internally (ops/pallas_cell.py). Same public API and carry type
(StreamCarry), same streaming semantics (fft-hop delay, silence skip,
RuntimeParams atten-lim / post-filter / LSNR gating).

Unsupported RuntimeParams (multichannel mask reduction) raise at
construction — use StreamingRuntime for those.

STATUS (r04): FROZEN as a benchmark artifact. The kernel is the measured
floor proof that removing XLA's dispatch boundaries buys nothing at
S=4096 (53.7k vs the shipped scan's 62.5k; PERF.md "Whole-cell Pallas
kernel sweep") and the home of the Mosaic lowering lore recorded there.
It keeps working (`BENCH_RUNTIME=pallas|xcell`) and its parity tests
stay as rot guards, but future cell changes are NOT obliged to keep it
in sync — demote its tests with a PERF.md note instead.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from deepfilternet_tpu.ops.pallas_cell import (
    BLK,
    CKEYS,
    build_cell_weights,
    cell_process,
    cell_process_xla,
)
from deepfilternet_tpu.streaming import RuntimeParams, StreamCarry, StreamingRuntime


def carry_to_flat(carry: StreamCarry) -> Dict[str, jnp.ndarray]:
    """StreamCarry -> the kernel's flat {name: [S, d]} f32 dict."""
    m = carry.model
    s = carry.analysis_mem.shape[0]

    def f32(x):
        return x.astype(jnp.float32)

    sil = jnp.zeros((s, 8), jnp.float32)
    sil = sil.at[:, 0].set(carry.silence_ctr.astype(jnp.float32))
    return {
        "amem": f32(carry.analysis_mem),
        "smem": f32(carry.synthesis_mem),
        "norms": f32(jnp.concatenate([carry.mean_norm, carry.unit_norm], -1)),
        "sil": sil,
        "erb_ctx": f32(m.erb_buf.reshape(s, -1)),
        "spec_ctx": f32(m.spec_buf.reshape(s, -1)),
        "enc_h": f32(m.enc_gru_h[0]),
        "dec_h": f32(m.dec_gru_h[0]),
        "df_h": f32(jnp.moveaxis(m.df_gru_h, 0, 1).reshape(s, -1)),
        # ring frames are padded to BLK lanes for 128-aligned kernel slices
        "ring_re": f32(
            jnp.pad(m.df_ring_re, ((0, 0), (0, 0),
                                   (0, BLK - m.df_ring_re.shape[-1])))
        ).reshape(s, -1),
        "ring_im": f32(
            jnp.pad(m.df_ring_im, ((0, 0), (0, 0),
                                   (0, BLK - m.df_ring_im.shape[-1])))
        ).reshape(s, -1),
    }


def flat_to_carry(flat: Dict[str, jnp.ndarray], like: StreamCarry) -> StreamCarry:
    """Inverse of carry_to_flat, shaped/dtyped like `like`."""
    m = like.model
    s = flat["amem"].shape[0]
    nb_erb = like.mean_norm.shape[-1]
    new_model = m._replace(
        erb_buf=flat["erb_ctx"].reshape(m.erb_buf.shape).astype(m.erb_buf.dtype),
        spec_buf=flat["spec_ctx"].reshape(m.spec_buf.shape).astype(m.spec_buf.dtype),
        enc_gru_h=flat["enc_h"][None].astype(m.enc_gru_h.dtype),
        dec_gru_h=flat["dec_h"][None].astype(m.dec_gru_h.dtype),
        df_gru_h=jnp.moveaxis(
            flat["df_h"].reshape(s, m.df_gru_h.shape[0], -1), 1, 0
        ).astype(m.df_gru_h.dtype),
        df_ring_re=flat["ring_re"].reshape(s, -1, BLK)[..., : m.df_ring_re.shape[-1]],
        df_ring_im=flat["ring_im"].reshape(s, -1, BLK)[..., : m.df_ring_im.shape[-1]],
    )
    return StreamCarry(
        analysis_mem=flat["amem"],
        synthesis_mem=flat["smem"],
        mean_norm=flat["norms"][:, :nb_erb],
        unit_norm=flat["norms"][:, nb_erb:],
        silence_ctr=flat["sil"][:, 0].astype(jnp.int32),
        model=new_model,
    )


def _largest_divisor_leq(n: int, k: int) -> int:
    for d in range(min(n, k), 0, -1):
        if n % d == 0:
            return d
    return 1


def _mosaic_layout(s: int, s_blk: int, n_frames: int, chunk: int,
                   t_major: bool) -> Tuple[int, bool]:
    """Adjust (s_blk, t_major) to satisfy the Mosaic block-shape rule.

    The last two dims of every block must be multiples of (8, 128) or
    equal the full array dims. s-major audio blocks [s_blk, chunk, hop]
    put chunk second-minor (so chunk % 8 == 0 unless chunk == n_frames);
    t-major blocks [chunk, s_blk, hop] put s_blk there instead.
    Auto-shrunk chunks (process_frame, odd frame counts) flip to
    t-major, and an odd stream block widens to the full stream dim.
    """
    if not t_major and chunk % 8 != 0 and chunk != n_frames:
        t_major = True
    if t_major and s_blk % 8 != 0 and s_blk != s:
        s_blk = s
    return s_blk, t_major


@functools.partial(
    jax.jit,
    static_argnames=("statics", "s_blk", "chunk", "mdtype", "interpret",
                     "t_major", "backend"),
)
def _process_jit(audio, carry: StreamCarry, weights, statics, s_blk, chunk,
                 mdtype, interpret, t_major, backend="pallas"):
    """One fused dispatch for the whole call: StreamCarry -> flat layout ->
    whole-cell kernel -> StreamCarry. Keeping the layout shuffles inside
    the jit matters: run eagerly they are ~30 separate device dispatches
    per call, which costs more than the kernel itself."""
    flat = carry_to_flat(carry)
    if backend == "xla":
        new_flat, out = cell_process_xla(
            audio, flat, weights, statics, chunk, mdtype=mdtype,
        )
    else:
        new_flat, out = cell_process(
            audio, flat, weights, statics, s_blk, chunk,
            mdtype=mdtype, interpret=interpret, t_major=t_major,
        )
    return flat_to_carry(new_flat, carry), out


class PallasStreamingRuntime(StreamingRuntime):
    """StreamingRuntime running the fused whole-cell Pallas kernel.

    matmul_dtype: dtype of the MXU matmul operands (weights + casts);
        carried state stays f32. bfloat16 matches XLA's default TPU
        matmul precision.
    s_blk / chunk: kernel grid tile sizes (streams per block, frames per
        chunk). Shrunk automatically for small inputs.
    interpret: run the kernel in the Pallas interpreter (CPU tests).
    """

    def __init__(self, model, df_state, params: RuntimeParams = RuntimeParams(),
                 matmul_dtype=jnp.bfloat16, s_blk: int = 128, chunk: int = 8,
                 interpret: bool = False, ablate: str = "",
                 t_major: bool = False, backend: str = "pallas"):
        if backend not in ("pallas", "xla"):
            raise ValueError(f"backend must be 'pallas' or 'xla', got {backend!r}")
        if params.reduce_mask != "none" and params.n_channels > 1:
            raise NotImplementedError(
                "multichannel mask reduction is not supported by the pallas "
                "runtime; use StreamingRuntime"
            )
        super().__init__(model, df_state, params, dtype=jnp.float32)
        self.matmul_dtype = matmul_dtype
        self.s_blk = s_blk
        self.chunk = chunk
        self.interpret = interpret
        self.t_major = t_major
        self.backend = backend
        self.weights, self.statics = build_cell_weights(
            self.model, df_state, params, matmul_dtype, cfg=self.cfg
        )
        if ablate:  # perf-ablation kernels; never for real output
            self.statics = self.statics._replace(ablate=ablate)

    def process(self, carry: StreamCarry, audio: jnp.ndarray
                ) -> Tuple[StreamCarry, jnp.ndarray]:
        hop = self.stft_cfg.hop_size
        s, t = audio.shape
        assert t % hop == 0, "process() needs whole hops"
        n_frames = t // hop
        s_blk = self.s_blk if s % self.s_blk == 0 else _largest_divisor_leq(s, self.s_blk)
        chunk = _largest_divisor_leq(n_frames, self.chunk)
        t_major = self.t_major
        if self.backend != "xla" and not self.interpret:
            s_blk, t_major = _mosaic_layout(s, s_blk, n_frames, chunk, t_major)
        return _process_jit(
            jnp.asarray(audio, jnp.float32), carry, self.weights, self.statics,
            s_blk, chunk, self.matmul_dtype, self.interpret, t_major,
            self.backend,
        )

    def process_frame(self, carry: StreamCarry, frame: jnp.ndarray):
        return self.process(carry, frame)
