"""Streaming inference runtime: the TPU-native DfTract equivalent.

The reference streams one 10 ms hop at a time through a Rust/tract pulsed
model (tract.rs:509-642). Here the whole per-frame pipeline — STFT
analysis, ERB/complex feature extraction with exponential norms, the DFN
streaming cell, deep filtering, post-filter, ISTFT synthesis — is one scan
cell compiled to a single XLA while-loop, vectorized over a batch of
independent streams (the aggregate-RTF north star: throughput scales by
stacking streams on the `data` mesh axis, with zero cross-chip traffic).

API:
    rt = StreamingRuntime(model, df_state)       # from enhance.init_df
    carry = rt.init(n_streams)
    carry, enhanced = rt.process(carry, audio)   # audio [S, k*hop]
    carry, frame = rt.process_frame(carry, f)    # single hop (low-latency)
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from deepfilternet_tpu.config import config
from deepfilternet_tpu.ops import get_norm_alpha
from deepfilternet_tpu.ops.erb import erb_fb_matrices
from deepfilternet_tpu.ops.norms import (
    erb_norm_step,
    mean_norm_init,
    unit_norm_init,
)
from deepfilternet_tpu.ops.stft import (
    Stft,
    analysis_step_ri,
    synthesis_step_ri,
)


class StreamCarry(NamedTuple):
    analysis_mem: jnp.ndarray  # [S, fft-hop]
    synthesis_mem: jnp.ndarray  # [S, fft-hop]
    mean_norm: jnp.ndarray  # [S, E]
    unit_norm: jnp.ndarray  # [S, F']
    silence_ctr: jnp.ndarray  # [S] consecutive sub-threshold frames
    model: Any  # model StreamState


class RuntimeParams(NamedTuple):
    """Streaming runtime knobs (tract.rs:94-193 RuntimeParams parity)."""

    atten_lim_db: float = 0.0          # 0 disables the mixback limit
    post_filter_beta: float = 0.0      # >0 enables the Valin post-filter
    lsnr_min: float = -10.0            # below: output silenced (skip stages)
    lsnr_max_erb: float = 30.0         # above: bypass both stages
    lsnr_max_df: float = 20.0          # above: ERB gains only, no DF
    lsnr_gating: bool = False          # enable the LSNR stage gating
    silence_rms_thresh: float = 1e-7   # RMS silence skip (tract.rs:512-525)
    silence_skip_frames: int = 5
    reduce_mask: str = "none"          # none|max|mean over channel groups
    n_channels: int = 1


class _CarryPacker:
    """Flattens a pytree carry into ONE buffer per dtype for `lax.scan`.

    The scan carry normally holds ~14 separate arrays (STFT memories, norm
    states, GRU hiddens, ring buffers); XLA's while-loop pays a fixed
    bookkeeping cost per carried buffer at every iteration — measured at
    ~45% of the whole per-frame budget (PERF.md ablation: 170 µs empty
    shuttle vs 377 µs full cell at S=2048). Packing trades that per-buffer
    cost for one concat+slice round trip per frame, which XLA can fuse.
    Layouts/offsets are static, so unpacking lowers to static slices.
    """

    def __init__(self, template):
        import numpy as np

        leaves, self.treedef = jax.tree.flatten(template)
        self.specs = [
            (tuple(l.shape), l.dtype, int(np.prod(l.shape))) for l in leaves
        ]
        self.groups: Dict[str, list] = {}
        for i, (_, dt, _) in enumerate(self.specs):
            self.groups.setdefault(jnp.dtype(dt).name, []).append(i)

    def pack(self, carry) -> Dict[str, jnp.ndarray]:
        leaves = jax.tree.leaves(carry)
        return {
            name: jnp.concatenate([leaves[i].reshape(-1) for i in idxs])
            for name, idxs in self.groups.items()
        }

    def unpack(self, bufs: Dict[str, jnp.ndarray]):
        leaves = [None] * len(self.specs)
        for name, idxs in self.groups.items():
            buf, off = bufs[name], 0
            for i in idxs:
                shape, _, n = self.specs[i]
                leaves[i] = buf[off : off + n].reshape(shape)
                off += n
        return jax.tree.unflatten(self.treedef, leaves)


class StreamingRuntime:
    def __init__(self, model, df_state, params: RuntimeParams = RuntimeParams(),
                 dtype=jnp.float32, use_pallas: bool = False, fused: bool = False,
                 unroll: int = 1, packed_carry: bool = False,
                 fuse_ops: bool = False, out_dtype=None,
                 fuse_convs: bool = False, fuse_gru_pairs: bool = False):
        self.model = model
        self.df_state = df_state
        self.cfg = model.cfg
        self.rt = params
        self.dtype = dtype
        self.use_pallas = use_pallas
        # dtype of the stacked scan output. The scan materializes
        # [T, S, hop] in HBM before the caller's reshape; at S=8192 that
        # buffer (plus the input) is what OOMs, not the carry (GRU/norm
        # carries are already reduced via `dtype`). bf16 halves it at the
        # cost of output quantization (~8 mantissa bits) — a capacity
        # knob for bulk datagen, not for quality-critical paths.
        self.out_dtype = out_dtype
        # lax.scan unroll factor: >1 lets XLA software-pipeline independent
        # work (frontend DFT of frame t+1 against GRU chain of frame t)
        self.unroll = unroll
        # pack the ~14 carry arrays into one flat buffer per dtype — trades
        # XLA's per-buffer while-loop bookkeeping for a fused concat/slice
        self.packed_carry = packed_carry
        if fused:
            # DFN3-only: conv stack folded into dense MXU matmuls
            from deepfilternet_tpu.models.dfnet3_fused import FusedDfNet3

            import copy

            fused_module = FusedDfNet3(model.params, model.state, model.cfg)
            self.model = copy.copy(model)
            self.model.module = fused_module
        if fuse_ops:
            # op-chain restructuring (PERF.md "Where the floor is"): the
            # per-frame scan is dispatch-latency-bound, so (a) fuse each
            # GRU layer's two gate matmuls into one concat-K matmul, (b)
            # merge the grouped-linear heads that read the same `emb`
            # (dec/df linear_in + df_skip) into one einsum, and (c) fold
            # every separable conv's depthwise+pointwise pair + eval-mode
            # BN into ONE dense conv. (a) composes with `fused` —
            # FusedDfNet3 reads GRUs from the params passed at call time —
            # while (b)/(c) are used by the plain cells only (the
            # dense-folded cell keeps its own layout).
            import copy

            from deepfilternet_tpu.nn import fold_conv_tree, fuse_gru_tree

            m = copy.copy(self.model)
            m.params = fuse_gru_tree(self.model.params)
            merge = getattr(m.module, "merge_emb_heads", None)
            if merge is not None and not fused:
                m.params, head_spec = merge(m.params)
                if head_spec:
                    self.cfg = dict(self.cfg, emb_heads=head_spec)
                    # (d) pair-merging the dec/df first GRU layers was
                    # measured-and-REFUTED on chip (PERF.md r04: -9% —
                    # the block-diag zero halves double already-MXU-bound
                    # MACs, which costs more than the saved dispatch).
                    # Kept opt-in as documentation.
                    if fuse_gru_pairs:
                        pair = getattr(m.module, "merge_dec_df_gru0", None)
                        if pair is not None:
                            m.params, ok = pair(m.params)
                            if ok:
                                self.cfg = dict(self.cfg, decdf_gru0=True)
            if fuse_convs and not fused and "layers" in self.cfg:
                # (c) measured-and-REFUTED on chip (PERF.md r04: 59.9k vs
                # 62.7k at S=4096 — XLA already fuses dw+pw+BN+ReLU into
                # one fusion, so densifying only adds MACs). Kept opt-in
                # as documentation.
                m.params, folded_layers = fold_conv_tree(
                    m.params, self.model.state, self.cfg["layers"]
                )
                self.cfg = dict(self.cfg, layers=folded_layers)
            self.model = m
        self.fuse_ops = fuse_ops
        if dtype != jnp.float32:
            # cast model weights once; features are cast per frame. The
            # spectrum/DF/mask application stays f32 for output fidelity.
            # (copy from self.model: `fused`/`fuse_gru` may already have
            # swapped the module or rewritten the params)
            import copy

            cast = lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x
            m = copy.copy(self.model)
            m.params = jax.tree.map(cast, self.model.params)
            m.state = jax.tree.map(cast, self.model.state)
            self.model = m
        if params.post_filter_beta > 0:
            self.cfg = dict(self.cfg, mask_pf=True, pf_beta=params.post_filter_beta)
        self.stft_cfg: Stft = df_state.stft_cfg
        self.alpha = get_norm_alpha(
            df_state.sr, df_state.hop_size, config("NORM_TAU", 1.0, float, section="DF")
        )
        widths = df_state.erb_widths
        self.erb_fwd = jnp.asarray(erb_fb_matrices(widths, normalized=True, inverse=False))
        self.nb_df = self.cfg["nb_df"]
        self.nb_erb = self.cfg["nb_erb"]
        self._process_jit: Dict[int, Any] = {}

    # -- state ---------------------------------------------------------------

    def init(self, n_streams: int) -> StreamCarry:
        d = self.stft_cfg.fft_size - self.stft_cfg.hop_size
        return StreamCarry(
            analysis_mem=jnp.zeros((n_streams, d)),
            synthesis_mem=jnp.zeros((n_streams, d)),
            mean_norm=jnp.broadcast_to(
                jnp.asarray(mean_norm_init(self.nb_erb)), (n_streams, self.nb_erb)
            ),
            unit_norm=jnp.broadcast_to(
                jnp.asarray(unit_norm_init(self.nb_df)), (n_streams, self.nb_df)
            ),
            silence_ctr=jnp.zeros((n_streams,), jnp.int32),
            model=self._init_model_carry(n_streams),
        )

    def _init_model_carry(self, n_streams: int):
        carry = self.model.module.streaming_init(n_streams, self.cfg)
        if self.dtype == jnp.float32:
            return carry
        cast = jax.tree.map(
            lambda x: x.astype(self.dtype) if x.dtype == jnp.float32 else x, carry
        )
        # DF ring buffers hold spectrum values: keep f32 (the cell writes
        # them back as f32 real/imag parts of a complex64 MAC)
        keep = {f: getattr(carry, f) for f in carry._fields if "ring" in f}
        return cast._replace(**keep)

    # -- per-frame cell ------------------------------------------------------

    def _cell(self, carry: StreamCarry, frame: jnp.ndarray
              ) -> Tuple[StreamCarry, jnp.ndarray]:
        """frame: [S, hop] -> (carry', enhanced [S, hop])."""
        cfg = self.cfg
        if self.use_pallas:
            # fused VMEM-resident frontend kernel (ops/pallas_frontend.py)
            from deepfilternet_tpu.ops.pallas_frontend import fused_analysis_frontend

            amem, spec_re, spec_im, feat_erb, fc_re, fc_im, mn, un = (
                fused_analysis_frontend(
                    carry.analysis_mem, frame, carry.mean_norm, carry.unit_norm,
                    fft_size=self.stft_cfg.fft_size, hop_size=self.stft_cfg.hop_size,
                    nb_erb=self.nb_erb, nb_df=self.nb_df,
                    min_nb_erb_freqs=self.df_state.min_nb_erb_freqs,
                    alpha=self.alpha,
                )
            )
            feat_cplx_ri = jnp.stack([fc_re, fc_im], axis=-1)
        else:
            # analysis as MXU matmuls (window + wnorm folded into the DFT
            # matrices — an order of magnitude faster than XLA's TPU FFT here)
            amem, spec_re, spec_im = analysis_step_ri(
                carry.analysis_mem, frame, self.stft_cfg
            )
            # features (DFState::feat_erb / feat_cplx, lib.rs:206-221)
            power = spec_re**2 + spec_im**2
            erb_db = 10.0 * jnp.log10(power @ self.erb_fwd + 1e-10)
            mn, feat_erb = erb_norm_step(carry.mean_norm, erb_db, self.alpha)
            mag_lo = jnp.sqrt(power[..., : self.nb_df])
            un = mag_lo * (1.0 - self.alpha) + carry.unit_norm * self.alpha
            un_scale = jax.lax.rsqrt(un)
            feat_cplx_ri = jnp.stack(
                [spec_re[..., : self.nb_df] * un_scale,
                 spec_im[..., : self.nb_df] * un_scale],
                axis=-1,
            )
        spec = (spec_re + 1j * spec_im).astype(jnp.complex64)
        spec_ri = jnp.stack([spec_re, spec_im], axis=-1)
        if self.dtype != jnp.float32:
            feat_erb = feat_erb.astype(self.dtype)
            feat_cplx_ri = feat_cplx_ri.astype(self.dtype)
            spec_ri = spec_ri.astype(self.dtype)
        mstate, (spec_e_ri, lsnr, mask) = self.model.module.streaming_cell(
            self.model.params, self.model.state, cfg, carry.model,
            spec_ri, feat_erb, feat_cplx_ri,
        )
        if self.dtype != jnp.float32:
            spec_e_ri = spec_e_ri.astype(jnp.float32)
            lsnr = lsnr.astype(jnp.float32)
            mask = mask.astype(jnp.float32)
        spec_e = self._apply_runtime_stages(
            spec, spec_e_ri[..., 0] + 1j * spec_e_ri[..., 1], lsnr, mask
        )

        # RMS silence skip (tract.rs:512-525): after `silence_skip_frames`
        # consecutive quiet frames, output zeros
        rt = self.rt
        frame_rms = jnp.sqrt(jnp.mean(frame**2, axis=-1))
        quiet = frame_rms < rt.silence_rms_thresh
        ctr = jnp.where(quiet, carry.silence_ctr + 1, 0)
        spec_e = jnp.where((ctr >= rt.silence_skip_frames)[:, None],
                           jnp.zeros_like(spec_e), spec_e)

        smem, out = synthesis_step_ri(
            carry.synthesis_mem, jnp.real(spec_e), jnp.imag(spec_e), self.stft_cfg
        )
        if self.out_dtype is not None:
            out = out.astype(self.out_dtype)
        return StreamCarry(amem, smem, mn, un, ctr, mstate), out

    def _apply_runtime_stages(self, spec, spec_e, lsnr, mask):
        """Post-model RuntimeParams stages, frame-shape agnostic.

        spec/spec_e complex [..., F], lsnr [..., 1], mask [..., E]; leading
        dims are [S] (per-frame cell) or [S, T] (chunked runtime).
        """
        rt, cfg = self.rt, self.cfg

        # multichannel mask reduction (tract.rs:117-193 NONE/MAX/MEAN):
        # streams are (stream, channel) groups; reduce over the channel axis
        # and re-apply the shared mask to every channel's spectrum. Only the
        # ERB-mask stage is shared — the DF stage stays per-channel (the
        # reference applies reduced gains to every channel's spectrum,
        # tract.rs:558-567, then overwrites the low nb_df bins with the
        # per-channel deep-filter output, tract.rs:588-597).
        if rt.reduce_mask != "none" and rt.n_channels > 1:
            c = rt.n_channels
            nb_df = cfg["nb_df"]
            mg = mask.reshape(-1, c, *mask.shape[1:])
            mg = jnp.max(mg, axis=1) if rt.reduce_mask == "max" else jnp.mean(mg, axis=1)
            mask = jnp.repeat(mg, c, axis=0)
            bin_gains = mask @ jnp.asarray(cfg["erb_inv_fb"])
            upper = (spec * bin_gains)[..., nb_df:]
            if cfg.get("mask_pf"):
                from deepfilternet_tpu.ops.postfilter import post_filter

                upper = post_filter(spec[..., nb_df:], upper,
                                    beta=cfg.get("pf_beta", 0.02))
            spec_e = jnp.concatenate(
                [spec_e[..., :nb_df], upper.astype(jnp.complex64)], axis=-1
            )

        # LSNR-gated stage selection (tract.rs:658-672): batched inference
        # computes all stages and selects per stream/frame.
        if rt.lsnr_gating:
            ls = lsnr[..., 0]
            bin_gains = mask @ jnp.asarray(cfg["erb_inv_fb"])
            spec_m = spec * bin_gains
            zero = jnp.zeros_like(spec)
            spec_e = jnp.where((ls < rt.lsnr_min)[..., None], zero, spec_e)
            spec_e = jnp.where(
                ((ls > rt.lsnr_max_df) & (ls <= rt.lsnr_max_erb))[..., None],
                spec_m, spec_e,
            )
            spec_e = jnp.where((ls > rt.lsnr_max_erb)[..., None], spec, spec_e)

        # attenuation-limit mixback (tract.rs:626-629)
        if rt.atten_lim_db and abs(rt.atten_lim_db) > 0:
            lim = 10.0 ** (-abs(rt.atten_lim_db) / 20.0)
            spec_e = spec * lim + spec_e * (1.0 - lim)
        return spec_e

    # -- public API ----------------------------------------------------------

    def process_frame(self, carry: StreamCarry, frame: jnp.ndarray):
        return self._cell(carry, frame)

    def _get_process(self, n_frames: int):
        if n_frames not in self._process_jit:

            @jax.jit
            def run(carry, audio):
                frames = audio.reshape(
                    audio.shape[0], n_frames, self.stft_cfg.hop_size
                )
                frames_t = jnp.moveaxis(frames, 1, 0)
                unroll = min(self.unroll, n_frames)
                if self.packed_carry:
                    packer = _CarryPacker(carry)

                    def cell(p, frame):
                        c2, o = self._cell(packer.unpack(p), frame)
                        return packer.pack(c2), o

                    packed, out = jax.lax.scan(
                        cell, packer.pack(carry), frames_t, unroll=unroll
                    )
                    carry = packer.unpack(packed)
                else:
                    carry, out = jax.lax.scan(
                        self._cell, carry, frames_t, unroll=unroll
                    )
                return carry, jnp.moveaxis(out, 0, 1).reshape(audio.shape[0], -1)

            self._process_jit[n_frames] = run
        return self._process_jit[n_frames]

    def process(self, carry: StreamCarry, audio: jnp.ndarray
                ) -> Tuple[StreamCarry, jnp.ndarray]:
        """audio: [S, T] with T a multiple of hop. Returns [S, T] enhanced
        (delayed by fft-hop samples, streaming semantics)."""
        hop = self.stft_cfg.hop_size
        t = audio.shape[-1]
        assert t % hop == 0, "process() needs whole hops"
        return self._get_process(t // hop)(carry, audio)


# ---------------------------------------------------------------------------
# chunked runtime: frame-parallel pipeline with explicit carried state
# ---------------------------------------------------------------------------


class ChunkedStreamingRuntime(StreamingRuntime):
    """Streaming with offline-style batching per chunk.

    Instead of a per-frame while-loop, audio is processed `chunk_frames`
    frames at a time: analysis/features/convs/DF/synthesis batch over all
    frames of the chunk (MXU matmuls + associative norm scans), and only
    the GRU recurrences remain sequential (inside `forward_chunk`). Long
    inputs scan over chunks, so activation memory stays bounded while the
    XLA while-loop trip count drops by `chunk_frames`x. Same streaming
    semantics and carry as StreamingRuntime — chunk/call boundaries are
    state-continuous.

    Requires a model module exposing `forward_chunk` (DFN1/2/3).
    """

    def __init__(self, *args, chunk_frames: int = 20, **kwargs):
        super().__init__(*args, **kwargs)
        if self.use_pallas:
            raise NotImplementedError(
                "ChunkedStreamingRuntime batches the frontend itself; the "
                "per-frame pallas frontend only applies to StreamingRuntime"
            )
        if not hasattr(self.model.module, "forward_chunk"):
            raise NotImplementedError(
                f"model module {self.model.module.__name__} has no "
                "forward_chunk; use StreamingRuntime"
            )
        self.chunk_frames = chunk_frames

    def _chunk_body(self, carry: StreamCarry, audio: jnp.ndarray, t: int
                    ) -> Tuple[StreamCarry, jnp.ndarray]:
        """One frame-parallel chunk: audio [S, t*hop] -> (carry', out)."""
        hop = self.stft_cfg.hop_size
        fft = self.stft_cfg.fft_size
        d = fft - hop
        module = self.model.module
        params, mstate, cfg = self.model.params, self.model.state, self.cfg
        from deepfilternet_tpu.ops.norms import _ema_scan
        from deepfilternet_tpu.ops.stft import dft_matrices, idft_matrices

        cos_m, sin_m = dft_matrices(fft, hop)
        re_m, im_m = idft_matrices(fft)
        alpha = self.alpha
        nb_df = self.nb_df
        s = audio.shape[0]

        # -- analysis: all frames at once (strided frame view as reshape
        # of hop-sized pieces, avoiding a giant gather)
        buf = jnp.concatenate([carry.analysis_mem, audio], axis=-1)
        r = fft // hop
        hops = buf.reshape(s, t + r - 1, hop)
        frames = jnp.concatenate(
            [hops[:, k : k + t] for k in range(r)], axis=-1
        )  # [S, T, fft]
        re = frames @ jnp.asarray(cos_m)
        im = frames @ jnp.asarray(sin_m)
        new_amem = buf[:, -d:]
        # -- features with associative-scan norms
        power = re**2 + im**2
        erb_db = 10.0 * jnp.log10(power @ self.erb_fwd + 1e-10)
        mtrack = _ema_scan(erb_db, carry.mean_norm, alpha, axis=1)
        feat_erb = (erb_db - mtrack) / 40.0
        mag_lo = jnp.sqrt(power[..., :nb_df])
        utrack = _ema_scan(mag_lo, carry.unit_norm, alpha, axis=1)
        scale = jax.lax.rsqrt(utrack)
        feat_spec = jnp.stack(
            [re[..., :nb_df] * scale, im[..., :nb_df] * scale], axis=-1
        )
        spec_ri = jnp.stack([re, im], axis=-1)
        # -- model chunk (optionally reduced precision, mirroring the
        # per-frame cell: features/model in bf16, DF/mask outputs back to
        # f32 before the runtime stages and synthesis)
        if self.dtype != jnp.float32:
            feat_erb = feat_erb.astype(self.dtype)
            feat_spec = feat_spec.astype(self.dtype)
            spec_in = spec_ri.astype(self.dtype)
        else:
            spec_in = spec_ri
        mcarry, (spec_e_ri, lsnr, mask) = module.forward_chunk(
            params, mstate, cfg, carry.model, spec_in, feat_erb, feat_spec
        )
        if self.dtype != jnp.float32:
            spec_e_ri = spec_e_ri.astype(jnp.float32)
            lsnr = lsnr.astype(jnp.float32)
            mask = mask.astype(jnp.float32)
        # -- post-model RuntimeParams stages, frame-parallel
        spec_e = self._apply_runtime_stages(
            re + 1j * im, spec_e_ri[..., 0] + 1j * spec_e_ri[..., 1],
            lsnr, mask,
        )
        # RMS silence skip: the running quiet-frame counter is
        # ctr_t = t - (last loud frame index ≤ t), computed in parallel
        # with a cummax over loud-frame indices seeded by the carried
        # counter.
        rt_p = self.rt
        frame_rms = jnp.sqrt(jnp.mean(audio.reshape(s, t, hop) ** 2, axis=-1))
        quiet = frame_rms < rt_p.silence_rms_thresh  # [S, T]
        tidx = jnp.arange(t, dtype=jnp.int32)[None, :]
        loud_idx = jnp.where(quiet, jnp.int32(-(2**30)), tidx)
        # seed saturates at the skip threshold: only ctr >= threshold
        # matters, and this keeps the seed above the quiet marker
        ctr0 = jnp.minimum(
            carry.silence_ctr.astype(jnp.int32),
            jnp.int32(rt_p.silence_skip_frames),
        )
        seed = (-1 - ctr0)[:, None]
        last_loud = jax.lax.cummax(
            jnp.concatenate([seed, loud_idx], axis=1), axis=1
        )[:, 1:]
        ctr = tidx - last_loud  # [S, T]
        spec_e = jnp.where(
            (ctr >= rt_p.silence_skip_frames)[..., None],
            jnp.zeros_like(spec_e), spec_e,
        )
        spec_e_ri = jnp.stack([jnp.real(spec_e), jnp.imag(spec_e)], -1)
        # -- synthesis: batched iDFT + overlap-add with carried tail
        x = (spec_e_ri[..., 0] @ jnp.asarray(re_m)
             + spec_e_ri[..., 1] @ jnp.asarray(im_m))  # [S, T, fft]
        chunks = x.reshape(s, t, r, hop)
        out_len = t * hop
        full = jnp.zeros((s, out_len + d), jnp.float32)
        for k in range(r):
            seg = chunks[:, :, k, :].reshape(s, out_len)
            full = full.at[:, k * hop : k * hop + out_len].add(seg)
        full = full.at[:, :d].add(carry.synthesis_mem)
        out = full[:, :out_len]
        new_smem = full[:, out_len:]
        new_carry = StreamCarry(
            analysis_mem=new_amem,
            synthesis_mem=new_smem,
            mean_norm=mtrack[:, -1],
            unit_norm=utrack[:, -1],
            silence_ctr=ctr[:, -1],
            model=mcarry,
        )
        return new_carry, out

    def _get_process(self, n_frames: int):
        if n_frames not in self._process_jit:
            hop = self.stft_cfg.hop_size
            cf = min(self.chunk_frames, n_frames)
            main = (n_frames // cf) * cf

            @jax.jit
            def run(carry: StreamCarry, audio):
                s = audio.shape[0]
                if main == cf:
                    carry, out = self._chunk_body(carry, audio[:, : main * hop], cf)
                else:
                    a_main = jnp.moveaxis(
                        audio[:, : main * hop].reshape(s, main // cf, cf * hop), 1, 0
                    )
                    carry, o = jax.lax.scan(
                        lambda c, a: self._chunk_body(c, a, cf), carry, a_main
                    )
                    out = jnp.moveaxis(o, 0, 1).reshape(s, -1)
                if n_frames > main:
                    carry, o2 = self._chunk_body(
                        carry, audio[:, main * hop :], n_frames - main
                    )
                    out = jnp.concatenate([out, o2], axis=-1)
                return carry, out

            self._process_jit[n_frames] = run
        return self._process_jit[n_frames]
