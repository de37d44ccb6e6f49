"""Whole-cell Pallas TPU kernel for streaming DFN3: the speed-of-light path.

Why this exists: the per-frame `lax.scan` cell (streaming.py) runs ~40 XLA
ops per frame; at S=4096 the measured cost is ~700 us/frame of which the
large majority is dispatch/fusion-boundary overhead and carry traffic, not
FLOPs (PERF.md ablation: a no-op carry shuttle alone costs ~45% of the
frame budget, and scan `unroll` does not recover it). This kernel fuses the
ENTIRE frame pipeline — STFT analysis (windowed real-DFT as one MXU
matmul), ERB/unit-norm features, the dense-folded DFN3 cell (every conv
collapsed to a matmul, see models/dfnet3_fused.py), deep filtering, ERB
mask, post-filter, silence skip, atten-lim, and ISTFT synthesis — into ONE
Pallas program that loops frames *internally*:

  grid = (n_stream_blocks, n_chunks)   # chunks iterate fastest
  * weights: index-constant blocks -> fetched once, VMEM-resident for the
    whole run (~17 MB bf16);
  * carry: [S, d] blocks indexed by stream-block only -> live in the
    revisited output window, never round-tripping HBM between frames;
  * audio in/out: [S_BLK, C*hop] blocks streamed + double-buffered by the
    Pallas pipeline.

All matmuls run bf16 x bf16 -> f32 accumulate (`preferred_element_type`),
which is bit-comparable to XLA's default TPU matmul precision used by the
reference runtime; carried state stays f32.

Reference semantics mirrored: tract.rs:509-642 (hot loop), lib.rs:356-427
(STFT), lib.rs:206-278 (features/norms), tract.rs:724-767 (DF MAC),
lib.rs:446-471 (post-filter). Layout contracts are inherited from
models/dfnet3_fused.py's dense folds.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfilternet_tpu.ops.stft import dft_matrices

PI = 3.1415926535897932384626433

# fixed DSP geometry for the default DFN3 config (asserted at build time)
HOP = 480
FFT = 960
NFREQ = 481
FPAD = 512  # freq bins padded to the TPU lane width


class CellStatics(NamedTuple):
    """Static (compile-time) scalars baked into the kernel."""

    alpha: float
    nb_erb: int
    nb_df: int
    df_order: int
    lsnr_min: float
    lsnr_max: float
    mask_pf: bool
    pf_beta: float
    silence_thresh: float
    silence_frames: int
    atten_lim: float  # 0 = disabled; else 10^(-|db|/20)
    lsnr_gating: bool
    gate_lsnr_min: float
    gate_lsnr_max_erb: float
    gate_lsnr_max_df: float
    # perf-ablation switch ("" = full cell): "frontend" skips the model
    # (spec passthrough), "model" skips DFT/synthesis (frame passthrough).
    # Never use outside benchmarking.
    ablate: str = ""


# ordered weight keys; the kernel receives them as refs in this order
WKEYS: List[str] = [
    "dft",        # [960, 1024]  cols 0:512 cos, 512:1024 sin (F padded)
    "imult",      # [1, 512]     f32 row scaling turning dft^T into the iDFT
    "erb_fwd",    # [512, 32]
    "erb_inv",    # [32, 512]
    "e0_w", "e0_b", "e1_w", "e1_b", "e2_w", "e2_b", "e3_w", "e3_b",
    "c0w_t0", "c0w_t1", "c0w_t2", "c0_b", "c1_w", "c1_b", "gl_w",
    "p3_w", "p3_b", "t3_w", "t3_b", "p2_w", "p2_b", "t2_w", "t2_b",
    "p1_w", "p1_b", "t1_w", "t1_b", "p0_w", "p0_b", "out_w", "out_b",
    "enc_lin_in", "enc_wih", "enc_whh", "enc_bih", "enc_bhh", "enc_lin_out",
    "lsnr_w", "lsnr_b",
    "dec_lin_in", "dec_wih", "dec_whh", "dec_bih", "dec_bhh", "dec_lin_out",
    "df_lin_in",
    "df_wih0", "df_whh0", "df_bih0", "df_bhh0",
    "df_wih1", "df_whh1", "df_bih1", "df_bhh1",
    "df_wih2", "df_whh2", "df_bih2", "df_bhh2",
    "df_out_w",   # [256, 960] output-permuted to (n, ri, f) blocks
    "convp_co",   # [16, 10]   true channel map of the 1x1 df_convp (+BN)
    "convp_b",    # [1, 16]    per-output-channel shift (10 used, padded)
]

# lane-aligned block width for the DF tap/coefficient path: Mosaic only
# supports lane-dimension splits at multiples of 128, so the 96-bin DF
# blocks are padded to 128 (pad lanes carry zeros end to end)
BLK = 128

# ordered carry keys with their per-stream widths
CKEYS: List[Tuple[str, int]] = [
    ("amem", FFT - HOP),    # analysis memory
    ("smem", FFT - HOP),    # synthesis OLA tail
    ("norms", 128),         # 0:32 mean-norm (dB), 32:128 unit-norm
    ("sil", 8),             # col 0: consecutive-quiet-frame counter (f32)
    ("erb_ctx", 64),        # 2 past erb feature frames, (t, f) flat
    ("spec_ctx", 384),      # 2 past feat_spec frames, (c, t, f) flat
    ("enc_h", 256),
    ("dec_h", 256),
    ("df_h", 768),          # 3 layers, layer-major
    ("ring_re", 4 * BLK),   # df ring: 4 past low-band frames, 128-padded
    ("ring_im", 4 * BLK),
]


def _pad_cols(a: np.ndarray, n: int) -> np.ndarray:
    return np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])])


def _grouped_dense(w: np.ndarray) -> np.ndarray:
    g, ig, hg = w.shape
    out = np.zeros((g * ig, g * hg), np.float32)
    for gi in range(g):
        out[gi * ig : (gi + 1) * ig, gi * hg : (gi + 1) * hg] = np.asarray(w[gi])
    return out


def _perm_fc_to_cf(f: int, c: int) -> np.ndarray:
    """Permutation matrix mapping (F,C)-flat vectors to (C,F)-flat."""
    p = np.zeros((f * c, f * c), np.float32)
    for fi in range(f):
        for ci in range(c):
            p[fi * c + ci, ci * f + fi] = 1.0
    return p


def build_cell_weights(model, df_state, rt_params, matmul_dtype=jnp.bfloat16,
                       cfg=None) -> Tuple[Dict[str, jnp.ndarray], CellStatics]:
    """Precompute the kernel's weight set from a loaded DFN3 model.

    Reuses the dense conv folds of models/dfnet3_fused.build_fused and
    re-permutes the DF-coefficient heads so both emit (n, ri, f)-blocked
    outputs (contiguous [S, 96] lanes per tap, no strided gathers in the
    DF MAC).
    """
    from deepfilternet_tpu.config import config
    from deepfilternet_tpu.models.dfnet3_fused import build_fused
    from deepfilternet_tpu.ops import get_norm_alpha
    from deepfilternet_tpu.ops.erb import erb_fb_matrices

    cfg = cfg if cfg is not None else model.cfg
    params = model.params
    assert cfg["nb_df"] == 96 and cfg["nb_erb"] == 32 and cfg["df_order"] == 5
    assert cfg["freq_bins"] == NFREQ and cfg["df_pathway_kt"] == 1
    assert not cfg["enc_concat"] and cfg["df_gru_skip"] is None
    assert cfg["conv_kernel_inp"][0] == 3
    assert df_state.fft_size == FFT and df_state.hop_size == HOP

    F = build_fused(params, model.state, cfg)
    W: Dict[str, np.ndarray] = {}

    cos_m, sin_m = dft_matrices(FFT, HOP)  # [960, 481] each
    W["dft"] = np.concatenate(
        [_pad_cols(cos_m, FPAD), _pad_cols(sin_m, FPAD)], axis=1
    )  # [960, 1024]
    # The iDFT matrix is exactly a row-rescaled transpose of the forward
    # DFT matrix: idft_re[j, k] = dft_cos[k, j] * mult_j / wnorm (same for
    # the sin/im half), with mult_j = 2 except DC/Nyquist = 1
    # (ops/stft.py idft_matrices). Reusing dft^T in the synthesis matmul
    # saves ~2 MB of VMEM-resident weights and keeps the pair consistent.
    from deepfilternet_tpu.ops.stft import wnorm as _wnorm

    mult = np.full(FPAD, 2.0, np.float64)
    mult[0] = 1.0
    mult[NFREQ - 1] = 1.0
    mult[NFREQ:] = 0.0
    imult = (mult / _wnorm(FFT, HOP)).astype(np.float32)
    W["imult"] = imult[None, :]

    widths = df_state.erb_widths
    erb_f = np.asarray(erb_fb_matrices(widths, normalized=True, inverse=False))
    erb_i = np.asarray(erb_fb_matrices(widths, normalized=True, inverse=True))
    W["erb_fwd"] = np.pad(erb_f, ((0, FPAD - NFREQ), (0, 0)))
    W["erb_inv"] = _pad_cols(erb_i, FPAD)

    ch = cfg["conv_ch"]
    e = cfg["nb_erb"]

    def wb(dst, src):
        w, b = F[src]
        W[dst + "_w"] = np.asarray(w)
        W[dst + "_b"] = np.asarray(b)[None, :]

    for dst, src in [("e0", "e0"), ("e1", "e1"), ("e2", "e2"), ("e3", "e3"),
                     ("c0", "c0"), ("c1", "c1"), ("t3", "t3"), ("p2", "p2"),
                     ("t2", "t2"), ("p1", "p1"), ("t1", "t1"), ("p0", "p0"),
                     ("out", "out")]:
        wb(dst, src)
    # pad c0's 16 channel blocks from 96 to BLK lanes so the kernel can
    # view it [S, 16, BLK] (Mosaic lane splits need multiples of 128); c1
    # absorbs the matching zero input rows. The fold is then split per
    # context frame t: c0 = sum_t fs_t @ c0w_t with fs_t = [re_t | im_t],
    # so the kernel never materializes the 3-frame window.
    nb_df_ = cfg["nb_df"]
    c0w, c0b = W.pop("c0_w"), W["c0_b"]
    c0w_p = np.zeros((c0w.shape[0], ch * BLK), np.float32)
    c0b_p = np.zeros((1, ch * BLK), np.float32)
    c1w_p = np.zeros((ch * BLK, W["c1_w"].shape[1]), np.float32)
    for ci in range(ch):
        src_sl = slice(ci * nb_df_, (ci + 1) * nb_df_)
        dst_sl = slice(ci * BLK, ci * BLK + nb_df_)
        c0w_p[:, dst_sl] = c0w[:, src_sl]
        c0b_p[:, dst_sl] = c0b[:, src_sl]
        c1w_p[dst_sl, :] = W["c1_w"][src_sl, :]
    for t in range(3):
        # window rows for frame t: (re channel, t, :) and (im channel, t, :)
        W[f"c0w_t{t}"] = np.concatenate(
            [c0w_p[t * nb_df_ : (t + 1) * nb_df_],
             c0w_p[3 * nb_df_ + t * nb_df_ : 3 * nb_df_ + (t + 1) * nb_df_]],
            axis=0,
        )  # [192, 2048]
    W["c0_b"], W["c1_w"] = c0b_p, c1w_p
    W["gl_w"] = np.asarray(F["gl"])
    # (F,C)->(C,F) permutation for the decoder embedding path: ReLU
    # commutes with a permutation, so it folds into dec_lin_out's columns
    # (applied after gru_block below)
    p_demb = np.asarray(F["p_demb"])
    # conv3p consumes e3, which the fused fold emits (F,C)-flat: fold the
    # (F,C)->(C,F) permutation into conv3p's input rows (free at build time,
    # replaces the runtime e3_cf transpose of dfnet3_fused.py:234-237)
    p3w, p3b = F["p3"]
    perm = _perm_fc_to_cf(e // 4, ch)
    W["p3_w"] = perm @ np.asarray(p3w)
    W["p3_b"] = np.asarray(p3b)[None, :]

    # GRU stacks (torch layouts -> right-multiply transposes)
    def gru_block(prefix, gparams, lcfg):
        W[prefix + "_lin_in"] = _grouped_dense(np.asarray(gparams["linear_in"]["w"]))
        layers = gparams["gru"]["layers"]
        if len(layers) == 1:
            lp = layers[0]
            W[prefix + "_wih"] = np.asarray(lp["w_ih"]).T
            W[prefix + "_whh"] = np.asarray(lp["w_hh"]).T
            W[prefix + "_bih"] = np.asarray(lp["b_ih"])[None, :]
            W[prefix + "_bhh"] = np.asarray(lp["b_hh"])[None, :]
        else:
            for li, lp in enumerate(layers):
                W[f"{prefix}_wih{li}"] = np.asarray(lp["w_ih"]).T
                W[f"{prefix}_whh{li}"] = np.asarray(lp["w_hh"]).T
                W[f"{prefix}_bih{li}"] = np.asarray(lp["b_ih"])[None, :]
                W[f"{prefix}_bhh{li}"] = np.asarray(lp["b_hh"])[None, :]
        if "linear_out" in gparams:
            W[prefix + "_lin_out"] = _grouped_dense(
                np.asarray(gparams["linear_out"]["w"])
            )

    L = cfg["layers"]
    gru_block("enc", params["enc_emb_gru"], L["enc_emb_gru"])
    gru_block("dec", params["dec_emb_gru"], L["dec_emb_gru"])
    W["dec_lin_out"] = W["dec_lin_out"] @ p_demb
    gru_block("df", params["df_gru"], L["df_gru"])
    assert L["df_gru"]["num_layers"] == 3 and L["enc_emb_gru"]["num_layers"] == 1
    assert L["dec_emb_gru"]["num_layers"] == 1

    W["lsnr_w"] = np.asarray(params["lsnr_fc"]["w"]).T  # [128, 1]
    W["lsnr_b"] = np.asarray(params["lsnr_fc"]["b"])[None, :]

    # df_out: dense grouped-linear [256, F'*O*2]; output columns are
    # (f, n, ri)-flat — permute to (n, ri, f) blocks padded to BLK lanes
    # each, so every tap's coefficients are a 128-aligned [S, BLK] slice
    o = cfg["df_order"]
    nb_df = cfg["nb_df"]
    df_out = _grouped_dense(np.asarray(params["df_out"]["w"]))  # [256, 960]
    df_out_p = np.zeros((df_out.shape[0], o * 2 * BLK), np.float32)
    for n in range(o):
        for ri in range(2):
            for f in range(nb_df):
                df_out_p[:, (n * 2 + ri) * BLK + f] = df_out[:, f * (o * 2) + n * 2 + ri]
    W["df_out_w"] = df_out_p
    # df_convp is a pure 1x1 grouped conv (kernel (1,1), groups 2, no
    # pointwise) + BN affine: a frequency-invariant [16 -> 10] channel map.
    # Extract it from the exact dense fold and verify frequency invariance,
    # rather than re-deriving the BN/group algebra by hand.
    from deepfilternet_tpu.models.dfnet3_fused import _linearize_conv

    cw, cb = _linearize_conv(
        params["df_convp"], model.state.get("df_convp", {}), L["df_convp"],
        (ch, 1, nb_df),
    )  # [1536, 960] (c,f)-in, (o,f)-out flat; same (o,f) blocks as df_out_w
    co = np.zeros((ch, o * 2), np.float32)
    bo = np.zeros(o * 2, np.float32)
    for oc in range(o * 2):
        bo[oc] = cb[oc * nb_df]
        for ic in range(ch):
            co[ic, oc] = cw[ic * nb_df, oc * nb_df]
    # frequency invariance + no cross-frequency leakage (sampled)
    for f0 in (1, 37, 95):
        assert np.allclose(cw[1 * nb_df + f0, 3 * nb_df + f0], co[1, 3], atol=1e-6)
        assert abs(cw[1 * nb_df + f0, 3 * nb_df + (f0 - 1) % nb_df]) < 1e-7
        assert abs(cb[3 * nb_df + f0] - bo[3]) < 1e-6
    W["convp_co"] = co
    W["convp_b"] = np.pad(bo, (0, ch - o * 2))[None, :]

    alpha = get_norm_alpha(
        df_state.sr, df_state.hop_size, config("NORM_TAU", 1.0, float, section="DF")
    )
    statics = CellStatics(
        alpha=float(alpha),
        nb_erb=e,
        nb_df=nb_df,
        df_order=o,
        lsnr_min=float(cfg["lsnr_min"]),
        lsnr_max=float(cfg["lsnr_max"]),
        mask_pf=bool(cfg.get("mask_pf", False)),
        pf_beta=float(cfg.get("pf_beta", 0.02)),
        silence_thresh=float(rt_params.silence_rms_thresh),
        silence_frames=int(rt_params.silence_skip_frames),
        atten_lim=(10.0 ** (-abs(rt_params.atten_lim_db) / 20.0)
                   if rt_params.atten_lim_db else 0.0),
        lsnr_gating=bool(rt_params.lsnr_gating),
        gate_lsnr_min=float(rt_params.lsnr_min),
        gate_lsnr_max_erb=float(rt_params.lsnr_max_erb),
        gate_lsnr_max_df=float(rt_params.lsnr_max_df),
    )
    def _is_bias(k: str) -> bool:
        # f32-pinned: the iDFT row scalings (multiply the f32 spectrum on
        # the output path) and convp_b (scalar-indexed in the DF MAC —
        # Mosaic can neither extract a bf16 scalar nor broadcast [1,1] to
        # both axes). Other biases ride the mdtype trunk — a bias that
        # stays f32 would silently promote every activation after it back
        # to f32, doubling VMEM/traffic for the whole chain.
        return k == "imult" or k == "convp_b"

    wj = {
        k: jnp.asarray(v, jnp.float32 if _is_bias(k) else matmul_dtype)
        for k, v in W.items()
    }
    return wj, statics


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------


def _gru_cell(h, gi, ghw, b_hh, mm):
    # gate math runs f32 regardless of the trunk dtype: the TPU VPU
    # computes transcendentals at 32 bit anyway, and Mosaic rejects
    # sigmoid/tanh lowerings over bf16 vectors (weak-f32 scalar
    # broadcasts in their decompositions). The cell's own sums widen
    # BEFORE adding so they introduce no further bf16 rounding beyond
    # the matmul results themselves. b_hn stays inside r*(...) per the
    # torch GRU definition.
    f32 = jnp.float32
    gh = mm(h, ghw)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    b_r, b_z, b_n = jnp.split(b_hh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r.astype(f32) + h_r.astype(f32) + b_r.astype(f32))
    z = jax.nn.sigmoid(i_z.astype(f32) + h_z.astype(f32) + b_z.astype(f32))
    n = jnp.tanh(i_n.astype(f32) + r * (h_n.astype(f32) + b_n.astype(f32)))
    return (1.0 - z) * n + z * h.astype(f32)


def _carry_split(c):
    """HBM flat-carry dict -> per-frame SSA state dict (views/concats done
    once per chunk; inside the frame loop state arrays are only REBOUND,
    never shifted — the zero-copy formulation that removed ~40% of the
    per-frame cost of the first kernel version)."""
    e = 32
    s = {
        "prev_hop": c["amem"],          # [S, 480] == last input hop (fft = 2*hop)
        "smem": c["smem"],              # [S, 480] OLA tail
        "mean": c["norms"][:, :e],
        "unit": c["norms"][:, e:],
        "sil": c["sil"],
        "erb_a": c["erb_ctx"][:, :e],   # feat_erb at t-2
        "erb_b": c["erb_ctx"][:, e:],   # feat_erb at t-1
        # feat_spec frames as [re | im] pairs (t-2, t-1)
        "fs_a": jnp.concatenate(
            [c["spec_ctx"][:, :96], c["spec_ctx"][:, 192:288]], axis=-1),
        "fs_b": jnp.concatenate(
            [c["spec_ctx"][:, 96:192], c["spec_ctx"][:, 288:]], axis=-1),
        "enc_h": c["enc_h"],
        "dec_h": c["dec_h"],
    }
    for li in range(3):
        s[f"dfh{li}"] = c["df_h"][:, li * 256 : (li + 1) * 256]
    for n in range(4):
        s[f"r{n}_re"] = c["ring_re"][:, n * BLK : (n + 1) * BLK]
        s[f"r{n}_im"] = c["ring_im"][:, n * BLK : (n + 1) * BLK]
    return s


def _carry_join(s):
    """Inverse of _carry_split."""
    return {
        "amem": s["prev_hop"],
        "smem": s["smem"],
        "norms": jnp.concatenate([s["mean"], s["unit"]], axis=-1),
        "sil": s["sil"],
        "erb_ctx": jnp.concatenate([s["erb_a"], s["erb_b"]], axis=-1),
        "spec_ctx": jnp.concatenate(
            [s["fs_a"][:, :96], s["fs_b"][:, :96],
             s["fs_a"][:, 96:], s["fs_b"][:, 96:]], axis=-1),
        "enc_h": s["enc_h"],
        "dec_h": s["dec_h"],
        "df_h": jnp.concatenate([s["dfh0"], s["dfh1"], s["dfh2"]], axis=-1),
        "ring_re": jnp.concatenate(
            [s[f"r{n}_re"] for n in range(4)], axis=-1),
        "ring_im": jnp.concatenate(
            [s[f"r{n}_im"] for n in range(4)], axis=-1),
    }


def _frame_step(W: Dict[str, Any], st: CellStatics, s: Dict[str, jnp.ndarray],
                frame: jnp.ndarray, mdtype
                ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """One frame on SSA state (see _carry_split). frame: [S, hop] f32.

    All rolling windows (analysis memory, conv feature contexts, DF ring)
    advance by REBINDING state keys; the only per-frame concatenations are
    lane-width <= 192. Window matmuls are split per context frame so no
    window tensor is ever materialized:
      * analysis DFT: prev_hop @ dft[:480] + frame @ dft[480:]
      * df_conv0 fold: fs_{t-2} @ c0w_t0 + fs_{t-1} @ c0w_t1 + fs_t @ c0w_t2
      * synthesis iDFT: separate re/im dots against the transposed DFT.
    """
    def relu(x):  # dtype-pinned zero (Mosaic rejects weak-f32 broadcasts)
        return jnp.maximum(x, jnp.asarray(0.0, x.dtype))

    nb_df = st.nb_df
    n_rows = frame.shape[0]

    # Model-trunk matmuls emit mdtype (bf16 in production): activations
    # between layers never widen to f32, halving VMEM pressure and
    # vector-memory traffic. The MXU still accumulates in f32 internally;
    # only the stored result is rounded. f32-critical paths (spectrum,
    # features feeding carried norms, LSNR head, mask-to-bin-gains) use
    # mmf explicitly.
    def mm(x, w):
        # f32 MXU accumulate (Mosaic requires a 32-bit acc), result stored
        # narrow — the cast is fused into the matmul epilogue
        return jnp.dot(
            x.astype(mdtype), w, preferred_element_type=jnp.float32
        ).astype(mdtype)

    def mmf(x, w):
        return jnp.dot(x.astype(mdtype), w, preferred_element_type=jnp.float32)

    ns = dict(s)
    lane_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1) < nb_df
    ).astype(jnp.float32)

    # -- analysis: windowed real-DFT split over [prev_hop | frame]
    if st.ablate == "model":  # perf ablation: skip the DFT matmuls
        spec_re = jnp.concatenate([s["prev_hop"], frame[:, :32]], -1) * 0.01
        spec_im = jnp.concatenate([frame, s["prev_hop"][:, :32]], -1) * 0.01
    else:
        spec2 = mmf(s["prev_hop"], W["dft"][:HOP]) + mmf(frame, W["dft"][HOP:])
        spec_re = spec2[:, :FPAD]
        spec_im = spec2[:, FPAD:]
    ns["prev_hop"] = frame

    # -- features (feat_erb / feat_cplx with exponential norms)
    power = spec_re * spec_re + spec_im * spec_im  # [S, 512]
    erb_db = 10.0 * jnp.log10(mmf(power, W["erb_fwd"]) + 1e-10)  # [S, 32]
    a = st.alpha
    new_mean = erb_db * (1.0 - a) + s["mean"] * a
    feat_erb = (erb_db - new_mean) / 40.0
    mag_lo = jnp.sqrt(power[:, :nb_df])
    new_unit = mag_lo * (1.0 - a) + s["unit"] * a
    ns["mean"], ns["unit"] = new_mean, new_unit
    un_scale = jax.lax.rsqrt(new_unit)
    fs_cur = jnp.concatenate(
        [spec_re[:, :nb_df] * un_scale, spec_im[:, :nb_df] * un_scale], -1
    )  # [S, 192]

    erb_a, erb_b, fs_a, fs_b = s["erb_a"], s["erb_b"], s["fs_a"], s["fs_b"]
    ns["erb_a"], ns["erb_b"] = erb_b, feat_erb
    ns["fs_a"], ns["fs_b"] = fs_b, fs_cur
    cur_re = spec_re[:, :BLK] * lane_mask
    cur_im = spec_im[:, :BLK] * lane_mask

    if st.ablate == "frontend":
        # perf ablation: unit mask, passthrough DF
        m = jnp.ones_like(feat_erb)
        lsnr = jnp.zeros((n_rows, 1), jnp.float32)
        y_re, y_im = cur_re, cur_im
        for n in range(3):
            ns[f"r{n}_re"], ns[f"r{n}_im"] = s[f"r{n+1}_re"], s[f"r{n+1}_im"]
        ns["r3_re"], ns["r3_im"] = cur_re, cur_im
        return _frame_tail(W, st, ns, s, frame, m, lsnr, y_re, y_im,
                           spec_re, spec_im, mdtype)

    # -- conv frontend (dense folds, windows split per context frame)
    erb_win = jnp.concatenate([erb_a, erb_b, feat_erb], axis=-1)  # [S, 96]
    e0 = relu(mm(erb_win, W["e0_w"]) + W["e0_b"])     # [S, 512]
    e1 = relu(mm(e0, W["e1_w"]) + W["e1_b"])          # [S, 256]
    e2 = relu(mm(e1, W["e2_w"]) + W["e2_b"])          # [S, 128]
    e3 = relu(mm(e2, W["e3_w"]) + W["e3_b"])          # [S, 128] (F,C) flat
    c0 = relu(mm(fs_a, W["c0w_t0"]) + mm(fs_b, W["c0w_t1"])
              + mm(fs_cur, W["c0w_t2"]) + W["c0_b"])  # [S, 2048] (C,F) padded
    c1 = relu(mm(c0, W["c1_w"]) + W["c1_b"])          # [S, 768] (F,C) flat
    cemb = relu(mm(c1, W["gl_w"]))                    # [S, 128]
    emb = e3 + cemb

    # -- encoder GRU + lsnr head
    xin = relu(mm(emb, W["enc_lin_in"]))
    gi = mm(xin, W["enc_wih"]) + W["enc_bih"]
    enc_h = _gru_cell(s["enc_h"], gi, W["enc_whh"], W["enc_bhh"], mm)
    ns["enc_h"] = enc_h
    emb = relu(mm(enc_h, W["enc_lin_out"]))           # [S, 128]
    lsnr = jax.nn.sigmoid(mmf(emb, W["lsnr_w"]) + W["lsnr_b"])
    lsnr = lsnr * (st.lsnr_max - st.lsnr_min) + st.lsnr_min  # [S, 1]

    # -- erb decoder (p_demb permutation folded into dec_lin_out)
    xdec = relu(mm(emb, W["dec_lin_in"]))
    gid = mm(xdec, W["dec_wih"]) + W["dec_bih"]
    dec_h = _gru_cell(s["dec_h"], gid, W["dec_whh"], W["dec_bhh"], mm)
    ns["dec_h"] = dec_h
    demb_cf = relu(mm(dec_h, W["dec_lin_out"]))       # [S, 128] (C,F) flat
    d3 = relu(mm(relu(mm(e3, W["p3_w"]) + W["p3_b"]) + demb_cf, W["t3_w"]) + W["t3_b"])
    d2 = relu(mm(relu(mm(e2, W["p2_w"]) + W["p2_b"]) + d3, W["t2_w"]) + W["t2_b"])
    d1 = relu(mm(relu(mm(e1, W["p1_w"]) + W["p1_b"]) + d2, W["t1_w"]) + W["t1_b"])
    m = jax.nn.sigmoid(
        mmf(relu(mm(e0, W["p0_w"]) + W["p0_b"]) + d1, W["out_w"]) + W["out_b"]
    )  # [S, 32] f32 (sigmoid/tanh over bf16 don't lower in Mosaic)

    # -- df decoder (3-layer GRU; coefficient heads in (n, ri, f) blocks)
    h_in = relu(mm(emb, W["df_lin_in"]))
    for li in range(3):
        gil = mm(h_in, W[f"df_wih{li}"]) + W[f"df_bih{li}"]
        h_in = _gru_cell(s[f"dfh{li}"], gil, W[f"df_whh{li}"],
                         W[f"df_bhh{li}"], mm)
        ns[f"dfh{li}"] = h_in
    coefs_t = jnp.tanh(mmf(h_in, W["df_out_w"]))  # [S, O*2*BLK] aligned blocks
    c0v = c0.reshape(n_rows, 16, BLK)
    cp = jax.lax.dot_general(
        W["convp_co"], c0v.astype(W["convp_co"].dtype),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [O*2, S, BLK]

    # -- deep filter MAC over rebound ring frames (tract.rs:724-767)
    y_re = jnp.zeros((n_rows, BLK), jnp.float32)
    y_im = jnp.zeros((n_rows, BLK), jnp.float32)
    for n in range(st.df_order):
        if n < st.df_order - 1:
            t_re, t_im = s[f"r{n}_re"], s[f"r{n}_im"]
        else:
            t_re, t_im = cur_re, cur_im
        c_re = (coefs_t[:, (2 * n) * BLK : (2 * n + 1) * BLK]
                + relu(cp[2 * n] + W["convp_b"][0, 2 * n]))
        c_im = (coefs_t[:, (2 * n + 1) * BLK : (2 * n + 2) * BLK]
                + relu(cp[2 * n + 1] + W["convp_b"][0, 2 * n + 1]))
        y_re = y_re + t_re * c_re - t_im * c_im
        y_im = y_im + t_re * c_im + t_im * c_re
    for n in range(3):
        ns[f"r{n}_re"], ns[f"r{n}_im"] = s[f"r{n+1}_re"], s[f"r{n+1}_im"]
    ns["r3_re"], ns["r3_im"] = cur_re, cur_im
    return _frame_tail(W, st, ns, s, frame, m, lsnr, y_re, y_im,
                       spec_re, spec_im, mdtype)


def _frame_tail(W, st: CellStatics, ns, s, frame, m, lsnr, y_re, y_im,
                spec_re, spec_im, mdtype):
    """Post-model stages: ERB mask, post-filter, LSNR gating, atten-lim,
    silence skip, split-iDFT synthesis + overlap-add."""
    nb_df = st.nb_df

    def mm(x, w):
        return jnp.dot(x.astype(mdtype), w, preferred_element_type=jnp.float32)

    def mm_t(x, w):
        return jax.lax.dot_general(
            x.astype(mdtype), w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    bin_gains = mm(m, W["erb_inv"])  # [S, 512]
    sm_re = spec_re * bin_gains
    sm_im = spec_im * bin_gains
    se_re = jnp.concatenate([y_re[:, :nb_df], sm_re[:, nb_df:]], axis=-1)
    se_im = jnp.concatenate([y_im[:, :nb_df], sm_im[:, nb_df:]], axis=-1)

    if st.mask_pf:
        beta = st.pf_beta
        eps = 1e-12
        mag_e = jnp.sqrt(se_re**2 + se_im**2)
        mag_x = jnp.sqrt(spec_re**2 + spec_im**2)
        g = jnp.clip(mag_e / (mag_x + eps), eps, 1.0)
        g_sin = jnp.maximum(g * jnp.sin(PI * g / 2.0), eps)
        pf = (1.0 + beta) / (1.0 + beta * (g / g_sin) ** 2)
        se_re = se_re * pf
        se_im = se_im * pf

    if st.lsnr_gating:
        below = lsnr < st.gate_lsnr_min
        erb_only = (lsnr > st.gate_lsnr_max_df) & (lsnr <= st.gate_lsnr_max_erb)
        bypass = lsnr > st.gate_lsnr_max_erb
        se_re = jnp.where(below, 0.0, jnp.where(erb_only, sm_re,
                          jnp.where(bypass, spec_re, se_re)))
        se_im = jnp.where(below, 0.0, jnp.where(erb_only, sm_im,
                          jnp.where(bypass, spec_im, se_im)))

    if st.atten_lim > 0.0:
        lim = st.atten_lim
        se_re = spec_re * lim + se_re * (1.0 - lim)
        se_im = spec_im * lim + se_im * (1.0 - lim)

    # -- silence skip counter (tract.rs:512-525); the mute zeroes last,
    # overriding the atten-lim mixback like the scan runtime does
    rms = jnp.sqrt(jnp.mean(frame * frame, axis=-1, keepdims=True))  # [S,1]
    quiet = rms < st.silence_thresh
    ctr = jnp.where(quiet, s["sil"][:, :1] + 1.0, 0.0)
    ns["sil"] = jnp.concatenate([ctr, s["sil"][:, 1:]], axis=-1)
    mute = ctr >= st.silence_frames
    se_re = jnp.where(mute, 0.0, se_re)
    se_im = jnp.where(mute, 0.0, se_im)

    # -- synthesis: windowed iDFT as separate re/im dots against the
    # row-rescaled transposed DFT matrix, then overlap-add
    if st.ablate == "model":  # perf ablation: skip synthesis matmuls
        out = frame * (1.0 + se_re[:, :1] * 0.0)
        return ns, out
    x = (mm_t(se_re * W["imult"], W["dft"][:, :FPAD])
         + mm_t(se_im * W["imult"], W["dft"][:, FPAD:]))  # [S, 960]
    out = x[:, :HOP] + s["smem"]
    ns["smem"] = x[:, HOP:]
    return ns, out


def make_cell_kernel(statics: CellStatics, s_blk: int, chunk: int, mdtype,
                     t_major: bool = False):
    """Returns the kernel function over refs for grid (s_blocks, chunks).

    The chunk's frames are unrolled so every rolling window advances by
    SSA rebinding (zero copies); the HBM carry layout is split/joined once
    per chunk (_carry_split/_carry_join).

    t_major: audio blocks are [chunk, s_blk, hop] (frames leading). The
    frame count then sits in a leading block dim, which Mosaic does not
    constrain — any chunk size works (the [s_blk, chunk, hop] layout needs
    chunk % 8 == 0), at the cost of a transpose outside the kernel.
    """
    n_w = len(WKEYS)
    n_c = len(CKEYS)

    def kernel(*refs):
        audio_ref = refs[0]
        cin = refs[1 : 1 + n_c]
        wrefs = refs[1 + n_c : 1 + n_c + n_w]
        aout_ref = refs[1 + n_c + n_w]
        cout = refs[2 + n_c + n_w :]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            for ci, co in zip(cin, cout):
                co[...] = ci[...]

        W = {k: r[...] for k, r in zip(WKEYS, wrefs)}
        s = _carry_split({k: co[...] for (k, _), co in zip(CKEYS, cout)})
        for f in range(chunk):
            frame = audio_ref[f] if t_major else audio_ref[:, f, :]
            s, out = _frame_step(W, statics, s, frame, mdtype)
            if t_major:
                aout_ref[f] = out
            else:
                aout_ref[:, f, :] = out
        c_final = _carry_join(s)
        for (k, _), co in zip(CKEYS, cout):
            co[...] = c_final[k]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("statics", "chunk", "mdtype")
)
def cell_process_xla(audio, carry, weights, statics: CellStatics, chunk: int,
                     mdtype=jnp.bfloat16):
    """XLA-scan variant of the whole-cell pipeline.

    Same packed flat carry (CKEYS), prefolded weights, and SSA
    `_frame_step` as the Pallas kernel, but the frame loop is a
    `lax.scan` over chunk groups compiled by XLA instead of a Mosaic
    grid. Versus StreamingRuntime's scan this (a) shuttles a packed
    lane-aligned carry (~15 KB/stream in 11 wide arrays, instead of a
    pytree of narrow sublane-padded buffers), (b) advances every rolling
    window by SSA rebinding (zero copies), and (c) runs the prefolded
    dense cell (conv windows split per context frame; permutations folded
    into weights at build time). chunk>1 unrolls frames inside one scan
    body, amortizing the while-loop fixed cost.
    """
    s, t = audio.shape
    n_frames = t // HOP
    assert t % HOP == 0 and n_frames % chunk == 0
    n_ch = n_frames // chunk
    frames = audio.reshape(s, n_ch, chunk * HOP).swapaxes(0, 1)

    def body(c, a):
        st = _carry_split(c)
        outs = []
        for f in range(chunk):
            st, o = _frame_step(weights, statics, st,
                                a[:, f * HOP : (f + 1) * HOP], mdtype)
            outs.append(o)
        return _carry_join(st), jnp.concatenate(outs, axis=-1)

    new_c, out = jax.lax.scan(body, carry, frames)
    return new_c, out.swapaxes(0, 1).reshape(s, t)


@functools.partial(
    jax.jit,
    static_argnames=("statics", "s_blk", "chunk", "mdtype", "interpret",
                     "t_major"),
)
def cell_process(audio, carry, weights, statics: CellStatics, s_blk: int,
                 chunk: int, mdtype=jnp.bfloat16, interpret: bool = False,
                 t_major: bool = False):
    """Run the whole-cell kernel over audio [S, T].

    carry: dict of [S, d] f32 arrays (keys/widths per CKEYS).
    Returns (new_carry, enhanced audio [S, T]).
    """
    s, t = audio.shape
    assert s % s_blk == 0, f"streams {s} must divide into blocks of {s_blk}"
    n_frames = t // HOP
    assert n_frames % chunk == 0 and t % HOP == 0
    n_sb = s // s_blk
    n_ch = n_frames // chunk

    kernel = make_cell_kernel(statics, s_blk, chunk, mdtype, t_major=t_major)

    if t_major:
        audio = audio.reshape(s, n_frames, HOP).swapaxes(0, 1)
        audio_spec = pl.BlockSpec(
            (chunk, s_blk, HOP), lambda i, j: (j, i, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        audio = audio.reshape(s, n_frames, HOP)
        audio_spec = pl.BlockSpec(
            (s_blk, chunk, HOP), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        )
    carry_specs = [
        pl.BlockSpec((s_blk, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        for _, d in CKEYS
    ]
    w_specs = [
        pl.BlockSpec(
            weights[k].shape,
            functools.partial(lambda nd, i, j: (0,) * nd, weights[k].ndim),
            memory_space=pltpu.VMEM,
        )
        for k in WKEYS
    ]
    a_shape = (n_frames, s, HOP) if t_major else (s, n_frames, HOP)
    out_shapes = tuple(
        [jax.ShapeDtypeStruct(a_shape, jnp.float32)]
        + [jax.ShapeDtypeStruct((s, d), jnp.float32) for _, d in CKEYS]
    )
    out_specs = tuple([audio_spec] + carry_specs)

    fn = pl.pallas_call(
        kernel,
        grid=(n_sb, n_ch),
        in_specs=[audio_spec] + carry_specs + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # weights (~14 MB bf16) + streamed audio + carry exceed the
            # default 16 MiB *scoped* VMEM limit; v5e physical VMEM is
            # 128 MiB, so raise the cap for this kernel (leave headroom
            # for XLA-pinned operands of the surrounding program)
            vmem_limit_bytes=114 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    carry_in = [carry[k] for k, _ in CKEYS]
    w_in = [weights[k] for k in WKEYS]
    outs = fn(audio, *carry_in, *w_in)
    out_audio = outs[0]
    if t_major:
        out_audio = out_audio.swapaxes(0, 1)
    out_audio = out_audio.reshape(s, t)
    new_carry = {k: v for (k, _), v in zip(CKEYS, outs[1:])}
    return new_carry, out_audio
