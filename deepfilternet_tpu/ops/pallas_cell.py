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


# ordered weight keys; the kernel receives them as refs in this order
WKEYS: List[str] = [
    "dft",        # [960, 1024]  cols 0:512 cos, 512:1024 sin (F padded)
    "imult",      # [1, 1024]    f32 row scaling turning dft^T into the iDFT
    "erb_fwd",    # [512, 32]
    "erb_inv",    # [32, 512]
    "e0_w", "e0_b", "e1_w", "e1_b", "e2_w", "e2_b", "e3_w", "e3_b",
    "c0_w", "c0_b", "c1_w", "c1_b", "gl_w",
    "p3_w", "p3_b", "t3_w", "t3_b", "p2_w", "p2_b", "t2_w", "t2_b",
    "p1_w", "p1_b", "t1_w", "t1_b", "p0_w", "p0_b", "out_w", "out_b",
    "p_demb",
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
    imult = np.concatenate([mult, mult]) / _wnorm(FFT, HOP)
    W["imult"] = imult[None, :].astype(np.float32)

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
    # absorbs the matching zero input rows
    nb_df_ = cfg["nb_df"]
    c0w, c0b = W["c0_w"], W["c0_b"]
    c0w_p = np.zeros((c0w.shape[0], ch * BLK), np.float32)
    c0b_p = np.zeros((1, ch * BLK), np.float32)
    c1w_p = np.zeros((ch * BLK, W["c1_w"].shape[1]), np.float32)
    for ci in range(ch):
        src_sl = slice(ci * nb_df_, (ci + 1) * nb_df_)
        dst_sl = slice(ci * BLK, ci * BLK + nb_df_)
        c0w_p[:, dst_sl] = c0w[:, src_sl]
        c0b_p[:, dst_sl] = c0b[:, src_sl]
        c1w_p[dst_sl, :] = W["c1_w"][src_sl, :]
    W["c0_w"], W["c0_b"], W["c1_w"] = c0w_p, c0b_p, c1w_p
    W["gl_w"] = np.asarray(F["gl"])
    W["p_demb"] = np.asarray(F["p_demb"])
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
        return ("_b" in k and not k.endswith("_w")) or k == "imult"

    wj = {
        k: jnp.asarray(v, jnp.float32 if _is_bias(k) else matmul_dtype)
        for k, v in W.items()
    }
    return wj, statics


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------


def _gru_cell(h, gi, ghw, b_hh, mm):
    gh = mm(h, ghw) + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _frame_math(W: Dict[str, Any], st: CellStatics, c: Dict[str, jnp.ndarray],
                frame: jnp.ndarray, mdtype) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Pure-jnp one-frame computation on values.

    c: carry dict (f32 values). frame: [S, hop] f32.
    Returns (new carry dict, out frame [S, hop] f32). Used verbatim inside
    the Pallas kernel; also runs under jit for CPU parity tests.
    """
    relu = jax.nn.relu
    nb_df = st.nb_df
    e = st.nb_erb

    def mm(x, w):
        return jnp.dot(x.astype(mdtype), w, preferred_element_type=jnp.float32)

    nc = dict(c)

    # -- analysis (windowed real-DFT, wnorm folded into the matrix)
    buf = jnp.concatenate([c["amem"], frame], axis=-1)  # [S, 960]
    nc["amem"] = buf[:, HOP:]
    spec2 = mm(buf, W["dft"])  # [S, 1024]
    spec_re = spec2[:, :FPAD]
    spec_im = spec2[:, FPAD:]

    # -- features (feat_erb / feat_cplx with exponential norms)
    power = spec_re * spec_re + spec_im * spec_im  # [S, 512]
    erb_db = 10.0 * jnp.log10(mm(power, W["erb_fwd"]) + 1e-10)  # [S, 32]
    mean = c["norms"][:, :e]
    unit = c["norms"][:, e:]
    a = st.alpha
    new_mean = erb_db * (1.0 - a) + mean * a
    feat_erb = (erb_db - new_mean) / 40.0
    mag_lo = jnp.sqrt(power[:, :nb_df])
    new_unit = mag_lo * (1.0 - a) + unit[:, :nb_df] * a
    nc["norms"] = jnp.concatenate([new_mean, new_unit], axis=-1)
    un_scale = jax.lax.rsqrt(new_unit)
    fs_re = spec_re[:, :nb_df] * un_scale
    fs_im = spec_im[:, :nb_df] * un_scale

    # -- conv frontend (dense folds; layouts per dfnet3_fused.build_fused)
    erb_win = jnp.concatenate([c["erb_ctx"], feat_erb], axis=-1)  # [S, 96]
    nc["erb_ctx"] = erb_win[:, e:]
    sc = c["spec_ctx"]  # [S, 384]: (c, t, f) for 2 past frames
    spec_win = jnp.concatenate(
        [sc[:, :192], fs_re, sc[:, 192:], fs_im], axis=-1
    )  # [S, 576]: (c, t, f) over 3 frames
    nc["spec_ctx"] = jnp.concatenate(
        [spec_win[:, 96:288], spec_win[:, 384:576]], axis=-1
    )

    e0 = relu(mm(erb_win, W["e0_w"]) + W["e0_b"])     # [S, 512]
    e1 = relu(mm(e0, W["e1_w"]) + W["e1_b"])          # [S, 256]
    e2 = relu(mm(e1, W["e2_w"]) + W["e2_b"])          # [S, 128]
    e3 = relu(mm(e2, W["e3_w"]) + W["e3_b"])          # [S, 128] (F,C) flat
    c0 = relu(mm(spec_win, W["c0_w"]) + W["c0_b"])    # [S, 1536] (C,F) flat
    c1 = relu(mm(c0, W["c1_w"]) + W["c1_b"])          # [S, 768] (F,C) flat
    cemb = relu(mm(c1, W["gl_w"]))                    # [S, 128]
    emb = e3 + cemb

    # -- encoder GRU + lsnr head
    xin = relu(mm(emb, W["enc_lin_in"]))
    gi = mm(xin, W["enc_wih"]) + W["enc_bih"]
    enc_h = _gru_cell(c["enc_h"], gi, W["enc_whh"], W["enc_bhh"], mm)
    nc["enc_h"] = enc_h
    emb = relu(mm(enc_h, W["enc_lin_out"]))           # [S, 128]
    lsnr = jax.nn.sigmoid(mm(emb, W["lsnr_w"]) + W["lsnr_b"])
    lsnr = lsnr * (st.lsnr_max - st.lsnr_min) + st.lsnr_min  # [S, 1]

    # -- erb decoder
    xdec = relu(mm(emb, W["dec_lin_in"]))
    gid = mm(xdec, W["dec_wih"]) + W["dec_bih"]
    dec_h = _gru_cell(c["dec_h"], gid, W["dec_whh"], W["dec_bhh"], mm)
    nc["dec_h"] = dec_h
    demb = relu(mm(dec_h, W["dec_lin_out"]))          # [S, 128] (F,C) flat
    demb_cf = mm(demb, W["p_demb"])                   # (C,F) flat
    d3 = relu(mm(relu(mm(e3, W["p3_w"]) + W["p3_b"]) + demb_cf, W["t3_w"]) + W["t3_b"])
    d2 = relu(mm(relu(mm(e2, W["p2_w"]) + W["p2_b"]) + d3, W["t2_w"]) + W["t2_b"])
    d1 = relu(mm(relu(mm(e1, W["p1_w"]) + W["p1_b"]) + d2, W["t1_w"]) + W["t1_b"])
    m = jax.nn.sigmoid(
        mm(relu(mm(e0, W["p0_w"]) + W["p0_b"]) + d1, W["out_w"]) + W["out_b"]
    )  # [S, 32]

    # -- df decoder (3-layer GRU; coefficient heads in (n, ri, f) blocks)
    xdf = relu(mm(emb, W["df_lin_in"]))
    h_in = xdf
    new_df_h = []
    for li in range(3):
        gil = mm(h_in, W[f"df_wih{li}"]) + W[f"df_bih{li}"]
        h_li = _gru_cell(
            c["df_h"][:, li * 256 : (li + 1) * 256], gil,
            W[f"df_whh{li}"], W[f"df_bhh{li}"], mm,
        )
        new_df_h.append(h_li)
        h_in = h_li
    nc["df_h"] = jnp.concatenate(new_df_h, axis=-1)
    coefs_t = jnp.tanh(mm(h_in, W["df_out_w"]))  # [S, O*2*BLK] aligned blocks
    # df_convp as its true [16 -> 10] channel map: c0 viewed [S, C, BLK] (a
    # free 128-aligned reshape of its padded (c, f)-flat layout) contracted
    # over C, emitting [O*2, S, BLK] so each tap's coefficients are a
    # leading-dim slice
    s_rows = c0.shape[0]
    c0v = c0.reshape(s_rows, 16, BLK)
    cp = jax.lax.dot_general(
        W["convp_co"], c0v.astype(W["convp_co"].dtype),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [O*2, S, BLK]

    # -- deep filter MAC over the ring buffer (tract.rs:724-767); all
    # blocks BLK-wide with zeros in the 96..128 pad lanes (taps are zero
    # there, so the MAC output stays zero in the pad)
    lane_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1) < nb_df
    ).astype(jnp.float32)
    y_re = jnp.zeros((s_rows, BLK), jnp.float32)
    y_im = jnp.zeros((s_rows, BLK), jnp.float32)
    cur_re = spec_re[:, :BLK] * lane_mask
    cur_im = spec_im[:, :BLK] * lane_mask
    for n in range(st.df_order):
        if n < st.df_order - 1:
            t_re = c["ring_re"][:, n * BLK : (n + 1) * BLK]
            t_im = c["ring_im"][:, n * BLK : (n + 1) * BLK]
        else:
            t_re, t_im = cur_re, cur_im
        c_re = (coefs_t[:, (2 * n) * BLK : (2 * n + 1) * BLK]
                + relu(cp[2 * n] + W["convp_b"][0, 2 * n]))
        c_im = (coefs_t[:, (2 * n + 1) * BLK : (2 * n + 2) * BLK]
                + relu(cp[2 * n + 1] + W["convp_b"][0, 2 * n + 1]))
        y_re = y_re + t_re * c_re - t_im * c_im
        y_im = y_im + t_re * c_im + t_im * c_re
    nc["ring_re"] = jnp.concatenate([c["ring_re"][:, BLK:], cur_re], axis=-1)
    nc["ring_im"] = jnp.concatenate([c["ring_im"][:, BLK:], cur_im], axis=-1)

    # -- ERB mask on the upper bins
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
        ls = lsnr  # [S, 1]
        below = ls < st.gate_lsnr_min
        erb_only = (ls > st.gate_lsnr_max_df) & (ls <= st.gate_lsnr_max_erb)
        bypass = ls > st.gate_lsnr_max_erb
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
    ctr = jnp.where(quiet, c["sil"][:, :1] + 1.0, 0.0)
    nc["sil"] = jnp.concatenate([ctr, c["sil"][:, 1:]], axis=-1)
    mute = ctr >= st.silence_frames
    se_re = jnp.where(mute, 0.0, se_re)
    se_im = jnp.where(mute, 0.0, se_im)

    # -- synthesis: windowed iDFT as the row-rescaled transposed DFT
    # matrix (see build_cell_weights), then overlap-add
    se = jnp.concatenate([se_re, se_im], axis=-1) * W["imult"]  # [S, 1024]
    x = jax.lax.dot_general(
        se.astype(mdtype), W["dft"],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, 960]
    out = x[:, :HOP] + c["smem"]
    nc["smem"] = x[:, HOP:]
    return nc, out


def make_cell_kernel(statics: CellStatics, s_blk: int, chunk: int, mdtype):
    """Returns the kernel function over refs for grid (s_blocks, chunks).

    Frames iterate via lax.fori_loop (not Python unrolling): the Mosaic
    compile time of the unrolled body grows superlinearly with
    s_blk x chunk (>15 min at 512x8), while the loop form compiles the
    body once and costs only an in-kernel branch per frame.
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
        c0 = tuple(co[...] for co in cout)

        def body(f, carry):
            c = {k: v for (k, _), v in zip(CKEYS, carry)}
            # audio refs are [s_blk, chunk, HOP]: indexing the frame on a
            # non-lane dimension keeps the access 128-aligned (a dynamic
            # lane offset of f*480 cannot be proven aligned)
            frame = audio_ref[:, f, :]
            c, out = _frame_math(W, statics, c, frame, mdtype)
            aout_ref[:, f, :] = out
            return tuple(c[k] for k, _ in CKEYS)

        c_final = jax.lax.fori_loop(0, chunk, body, c0)
        for (k, _), co, v in zip(CKEYS, cout, c_final):
            co[...] = v

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("statics", "s_blk", "chunk", "mdtype", "interpret"),
)
def cell_process(audio, carry, weights, statics: CellStatics, s_blk: int,
                 chunk: int, mdtype=jnp.bfloat16, interpret: bool = False):
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

    kernel = make_cell_kernel(statics, s_blk, chunk, mdtype)

    audio = audio.reshape(s, n_frames, HOP)
    audio_spec = pl.BlockSpec(
        (s_blk, chunk, HOP), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
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
    out_shapes = tuple(
        [jax.ShapeDtypeStruct((s, n_frames, HOP), jnp.float32)]
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
            # larger, so raise the cap for this kernel
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    carry_in = [carry[k] for k, _ in CKEYS]
    w_in = [weights[k] for k in WKEYS]
    outs = fn(audio, *carry_in, *w_in)
    out_audio = outs[0].reshape(s, t)
    new_carry = {k: v for (k, _), v in zip(CKEYS, outs[1:])}
    return new_carry, out_audio
