"""DeepFilterNet3: encoder + ERB-mask decoder + DF-coefficient decoder.

Architecture parity with the reference (df/deepfilternet3.py:100-456):

  Encoder: erb_conv0..3 (freq strides 1,2,2,1) over ERB features, df_conv0..1
  over re/im complex features, grouped-linear df_fc_emb folding the complex
  path into the embedding, Add/Concat combine, SqueezedGRU_S embedding GRU,
  sigmoid LSNR head scaled to [lsnr_min, lsnr_max].
  ErbDecoder: 1-layer SqueezedGRU_S + transposed-conv pathway with 1x1
  pathway convs from the encoder skips, sigmoid mask output.
  DfDecoder: 3-layer SqueezedGRU_S + df_convp pathway, grouped-linear +
  tanh coefficient head emitting [B, T, F', O*2].

Two execution modes over one parameter set:
  * `forward`: offline [B, T, ...] for training and batch enhancement;
  * `streaming_cell` + `streaming_init`: a per-frame step with explicit
    carry (conv time-context windows, GRU hiddens, DF ring buffer, feature
    norm states, STFT memories) designed to be driven by `lax.scan` — the
    TPU-native replacement for the reference's tract PulsedModel runtime.

All jit boundaries use real-valued re/im-split tensors; complex arithmetic
stays interior to the compiled program (the axon TPU runtime does not
transfer complex arrays across the host boundary).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepfilternet_tpu.config import DfParams, config
from deepfilternet_tpu.nn import (
    conv2d_norm_act_apply,
    conv2d_norm_act_step,
    ACT,
    conv_transpose2d_norm_act_apply,
    conv_transpose2d_norm_act_step,
    grouped_linear_apply,
    init_conv2d_norm_act,
    init_conv_transpose2d_norm_act,
    init_grouped_linear,
    init_linear,
    init_squeezed_gru_s,
    linear_apply,
    squeezed_gru_s_apply,
    squeezed_gru_s_step,
)
from deepfilternet_tpu.ops import erb_fb_matrices, erb_widths
from deepfilternet_tpu.ops.df_op import deep_filter, deep_filter_offline

PI = 3.1415926535897932384626433


class ModelParams3(DfParams):
    """deepfilternet section hyperparameters (deepfilternet3.py:25-78)."""

    section = "deepfilternet"

    def __init__(self):
        super().__init__()
        s = self.section
        self.conv_lookahead: int = config("CONV_LOOKAHEAD", cast=int, default=0, section=s)
        self.conv_ch: int = config("CONV_CH", cast=int, default=16, section=s)
        self.conv_kernel = tuple(
            int(v) for v in str(config("CONV_KERNEL", default="1,3", section=s)).split(",")
        )
        self.convt_kernel = tuple(
            int(v) for v in str(config("CONVT_KERNEL", default="1,3", section=s)).split(",")
        )
        self.conv_kernel_inp = tuple(
            int(v) for v in str(config("CONV_KERNEL_INP", default="3,3", section=s)).split(",")
        )
        self.emb_hidden_dim: int = config("EMB_HIDDEN_DIM", cast=int, default=256, section=s)
        self.emb_num_layers: int = config("EMB_NUM_LAYERS", cast=int, default=2, section=s)
        self.emb_gru_skip_enc: str = config("EMB_GRU_SKIP_ENC", default="none", section=s)
        self.emb_gru_skip: str = config("EMB_GRU_SKIP", default="none", section=s)
        self.df_hidden_dim: int = config("DF_HIDDEN_DIM", cast=int, default=256, section=s)
        self.df_gru_skip: str = config("DF_GRU_SKIP", default="none", section=s)
        self.df_pathway_kernel_size_t: int = config(
            "DF_PATHWAY_KERNEL_SIZE_T", cast=int, default=1, section=s
        )
        self.enc_concat: bool = config("ENC_CONCAT", cast=bool, default=False, section=s)
        self.df_num_layers: int = config("DF_NUM_LAYERS", cast=int, default=3, section=s)
        self.df_n_iter: int = config("DF_N_ITER", cast=int, default=1, section=s)
        self.lin_groups: int = config("LINEAR_GROUPS", cast=int, default=1, section=s)
        self.enc_lin_groups: int = config("ENC_LINEAR_GROUPS", cast=int, default=16, section=s)
        self.mask_pf: bool = config("MASK_PF", cast=bool, default=False, section=s)
        self.pf_beta: float = config("PF_BETA", cast=float, default=0.02, section=s)
        self.lsnr_dropout: bool = config("LSNR_DROPOUT", cast=bool, default=False, section=s)


def _skip_kind(name: str) -> Optional[str]:
    name = (name or "none").lower()
    return None if name == "none" else name


def init_dfnet3(key, p: Optional[ModelParams3] = None) -> Tuple[Dict, Dict, Dict]:
    """Initialize all parameters. Returns (params, state, cfg).

    cfg holds the static layer configs + hyperparameters needed by apply.
    """
    p = p or ModelParams3()
    assert p.nb_erb % 8 == 0, "erb_bins should be divisible by 8"
    ch = p.conv_ch
    emb_io_dim = ch * p.nb_erb // 4  # encoder output embedding width
    df_out_ch = p.df_order * 2

    keys = iter(jax.random.split(key, 32))
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    layer_cfg: Dict[str, Any] = {}

    def add_conv(name, *args, **kw):
        prm, st, c = init_conv2d_norm_act(next(keys), *args, **kw)
        params[name] = prm
        if st:
            state[name] = st
        layer_cfg[name] = c

    def add_convt(name, *args, **kw):
        prm, st, c = init_conv_transpose2d_norm_act(next(keys), *args, **kw)
        params[name] = prm
        if st:
            state[name] = st
        layer_cfg[name] = c

    # ---- encoder (deepfilternet3.py:103-185)
    add_conv("erb_conv0", 1, ch, p.conv_kernel_inp, bias=False, separable=True)
    add_conv("erb_conv1", ch, ch, p.conv_kernel, fstride=2, bias=False, separable=True)
    add_conv("erb_conv2", ch, ch, p.conv_kernel, fstride=2, bias=False, separable=True)
    add_conv("erb_conv3", ch, ch, p.conv_kernel, fstride=1, bias=False, separable=True)
    add_conv("df_conv0", 2, ch, p.conv_kernel_inp, bias=False, separable=True)
    add_conv("df_conv1", ch, ch, p.conv_kernel, fstride=2, bias=False, separable=True)
    params["df_fc_emb"] = init_grouped_linear(
        next(keys), ch * p.nb_df // 2, emb_io_dim, groups=p.enc_lin_groups
    )
    emb_in_dim = emb_io_dim * 2 if p.enc_concat else emb_io_dim
    params["enc_emb_gru"], layer_cfg["enc_emb_gru"] = init_squeezed_gru_s(
        next(keys),
        emb_in_dim,
        p.emb_hidden_dim,
        output_size=emb_io_dim,
        num_layers=1,
        linear_groups=p.lin_groups,
        skip=_skip_kind(p.emb_gru_skip_enc),
        linear_act="relu",
    )
    params["lsnr_fc"] = init_linear(next(keys), emb_io_dim, 1)

    # ---- erb decoder (deepfilternet3.py:188-254)
    params["dec_emb_gru"], layer_cfg["dec_emb_gru"] = init_squeezed_gru_s(
        next(keys),
        emb_io_dim,
        p.emb_hidden_dim,
        output_size=emb_io_dim,
        num_layers=p.emb_num_layers - 1,
        linear_groups=p.lin_groups,
        skip=_skip_kind(p.emb_gru_skip),
        linear_act="relu",
    )
    add_conv("conv3p", ch, ch, (1, 1), bias=False, separable=True)
    add_conv("convt3", ch, ch, p.conv_kernel, bias=False, separable=True)
    add_conv("conv2p", ch, ch, (1, 1), bias=False, separable=True)
    add_convt("convt2", ch, ch, p.convt_kernel, fstride=2, bias=False, separable=True)
    add_conv("conv1p", ch, ch, (1, 1), bias=False, separable=True)
    add_convt("convt1", ch, ch, p.convt_kernel, fstride=2, bias=False, separable=True)
    add_conv("conv0p", ch, ch, (1, 1), bias=False, separable=True)
    add_conv("conv0_out", ch, 1, p.conv_kernel, bias=False, separable=True, act="sigmoid")

    # ---- df decoder (deepfilternet3.py:278-331)
    params["df_gru"], layer_cfg["df_gru"] = init_squeezed_gru_s(
        next(keys),
        emb_io_dim,
        p.df_hidden_dim,
        output_size=None,
        num_layers=p.df_num_layers,
        # the reference DfDecoder omits linear_groups, inheriting the
        # SqueezedGRU_S signature default of 8 (df/modules.py:673,
        # deepfilternet3.py:297-305) — NOT p.lin_groups
        linear_groups=8,
        skip=None,
        linear_act="relu",
    )
    df_skip = _skip_kind(p.df_gru_skip)
    if df_skip == "groupedlinear":
        params["df_skip"] = init_grouped_linear(
            next(keys), emb_io_dim, p.df_hidden_dim, groups=p.lin_groups
        )
    kt = p.df_pathway_kernel_size_t
    add_conv("df_convp", ch, df_out_ch, (kt, 1), bias=False, separable=True)
    params["df_out"] = init_grouped_linear(
        next(keys), p.df_hidden_dim, p.nb_df * df_out_ch, groups=p.lin_groups
    )
    params["df_fc_a"] = init_linear(next(keys), p.df_hidden_dim, 1)

    widths = erb_widths(p.sr, p.fft_size, p.nb_erb, p.min_nb_freqs)
    cfg = dict(
        layers=layer_cfg,
        nb_erb=p.nb_erb,
        nb_df=p.nb_df,
        df_order=p.df_order,
        df_lookahead=p.df_lookahead,
        conv_ch=ch,
        emb_io_dim=emb_io_dim,
        enc_concat=p.enc_concat,
        df_gru_skip=df_skip,
        lsnr_min=p.lsnr_min,
        lsnr_max=p.lsnr_max,
        mask_pf=p.mask_pf,
        pf_beta=p.pf_beta,
        lsnr_dropout=p.lsnr_dropout,
        freq_bins=p.fft_size // 2 + 1,
        erb_widths=widths,
        erb_inv_fb=np.asarray(erb_fb_matrices(widths, normalized=True, inverse=True)),
        conv_kernel_inp=p.conv_kernel_inp,
        df_pathway_kt=kt,
        emb_num_layers=p.emb_num_layers,
        df_num_layers=p.df_num_layers,
        emb_hidden_dim=p.emb_hidden_dim,
        df_hidden_dim=p.df_hidden_dim,
    )
    return params, state, cfg


# ---------------------------------------------------------------------------
# offline forward
# ---------------------------------------------------------------------------


def _encoder(params, state, L, cfg, feat_erb, feat_spec, train):
    """feat_erb: [B,1,T,E]; feat_spec: [B,2,T,F'] -> (e0..e3, emb, c0, lsnr)."""
    ns = dict(state)

    def conv(name, x):
        out, st = conv2d_norm_act_apply(params[name], state.get(name, {}), L[name], x, train)
        if name in state:
            ns[name] = st
        return out

    e0 = conv("erb_conv0", feat_erb)
    e1 = conv("erb_conv1", e0)
    e2 = conv("erb_conv2", e1)
    e3 = conv("erb_conv3", e2)
    c0 = conv("df_conv0", feat_spec)
    c1 = conv("df_conv1", c0)
    b, _, t, _ = c1.shape
    cemb = jnp.transpose(c1, (0, 2, 3, 1)).reshape(b, t, -1)  # [B,T,F'/2*C]
    cemb = jax.nn.relu(grouped_linear_apply(params["df_fc_emb"], cemb))
    emb = jnp.transpose(e3, (0, 2, 3, 1)).reshape(b, t, -1)  # [B,T,E/4*C]
    if cfg["enc_concat"]:
        emb = jnp.concatenate([emb, cemb], axis=-1)
    else:
        emb = emb + cemb
    emb, _ = squeezed_gru_s_apply(params["enc_emb_gru"], L["enc_emb_gru"], emb)
    lsnr = jax.nn.sigmoid(linear_apply(params["lsnr_fc"], emb))
    lsnr = lsnr * (cfg["lsnr_max"] - cfg["lsnr_min"]) + cfg["lsnr_min"]
    return e0, e1, e2, e3, emb, c0, lsnr, ns


def _erb_decoder(params, state, L, cfg, emb, e3, e2, e1, e0, train):
    ns = dict(state)

    def conv(name, x):
        fn = (
            conv_transpose2d_norm_act_apply
            if L[name].get("transposed")
            else conv2d_norm_act_apply
        )
        out, st = fn(params[name], state.get(name, {}), L[name], x, train)
        if name in state:
            ns[name] = st
        return out

    b, _, t, f8 = e3.shape
    emb, _ = squeezed_gru_s_apply(params["dec_emb_gru"], L["dec_emb_gru"], emb)
    emb = jnp.transpose(emb.reshape(b, t, f8, -1), (0, 3, 1, 2))  # [B, C*8, T, F/8]
    e3 = conv("convt3", conv("conv3p", e3) + emb)
    e2 = conv("convt2", conv("conv2p", e2) + e3)
    e1 = conv("convt1", conv("conv1p", e1) + e2)
    m = conv("conv0_out", conv("conv0p", e0) + e1)  # [B,1,T,E] sigmoid
    return m, ns


def _df_decoder(params, state, L, cfg, emb, c0, train):
    ns = dict(state)
    b, t, _ = emb.shape
    c, _ = squeezed_gru_s_apply(params["df_gru"], L["df_gru"], emb)
    if cfg["df_gru_skip"] == "identity":
        c = c + emb
    elif cfg["df_gru_skip"] == "groupedlinear":
        c = c + grouped_linear_apply(params["df_skip"], emb)
    c0p, st = conv2d_norm_act_apply(params["df_convp"], state.get("df_convp", {}), L["df_convp"], c0, train)
    if "df_convp" in state:
        ns["df_convp"] = st
    c0p = jnp.transpose(c0p, (0, 2, 3, 1))  # [B, T, F', O*2]
    c = grouped_linear_apply(params["df_out"], c)
    c = jnp.tanh(c).reshape(b, t, cfg["nb_df"], cfg["df_order"] * 2) + c0p
    return c, ns


def forward(
    params: Dict,
    state: Dict,
    cfg: Dict,
    spec: jnp.ndarray,
    feat_erb: jnp.ndarray,
    feat_spec: jnp.ndarray,
    train: bool = False,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray], Dict]:
    """Offline forward.

    Args (real-valued at the jit boundary):
        spec:      [B, T, F, 2] noisy spectrum re/im.
        feat_erb:  [B, T, E] normalized ERB features.
        feat_spec: [B, T, F', 2] unit-normalized complex features re/im.
    Returns ((spec_e [B,T,F,2], mask [B,T,E], lsnr [B,T,1],
              df_coefs [B,O,T,F',2]), new_state).
    """
    L = cfg["layers"]
    feat_erb_in = feat_erb[:, None]  # [B,1,T,E]
    feat_spec_in = jnp.moveaxis(feat_spec, -1, 1)  # [B,2,T,F']

    e0, e1, e2, e3, emb, c0, lsnr, ns1 = _encoder(
        params, state, L, cfg, feat_erb_in, feat_spec_in, train
    )
    m, ns2 = _erb_decoder(params, {**state, **ns1}, L, cfg, emb, e3, e2, e1, e0, train)
    coefs, ns3 = _df_decoder(params, {**state, **ns1, **ns2}, L, cfg, emb, c0, train)
    new_state = {**state, **ns1, **ns2, **ns3}

    mask = m[:, 0]  # [B,T,E]
    if train and cfg.get("lsnr_dropout", False):
        # LSNR frame dropout (deepfilternet3.py:413-424): during training,
        # frames predicted quieter than -10 dB LSNR contribute zero mask
        # and zero DF coefficients. The reference gathers the active
        # frames and runs the decoders only on them; batched-TPU
        # equivalent: compute everywhere, select with a frame mask.
        active = (lsnr[..., 0] > -10.0).astype(mask.dtype)  # [B,T]
        mask = mask * active[:, :, None]
        coefs = coefs * active[:, :, None, None]
    spec_c = spec[..., 0] + 1j * spec[..., 1]  # [B,T,F]
    # ERB mask -> bin gains -> masked spectrum
    bin_gains = mask @ jnp.asarray(cfg["erb_inv_fb"])  # [B,T,F]
    spec_m = spec_c * bin_gains

    # DF coefficients [B,T,F',O*2] -> complex [B,O,T,F']
    b, t = coefs.shape[:2]
    coefs_ri = coefs.reshape(b, t, cfg["nb_df"], cfg["df_order"], 2)
    coefs_c = jnp.transpose(coefs_ri[..., 0] + 1j * coefs_ri[..., 1], (0, 3, 1, 2))
    if cfg.get("run_df", True):
        spec_e = deep_filter_offline(spec_c, coefs_c, cfg["nb_df"], cfg["df_lookahead"])
        spec_e = jnp.concatenate(
            [spec_e[..., : cfg["nb_df"]], spec_m[..., cfg["nb_df"] :]], axis=-1
        )
    else:
        # mask-only ablation (reference run_df=False, deepfilternet3.py:436):
        # coefs are still computed/returned; the DF op is just not applied
        spec_e = spec_m

    if cfg["mask_pf"]:
        beta = cfg["pf_beta"]
        eps = 1e-12
        g = jnp.clip(jnp.abs(spec_e) / (jnp.abs(spec_c) + eps), eps, 1.0)
        g_sin = jnp.maximum(g * jnp.sin(PI * g / 2.0), eps)
        pf = (1.0 + beta) / (1.0 + beta * (g / g_sin) ** 2)
        spec_e = spec_e * pf

    spec_e_ri = jnp.stack([jnp.real(spec_e), jnp.imag(spec_e)], axis=-1)
    df_coefs_out = jnp.transpose(coefs_ri, (0, 3, 1, 2, 4))  # [B,O,T,F',2]
    return (spec_e_ri, mask, lsnr, df_coefs_out), new_state


# ---------------------------------------------------------------------------
# streaming cell
# ---------------------------------------------------------------------------


class StreamState(NamedTuple):
    """Per-stream carry for the lax.scan streaming path."""

    erb_buf: jnp.ndarray  # [B, 1, kt0-1, E]   erb_conv0 time context
    spec_buf: jnp.ndarray  # [B, 2, kt0-1, F']  df_conv0 time context
    c0_buf: jnp.ndarray  # [B, C, ktp-1, F']  df_convp time context
    enc_gru_h: jnp.ndarray  # [1, B, H]
    dec_gru_h: jnp.ndarray  # [L1, B, H]
    df_gru_h: jnp.ndarray  # [L3, B, H]
    df_ring_re: jnp.ndarray  # [B, O-1, F']
    df_ring_im: jnp.ndarray  # [B, O-1, F']


def streaming_init(batch: int, cfg: Dict) -> StreamState:
    kt0 = cfg["conv_kernel_inp"][0]
    ktp = cfg["df_pathway_kt"]
    e = cfg["nb_erb"]
    fp = cfg["nb_df"]
    f = cfg["freq_bins"]
    o = cfg["df_order"]
    ch = cfg["conv_ch"]
    z = jnp.zeros
    return StreamState(
        erb_buf=z((batch, 1, kt0 - 1, e)),
        spec_buf=z((batch, 2, kt0 - 1, fp)),
        c0_buf=z((batch, ch, ktp - 1, fp)) if ktp > 1 else z((batch, ch, 0, fp)),
        enc_gru_h=z((1, batch, cfg["emb_hidden_dim"])),
        dec_gru_h=z((max(cfg["emb_num_layers"] - 1, 1), batch, cfg["emb_hidden_dim"])),
        df_gru_h=z((cfg["df_num_layers"], batch, cfg["df_hidden_dim"])),
        df_ring_re=z((batch, o - 1, fp)),
        df_ring_im=z((batch, o - 1, fp)),
    )


def merge_emb_heads(params: Dict) -> Tuple[Dict, Tuple]:
    """Merge every head that reads the post-encoder `emb` — lsnr_fc,
    dec_emb_gru.linear_in, df_gru.linear_in, df_skip — into ONE dense
    matmul: four sequential dispatches become one wide MXU op (PERF.md
    op-chain lever; the scan is dispatch-latency-bound, and the zero
    blocks from densifying the grouped heads are a few hundred kMACs).
    Grouped weights [g, ws, hs] densify block-diagonally, which preserves
    the group-major output ordering, so each head's output is a contiguous
    slice of the merged product. Originals stay in the tree (XLA
    dead-code-eliminates the unused path). Returns (params', spec); spec
    is a tuple of (head_name, width) in merge order.
    """
    from jax.scipy.linalg import block_diag

    def dense(w):  # grouped [g, ws, hs] -> block-diag [g*ws, g*hs]
        return block_diag(*[w[gi] for gi in range(w.shape[0])])

    heads = [
        ("lsnr", params["lsnr_fc"]["w"].T, params["lsnr_fc"].get("b")),
        ("dec", dense(params["dec_emb_gru"]["linear_in"]["w"]), None),
        ("df", dense(params["df_gru"]["linear_in"]["w"]), None),
    ]
    if "df_skip" in params:
        heads.append(("skip", dense(params["df_skip"]["w"]), None))
    isz = heads[0][1].shape[0]
    if any(w.shape[0] != isz for _, w, _ in heads):
        return params, ()  # heads disagree on emb width (custom config)
    out = dict(params)
    out["_emb_heads"] = {
        "w": jnp.concatenate([w for _, w, _ in heads], axis=1),
        "b": jnp.concatenate(
            [jnp.zeros((w.shape[1],), w.dtype) if b is None else b
             for _, w, b in heads]
        ),
    }
    return out, tuple((n, int(w.shape[1])) for n, w, _ in heads)


def merge_dec_df_gru0(params: Dict) -> Tuple[Dict, bool]:
    """Merge the first GRU layers of dec_emb_gru and df_gru into ONE
    matmul (PERF.md op-chain lever). Both read the merged-emb-heads
    outputs in the same cell position, and their gate matmuls are the two
    widest genuinely parallel MXU ops in the frame: stacking them
    block-diagonally over the concatenated [x_dec, x_df, h_dec, h_df]
    vector removes one sequential dispatch. Requires the fused w_cat
    layout (run fuse_gru_tree first). Gate math stays per-GRU (columns
    [4H_dec | 4H_df] slice apart). Returns (params', merged?).
    """
    try:
        l1 = params["dec_emb_gru"]["gru"]["layers"][0]
        l2 = params["df_gru"]["gru"]["layers"][0]
    except (KeyError, IndexError):
        return params, False
    if "w_cat" not in l1 or "w_cat" not in l2:
        return params, False
    w1, w2 = l1["w_cat"], l2["w_cat"]  # [(I+H), 4H]
    h1 = w1.shape[1] // 4
    h2 = w2.shape[1] // 4
    i1 = w1.shape[0] - h1
    i2 = w2.shape[0] - h2
    z = lambda r, c: jnp.zeros((r, c), w1.dtype)
    rows = [
        jnp.concatenate([w1[:i1], z(i1, 4 * h2)], axis=1),       # x_dec
        jnp.concatenate([z(i2, 4 * h1), w2[:i2]], axis=1),       # x_df
        jnp.concatenate([w1[i1:], z(h1, 4 * h2)], axis=1),       # h_dec
        jnp.concatenate([z(h2, 4 * h1), w2[i2:]], axis=1),       # h_df
    ]
    out = dict(params)
    out["_decdf_gru0"] = {
        "w": jnp.concatenate(rows, axis=0),
        "b": jnp.concatenate([l1["b_cat"], l2["b_cat"]]),
    }
    return out, True


def streaming_cell(
    params: Dict,
    state: Dict,
    cfg: Dict,
    carry: StreamState,
    spec_ri: jnp.ndarray,
    feat_erb: jnp.ndarray,
    feat_spec_ri: jnp.ndarray,
) -> Tuple[StreamState, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One frame of streaming DFN3 (tract.rs:509-642 semantics, lookahead 0).

    With zero lookahead, the causal DF ring buffer (frames t-O+1..t) plus
    this frame's coefficients reproduce the offline unfold exactly, so
    streaming output frame t equals offline output frame t bit-for-bit
    (modulo fp reassociation) — the property the reference validates via
    tract pulse tests.

    Args:
        spec_ri:      [B, F, 2] current noisy spectrum frame.
        feat_erb:     [B, E] normalized ERB features for this frame.
        feat_spec_ri: [B, F', 2] normalized complex features.
    Returns (new_carry, (enhanced_spec [B, F, 2], lsnr [B, 1], mask [B, E])).
    """
    L = cfg["layers"]
    nb_df = cfg["nb_df"]

    # -- conv frontend with carried time context
    erb_win = jnp.concatenate([carry.erb_buf, feat_erb[:, None, None, :]], axis=2)
    spec_feat_t = jnp.moveaxis(feat_spec_ri, -1, 1)[:, :, None, :]  # [B,2,1,F']
    spec_win = jnp.concatenate([carry.spec_buf, spec_feat_t], axis=2)

    def cstep(name, x):
        return conv2d_norm_act_step(params[name], state.get(name, {}), L[name], x)

    e0 = cstep("erb_conv0", erb_win)  # [B,C,E]
    e1 = cstep("erb_conv1", e0[:, :, None, :])
    e2 = cstep("erb_conv2", e1[:, :, None, :])
    e3 = cstep("erb_conv3", e2[:, :, None, :])
    c0 = cstep("df_conv0", spec_win)  # [B,C,F']
    c1 = cstep("df_conv1", c0[:, :, None, :])

    b = e0.shape[0]
    cemb = jnp.transpose(c1, (0, 2, 1)).reshape(b, -1)
    cemb = jax.nn.relu(grouped_linear_apply(params["df_fc_emb"], cemb))
    emb = jnp.transpose(e3, (0, 2, 1)).reshape(b, -1)
    emb = jnp.concatenate([emb, cemb], -1) if cfg["enc_concat"] else emb + cemb
    enc_h, emb = squeezed_gru_s_step(params["enc_emb_gru"], L["enc_emb_gru"], carry.enc_gru_h, emb)

    # merged emb heads (merge_emb_heads): one dense matmul feeds lsnr_fc,
    # the erb-decoder GRU input, the df-decoder GRU input, and the df skip
    eh = {}
    if cfg.get("emb_heads"):
        mh = params["_emb_heads"]
        merged = emb @ mh["w"] + mh["b"]
        off = 0
        for name, hs in cfg["emb_heads"]:
            eh[name] = merged[:, off : off + hs]
            off += hs
    lsnr_raw = eh["lsnr"] if "lsnr" in eh else linear_apply(params["lsnr_fc"], emb)
    lsnr = jax.nn.sigmoid(lsnr_raw)
    lsnr = lsnr * (cfg["lsnr_max"] - cfg["lsnr_min"]) + cfg["lsnr_min"]

    # -- erb decoder (+ df-decoder GRU layer 0 when pair-merged)
    df_h0 = None
    if cfg.get("decdf_gru0") and "dec" in eh and "df" in eh:
        # merge_dec_df_gru0: ONE matmul drives both first GRU layers
        from deepfilternet_tpu.nn.layers import gru_cell_from_gates

        x1 = ACT[L["dec_emb_gru"]["linear_act"]](eh["dec"])
        x2 = ACT[L["df_gru"]["linear_act"]](eh["df"])
        h1, h2 = carry.dec_gru_h[0], carry.df_gru_h[0]
        mp = params["_decdf_gru0"]
        g = jnp.concatenate([x1, x2, h1, h2], axis=-1) @ mp["w"] + mp["b"]
        nh1 = h1.shape[-1]
        h1n = gru_cell_from_gates(h1, g[..., : 4 * nh1])
        df_h0 = gru_cell_from_gates(h2, g[..., 4 * nh1 :])
        # remaining dec layers (none for DFN3 defaults) + linear_out/skip
        dec_p = params["dec_emb_gru"]
        out1, dec_hs = h1n, [h1n]
        from deepfilternet_tpu.nn.layers import _gru_cell_cat

        for li, lp in enumerate(dec_p["gru"]["layers"][1:], start=1):
            out1 = _gru_cell_cat(carry.dec_gru_h[li], out1,
                                 lp["w_cat"], lp["b_cat"])
            dec_hs.append(out1)
        dec_h = jnp.stack(dec_hs, axis=0)
        demb = out1
        if "linear_out" in dec_p:
            demb = ACT[L["dec_emb_gru"]["linear_act"]](
                grouped_linear_apply(dec_p["linear_out"], demb)
            )
        if L["dec_emb_gru"]["skip"] == "identity":
            demb = demb + emb
        elif L["dec_emb_gru"]["skip"] == "groupedlinear":
            demb = demb + grouped_linear_apply(dec_p["skip"], emb)
    else:
        dec_h, demb = squeezed_gru_s_step(
            params["dec_emb_gru"], L["dec_emb_gru"], carry.dec_gru_h, emb,
            xin=ACT[L["dec_emb_gru"]["linear_act"]](eh["dec"]) if "dec" in eh else None,
        )
    f4 = cfg["nb_erb"] // 4  # e3's freq size (two stride-2 encoder convs)
    demb = jnp.transpose(demb.reshape(b, f4, -1), (0, 2, 1))  # [B, C, F/4]

    def dstep(name, x):
        fn = conv_transpose2d_norm_act_step if L[name].get("transposed") else conv2d_norm_act_step
        return fn(params[name], state.get(name, {}), L[name], x[:, :, None, :])

    d3 = dstep("convt3", dstep("conv3p", e3) + demb)
    d2 = dstep("convt2", dstep("conv2p", e2) + d3)
    d1 = dstep("convt1", dstep("conv1p", e1) + d2)
    m = dstep("conv0_out", dstep("conv0p", e0) + d1)[:, 0]  # [B, E]

    # -- df decoder
    if df_h0 is not None:
        # layer 0 already computed in the pair-merged matmul above
        from deepfilternet_tpu.nn.layers import _gru_cell_cat

        out2, df_hs = df_h0, [df_h0]
        for li, lp in enumerate(params["df_gru"]["gru"]["layers"][1:], start=1):
            out2 = _gru_cell_cat(carry.df_gru_h[li], out2,
                                 lp["w_cat"], lp["b_cat"])
            df_hs.append(out2)
        df_h, c = jnp.stack(df_hs, axis=0), out2
        if "linear_out" in params["df_gru"]:
            c = ACT[L["df_gru"]["linear_act"]](
                grouped_linear_apply(params["df_gru"]["linear_out"], c)
            )
    else:
        df_h, c = squeezed_gru_s_step(
            params["df_gru"], L["df_gru"], carry.df_gru_h, emb,
            xin=ACT[L["df_gru"]["linear_act"]](eh["df"]) if "df" in eh else None,
        )
    if cfg["df_gru_skip"] == "identity":
        c = c + emb
    elif cfg["df_gru_skip"] == "groupedlinear":
        c = c + (eh["skip"] if "skip" in eh
                 else grouped_linear_apply(params["df_skip"], emb))
    ktp = cfg["df_pathway_kt"]
    if ktp > 1:
        c0_win = jnp.concatenate([carry.c0_buf, c0[:, :, None, :]], axis=2)
    else:
        c0_win = c0[:, :, None, :]
    c0p = conv2d_norm_act_step(params["df_convp"], state.get("df_convp", {}), L["df_convp"], c0_win)
    c0p = jnp.transpose(c0p, (0, 2, 1))  # [B, F', O*2]
    coefs = jnp.tanh(grouped_linear_apply(params["df_out"], c))
    coefs = coefs.reshape(b, nb_df, cfg["df_order"], 2) + c0p.reshape(
        b, nb_df, cfg["df_order"], 2
    )
    coefs_c = coefs[..., 0] + 1j * coefs[..., 1]  # [B, F', O]
    coefs_c = jnp.moveaxis(coefs_c, -1, 1)  # [B, O, F']

    # -- apply: DF over ring buffer (current + O-1 past low-band frames)
    spec_c = spec_ri[..., 0] + 1j * spec_ri[..., 1]  # [B, F]
    ring = carry.df_ring_re + 1j * carry.df_ring_im
    new_ring, y_lo = deep_filter(ring, spec_c[:, :nb_df], coefs_c)

    # upper bins: ERB mask applied to the *current* frame (offline semantics:
    # gains at frame t apply to spec frame t)
    bin_gains = m @ jnp.asarray(cfg["erb_inv_fb"])  # [B, F]
    spec_m = spec_c * bin_gains
    if cfg.get("run_df", True):
        spec_e = jnp.concatenate([y_lo, spec_m[:, nb_df:]], axis=-1)
    else:
        spec_e = spec_m  # mask-only ablation; ring still advances (toggle-safe)

    if cfg["mask_pf"]:
        beta = cfg["pf_beta"]
        eps = 1e-12
        g = jnp.clip(jnp.abs(spec_e) / (jnp.abs(spec_c) + eps), eps, 1.0)
        g_sin = jnp.maximum(g * jnp.sin(PI * g / 2.0), eps)
        spec_e = spec_e * ((1.0 + beta) / (1.0 + beta * (g / g_sin) ** 2))

    new_carry = StreamState(
        erb_buf=erb_win[:, :, 1:] if cfg["conv_kernel_inp"][0] > 1 else carry.erb_buf,
        spec_buf=spec_win[:, :, 1:] if cfg["conv_kernel_inp"][0] > 1 else carry.spec_buf,
        c0_buf=c0_win[:, :, 1:] if ktp > 1 else carry.c0_buf,
        enc_gru_h=enc_h,
        dec_gru_h=dec_h,
        df_gru_h=df_h,
        df_ring_re=jnp.real(new_ring),
        df_ring_im=jnp.imag(new_ring),
    )
    spec_e_ri = jnp.stack([jnp.real(spec_e), jnp.imag(spec_e)], axis=-1)
    return new_carry, (spec_e_ri, lsnr, m)


# ---------------------------------------------------------------------------
# chunked streaming forward: offline batching with explicit carried state
# ---------------------------------------------------------------------------


def forward_chunk(
    params: Dict,
    state: Dict,
    cfg: Dict,
    carry: StreamState,
    spec: jnp.ndarray,
    feat_erb: jnp.ndarray,
    feat_spec: jnp.ndarray,
) -> Tuple[StreamState, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Process a chunk of T frames with streaming semantics but offline
    batching: conv/linear/DF work is frame-parallel (big MXU matmuls);
    only the GRU recurrences scan over frames. Bit-matches running the
    per-frame streaming_cell T times (the state-passing offline form that
    makes the XLA while-loop body minimal).

    spec [B,T,F,2], feat_erb [B,T,E], feat_spec [B,T,F',2] ->
    (carry', (spec_e [B,T,F,2], lsnr [B,T,1], mask [B,T,E])).
    """
    L = cfg["layers"]
    nb_df = cfg["nb_df"]
    ctx = cfg["conv_kernel_inp"][0] - 1
    b, t = feat_erb.shape[:2]

    # prepend carried context frames; conv outputs for the context rows are
    # discarded below
    fe_ctx = carry.erb_buf[:, 0]  # [B, ctx, E]
    fs_ctx = jnp.moveaxis(carry.spec_buf, 1, -1)  # [B, ctx, F', 2]
    fe = jnp.concatenate([fe_ctx, feat_erb], axis=1)
    fs = jnp.concatenate([fs_ctx, feat_spec], axis=1)

    def conv(name, x):
        fn = (
            conv_transpose2d_norm_act_apply
            if L[name].get("transposed")
            else conv2d_norm_act_apply
        )
        out, _ = fn(params[name], state.get(name, {}), L[name], x, False)
        return out

    e0x = conv("erb_conv0", fe[:, None])           # [B,C,ctx+T,E]
    e0 = e0x[:, :, ctx:]
    e1 = conv("erb_conv1", e0)
    e2 = conv("erb_conv2", e1)
    e3 = conv("erb_conv3", e2)
    c0x = conv("df_conv0", jnp.moveaxis(fs, -1, 1))
    c0 = c0x[:, :, ctx:]
    c1 = conv("df_conv1", c0)

    cemb = jnp.transpose(c1, (0, 2, 3, 1)).reshape(b, t, -1)
    cemb = jax.nn.relu(grouped_linear_apply(params["df_fc_emb"], cemb))
    emb = jnp.transpose(e3, (0, 2, 3, 1)).reshape(b, t, -1)
    emb = jnp.concatenate([emb, cemb], -1) if cfg["enc_concat"] else emb + cemb
    emb, enc_h = squeezed_gru_s_apply(
        params["enc_emb_gru"], L["enc_emb_gru"], emb, carry.enc_gru_h
    )
    lsnr = jax.nn.sigmoid(linear_apply(params["lsnr_fc"], emb))
    lsnr = lsnr * (cfg["lsnr_max"] - cfg["lsnr_min"]) + cfg["lsnr_min"]

    demb, dec_h = squeezed_gru_s_apply(
        params["dec_emb_gru"], L["dec_emb_gru"], emb, carry.dec_gru_h
    )
    f8 = e3.shape[-1]
    demb = jnp.transpose(demb.reshape(b, t, f8, -1), (0, 3, 1, 2))
    d3 = conv("convt3", conv("conv3p", e3) + demb)
    d2 = conv("convt2", conv("conv2p", e2) + d3)
    d1 = conv("convt1", conv("conv1p", e1) + d2)
    m = conv("conv0_out", conv("conv0p", e0) + d1)[:, 0]  # [B,T,E]

    c, df_h = squeezed_gru_s_apply(params["df_gru"], L["df_gru"], emb, carry.df_gru_h)
    if cfg["df_gru_skip"] == "identity":
        c = c + emb
    elif cfg["df_gru_skip"] == "groupedlinear":
        c = c + grouped_linear_apply(params["df_skip"], emb)
    ktp = cfg["df_pathway_kt"]
    if ktp > 1:
        c0_ext = jnp.concatenate([carry.c0_buf, c0], axis=2)
        c0p = conv("df_convp", c0_ext)[:, :, ktp - 1 :]
        new_c0_buf = c0_ext[:, :, -(ktp - 1) :]
    else:
        c0p = conv("df_convp", c0)
        new_c0_buf = carry.c0_buf
    c0p = jnp.transpose(c0p, (0, 2, 3, 1))  # [B,T,F',O*2]
    coefs = jnp.tanh(grouped_linear_apply(params["df_out"], c))
    coefs = coefs.reshape(b, t, nb_df, cfg["df_order"] * 2) + c0p
    coefs_ri = coefs.reshape(b, t, nb_df, cfg["df_order"], 2)
    coefs_c = jnp.transpose(coefs_ri[..., 0] + 1j * coefs_ri[..., 1], (0, 3, 1, 2))

    spec_c = spec[..., 0] + 1j * spec[..., 1]
    # DF with carried ring history: prepend O-1 past low-band frames
    ring = carry.df_ring_re + 1j * carry.df_ring_im  # [B, O-1, F']
    lo_ext = jnp.concatenate([ring, spec_c[..., :nb_df]], axis=1)  # [B, O-1+T, F']
    order = cfg["df_order"]
    taps = [lo_ext[:, n : n + t] for n in range(order)]  # tap n = frame t-(O-1)+n
    un = jnp.stack(taps, axis=-1)  # [B, T, F', O]
    y_lo = jnp.sum(un * jnp.moveaxis(coefs_c, 1, -1), axis=-1)

    bin_gains = m @ jnp.asarray(cfg["erb_inv_fb"])
    spec_m = spec_c * bin_gains
    if cfg.get("run_df", True):
        spec_e = jnp.concatenate([y_lo, spec_m[..., nb_df:]], axis=-1)
    else:
        spec_e = spec_m  # mask-only ablation; ring still advances (toggle-safe)
    if cfg["mask_pf"]:
        beta = cfg["pf_beta"]
        eps = 1e-12
        g = jnp.clip(jnp.abs(spec_e) / (jnp.abs(spec_c) + eps), eps, 1.0)
        g_sin = jnp.maximum(g * jnp.sin(PI * g / 2.0), eps)
        spec_e = spec_e * ((1.0 + beta) / (1.0 + beta * (g / g_sin) ** 2))

    new_carry = StreamState(
        erb_buf=fe[:, -ctx:][:, None] if ctx > 0 else carry.erb_buf,
        spec_buf=jnp.moveaxis(fs[:, -ctx:], -1, 1) if ctx > 0 else carry.spec_buf,
        c0_buf=new_c0_buf,
        enc_gru_h=enc_h,
        dec_gru_h=dec_h,
        df_gru_h=df_h,
        df_ring_re=jnp.real(lo_ext[:, -(order - 1) :]) if order > 1 else carry.df_ring_re,
        df_ring_im=jnp.imag(lo_ext[:, -(order - 1) :]) if order > 1 else carry.df_ring_im,
    )
    spec_e_ri = jnp.stack([jnp.real(spec_e), jnp.imag(spec_e)], axis=-1)
    return new_carry, (spec_e_ri, lsnr, m)
