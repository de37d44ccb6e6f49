"""DeepFilterNet (v1) (reference: df/deepfilternet.py + convkxf builder).

Generation-1 specifics versus DFN2/3:
  * convkxf blocks: time kernel k=2 in the encoder, k=1 in the decoder;
    depthwise groups = min(in, out) with divisibility fallback (NOT the
    gcd rule of Conv2dNormAct) even for 1x1 convs, + pointwise when
    grouped; conv bias only when batch_norm is off (df/modules.py:129-193);
  * encoder GroupedGRU directly on the 128-dim embedding, no decoder GRU
    (the ErbDecoder consumes the encoder embedding through fc_emb);
  * DfDecoder: GroupedGRU + plain Linear+Tanh coefficient head with
    linear-style [B,T,O*2,F'] reshape + df_fc_a alpha head;
  * DfOp real_unfold on the masked spectrum with alpha blending.
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
    conv_transpose2d_norm_act_apply,
    conv_transpose2d_norm_act_step,
    grouped_gru_apply,
    grouped_gru_step,
    grouped_linear_shuffle_apply,
    init_conv2d_norm_act,
    init_conv_transpose2d_norm_act,
    init_grouped_gru,
    init_grouped_linear_shuffle,
    init_linear,
    linear_apply,
)
from deepfilternet_tpu.ops import erb_fb_matrices, erb_widths
from deepfilternet_tpu.ops.df_op import deep_filter, deep_filter_offline
from deepfilternet_tpu.ops.postfilter import post_filter_mask


class ModelParams1(DfParams):
    section = "deepfilternet"

    def __init__(self):
        super().__init__()
        s = self.section
        self.conv_lookahead: int = config("CONV_LOOKAHEAD", cast=int, default=0, section=s)
        self.conv_k_enc: int = config("CONV_K_ENC", cast=int, default=2, section=s)
        self.conv_k_dec: int = config("CONV_K_DEC", cast=int, default=1, section=s)
        self.conv_ch: int = config("CONV_CH", cast=int, default=16, section=s)
        self.conv_width_f: int = config("CONV_WIDTH_FACTOR", cast=int, default=1, section=s)
        self.conv_dec_mode: str = config("CONV_DEC_MODE", default="transposed", section=s)
        self.conv_depthwise: bool = config("CONV_DEPTHWISE", cast=bool, default=True, section=s)
        self.convt_depthwise: bool = config("CONVT_DEPTHWISE", cast=bool, default=True, section=s)
        self.emb_hidden_dim: int = config("EMB_HIDDEN_DIM", cast=int, default=256, section=s)
        self.emb_num_layers: int = config("EMB_NUM_LAYERS", cast=int, default=1, section=s)
        self.df_hidden_dim: int = config("DF_HIDDEN_DIM", cast=int, default=256, section=s)
        self.df_num_layers: int = config("DF_NUM_LAYERS", cast=int, default=3, section=s)
        self.gru_groups: int = config("GRU_GROUPS", cast=int, default=1, section=s)
        self.lin_groups: int = config("LINEAR_GROUPS", cast=int, default=1, section=s)
        self.group_shuffle: bool = config("GROUP_SHUFFLE", cast=bool, default=True, section=s)
        self.dfop_method: str = config("DFOP_METHOD", cast=str, default="real_unfold", section=s)
        self.mask_pf: bool = config("MASK_PF", cast=bool, default=False, section=s)
        self.pf_beta: float = config("PF_BETA", cast=float, default=0.02, section=s)


def _convkxf_groups(in_ch: int, out_ch: int, depthwise: bool,
                    complex_in: bool = False) -> int:
    """convkxf group rule (df/modules.py:155-162)."""
    groups = min(in_ch, out_ch) if depthwise else 1
    if in_ch % groups != 0 or out_ch % groups != 0:
        groups = 1
    if complex_in and groups % 2 == 0:
        groups //= 2
    return groups


def init_dfnet1(key, p: Optional[ModelParams1] = None) -> Tuple[Dict, Dict, Dict]:
    p = p or ModelParams1()
    assert p.nb_erb % 8 == 0
    ch = p.conv_ch
    wf = p.conv_width_f
    emb_dim = ch * p.nb_erb // 4 * wf**2  # encoder flat embedding (128)
    df_out_ch = p.df_order * 2
    k_enc = p.conv_k_enc
    k0 = 1 if k_enc == 1 and p.conv_lookahead == 0 else max(2, k_enc)
    k_dec = p.conv_k_dec

    keys = iter(jax.random.split(key, 40))
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    L: Dict[str, Any] = {}

    def add_kxf(name, in_ch, out_ch, k, f=3, fstride=2, norm=True, act="relu",
                depthwise=True, complex_in=False, transposed=False):
        groups = _convkxf_groups(in_ch, out_ch, depthwise, complex_in)
        # convkxf appends the 1x1 pointwise whenever groups > 1, regardless
        # of kernel size — pass separable so init keeps the pw conv
        kw = dict(
            fstride=1 if f == 1 else fstride,
            bias=not norm,
            separable=groups > 1,
            norm=norm,
            act=act,
        )
        if not transposed:
            kw["groups"] = groups
            kw["force_pw"] = True  # convkxf keeps the 1x1 even for k=f=1
        if transposed:
            # transposed path: gcd == min for the square channel counts used
            # here, so the default grouping rule matches convkxf
            prm, st, c = init_conv_transpose2d_norm_act(next(keys), in_ch, out_ch, (k, f), **kw)
        else:
            prm, st, c = init_conv2d_norm_act(next(keys), in_ch, out_ch, (k, f), **kw)
        # convkxf uses fpad=(f-1)//2 (not the +dilation-1 Conv2dNormAct rule,
        # identical for dilation=1) and always keeps the pointwise for
        # grouped convs even at kernel 1x1
        params[name] = prm
        if st:
            state[name] = st
        L[name] = c

    # encoder (deepfilternet.py:66-137)
    add_kxf("erb_conv0", 1, ch, k0, fstride=1, depthwise=p.conv_depthwise)
    add_kxf("erb_conv1", ch * wf**0, ch * wf**1, k_enc, depthwise=p.conv_depthwise)
    add_kxf("erb_conv2", ch * wf**1, ch * wf**2, k_enc, depthwise=p.conv_depthwise)
    add_kxf("erb_conv3", ch * wf**2, ch * wf**2, k_enc, fstride=1, depthwise=p.conv_depthwise)
    add_kxf("df_conv0", 2, ch, k0, fstride=1, depthwise=p.conv_depthwise)
    add_kxf("df_conv1", ch, ch * wf**1, k_enc, depthwise=p.conv_depthwise)
    # reference enc.df_fc_emb is GroupedLinear with its signature default
    # shuffle=True (deepfilternet.py:92-94, modules.py:832) — degenerate
    # no-op at groups==1, but must shuffle for lin_groups>1
    params["df_fc_emb"], L["df_fc_emb"] = init_grouped_linear_shuffle(
        next(keys), ch * p.nb_df // 2, emb_dim, groups=p.lin_groups, shuffle=True
    )
    params["enc_emb_gru"], L["enc_emb_gru"] = init_grouped_gru(
        next(keys), emb_dim, p.emb_hidden_dim, num_layers=p.emb_num_layers,
        groups=p.gru_groups, shuffle=p.group_shuffle, add_outputs=True,
    )
    params["lsnr_fc"] = init_linear(next(keys), p.emb_hidden_dim, 1)

    # erb decoder (deepfilternet.py:140-185)
    emb_width = ch * wf**2
    params["dec_fc_emb"], L["dec_fc_emb"] = init_grouped_linear_shuffle(
        next(keys), p.emb_hidden_dim, emb_width * (p.nb_erb // 4),
        groups=p.lin_groups, shuffle=p.group_shuffle,
    )
    add_kxf("conv3p", ch * wf**2, emb_width, 1, f=1, depthwise=True)
    add_kxf("convt3", emb_width, ch * wf**2, k_dec, fstride=1, depthwise=p.conv_depthwise)
    add_kxf("conv2p", ch * wf**2, ch * wf**2, 1, f=1, depthwise=True)
    add_kxf("convt2", ch * wf**2, ch * wf**1, k_dec, depthwise=p.convt_depthwise,
            transposed=p.conv_dec_mode == "transposed")
    add_kxf("conv1p", ch * wf**1, ch * wf**1, 1, f=1, depthwise=True)
    add_kxf("convt1", ch * wf**1, ch * wf**0, k_dec, depthwise=p.convt_depthwise,
            transposed=p.conv_dec_mode == "transposed")
    add_kxf("conv0p", ch, ch, 1, f=1, depthwise=True)
    add_kxf("conv0_out", ch, 1, k_dec, fstride=1, norm=False, act="sigmoid",
            depthwise=True)

    # df decoder (deepfilternet.py:188-230)
    add_kxf("df_convp", ch, df_out_ch, 1, f=1, complex_in=True, depthwise=True)
    params["df_gru"], L["df_gru"] = init_grouped_gru(
        next(keys), p.emb_hidden_dim, p.df_hidden_dim, num_layers=p.df_num_layers,
        groups=p.gru_groups, shuffle=p.group_shuffle, add_outputs=True,
    )
    params["df_out"] = init_linear(next(keys), p.df_hidden_dim, p.nb_df * df_out_ch)
    params["df_fc_a"] = init_linear(next(keys), p.df_hidden_dim, 1)

    widths = erb_widths(p.sr, p.fft_size, p.nb_erb, p.min_nb_freqs)
    cfg = dict(
        layers=L,
        generation=1,
        nb_erb=p.nb_erb,
        nb_df=p.nb_df,
        df_order=p.df_order,
        df_lookahead=p.df_lookahead,
        conv_ch=ch,
        emb_dim=emb_dim,
        emb_hidden_dim=p.emb_hidden_dim,
        df_hidden_dim=p.df_hidden_dim,
        emb_num_layers=p.emb_num_layers,
        df_num_layers=p.df_num_layers,
        gru_groups=p.gru_groups,
        lsnr_min=p.lsnr_min,
        lsnr_max=p.lsnr_max,
        mask_pf=p.mask_pf,
        pf_beta=p.pf_beta,
        freq_bins=p.fft_size // 2 + 1,
        erb_widths=widths,
        erb_inv_fb=np.asarray(erb_fb_matrices(widths, normalized=True, inverse=True)),
        k0=k0,
        k_enc=k_enc,
    )
    return params, state, cfg


def forward(params, state, cfg, spec, feat_erb, feat_spec, train=False):
    L = cfg["layers"]
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

    fe = feat_erb[:, None]
    fs = jnp.moveaxis(feat_spec, -1, 1)
    e0 = conv("erb_conv0", fe)
    e1 = conv("erb_conv1", e0)
    e2 = conv("erb_conv2", e1)
    e3 = conv("erb_conv3", e2)
    c0 = conv("df_conv0", fs)
    c1 = conv("df_conv1", c0)
    b, _, t, _ = c1.shape
    # DFN1 flattens [T,B,C*F] channel-major: permute(2,0,1,3) then reshape
    cemb = jnp.transpose(c1, (0, 2, 1, 3)).reshape(b, t, -1)
    cemb = grouped_linear_shuffle_apply(params["df_fc_emb"], L["df_fc_emb"], cemb)
    emb = jnp.transpose(e3, (0, 2, 1, 3)).reshape(b, t, -1)
    emb = emb + cemb
    emb, _ = grouped_gru_apply(params["enc_emb_gru"], L["enc_emb_gru"], emb)
    lsnr = jax.nn.sigmoid(linear_apply(params["lsnr_fc"], emb))
    lsnr = lsnr * (cfg["lsnr_max"] - cfg["lsnr_min"]) + cfg["lsnr_min"]

    # erb decoder: fc_emb + conv pathway (no GRU)
    demb = jax.nn.relu(
        grouped_linear_shuffle_apply(params["dec_fc_emb"], L["dec_fc_emb"], emb)
    )
    f8 = e3.shape[-1]
    # view(b, t, -1, f8).transpose(1, 2) -> [B, C, T, F/4] (channel-major)
    demb = jnp.transpose(demb.reshape(b, t, -1, f8), (0, 2, 1, 3))
    d3 = conv("convt3", conv("conv3p", e3) + demb)
    d2 = conv("convt2", conv("conv2p", e2) + d3)
    d1 = conv("convt1", conv("conv1p", e1) + d2)
    m = conv("conv0_out", conv("conv0p", e0) + d1)[:, 0]

    if cfg["mask_pf"] and not train:
        m = post_filter_mask(m, cfg["pf_beta"])

    spec_c = spec[..., 0] + 1j * spec[..., 1]
    spec_m = spec_c * (m @ jnp.asarray(cfg["erb_inv_fb"]))

    # df decoder
    c, _ = grouped_gru_apply(params["df_gru"], L["df_gru"], emb)
    alpha = jax.nn.sigmoid(linear_apply(params["df_fc_a"], c))
    c0p = jnp.transpose(conv("df_convp", c0), (0, 2, 1, 3))  # [B,T,O*2,F']
    coefs = jnp.tanh(linear_apply(params["df_out"], c))
    coefs = coefs.reshape(b, t, cfg["df_order"] * 2, cfg["nb_df"]) + c0p
    coefs = jnp.moveaxis(coefs.reshape(b, t, cfg["df_order"], 2, cfg["nb_df"]), -1, -2)
    coefs_c = jnp.transpose(coefs[..., 0] + 1j * coefs[..., 1], (0, 2, 1, 3))  # [B,O,T,F']

    if cfg.get("run_df", True):
        filt = deep_filter_offline(spec_m, coefs_c, cfg["nb_df"], cfg["df_lookahead"])
        lo = filt[..., : cfg["nb_df"]] * alpha + spec_m[..., : cfg["nb_df"]] * (1 - alpha)
        out = jnp.concatenate([lo, spec_m[..., cfg["nb_df"] :]], axis=-1)
    else:
        # mask-only ablation (reference run_df=False, deepfilternet.py:274-279):
        # the DF stage is skipped and the ERB-masked spectrum is the output
        out = spec_m

    spec_e_ri = jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1)
    return (spec_e_ri, m, lsnr, alpha), ns


# -- streaming ---------------------------------------------------------------


class StreamState1(NamedTuple):
    erb_buf: jnp.ndarray   # [B,1,k0-1,E]
    spec_buf: jnp.ndarray  # [B,2,k0-1,F']
    e0_buf: jnp.ndarray    # [B,C,k-1,E]
    e1_buf: jnp.ndarray    # [B,C,k-1,E/2]
    e2_buf: jnp.ndarray    # [B,C,k-1,E/4]
    c0_buf: jnp.ndarray    # [B,C,k-1,F']
    enc_gru_h: jnp.ndarray
    df_gru_h: jnp.ndarray
    df_ring_re: jnp.ndarray
    df_ring_im: jnp.ndarray


def streaming_init(batch: int, cfg: Dict) -> StreamState1:
    z = jnp.zeros
    ch = cfg["conv_ch"]
    e = cfg["nb_erb"]
    fp = cfg["nb_df"]
    k0m1 = cfg["k0"] - 1
    km1 = cfg["k_enc"] - 1
    g = cfg["gru_groups"]
    return StreamState1(
        erb_buf=z((batch, 1, k0m1, e)),
        spec_buf=z((batch, 2, k0m1, fp)),
        e0_buf=z((batch, ch, km1, e)),
        e1_buf=z((batch, ch, km1, e // 2)),
        e2_buf=z((batch, ch, km1, e // 4)),
        c0_buf=z((batch, ch, km1, fp)),
        enc_gru_h=z((cfg["emb_num_layers"] * g, batch, cfg["emb_hidden_dim"] // g)),
        df_gru_h=z((cfg["df_num_layers"] * g, batch, cfg["df_hidden_dim"] // g)),
        df_ring_re=z((batch, cfg["df_order"] - 1, fp)),
        df_ring_im=z((batch, cfg["df_order"] - 1, fp)),
    )


def streaming_cell(params, state, cfg, carry: StreamState1, spec_ri, feat_erb,
                   feat_spec_ri):
    L = cfg["layers"]
    nb_df = cfg["nb_df"]

    def cstep(name, x):
        fn = conv_transpose2d_norm_act_step if L[name].get("transposed") else conv2d_norm_act_step
        return fn(params[name], state.get(name, {}), L[name], x)

    erb_win = jnp.concatenate([carry.erb_buf, feat_erb[:, None, None, :]], axis=2)
    fs = jnp.moveaxis(feat_spec_ri, -1, 1)[:, :, None, :]
    spec_win = jnp.concatenate([carry.spec_buf, fs], axis=2)

    e0 = cstep("erb_conv0", erb_win)
    e0_win = jnp.concatenate([carry.e0_buf, e0[:, :, None, :]], axis=2)
    e1 = cstep("erb_conv1", e0_win)
    e1_win = jnp.concatenate([carry.e1_buf, e1[:, :, None, :]], axis=2)
    e2 = cstep("erb_conv2", e1_win)
    e2_win = jnp.concatenate([carry.e2_buf, e2[:, :, None, :]], axis=2)
    e3 = cstep("erb_conv3", e2_win)
    c0 = cstep("df_conv0", spec_win)
    c0_win = jnp.concatenate([carry.c0_buf, c0[:, :, None, :]], axis=2)
    c1 = cstep("df_conv1", c0_win)

    b = e0.shape[0]
    cemb = c1.reshape(b, -1)  # channel-major flatten [C, F] -> C*F
    cemb = grouped_linear_shuffle_apply(params["df_fc_emb"], L["df_fc_emb"], cemb)
    emb = e3.reshape(b, -1)
    emb = emb + cemb
    enc_h, emb = grouped_gru_step(params["enc_emb_gru"], L["enc_emb_gru"],
                                  carry.enc_gru_h, emb)
    lsnr = jax.nn.sigmoid(linear_apply(params["lsnr_fc"], emb))
    lsnr = lsnr * (cfg["lsnr_max"] - cfg["lsnr_min"]) + cfg["lsnr_min"]

    demb = jax.nn.relu(
        grouped_linear_shuffle_apply(params["dec_fc_emb"], L["dec_fc_emb"], emb)
    )
    f4 = cfg["nb_erb"] // 4
    demb = demb.reshape(b, -1, f4)  # channel-major [B, C, F/4]
    d3 = cstep("convt3", (cstep("conv3p", e3[:, :, None, :]) + demb)[:, :, None, :])
    d2 = cstep("convt2", (cstep("conv2p", e2[:, :, None, :]) + d3)[:, :, None, :])
    d1 = cstep("convt1", (cstep("conv1p", e1[:, :, None, :]) + d2)[:, :, None, :])
    m = cstep("conv0_out", (cstep("conv0p", e0[:, :, None, :]) + d1)[:, :, None, :])[:, 0]

    if cfg["mask_pf"]:
        m = post_filter_mask(m, cfg["pf_beta"])

    spec_c = spec_ri[..., 0] + 1j * spec_ri[..., 1]
    spec_m = spec_c * (m @ jnp.asarray(cfg["erb_inv_fb"]))

    df_h, c = grouped_gru_step(params["df_gru"], L["df_gru"], carry.df_gru_h, emb)
    alpha = jax.nn.sigmoid(linear_apply(params["df_fc_a"], c))
    c0p = cstep("df_convp", c0[:, :, None, :])  # [B, O*2, F']
    coefs = jnp.tanh(linear_apply(params["df_out"], c))
    coefs = coefs.reshape(b, cfg["df_order"] * 2, nb_df) + c0p
    coefs = jnp.moveaxis(coefs.reshape(b, cfg["df_order"], 2, nb_df), -1, -2)
    coefs_c = coefs[..., 0] + 1j * coefs[..., 1]

    ring = carry.df_ring_re + 1j * carry.df_ring_im
    new_ring, filt = deep_filter(ring, spec_m[:, :nb_df], coefs_c)
    if cfg.get("run_df", True):
        lo = filt * alpha + spec_m[:, :nb_df] * (1 - alpha)
        spec_e = jnp.concatenate([lo, spec_m[:, nb_df:]], axis=-1)
    else:
        # mask-only ablation: DF stage output unused; ring still advances so
        # the carry stays identical to the run_df path (toggle-safe)
        spec_e = spec_m

    def roll(win, old, k):
        return win[:, :, 1:] if k > 1 else old

    new_carry = StreamState1(
        erb_buf=roll(erb_win, carry.erb_buf, cfg["k0"]),
        spec_buf=roll(spec_win, carry.spec_buf, cfg["k0"]),
        e0_buf=roll(e0_win, carry.e0_buf, cfg["k_enc"]),
        e1_buf=roll(e1_win, carry.e1_buf, cfg["k_enc"]),
        e2_buf=roll(e2_win, carry.e2_buf, cfg["k_enc"]),
        c0_buf=roll(c0_win, carry.c0_buf, cfg["k_enc"]),
        enc_gru_h=enc_h,
        df_gru_h=df_h,
        df_ring_re=jnp.real(new_ring),
        df_ring_im=jnp.imag(new_ring),
    )
    spec_e_ri = jnp.stack([jnp.real(spec_e), jnp.imag(spec_e)], axis=-1)
    return new_carry, (spec_e_ri, lsnr, m)


# ---------------------------------------------------------------------------
# chunked streaming forward (see dfnet3.forward_chunk): frame-parallel
# conv/linear/DF work, GRU recurrences carried; every k>1 conv stage keeps
# its own carried input context (DFN1 encoder convs have time kernel 2)
# ---------------------------------------------------------------------------


def forward_chunk(params, state, cfg, carry: StreamState1, spec, feat_erb,
                  feat_spec):
    """spec [B,T,F,2], feat_erb [B,T,E], feat_spec [B,T,F',2] ->
    (carry', (spec_e [B,T,F,2], lsnr [B,T,1], mask [B,T,E])). Bit-matches
    running streaming_cell T times."""
    L = cfg["layers"]
    nb_df = cfg["nb_df"]
    order = cfg["df_order"]
    b, t = feat_erb.shape[:2]

    def conv(name, x, ctx_buf, k):
        """Causal conv over a chunk with carried input context.
        x [B,C,T,F]; ctx_buf [B,C,k-1,F] -> (out [B,C',T,F'], new_buf)."""
        fn = (
            conv_transpose2d_norm_act_apply
            if L[name].get("transposed")
            else conv2d_norm_act_apply
        )
        if k > 1:
            xe = jnp.concatenate([ctx_buf, x], axis=2)
            out, _ = fn(params[name], state.get(name, {}), L[name], xe, False)
            return out[:, :, k - 1 :], xe[:, :, -(k - 1) :]
        out, _ = fn(params[name], state.get(name, {}), L[name], x, False)
        return out, ctx_buf

    k0 = cfg["k0"]
    ke = cfg["k_enc"]
    fe = feat_erb[:, None]  # [B,1,T,E]
    fs = jnp.moveaxis(feat_spec, -1, 1)  # [B,2,T,F']
    e0, erb_buf = conv("erb_conv0", fe, carry.erb_buf, k0)
    e1, e0_buf = conv("erb_conv1", e0, carry.e0_buf, ke)
    e2, e1_buf = conv("erb_conv2", e1, carry.e1_buf, ke)
    e3, e2_buf = conv("erb_conv3", e2, carry.e2_buf, ke)
    c0, spec_buf = conv("df_conv0", fs, carry.spec_buf, k0)
    c1, c0_buf = conv("df_conv1", c0, carry.c0_buf, ke)

    # channel-major flatten (deepfilternet.py DFN1 layout)
    cemb = jnp.transpose(c1, (0, 2, 1, 3)).reshape(b, t, -1)
    cemb = grouped_linear_shuffle_apply(params["df_fc_emb"], L["df_fc_emb"], cemb)
    emb = jnp.transpose(e3, (0, 2, 1, 3)).reshape(b, t, -1)
    emb = emb + cemb
    emb, enc_h = grouped_gru_apply(params["enc_emb_gru"], L["enc_emb_gru"],
                                   emb, carry.enc_gru_h)
    lsnr = jax.nn.sigmoid(linear_apply(params["lsnr_fc"], emb))
    lsnr = lsnr * (cfg["lsnr_max"] - cfg["lsnr_min"]) + cfg["lsnr_min"]

    demb = jax.nn.relu(
        grouped_linear_shuffle_apply(params["dec_fc_emb"], L["dec_fc_emb"], emb)
    )
    f8 = e3.shape[-1]
    demb = jnp.transpose(demb.reshape(b, t, -1, f8), (0, 2, 1, 3))
    d3, _ = conv("convt3", conv("conv3p", e3, None, 1)[0] + demb, None, 1)
    d2, _ = conv("convt2", conv("conv2p", e2, None, 1)[0] + d3, None, 1)
    d1, _ = conv("convt1", conv("conv1p", e1, None, 1)[0] + d2, None, 1)
    m, _ = conv("conv0_out", conv("conv0p", e0, None, 1)[0] + d1, None, 1)
    m = m[:, 0]

    if cfg["mask_pf"]:
        m = post_filter_mask(m, cfg["pf_beta"])

    spec_c = spec[..., 0] + 1j * spec[..., 1]
    spec_m = spec_c * (m @ jnp.asarray(cfg["erb_inv_fb"]))

    c, df_h = grouped_gru_apply(params["df_gru"], L["df_gru"], emb, carry.df_gru_h)
    alpha = jax.nn.sigmoid(linear_apply(params["df_fc_a"], c))  # [B,T,1]
    c0p = jnp.transpose(conv("df_convp", c0, None, 1)[0], (0, 2, 1, 3))
    coefs = jnp.tanh(linear_apply(params["df_out"], c))
    coefs = coefs.reshape(b, t, order * 2, nb_df) + c0p
    coefs = jnp.moveaxis(coefs.reshape(b, t, order, 2, nb_df), -1, -2)
    coefs_c = coefs[..., 0] + 1j * coefs[..., 1]  # [B,T,O,F']

    ring = carry.df_ring_re + 1j * carry.df_ring_im
    lo_ext = jnp.concatenate([ring, spec_m[..., :nb_df]], axis=1)
    un = jnp.stack([lo_ext[:, n : n + t] for n in range(order)], axis=2)
    filt = jnp.sum(un * coefs_c, axis=2)
    if cfg.get("run_df", True):
        lo = filt * alpha + spec_m[..., :nb_df] * (1 - alpha)
        spec_e = jnp.concatenate([lo, spec_m[..., nb_df:]], axis=-1)
    else:
        spec_e = spec_m  # mask-only ablation; ring still advances (toggle-safe)

    new_carry = StreamState1(
        erb_buf=erb_buf,
        spec_buf=spec_buf,
        e0_buf=e0_buf,
        e1_buf=e1_buf,
        e2_buf=e2_buf,
        c0_buf=c0_buf,
        enc_gru_h=enc_h,
        df_gru_h=df_h,
        df_ring_re=jnp.real(lo_ext[:, -(order - 1) :]) if order > 1 else carry.df_ring_re,
        df_ring_im=jnp.imag(lo_ext[:, -(order - 1) :]) if order > 1 else carry.df_ring_im,
    )
    spec_e_ri = jnp.stack([jnp.real(spec_e), jnp.imag(spec_e)], axis=-1)
    return new_carry, (spec_e_ri, lsnr, m)
