"""DeepFilterNet2 (reference: df/deepfilternet2.py).

Same conv topology as DFN3 with generation-2 heads:
  * gru_type "grouped" (GroupedGRU + GroupedLinear, add_outputs) or
    "squeeze" (SqueezedGRU with identity skip) — both supported, selected
    by the [deepfilternet] config as in the reference;
  * DfDecoder emits (coefs, alpha); alpha blends the DF output with the
    masked spectrum when dfop_method == "real_unfold";
  * the DF op runs on the *masked* spectrum, df_n_iter times.

Offline forward + streaming cell share one parameter set; streaming
supports df_n_iter == 1 (the released configuration).
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
    grouped_linear_apply,
    grouped_linear_shuffle_apply,
    init_conv2d_norm_act,
    init_conv_transpose2d_norm_act,
    init_grouped_gru,
    init_grouped_linear,
    init_grouped_linear_shuffle,
    init_linear,
    init_squeezed_gru,
    linear_apply,
    squeezed_gru_apply,
    squeezed_gru_step,
)
from deepfilternet_tpu.ops import erb_fb_matrices, erb_widths
from deepfilternet_tpu.ops.df_op import deep_filter, deep_filter_offline
from deepfilternet_tpu.ops.postfilter import post_filter_mask


class ModelParams2(DfParams):
    section = "deepfilternet"

    def __init__(self):
        super().__init__()
        s = self.section
        self.conv_lookahead: int = config("CONV_LOOKAHEAD", cast=int, default=0, section=s)
        self.conv_ch: int = config("CONV_CH", cast=int, default=16, section=s)
        self.conv_kernel = tuple(
            int(v) for v in str(config("CONV_KERNEL", default="1,3", section=s)).split(",")
        )
        self.conv_kernel_inp = tuple(
            int(v) for v in str(config("CONV_KERNEL_INP", default="3,3", section=s)).split(",")
        )
        self.emb_hidden_dim: int = config("EMB_HIDDEN_DIM", cast=int, default=256, section=s)
        self.emb_num_layers: int = config("EMB_NUM_LAYERS", cast=int, default=2, section=s)
        self.df_hidden_dim: int = config("DF_HIDDEN_DIM", cast=int, default=256, section=s)
        self.df_gru_skip: str = config("DF_GRU_SKIP", default="none", section=s)
        self.df_output_layer: str = config("DF_OUTPUT_LAYER", default="linear", section=s)
        self.df_pathway_kernel_size_t: int = config(
            "DF_PATHWAY_KERNEL_SIZE_T", cast=int, default=1, section=s
        )
        self.enc_concat: bool = config("ENC_CONCAT", cast=bool, default=False, section=s)
        self.df_num_layers: int = config("DF_NUM_LAYERS", cast=int, default=3, section=s)
        self.df_n_iter: int = config("DF_N_ITER", cast=int, default=2, section=s)
        self.gru_type: str = config("GRU_TYPE", default="grouped", section=s)
        self.gru_groups: int = config("GRU_GROUPS", cast=int, default=1, section=s)
        self.lin_groups: int = config("LINEAR_GROUPS", cast=int, default=1, section=s)
        self.group_shuffle: bool = config("GROUP_SHUFFLE", cast=bool, default=True, section=s)
        self.dfop_method: str = config("DFOP_METHOD", cast=str, default="real_unfold", section=s)
        self.mask_pf: bool = config("MASK_PF", cast=bool, default=False, section=s)
        self.pf_beta: float = config("PF_BETA", cast=float, default=0.02, section=s)


def init_dfnet2(key, p: Optional[ModelParams2] = None) -> Tuple[Dict, Dict, Dict]:
    p = p or ModelParams2()
    assert p.nb_erb % 8 == 0
    ch = p.conv_ch
    emb_in_dim = ch * p.nb_erb // 4
    emb_dim = p.emb_hidden_dim
    df_out_ch = p.df_order * 2
    grouped = p.gru_type == "grouped"
    assert p.gru_type in ("grouped", "squeeze")

    keys = iter(jax.random.split(key, 40))
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    L: Dict[str, Any] = {}

    def add_conv(name, *args, **kw):
        prm, st, c = init_conv2d_norm_act(next(keys), *args, **kw)
        params[name] = prm
        if st:
            state[name] = st
        L[name] = c

    def add_convt(name, *args, **kw):
        prm, st, c = init_conv_transpose2d_norm_act(next(keys), *args, **kw)
        params[name] = prm
        if st:
            state[name] = st
        L[name] = c

    # encoder convs (identical topology to DFN3)
    add_conv("erb_conv0", 1, ch, p.conv_kernel_inp, bias=False, separable=True)
    add_conv("erb_conv1", ch, ch, p.conv_kernel, fstride=2, bias=False, separable=True)
    add_conv("erb_conv2", ch, ch, p.conv_kernel, fstride=2, bias=False, separable=True)
    add_conv("erb_conv3", ch, ch, p.conv_kernel, fstride=1, bias=False, separable=True)
    add_conv("df_conv0", 2, ch, p.conv_kernel_inp, bias=False, separable=True)
    add_conv("df_conv1", ch, ch, p.conv_kernel, fstride=2, bias=False, separable=True)

    if grouped:
        params["df_fc_emb"], L["df_fc_emb"] = init_grouped_linear_shuffle(
            next(keys), ch * p.nb_df // 2, emb_in_dim, groups=p.lin_groups
        )
        params["enc_emb_gru"], L["enc_emb_gru"] = init_grouped_gru(
            next(keys), emb_in_dim * (2 if p.enc_concat else 1), emb_dim,
            num_layers=1, groups=p.gru_groups, shuffle=p.group_shuffle, add_outputs=True,
        )
        params["dec_emb_gru"], L["dec_emb_gru"] = init_grouped_gru(
            next(keys), emb_in_dim, emb_dim,  # input dim "for compat" (dfnet2.py:199)
            num_layers=p.emb_num_layers - 1, groups=p.gru_groups,
            shuffle=p.group_shuffle, add_outputs=True,
        )
        params["dec_fc_emb"], L["dec_fc_emb"] = init_grouped_linear_shuffle(
            next(keys), emb_dim, emb_in_dim, groups=p.lin_groups, shuffle=p.group_shuffle
        )
        params["df_gru"], L["df_gru"] = init_grouped_gru(
            next(keys), emb_dim, p.df_hidden_dim, num_layers=p.df_num_layers,
            groups=p.gru_groups, shuffle=p.group_shuffle, add_outputs=True,
        )
    else:
        params["df_fc_emb"] = init_grouped_linear(
            next(keys), ch * p.nb_df // 2, emb_in_dim, groups=p.lin_groups
        )
        params["enc_emb_gru"], L["enc_emb_gru"] = init_squeezed_gru(
            next(keys), emb_in_dim * (2 if p.enc_concat else 1), emb_dim,
            num_layers=1, linear_groups=p.lin_groups, linear_act="relu",
        )
        params["dec_emb_gru"], L["dec_emb_gru"] = init_squeezed_gru(
            next(keys), emb_dim, emb_dim, output_size=emb_in_dim,
            num_layers=p.emb_num_layers - 1, linear_groups=p.lin_groups,
            skip="identity", linear_act="relu",
        )
        params["df_gru"], L["df_gru"] = init_squeezed_gru(
            next(keys), emb_dim, p.df_hidden_dim, num_layers=p.df_num_layers,
            skip="identity", linear_act="relu",
        )
    params["lsnr_fc"] = init_linear(next(keys), emb_dim, 1)

    # erb decoder convs
    add_conv("conv3p", ch, ch, (1, 1), bias=False, separable=True)
    add_conv("convt3", ch, ch, p.conv_kernel, bias=False, separable=True)
    add_conv("conv2p", ch, ch, (1, 1), bias=False, separable=True)
    add_convt("convt2", ch, ch, p.conv_kernel, fstride=2, bias=False, separable=True)
    add_conv("conv1p", ch, ch, (1, 1), bias=False, separable=True)
    add_convt("convt1", ch, ch, p.conv_kernel, fstride=2, bias=False, separable=True)
    add_conv("conv0p", ch, ch, (1, 1), bias=False, separable=True)
    add_conv("conv0_out", ch, 1, p.conv_kernel, bias=False, separable=True, act="sigmoid")

    # df decoder
    kt = p.df_pathway_kernel_size_t
    add_conv("df_convp", ch, df_out_ch, (kt, 1), bias=False, separable=True)
    df_skip = (p.df_gru_skip or "none").lower()
    if df_skip == "groupedlinear":
        params["df_skip"] = init_grouped_linear(next(keys), emb_dim, p.df_hidden_dim,
                                                groups=p.lin_groups)
    out_dim = p.nb_df * df_out_ch
    if p.df_output_layer == "linear":
        params["df_out"] = init_linear(next(keys), p.df_hidden_dim, out_dim)
    else:
        params["df_out"] = init_grouped_linear(next(keys), p.df_hidden_dim, out_dim,
                                               groups=p.lin_groups)
    params["df_fc_a"] = init_linear(next(keys), p.df_hidden_dim, 1)

    widths = erb_widths(p.sr, p.fft_size, p.nb_erb, p.min_nb_freqs)
    cfg = dict(
        layers=L,
        generation=2,
        grouped=grouped,
        nb_erb=p.nb_erb,
        nb_df=p.nb_df,
        df_order=p.df_order,
        df_lookahead=p.df_lookahead,
        conv_ch=ch,
        emb_in_dim=emb_in_dim,
        emb_hidden_dim=emb_dim,
        df_hidden_dim=p.df_hidden_dim,
        enc_concat=p.enc_concat,
        df_gru_skip=df_skip,
        df_output_layer=p.df_output_layer,
        dfop_method=p.dfop_method,
        df_n_iter=p.df_n_iter,
        use_alpha=p.dfop_method == "real_unfold",
        lsnr_min=p.lsnr_min,
        lsnr_max=p.lsnr_max,
        mask_pf=p.mask_pf,
        pf_beta=p.pf_beta,
        freq_bins=p.fft_size // 2 + 1,
        erb_widths=widths,
        erb_inv_fb=np.asarray(erb_fb_matrices(widths, normalized=True, inverse=True)),
        conv_kernel_inp=p.conv_kernel_inp,
        df_pathway_kt=kt,
        emb_num_layers=p.emb_num_layers,
        df_num_layers=p.df_num_layers,
        gru_groups=p.gru_groups,
    )
    return params, state, cfg


# -- shared helpers ----------------------------------------------------------


def _gru_apply(params, L, name, cfg, x, h0=None):
    if cfg["grouped"]:
        return grouped_gru_apply(params[name], L[name], x, h0)
    return squeezed_gru_apply(params[name], L[name], x, h0)


def _gru_step(params, L, name, cfg, h, x):
    if cfg["grouped"]:
        return grouped_gru_step(params[name], L[name], h, x)
    return squeezed_gru_step(params[name], L[name], h, x)


def _fc_emb_apply(params, L, cfg, x):
    if cfg["grouped"]:
        return grouped_linear_shuffle_apply(params["df_fc_emb"], L["df_fc_emb"], x)
    return jax.nn.relu(grouped_linear_apply(params["df_fc_emb"], x))


def _apply_alpha_df(spec_lo_masked, df_out, alpha, use_alpha):
    # alpha: [B, T, 1] offline / [B, 1] streaming — broadcasts over bins
    if use_alpha:
        return df_out * alpha + spec_lo_masked * (1.0 - alpha)
    return df_out


# -- offline forward ---------------------------------------------------------


def forward(params, state, cfg, spec, feat_erb, feat_spec, train=False):
    """Same I/O contract as dfnet3.forward; returns df_alpha in place of
    df_coefs as the 4th output (reference DfNet2 returns alpha)."""
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
    cemb = jnp.transpose(c1, (0, 2, 3, 1)).reshape(b, t, -1)
    cemb = _fc_emb_apply(params, L, cfg, cemb)
    emb = jnp.transpose(e3, (0, 2, 3, 1)).reshape(b, t, -1)
    emb = jnp.concatenate([emb, cemb], -1) if cfg["enc_concat"] else emb + cemb
    emb, _ = _gru_apply(params, L, "enc_emb_gru", cfg, emb)
    lsnr = jax.nn.sigmoid(linear_apply(params["lsnr_fc"], emb))
    lsnr = lsnr * (cfg["lsnr_max"] - cfg["lsnr_min"]) + cfg["lsnr_min"]

    # erb decoder
    if cfg["grouped"]:
        # GroupedGRU input dim is emb_in_dim "for compat": slice accordingly
        demb_in = emb[..., : cfg["emb_in_dim"]]
        demb, _ = _gru_apply(params, L, "dec_emb_gru", cfg, demb_in)
        demb = jax.nn.relu(
            grouped_linear_shuffle_apply(params["dec_fc_emb"], L["dec_fc_emb"], demb)
        )
    else:
        demb, _ = _gru_apply(params, L, "dec_emb_gru", cfg, emb)
    f8 = e3.shape[-1]
    demb = jnp.transpose(demb.reshape(b, t, f8, -1), (0, 3, 1, 2))
    d3 = conv("convt3", conv("conv3p", e3) + demb)
    d2 = conv("convt2", conv("conv2p", e2) + d3)
    d1 = conv("convt1", conv("conv1p", e1) + d2)
    m = conv("conv0_out", conv("conv0p", e0) + d1)[:, 0]  # [B,T,E]

    if cfg["mask_pf"] and not train:
        m = post_filter_mask(m, cfg["pf_beta"])

    spec_c = spec[..., 0] + 1j * spec[..., 1]
    bin_gains = m @ jnp.asarray(cfg["erb_inv_fb"])
    spec_m = spec_c * bin_gains

    # df decoder
    c, _ = _gru_apply(params, L, "df_gru", cfg, emb)
    if cfg["df_gru_skip"] == "identity":
        c = c + emb
    elif cfg["df_gru_skip"] == "groupedlinear":
        c = c + grouped_linear_apply(params["df_skip"], emb)
    alpha = jax.nn.sigmoid(linear_apply(params["df_fc_a"], c))  # [B,T,1]
    c0p = conv("df_convp", c0)
    if cfg["df_output_layer"] == "linear":
        coefs = jnp.tanh(linear_apply(params["df_out"], c))
        # [B,T,O*2,F'] + pathway [B,T,O*2,F'] -> [B,T,O,F',2]
        c0p_l = jnp.transpose(c0p, (0, 2, 1, 3))  # [B,T,O*2,F']
        coefs = coefs.reshape(b, t, cfg["df_order"] * 2, cfg["nb_df"]) + c0p_l
        coefs = jnp.moveaxis(
            coefs.reshape(b, t, cfg["df_order"], 2, cfg["nb_df"]), -1, -2
        )  # [B,T,O,F',2]
    else:
        coefs = jnp.tanh(grouped_linear_apply(params["df_out"], c))
        c0p_g = jnp.transpose(c0p, (0, 2, 3, 1))  # [B,T,F',O*2]
        coefs = coefs.reshape(b, t, cfg["nb_df"], cfg["df_order"] * 2) + c0p_g
        coefs = coefs.reshape(b, t, cfg["nb_df"], cfg["df_order"], 2)
        coefs = jnp.moveaxis(coefs, 2, 3)  # [B,T,O,F',2]

    coefs_c = jnp.transpose(coefs[..., 0] + 1j * coefs[..., 1], (0, 2, 1, 3))  # [B,O,T,F']
    out = spec_m
    # mask-only ablation (reference run_df=False, deepfilternet2.py:498-503):
    # coefs are still computed/returned; the DF op is just not applied
    for _ in range(cfg["df_n_iter"] if cfg.get("run_df", True) else 0):
        filt = deep_filter_offline(out, coefs_c, cfg["nb_df"], cfg["df_lookahead"])
        lo = _apply_alpha_df(out[..., : cfg["nb_df"]], filt[..., : cfg["nb_df"]],
                             alpha, cfg["use_alpha"])
        out = jnp.concatenate([lo, out[..., cfg["nb_df"] :]], axis=-1)

    spec_e_ri = jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1)
    return (spec_e_ri, m, lsnr, alpha), ns


# -- streaming ---------------------------------------------------------------


class StreamState2(NamedTuple):
    erb_buf: jnp.ndarray
    spec_buf: jnp.ndarray
    c0_buf: jnp.ndarray
    enc_gru_h: jnp.ndarray
    dec_gru_h: jnp.ndarray
    df_gru_h: jnp.ndarray
    df_ring_re: jnp.ndarray
    df_ring_im: jnp.ndarray


def _gru_state_shape(cfg, name, batch):
    if cfg["grouped"]:
        g = cfg["gru_groups"]
        layers = {"enc_emb_gru": 1, "dec_emb_gru": cfg["emb_num_layers"] - 1,
                  "df_gru": cfg["df_num_layers"]}[name]
        hid = {"enc_emb_gru": cfg["emb_hidden_dim"], "dec_emb_gru": cfg["emb_hidden_dim"],
               "df_gru": cfg["df_hidden_dim"]}[name] // g
        return (layers * g, batch, hid)
    layers = {"enc_emb_gru": 1, "dec_emb_gru": cfg["emb_num_layers"] - 1,
              "df_gru": cfg["df_num_layers"]}[name]
    hid = {"enc_emb_gru": cfg["emb_hidden_dim"], "dec_emb_gru": cfg["emb_hidden_dim"],
           "df_gru": cfg["df_hidden_dim"]}[name]
    return (layers, batch, hid)


def streaming_init(batch: int, cfg: Dict) -> StreamState2:
    kt0 = cfg["conv_kernel_inp"][0]
    ktp = cfg["df_pathway_kt"]
    z = jnp.zeros
    return StreamState2(
        erb_buf=z((batch, 1, kt0 - 1, cfg["nb_erb"])),
        spec_buf=z((batch, 2, kt0 - 1, cfg["nb_df"])),
        c0_buf=z((batch, cfg["conv_ch"], max(ktp - 1, 0), cfg["nb_df"])),
        enc_gru_h=z(_gru_state_shape(cfg, "enc_emb_gru", batch)),
        dec_gru_h=z(_gru_state_shape(cfg, "dec_emb_gru", batch)),
        df_gru_h=z(_gru_state_shape(cfg, "df_gru", batch)),
        df_ring_re=z((batch, cfg["df_order"] - 1, cfg["nb_df"])),
        df_ring_im=z((batch, cfg["df_order"] - 1, cfg["nb_df"])),
    )


def streaming_cell(params, state, cfg, carry: StreamState2, spec_ri, feat_erb,
                   feat_spec_ri):
    assert cfg["df_n_iter"] == 1, "streaming supports df_n_iter == 1"
    L = cfg["layers"]
    nb_df = cfg["nb_df"]

    erb_win = jnp.concatenate([carry.erb_buf, feat_erb[:, None, None, :]], axis=2)
    fs = jnp.moveaxis(feat_spec_ri, -1, 1)[:, :, None, :]
    spec_win = jnp.concatenate([carry.spec_buf, fs], axis=2)

    def cstep(name, x):
        fn = conv_transpose2d_norm_act_step if L[name].get("transposed") else conv2d_norm_act_step
        return fn(params[name], state.get(name, {}), L[name], x)

    e0 = cstep("erb_conv0", erb_win)
    e1 = cstep("erb_conv1", e0[:, :, None, :])
    e2 = cstep("erb_conv2", e1[:, :, None, :])
    e3 = cstep("erb_conv3", e2[:, :, None, :])
    c0 = cstep("df_conv0", spec_win)
    c1 = cstep("df_conv1", c0[:, :, None, :])

    b = e0.shape[0]
    cemb = jnp.transpose(c1, (0, 2, 1)).reshape(b, 1, -1)
    cemb = _fc_emb_apply(params, L, cfg, cemb)[:, 0]
    emb = jnp.transpose(e3, (0, 2, 1)).reshape(b, -1)
    emb = jnp.concatenate([emb, cemb], -1) if cfg["enc_concat"] else emb + cemb
    enc_h, emb = _gru_step(params, L, "enc_emb_gru", cfg, carry.enc_gru_h, emb)
    lsnr = jax.nn.sigmoid(linear_apply(params["lsnr_fc"], emb))
    lsnr = lsnr * (cfg["lsnr_max"] - cfg["lsnr_min"]) + cfg["lsnr_min"]

    if cfg["grouped"]:
        demb_in = emb[..., : cfg["emb_in_dim"]]
        dec_h, demb = _gru_step(params, L, "dec_emb_gru", cfg, carry.dec_gru_h, demb_in)
        demb = jax.nn.relu(
            grouped_linear_shuffle_apply(params["dec_fc_emb"], L["dec_fc_emb"], demb[:, None])
        )[:, 0]
    else:
        dec_h, demb = _gru_step(params, L, "dec_emb_gru", cfg, carry.dec_gru_h, emb)
    f4 = cfg["nb_erb"] // 4
    demb = jnp.transpose(demb.reshape(b, f4, -1), (0, 2, 1))
    d3 = cstep("convt3", (cstep("conv3p", e3[:, :, None, :]) + demb)[:, :, None, :])
    d2 = cstep("convt2", (cstep("conv2p", e2[:, :, None, :]) + d3)[:, :, None, :])
    d1 = cstep("convt1", (cstep("conv1p", e1[:, :, None, :]) + d2)[:, :, None, :])
    m = cstep("conv0_out", (cstep("conv0p", e0[:, :, None, :]) + d1)[:, :, None, :])[:, 0]

    if cfg["mask_pf"]:
        m = post_filter_mask(m, cfg["pf_beta"])

    spec_c = spec_ri[..., 0] + 1j * spec_ri[..., 1]
    bin_gains = m @ jnp.asarray(cfg["erb_inv_fb"])
    spec_m = spec_c * bin_gains

    df_h, c = _gru_step(params, L, "df_gru", cfg, carry.df_gru_h, emb)
    if cfg["df_gru_skip"] == "identity":
        c = c + emb
    elif cfg["df_gru_skip"] == "groupedlinear":
        c = c + grouped_linear_apply(params["df_skip"], emb)
    alpha = jax.nn.sigmoid(linear_apply(params["df_fc_a"], c))  # [B,1]

    ktp = cfg["df_pathway_kt"]
    c0_win = (
        jnp.concatenate([carry.c0_buf, c0[:, :, None, :]], axis=2)
        if ktp > 1
        else c0[:, :, None, :]
    )
    c0p = cstep("df_convp", c0_win)  # [B, O*2, F']
    if cfg["df_output_layer"] == "linear":
        coefs = jnp.tanh(linear_apply(params["df_out"], c))
        coefs = coefs.reshape(b, cfg["df_order"] * 2, nb_df) + c0p
        coefs = jnp.moveaxis(coefs.reshape(b, cfg["df_order"], 2, nb_df), -1, -2)
    else:
        coefs = jnp.tanh(grouped_linear_apply(params["df_out"], c))
        c0p_g = jnp.transpose(c0p, (0, 2, 1))  # [B,F',O*2]
        coefs = coefs.reshape(b, nb_df, cfg["df_order"] * 2) + c0p_g
        coefs = jnp.moveaxis(coefs.reshape(b, nb_df, cfg["df_order"], 2), 1, 2)
    coefs_c = coefs[..., 0] + 1j * coefs[..., 1]  # [B,O,F']

    ring = carry.df_ring_re + 1j * carry.df_ring_im
    new_ring, filt = deep_filter(ring, spec_m[:, :nb_df], coefs_c)
    if cfg.get("run_df", True):
        lo = _apply_alpha_df(spec_m[:, :nb_df], filt, alpha, cfg["use_alpha"])
        spec_e = jnp.concatenate([lo, spec_m[:, nb_df:]], axis=-1)
    else:
        spec_e = spec_m  # mask-only ablation; ring still advances (toggle-safe)

    kt0 = cfg["conv_kernel_inp"][0]
    new_carry = StreamState2(
        erb_buf=erb_win[:, :, 1:] if kt0 > 1 else carry.erb_buf,
        spec_buf=spec_win[:, :, 1:] if kt0 > 1 else carry.spec_buf,
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
# chunked streaming forward (see dfnet3.forward_chunk): frame-parallel
# conv/linear/DF work, GRU recurrences carried across chunk boundaries
# ---------------------------------------------------------------------------


def forward_chunk(params, state, cfg, carry: StreamState2, spec, feat_erb,
                  feat_spec):
    """spec [B,T,F,2], feat_erb [B,T,E], feat_spec [B,T,F',2] ->
    (carry', (spec_e [B,T,F,2], lsnr [B,T,1], mask [B,T,E])). Bit-matches
    running streaming_cell T times."""
    assert cfg["df_n_iter"] == 1, "streaming supports df_n_iter == 1"
    L = cfg["layers"]
    nb_df = cfg["nb_df"]
    order = cfg["df_order"]
    kt0 = cfg["conv_kernel_inp"][0]
    ctx = kt0 - 1
    b, t = feat_erb.shape[:2]

    # prepend carried conv context; causal-padded conv outputs for the
    # context rows are discarded below
    fe = jnp.concatenate([carry.erb_buf[:, 0], feat_erb], axis=1)
    fs = jnp.concatenate(
        [jnp.moveaxis(carry.spec_buf, 1, -1), feat_spec], axis=1
    )

    def conv(name, x):
        fn = (
            conv_transpose2d_norm_act_apply
            if L[name].get("transposed")
            else conv2d_norm_act_apply
        )
        out, _ = fn(params[name], state.get(name, {}), L[name], x, False)
        return out

    e0 = conv("erb_conv0", fe[:, None])[:, :, ctx:]
    e1 = conv("erb_conv1", e0)
    e2 = conv("erb_conv2", e1)
    e3 = conv("erb_conv3", e2)
    c0 = conv("df_conv0", jnp.moveaxis(fs, -1, 1))[:, :, ctx:]
    c1 = conv("df_conv1", c0)

    cemb = jnp.transpose(c1, (0, 2, 3, 1)).reshape(b, t, -1)
    cemb = _fc_emb_apply(params, L, cfg, cemb)
    emb = jnp.transpose(e3, (0, 2, 3, 1)).reshape(b, t, -1)
    emb = jnp.concatenate([emb, cemb], -1) if cfg["enc_concat"] else emb + cemb
    emb, enc_h = _gru_apply(params, L, "enc_emb_gru", cfg, emb, carry.enc_gru_h)
    lsnr = jax.nn.sigmoid(linear_apply(params["lsnr_fc"], emb))
    lsnr = lsnr * (cfg["lsnr_max"] - cfg["lsnr_min"]) + cfg["lsnr_min"]

    if cfg["grouped"]:
        demb_in = emb[..., : cfg["emb_in_dim"]]
        demb, dec_h = _gru_apply(params, L, "dec_emb_gru", cfg, demb_in,
                                 carry.dec_gru_h)
        demb = jax.nn.relu(
            grouped_linear_shuffle_apply(params["dec_fc_emb"], L["dec_fc_emb"], demb)
        )
    else:
        demb, dec_h = _gru_apply(params, L, "dec_emb_gru", cfg, emb,
                                 carry.dec_gru_h)
    f8 = e3.shape[-1]
    demb = jnp.transpose(demb.reshape(b, t, f8, -1), (0, 3, 1, 2))
    d3 = conv("convt3", conv("conv3p", e3) + demb)
    d2 = conv("convt2", conv("conv2p", e2) + d3)
    d1 = conv("convt1", conv("conv1p", e1) + d2)
    m = conv("conv0_out", conv("conv0p", e0) + d1)[:, 0]  # [B,T,E]

    if cfg["mask_pf"]:
        m = post_filter_mask(m, cfg["pf_beta"])

    spec_c = spec[..., 0] + 1j * spec[..., 1]
    bin_gains = m @ jnp.asarray(cfg["erb_inv_fb"])
    spec_m = spec_c * bin_gains

    c, df_h = _gru_apply(params, L, "df_gru", cfg, emb, carry.df_gru_h)
    if cfg["df_gru_skip"] == "identity":
        c = c + emb
    elif cfg["df_gru_skip"] == "groupedlinear":
        c = c + grouped_linear_apply(params["df_skip"], emb)
    alpha = jax.nn.sigmoid(linear_apply(params["df_fc_a"], c))  # [B,T,1]

    ktp = cfg["df_pathway_kt"]
    if ktp > 1:
        c0_ext = jnp.concatenate([carry.c0_buf, c0], axis=2)
        c0p = conv("df_convp", c0_ext)[:, :, ktp - 1 :]
        new_c0_buf = c0_ext[:, :, -(ktp - 1) :]
    else:
        c0p = conv("df_convp", c0)
        new_c0_buf = carry.c0_buf
    if cfg["df_output_layer"] == "linear":
        coefs = jnp.tanh(linear_apply(params["df_out"], c))
        c0p_l = jnp.transpose(c0p, (0, 2, 1, 3))  # [B,T,O*2,F']
        coefs = coefs.reshape(b, t, order * 2, nb_df) + c0p_l
        coefs = jnp.moveaxis(coefs.reshape(b, t, order, 2, nb_df), -1, -2)
    else:
        coefs = jnp.tanh(grouped_linear_apply(params["df_out"], c))
        c0p_g = jnp.transpose(c0p, (0, 2, 3, 1))  # [B,T,F',O*2]
        coefs = coefs.reshape(b, t, nb_df, order * 2) + c0p_g
        coefs = coefs.reshape(b, t, nb_df, order, 2)
        coefs = jnp.moveaxis(coefs, 2, 3)  # [B,T,O,F',2]
    coefs_c = coefs[..., 0] + 1j * coefs[..., 1]  # [B,T,O,F']

    # DF over the masked low band with carried ring history
    ring = carry.df_ring_re + 1j * carry.df_ring_im  # [B, O-1, F']
    lo_ext = jnp.concatenate([ring, spec_m[..., :nb_df]], axis=1)
    taps = [lo_ext[:, n : n + t] for n in range(order)]
    un = jnp.stack(taps, axis=2)  # [B, T, O, F']
    filt = jnp.sum(un * coefs_c, axis=2)
    if cfg.get("run_df", True):
        lo = _apply_alpha_df(spec_m[..., :nb_df], filt, alpha, cfg["use_alpha"])
        spec_e = jnp.concatenate([lo, spec_m[..., nb_df:]], axis=-1)
    else:
        spec_e = spec_m  # mask-only ablation; ring still advances (toggle-safe)

    new_carry = StreamState2(
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
