"""DeepFilterNet-MF: DFN3 backbone with a multi-frame WF/MVDR output stage.

Reference: df/deepfilternetmf.py:22-401. The DF coefficient decoder is
replaced by two heads estimating the speech inter-frame correlation vector
(ifc, [B,T,F',O*2]) and a covariance matrix (cov, [B,T,F',O^2*2]) — noisy
covariance for the Wiener filter, noise covariance for MVDR — consumed by
models.multiframe.mf_wf / mf_mvdr. Offline execution only (the reference
has no streaming/tract path for the MF models either).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepfilternet_tpu.config import config
from deepfilternet_tpu.models import dfnet3
from deepfilternet_tpu.models.dfnet3 import ModelParams3
from deepfilternet_tpu.models.multiframe import mf_mvdr, mf_wf
from deepfilternet_tpu.nn import (
    conv2d_norm_act_apply,
    grouped_linear_apply,
    init_conv2d_norm_act,
    init_grouped_linear,
    squeezed_gru_s_apply,
)


class ModelParamsMF(ModelParams3):
    def __init__(self):
        super().__init__()
        s = self.section
        self.mfop_method: str = str(
            config("MFOP_METHOD", cast=str, default="WF", section=s)
        ).upper()
        self.mf_est_inverse: bool = config(
            "MF_ESTIMATE_INVERSE", cast=bool, default=True, section=s
        )
        self.mf_use_cholesky_decomp: bool = config(
            "MF_USE_CHOLESKY_DECOMP", cast=bool, default=False, section=s
        )


def init_dfnetmf(key, p: Optional[ModelParamsMF] = None) -> Tuple[Dict, Dict, Dict]:
    p = p or ModelParamsMF()
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params, state, cfg = dfnet3.init_dfnet3(k1, p)
    # Replace the DF coefficient head with ifc/cov heads
    for name in ("df_out", "df_fc_a", "df_convp"):
        params.pop(name, None)
        state.pop(name, None)
    ch = cfg["conv_ch"]
    kt = cfg["df_pathway_kt"]
    o = cfg["df_order"]
    L = cfg["layers"]
    L.pop("df_convp", None)
    prm, st, c = init_conv2d_norm_act(k2, ch, o * 2, (kt, 1), bias=False, separable=True)
    params["ifc_convp"] = prm
    if st:
        state["ifc_convp"] = st
    L["ifc_convp"] = c
    prm, st, c = init_conv2d_norm_act(k3, ch, o * o * 2, (kt, 1), bias=False, separable=True)
    params["cov_convp"] = prm
    if st:
        state["cov_convp"] = st
    L["cov_convp"] = c
    lin_groups = config("LINEAR_GROUPS", 1, int, section="deepfilternet")
    params["ifc_out"] = init_grouped_linear(
        k4, cfg["df_hidden_dim"], cfg["nb_df"] * o * 2, groups=lin_groups
    )
    params["cov_out"] = init_grouped_linear(
        k5, cfg["df_hidden_dim"], cfg["nb_df"] * o * o * 2, groups=lin_groups
    )
    cfg = dict(
        cfg,
        generation="mf",
        mfop_method=p.mfop_method,
        mf_est_inverse=p.mf_est_inverse,
        mf_use_cholesky_decomp=p.mf_use_cholesky_decomp,
    )
    return params, state, cfg


def forward(params, state, cfg, spec, feat_erb, feat_spec, train=False):
    """Same I/O contract as dfnet3.forward; 4th output is (ifc, cov)."""
    L = cfg["layers"]
    fe = feat_erb[:, None]
    fs = jnp.moveaxis(feat_spec, -1, 1)
    e0, e1, e2, e3, emb, c0, lsnr, ns1 = dfnet3._encoder(
        params, state, L, cfg, fe, fs, train
    )
    m, ns2 = dfnet3._erb_decoder(
        params, {**state, **ns1}, L, cfg, emb, e3, e2, e1, e0, train
    )
    mask = m[:, 0]
    spec_c = spec[..., 0] + 1j * spec[..., 1]
    spec_m = spec_c * (mask @ jnp.asarray(cfg["erb_inv_fb"]))

    # MF decoder (deepfilternetmf.py:150-208)
    merged = {**state, **ns1, **ns2}
    ns = dict(merged)
    b, t, _ = emb.shape
    o = cfg["df_order"]
    nb_df = cfg["nb_df"]
    c, _ = squeezed_gru_s_apply(params["df_gru"], L["df_gru"], emb)
    if cfg["df_gru_skip"] == "identity":
        c = c + emb
    elif cfg["df_gru_skip"] == "groupedlinear":
        c = c + grouped_linear_apply(params["df_skip"], emb)

    def convp(name):
        out, st = conv2d_norm_act_apply(params[name], merged.get(name, {}), L[name], c0, train)
        if name in merged:
            ns[name] = st
        return jnp.transpose(out, (0, 2, 3, 1))  # [B,T,F',*]

    ifc = grouped_linear_apply(params["ifc_out"], c).reshape(b, t, nb_df, o * 2)
    ifc = ifc + convp("ifc_convp")
    cov = grouped_linear_apply(params["cov_out"], c).reshape(b, t, nb_df, o * o * 2)
    cov = cov + convp("cov_convp")

    ifc_c = ifc.reshape(b, t, nb_df, o, 2)
    ifc_c = ifc_c[..., 0] + 1j * ifc_c[..., 1]  # [B,T,F',O]
    cov_c = cov.reshape(b, t, nb_df, o, o, 2)
    cov_c = cov_c[..., 0] + 1j * cov_c[..., 1]  # [B,T,F',O,O]

    if cfg.get("run_df", True):
        mf = mf_wf if cfg["mfop_method"] == "WF" else mf_mvdr
        spec_e = mf(
            spec_c, ifc_c, cov_c, nb_df, o, cfg["df_lookahead"],
            cholesky_decomp=cfg["mf_use_cholesky_decomp"],
            inverse=cfg["mf_est_inverse"],
        )
        spec_e = jnp.concatenate(
            [spec_e[..., :nb_df], spec_m[..., nb_df:]], axis=-1
        )
    else:
        # mask-only ablation: skip the multiframe (WF/MVDR) filter stage
        spec_e = spec_m
    spec_e_ri = jnp.stack([jnp.real(spec_e), jnp.imag(spec_e)], axis=-1)
    return (spec_e_ri, mask, lsnr, (ifc, cov)), ns
