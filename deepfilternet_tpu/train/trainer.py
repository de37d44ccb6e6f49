"""Training step + loop (reference: df/train.py:47-457).

TPU-native design: one jitted `train_step` over (params, state, opt_state,
batch, lr, wd) — gradient, AdamW update, BN stat update, NaN guard — with
data parallelism expressed through `jax.sharding` on the batch dimension
(see parallel/mesh.py); XLA inserts the gradient all-reduce over ICI.

The NaN guard mirrors train.py:381-419: non-finite loss or gradients skip
the update (params pass through unchanged) and increment a counter the
host checks against MAX_NANS.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepfilternet_tpu.config import config
from deepfilternet_tpu.train.loss import Loss

MAX_NANS = 50


class TrainState(NamedTuple):
    params: Any
    model_state: Any  # BN running stats etc.
    opt_state: Any
    step: jnp.ndarray
    nan_count: jnp.ndarray


def load_opt_config() -> Dict[str, float]:
    """[optim] section defaults mirroring df/train.py:474-512."""
    from deepfilternet_tpu.config import Csv

    betas = tuple(
        float(b) for b in config("OPT_BETAS", (0.9, 0.999), Csv(float),
                                 section="optim")
    )
    return dict(
        lr=config("LR", 5e-4, float, section="optim"),
        weight_decay=config("WEIGHT_DECAY", 0.05, float, section="optim"),
        optimizer=config("OPTIMIZER", "adamw", str, section="optim"),
        betas=betas,
        # the reference constructs Adam/AdamW with amsgrad=True
        # (df/train.py:494-496); keep that the default for parity
        amsgrad=config("AMSGRAD", True, bool, section="optim"),
        lr_min=config("LR_MIN", 1e-6, float, section="optim"),
        lr_warmup=config("LR_WARMUP", 1e-4, float, section="optim"),
        warmup_epochs=config("WARMUP_EPOCHS", 3, int, section="optim"),
        lr_cycle_mul=config("LR_CYCLE_MUL", 1.0, float, section="optim"),
        lr_cycle_decay=config("LR_CYCLE_DECAY", 0.5, float, section="optim"),
        lr_cycle_epochs=config("LR_CYCLE_EPOCHS", -1, int, section="optim"),
        weight_decay_end=config("WEIGHT_DECAY_END", -1, float, section="optim"),
    )


def scale_by_amsgrad_torch(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """AMSGrad with torch.optim semantics, bit-matching torch's Adam(W)
    amsgrad=True (torch maxes the RAW second moment and divides the
    denominator by sqrt(bias_correction2); optax.scale_by_amsgrad maxes the
    bias-CORRECTED nu_hat, which differs materially in early steps).
    Verified step-for-step vs torch in tests/test_train_parity.py."""

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return optax.ScaleByAmsgradState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros(),
            nu_max=zeros(),
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda g, m: b1 * m + (1 - b1) * g, updates, state.mu)
        nu = jax.tree.map(lambda g, v: b2 * v + (1 - b2) * g * g, updates, state.nu)
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps),
            mu, nu_max,
        )
        return out, optax.ScaleByAmsgradState(
            count=count, mu=mu, nu=nu, nu_max=nu_max
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(opt_cfg: Optional[Dict] = None) -> optax.GradientTransformation:
    opt_cfg = opt_cfg or load_opt_config()
    name = opt_cfg.get("optimizer", "adamw")
    b1, b2 = opt_cfg.get("betas", (0.9, 0.999))
    amsgrad = opt_cfg.get("amsgrad", True)
    # lr/wd are injected per-step from the cosine schedule arrays, so the
    # transformations are built with placeholder values and wrapped in
    # inject_hyperparams for runtime control.
    if name == "adamw":
        if amsgrad:
            # reference: optim.AdamW(..., amsgrad=True) (df/train.py:496)

            def _adamw_ams(learning_rate, weight_decay):
                return optax.chain(
                    scale_by_amsgrad_torch(b1, b2),
                    optax.add_decayed_weights(weight_decay),
                    optax.scale_by_learning_rate(learning_rate),
                )

            base = optax.inject_hyperparams(_adamw_ams)(
                learning_rate=opt_cfg["lr"], weight_decay=opt_cfg["weight_decay"]
            )
        else:
            base = optax.inject_hyperparams(optax.adamw)(
                learning_rate=opt_cfg["lr"], weight_decay=opt_cfg["weight_decay"],
                b1=b1, b2=b2,
            )
    elif name == "adam":
        # reference: optim.Adam(..., weight_decay=decay, amsgrad=True) —
        # COUPLED L2 (decay added to the gradient before the moment update)
        if amsgrad:

            def _adam_ams(learning_rate, weight_decay):
                return optax.chain(
                    optax.add_decayed_weights(weight_decay),
                    scale_by_amsgrad_torch(b1, b2),
                    optax.scale_by_learning_rate(learning_rate),
                )

            base = optax.inject_hyperparams(_adam_ams)(
                learning_rate=opt_cfg["lr"], weight_decay=opt_cfg["weight_decay"]
            )
        else:
            base = optax.inject_hyperparams(optax.adam)(
                learning_rate=opt_cfg["lr"], b1=b1, b2=b2
            )
    elif name == "sgd":
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(opt_cfg["weight_decay"]),
                optax.sgd(learning_rate, momentum=0.9, nesterov=True),
            )
        )(learning_rate=opt_cfg["lr"])
    elif name == "rmsprop":
        base = optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=opt_cfg["lr"], momentum=0.9
        )
    else:
        raise ValueError(f"Unknown optimizer {name}")
    return optax.chain(optax.clip_by_global_norm(1.0), base)


def _set_lr(opt_state, lr, wd=None):
    """Write injected hyperparams in-place on the optax chain state."""
    inner = opt_state[1]  # after clip_by_global_norm
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = lr
    if wd is not None and "weight_decay" in hp:
        hp["weight_decay"] = wd
    return (opt_state[0], inner._replace(hyperparams=hp))


# DF-decoder top-level param keys across model families; frozen under
# MASK_ONLY like the reference's optimizer param filter (df/train.py:490-494
# excludes "dfrnn"/"df_dec"-named params — the encoder-side df_conv0/1 and
# df_fc_emb live under "enc." there and stay trainable, as here).
DF_DECODER_KEYS = ("df_gru", "df_skip", "df_convp", "df_out", "df_fc_a")


def trainable_filter(mask_only: bool = False, df_only: bool = False):
    """Top-level param-key predicate mirroring df/train.py:486-494."""
    if mask_only:
        return lambda k: k not in DF_DECODER_KEYS
    if df_only:
        return lambda k: "df" in k.lower()
    return None


def make_train_step(
    module,
    cfg: Dict,
    loss_obj: Loss,
    optimizer: optax.GradientTransformation,
    trainable: Optional[Callable[[str], bool]] = None,
) -> Callable:
    """Build the jittable training step for an offline-forward model module.

    `trainable`: optional predicate over top-level param-tree keys; keys
    for which it returns False are fully frozen (no gradient update, no
    weight decay) — the analog of the reference's optimizer param
    filtering for MASK_ONLY / DF_ONLY training (df/train.py:486-494)."""

    # DFN1/DFN2 forwards return df_alpha as the 4th output (consumed by
    # DfAlphaLoss, df/loss.py:297-342); DFN3's 4th output is df_coefs
    returns_alpha = cfg.get("generation", 3) in (1, 2)

    def loss_fn(params, model_state, batch):
        (spec_e, m, lsnr, aux), new_state = module.forward(
            params, model_state, cfg,
            batch["noisy"], batch["feat_erb"], batch["feat_spec"], train=True,
        )
        clean = batch["clean"][..., 0] + 1j * batch["clean"][..., 1]
        noisy = batch["noisy"][..., 0] + 1j * batch["noisy"][..., 1]
        enh = spec_e[..., 0] + 1j * spec_e[..., 1]
        df_alpha = aux if returns_alpha else None
        total, parts = loss_obj(clean, noisy, enh, m, lsnr, df_alpha=df_alpha)
        return total, (new_state, parts)

    def train_step(ts: TrainState, batch: Dict, lr: jnp.ndarray, wd: jnp.ndarray):
        opt_state = _set_lr(ts.opt_state, lr, wd)
        (loss, (new_model_state, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params, ts.model_state, batch)
        # NaN guard: skip non-finite updates (train.py:381-419 analog)
        flat = jax.tree.leaves(grads)
        finite = jnp.isfinite(loss)
        for g in flat:
            finite = finite & jnp.all(jnp.isfinite(g))
        updates, new_opt_state = optimizer.update(grads, opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        if trainable is not None:
            new_params = {
                k: (v if trainable(k) else ts.params[k])
                for k, v in new_params.items()
            }

        def keep_new(new, old):
            return jax.tree.map(lambda n, o: jnp.where(finite, n, o), new, old)

        new_ts = TrainState(
            params=keep_new(new_params, ts.params),
            model_state=keep_new(new_model_state, ts.model_state),
            opt_state=keep_new(new_opt_state, opt_state),
            step=ts.step + 1,
            nan_count=ts.nan_count + jnp.where(finite, 0, 1),
        )
        metrics = {"loss": loss, "finite": finite, **parts}
        return new_ts, metrics

    return train_step


def init_train_state(params, model_state, optimizer) -> TrainState:
    return TrainState(
        params=params,
        model_state=model_state,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        nan_count=jnp.zeros((), jnp.int32),
    )
