"""Training losses.

Parity targets (reference train.py):
- seg loss (cellpose ``_loss_fn_seg``, imported at train.py:11): MSE between
  predicted flows and 5× unit GT flows, halved, plus BCE-with-logits on the
  cell probability vs the binary mask;
- masked cross-entropy over class logits, ignore_index −100, optional class
  weights (``_loss_fn_class`` train.py:156-181);
- focal Tversky loss, α=0.3, γ=1.33, valid-pixel masking of −100
  (``_loss_fn_tversky`` train.py:108-153);
- Kendall-style uncertainty aggregation with learnable log-variances
  (``LossAggregator`` train.py:37-105): total = Σ exp(−s)·L + s.

Label layout (B, 4, H, W): [class(−100-masked), binary, flow_y, flow_x];
prediction layout (B, n_classes+3, H, W): [class logits..., flow_y, flow_x,
cellprob logit].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def loss_fn_seg(lbl: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Flows MSE (scaled 5, halved) + cellprob BCE."""
    veci = 5.0 * lbl[:, -2:]
    flows_pred = y[:, -3:-1]
    mse = jnp.mean((flows_pred - veci) ** 2) / 2.0
    logits = y[:, -1]
    target = (lbl[:, -3] > 0.5).astype(jnp.float32)
    bce = jnp.mean(
        jnp.maximum(logits, 0) - logits * target
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return mse + bce


def loss_fn_class(
    lbl: jnp.ndarray,
    y: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Masked (ignore −100), optionally class-weighted cross-entropy.

    Matches torch CrossEntropyLoss(weight=w, ignore_index=-100,
    reduction='mean') semantics: the mean is weighted by per-sample class
    weights."""
    logits = y[:, :-3]  # (B, C, H, W)
    target = lbl[:, 0].astype(jnp.int32)  # (B, H, W)
    valid = target != -100
    safe_target = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits, axis=1)
    picked = jnp.take_along_axis(
        logp, safe_target[:, None], axis=1
    )[:, 0]
    if class_weights is not None:
        w = jnp.asarray(class_weights)[safe_target]
    else:
        w = jnp.ones_like(picked)
    w = w * valid
    return -(picked * w).sum() / jnp.maximum(w.sum(), 1e-12)


def loss_fn_tversky(
    lbl: jnp.ndarray,
    y: jnp.ndarray,
    n_classes: int,
    class_weights: jnp.ndarray | None = None,
    alpha: float = 0.3,
    gamma: float = 1.33,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Focal Tversky loss over the class channels."""
    beta = 1.0 - alpha
    target = lbl[:, 0].astype(jnp.int32)
    valid = (target != -100).astype(jnp.float32)[:, None]
    safe_target = jnp.where(target == -100, 0, target)
    one_hot = jax.nn.one_hot(
        safe_target, n_classes, axis=1, dtype=jnp.float32
    )  # (B, C, H, W)
    probs = jax.nn.softmax(y[:, :-3], axis=1)
    tp = jnp.sum(probs * one_hot * valid, axis=(2, 3))
    fp = jnp.sum(probs * (1 - one_hot) * valid, axis=(2, 3))
    fn = jnp.sum((1 - probs) * one_hot * valid, axis=(2, 3))
    loss = 1.0 - tp / (tp + alpha * fp + beta * fn + 1e-30)
    loss = jnp.clip(loss, eps, 1 - eps) ** (1.0 / gamma)
    if class_weights is not None:
        loss = loss * jnp.asarray(class_weights)
    return loss.mean()


def init_log_var(n_losses: int) -> jnp.ndarray:
    """Initial log-variance params for uncertainty weighting."""
    return jnp.zeros(n_losses, jnp.float32)


def aggregate_losses(
    log_var: jnp.ndarray, losses: jnp.ndarray, optimise: bool = True
) -> jnp.ndarray:
    """Kendall et al. multi-task weighting: Σ exp(−s)·L (+ s if learned)."""
    precision = jnp.exp(-log_var)
    weighted = precision * losses
    if optimise:
        weighted = weighted + log_var
    return weighted.sum()


def uncertainty_factors(
    log_var, seg_trainable: bool = True
) -> dict[str, float]:
    """Logging helper (reference LossAggregator.get_uncertainty_factors)."""
    import numpy as np

    w = np.exp(-np.asarray(log_var))
    out = {}
    i = 0
    if seg_trainable:
        out["seg_weight"] = float(w[i])
        i += 1
    out["ce_weight"] = float(w[i])
    out["tversky_weight"] = float(w[i + 1])
    return out
