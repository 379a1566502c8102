"""Training metrics.

Parity: reference `e2edet/criterion/metrics.py` — Accuracy (top-k on matched
logits, :64-88) and Cardinality (predicted-vs-GT count error, :91-107),
registry (:9-34). Metrics are pure jnp functions over the final matching the
criterion exposes (`_query_idx`/`_valid`).
"""

from typing import Dict

import jax.numpy as jnp

from boxer_tpu.utils.registry import METRIC_REGISTRY


def register_metric(name):
    return METRIC_REGISTRY.register(name)


@register_metric("accuracy")
def accuracy(outputs, targets, query_idx, valid, topk: int = 1) -> jnp.ndarray:
    """Top-k accuracy over matched (query, target-label) pairs."""
    logits = outputs["pred_logits"].astype(jnp.float32)  # (B, NQ, C)
    matched = jnp.take_along_axis(
        logits, query_idx[..., None], axis=1
    )  # (B, NT, C)
    k = min(topk, logits.shape[-1])
    top = jnp.argsort(-matched, axis=-1)[..., :k]
    correct = (top == targets["labels"][..., None]).any(-1)
    vf = valid.astype(jnp.float32)
    return (correct.astype(jnp.float32) * vf).sum() / jnp.clip(vf.sum(), 1.0,
                                                               None) * 100.0


@register_metric("cardinality")
def cardinality(outputs, targets, query_idx, valid) -> jnp.ndarray:
    """|#high-confidence predictions − #GT| per image, averaged."""
    logits = outputs["pred_logits"].astype(jnp.float32)
    prob = jnp.max(jnp.where(
        jnp.isfinite(logits), logits, -jnp.inf), axis=-1)
    pred_count = (prob > 0.0).astype(jnp.float32).sum(axis=1)
    gt_count = valid.astype(jnp.float32).sum(axis=1)
    return jnp.abs(pred_count - gt_count).mean()


def build_metrics(metric_configs) -> Dict[str, callable]:
    out = {}
    for m in metric_configs or []:
        name = m["type"]
        out[name] = METRIC_REGISTRY.get(name)
    return out


def compute_metrics(metrics: Dict, outputs, targets, losses) -> Dict[str, jnp.ndarray]:
    """Evaluate configured metrics using the criterion's final matching."""
    if "_query_idx" not in losses:
        return {}
    qi = losses["_query_idx"]
    valid = losses["_valid"]
    return {name: fn(outputs, targets, qi, valid)
            for name, fn in metrics.items()}
