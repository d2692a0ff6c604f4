"""Minimal functional optimizers with *runtime* lr/momentum.

The reference interpolates lr and momentum per-iteration during warmup
(ref: engine/trainer.py:393-403), which under jit means they must be step
arguments, not baked into the optimizer state. These optimizers take (lr,
momentum) at update time, so one compiled train step serves the whole schedule.

Grouping matches the reference optimizer build (ref :829): weight decay only on
conv/linear kernel weights (g0); BN scale/bias and biases undecayed (g1/g2);
DFL projection and BN running stats frozen.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _path_keys(path):
    return [str(getattr(p, "key", p)) for p in path]


def is_decay_param(path, p=None) -> bool:
    """Decay group = conv/linear KERNEL weights only (ref g0). Norm gains
    (BN, LayerNorm, BNContrastiveHead.norm, ...) are 1-D 'weight' leaves —
    the ndim>=2 test puts every norm scale in the no-decay group without
    needing to enumerate module names."""
    keys = _path_keys(path)
    if keys[-1] != "weight" or "bn" in keys or "dfl" in keys:
        return False
    return p is None or getattr(p, "ndim", 2) >= 2


def is_bias_param(path) -> bool:
    """The reference's g2 group (all module biases) — warmup starts these at
    warmup_bias_lr instead of 0 (ref trainer.py:397)."""
    return _path_keys(path)[-1] == "bias"


def is_frozen_param(path) -> bool:
    keys = _path_keys(path)
    return "dfl" in keys or keys[-1] in ("running_mean", "running_var")


def clip_by_global_norm(grads, max_norm: float):
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), gnorm


class SGD:
    """SGD + nesterov momentum + decoupled weight decay on the decay group."""

    def __init__(self, weight_decay: float = 0.0, nesterov: bool = True, clip_norm: float = 10.0):
        self.weight_decay = weight_decay
        self.nesterov = nesterov
        self.clip_norm = clip_norm

    def init(self, params):
        return {"mu": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update(self, grads, state, params, lr, momentum, lr_bias=None):
        grads, _ = clip_by_global_norm(grads, self.clip_norm)
        lr_bias = lr if lr_bias is None else lr_bias

        def upd(path, g, mu, p):
            if is_frozen_param(path):
                return jnp.zeros_like(p), mu
            if self.weight_decay and is_decay_param(path, p):
                g = g + self.weight_decay * p
            mu_new = momentum * mu + g
            step = g + momentum * mu_new if self.nesterov else mu_new
            return -(lr_bias if is_bias_param(path) else lr) * step, mu_new

        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        g_flat = jax.tree_util.tree_leaves(grads)
        mu_flat = jax.tree_util.tree_leaves(state["mu"])
        deltas, mus = [], []
        for (path, p), g, mu in zip(flat, g_flat, mu_flat):
            d, m = upd(path, g, mu, p)
            deltas.append(d)
            mus.append(m)
        new_params = jax.tree_util.tree_unflatten(treedef, [p + d for (_, p), d in zip(flat, deltas)])
        return new_params, {"mu": jax.tree_util.tree_unflatten(treedef, mus)}


class AdamW:
    """AdamW with runtime (lr, b1); decoupled decay on the decay group only."""

    def __init__(self, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, clip_norm: float = 10.0):
        self.weight_decay = weight_decay
        self.b1 = b1
        self.b2 = b2
        self.eps = eps
        self.clip_norm = clip_norm

    def init(self, params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"m": zeros, "v": jax.tree_util.tree_map(jnp.zeros_like, params), "t": jnp.zeros((), jnp.float32)}

    def update(self, grads, state, params, lr, momentum=None, lr_bias=None):
        # `momentum` is accepted for a uniform update() signature but IGNORED:
        # the reference only warms the 'momentum' key of SGD param groups —
        # Adam betas stay fixed (and the 1-b1**t bias correction below is
        # only valid for a constant b1)
        del momentum
        b1 = self.b1
        grads, _ = clip_by_global_norm(grads, self.clip_norm)
        lr_bias = lr if lr_bias is None else lr_bias
        t = state["t"] + 1.0

        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        g_flat = jax.tree_util.tree_leaves(grads)
        m_flat = jax.tree_util.tree_leaves(state["m"])
        v_flat = jax.tree_util.tree_leaves(state["v"])
        new_p, new_m, new_v = [], [], []
        for (path, p), g, m, v in zip(flat, g_flat, m_flat, v_flat):
            if is_frozen_param(path):
                new_p.append(p)
                new_m.append(m)
                new_v.append(v)
                continue
            m2 = b1 * m + (1 - b1) * g
            v2 = self.b2 * v + (1 - self.b2) * jnp.square(g)
            mhat = m2 / (1 - b1**t)
            vhat = v2 / (1 - self.b2**t)
            step = mhat / (jnp.sqrt(vhat) + self.eps)
            if self.weight_decay and is_decay_param(path, p):
                step = step + self.weight_decay * p
            new_p.append(p - (lr_bias if is_bias_param(path) else lr) * step)
            new_m.append(m2)
            new_v.append(v2)
        return (
            jax.tree_util.tree_unflatten(treedef, new_p),
            {
                "m": jax.tree_util.tree_unflatten(treedef, new_m),
                "v": jax.tree_util.tree_unflatten(treedef, new_v),
                "t": t,
            },
        )


def build_optimizer(name: str, weight_decay: float):
    if name in ("Adam", "AdamW", "NAdam", "RAdam"):
        return AdamW(weight_decay=weight_decay)
    if name in ("SGD", "RMSProp"):
        return SGD(weight_decay=weight_decay)
    raise ValueError(f"unknown optimizer {name}")


def apply_bn_stats(params, stats, bn_momentum: float = 0.03):
    """Fold collected batch moments into BN running stats, torch update rule
    (momentum 0.03 like the reference's BatchNorm2d(momentum=0.03), unbiased
    variance). `stats`: {param-path: (batch_mean, batch_var, n)} as collected
    by Ctx.stats during a training forward. Shared by the detection and
    classification trainers."""

    def walk(tree, prefix):
        out = {}
        for k, v in tree.items():
            pth = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                if pth in stats and "running_mean" in v:
                    m, var, n = stats[pth]
                    ub = var * (n / max(n - 1, 1))
                    out[k] = {
                        **v,
                        "running_mean": (1 - bn_momentum) * v["running_mean"] + bn_momentum * m,
                        "running_var": (1 - bn_momentum) * v["running_var"] + bn_momentum * ub,
                    }
                else:
                    out[k] = walk(v, pth)
            else:
                out[k] = v
        return out

    return walk(params, "")
