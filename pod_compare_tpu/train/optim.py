"""Optimizer and LR schedule (optax).

Replicates the reference's solver semantics (detectron2 defaults +
Base-BDD-RetinaNet.yaml:17-21): torch-style SGD with momentum 0.9, weight
decay 1e-4, linear warmup (factor 1/1000 over 1000 iters) and multi-step
gamma=0.1 decay at STEPS.

Frozen parameters (FrozenBN stats/affines, stem/res2 when FREEZE_AT=2)
already receive zero gradients via stop_gradient; they are additionally
masked out of weight decay and momentum so `decay * param` cannot mutate
them — matching torch's requires_grad=False semantics.
"""

from typing import Callable, Sequence

import jax
import optax


def warmup_multistep_schedule(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: int = 1000,
) -> Callable:
    """detectron2 WarmupMultiStepLR."""

    def schedule(count):
        import jax.numpy as jnp

        count = jnp.asarray(count, jnp.float32)
        warmup_w = jnp.where(
            count < warmup_iters,
            warmup_factor * (1.0 - count / warmup_iters) + count / warmup_iters,
            1.0,
        )
        decay = 1.0
        for s in steps:
            decay = decay * jnp.where(count >= s, gamma, 1.0)
        return base_lr * warmup_w * decay

    return schedule


_FROZEN_BN_KEYS = frozenset({"scale", "bias", "mean", "var"})


def trainable_mask(params, freeze_at: int = 2):
    """Pytree of bools: False for FrozenBN tensors and frozen stages."""

    def frozen_path(path) -> bool:
        keys = [getattr(p, "key", str(p)) for p in path]
        # FrozenBN parameters live under *norm* module names.
        if any("norm" in k for k in keys) and keys[-1] in _FROZEN_BN_KEYS:
            return True
        for k in keys:
            if k.startswith("stem_") and freeze_at >= 1:
                return True
            for stage in range(2, 6):
                if k.startswith(f"res{stage}_") and freeze_at >= stage:
                    return True
        return False

    return jax.tree_util.tree_map_with_path(
        lambda path, _: not frozen_path(path), params
    )


def build_optimizer(cfg, params=None):
    schedule = warmup_multistep_schedule(
        base_lr=cfg.SOLVER.BASE_LR,
        steps=cfg.SOLVER.STEPS,
        gamma=cfg.SOLVER.GAMMA,
        warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
        warmup_iters=cfg.SOLVER.WARMUP_ITERS,
    )
    # Weight decay is masked to trainable params only (callable mask, so no
    # params are needed at build time); frozen params have exactly-zero
    # grads (stop_gradient), so trace+scale leave them at zero.
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_AT
    mask = lambda p: trainable_mask(p, freeze_at)
    chain = [
        optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY, mask=mask),
        optax.trace(decay=cfg.SOLVER.MOMENTUM),
        optax.scale_by_schedule(lambda c: -schedule(c)),
    ]
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        clip_type = cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE
        if clip_type == "value":
            clipper = optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        elif clip_type == "norm":
            clipper = optax.clip_by_global_norm(
                cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE
            )
        else:
            raise ValueError(
                f"SOLVER.CLIP_GRADIENTS.CLIP_TYPE must be 'value' or "
                f"'norm', got {clip_type!r}"
            )
        chain.insert(0, clipper)
    return optax.chain(*chain), schedule


def make_schedule_fn(cfg) -> Callable:
    return warmup_multistep_schedule(
        base_lr=cfg.SOLVER.BASE_LR,
        steps=cfg.SOLVER.STEPS,
        gamma=cfg.SOLVER.GAMMA,
        warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
        warmup_iters=cfg.SOLVER.WARMUP_ITERS,
    )
