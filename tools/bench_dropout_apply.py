"""Isolate WHY MC-dropout costs ~10x the head convs (v5e, batch 16:
35 ms no-dropout vs 403 ms iid / 289 ms batch-shared masks).

Hypotheses:
  (a) threefry bit generation (scales with mask volume)
  (b) the interleaved RNG ops break conv/epilogue fusion (fixed cost per
      application regardless of mask volume)
  (c) mask application bandwidth

Measures a head bank x10 where the dropout masks are PRE-GENERATED bf16
scale tensors (0 or 1/keep) passed in as inputs — no RNG inside the tower,
application is a broadcast multiply that can fuse into the conv epilogue.
Also times the mask pre-generation pass alone. If premul ~= no-dropout,
(b) is confirmed and the fix is to pregenerate masks in a separate fused
pass. Usage: python tools/bench_dropout_apply.py [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BDD_CANVAS = (736, 1280)
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
RUNS = 10
RATE = 0.2
TRIALS = 6
WARMUP = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, fn, fetch, warmup=WARMUP, trials=TRIALS):
    for _ in range(warmup):
        out = fn()
    _ = fetch(out)
    t0 = time.time()
    for _ in range(trials):
        out = fn()
    _ = fetch(out)
    dt = (time.time() - t0) / trials
    log(f"{name}: {dt * 1000:.1f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.models import build_model, init_model_params

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = RATE
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"

    model = build_model(cfg)
    params = init_model_params(model, BDD_CANVAS, seed=0)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, *BDD_CANVAS, 3) * 255, jnp.float32)
    key = jax.random.PRNGKey(0)
    report = {"batch": BATCH}

    backbone = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method="backbone")
    )
    feats = backbone(params, images)
    level_hw = [(f.shape[1], f.shape[2]) for f in feats]
    ch = feats[0].shape[3]
    n_towers, n_layers = 2, 4
    scale = 1.0 / (1.0 - RATE)

    def gen_masks(k):
        """All masks for one run: [(tower, layer, level)] -> (1,H,W,C) bf16."""
        n = n_towers * n_layers * len(level_hw)
        keys = jax.random.split(k, n)
        masks, i = [], 0
        for _ in range(n_towers * n_layers):
            per_level = []
            for (h, w) in level_hw:
                keep = jax.random.bernoulli(keys[i], 1.0 - RATE, (1, h, w, ch))
                per_level.append(
                    jnp.where(keep, jnp.bfloat16(scale), jnp.bfloat16(0.0))
                )
                i += 1
            masks.append(per_level)
        return masks

    jg = jax.jit(lambda k: gen_masks(k))
    report["mask_gen_ms"] = 1e3 * timeit(
        "mask gen x1 run (all towers/layers/levels)",
        lambda: jg(key),
        lambda o: np.asarray(o[0][0][0, 0, 0, 0].astype(jnp.float32)),
    )

    # Head bank with premultiplied masks: rebuild the tower math against the
    # model's own params, applying mask multiplies between convs.
    from flax.core import freeze

    head_params = params["head"]

    def conv_apply(name, x):
        p = head_params[name]
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16),
            p["kernel"].astype(jnp.bfloat16),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"].astype(jnp.bfloat16)

    def head_premul(f_levels, masks):
        outs = []
        for li, f in enumerate(f_levels):
            c = f.astype(jnp.bfloat16)
            b = f.astype(jnp.bfloat16)
            for layer in range(n_layers):
                c = jax.nn.relu(conv_apply(f"cls_subnet_conv{layer}", c))
                c = c * masks[layer][li]
                b = jax.nn.relu(conv_apply(f"bbox_subnet_conv{layer}", b))
                b = b * masks[n_layers + layer][li]
            outs.append(
                (
                    conv_apply("cls_score", c),
                    conv_apply("bbox_pred", b),
                    conv_apply("cls_var", c),
                    conv_apply("bbox_cov", b),
                )
            )
        return outs

    def bank_premul(f_levels, k):
        keys = jax.random.split(k, RUNS)

        def one_run(kk):
            return head_premul(f_levels, gen_masks(kk))

        return jax.vmap(one_run)(keys)

    jb = jax.jit(bank_premul)
    report["head_bank_premul_ms"] = 1e3 * timeit(
        "head bank x10, pregen+premul masks",
        lambda: jb(feats, key),
        lambda o: np.asarray(o[0][0][0, 0, 0, 0].astype(jnp.float32)),
    )

    # Control: same hand-rolled tower with NO masks.
    def bank_nomask(f_levels):
        def one_run(_):
            return head_premul(
                f_levels,
                [
                    [jnp.bfloat16(1.0) for _ in level_hw]
                    for _ in range(n_towers * n_layers)
                ],
            )

        return jax.vmap(one_run)(jnp.arange(RUNS))

    jn = jax.jit(bank_nomask)
    report["head_bank_nomask_ms"] = 1e3 * timeit(
        "head bank x10, hand tower no masks",
        lambda: jn(feats),
        lambda o: np.asarray(o[0][0][0, 0, 0, 0].astype(jnp.float32)),
    )

    print(json.dumps(report))
    with open("/tmp/bench_dropout_apply.json", "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
