"""Roofline decomposition of the TRAINING step (reference hot loop:
train_net.py:62-81 / probabilistic_retinanet.py:228-331, SURVEY.md §3.1).

Times each stage as its own jitted program with explicit host fetches
(remote-tunnel rule), and reports XLA's compiled FLOP count + peak HBM via
cost_analysis/memory_analysis so every number comes with a TFLOP/s vs the
chip's measured ~122 TFLOP/s bf16 conv ceiling (DESIGN.md §5).

Safety: peak-HBM is checked at COMPILE time before any execution; a stage
whose compiled peak exceeds the HBM budget is reported compile-only and
skipped (runtime OOM on this v5e worker presents as a kernel fault with
~50 min recovery — see bench.py batch-48 note).

Usage: python tools/bench_train_breakdown.py [BATCH] [--remat]
Prints one JSON dict.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BDD_CANVAS = tuple(
    int(x) for x in os.environ.get("BENCH_CANVAS", "736,1280").split(",")
)
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REMAT = "--remat" in sys.argv
TRIALS = 6
WARMUP = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench_stage(report, name, jitted, args, fetch, donate_state=False):
    """Compile (HBM-guarded), analyze, (maybe) run, time.

    Returns last output or None. Guard + peak formula live in
    pod_compare_tpu/utils/hbm_guard.py (one implementation shared with
    bench.py and bench_train_variants.py). Runs the guard's executable
    directly — re-entering jit re-compiles whenever the persistent-cache
    load fails (intermittent on this platform)."""
    from pod_compare_tpu.utils.hbm_guard import guarded_compile

    compiled, entry = guarded_compile(jitted, args, name=name, log=log)
    if compiled is None:
        report[name] = entry
        return None
    flops = entry.get("tflop", 0.0) * 1e12
    out = None
    state = args[0] if donate_state else None
    for _ in range(WARMUP):
        if donate_state:
            out = compiled(state, *args[1:])
            state, aux = out
        else:
            out = compiled(*args)
    _ = fetch(out)
    t0 = time.time()
    for _ in range(TRIALS):
        if donate_state:
            out = compiled(state, *args[1:])
            state, aux = out
        else:
            out = compiled(*args)
    _ = fetch(out)
    dt = (time.time() - t0) / TRIALS
    entry["ms"] = round(dt * 1e3, 1)
    if flops:
        entry["tflops_per_s"] = round(flops / dt / 1e12, 1)
    log(f"{name}: {dt*1e3:.1f} ms"
        + (f", {entry.get('tflop')} TFLOP -> {entry.get('tflops_per_s')} TF/s"
           if flops else ""))
    report[name] = entry
    return out


def main():
    import jax

    if os.environ.get("FORCE_CPU") == "1":
        # This environment's sitecustomize registers the TPU plugin and the
        # JAX_PLATFORMS env var alone does NOT survive it (tests/conftest.py);
        # pin post-import for CPU smoke tests.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pod_compare_tpu.utils import enable_persistent_cache
    from pod_compare_tpu.utils.hbm_guard import synthetic_box

    enable_persistent_cache()

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.models import (
        build_anchor_generator,
        build_model,
    )
    from pod_compare_tpu.train.loss import LossConfig, compute_losses
    from pod_compare_tpu.train.optim import build_optimizer
    from pod_compare_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.SOLVER.IMS_PER_BATCH = BATCH
    cfg.PARALLEL.REMAT = REMAT

    report = {"batch": BATCH, "remat": REMAT, "canvas": list(BDD_CANVAS)}

    model = build_model(cfg)
    gen = build_anchor_generator(cfg)
    anchors = jnp.asarray(gen.concatenated(BDD_CANVAS))
    R = anchors.shape[0]
    report["num_anchors"] = int(R)
    log(f"batch {BATCH}, {R} anchors, remat={REMAT}")

    state = create_train_state(cfg, model, BDD_CANVAS, seed=0)
    rng = np.random.RandomState(0)
    G = 40  # BDD averages ~18 boxes/image; MAX_GT_BOXES default is 100
    batch = {
        "images": jnp.asarray(
            (rng.rand(BATCH, *BDD_CANVAS, 3) * 255).astype(np.uint8)
        ),
        "gt_boxes": jnp.asarray(
            np.stack([np.stack([synthetic_box(rng) for _ in range(G)])
                      for _ in range(BATCH)])
        ),
        "gt_classes": jnp.asarray(rng.randint(0, 7, (BATCH, G)), jnp.int32),
        "gt_valid": jnp.ones((BATCH, G), bool),
    }

    # ---- 1. full train step (fwd + bwd + optimizer), the production program
    train_step = make_train_step(cfg, model, anchors, mesh=None)
    out = bench_stage(
        report, "full_step", train_step, (state, batch),
        lambda o: np.asarray(o[1]["total_loss"]), donate_state=True,
    )
    if out is None or os.environ.get("FULL_STEP_ONLY") == "1":
        ms = report.get("full_step", {}).get("ms")
        if ms:
            report["img_per_s"] = round(BATCH / (ms / 1e3), 1)
        print(json.dumps(report, indent=2))
        return
    # The timed full_step donates its input state; use the returned state
    # (the original's buffers are deleted).
    state = out[0]

    lc = LossConfig.from_config(cfg)
    key = jax.random.PRNGKey(0)
    params = state.params

    # ---- 2. forward-only loss (no grad): fwd FLOPs + loss pipeline
    def fwd_loss(params, batch, k):
        kd, kl = jax.random.split(k)
        outputs = model.apply({"params": params}, batch["images"], False,
                              rngs={"dropout": kd})
        losses, _ = compute_losses(
            kl, outputs, anchors, batch["gt_boxes"],
            batch["gt_classes"].astype(jnp.int32), batch["gt_valid"],
            jnp.asarray(100.0), jnp.asarray(0, jnp.int32), lc,
        )
        return losses["loss_cls"] + losses["loss_box_reg"]

    bench_stage(report, "forward_loss", jax.jit(fwd_loss),
                (params, batch, key), lambda o: float(o))

    # ---- 3. value_and_grad without optimizer
    vg = jax.jit(jax.value_and_grad(fwd_loss))
    bench_stage(report, "forward_backward", vg, (params, batch, key),
                lambda o: float(o[0]))

    # ---- 4. backbone fwd / fwd+bwd (sum-of-features pseudo-loss)
    def backbone_loss(params, images):
        feats = model.apply({"params": params}, images, method="backbone")
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    bench_stage(
        report, "backbone_fwd",
        jax.jit(lambda p, x: model.apply({"params": p}, x, method="backbone")),
        (params, batch["images"]),
        lambda o: np.asarray(o[0][0, 0, 0, 0]),
    )
    bench_stage(report, "backbone_fwd_bwd",
                jax.jit(jax.value_and_grad(backbone_loss)),
                (params, batch["images"]), lambda o: float(o[0]))

    # ---- 5. head fwd / fwd+bwd on fixed features (single pass + dropout)
    feats = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method="backbone")
    )(params, batch["images"])
    feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)

    def head_apply(params, feats, k):
        return model.apply({"params": params}, feats, False,
                           method="forward_head", rngs={"dropout": k})

    def head_loss(params, feats, k):
        out = head_apply(params, feats, k)
        return sum(jnp.sum(v) for v in out.values() if v is not None)

    bench_stage(report, "head_fwd", jax.jit(head_apply), (params, feats, key),
                lambda o: np.asarray(o["box_cls"][0, 0, 0]))
    bench_stage(report, "head_fwd_bwd", jax.jit(jax.value_and_grad(head_loss)),
                (params, feats, key), lambda o: float(o[0]))

    # ---- 6. loss pipeline alone on synthetic head outputs (fwd+bwd wrt
    # head outputs): matcher + encode + stochastic focal bank + NLL
    outputs = {
        "box_cls": jnp.asarray(rng.randn(BATCH, R, 7).astype(np.float32) - 3),
        "box_delta": jnp.asarray(rng.randn(BATCH, R, 4).astype(np.float32) * .1),
        "box_cls_var": jnp.asarray(rng.randn(BATCH, R, 7).astype(np.float32) - 6),
        "box_reg_var": jnp.asarray(rng.randn(BATCH, R, 4).astype(np.float32) - 4),
    }

    def loss_only(outputs, batch, k):
        losses, _ = compute_losses(
            k, outputs, anchors, batch["gt_boxes"],
            batch["gt_classes"].astype(jnp.int32), batch["gt_valid"],
            jnp.asarray(100.0), jnp.asarray(0, jnp.int32), lc,
        )
        return losses["loss_cls"] + losses["loss_box_reg"]

    bench_stage(report, "loss_pipeline_fwd", jax.jit(loss_only),
                (outputs, batch, key), lambda o: float(o))
    bench_stage(report, "loss_pipeline_fwd_bwd",
                jax.jit(jax.value_and_grad(loss_only)),
                (outputs, batch, key), lambda o: float(o[0]))

    # ---- 6b. matcher alone (label_anchors_batch: (B, R, G) IoU + argmax)
    from pod_compare_tpu.ops.matcher import label_anchors_batch

    bench_stage(
        report, "matcher", jax.jit(
            lambda gb, gc, gv: label_anchors_batch(
                anchors, gb, gc, gv, 7, lc.iou_thresholds)
        ),
        (batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"]),
        lambda o: np.asarray(o.gt_classes[0, 0]),
    )

    # ---- 6c. stochastic focal bank alone, fwd+bwd wrt logits/vars
    from pod_compare_tpu.ops import losses as L

    targets = jax.nn.one_hot(
        jnp.asarray(rng.randint(0, 8, (BATCH, R))), 8
    )[..., :-1]
    valid = jnp.ones((BATCH, R), bool)

    def focal_bank(logits, log_vars, k):
        return L.stochastic_focal_loss(
            k, logits, log_vars, targets, valid, 10)

    bench_stage(report, "stochastic_focal_fwd_bwd",
                jax.jit(jax.value_and_grad(focal_bank, argnums=(0, 1))),
                (outputs["box_cls"], outputs["box_cls_var"], key),
                lambda o: float(o[0]))

    # ---- 7. optimizer update alone
    tx, _ = build_optimizer(cfg, None)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def opt_only(grads, opt_state, params):
        updates, new_opt = tx.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), new_opt

    bench_stage(report, "optimizer", jax.jit(opt_only),
                (grads, state.opt_state, params),
                lambda o: np.asarray(
                    jax.tree_util.tree_leaves(o[0])[0]).ravel()[0])

    ms = report.get("full_step", {}).get("ms")
    if ms:
        report["img_per_s"] = round(BATCH / (ms / 1e3), 1)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
