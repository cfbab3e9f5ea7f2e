"""In-situ ablation of the training step (DESIGN.md §5-style attribution).

Standalone stage timings (bench_train_breakdown.py) over-count: XLA fuses
the loss pipeline into the backward and overlaps the optimizer, so the
honest attribution is FULL-STEP deltas with one component ablated at a
time. Variants:

  base       — production step (loss_attenuation 10 samples, dropout 0.2)
  nofocal    — CLS_VAR_LOSS 'none' (plain focal): in-situ cost of the
               (10, B, R, K) stochastic sample bank (RNG + focal math)
  nodrop     — DROPOUT_RATE 0: in-situ cost of the tower dropout masks
  b24        — batch 24 (compile-time HBM-guarded)

Usage: python tools/bench_train_variants.py [variant ...]
Prints one JSON dict. Safety: peak-HBM checked at compile time before any
execution (runtime OOM on the v5e presents as a ~50-min worker outage).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BDD_CANVAS = (736, 1280)
TRIALS = 6
WARMUP = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_variant(name, batch, cls_var_loss, dropout_rate,
                shared_focal=False, shared_masks=False,
                dropout_impl="auto", focal_impl="threefry", remat=False):
    import jax
    import jax.numpy as jnp

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.models import build_anchor_generator, build_model
    from pod_compare_tpu.train.trainer import create_train_state, make_train_step

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = dropout_rate
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = cls_var_loss
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.SOLVER.IMS_PER_BATCH = batch
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.SHARED_BATCH_SAMPLES = (
        shared_focal
    )
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_SHARED_BATCH_TRAIN = shared_masks
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_IMPL = dropout_impl
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.IMPL = focal_impl
    cfg.PARALLEL.REMAT = remat

    from pod_compare_tpu.utils.hbm_guard import guarded_compile, synthetic_box

    model = build_model(cfg)
    gen = build_anchor_generator(cfg)
    anchors = jnp.asarray(gen.concatenated(BDD_CANVAS))
    state = create_train_state(cfg, model, BDD_CANVAS, seed=0)
    rng = np.random.RandomState(0)
    G = 40
    batch_data = {
        "images": jnp.asarray(
            (rng.rand(batch, *BDD_CANVAS, 3) * 255).astype(np.uint8)
        ),
        "gt_boxes": jnp.asarray(
            np.stack([np.stack([synthetic_box(rng) for _ in range(G)])
                      for _ in range(batch)])
        ),
        "gt_classes": jnp.asarray(rng.randint(0, 7, (batch, G)), jnp.int32),
        "gt_valid": jnp.ones((batch, G), bool),
    }
    step = make_train_step(cfg, model, anchors, mesh=None)

    compiled, entry = guarded_compile(
        step, (state, batch_data), name=name, log=log,
    )
    entry["batch"] = batch
    if compiled is None:
        return entry

    # Run the guard's executable directly — re-entering jit re-compiles
    # whenever the persistent-cache load fails (intermittent here).
    out = None
    for _ in range(WARMUP):
        out = compiled(state, batch_data)
        state = out[0]
    _ = np.asarray(out[1]["total_loss"])
    t0 = time.time()
    for _ in range(TRIALS):
        out = compiled(state, batch_data)
        state = out[0]
    _ = np.asarray(out[1]["total_loss"])
    dt = (time.time() - t0) / TRIALS
    entry["ms"] = round(dt * 1e3, 1)
    entry["img_per_s"] = round(batch / dt, 1)
    if "tflop" in entry:
        entry["tflops_per_s"] = round(entry["tflop"] / dt, 1)
    log(f"{name}: {entry}")
    return entry


VARIANTS = {
    # 'base' runs the production default (DROPOUT_IMPL='auto' -> the
    # hardware-PRNG pallas replay kernel for training masks on TPU);
    # 'threefry_drop' pins the pre-round-3 bernoulli path for comparison.
    "base": dict(batch=16, cls_var_loss="loss_attenuation", dropout_rate=0.2),
    "threefry_drop": dict(batch=16, cls_var_loss="loss_attenuation",
                          dropout_rate=0.2, dropout_impl="bernoulli"),
    "nofocal": dict(batch=16, cls_var_loss="none", dropout_rate=0.2),
    "nodrop": dict(batch=16, cls_var_loss="loss_attenuation", dropout_rate=0.0),
    "b24": dict(batch=24, cls_var_loss="loss_attenuation", dropout_rate=0.2),
    # Batch-shared RNG banks (per-image law identical, unbiased gradients;
    # config docs in defaults.py):
    "shared": dict(batch=16, cls_var_loss="loss_attenuation",
                   dropout_rate=0.2, shared_focal=True, shared_masks=True),
    "shared_b24": dict(batch=24, cls_var_loss="loss_attenuation",
                       dropout_rate=0.2, shared_focal=True, shared_masks=True),
    # Bit-source / kernel experiments on the reference-exact iid step:
    "rbg_drop": dict(batch=16, cls_var_loss="loss_attenuation",
                     dropout_rate=0.2, dropout_impl="rbg"),
    "pallas_focal": dict(batch=16, cls_var_loss="loss_attenuation",
                         dropout_rate=0.2, focal_impl="pallas"),
    "pallas_focal_b24": dict(batch=24, cls_var_loss="loss_attenuation",
                             dropout_rate=0.2, focal_impl="pallas"),
    "pallas_drop": dict(batch=16, cls_var_loss="loss_attenuation",
                        dropout_rate=0.2, dropout_impl="pallas"),
    # Batch probes toward the HBM budget (the guard compile-checks peak
    # HBM before anything executes, so an oversized probe costs one
    # compile, never a worker-crashing runtime OOM):
    "b28": dict(batch=28, cls_var_loss="loss_attenuation", dropout_rate=0.2),
    "b32": dict(batch=32, cls_var_loss="loss_attenuation", dropout_rate=0.2),
    "shared_b32": dict(batch=32, cls_var_loss="loss_attenuation",
                       dropout_rate=0.2, shared_focal=True, shared_masks=True),
    "shared_b40": dict(batch=40, cls_var_loss="loss_attenuation",
                       dropout_rate=0.2, shared_focal=True, shared_masks=True),
    # Remat (jax.checkpoint on the forward) x reference-exact iid banks:
    # iid b28/b32 compile at 14.5 GB > the 13.5 GB worker-safety budget
    # without remat (VERDICT r3 weak #5) — can recompute-not-store fit
    # the larger reference-exact batches, and at what step-time cost?
    "remat_b24": dict(batch=24, cls_var_loss="loss_attenuation",
                      dropout_rate=0.2, remat=True),
    "remat_b28": dict(batch=28, cls_var_loss="loss_attenuation",
                      dropout_rate=0.2, remat=True),
    "remat_b32": dict(batch=32, cls_var_loss="loss_attenuation",
                      dropout_rate=0.2, remat=True),
    "remat_shared_b40": dict(batch=40, cls_var_loss="loss_attenuation",
                             dropout_rate=0.2, shared_focal=True,
                             shared_masks=True, remat=True),
}


def main():
    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    names = sys.argv[1:] or list(VARIANTS)
    report = {}
    for name in names:
        report[name] = run_variant(name, **VARIANTS[name])
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
