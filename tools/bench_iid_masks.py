"""Measure reference-exact IID dropout masks in the MC inference bank.

Round-2 negative result (DESIGN.md §5 table): iid per-sample masks
inside the vmapped 10-run bank OOM'd the v5e at batch 16 with fused
threefry draws (every padded bool slice live at once), so the bank ran
batch-shared (`PROBABILISTIC_INFERENCE.MC_DROPOUT.BATCH_SHARED_MASKS`,
per-image law unchanged). The round-3 hardware-PRNG replay kernel
(`DROPOUT_IMPL='auto'` → 'pallas' for per-sample masks on TPU) never
materializes a mask, which may lift that OOM and make the bank's
reference-exact iid-mask configuration (reference: one dropout stream
per forward, probabilistic_inference.py:84-120) runnable at batch 16.

Compile-guards with the shared HBM budget first; prints a JSON line per
leg. Run on the TPU host: `python tools/bench_iid_masks.py`.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

BDD_CANVAS = (736, 1280)
WARMUP_ITERS = 4
MEASURE_ITERS = 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_cfg
    from pod_compare_tpu.inference.predictor import build_predictor
    from pod_compare_tpu.models import build_model, init_model_params
    from pod_compare_tpu.utils.hbm_guard import guarded_compile

    cfg0 = build_cfg("mc_iid")
    model = build_model(cfg0)
    params = init_model_params(model, BDD_CANVAS, seed=0)

    results = {}
    for name, shared_masks, batch in (
        ("iid_masks_b16", False, 16),
        ("shared_masks_b16", True, 16),
    ):
        cfg = build_cfg("mc_iid")
        cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.BATCH_SHARED_MASKS = (
            shared_masks
        )
        predictor = build_predictor(cfg, BDD_CANVAS, params=params)

        rng = np.random.RandomState(0)
        images = jnp.asarray(
            rng.rand(batch, *BDD_CANVAS, 3) * 255, jnp.float32
        )
        sizes = jnp.asarray(
            np.tile(np.array([720.0, 1280.0], np.float32), (batch, 1))
        )
        key = jax.random.PRNGKey(0)

        compiled, info = guarded_compile(
            predictor._fn, (predictor.params, images, key, sizes, sizes),
            name=name, log=log,
        )
        if compiled is None:
            results[name] = {**info, "skipped": True}
            continue

        run = lambda k: compiled(predictor.params, images, k, sizes, sizes)
        for i in range(WARMUP_ITERS):
            key, sub = jax.random.split(key)
            dets = run(sub)
        _ = np.asarray(dets.boxes)
        t0 = time.time()
        for _i in range(MEASURE_ITERS):
            key, sub = jax.random.split(key)
            dets = run(sub)
        _ = np.asarray(dets.boxes)
        elapsed = time.time() - t0
        results[name] = {
            **info,
            "ms": round(1e3 * elapsed / MEASURE_ITERS, 1),
            "img_per_s": round(batch * MEASURE_ITERS / elapsed, 1),
        }
        log(f"{name}: {results[name]}")

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
