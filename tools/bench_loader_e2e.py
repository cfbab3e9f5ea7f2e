"""End-to-end loader-fed inference throughput (VERDICT r2 weak #8).

The per-mode benches time device-resident batches; this tool measures the
standard_nms pipeline WITH the host loader in the loop at BDD-val
geometry: JPEG decode -> shortest-edge resize -> uint8 canvas ->
host->device -> jitted pipeline -> detections fetched.

Three numbers per worker backend (thread | process):
  loader_img_per_s  — loader alone draining batches (no TPU);
  e2e_img_per_s     — loader + device pipeline overlapped via the
                      loader's prefetch thread;
  device_img_per_s  — device pipeline alone on one resident batch.

Remote-tunnel caveat: in this sandbox every batch crosses the tunnel
(~0.25 s/batch of pure transfer, DESIGN.md §5) — on a real TPU VM the
host->device copy is PCIe/DMA and the e2e number approaches
min(loader, device).

Usage: python tools/bench_loader_e2e.py [NUM_IMAGES] [BATCH]
Prints one JSON dict.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

NUM_IMAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 192
# Default batch 16: every pipeline has run hundreds of iterations at 16
# across rounds. b32 standard_nms is proven fine ALONE
# (tools/probe_standard_nms.py), but this tool runs several programs +
# loader processes in one long-lived process, and two b32 runs crashed
# the v5e worker on 2026-08-19 — don't gamble the worker on a frontier.
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
H, W = 720, 1280


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_dataset(root):
    """NUM_IMAGES JPEGs at BDD geometry with some structure (flat images
    compress unrealistically well, skewing decode cost)."""
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    base = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    base = cv2.GaussianBlur(base, (0, 0), 3)  # JPEG-realistic spectrum
    records = []
    for i in range(NUM_IMAGES):
        img = np.roll(base, int(rng.randint(0, H)), axis=0)
        cv2.rectangle(img, (100 + i % 50, 100), (400, 400), (255, 0, 0), -1)
        path = os.path.join(img_dir, f"{i:05d}.jpg")
        cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 85])
        records.append({
            "file_name": path, "image_id": i, "height": H, "width": W,
            "annotations": [],
        })
    return records


class _ListDataset:
    name = "bench_e2e"

    def __init__(self, records):
        self._records = records

    def load(self):
        return self._records


def main():
    import jax

    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.data.loader import TestLoader
    from pod_compare_tpu.inference.predictor import build_predictor
    from pod_compare_tpu.models import build_model, init_model_params

    root = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        t0 = time.time()
        records = make_dataset(root)
        log(f"dataset: {NUM_IMAGES} jpgs in {time.time() - t0:.1f}s")
        dataset = _ListDataset(records)

        cfg = get_cfg()
        cfg.MODEL.RETINANET.NUM_CLASSES = 7
        cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "standard_nms"
        cfg.PARALLEL.COMPUTE_DTYPE = "bfloat16"

        report = {"num_images": NUM_IMAGES, "batch": BATCH}

        def build_loader(backend, workers):
            return TestLoader(
                dataset, batch_size=BATCH, min_size=720, max_size=1333,
                num_workers=workers, worker_backend=backend,
            )

        # ---- loader-only rates
        for backend, workers in (("thread", 4), ("process", 4)):
            loader = build_loader(backend, workers)
            # warm one batch (pools spin up, page cache warms)
            it = iter(loader)
            next(it)
            t0 = time.time()
            n = BATCH  # first batch already drawn
            for b in it:
                n += int(b["batch_valid"].sum())
            dt = time.time() - t0
            rate = (n - BATCH) / dt
            report[f"loader_{backend}_img_per_s"] = round(rate, 1)
            log(f"loader[{backend} x{workers}]: {rate:.1f} img/s")

        # ---- device pipeline alone (resident batch)
        loader = build_loader("thread", 4)
        canvas = loader.canvas
        import jax.numpy as jnp

        batch0 = next(iter(loader))
        images = jnp.asarray(batch0["images"])
        sizes = jnp.asarray(batch0["input_sizes"])
        osizes = jnp.asarray(batch0["output_sizes"])
        key = jax.random.PRNGKey(0)

        def mode_cfg(mode):
            c = cfg.clone()
            c.PROBABILISTIC_INFERENCE.INFERENCE_MODE = (
                "bayes_od" if mode == "bayes_od_mc" else mode
            )
            if mode == "bayes_od_mc":
                c.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
                c.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = (
                    "loss_attenuation"
                )
                c.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
                c.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = (
                    "negative_log_likelihood"
                )
                c.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.9
                c.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
                c.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 10
                c.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE = "max_score"
            return c

        # Both user-facing pipelines: plain standard NMS (host decode is
        # the wall) and the flagship BayesOD+MC (device is the wall).
        for mode in ("standard_nms", "bayes_od_mc"):
            mcfg = mode_cfg(mode)
            model = build_model(mcfg)
            params = init_model_params(model, canvas, seed=0)
            predictor = build_predictor(mcfg, canvas, params=params)
            log(f"[{mode}] compiling device pipeline...")
            for i in range(6):
                dets = predictor(images, sizes, osizes, key)
            _ = np.asarray(dets.boxes)
            t0 = time.time()
            for i in range(6):
                dets = predictor(images, sizes, osizes, key)
            _ = np.asarray(dets.boxes)
            dev = BATCH * 6 / (time.time() - t0)
            report[f"device_{mode}_img_per_s"] = round(dev, 1)
            log(f"[{mode}] device pipeline: {dev:.1f} img/s")

            # ---- end-to-end: loader feeding the device pipeline.
            # 'h2d_overlap' legs wrap the loader in DevicePrefetcher
            # (VERDICT r4 #5): a background thread device_puts batch i+1
            # while batch i computes, so the ~0.25 s/batch tunnel copy
            # rides under compute instead of serializing with it.
            from pod_compare_tpu.data.loader import DevicePrefetcher

            for backend, workers in (("thread", 4), ("process", 4)):
                for overlap in (False, True):
                    loader = build_loader(backend, workers)
                    feed = (
                        DevicePrefetcher(loader) if overlap else iter(loader)
                    )
                    n = 0
                    t0 = time.time()
                    last = None
                    for b in feed:
                        last = predictor(
                            b["images"], b["input_sizes"],
                            b["output_sizes"], key,
                        )
                        n += int(b["batch_valid"].sum())
                    _ = np.asarray(last.boxes)
                    dt = time.time() - t0
                    tag = f"e2e_{mode}_{backend}" + (
                        "_h2d_overlap" if overlap else ""
                    )
                    report[f"{tag}_img_per_s"] = round(n / dt, 1)
                    log(f"[{mode}] {tag}[x{workers}]: {n / dt:.1f} img/s")
                    loader.close()

            # ---- pre-decoded cache mode: all canvases decoded to host
            # RAM up front, so this leg isolates dispatch+transfer from
            # JPEG-decode cost (proves which side saturates first).
            loader = build_loader("thread", 4)
            host_batches = list(iter(loader))
            loader.close()
            for overlap in (False, True):
                feed = (
                    DevicePrefetcher(iter(host_batches))
                    if overlap else iter(host_batches)
                )
                n = 0
                t0 = time.time()
                last = None
                for b in feed:
                    last = predictor(
                        b["images"], b["input_sizes"], b["output_sizes"], key
                    )
                    n += int(b["batch_valid"].sum())
                _ = np.asarray(last.boxes)
                dt = time.time() - t0
                tag = f"e2e_{mode}_predecoded" + (
                    "_h2d_overlap" if overlap else ""
                )
                report[f"{tag}_img_per_s"] = round(n / dt, 1)
                log(f"[{mode}] {tag}: {n / dt:.1f} img/s")

        print(json.dumps(report))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
