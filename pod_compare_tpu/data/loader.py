"""Input pipeline: decode → resize → flip → pad-to-static-canvas → batch.

TPU-native replacement for detectron2's DatasetMapper/ImageList pipeline
exercised by the reference (reference: probabilistic_retinanet.py:96 +
INPUT.* config, Base-BDD-RetinaNet.yaml:23-24). XLA needs static shapes, so
every image is resized with the reference's shortest-edge rule and padded
onto ONE static canvas computed from the dataset's image geometry; ground
truth is padded to a fixed box count with a validity mask.

A background prefetch thread overlaps host decode with device compute.
"""

import queue
import threading
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

import cv2
import numpy as np

from pod_compare_tpu.data.datasets import DatasetInfo


def resize_shortest_edge(
    h: int, w: int, min_size: int, max_size: int
) -> Tuple[int, int]:
    """detectron2 ResizeShortestEdge geometry: scale shortest side to
    `min_size`, capping the longest at `max_size`."""
    scale = min_size / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    new_h, new_w = int(h * scale + 0.5), int(w * scale + 0.5)
    return new_h, new_w


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def static_canvas(
    sizes: List[Tuple[int, int]], min_size: int, max_size: int, divisibility: int
) -> Tuple[int, int]:
    """Static padded (H, W) covering every resized image in the dataset."""
    hs, ws = zip(
        *[resize_shortest_edge(h, w, min_size, max_size) for h, w in set(sizes)]
    )
    return round_up(max(hs), divisibility), round_up(max(ws), divisibility)


def load_image_bgr(path: str) -> np.ndarray:
    """(H, W, 3) uint8 BGR image (the reference's INPUT.FORMAT).

    Kept uint8 through resize/pad/batch — 4x less host memory and
    host->device traffic than a float pipeline; normalization casts to
    the compute dtype INSIDE the jitted graph (models/retinanet.py
    ::normalize). detectron2's DatasetMapper likewise resizes uint8."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img


@dataclass
class LoaderConfig:
    min_size: int
    max_size: int
    divisibility: int = 32
    max_gt_boxes: int = 100
    flip: bool = False
    image_format: str = "BGR"
    # Multi-scale training: detectron2's ResizeShortestEdge "choice"
    # sampling over the MIN_SIZE_TRAIN tuple (the published configs pin a
    # single size, Base-BDD-RetinaNet.yaml:23-24, but multi-scale configs
    # are legal). The static canvas covers the LARGEST choice; smaller
    # choices just leave more padding.
    min_size_choices: Optional[Tuple[int, ...]] = None


def _prepare_record(
    record: dict, lc: LoaderConfig, canvas: Tuple[int, int], rng: np.random.RandomState
) -> Dict[str, np.ndarray]:
    img = load_image_bgr(record["file_name"])
    if lc.image_format == "RGB":
        img = img[:, :, ::-1]
    h0, w0 = img.shape[:2]
    min_size = lc.min_size
    if lc.min_size_choices and len(lc.min_size_choices) > 1:
        min_size = lc.min_size_choices[rng.randint(len(lc.min_size_choices))]
    nh, nw = resize_shortest_edge(h0, w0, min_size, lc.max_size)
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)

    boxes = np.array(
        [a["bbox"] for a in record["annotations"]], np.float32
    ).reshape(-1, 4)
    classes = np.array(
        [a["category_id"] for a in record["annotations"]], np.int32
    )
    # xywh -> xyxy, scaled into the resized frame
    boxes = np.concatenate([boxes[:, :2], boxes[:, :2] + boxes[:, 2:]], axis=1)
    boxes *= np.array([nw / w0, nh / h0, nw / w0, nh / h0], np.float32)

    if lc.flip and rng.rand() < 0.5:
        img = img[:, ::-1, :]
        x1 = nw - boxes[:, 2]
        x2 = nw - boxes[:, 0]
        boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=1)

    canvas_img = np.zeros((*canvas, 3), img.dtype)
    canvas_img[:nh, :nw] = img

    g = lc.max_gt_boxes
    n = min(len(boxes), g)
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_classes = np.zeros((g,), np.int32)
    gt_valid = np.zeros((g,), bool)
    gt_boxes[:n] = boxes[:n]
    gt_classes[:n] = classes[:n]
    gt_valid[:n] = True

    return {
        "image": canvas_img,
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_valid": gt_valid,
        "image_id": record["image_id"],
        "input_size": np.array([nh, nw], np.float32),
        "output_size": np.array([h0, w0], np.float32),
    }


def _collate(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {
        "images": np.stack([it["image"] for it in items]),
        "gt_boxes": np.stack([it["gt_boxes"] for it in items]),
        "gt_classes": np.stack([it["gt_classes"] for it in items]),
        "gt_valid": np.stack([it["gt_valid"] for it in items]),
        "image_ids": np.array([it["image_id"] for it in items]),
        "input_sizes": np.stack([it["input_size"] for it in items]),
        "output_sizes": np.stack([it["output_size"] for it in items]),
    }


class _Prefetcher:
    """Single background thread producing ready batches."""

    def __init__(self, gen_fn, depth: int = 2):
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(
            target=self._worker, args=(gen_fn,), daemon=True
        )
        self._thread.start()

    def _worker(self, gen_fn):
        try:
            for item in gen_fn():
                self._queue.put(item)
        finally:
            self._queue.put(None)

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is None:
                return
            yield item


def _process_worker_init():
    # One OpenCV thread per worker process: the pool IS the parallelism,
    # and cv2's internal threading oversubscribes the host cores.
    cv2.setNumThreads(0)


def _prepare_star(args):
    """Top-level (picklable) adapter for pool.map."""
    record, lc, canvas, seed = args
    return _prepare_record(record, lc, canvas, np.random.RandomState(seed))


class _WorkerPool:
    """Ordered map() over decode work items.

    Replaces the reference's 32 torch dataloader worker PROCESSES
    (apply_net.py:33-34). Two backends:

      'thread'  — cv2 releases the GIL during imread/resize, so a few
                  threads overlap IO+decode with device compute. The
                  numpy pad/collate work stays GIL-serialized, capping a
                  single host process at ~43 img/s of 720p decode
                  (DESIGN.md §5).
      'process' — true multi-core decode via a spawn-context
                  multiprocessing pool (spawn, not fork: the parent may
                  hold a live TPU runtime whose threads must not be
                  forked). Work items cross the boundary as small
                  (record, cfg, canvas, seed) tuples; prepared canvases
                  come back as ~2.9 MB uint8 pickles — cheap next to the
                  decode itself.
    """

    def __init__(self, num_workers: int, backend: str = "thread"):
        self.backend = backend
        if backend == "process":
            import multiprocessing as mp

            self._pool = mp.get_context("spawn").Pool(
                max(num_workers, 1), initializer=_process_worker_init
            )
        elif backend == "thread":
            import concurrent.futures

            self._pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=max(num_workers, 1)
            )
        else:
            raise ValueError(
                f"DATALOADER.WORKER_BACKEND must be 'thread' or 'process', "
                f"got {backend!r}"
            )

    def map(self, fn, items):
        if self.backend == "process":
            return self._pool.map(fn, items, chunksize=1)
        return list(self._pool.map(fn, items))

    def close(self):
        """Release worker processes/threads. Spawn-pool workers are NOT
        reliably reclaimed by GC (the pool's handler thread keeps it
        alive), so long-lived hosts building many loaders should close
        retired ones explicitly.

        Safe to call while a prefetch thread is mid-map: `Pool.close()`
        lets the in-flight map() drain before the workers exit (a
        `terminate()` here would kill them mid-task and raise in the
        prefetch thread). The blocked prefetch thread is a daemon and is
        abandoned; the loader must not be iterated after close()."""
        if self.backend == "process":
            self._pool.close()
            self._pool.join()
        else:
            self._pool.shutdown(wait=False)


class TrainLoader:
    """Infinite shuffled loader with static canvas and padded ground truth
    (reference: build_detection_train_loader, train_net.py:48-59)."""

    def __init__(
        self,
        dataset: DatasetInfo,
        batch_size: int,
        min_size,
        max_size: int,
        divisibility: int = 32,
        max_gt_boxes: int = 100,
        seed: int = 0,
        canvas: Optional[Tuple[int, int]] = None,
        prefetch: int = 2,
        num_workers: int = 4,
        flip: bool = True,
        worker_backend: str = "thread",
    ):
        self.records = [r for r in dataset.load() if r["annotations"]]
        assert self.records, f"Dataset {dataset.name} has no annotated images"
        self.batch_size = batch_size
        self._pool = _WorkerPool(num_workers, worker_backend)
        # `min_size` may be an int or the full MIN_SIZE_TRAIN tuple;
        # detectron2 samples one choice per image ("choice" style). The
        # static canvas covers the largest choice.
        choices = (
            tuple(min_size) if isinstance(min_size, (tuple, list))
            else (int(min_size),)
        )
        self.lc = LoaderConfig(
            min_size=max(choices), max_size=max_size, divisibility=divisibility,
            max_gt_boxes=max_gt_boxes, flip=flip, min_size_choices=choices,
        )
        self.canvas = canvas or static_canvas(
            [(r["height"], r["width"]) for r in self.records],
            max(choices), max_size, divisibility,
        )
        self.seed = seed
        self.prefetch = prefetch

    def close(self):
        """Release the decode worker pool (see _WorkerPool.close)."""
        self._pool.close()

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self.iter_from(0)

    def iter_from(self, start_iter: int) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate the infinite stream starting at batch `start_iter`.

        Resume fast-forwards deterministically by REPLAYING the RNG draws
        (one permutation per epoch + one flip/scale vector per batch) for
        the skipped batches without decoding any image, so a run resumed
        from a checkpoint at step k consumes bit-identical batches to an
        uninterrupted run — a reproducibility property detectron2's
        restarted dataloader does not have (its resumed sampler replays
        the seed but the reference never fast-forwards augmentations)."""
        def gen():
            rng = np.random.RandomState(self.seed)
            skip = int(start_iter)
            while True:
                order = rng.permutation(len(self.records))
                for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
                    flips = rng.rand(self.batch_size)
                    if skip > 0:
                        skip -= 1
                        continue
                    items = self._pool.map(
                        _prepare_star,
                        [
                            (
                                self.records[i], self.lc, self.canvas,
                                int(f * 2 ** 31) & 0x7FFFFFFF,
                            )
                            for i, f in zip(
                                order[start : start + self.batch_size], flips
                            )
                        ],
                    )
                    yield _collate(items)

        return iter(_Prefetcher(gen, self.prefetch))


class DevicePrefetcher:
    """Double-buffered host→device transfer over a batch iterator.

    A background thread `jax.device_put`s the next batch's device-bound
    arrays while the consumer computes on the current one, so the
    host→device copy (synchronous and ~0.25 s/batch of 45 MB uint8
    canvases through this sandbox's remote tunnel; PCIe DMA on a real TPU
    VM) rides under device compute instead of serializing with it. The
    transfer wait is IO (releases the GIL), so the overlap is real even
    on a single host core. Host-only batch entries (image ids, validity
    masks) pass through untouched for the result-drain side.

    The reference's analog is torch DataLoader `pin_memory` + async
    `.cuda(non_blocking=True)` (apply_net.py:33-35 keeps everything
    synchronous instead).

    Args:
        batches: iterable of dict batches (TrainLoader/TestLoader).
        keys: batch entries to move to device.
        sharding: optional jax sharding for the device arrays (pass the
            mesh data sharding for sharded inference; None = default
            device).
        depth: queue depth — 2 keeps exactly one batch in flight.
    """

    def __init__(
        self,
        batches,
        keys=("images", "input_sizes", "output_sizes"),
        sharding=None,
        depth: int = 2,
    ):
        import jax

        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._error = None
        self._stop = threading.Event()
        self._done = False

        def _put(item) -> bool:
            """Bounded put that aborts when close() raises the stop flag
            (an abandoned consumer never drains the queue)."""
            while not self._stop.is_set():
                try:
                    self._queue.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in batches:
                    if self._stop.is_set():
                        return
                    out = dict(batch)
                    for k in keys:
                        if k in out:
                            out[k] = jax.device_put(out[k], sharding)
                    if not _put(out):
                        return
            except BaseException as exc:  # propagate to the consumer
                self._error = exc
            finally:
                _put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        if self._done:
            # Single-pass iterable (like the generator it wraps): a second
            # iteration yields nothing instead of blocking on a queue no
            # worker will ever fill again.
            return
        while True:
            item = self._queue.get()
            if item is None:
                self._done = True
                if self._error is not None:
                    raise self._error
                return
            yield item

    def close(self):
        """Stop the worker and release its in-flight device batches.

        Must be called from the (single) consumer thread when iteration
        is abandoned before exhaustion — e.g. the inference loop raised —
        otherwise the worker thread stays parked in `put` holding up to
        `depth` device-resident batches and the wrapped loader's worker
        pool for the process lifetime. Idempotent; safe after
        exhaustion."""
        self._stop.set()
        self._done = True
        while self._thread.is_alive():
            try:  # unblock a worker parked on a full queue
                self._queue.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=0.1)
        try:  # drop buffered batches so their device memory frees now
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass


class TestLoader:
    """Sequential loader; the final batch is padded by repeating the last
    image, flagged via `batch_valid` (reference: build_detection_test_loader
    + apply_net.py batch=1 — here batched and device-resident).

    Multi-host evaluation (reference: COCOEvaluator's rank gather via
    detectron2.utils.comm, train_net.py:73-75 / SURVEY.md §2.4): pass
    `process_index`/`process_count` to give each process a strided shard
    of the test set; per-process JSON results are gathered afterwards
    (parallel/mesh.py::gather_process_results). The static canvas is
    computed from the FULL dataset so every process compiles identical
    shapes."""

    __test__ = False  # "Test" = test-set loader, not a pytest class

    def __init__(
        self,
        dataset: DatasetInfo,
        batch_size: int,
        min_size: int,
        max_size: int,
        divisibility: int = 32,
        canvas: Optional[Tuple[int, int]] = None,
        prefetch: int = 2,
        num_workers: int = 4,
        process_index: int = 0,
        process_count: int = 1,
        worker_backend: str = "thread",
    ):
        self.records = dataset.load()
        if canvas is None:
            canvas = static_canvas(
                [(r["height"], r["width"]) for r in self.records],
                min_size if isinstance(min_size, int) else max(min_size),
                max_size, divisibility,
            )
        if process_count > 1:
            self.records = self.records[process_index::process_count]
        self._pool = _WorkerPool(num_workers, worker_backend)
        self.batch_size = batch_size
        self.lc = LoaderConfig(
            min_size=min_size, max_size=max_size, divisibility=divisibility,
            max_gt_boxes=1, flip=False,
        )
        # canvas was resolved above BEFORE the process stride — recomputing
        # it here from the sharded records would give different shapes per
        # process.
        self.canvas = canvas
        self.prefetch = prefetch

    def __len__(self):
        return -(-len(self.records) // self.batch_size)

    def close(self):
        """Release the decode worker pool (see _WorkerPool.close)."""
        self._pool.close()

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        def gen():
            for start in range(0, len(self.records), self.batch_size):
                chunk = self.records[start : start + self.batch_size]
                valid = np.zeros((self.batch_size,), bool)
                valid[: len(chunk)] = True
                while len(chunk) < self.batch_size:
                    chunk = chunk + [chunk[-1]]
                items = self._pool.map(
                    _prepare_star,
                    [(r, self.lc, self.canvas, 0) for r in chunk],
                )
                batch = _collate(items)
                batch["batch_valid"] = valid
                yield batch

        return iter(_Prefetcher(gen, self.prefetch))
