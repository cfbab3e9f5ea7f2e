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


def _prepare_record(
    record: dict, lc: LoaderConfig, canvas: Tuple[int, int], rng: np.random.RandomState
) -> Dict[str, np.ndarray]:
    img = load_image_bgr(record["file_name"])
    if lc.image_format == "RGB":
        img = img[:, :, ::-1]
    h0, w0 = img.shape[:2]
    nh, nw = resize_shortest_edge(h0, w0, lc.min_size, lc.max_size)
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


class _ThreadPool:
    """Tiny ordered map() thread pool for image decode/resize.

    Replaces the reference's 32 torch dataloader workers
    (apply_net.py:33-34): cv2 releases the GIL during imread/resize, so
    a few threads overlap IO+decode with device compute.
    """

    def __init__(self, num_workers: int):
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=max(num_workers, 1)
        )

    def map(self, fn, items):
        return list(self._pool.map(fn, items))


class TrainLoader:
    """Infinite shuffled loader with static canvas and padded ground truth
    (reference: build_detection_train_loader, train_net.py:48-59)."""

    def __init__(
        self,
        dataset: DatasetInfo,
        batch_size: int,
        min_size: int,
        max_size: int,
        divisibility: int = 32,
        max_gt_boxes: int = 100,
        seed: int = 0,
        canvas: Optional[Tuple[int, int]] = None,
        prefetch: int = 2,
        num_workers: int = 4,
        flip: bool = True,
    ):
        self.records = [r for r in dataset.load() if r["annotations"]]
        assert self.records, f"Dataset {dataset.name} has no annotated images"
        self.batch_size = batch_size
        self._pool = _ThreadPool(num_workers)
        self.lc = LoaderConfig(
            min_size=min_size, max_size=max_size, divisibility=divisibility,
            max_gt_boxes=max_gt_boxes, flip=flip,
        )
        self.canvas = canvas or static_canvas(
            [(r["height"], r["width"]) for r in self.records],
            min_size, max_size, divisibility,
        )
        self.seed = seed
        self.prefetch = prefetch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        def gen():
            rng = np.random.RandomState(self.seed)
            while True:
                order = rng.permutation(len(self.records))
                for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
                    flips = rng.rand(self.batch_size)
                    items = self._pool.map(
                        lambda args: _prepare_record(
                            self.records[args[0]], self.lc, self.canvas,
                            np.random.RandomState(
                                int(args[1] * 2 ** 31) & 0x7FFFFFFF
                            ),
                        ),
                        list(zip(order[start : start + self.batch_size], flips)),
                    )
                    yield _collate(items)

        return iter(_Prefetcher(gen, self.prefetch))


class TestLoader:
    """Sequential loader; the final batch is padded by repeating the last
    image, flagged via `batch_valid` (reference: build_detection_test_loader
    + apply_net.py batch=1 — here batched and device-resident)."""

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
    ):
        self.records = dataset.load()
        self._pool = _ThreadPool(num_workers)
        self.batch_size = batch_size
        self.lc = LoaderConfig(
            min_size=min_size, max_size=max_size, divisibility=divisibility,
            max_gt_boxes=1, flip=False,
        )
        self.canvas = canvas or static_canvas(
            [(r["height"], r["width"]) for r in self.records],
            min_size, max_size, divisibility,
        )
        self.prefetch = prefetch

    def __len__(self):
        return -(-len(self.records) // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        def gen():
            rng = np.random.RandomState(0)
            for start in range(0, len(self.records), self.batch_size):
                chunk = self.records[start : start + self.batch_size]
                valid = np.zeros((self.batch_size,), bool)
                valid[: len(chunk)] = True
                while len(chunk) < self.batch_size:
                    chunk = chunk + [chunk[-1]]
                items = self._pool.map(
                    lambda r: _prepare_record(r, self.lc, self.canvas, rng),
                    chunk,
                )
                batch = _collate(items)
                batch["batch_valid"] = valid
                yield batch

        return iter(_Prefetcher(gen, self.prefetch))
