"""Input-pipeline tests: resize geometry, static canvas, batch padding,
gt handling (reference: detectron2 ResizeShortestEdge/ImageList semantics)."""

import numpy as np
import pytest

from pod_compare_tpu.data.loader import (
    TestLoader,
    TrainLoader,
    resize_shortest_edge,
    static_canvas,
)
from pod_compare_tpu.data.synthetic import register_synthetic
from pod_compare_tpu.data.datasets import get_dataset


def test_resize_shortest_edge_geometry():
    # BDD: 720x1280 at min 720 stays exact
    assert resize_shortest_edge(720, 1280, 720, 1333) == (720, 1280)
    # test-time 800 cap at 1333: 720x1280 -> scale to max_size
    h, w = resize_shortest_edge(720, 1280, 800, 1333)
    assert w == 1333 and abs(h - 750) <= 1
    # KITTI: 375x1242 at 800/1333 -> capped by width
    h, w = resize_shortest_edge(375, 1242, 800, 1333)
    assert w == 1333 and h == int(375 * (1333 / 1242) + 0.5)


def test_static_canvas_covers_and_aligns():
    canvas = static_canvas([(720, 1280)], 720, 1333, 32)
    assert canvas == (736, 1280)
    canvas = static_canvas([(375, 1242), (370, 1224)], 800, 1333, 32)
    assert canvas[0] % 32 == 0 and canvas[1] % 32 == 0
    for h, w in [(375, 1242), (370, 1224)]:
        rh, rw = resize_shortest_edge(h, w, 800, 1333)
        assert rh <= canvas[0] and rw <= canvas[1]


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("loaderds"))
    name = register_synthetic(root, "loader_ds", num_images=5, image_size=(48, 64))
    return get_dataset(name)


def test_test_loader_pads_last_batch(synth):
    loader = TestLoader(synth, batch_size=2, min_size=48, max_size=1333)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["batch_valid"].tolist() == [True, False]
    for b in batches:
        assert b["images"].shape[0] == 2
        assert b["images"].shape[1] % 32 == 0 and b["images"].shape[2] % 32 == 0
    ids = [
        int(i)
        for b in batches
        for i, v in zip(b["image_ids"], b["batch_valid"])
        if v
    ]
    assert sorted(ids) == [0, 1, 2, 3, 4]


def test_train_loader_batches(synth):
    loader = TrainLoader(
        synth, batch_size=2, min_size=48, max_size=1333, seed=1
    )
    it = iter(loader)
    batch = next(it)
    assert batch["images"].shape == (2, *loader.canvas, 3)
    assert batch["gt_boxes"].shape == (2, 100, 4)
    assert batch["gt_valid"].any()
    # boxes lie inside the resized frame
    v = batch["gt_valid"]
    boxes = batch["gt_boxes"][v]
    assert (boxes[:, 2] > boxes[:, 0]).all()
    assert (boxes[:, 0] >= 0).all()
    assert (boxes[:, 2] <= loader.canvas[1] + 1e-3).all()


def test_train_loader_multiscale_choice(synth):
    """MIN_SIZE_TRAIN tuples sample a per-image scale (detectron2
    ResizeShortestEdge "choice"); the static canvas covers the largest."""
    loader = TrainLoader(
        synth, batch_size=4, min_size=(24, 48), max_size=1333, seed=3,
    )
    assert loader.canvas == static_canvas([(48, 64)], 48, 1333, 32)
    it = iter(loader)
    seen_heights = set()
    for _ in range(8):
        batch = next(it)
        # Content height of each canvas image = rows with any nonzero pixel
        # (synthetic images have nonzero content rows).
        for img in batch["images"]:
            rows = np.nonzero(img.sum(axis=(1, 2)))[0]
            seen_heights.add(int(rows.max()) + 1)
    # Both scales must appear across images (24 -> 24 rows, 48 -> 48 rows).
    assert any(h <= 30 for h in seen_heights), seen_heights
    assert any(h >= 40 for h in seen_heights), seen_heights


def test_process_backend_matches_thread_backend(synth):
    """DATALOADER.WORKER_BACKEND='process' (true multi-core decode, the
    analog of the reference's 32 dataloader worker processes,
    apply_net.py:33-34) must produce byte-identical batches to the thread
    backend."""
    kw = dict(batch_size=2, min_size=48, max_size=1333)
    a = next(iter(TestLoader(synth, **kw, worker_backend="thread")))
    b = next(iter(TestLoader(synth, **kw, worker_backend="process", num_workers=2)))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_train_loader_deterministic_seed(synth):
    a = next(iter(TrainLoader(synth, 2, 48, 1333, seed=7)))
    b = next(iter(TrainLoader(synth, 2, 48, 1333, seed=7)))
    np.testing.assert_array_equal(a["image_ids"], b["image_ids"])
    np.testing.assert_allclose(a["images"], b["images"])


def test_device_prefetcher_order_content_and_errors(synth):
    """DevicePrefetcher must preserve batch order, move only the device
    keys, pass host-side keys through untouched, and re-raise a producer
    exception at the consumer."""
    import jax

    from pod_compare_tpu.data.loader import DevicePrefetcher

    loader = TestLoader(synth, batch_size=2, min_size=48, max_size=1333)
    direct = list(iter(loader))
    fetched = list(DevicePrefetcher(iter(loader)))
    assert len(fetched) == len(direct)
    for a, b in zip(direct, fetched):
        assert isinstance(b["images"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["images"]), a["images"])
        np.testing.assert_array_equal(b["input_sizes"], a["input_sizes"])
        # host-only entries pass through as-is
        np.testing.assert_array_equal(b["image_ids"], a["image_ids"])
        assert isinstance(b["image_ids"], np.ndarray)
    loader.close()

    def boom():
        yield direct[0]
        raise RuntimeError("decode exploded")

    it = iter(DevicePrefetcher(boom()))
    next(it)
    with pytest.raises(RuntimeError, match="decode exploded"):
        next(it)


def test_device_prefetcher_close_and_reiterate(synth):
    """close() mid-iteration unparks the worker thread (it would
    otherwise hold device batches + the loader's worker pool forever);
    a second iteration of an exhausted prefetcher yields nothing
    instead of blocking on a queue no worker will refill."""
    import time

    from pod_compare_tpu.data.loader import DevicePrefetcher

    loader = TestLoader(synth, batch_size=1, min_size=48, max_size=1333)
    pf = DevicePrefetcher(iter(loader), depth=1)
    it = iter(pf)
    next(it)  # abandon after one batch, worker parked on the full queue
    pf.close()
    deadline = time.time() + 10
    while pf._thread.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not pf._thread.is_alive()
    assert pf._queue.empty()
    pf.close()  # idempotent
    assert list(pf) == []  # closed/exhausted: yields nothing, no hang
    loader.close()

    # exhausted (not closed) prefetcher: re-iteration terminates
    loader2 = TestLoader(synth, batch_size=2, min_size=48, max_size=1333)
    pf2 = DevicePrefetcher(iter(loader2))
    n = len(list(pf2))
    assert n > 0
    assert list(pf2) == []
    loader2.close()
