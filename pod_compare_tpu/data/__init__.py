from pod_compare_tpu.data import metadata
from pod_compare_tpu.data.datasets import (
    DatasetInfo,
    get_dataset,
    list_datasets,
    register_coco_instances,
    setup_all_datasets,
)
from pod_compare_tpu.data.loader import (
    TestLoader,
    TrainLoader,
    resize_shortest_edge,
    static_canvas,
)

__all__ = [
    "metadata",
    "DatasetInfo",
    "get_dataset",
    "list_datasets",
    "register_coco_instances",
    "setup_all_datasets",
    "TestLoader",
    "TrainLoader",
    "resize_shortest_edge",
    "static_canvas",
]
