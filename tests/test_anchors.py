"""Anchor-generation tests (detectron2 DefaultAnchorGenerator semantics)."""

import numpy as np

from pod_compare_tpu.config.defaults import anchor_sizes, get_cfg
from pod_compare_tpu.ops.anchors import (
    AnchorGenerator,
    generate_cell_anchors,
    grid_anchors,
)

STRIDES = [8, 16, 32, 64, 128]


def test_cell_anchor_values():
    cells = generate_cell_anchors([32.0], [0.5, 1.0, 2.0])
    # aspect 1.0 at size 32 -> square of side 32 centered at origin
    np.testing.assert_allclose(cells[1], [-16, -16, 16, 16], atol=1e-4)
    # aspect 0.5: w = sqrt(32^2/0.5), h = 0.5*w (area preserved)
    w = np.sqrt(32.0 ** 2 / 0.5)
    np.testing.assert_allclose(cells[0], [-w / 2, -w / 4, w / 2, w / 4], atol=1e-3)
    # areas all equal to size^2
    areas = (cells[:, 2] - cells[:, 0]) * (cells[:, 3] - cells[:, 1])
    np.testing.assert_allclose(areas, 32.0 ** 2, rtol=1e-5)


def test_anchor_sizes_octave_formula():
    """Sizes replicate [[x, x·2^(1/3), x·2^(2/3)] for x in 32..512]
    (reference: src/configs/Base-RetinaNet.yaml:8)."""
    sizes = anchor_sizes()
    assert len(sizes) == 5
    for lvl, x in enumerate([32, 64, 128, 256, 512]):
        np.testing.assert_allclose(
            sizes[lvl], [x, x * 2 ** (1 / 3), x * 2 ** (2 / 3)], rtol=1e-9
        )


def test_grid_anchor_layout():
    cells = generate_cell_anchors([32.0], [1.0])
    out = grid_anchors((2, 3), 8, cells, offset=0.0)
    assert out.shape == (6, 4)
    # y-major ordering: second row of grid starts at index 3
    np.testing.assert_allclose(out[0], [-16, -16, 16, 16], atol=1e-4)
    np.testing.assert_allclose(out[1], [8 - 16, -16, 8 + 16, 16], atol=1e-4)
    np.testing.assert_allclose(out[3], [-16, 8 - 16, 16, 8 + 16], atol=1e-4)


def test_generator_counts_and_order():
    cfg = get_cfg()
    gen = AnchorGenerator.from_config(cfg, STRIDES)
    assert gen.num_cell_anchors == 9
    image_size = (64, 96)
    per_level = gen.per_level(image_size)
    grid = gen.grid_sizes(image_size)
    assert grid == [(8, 12), (4, 6), (2, 3), (1, 2), (1, 1)]
    for lvl, a in enumerate(per_level):
        assert a.shape == (grid[lvl][0] * grid[lvl][1] * 9, 4)
    concat = gen.concatenated(image_size)
    assert concat.shape[0] == sum(a.shape[0] for a in per_level)
    # within-cell ordering is A-fastest: first 9 anchors share the p3 center
    centers = (concat[:9, :2] + concat[:9, 2:]) / 2
    np.testing.assert_allclose(centers, np.zeros((9, 2)), atol=1e-3)


def test_anchor_cache_reuse():
    cfg = get_cfg()
    gen = AnchorGenerator.from_config(cfg, STRIDES)
    a1 = gen.concatenated((32, 32))
    a2 = gen.concatenated((32, 32))
    np.testing.assert_array_equal(a1, a2)
