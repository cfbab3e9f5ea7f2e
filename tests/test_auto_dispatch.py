"""Round-3 auto knobs: DROPOUT_IMPL='auto' resolution, the compile-only
max-batch picker, and apply_net's batch_size='auto' end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.models import build_model, init_model_params


def _head_cfg(impl):
    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.3
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_IMPL = impl
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    return cfg


def test_auto_impl_is_bernoulli_off_tpu():
    """On CPU 'auto' must resolve to the threefry path: same rngs ->
    bitwise-identical outputs to DROPOUT_IMPL='bernoulli'."""
    assert jax.default_backend() == "cpu"
    images = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3) * 255, jnp.float32
    )
    outs = {}
    for impl in ("auto", "bernoulli"):
        cfg = _head_cfg(impl)
        model = build_model(cfg)
        params = init_model_params(model, (32, 32), seed=0)
        outs[impl] = model.apply(
            {"params": params}, images, False,
            rngs={"dropout": jax.random.PRNGKey(5)},
        )
    for k in ("box_cls", "box_delta"):
        np.testing.assert_array_equal(
            np.asarray(outs["auto"][k]), np.asarray(outs["bernoulli"][k])
        )


def test_pick_max_batch_respects_budget():
    from pod_compare_tpu.utils.hbm_guard import pick_max_batch

    @jax.jit
    def f(x):
        # ~4·b MB OUTPUT at batch b (outputs count toward the compiled
        # peak; temps may fuse away entirely on CPU).
        return jnp.broadcast_to(x[:, None], (x.shape[0], 1_000_000)) * 2.0

    def make_args(b):
        return (jax.ShapeDtypeStruct((b,), jnp.float32),)

    chosen, compiled, info = pick_max_batch(
        f, make_args, (1024, 2), budget_bytes=100e6, log=lambda m: None
    )
    if "peak_hbm_gb" not in info.get(1024, {}):
        pytest.skip("memory_analysis unavailable on this backend")
    # 1024 × 4 MB blows the 100 MB budget; 2 fits.
    assert chosen == 2
    assert info[1024].get("skipped_oom_guard")
    assert compiled is not None


def test_apply_net_auto_batch(tmp_path):
    from pod_compare_tpu.cli.apply_net import run_inference
    from pod_compare_tpu.data.synthetic import register_synthetic

    name = register_synthetic(
        str(tmp_path), "synth_autob", num_images=5, image_size=(64, 80)
    )
    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 5
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    model = build_model(cfg)

    # Canvas for this synthetic set resolves to 64x96 (80 padded to /32).
    params = init_model_params(model, (64, 96), seed=0)
    summary = run_inference(
        cfg, name, "auto_nms", batch_size="auto", params=params,
        run_metrics=False, run_map=False, verbose=False,
    )
    assert summary["num_images"] == 5
