"""Data-parallel (mesh-sharded) inference must match the single-device
pipeline bit-for-bit on deterministic modes."""

import jax
import jax.numpy as jnp
import numpy as np

from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.inference import build_predictor
from pod_compare_tpu.models import build_model, init_model_params
from pod_compare_tpu.parallel.mesh import create_mesh

IMAGE_SIZE = (32, 32)
BATCH = 4


def make_cfg():
    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 5
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 2
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES = 20
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    return cfg


def test_sharded_matches_single_device():
    cfg = make_cfg()
    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE, seed=0)

    images = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, *IMAGE_SIZE, 3) * 255, jnp.float32
    )
    sizes = np.tile(np.asarray(IMAGE_SIZE, np.float32), (BATCH, 1))
    key = jax.random.PRNGKey(0)

    single = build_predictor(cfg, IMAGE_SIZE, params=params)
    d_single = single(images, sizes, sizes, key)

    mesh = create_mesh(4)
    sharded = build_predictor(cfg, IMAGE_SIZE, params=params, mesh=mesh)
    d_sharded = sharded(images, sizes, sizes, key)

    v1 = np.asarray(d_single.valid)
    v2 = np.asarray(d_sharded.valid)
    np.testing.assert_array_equal(v1, v2)
    assert v1.any()
    # compare valid detections only (padded slots hold unmasked garbage)
    np.testing.assert_allclose(
        np.asarray(d_single.boxes)[v1], np.asarray(d_sharded.boxes)[v2],
        atol=5e-3,  # partitioned compile reassociates float reductions
    )
    np.testing.assert_allclose(
        np.asarray(d_single.scores)[v1], np.asarray(d_sharded.scores)[v2],
        atol=1e-4,
    )
    # outputs are actually sharded over the mesh
    shard_devices = {
        s.device for s in d_sharded.boxes.addressable_shards
    }
    assert len(shard_devices) == 4


def test_sharded_post_nms_merge_matches_single_device():
    """The flattened (image, run) unit axis of the post-NMS MC-dropout
    merge must shard over the data mesh without cross-device traffic:
    units are image-major, so each device's batch shard owns its own
    units. Deterministic comparison via analytic sampling + a fixed key."""
    cfg = make_cfg()
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "mc_dropout_ensembles"
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES_DROPOUT.BOX_MERGE_MODE = "post_nms"
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 3
    cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.9

    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE, seed=0)
    images = jnp.asarray(
        np.random.RandomState(1).rand(BATCH, *IMAGE_SIZE, 3) * 255, jnp.float32
    )
    sizes = np.tile(np.asarray(IMAGE_SIZE, np.float32), (BATCH, 1))
    key = jax.random.PRNGKey(7)

    single = build_predictor(cfg, IMAGE_SIZE, params=params)
    d_single = single(images, sizes, sizes, key)

    mesh = create_mesh(4)
    sharded = build_predictor(cfg, IMAGE_SIZE, params=params, mesh=mesh)
    d_sharded = sharded(images, sizes, sizes, key)

    v1, v2 = np.asarray(d_single.valid), np.asarray(d_sharded.valid)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(
        np.asarray(d_single.boxes)[v1], np.asarray(d_sharded.boxes)[v2],
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(d_single.scores)[v1], np.asarray(d_sharded.scores)[v2],
        atol=1e-4,
    )


def test_ensemble_member_axis_sharding():
    """Ensembles over a ('member', 'data') mesh: member params sharded on
    their own axis; results match the single-device ensemble pipeline."""
    from pod_compare_tpu.parallel.mesh import create_ensemble_mesh

    cfg = make_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "ensembles"
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.BOX_MERGE_MODE = "pre_nms"
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.RANDOM_SEED_NUMS = [0, 1000]

    model = build_model(cfg)
    params_list = [
        init_model_params(model, IMAGE_SIZE, seed=s) for s in [0, 1]
    ]
    images = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, *IMAGE_SIZE, 3) * 255, jnp.float32
    )
    sizes = np.tile(np.asarray(IMAGE_SIZE, np.float32), (BATCH, 1))
    key = jax.random.PRNGKey(0)

    single = build_predictor(cfg, IMAGE_SIZE, params_list=params_list)
    d_single = single(images, sizes, sizes, key)

    mesh = create_ensemble_mesh(num_members=2, data_devices=2)
    assert mesh.shape == {"member": 2, "data": 2}
    sharded = build_predictor(
        cfg, IMAGE_SIZE, params_list=params_list, mesh=mesh
    )
    d_sharded = sharded(images, sizes, sizes, key)

    v1, v2 = np.asarray(d_single.valid), np.asarray(d_sharded.valid)
    np.testing.assert_array_equal(v1, v2)
    assert v1.any()
    np.testing.assert_allclose(
        np.asarray(d_single.boxes)[v1], np.asarray(d_sharded.boxes)[v2],
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(d_single.scores)[v1], np.asarray(d_sharded.scores)[v2],
        atol=1e-4,
    )
