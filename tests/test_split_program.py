"""SPLIT_HEAD_PROGRAM: the two-program pipeline layout must be
bit-identical to the fused pipeline (same ops, same keys, same order —
only the XLA compilation unit changes). This layout is the validated
workaround for the v5e mc_iid fused-program runtime fault (DESIGN.md
§5d; reference semantics being served: probabilistic_inference.py:
289-374)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pod_compare_tpu import configs_dir
from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.inference import build_predictor
from pod_compare_tpu.models import build_model, init_model_params

IMAGE_SIZE = (32, 32)
BATCH = 2

OVERRIDES = {
    "MODEL.RETINANET.NUM_CLASSES": 7,
    "MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE": 0.2,
    "MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME": "loss_attenuation",
    "MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES": 3,
    "MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME": "negative_log_likelihood",
    "MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES": 20,
    "PARALLEL.COMPUTE_DTYPE": "float32",
    "MODEL.RETINANET.TOPK_CANDIDATES_TEST": 64,
    "TEST.DETECTIONS_PER_IMAGE": 20,
    "PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS": 2,
    "PROBABILISTIC_INFERENCE.ENSEMBLES.RANDOM_SEED_NUMS": [0, 1000],
}


def make_cfg(inference_config, split, **extra):
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(configs_dir(), "Inference", inference_config)
    )
    opts = []
    for k, v in {**OVERRIDES, **extra}.items():
        opts += [k, repr(v)]
    cfg.merge_from_list(opts)
    if cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS > 2:
        cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 2
    cfg.PROBABILISTIC_INFERENCE.SPLIT_HEAD_PROGRAM = split
    return cfg


def _inputs():
    images = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, *IMAGE_SIZE, 3) * 255,
        jnp.float32,
    )
    input_sizes = np.tile(np.asarray(IMAGE_SIZE, np.float32), (BATCH, 1))
    output_sizes = np.asarray([[64, 64], [128, 96]], np.float32)
    return images, input_sizes, output_sizes


def _run(cfg, params=None, params_list=None, mesh=None):
    pred = build_predictor(
        cfg, IMAGE_SIZE, params=params, params_list=params_list, mesh=mesh
    )
    images, input_sizes, output_sizes = _inputs()
    return pred, pred(images, input_sizes, output_sizes, jax.random.PRNGKey(3))


def _assert_bitwise_equal(a, b):
    for field in a._fields:
        fa, fb = getattr(a, field), getattr(b, field)
        if fa is None:
            assert fb is None
            continue
        np.testing.assert_array_equal(
            np.asarray(fa), np.asarray(fb), err_msg=field
        )


@pytest.mark.parametrize(
    "inference_config,extra",
    [
        ("bayes_od_mc_dropout.yaml", {}),
        # the faulting family: reference-exact iid sampling
        ("bayes_od_mc_dropout.yaml",
         {"PROBABILISTIC_INFERENCE.CLS_SAMPLING": "mc_iid",
          "PROBABILISTIC_INFERENCE.BOX_SAMPLING": "mc_iid"}),
        ("mc_dropout_ensembles_pre_nms.yaml", {}),
    ],
)
def test_split_bitwise_matches_fused(inference_config, extra):
    cfg_f = make_cfg(inference_config, split=False, **extra)
    model = build_model(cfg_f)
    params = init_model_params(model, IMAGE_SIZE, seed=0)
    _, dets_fused = _run(cfg_f, params=params)
    cfg_s = make_cfg(inference_config, split=True, **extra)
    pred, dets_split = _run(cfg_s, params=params)
    assert pred._head_fn is not None and pred._tail_fn is not None
    _assert_bitwise_equal(dets_fused, dets_split)


def test_split_ensembles_bitwise_matches_fused():
    cfg_f = make_cfg("ensembles_pre_nms.yaml", split=False)
    params_list = [
        init_model_params(build_model(cfg_f), IMAGE_SIZE, seed=s)
        for s in [0, 1]
    ]
    _, dets_fused = _run(cfg_f, params_list=params_list)
    cfg_s = make_cfg("ensembles_pre_nms.yaml", split=True)
    _, dets_split = _run(cfg_s, params_list=params_list)
    _assert_bitwise_equal(dets_fused, dets_split)


@pytest.mark.parametrize(
    "inference_config",
    ["standard_nms.yaml", "mc_dropout_ensembles_post_nms.yaml"],
)
def test_split_rejected_outside_faulting_family(inference_config):
    cfg = make_cfg(inference_config, split=True)
    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE, seed=0)
    with pytest.raises(ValueError, match="SPLIT_HEAD_PROGRAM"):
        build_predictor(cfg, IMAGE_SIZE, params=params)


def test_split_sharded_matches_unsharded():
    """Split pipeline under a data mesh: sharded == single-device."""
    from pod_compare_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    cfg = make_cfg("bayes_od_mc_dropout.yaml", split=True)
    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE, seed=0)
    _, dets_single = _run(cfg, params=params)
    mesh = create_mesh(2)
    _, dets_mesh = _run(cfg, params=params, mesh=mesh)
    v1 = np.asarray(dets_single.valid)
    v2 = np.asarray(dets_mesh.valid)
    np.testing.assert_array_equal(v1, v2)
    assert v1.any()
    # compare valid detections only (padded slots hold unmasked garbage);
    # partitioned compiles reassociate float reductions, and the MC
    # dropout + Bayesian-fusion chain amplifies those ULPs more than the
    # deterministic modes (test_sharded_inference.py uses 5e-3) — 0.05 px
    # on a 64 px canvas is still far below any detection-level change.
    np.testing.assert_allclose(
        np.asarray(dets_single.boxes)[v1], np.asarray(dets_mesh.boxes)[v2],
        atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(dets_single.scores)[v1], np.asarray(dets_mesh.scores)[v2],
        atol=1e-3,
    )


def test_runtime_safe_batch_cap_split_aware():
    from pod_compare_tpu.utils.hbm_guard import (
        MC_IID_PROVEN_SAFE_BATCH,
        MC_IID_SPLIT_PROVEN_SAFE_BATCH,
        runtime_safe_batch_cap,
    )

    cfg = make_cfg(
        "bayes_od_mc_dropout.yaml", split=False,
        **{"PROBABILISTIC_INFERENCE.CLS_SAMPLING": "mc_iid"},
    )
    assert runtime_safe_batch_cap(cfg) == MC_IID_PROVEN_SAFE_BATCH
    cfg.PROBABILISTIC_INFERENCE.SPLIT_HEAD_PROGRAM = True
    assert runtime_safe_batch_cap(cfg) == MC_IID_SPLIT_PROVEN_SAFE_BATCH
    cfg.PROBABILISTIC_INFERENCE.CLS_SAMPLING = "analytic"
    cfg.PROBABILISTIC_INFERENCE.BOX_SAMPLING = "analytic"
    assert runtime_safe_batch_cap(cfg) is None


def test_split_predictor_exports_and_roundtrips(tmp_path):
    """AOT export traces predictor._fn — in split mode a plain Python
    composition of the two jitted programs, which must inline into ONE
    StableHLO artifact whose outputs equal the live split predictor
    bit-for-bit (the artifact re-fuses the seam; that only matters on
    the faulting v5e runtime, not for numerics)."""
    from pod_compare_tpu.inference.export import load_artifact, save_artifact

    cfg = make_cfg("bayes_od_mc_dropout.yaml", split=True)
    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE, seed=0)
    pred = build_predictor(cfg, IMAGE_SIZE, params=params)
    out = save_artifact(
        pred, str(tmp_path / "artifact"), batch_size=BATCH,
        platforms=("cpu",),
    )
    served = load_artifact(out)
    images, input_sizes, output_sizes = _inputs()
    rng = jax.random.PRNGKey(7)
    live = pred(images, input_sizes, output_sizes, rng)
    frozen = served(images, input_sizes, output_sizes, rng)
    _assert_bitwise_equal(live, frozen)


def test_predictor_programs_guard_covers_split():
    """predictor_programs yields head+tail for split pipelines and the
    multi-program auto-batch guard picks a batch that fits."""
    from pod_compare_tpu.utils.hbm_guard import (
        pick_max_batch_programs,
        predictor_programs,
    )

    cfg = make_cfg("bayes_od_mc_dropout.yaml", split=True)
    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE, seed=0)
    pred = build_predictor(cfg, IMAGE_SIZE, params=params)
    progs = predictor_programs(pred, 2, IMAGE_SIZE)
    assert [p[0] for p in progs] == ["head", "tail"]
    chosen, info = pick_max_batch_programs(
        lambda b: predictor_programs(pred, b, IMAGE_SIZE), (2, 1),
        name="split_test",
    )
    assert chosen == 2
    assert "head" in info[2] and "tail" in info[2]
