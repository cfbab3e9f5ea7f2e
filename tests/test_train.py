"""Training-stack tests: LR schedule, decay masking, loss assembly, a real
multi-device train step on synthetic data, checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.train.optim import (
    build_optimizer,
    trainable_mask,
    warmup_multistep_schedule,
)


def test_warmup_multistep_schedule():
    """detectron2 WarmupMultiStepLR values (Base-BDD config: lr 0.0025,
    warmup 1000@0.001, steps (60k, 80k), gamma 0.1)."""
    s = warmup_multistep_schedule(0.0025, (60000, 80000))
    np.testing.assert_allclose(float(s(0)), 0.0025 * 0.001, rtol=1e-5)
    np.testing.assert_allclose(float(s(500)), 0.0025 * 0.5005, rtol=1e-4)
    np.testing.assert_allclose(float(s(1000)), 0.0025, rtol=1e-6)
    np.testing.assert_allclose(float(s(59999)), 0.0025, rtol=1e-6)
    np.testing.assert_allclose(float(s(60000)), 0.00025, rtol=1e-6)
    np.testing.assert_allclose(float(s(80000)), 0.000025, rtol=1e-6)


def test_trainable_mask_structure():
    params = {
        "resnet": {
            "stem_conv1": {"kernel": 0},
            "stem_norm1": {"scale": 0, "bias": 0, "mean": 0, "var": 0},
            "res2_block0": {"conv1": {"kernel": 0}},
            "res3_block0": {
                "conv1": {"kernel": 0},
                "norm1": {"scale": 0, "bias": 0, "mean": 0, "var": 0},
            },
        },
        "fpn": {"lateral_res3": {"kernel": 0, "bias": 0}},
        "head": {"cls_score": {"kernel": 0, "bias": 0}},
    }
    mask = trainable_mask(params, freeze_at=2)
    assert not mask["resnet"]["stem_conv1"]["kernel"]
    assert not mask["resnet"]["res2_block0"]["conv1"]["kernel"]
    assert mask["resnet"]["res3_block0"]["conv1"]["kernel"]
    assert not mask["resnet"]["res3_block0"]["norm1"]["scale"]
    assert not mask["resnet"]["res3_block0"]["norm1"]["mean"]
    assert mask["fpn"]["lateral_res3"]["kernel"]
    assert mask["head"]["cls_score"]["bias"]


def test_weight_decay_skips_frozen():
    """Zero grads + decay must leave frozen params untouched but decay
    trainable ones."""
    cfg = get_cfg()
    params = {
        "resnet": {
            "stem_conv1": {"kernel": jnp.ones((3,))},
            "res3_block0": {"conv1": {"kernel": jnp.ones((3,))}},
        }
    }
    tx, _ = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # frozen: zero update; trainable: pure weight-decay update
    assert float(jnp.abs(updates["resnet"]["stem_conv1"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["resnet"]["res3_block0"]["conv1"]["kernel"]).max()) > 0


def make_loss_inputs(rng, B=2, R=40, K=5, G=4):
    anchors_xy = rng.rand(R, 2).astype(np.float32) * 80
    anchors = np.concatenate([anchors_xy, anchors_xy + 16], 1)
    outputs = {
        "box_cls": jnp.asarray(rng.randn(B, R, K).astype(np.float32)),
        "box_delta": jnp.asarray(rng.randn(B, R, 4).astype(np.float32) * 0.1),
        "box_cls_var": jnp.asarray(rng.randn(B, R, K).astype(np.float32) - 3),
        "box_reg_var": jnp.asarray(rng.randn(B, R, 4).astype(np.float32)),
    }
    gt_boxes = np.stack([anchors[rng.choice(R, G)] for _ in range(B)])
    gt_classes = rng.randint(0, K, (B, G)).astype(np.int32)
    gt_valid = np.ones((B, G), bool)
    return jnp.asarray(anchors), outputs, (
        jnp.asarray(gt_boxes), jnp.asarray(gt_classes), jnp.asarray(gt_valid)
    )


def test_compute_losses_finite_and_annealing(rng):
    from pod_compare_tpu.train.loss import LossConfig, compute_losses

    anchors, outputs, (gtb, gtc, gtv) = make_loss_inputs(rng)
    lc = LossConfig(
        num_classes=5, cls_var_loss="loss_attenuation", cls_var_num_samples=4,
        bbox_cov_loss="negative_log_likelihood", annealing_step=100,
    )
    norm0 = jnp.asarray(100.0)
    losses0, n0 = compute_losses(
        jax.random.PRNGKey(0), outputs, anchors, gtb, gtc, gtv, norm0,
        jnp.asarray(0), lc,
    )
    assert np.isfinite(float(losses0["loss_cls"]))
    assert np.isfinite(float(losses0["loss_box_reg"]))
    assert float(losses0["num_pos_anchors"]) > 0
    # normalizer EMA moved toward the positive count
    assert float(n0) != 100.0

    # At step >= annealing_step the box loss is the pure NLL mixture
    losses1, _ = compute_losses(
        jax.random.PRNGKey(0), outputs, anchors, gtb, gtc, gtv, norm0,
        jnp.asarray(100), lc,
    )
    assert float(losses1["loss_box_reg"]) != float(losses0["loss_box_reg"])


def test_vanilla_losses_match_manual(rng):
    """Without probabilistic heads, loss_cls is the plain masked focal sum
    over the EMA normalizer."""
    from pod_compare_tpu.ops import losses as L
    from pod_compare_tpu.ops.boxes import encode_deltas
    from pod_compare_tpu.ops.matcher import label_anchors_batch
    from pod_compare_tpu.train.loss import LossConfig, compute_losses

    anchors, outputs, (gtb, gtc, gtv) = make_loss_inputs(rng)
    outputs = {**outputs, "box_cls_var": None, "box_reg_var": None}
    lc = LossConfig(num_classes=5)
    losses, new_norm = compute_losses(
        jax.random.PRNGKey(0), outputs, anchors, gtb, gtc, gtv,
        jnp.asarray(100.0), jnp.asarray(0), lc,
    )
    labels = label_anchors_batch(anchors, gtb, gtc, gtv, 5)
    valid = labels.gt_classes >= 0
    pos = valid & (labels.gt_classes != 5)
    targets = jax.nn.one_hot(jnp.clip(labels.gt_classes, 0, 5), 6)[..., :-1]
    norm = jnp.maximum(
        1.0, 0.9 * 100.0 + 0.1 * jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    )
    ref_cls = L.masked_sum_focal_loss(outputs["box_cls"], targets, valid) / norm
    np.testing.assert_allclose(float(losses["loss_cls"]), float(ref_cls), rtol=1e-5)
    gt_deltas = encode_deltas(anchors[None], labels.matched_boxes)
    ref_reg = L.masked_sum_smooth_l1(outputs["box_delta"], gt_deltas, pos) / norm
    np.testing.assert_allclose(
        float(losses["loss_box_reg"]), float(ref_reg), rtol=1e-5
    )


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    from pod_compare_tpu.data.synthetic import register_synthetic
    from pod_compare_tpu.parallel.mesh import create_mesh
    from pod_compare_tpu.train.trainer import Trainer

    root = str(tmp_path_factory.mktemp("synth"))
    name = register_synthetic(root, "synth_train", num_images=8)

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 2
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.1
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    cfg.DATASETS.TRAIN = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.BASE_LR = 1e-5  # random-init backbone: tiny lr for stability
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.STEPS = (1000, 2000)
    cfg.SOLVER.MAX_ITER = 8
    cfg.SOLVER.CHECKPOINT_PERIOD = 8
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.OUTPUT_DIR = str(tmp_path_factory.mktemp("out"))
    cfg.SEED = 0

    mesh = create_mesh(2)
    trainer = Trainer(cfg, mesh=mesh)
    return cfg, trainer


def test_trainer_runs_and_loss_decreases(tiny_trainer):
    cfg, trainer = tiny_trainer
    from pod_compare_tpu.train.trainer import select_train_batch

    def probe(batch):
        # the jitted step donates its input state; probe on a copy
        state_copy = jax.tree_util.tree_map(jnp.copy, trainer.state)
        _, metrics = trainer.train_step(state_copy, batch)
        return float(metrics["total_loss"])

    batch = select_train_batch(next(iter(trainer.loader)))
    loss0 = probe(batch)
    trainer.train(max_iter=8, log_period=4)
    assert int(trainer.state.step) == 8
    # training on 8 images for 8 steps must reduce loss on a seen batch
    assert probe(batch) < loss0


def test_checkpoint_roundtrip_and_resume(tiny_trainer):
    from pod_compare_tpu.train.checkpoint import Checkpointer, load_params

    cfg, trainer = tiny_trainer
    trainer.checkpointer.wait()
    assert trainer.checkpointer.has_checkpoint()

    # params-only load (inference path)
    params = load_params(cfg.OUTPUT_DIR)
    k0 = np.asarray(
        jax.tree_util.tree_leaves(trainer.state.params)[0]
    )
    k1 = np.asarray(jax.tree_util.tree_leaves(params)[0])
    np.testing.assert_allclose(k0, k1)

    # full-state resume
    restored, resumed = (
        trainer.checkpointer.restore(trainer.state._asdict()), True
    )
    assert resumed
    assert int(restored["step"]) == 8


def test_remat_train_step_matches(rng):
    """PARALLEL.REMAT=True must not change the step's numerics."""
    import jax
    import jax.numpy as jnp
    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.models import build_anchor_generator, build_model
    from pod_compare_tpu.train.trainer import create_train_state, make_train_step

    image_size = (32, 32)

    def run(remat):
        cfg = get_cfg()
        cfg.MODEL.RETINANET.NUM_CLASSES = 3
        cfg.PARALLEL.COMPUTE_DTYPE = "float32"
        cfg.PARALLEL.REMAT = remat
        model = build_model(cfg)
        gen = build_anchor_generator(cfg)
        anchors = jnp.asarray(gen.concatenated(image_size))
        state = create_train_state(cfg, model, image_size, seed=0)
        step = make_train_step(cfg, model, anchors)
        batch = {
            "images": jnp.asarray(
                np.random.RandomState(0).rand(2, *image_size, 3) * 255,
                jnp.float32,
            ),
            "gt_boxes": jnp.asarray(
                np.tile(np.array([[4.0, 4.0, 20.0, 20.0]], np.float32), (2, 1, 1))
            ),
            "gt_classes": jnp.zeros((2, 1), jnp.int32),
            "gt_valid": jnp.ones((2, 1), bool),
        }
        new_state, metrics = step(state, batch)
        return float(metrics["total_loss"]), new_state

    loss_plain, s1 = run(False)
    loss_remat, s2 = run(True)
    np.testing.assert_allclose(loss_remat, loss_plain, rtol=1e-5)
    # updated params agree
    l1 = jax.tree_util.tree_leaves(s1.params)[0]
    l2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_model_weights_warm_start(tmp_path, rng):
    """cfg.MODEL.WEIGHTS pointing at a reference-format .pkl warm-starts
    the backbone while leaving head init intact (reference:
    resume_or_load + Base-BDD-RetinaNet.yaml:6)."""
    import pickle

    import jax
    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.data.synthetic import register_synthetic
    from pod_compare_tpu.parallel.mesh import create_mesh
    from pod_compare_tpu.train.trainer import Trainer

    root = str(tmp_path / "ds")
    name = register_synthetic(root, "warm_ds", num_images=4, image_size=(48, 64))

    stem = (rng.randn(64, 3, 7, 7) * 0.05).astype(np.float32)
    pkl = {
        "model": {
            "stem.conv1.weight": stem,
            "stem.conv1.norm.weight": np.ones(64, np.float32),
            "stem.conv1.norm.bias": np.zeros(64, np.float32),
            "stem.conv1.norm.running_mean": np.zeros(64, np.float32),
            "stem.conv1.norm.running_var": np.ones(64, np.float32),
        },
        "__author__": "test",
    }
    weights_path = str(tmp_path / "R-50.pkl")
    with open(weights_path, "wb") as f:
        pickle.dump(pkl, f)

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.WEIGHTS = weights_path
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    cfg.DATASETS.TRAIN = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.INPUT.MIN_SIZE_TRAIN = (48,)
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 0

    trainer = Trainer(cfg, mesh=create_mesh(1))
    trainer.resume_or_load(resume=False)
    got = np.asarray(trainer.state.params["resnet"]["stem_conv1"]["kernel"])
    np.testing.assert_allclose(got, np.transpose(stem, (2, 3, 1, 0)), atol=1e-6)


def test_shared_batch_banks_train_step(tmp_path_factory):
    """DROPOUT_SHARED_BATCH_TRAIN + CLS_VAR_LOSS.SHARED_BATCH_SAMPLES (the
    TPU-native shared-RNG training banks, DESIGN.md §5b) run a sharded
    train step with finite losses and params."""
    import jax

    from pod_compare_tpu.data.synthetic import register_synthetic
    from pod_compare_tpu.parallel.mesh import create_mesh
    from pod_compare_tpu.train.trainer import Trainer, select_train_batch

    root = str(tmp_path_factory.mktemp("synth_shared"))
    name = register_synthetic(root, "synth_shared", num_images=4)

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 2
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.SHARED_BATCH_SAMPLES = True
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.1
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_SHARED_BATCH_TRAIN = True
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    cfg.DATASETS.TRAIN = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.BASE_LR = 1e-5
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.OUTPUT_DIR = str(tmp_path_factory.mktemp("out_shared"))
    cfg.SEED = 0

    trainer = Trainer(cfg, mesh=create_mesh(2))
    batch = select_train_batch(next(iter(trainer.loader)))
    state, metrics = trainer.train_step(trainer.state, batch)
    m = jax.device_get(metrics)
    assert np.isfinite(float(m["total_loss"]))
    assert all(
        np.isfinite(np.asarray(x)).all()
        for x in jax.tree_util.tree_leaves(jax.device_get(state.params))
    )


def test_trainer_eval_shards_per_process(tiny_trainer, monkeypatch):
    """In a multi-controller run Trainer.test() must build its cached
    TestLoader with the process shard — an unsharded loader would make
    every process evaluate the FULL set and run_inference's rank gather
    would then double-count every detection."""
    import jax

    from pod_compare_tpu.data.datasets import get_dataset

    cfg, trainer = tiny_trainer
    name = cfg.DATASETS.TRAIN[0]
    full_count = len(get_dataset(name).load())

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    captured = {}

    def fake_run_inference(cfg, ds, iname, batch_size=8, loader=None,
                           predictor=None, **kw):
        captured["loader"] = loader
        return {"mAP": 0.25, "AP50": 0.5}

    import pod_compare_tpu.cli.apply_net as apply_net

    monkeypatch.setattr(apply_net, "run_inference", fake_run_inference)
    trainer._eval_cache.clear()  # module-scoped fixture may be warm
    summary = trainer.test(test_dataset=name, batch_size=2)
    loader = captured["loader"]
    assert len(loader.records) == full_count // 2, (
        len(loader.records), full_count)
    assert summary["mAP"] == 0.25
    trainer._eval_cache.clear()  # don't leak the sharded cache


def test_resolve_weights_detectron2_scheme(tmp_path, monkeypatch):
    """detectron2:// zoo URLs resolve against the local cache dir and fail
    with an actionable message on a miss (reference consumes
    detectron2://ImageNetPretrained/MSRA/R-50.pkl, Base-BDD-RetinaNet.yaml:6)."""
    from pod_compare_tpu.train.trainer import resolve_weights_path

    # plain paths pass through
    assert resolve_weights_path("/x/y.pth") == "/x/y.pth"

    monkeypatch.setenv("DETECTRON2_CACHE", str(tmp_path))
    url = "detectron2://ImageNetPretrained/MSRA/R-50.pkl"
    with pytest.raises(FileNotFoundError, match="DETECTRON2_CACHE"):
        resolve_weights_path(url)
    target = tmp_path / "ImageNetPretrained" / "MSRA" / "R-50.pkl"
    target.parent.mkdir(parents=True)
    target.write_bytes(b"x")
    assert resolve_weights_path(url) == str(target)


def test_trainer_eval_cache_reused(tiny_trainer):
    """test() must reuse one loader+predictor across calls (no per-eval
    rebuild/re-jit) while evaluating the CURRENT params."""
    cfg, trainer = tiny_trainer
    name = cfg.DATASETS.TRAIN[0]
    s1 = trainer.test(test_dataset=name, batch_size=2)
    entry = trainer._eval_cache[(name, 2)]
    s2 = trainer.test(test_dataset=name, batch_size=2)
    assert trainer._eval_cache[(name, 2)] is entry
    # the cached predictor must see the trainer's current params object
    assert entry[-1].params is trainer.state.params
    assert "mAP" in s1 and "mAP" in s2


def test_trainer_eval_cache_rebuilds_on_changed_batch(tiny_trainer):
    """A different dataset/batch mid-run (eval on a second split) must
    build a second pipeline, not assert (VERDICT r3 weak #7) — and
    alternating BACK must reuse the first one (no rebuild/re-jit churn or
    worker-pool leak from single-slot eviction)."""
    cfg, trainer = tiny_trainer
    name = cfg.DATASETS.TRAIN[0]
    trainer._eval_cache.clear()  # module-scoped fixture may be warm
    s1 = trainer.test(test_dataset=name, batch_size=2)
    entry2 = trainer._eval_cache[(name, 2)]
    s2 = trainer.test(test_dataset=name, batch_size=4)
    assert (name, 4) in trainer._eval_cache
    trainer.test(test_dataset=name, batch_size=2)
    assert trainer._eval_cache[(name, 2)] is entry2
    assert "mAP" in s1 and "mAP" in s2
    trainer._eval_cache.clear()


def test_loader_iter_from_matches_uninterrupted_stream(tmp_path_factory):
    """TrainLoader.iter_from(k) must yield bit-identical batches to
    positions k, k+1, ... of the fresh stream — including the replayed
    flip/scale RNG draws (the fast-forward decodes nothing)."""
    from pod_compare_tpu.data.datasets import get_dataset
    from pod_compare_tpu.data.loader import TrainLoader
    from pod_compare_tpu.data.synthetic import register_synthetic

    root = str(tmp_path_factory.mktemp("synth_ff"))
    name = register_synthetic(root, "synth_ff", num_images=5,
                              image_size=(48, 64))
    def make_loader():
        return TrainLoader(
            get_dataset(name), batch_size=2, min_size=(32, 48),
            max_size=96, seed=3, flip=True, num_workers=2,
        )

    it_full = make_loader().iter_from(0)
    full = [next(it_full) for _ in range(6)]
    it_resumed = make_loader().iter_from(4)
    for k in range(4, 6):
        got = next(it_resumed)
        for key in full[k]:
            np.testing.assert_array_equal(got[key], full[k][key], err_msg=key)


def test_resume_reproduces_uninterrupted_run(tmp_path_factory):
    """Checkpoint at step 2, resume, train to 4: final params must equal an
    uninterrupted 4-step run BITWISE (carried RNG state + orbax restore +
    loader fast-forward — VERDICT r3 #8)."""
    import jax

    from pod_compare_tpu.data.synthetic import register_synthetic
    from pod_compare_tpu.parallel.mesh import create_mesh
    from pod_compare_tpu.train.trainer import Trainer

    root = str(tmp_path_factory.mktemp("synth_resume"))
    name = register_synthetic(root, "synth_resume", num_images=4,
                              image_size=(48, 64))

    def base_cfg(out_dir):
        cfg = get_cfg()
        cfg.MODEL.RETINANET.NUM_CLASSES = 3
        cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
        cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 2
        cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = (
            "negative_log_likelihood"
        )
        cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.1
        cfg.PARALLEL.COMPUTE_DTYPE = "float32"
        cfg.DATASETS.TRAIN = (name,)
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.SOLVER.BASE_LR = 1e-5
        cfg.SOLVER.WARMUP_ITERS = 1
        cfg.SOLVER.STEPS = (100, 200)
        cfg.SOLVER.CHECKPOINT_PERIOD = 2
        cfg.INPUT.MIN_SIZE_TRAIN = (48,)
        cfg.OUTPUT_DIR = out_dir
        cfg.SEED = 0
        return cfg

    cfg_a = base_cfg(str(tmp_path_factory.mktemp("resume_a")))
    ta = Trainer(cfg_a, mesh=create_mesh(2))
    ta.train(max_iter=4, log_period=4)
    ta.checkpointer.wait()
    params_a = jax.device_get(ta.state.params)

    cfg_b = base_cfg(str(tmp_path_factory.mktemp("resume_b")))
    tb = Trainer(cfg_b, mesh=create_mesh(2))
    tb.train(max_iter=2, log_period=2)  # "preempted" after the step-2 save
    tb.checkpointer.wait()
    tb2 = Trainer(cfg_b, mesh=create_mesh(2))
    tb2.resume_or_load(resume=True)
    assert int(tb2.state.step) == 2
    tb2.train(max_iter=4, log_period=2)
    tb2.checkpointer.wait()
    params_b = jax.device_get(tb2.state.params)

    for a, b in zip(
        jax.tree_util.tree_leaves(params_a),
        jax.tree_util.tree_leaves(params_b),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
