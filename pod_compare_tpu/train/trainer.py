"""Training engine: data-parallel jitted train step + host loop.

TPU-native replacement for detectron2's DefaultTrainer/SimpleTrainer stack
as exercised by the reference (reference: train_net.py:18-81; hot loop
SURVEY.md §3.1). The whole step — forward (stochastic focal loss included),
backward, optimizer — is ONE jitted XLA program; the batch axis is sharded
over the device mesh and XLA inserts the gradient all-reduce over ICI
(replacing detectron2's DDP/NCCL, SURVEY.md §2.4).

State (params, momentum, EMA loss normalizer, step) lives replicated on
device; the EMA normalizer is part of the carried state, replicating the
reference's mutable `self.loss_normalizer` (probabilistic_retinanet.py:201).
"""

import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pod_compare_tpu.data.datasets import get_dataset
from pod_compare_tpu.data.loader import TrainLoader
from pod_compare_tpu.models import (
    build_anchor_generator,
    build_model,
)
from pod_compare_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    replicated,
)
from pod_compare_tpu.train.checkpoint import Checkpointer, resume_or_load
from pod_compare_tpu.train.loss import LossConfig, compute_losses
from pod_compare_tpu.train.optim import build_optimizer
from pod_compare_tpu.utils.events import EventStorage
from pod_compare_tpu.utils.logging import setup_logger


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    loss_normalizer: jnp.ndarray  # EMA of positive-anchor count (init 100)
    rng: jax.Array


def create_train_state(cfg, model, image_size, seed: int = 0) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    init_rng, state_rng = jax.random.split(rng)
    images = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
    params = model.init({"params": init_rng}, images, True)["params"]
    tx, _ = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        loss_normalizer=jnp.asarray(100.0, jnp.float32),
        rng=state_rng,
    )


def make_train_step(cfg, model, anchors: jnp.ndarray, mesh=None):
    """Build the jitted data-parallel train step."""
    lc = LossConfig.from_config(cfg)
    tx, schedule = build_optimizer(cfg, None)  # mask computed lazily below

    # build_optimizer needs params for the decay mask; rebuild inside a
    # closure on first trace instead (mask depends only on tree structure).
    use_remat = bool(cfg.PARALLEL.REMAT)
    shared_masks = bool(
        cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_SHARED_BATCH_TRAIN
    )

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, dropout_rng, loss_rng = jax.random.split(state.rng, 3)

        def forward(params, images):
            return model.apply(
                {"params": params},
                images,
                False,  # dropout active during training (model.train())
                mask_shared_batch=shared_masks,
                rngs={"dropout": dropout_rng},
            )

        if use_remat:
            # jax.checkpoint: recompute activations in the backward pass
            # instead of storing them (HBM-for-FLOPs trade, SURVEY has no
            # counterpart — detectron2 has no activation checkpointing).
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            outputs = forward(params, batch["images"])
            losses, new_norm = compute_losses(
                loss_rng,
                outputs,
                anchors,
                batch["gt_boxes"],
                batch["gt_classes"].astype(jnp.int32),
                batch["gt_valid"],
                state.loss_normalizer,
                state.step,
                lc,
            )
            total = losses["loss_cls"] + losses["loss_box_reg"]
            return total, (losses, new_norm)

        (total, (losses, new_norm)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["lr"] = schedule(state.step)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            loss_normalizer=new_norm,
            rng=rng,
        )
        return new_state, metrics

    if mesh is not None:
        rep = replicated(mesh)
        shard = data_sharding(mesh)
        batch_shardings = {
            "images": shard, "gt_boxes": shard, "gt_classes": shard,
            "gt_valid": shard,
        }
        return jax.jit(
            step_fn,
            in_shardings=(rep, batch_shardings),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))


def resolve_weights_path(weights: str) -> str:
    """Resolve MODEL.WEIGHTS, including the reference's `detectron2://`
    model-zoo scheme (Base-BDD-RetinaNet.yaml:6, resolved by fvcore's
    PathManager there). This environment has no network, so zoo URLs
    resolve against a local cache directory ($DETECTRON2_CACHE, default
    ~/.torch/iopath_cache — fvcore's layout); a miss fails with the
    recipe instead of a bare FileNotFoundError."""
    import os

    if not weights.startswith("detectron2://"):
        return weights
    rel = weights[len("detectron2://"):]
    cache_root = os.environ.get(
        "DETECTRON2_CACHE", os.path.expanduser("~/.torch/iopath_cache")
    )
    local = os.path.join(cache_root, rel)
    if not os.path.isfile(local):
        raise FileNotFoundError(
            f"MODEL.WEIGHTS={weights}: detectron2:// URLs resolve against "
            f"a local zoo cache ({local} not found). Download the file on "
            "a networked machine (or copy it from a detectron2 install's "
            "cache), place it at that path or set DETECTRON2_CACHE, or "
            "point MODEL.WEIGHTS at a local .pkl/.pth and it will be "
            "converted on the fly (pod_compare_tpu/train/torch_convert.py)."
        )
    return local


TRAIN_BATCH_KEYS = ("images", "gt_boxes", "gt_classes", "gt_valid")


def select_train_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Keep only the arrays the jitted step consumes (loader batches carry
    eval-side metadata too)."""
    return {k: batch[k] for k in TRAIN_BATCH_KEYS}


class Trainer:
    """Host-side training driver (reference: Trainer(DefaultTrainer),
    train_net.py:18-59)."""

    def __init__(self, cfg, mesh=None, dataset=None, canvas=None):
        self.cfg = cfg
        self.logger = setup_logger(name="pod_compare_tpu.trainer")
        self.mesh = mesh if mesh is not None else create_mesh(
            cfg.PARALLEL.NUM_DEVICES
        )
        self.model = build_model(cfg)

        dataset = dataset or get_dataset(cfg.DATASETS.TRAIN[0])
        self.loader = TrainLoader(
            dataset,
            batch_size=cfg.SOLVER.IMS_PER_BATCH,
            # Full MIN_SIZE_TRAIN tuple: the loader samples one choice per
            # image (detectron2 ResizeShortestEdge "choice" semantics); the
            # published configs pin a single size.
            min_size=tuple(cfg.INPUT.MIN_SIZE_TRAIN),
            max_size=cfg.INPUT.MAX_SIZE_TRAIN,
            divisibility=cfg.INPUT.SIZE_DIVISIBILITY,
            max_gt_boxes=cfg.INPUT.MAX_GT_BOXES,
            seed=max(cfg.SEED, 0),
            canvas=canvas,
            num_workers=cfg.DATALOADER.NUM_WORKERS,
            flip=cfg.INPUT.RANDOM_FLIP == "horizontal",
            worker_backend=cfg.DATALOADER.WORKER_BACKEND,
        )
        self.canvas = self.loader.canvas
        gen = build_anchor_generator(cfg)
        self.anchors = jnp.asarray(gen.concatenated(self.canvas))
        self.logger.info(
            f"canvas={self.canvas} anchors={self.anchors.shape[0]} "
            f"devices={self.mesh.devices.size}"
        )

        self.state = create_train_state(
            cfg, self.model, self.canvas, seed=max(cfg.SEED, 0)
        )
        self.train_step = make_train_step(cfg, self.model, self.anchors, self.mesh)
        self.checkpointer = Checkpointer(cfg.OUTPUT_DIR)
        self.storage = EventStorage(cfg.OUTPUT_DIR)
        # (dataset, batch) -> (loader, predictor), reused across test()
        # calls so periodic eval doesn't rebuild + re-jit the pipeline
        # every EVAL_PERIOD. A dict (not one slot): alternating eval on
        # two val splits mid-run must reuse BOTH pipelines instead of
        # rebuilding (~40-50 s re-jit) and leaking the evicted loader's
        # worker pool on every call.
        self._eval_cache = {}

    def close(self) -> None:
        """Release loader worker pools (the train loader and every cached
        eval pipeline's loader). The eval cache would otherwise pin one
        worker pool per (dataset, batch) key for the Trainer's lifetime.
        Safe to call once training/eval is finished; the Trainer must not
        be used afterwards."""
        self.checkpointer.wait()
        self.loader.close()
        for loader, _ in self._eval_cache.values():
            loader.close()
        self._eval_cache.clear()

    def resume_or_load(self, resume: bool = False) -> None:
        """Resume from the latest checkpoint, else warm-start from
        cfg.MODEL.WEIGHTS (reference: DetectionCheckpointer.resume_or_load,
        train_net.py:80; ImageNet R-50 init from
        Base-BDD-RetinaNet.yaml:6). WEIGHTS may be a reference torch
        .pth/.pkl checkpoint (converted on the fly) or an orbax
        checkpoint directory."""
        self.state, resumed = resume_or_load(self.checkpointer, self.state, resume)
        if resumed:
            self.logger.info(f"Resumed from step {int(self.state.step)}")
            return
        weights = self.cfg.MODEL.WEIGHTS
        if not weights:
            return
        weights = resolve_weights_path(weights)
        if weights.endswith(".pth") or weights.endswith(".pkl"):
            from pod_compare_tpu.train.torch_convert import (
                convert_torch_state_dict,
                load_reference_checkpoint,
                merge_into_params,
            )

            converted = convert_torch_state_dict(
                load_reference_checkpoint(weights)
            )
            params = merge_into_params(jax.device_get(self.state.params), converted)
        else:
            from pod_compare_tpu.train.checkpoint import load_params

            params = load_params(weights)
        self.state = self.state._replace(
            params=jax.device_put(
                params, jax.tree_util.tree_leaves(self.state.params)[0].sharding
            )
        )
        self.logger.info(f"Warm-started from MODEL.WEIGHTS={weights}")

    def train(
        self,
        max_iter: Optional[int] = None,
        log_period: int = 20,
        profile_iters: Optional[tuple] = None,
    ) -> None:
        """Run the training loop; `profile_iters=(start, stop)` captures an
        XLA profiler trace over that iteration window (SURVEY.md §5.1 —
        the reference has no profiler)."""
        from pod_compare_tpu.utils.profiling import trace

        cfg = self.cfg
        max_iter = max_iter if max_iter is not None else cfg.SOLVER.MAX_ITER
        start = int(self.state.step)
        # Resume consumes the SAME batch sequence an uninterrupted run
        # would: the loader replays its RNG draws up to `start` without
        # decoding (TrainLoader.iter_from), making checkpoint-resume
        # bitwise-reproducible (verified by the dryrun gate and
        # tests/test_train.py::test_resume_reproduces_uninterrupted_run).
        data_iter = self.loader.iter_from(start)
        self.logger.info(f"Starting training from iteration {start}")
        profile_ctx = None
        t0 = time.time()
        for it in range(start, max_iter):
            if profile_iters is not None:
                if it == profile_iters[0]:
                    profile_ctx = trace(cfg.OUTPUT_DIR, enabled=True)
                    profile_ctx.__enter__()
                elif it == profile_iters[1] and profile_ctx is not None:
                    profile_ctx.__exit__(None, None, None)
                    profile_ctx = None
            batch = select_train_batch(next(data_iter))
            self.state, metrics = self.train_step(self.state, batch)
            self.storage.iter = it
            if (it + 1) % log_period == 0 or it == max_iter - 1:
                host = {k: float(v) for k, v in metrics.items()}
                host["iter_time"] = (time.time() - t0) / log_period
                t0 = time.time()
                self.storage.put_scalars(**host)
                self.storage.write()
                self.logger.info(
                    f"iter {it + 1}/{max_iter} "
                    + " ".join(f"{k}={v:.4g}" for k, v in sorted(host.items()))
                )
            if (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or it == max_iter - 1:
                self.checkpointer.save(it + 1, self.state._asdict())
            if (
                cfg.TEST.EVAL_PERIOD > 0
                and (it + 1) % cfg.TEST.EVAL_PERIOD == 0
            ):
                self.test()
        self.checkpointer.wait()
        self.logger.info("Training done.")

    def test(self, test_dataset: Optional[str] = None,
             batch_size: Optional[int] = None):
        """Evaluate the CURRENT params on the test dataset with standard
        NMS + COCO mAP (reference: Trainer.build_evaluator + Trainer.test,
        train_net.py:20-32,73-75). `batch_size=None` follows
        SOLVER.IMS_PER_BATCH so the in-train eval hook's batch is always
        divisible by the training mesh."""
        from pod_compare_tpu.cli.apply_net import run_inference

        if batch_size is None:
            batch_size = self.cfg.SOLVER.IMS_PER_BATCH
        cfg = self.cfg.clone().defrost()
        cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "standard_nms"
        test_dataset = test_dataset or cfg.DATASETS.TEST[0]
        cache_key = (test_dataset, batch_size)
        if cache_key not in self._eval_cache:
            from pod_compare_tpu.data.loader import TestLoader
            from pod_compare_tpu.inference.predictor import build_predictor

            loader = TestLoader(
                get_dataset(test_dataset),
                batch_size=batch_size,
                min_size=cfg.INPUT.MIN_SIZE_TEST,
                max_size=cfg.INPUT.MAX_SIZE_TEST,
                divisibility=cfg.INPUT.SIZE_DIVISIBILITY,
                num_workers=cfg.DATALOADER.NUM_WORKERS,
                worker_backend=cfg.DATALOADER.WORKER_BACKEND,
                # Multi-controller training evaluates a per-process shard
                # and gathers (run_inference's rank gather) — an unsharded
                # loader here would double-count every detection.
                process_index=jax.process_index(),
                process_count=jax.process_count(),
            )
            # Eval shares the training mesh so a batch sized for N chips
            # stays sharded (the reference evaluates on all DDP ranks).
            predictor = build_predictor(
                cfg, loader.canvas, params=self.state.params,
                mesh=self.mesh if self.mesh.devices.size > 1 else None,
            )
            self._eval_cache[cache_key] = (loader, predictor)
        loader, predictor = self._eval_cache[cache_key]
        predictor.params = self.state.params  # jit is shape-keyed: no re-trace
        summary = run_inference(
            cfg,
            test_dataset,
            f"eval_iter_{int(self.state.step)}",
            batch_size=batch_size,
            run_metrics=False,
            run_map=True,
            verbose=False,
            loader=loader,
            predictor=predictor,
        )
        if not summary.get("is_main_process", True):
            # Non-main ranks return after the collective gathers with no
            # metric keys; writers run on the main process only.
            return summary
        self.storage.put_scalars(
            **{"eval/mAP": summary.get("mAP", float("nan")),
               "eval/AP50": summary.get("AP50", float("nan")),
               "eval/num_detections": summary.get("num_detections", 0)}
        )
        self.storage.write()
        self.logger.info(
            f"eval @ iter {int(self.state.step)}: "
            f"mAP={summary.get('mAP', float('nan')):.4f} "
            f"AP50={summary.get('AP50', float('nan')):.4f}"
        )
        return summary
