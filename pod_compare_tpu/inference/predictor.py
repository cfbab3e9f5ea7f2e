"""Probabilistic predictor: end-to-end jitted inference pipelines.

TPU-native replacement for the reference's predictor stack
(reference: probabilistic_inference.py:20-534). Each INFERENCE_MODE becomes
ONE jitted XLA program — backbone → (vmapped stochastic) head → anchorwise
core → fusion → rescale — so N stochastic forwards, sampling, clustering and
Bayesian fusion never leave the device (BASELINE.json north star).

Stochastic axes are explicit vmaps:
  * MC-dropout runs: backbone once, head vmapped over M dropout keys
    (the reference replicates feature lists ×M through the head,
    probabilistic_retinanet.py:104-108).
  * Ensembles: member parameters stacked into a leading axis and the whole
    forward vmapped — a model-replica axis that can also be sharded over a
    device mesh (SURVEY.md §2.3).
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pod_compare_tpu.inference import modes as M
from pod_compare_tpu.inference.core import (
    Detections,
    deferred_covariance,
    probabilistic_inference_core,
)
from pod_compare_tpu.inference.postprocess import detector_postprocess
from pod_compare_tpu.models import build_anchor_generator, build_model


def _tree_stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def _mean_outputs(outs):
    """Average stacked head outputs over the leading run axis
    (reference: probabilistic_inference.py:211-270)."""
    mean = lambda x: None if x is None else jnp.mean(x, axis=0)
    return {
        "box_cls": mean(outs["box_cls"]),
        "box_delta": mean(outs["box_delta"]),
        "box_cls_var": mean(outs["box_cls_var"]),
        "box_reg_var": mean(outs["box_reg_var"]),
    }


class ProbabilisticPredictor:
    """Builds and runs the jitted inference pipeline for one INFERENCE_MODE.

    Args:
        cfg: frozen experiment config (train cfg + inference cfg merged).
        image_size: static network input (H, W) after resize+pad.
        params: parameter pytree (single-model modes).
        params_list: list of member pytrees (ensembles mode; order matches
            PROBABILISTIC_INFERENCE.ENSEMBLES.RANDOM_SEED_NUMS, mirroring
            the reference's seed-sibling checkpoint discovery,
            probabilistic_inference.py:59-77).
    """

    def __init__(self, cfg, image_size, params=None, params_list=None, mesh=None):
        self.cfg = cfg
        self.image_size = tuple(image_size)
        self.mesh = mesh
        self.model = build_model(
            cfg, head_quant=cfg.PROBABILISTIC_INFERENCE.HEAD_QUANT
        )
        gen = build_anchor_generator(cfg)
        self.anchors = jnp.asarray(gen.concatenated(self.image_size))
        # Static per-level anchor counts: candidate top-k runs per FPN
        # level, as in the reference (probabilistic_inference.py:283-308).
        self.level_sizes = tuple(
            a.shape[0] for a in gen.per_level(self.image_size)
        )

        self.mode = cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE
        self.mc_enabled = bool(cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE)
        self.num_runs = int(cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS)
        if self.mc_enabled and self.model.dropout_rate == 0.0:
            raise ValueError(
                "MC_DROPOUT.ENABLE requires a model trained with dropout "
                "(MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE > 0)."
            )

        if self.mode == "ensembles":
            assert params_list is not None, "ensembles mode needs params_list"
            self.params = _tree_stack(params_list)
            self.num_members = len(params_list)
        else:
            assert params is not None
            self.params = params
            self.num_members = 1

        # Two-program pipeline layout (head bank | sampling core): the
        # validated workaround for the v5e mc_iid fused-program runtime
        # fault — see config/defaults.py::SPLIT_HEAD_PROGRAM and
        # DESIGN.md §5d. Bit-identical to the fused pipeline.
        self.split = bool(
            cfg.PROBABILISTIC_INFERENCE.SPLIT_HEAD_PROGRAM
        )
        is_multi = self.mode == "ensembles" or (
            self.mc_enabled and self.num_runs > 1
        )
        if self.split and (self._is_post_nms_merge() or not is_multi):
            raise ValueError(
                "PROBABILISTIC_INFERENCE.SPLIT_HEAD_PROGRAM only applies "
                "to multi-run pre-NMS pipelines (MC dropout or ensembles "
                "with pre-NMS/fusion merge) — the faulting family it "
                "works around."
            )

        self._head_fn = self._tail_fn = None  # set by the split pipeline
        self._fn = self._build_pipeline()

    # ------------------------------------------------------------ internals
    def _core_kwargs(self):
        cfg = self.cfg
        return dict(
            topk=int(cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST),
            level_sizes=self.level_sizes,
            score_thresh=float(cfg.MODEL.RETINANET.SCORE_THRESH_TEST),
            cls_num_samples=int(
                cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES
            ),
            box_num_samples=int(
                cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES
            ),
            box_reg_weights=tuple(cfg.MODEL.RETINANET.BBOX_REG_WEIGHTS),
            cls_sampling=cfg.PROBABILISTIC_INFERENCE.CLS_SAMPLING,
            box_sampling=cfg.PROBABILISTIC_INFERENCE.BOX_SAMPLING,
        )

    def _mode_fn(self) -> Callable:
        cfg = self.cfg
        nms_thresh = float(cfg.MODEL.RETINANET.NMS_THRESH_TEST)
        max_dets = int(cfg.TEST.DETECTIONS_PER_IMAGE)
        affinity = float(cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD)
        mode = self.mode
        if mode == "standard_nms":
            return lambda c: M.standard_nms(c, nms_thresh, max_dets)
        if mode == "anchor_statistics":
            return lambda c: M.anchor_statistics(c, nms_thresh, max_dets, affinity)
        if mode == "bayes_od":
            bm = cfg.PROBABILISTIC_INFERENCE.BAYES_OD.BOX_MERGE_MODE
            cm = cfg.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE
            return lambda c: M.bayes_od(c, nms_thresh, max_dets, affinity, bm, cm)
        if mode == "mc_dropout_ensembles":
            merge = cfg.PROBABILISTIC_INFERENCE.ENSEMBLES_DROPOUT.BOX_MERGE_MODE
            if merge == "pre_nms":
                return lambda c: M.standard_nms(c, nms_thresh, max_dets)
            return None  # post_nms handled by the dedicated pipeline
        if mode == "ensembles":
            merge = cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.BOX_MERGE_MODE
            if merge == "pre_nms":
                return lambda c: M.standard_nms(c, nms_thresh, max_dets)
            return None
        raise ValueError(f"Invalid inference mode {mode}.")

    def _is_post_nms_merge(self) -> bool:
        cfg = self.cfg
        if self.mode == "mc_dropout_ensembles":
            return cfg.PROBABILISTIC_INFERENCE.ENSEMBLES_DROPOUT.BOX_MERGE_MODE == "post_nms"
        if self.mode == "ensembles":
            return cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.BOX_MERGE_MODE == "post_nms"
        return False

    def _member_outputs(self, params, images, rng):
        """All stochastic head outputs, stacked with leading run axis M.

        Returns (outs, is_multi): each entry (M, B, R, ·) when multi.
        """
        model = self.model
        if self.mode == "ensembles":
            # Model-replica forward over stacked params (eval mode — the
            # reference keeps ensemble members deterministic,
            # probabilistic_inference.py:63-64). With a 'member' mesh axis
            # the member forward runs under shard_map: each member computes
            # on its own mesh slice with UNPARTITIONED convs. (A plain
            # sharded vmap lowers to batch-grouped convolutions that the
            # SPMD partitioner computes incorrectly — caught by the
            # ensemble-sharding equivalence test.)
            if self.mesh is not None and "member" in self.mesh.axis_names:
                from jax.sharding import PartitionSpec as P

                def fwd(p_shard, img_shard):
                    return jax.vmap(
                        lambda p: model.apply({"params": p}, img_shard, True)
                    )(p_shard)

                outs = jax.shard_map(
                    fwd,
                    mesh=self.mesh,
                    in_specs=(P("member"), P("data")),
                    out_specs=P("member", "data"),
                    check_vma=False,
                )(params, images)
                return outs, True
            outs = jax.vmap(
                lambda p: model.apply({"params": p}, images, True)
            )(params)
            return outs, True
        feats = model.apply({"params": params}, images, method="backbone")
        if self.mc_enabled and self.num_runs > 1:
            # Full head vmapped over dropout keys. Two structurally
            # "cheaper" variants measured SLOWER on v5e (shared-first-conv
            # python loop: 652 ms/batch; shared-prefix + vmapped rest:
            # 611 ms/batch; this: 457 ms/batch) — XLA's batched lowering of
            # the plain vmap fuses backbone-output -> head conv best.
            keys = jax.random.split(rng, self.num_runs)
            shared_masks = bool(
                self.cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.BATCH_SHARED_MASKS
            )
            outs = jax.vmap(
                lambda k: model.apply(
                    {"params": params}, feats, False, shared_masks,
                    method="forward_head", rngs={"dropout": k},
                )
            )(keys)
            return outs, True
        out = model.apply({"params": params}, feats, True, method="forward_head")
        return out, False

    def _build_split_pipeline(self, anchors, core_kwargs, mode_fn) -> Callable:
        """Two sequential XLA programs: head bank | sampling core + fusion.

        Same ops, same key derivations, same order as the fused pipeline
        — outputs are bit-identical (tests/test_split_program.py). What
        changes is the compilation unit: XLA fuses/schedules the head
        bank and the sampling tail independently, with the (B, R, ·)
        head moments materialized to HBM at the seam (device-resident;
        no host round-trip).

        This program layout is the validated workaround for the v5e
        mc_iid runtime fault (DESIGN.md §5d): the fused mc_iid program
        crashes the worker at batch 17-20 while this form runs b20/b24
        clean — measured b24 = 36.6 img/s vs the fused pipeline's b16
        guard ceiling of 35.8 (tools/probe_mc_iid_split.py).
        """
        def head_program(params, images, rng):
            dropout_rng, sampling_rng = jax.random.split(rng)
            outs, is_multi = self._member_outputs(params, images, dropout_rng)
            assert is_multi  # enforced at __init__
            mean_outs = _mean_outputs(outs)
            # Batch-leading (B, M, R, 4): every seam buffer is batch-major
            # (uniform data sharding under a mesh), and per-image slices
            # match the fused pipeline's in_axes=1 view exactly.
            run_deltas = jnp.swapaxes(outs["box_delta"], 0, 1)
            img_keys = jax.random.split(sampling_rng, images.shape[0])
            return mean_outs, run_deltas, img_keys

        def tail_program(mean_outs, run_deltas, img_keys,
                         input_sizes, output_sizes):
            def per_image(key, cls_i, delta_i, cvar_i, rvar_i, rd_i):
                cands = probabilistic_inference_core(
                    key, anchors, cls_i, delta_i, cvar_i, rvar_i, rd_i,
                    **core_kwargs,
                )
                return mode_fn(cands)

            dets = jax.vmap(
                per_image,
                in_axes=(0, 0, 0, _ax(mean_outs["box_cls_var"]),
                         _ax(mean_outs["box_reg_var"]), 0),
            )(
                img_keys,
                mean_outs["box_cls"],
                mean_outs["box_delta"],
                mean_outs["box_cls_var"],
                mean_outs["box_reg_var"],
                run_deltas,
            )
            return jax.vmap(detector_postprocess)(
                dets,
                input_sizes[:, 0], input_sizes[:, 1],
                output_sizes[:, 0], output_sizes[:, 1],
            )

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from pod_compare_tpu.parallel.mesh import data_sharding, replicated

            rep = replicated(self.mesh)
            shard = data_sharding(self.mesh)
            params_sharding = rep
            if self.mode == "ensembles" and "member" in self.mesh.axis_names:
                assert self.num_members % self.mesh.shape["member"] == 0, (
                    f"{self.num_members} ensemble members not divisible by "
                    f"member axis {self.mesh.shape['member']}"
                )
                params_sharding = NamedSharding(self.mesh, P("member"))
            head = jax.jit(
                head_program,
                in_shardings=(params_sharding, shard, rep),
                out_shardings=shard,
            )
            tail = jax.jit(
                tail_program,
                in_shardings=(shard, shard, shard, shard, shard),
                out_shardings=shard,
            )
        else:
            head = jax.jit(head_program)
            tail = jax.jit(tail_program)
        self._head_fn, self._tail_fn = head, tail

        def fn(params, images, rng, input_sizes, output_sizes):
            mean_outs, run_deltas, img_keys = head(params, images, rng)
            return tail(
                mean_outs, run_deltas, img_keys, input_sizes, output_sizes
            )

        return fn

    def _build_pipeline(self) -> Callable:
        anchors = self.anchors
        core_kwargs = self._core_kwargs()
        post_nms_merge = self._is_post_nms_merge()
        mode_fn = self._mode_fn()
        if self.split:
            return self._build_split_pipeline(anchors, core_kwargs, mode_fn)
        cfg = self.cfg
        nms_thresh = float(cfg.MODEL.RETINANET.NMS_THRESH_TEST)
        max_dets = int(cfg.TEST.DETECTIONS_PER_IMAGE)
        affinity = float(cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD)

        def pipeline(params, images, rng, input_sizes, output_sizes):
            batch = images.shape[0]
            # Disjoint streams: `split(rng, num_runs)` (dropout keys inside
            # _member_outputs) and `split(rng, batch)` would yield IDENTICAL
            # key arrays whenever num_runs == batch, correlating dropout
            # masks with per-image sampling. Fold into two branches first.
            dropout_rng, sampling_rng = jax.random.split(rng)
            outs, is_multi = self._member_outputs(params, images, dropout_rng)
            img_keys = jax.random.split(sampling_rng, batch)

            if not post_nms_merge:
                if is_multi:
                    mean_outs = _mean_outputs(outs)
                    run_deltas = outs["box_delta"]  # (M, B, R, 4)

                    def per_image(key, cls_i, delta_i, cvar_i, rvar_i, rd_i):
                        cands = probabilistic_inference_core(
                            key, anchors, cls_i, delta_i, cvar_i, rvar_i,
                            rd_i, **core_kwargs,
                        )
                        return mode_fn(cands)

                    dets = jax.vmap(per_image, in_axes=(0, 0, 0, _ax(mean_outs["box_cls_var"]), _ax(mean_outs["box_reg_var"]), 1))(
                        img_keys,
                        mean_outs["box_cls"],
                        mean_outs["box_delta"],
                        mean_outs["box_cls_var"],
                        mean_outs["box_reg_var"],
                        run_deltas,
                    )
                else:
                    # Single-model standard NMS: only max_dets of the ~4.5k
                    # candidates survive and NMS reads means/scores only, so
                    # the analytic covariance algebra runs post-NMS on the
                    # survivors (bit-identical results; see
                    # core.deferred_covariance).
                    defer = (
                        self.mode == "standard_nms"
                        and core_kwargs["box_sampling"] == "analytic"
                        and not _defer_cov_disabled()
                    )

                    def per_image(key, cls_i, delta_i, cvar_i, rvar_i):
                        cands = probabilistic_inference_core(
                            key, anchors, cls_i, delta_i, cvar_i, rvar_i,
                            None, defer_covariance=defer, **core_kwargs,
                        )
                        dets = mode_fn(cands)
                        if defer and rvar_i is not None:
                            dets = deferred_covariance(
                                dets, delta_i, rvar_i, anchors,
                                core_kwargs["box_reg_weights"],
                            )
                        return dets

                    dets = jax.vmap(per_image, in_axes=(0, 0, 0, _ax(outs["box_cls_var"]), _ax(outs["box_reg_var"])))(
                        img_keys,
                        outs["box_cls"],
                        outs["box_delta"],
                        outs["box_cls_var"],
                        outs["box_reg_var"],
                    )
            else:
                # Post-NMS merge: per-run standard NMS then black-box fusion
                # (reference: probabilistic_inference.py:444-481, 506-534).
                # Every (image, run) unit is independent through core+NMS,
                # so the (batch × runs) axes are FLATTENED into one vmap —
                # the same single-level structure as the pre-NMS modes. (A
                # nested vmap(batch)·vmap(runs) formulation kernel-faults
                # the v5e worker at batch 8; the flat form is also what the
                # other modes already compile.)
                assert is_multi
                num_runs = outs["box_cls"].shape[0]
                batch_size = outs["box_cls"].shape[1]

                # Unit order: run-major (M*B, b minor) on a single chip —
                # a FREE reshape of the (M, B, ...) head outputs, where
                # the image-major order would TRANSPOSE ~2.5 GB of head
                # outputs per batch (box_cls alone is 790 MB at b16/10
                # runs); the member order is restored AFTER per-unit NMS
                # on (max_dets, ·) slices — a few MB. Under a data-
                # sharded mesh, keep image-major (b major) so the unit
                # axis inherits the batch sharding without resharding.
                run_major = self.mesh is None

                def to_units(x):
                    if x is None:
                        return None
                    if not run_major:
                        x = jnp.swapaxes(x, 0, 1)
                    return x.reshape((batch_size * num_runs,) + x.shape[2:])

                # Key for unit u must be (image b, run m) with u = m*B + b
                # (run-major) or b*M + m (image-major): build (B, M) keys
                # and reorder the KEYS (tiny) to match.
                keys_bm = jax.vmap(
                    lambda k: jax.random.split(k, num_runs)
                )(img_keys)
                if run_major:
                    keys_bm = jnp.swapaxes(keys_bm, 0, 1)
                unit_keys = keys_bm.reshape(
                    (batch_size * num_runs,) + img_keys.shape[1:]
                )

                # Per-unit NMS keeps max_dets of ~4.5k candidates: defer
                # the analytic covariance algebra to the survivors (75 ->
                # ~2 ms of the per-unit core at 160 units, DESIGN.md §5d).
                defer_units = (
                    core_kwargs["box_sampling"] == "analytic"
                    and not _defer_cov_disabled()
                )

                def per_unit(k, cls_i, delta_i, cvar_i, rvar_i):
                    cands = probabilistic_inference_core(
                        k, anchors, cls_i, delta_i, cvar_i, rvar_i,
                        None, defer_covariance=defer_units, **core_kwargs,
                    )
                    dets = M.standard_nms(cands, nms_thresh, max_dets)
                    if defer_units and rvar_i is not None:
                        dets = deferred_covariance(
                            dets, delta_i, rvar_i, anchors,
                            core_kwargs["box_reg_weights"],
                        )
                    return dets

                units = jax.vmap(
                    per_unit,
                    in_axes=(0, 0, 0, _ax(outs["box_cls_var"]), _ax(outs["box_reg_var"])),
                )(
                    unit_keys,
                    to_units(outs["box_cls"]),
                    to_units(outs["box_delta"]),
                    to_units(outs["box_cls_var"]),
                    to_units(outs["box_reg_var"]),
                )
                # -> (B, M*D, ...): each image's members run-major,
                # matching the reference's concatenation order. In the
                # run-major unit layout this transposes only the small
                # post-NMS (max_dets, ·) slices.
                def regroup(x):
                    if run_major:
                        x = jnp.swapaxes(
                            x.reshape((num_runs, batch_size) + x.shape[1:]),
                            0, 1,
                        )
                    else:
                        x = x.reshape(
                            (batch_size, num_runs) + x.shape[1:]
                        )
                    return x.reshape(
                        (batch_size, num_runs * x.shape[2]) + x.shape[3:]
                    )

                per_image_members = jax.tree_util.tree_map(regroup, units)
                dets = jax.vmap(
                    lambda d: M.black_box_merge(d, nms_thresh, max_dets, affinity)
                )(per_image_members)

            return jax.vmap(detector_postprocess)(
                dets,
                input_sizes[:, 0], input_sizes[:, 1],
                output_sizes[:, 0], output_sizes[:, 1],
            )

        if self.mesh is not None:
            # Data-parallel inference over the device mesh: batch axis
            # sharded, params replicated; XLA partitions the whole pipeline
            # (the per-image vmap splits cleanly — no cross-image
            # communication exists in any mode). Replaces the reference's
            # single-GPU pinned inference (apply_net.py:113-114).
            #
            # Ensembles with a 'member' mesh axis additionally shard the
            # stacked member-parameter axis: each member's forward runs on
            # its own mesh slice and the cross-member output average becomes
            # an ICI all-reduce ("ensemble parallelism", SURVEY.md §2.3).
            from jax.sharding import NamedSharding, PartitionSpec as P

            from pod_compare_tpu.parallel.mesh import data_sharding, replicated

            rep = replicated(self.mesh)
            shard = data_sharding(self.mesh)
            params_sharding = rep
            if self.mode == "ensembles" and "member" in self.mesh.axis_names:
                assert self.num_members % self.mesh.shape["member"] == 0, (
                    f"{self.num_members} ensemble members not divisible by "
                    f"member axis {self.mesh.shape['member']}"
                )
                params_sharding = NamedSharding(self.mesh, P("member"))
            return jax.jit(
                pipeline,
                in_shardings=(params_sharding, shard, rep, shard, shard),
                out_shardings=shard,
            )
        return jax.jit(pipeline)

    # ------------------------------------------------------------------ API
    def __call__(
        self,
        images: jnp.ndarray,
        input_sizes: jnp.ndarray,
        output_sizes: jnp.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> Detections:
        """Run inference on a padded batch.

        Args:
            images: (B, H, W, 3) raw-pixel (BGR) images, resized and padded
                to the static network size.
            input_sizes: (B, 2) resized (pre-padding) sizes as (h, w).
            output_sizes: (B, 2) original image sizes as (h, w).
            rng: PRNG key for the stochastic paths (default: fixed seed).
        Returns:
            Batched `Detections` in original-image coordinates.
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._fn(
            self.params,
            images,
            rng,
            jnp.asarray(input_sizes, jnp.float32),
            jnp.asarray(output_sizes, jnp.float32),
        )


def _ax(x) -> Optional[int]:
    """vmap in_axes helper: broadcast None fields."""
    return None if x is None else 0


def _defer_cov_disabled() -> bool:
    """Debug escape hatch for the defer-covariance fast path (DESIGN §5d):
    set POD_COMPARE_DISABLE_DEFER_COV=1 to force the full-candidate-set
    covariance computation (bit-identical outputs, slower)."""
    import os

    return os.environ.get("POD_COMPARE_DISABLE_DEFER_COV", "") not in ("", "0")


def visualize_inference(
    image_bgr: np.ndarray,
    detections,
    out_path: str,
    max_boxes: int = 20,
) -> str:
    """Debug overlay of the top detections with covariance ellipses
    (reference: ProbabilisticPredictor.visualize_inference,
    probabilistic_inference.py:113-146 — writes a png instead of cv2
    windows).

    Args:
        image_bgr: (H, W, 3) uint8/float image in the detection frame.
        detections: single-image Detections (host arrays).
    """
    import cv2

    from pod_compare_tpu.visualization.visualizer import ProbabilisticVisualizer

    valid = np.asarray(detections.valid)
    boxes = np.asarray(detections.boxes)[valid][:max_boxes]
    covs = np.asarray(detections.covs)[valid][:max_boxes]
    vis = ProbabilisticVisualizer(np.asarray(image_bgr, np.uint8))
    vis.overlay_covariance_instances(boxes, covs)
    cv2.imwrite(out_path, vis.get_image())
    return out_path


def build_predictor(
    cfg, image_size, params=None, params_list=None, mesh=None
) -> ProbabilisticPredictor:
    """Dispatch mirroring the reference's `build_predictor`
    (probabilistic_inference.py:20-33)."""
    if cfg.MODEL.META_ARCHITECTURE in (
        "ProbabilisticRetinaNet",
        "RetinaNet",
    ):
        return ProbabilisticPredictor(cfg, image_size, params, params_list, mesh)
    raise ValueError(
        f"Invalid meta-architecture {cfg.MODEL.META_ARCHITECTURE}."
    )
