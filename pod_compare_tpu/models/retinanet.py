"""Probabilistic RetinaNet (Flax/linen, NHWC, static shapes).

TPU-native counterpart of the reference's meta-architecture
(reference: src/probabilistic_modeling/probabilistic_retinanet.py):
R-50-FPN backbone + a shared per-level head with four subnets — class
logits, box deltas, class logit log-variances and box covariance params —
plus optional MC-dropout in the conv towers.

Design differences from the reference (all TPU-motivated):
  * pure functions over parameter pytrees; no mutable module state.
  * outputs are concatenated (N, R, ·) arrays in the anchor layout of
    `ops.anchors` (the reference's permute_to_N_HWA_K flattening), not
    per-level lists.
  * the head conv tower is evaluated ONCE per level and feeds both the
    mean and the variance output convs; the reference re-runs the tower
    for the variance branch (probabilistic_retinanet.py:518-523), which
    with dropout merely re-randomizes the mask — identical in
    distribution, half the FLOPs.
  * MC-dropout inference = backbone once + the head vmapped over sample
    keys (reference replicates feature lists ×N instead,
    probabilistic_retinanet.py:104-108).
  * image normalization is fused into the jitted graph.
"""

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pod_compare_tpu.models.fpn import FPN, FPN_STRIDES
from pod_compare_tpu.models.resnet import ResNet
from pod_compare_tpu.ops.anchors import AnchorGenerator

Dtype = Any


class TowerConv3(nn.Module):
    """3x3 SAME conv for the head towers with an optional int8-quantized
    evaluation path (`ops/quant.py`; knob PROBABILISTIC_INFERENCE.HEAD_QUANT).

    Parameter tree ('kernel', 'bias') and full-precision numerics are
    identical to the `nn.Conv` it replaces, so checkpoints and the torch
    converter are unaffected; only the evaluation path switches.
    """

    features: int
    in_features: int
    kernel_init: Any
    bias_init: Any
    dtype: Dtype = jnp.float32
    quant: str = "none"  # 'none' | 'int8'

    @nn.compact
    def __call__(self, x: jnp.ndarray, act_signed: bool = True) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, self.in_features, self.features),
        )
        bias = self.param("bias", self.bias_init, (self.features,))
        if self.quant == "int8":
            from pod_compare_tpu.ops.quant import quantized_conv3x3

            return quantized_conv3x3(x, kernel, bias, act_signed=act_signed)
        if self.quant != "none":
            raise ValueError(f"Unknown head quantization mode {self.quant!r}.")
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class ProbabilisticRetinaNetHead(nn.Module):
    """Shared RetinaNet head with probabilistic outputs
    (reference: probabilistic_retinanet.py:364-537)."""

    num_classes: int
    num_anchors: int
    num_convs: int = 4
    prior_prob: float = 0.01
    dropout_rate: float = 0.0
    # mask-bit source: 'bernoulli' | 'packed2' | 'packed4' | 'rbg'
    # (ops/pallas/dropout.py::dropout)
    dropout_impl: str = "bernoulli"
    compute_cls_var: bool = False
    compute_bbox_cov: bool = False
    bbox_cov_dims: int = 4
    channels: int = 256
    # int8-quantized tower evaluation for inference serving
    # (PROBABILISTIC_INFERENCE.HEAD_QUANT; ops/quant.py). Output convs stay
    # full-precision — they are <10% of head FLOPs and feed the metric-
    # sensitive mean outputs directly. Training never sets this.
    head_quant: str = "none"
    dtype: Dtype = jnp.float32

    def setup(self):
        normal01 = nn.initializers.normal(stddev=0.01)

        def conv3(features, kernel_init, bias_init):
            return nn.Conv(
                features,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                kernel_init=kernel_init,
                bias_init=bias_init,
                dtype=self.dtype,
            )

        # Individual attributes keep the reference-compatible param names
        # (cls_subnet_conv{i}, ...) used by the checkpoint converter.
        for i in range(self.num_convs):
            for prefix in ("cls_subnet", "bbox_subnet"):
                setattr(
                    self, f"{prefix}_conv{i}",
                    TowerConv3(
                        features=self.channels,
                        in_features=self.channels,
                        kernel_init=normal01,
                        bias_init=nn.initializers.zeros,
                        dtype=self.dtype,
                        quant=self.head_quant,
                    ),
                )

        # Output convs. Bias/weight init replicates the reference:
        # cls_score bias = -log((1-p)/p); cls_var bias = -10 (tiny initial
        # variance); bbox_cov weights std 1e-4
        # (probabilistic_retinanet.py:443-484).
        prior_bias = -math.log((1.0 - self.prior_prob) / self.prior_prob)
        self.cls_score = conv3(
            self.num_anchors * self.num_classes, normal01,
            nn.initializers.constant(prior_bias),
        )
        self.bbox_pred = conv3(
            self.num_anchors * 4, normal01, nn.initializers.zeros
        )
        if self.compute_cls_var:
            self.cls_var = conv3(
                self.num_anchors * self.num_classes, normal01,
                nn.initializers.constant(-10.0),
            )
        if self.compute_bbox_cov:
            self.bbox_cov = conv3(
                self.num_anchors * self.bbox_cov_dims,
                nn.initializers.normal(stddev=0.0001),
                nn.initializers.zeros,
            )

    def _tower(self, prefix: str):
        return [
            getattr(self, f"{prefix}_conv{i}") for i in range(self.num_convs)
        ]

    def _resolved_dropout_impl(self, shared_batch: bool) -> str:
        """Resolve DROPOUT_IMPL='auto' by where each impl measured fastest
        on v5e (DESIGN.md §5b/§5): per-sample TRAINING masks -> the
        hardware-PRNG replay kernel (its seed-replayed backward avoids
        the mask store/recompute that costs the threefry path ~9 ms/step
        at batch 16); batch-shared masks (the MC inference bank) -> fused
        threefry draws, which beat the kernel there (the pallas_call
        boundary breaks conv fusion); off-TPU -> plain bernoulli."""
        import jax as _jax

        if self.dropout_impl != "auto":
            return self.dropout_impl
        if shared_batch or _jax.default_backend() != "tpu":
            return "bernoulli"
        return "pallas"

    def _dropout(self, x, shared_batch: bool = False):
        from pod_compare_tpu.ops.pallas.dropout import dropout

        return dropout(
            x, self.make_rng("dropout"), self.dropout_rate, False,
            impl=self._resolved_dropout_impl(shared_batch),
            shared_batch=shared_batch,
        )

    def _all_masks(self, features, mask_shared_batch: bool):
        """All dropout keep-masks for one forward in 2*num_convs fused RNG
        draws — one per (tower, layer), each covering every FPN level.

        Per-conv draws cost ~1.5 ms of fixed per-op overhead on v5e (80
        ops -> ~120 ms); ONE flat draw for everything OOMs instead (the
        full uniform buffer plus every padded bool slice stay live at
        once). One draw per tower-layer (8 ops) amortizes the overhead
        while keeping each layer's mask working set ~50 MB. Shared-batch
        masks are drawn WITHOUT the batch axis — (H, W, C) broadcasting
        against (B, H, W, C) — because a size-1 leading dim gets
        tile-padded ~8x by the TPU layout (measured 345 MB per bool
        slice). Returns masks[level][tower][layer], or None when the impl
        manages its own stream ('pallas')."""
        impl = self._resolved_dropout_impl(mask_shared_batch)
        if impl == "pallas":
            return None
        from pod_compare_tpu.ops.pallas.dropout import tower_dropout_masks

        def level_shape(f):
            hw = (f.shape[1], f.shape[2], self.channels)
            return hw if mask_shared_batch else (f.shape[0],) + hw

        shapes = [level_shape(f) for f in features]
        masks = [[[None] * self.num_convs for _ in range(2)] for _ in features]
        for tower in range(2):
            for layer in range(self.num_convs):
                per_level = tower_dropout_masks(
                    self.make_rng("dropout"), shapes, self.dropout_rate,
                    impl=impl, dtype=self.dtype,
                )
                for li in range(len(features)):
                    masks[li][tower][layer] = per_level[li]
        return masks

    def _run_tower(
        self,
        convs,
        x,
        deterministic: bool,
        skip_first: bool = False,
        mask_shared_batch: bool = False,
        masks=None,
    ):
        from pod_compare_tpu.ops.pallas.dropout import apply_mask

        use_dropout = self.dropout_rate > 0.0 and not deterministic
        for i, conv in enumerate(convs):
            if not (skip_first and i == 0):
                # Only conv0 sees signed inputs (raw FPN features); later
                # layers are post-ReLU — the int8 path exploits this with a
                # one-pass unsigned activation scale (ops/quant.py).
                x = nn.relu(conv(x, act_signed=(i == 0)))
            if use_dropout:
                if masks is not None:
                    x = apply_mask(x, masks[i], self.dropout_rate)
                else:
                    x = self._dropout(x, shared_batch=mask_shared_batch)
        return x

    def _flatten(self, x, k):
        # (N, H, W, A*k) -> (N, H*W*A, k); matches permute_to_N_HWA_K.
        n, h, w, _ = x.shape
        return x.reshape(n, h * w * self.num_anchors, k)

    def _outputs(self, cls_feats, box_feats):
        # Interleave per level so XLA can retire each level's tower
        # activations before the next level starts (measured ~25% faster
        # end-to-end than phase-separated towers on v5e).
        logits, deltas, logit_vars, cov_params = [], [], [], []
        for c, b in zip(cls_feats, box_feats):
            logits.append(self._flatten(self.cls_score(c), self.num_classes))
            deltas.append(self._flatten(self.bbox_pred(b), 4))
            if self.compute_cls_var:
                logit_vars.append(
                    self._flatten(self.cls_var(c), self.num_classes)
                )
            if self.compute_bbox_cov:
                cov_params.append(
                    self._flatten(self.bbox_cov(b), self.bbox_cov_dims)
                )
        as_f32 = lambda xs: jnp.concatenate(xs, axis=1).astype(jnp.float32)
        return {
            "box_cls": as_f32(logits),
            "box_delta": as_f32(deltas),
            "box_cls_var": as_f32(logit_vars) if logit_vars else None,
            "box_reg_var": as_f32(cov_params) if cov_params else None,
        }

    def __call__(
        self,
        features: Sequence[jnp.ndarray],
        deterministic: bool = True,
        mask_shared_batch: bool = False,
    ) -> Dict[str, Optional[jnp.ndarray]]:
        cls_tower = self._tower("cls_subnet")
        box_tower = self._tower("bbox_subnet")
        use_dropout = self.dropout_rate > 0.0 and not deterministic
        masks = (
            self._all_masks(features, mask_shared_batch) if use_dropout else None
        )
        logits, deltas, logit_vars, cov_params = [], [], [], []
        for li, f in enumerate(features):
            c = self._run_tower(
                cls_tower, f, deterministic,
                mask_shared_batch=mask_shared_batch,
                masks=None if masks is None else masks[li][0],
            )
            b = self._run_tower(
                box_tower, f, deterministic,
                mask_shared_batch=mask_shared_batch,
                masks=None if masks is None else masks[li][1],
            )
            logits.append(self._flatten(self.cls_score(c), self.num_classes))
            deltas.append(self._flatten(self.bbox_pred(b), 4))
            if self.compute_cls_var:
                logit_vars.append(
                    self._flatten(self.cls_var(c), self.num_classes)
                )
            if self.compute_bbox_cov:
                cov_params.append(
                    self._flatten(self.bbox_cov(b), self.bbox_cov_dims)
                )
        as_f32 = lambda xs: jnp.concatenate(xs, axis=1).astype(jnp.float32)
        return {
            "box_cls": as_f32(logits),
            "box_delta": as_f32(deltas),
            "box_cls_var": as_f32(logit_vars) if logit_vars else None,
            "box_reg_var": as_f32(cov_params) if cov_params else None,
        }

    def prefix(self, features: Sequence[jnp.ndarray]):
        """Shared first tower convs: relu(conv0(f)) per level for both
        towers. Runs of an MC-dropout bank only diverge at the first
        dropout, so this is computed once per image — exact semantics, 25%
        of the tower FLOPs saved vs replicating whole head passes (the
        reference replicates feature lists xN,
        probabilistic_retinanet.py:104-108)."""
        cls_tower = self._tower("cls_subnet")
        box_tower = self._tower("bbox_subnet")
        cls_prefix = [nn.relu(cls_tower[0](f)) for f in features]
        box_prefix = [nn.relu(box_tower[0](f)) for f in features]
        return cls_prefix, box_prefix

    def rest(
        self,
        prefix_pair,
        deterministic: bool = False,
        mask_shared_batch: bool = False,
    ):
        """Per-run remainder: dropout + convs 1..n + output convs. vmap
        this over dropout keys for the MC bank."""
        cls_prefix, box_prefix = prefix_pair
        cls_tower = self._tower("cls_subnet")
        box_tower = self._tower("bbox_subnet")
        use_dropout = self.dropout_rate > 0.0 and not deterministic
        masks = (
            self._all_masks(cls_prefix, mask_shared_batch)
            if use_dropout else None
        )
        cls_feats = [
            self._run_tower(
                cls_tower, p, deterministic, skip_first=True,
                mask_shared_batch=mask_shared_batch,
                masks=None if masks is None else masks[li][0],
            )
            for li, p in enumerate(cls_prefix)
        ]
        box_feats = [
            self._run_tower(
                box_tower, p, deterministic, skip_first=True,
                mask_shared_batch=mask_shared_batch,
                masks=None if masks is None else masks[li][1],
            )
            for li, p in enumerate(box_prefix)
        ]
        return self._outputs(cls_feats, box_feats)


class ProbabilisticRetinaNet(nn.Module):
    """Full detector: normalize → R50 → FPN → probabilistic head.

    Exposes `backbone` and `forward_head` methods so probabilistic
    inference can run the backbone once and vmap the stochastic head
    (reference forward modes: probabilistic_retinanet.py:67-166).
    """

    num_classes: int
    num_anchors: int = 9
    depth: int = 50
    fpn_channels: int = 256
    num_convs: int = 4
    prior_prob: float = 0.01
    dropout_rate: float = 0.0
    dropout_impl: str = "bernoulli"
    compute_cls_var: bool = False
    compute_bbox_cov: bool = False
    bbox_cov_dims: int = 4
    head_quant: str = "none"
    freeze_at: int = 2
    pixel_mean: Tuple[float, ...] = (103.530, 116.280, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    dtype: Dtype = jnp.float32
    in_features: Sequence[str] = ("p3", "p4", "p5", "p6", "p7")

    def setup(self):
        self.resnet = ResNet(
            depth=self.depth,
            out_features=("res3", "res4", "res5"),
            freeze_at=self.freeze_at,
            dtype=self.dtype,
        )
        self.fpn = FPN(out_channels=self.fpn_channels, dtype=self.dtype)
        self.head = ProbabilisticRetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=self.num_anchors,
            num_convs=self.num_convs,
            prior_prob=self.prior_prob,
            dropout_rate=self.dropout_rate,
            dropout_impl=self.dropout_impl,
            compute_cls_var=self.compute_cls_var,
            compute_bbox_cov=self.compute_bbox_cov,
            bbox_cov_dims=self.bbox_cov_dims,
            channels=self.fpn_channels,
            head_quant=self.head_quant,
            dtype=self.dtype,
        )

    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, 3) raw-pixel images (BGR by config) → normalized, fused
        into the graph (reference preprocesses on host:
        probabilistic_retinanet.py:96). Accepts uint8 input — the loader
        ships uint8 canvases (4x less host->device traffic) and the cast
        happens here, on device."""
        images = images.astype(jnp.float32)
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        return (images - mean) / std

    def backbone(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        feats = self.fpn(self.resnet(self.normalize(images)))
        return [feats[f] for f in self.in_features]

    def forward_head(
        self,
        features: Sequence[jnp.ndarray],
        deterministic: bool = True,
        mask_shared_batch: bool = False,
    ) -> Dict[str, Optional[jnp.ndarray]]:
        return self.head(
            features,
            deterministic=deterministic,
            mask_shared_batch=mask_shared_batch,
        )

    def head_prefix(self, features: Sequence[jnp.ndarray]):
        """Shared MC prefix (see ProbabilisticRetinaNetHead.prefix)."""
        return self.head.prefix(features)

    def forward_head_rest(
        self,
        prefix_pair,
        deterministic: bool = False,
        mask_shared_batch: bool = False,
    ):
        """Per-run MC remainder (vmap over dropout keys)."""
        return self.head.rest(prefix_pair, deterministic, mask_shared_batch)

    def __call__(
        self,
        images: jnp.ndarray,
        deterministic: bool = True,
        mask_shared_batch: bool = False,
    ) -> Dict[str, Optional[jnp.ndarray]]:
        """Raw anchorwise output (the reference's
        `produce_raw_output`/training forward combined).

        `mask_shared_batch`: train-time analog of the MC bank's
        BATCH_SHARED_MASKS (MODEL.PROBABILISTIC_MODELING
        .DROPOUT_SHARED_BATCH_TRAIN) — per-image dropout law unchanged,
        batch-size-times fewer mask bits."""
        return self.forward_head(
            self.backbone(images), deterministic,
            mask_shared_batch=mask_shared_batch,
        )


def build_model(cfg, head_quant: str = "none") -> ProbabilisticRetinaNet:
    """Construct the flagship model from a config node
    (reference: build_model via META_ARCH_REGISTRY, train_net.py:79).

    `head_quant` is passed explicitly by the inference predictor
    (PROBABILISTIC_INFERENCE.HEAD_QUANT) rather than read from cfg so the
    training path can never silently build a quantized model."""
    pm = cfg.MODEL.PROBABILISTIC_MODELING
    compute_cls_var = pm.CLS_VAR_LOSS.NAME != "none"
    compute_bbox_cov = pm.BBOX_COV_LOSS.NAME != "none"
    bbox_cov_dims = 4 if pm.BBOX_COV_LOSS.COVARIANCE_TYPE == "diagonal" else 10
    num_anchors = len(cfg.MODEL.ANCHOR_GENERATOR.SIZES[0]) * len(
        cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]
    )
    dtype = jnp.bfloat16 if cfg.PARALLEL.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return ProbabilisticRetinaNet(
        num_classes=cfg.MODEL.RETINANET.NUM_CLASSES,
        num_anchors=num_anchors,
        depth=cfg.MODEL.RESNETS.DEPTH,
        fpn_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        num_convs=cfg.MODEL.RETINANET.NUM_CONVS,
        prior_prob=cfg.MODEL.RETINANET.PRIOR_PROB,
        dropout_rate=pm.DROPOUT_RATE,
        dropout_impl=pm.DROPOUT_IMPL,
        compute_cls_var=compute_cls_var,
        compute_bbox_cov=compute_bbox_cov,
        bbox_cov_dims=bbox_cov_dims,
        head_quant=head_quant,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=dtype,
        in_features=tuple(cfg.MODEL.RETINANET.IN_FEATURES),
    )


def build_anchor_generator(cfg) -> AnchorGenerator:
    strides = [FPN_STRIDES[f] for f in cfg.MODEL.RETINANET.IN_FEATURES]
    return AnchorGenerator.from_config(cfg, strides)


def init_model_params(model: ProbabilisticRetinaNet, image_size, seed: int = 0):
    """Initialize parameters for a static input resolution."""
    rng = jax.random.PRNGKey(seed)
    images = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
    return model.init({"params": rng}, images, True)["params"]


def num_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
