"""Default configuration tree.

Key names deliberately mirror the reference's detectron2/yacs namespace so
that its YAML configs port unchanged (reference: src/core/setup.py:79-133 for
the probabilistic keys; detectron2 defaults for the rest — only the subset the
reference actually exercises is kept).
"""

import math

from pod_compare_tpu.config.node import ConfigNode


def anchor_sizes(min_size: int = 32, num_levels: int = 5, scales_per_octave: int = 3):
    """RetinaNet anchor sizes: 3 scales/octave over [32..512]
    (reference: src/configs/Base-RetinaNet.yaml:8)."""
    return [
        [min_size * 2 ** lvl * 2 ** (i / scales_per_octave) for i in range(scales_per_octave)]
        for lvl in range(num_levels)
    ]


def get_cfg() -> ConfigNode:
    _C = ConfigNode()
    _C.VERSION = 2
    _C.OUTPUT_DIR = "./output"
    _C.SEED = -1
    # Set by evaluation CLIs when testing on a different dataset than training
    # (reference: compute_probabilistic_metrics.py:32).
    _C.ACTUAL_TEST_DATASET = ""

    # ------------------------------------------------------------------ MODEL
    _C.MODEL = ConfigNode()
    _C.MODEL.META_ARCHITECTURE = "ProbabilisticRetinaNet"
    _C.MODEL.WEIGHTS = ""
    _C.MODEL.DEVICE = "tpu"
    # BGR means/stds, matching detectron2's caffe-style R-50 preprocessing.
    _C.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    _C.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]

    _C.MODEL.BACKBONE = ConfigNode()
    _C.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    _C.MODEL.BACKBONE.FREEZE_AT = 2

    _C.MODEL.RESNETS = ConfigNode()
    _C.MODEL.RESNETS.DEPTH = 50
    _C.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    _C.MODEL.RESNETS.NORM = "FrozenBN"
    _C.MODEL.RESNETS.STRIDE_IN_1X1 = True
    _C.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
    _C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64

    _C.MODEL.FPN = ConfigNode()
    _C.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    _C.MODEL.FPN.OUT_CHANNELS = 256

    _C.MODEL.ANCHOR_GENERATOR = ConfigNode()
    _C.MODEL.ANCHOR_GENERATOR.SIZES = anchor_sizes()
    _C.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    _C.MODEL.ANCHOR_GENERATOR.OFFSET = 0.0

    _C.MODEL.RETINANET = ConfigNode()
    _C.MODEL.RETINANET.NUM_CLASSES = 80
    _C.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    _C.MODEL.RETINANET.NUM_CONVS = 4
    _C.MODEL.RETINANET.IOU_THRESHOLDS = [0.4, 0.5]
    _C.MODEL.RETINANET.IOU_LABELS = [0, -1, 1]
    _C.MODEL.RETINANET.PRIOR_PROB = 0.01
    _C.MODEL.RETINANET.SCORE_THRESH_TEST = 0.05
    _C.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 1000
    _C.MODEL.RETINANET.NMS_THRESH_TEST = 0.5
    _C.MODEL.RETINANET.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    _C.MODEL.RETINANET.FOCAL_LOSS_GAMMA = 2.0
    _C.MODEL.RETINANET.FOCAL_LOSS_ALPHA = 0.25
    _C.MODEL.RETINANET.SMOOTH_L1_LOSS_BETA = 0.1
    # EMA normalizer for losses (detectron2 RetinaNet semantics).
    _C.MODEL.RETINANET.LOSS_NORMALIZER_MOMENTUM = 0.9

    # Kept for API parity with the reference's RPN-sourced sample transform
    # (reference: probabilistic_inference.py:175-176).
    _C.MODEL.RPN = ConfigNode()
    _C.MODEL.RPN.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0)

    # Probabilistic modeling (reference: src/core/setup.py:89-107).
    _C.MODEL.PROBABILISTIC_MODELING = ConfigNode()
    _C.MODEL.PROBABILISTIC_MODELING.ANNEALING_STEP = 0
    _C.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.0
    # dropout implementation: 'auto' (measured-fastest per context —
    # hardware-PRNG pallas replay kernel for per-sample TRAINING masks on
    # TPU [+5% step throughput at batch 16, DESIGN.md §5b], fused threefry
    # for batch-shared masks / the MC inference bank, bernoulli off-TPU),
    # or pin one of: 'bernoulli' (threefry), 'packed2'/'packed4', 'rbg'
    # (XLA RngBitGenerator), 'pallas'. Identical Bernoulli(1-rate) law in
    # every mode (up to threshold quantization 2^-16/2^-8/2^-32);
    # only the PRNG stream differs.
    _C.MODEL.PROBABILISTIC_MODELING.DROPOUT_IMPL = "auto"
    # TPU-native throughput option (default False = reference-exact iid):
    # share TRAINING dropout masks across the batch axis, like the MC
    # inference bank's PROBABILISTIC_INFERENCE.MC_DROPOUT
    # .BATCH_SHARED_MASKS. Per-image forward law identical (every
    # activation still dropped with rate p); gradient estimator unbiased;
    # only cross-image correlation within one step changes. Cuts mask RNG
    # + HBM traffic by the batch size (measured in DESIGN.md §5b).
    _C.MODEL.PROBABILISTIC_MODELING.DROPOUT_SHARED_BATCH_TRAIN = False
    _C.MODEL.PROBABILISTIC_MODELING.MC_DROPOUT = ConfigNode()
    _C.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS = ConfigNode()
    _C.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "none"
    _C.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 3
    # TPU-native throughput option (default False = reference-exact iid):
    # share the loss-attenuation sample bank across the batch axis. The
    # per-image loss law is IDENTICAL (each anchor/class still sees
    # num_samples iid draws from its own logit Gaussian) and the gradient
    # estimator stays unbiased — only the Monte-Carlo error becomes
    # correlated across the images of one step. Cuts the bank's RNG bits
    # by the batch size (measured in DESIGN.md §5b).
    _C.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.SHARED_BATCH_SAMPLES = False
    # Sample-bank backend: 'threefry' (jax.random inside the XLA graph) or
    # 'pallas' (fused TPU kernel — hardware PRNG, Box-Muller, focal fwd +
    # analytic gradients in one VMEM pass; ops/pallas/focal.py). Identical
    # per-element law (iid N(logit, exp(log_var)) samples); different
    # stream. Falls back to threefry off-TPU. 'pallas' is a MEASURED
    # NEGATIVE RESULT on v5e (63.2 vs 83.5 img/s at batch 16 — it must
    # materialize loss+gradient planes the fused threefry bank never
    # writes to HBM; DESIGN.md §5b) — kept opt-in as documentation.
    _C.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.IMPL = "threefry"
    _C.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS = ConfigNode()
    _C.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "none"
    _C.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.COVARIANCE_TYPE = "diagonal"
    _C.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES = 1000

    # ------------------------------------------------- PROBABILISTIC_INFERENCE
    # (reference: src/core/setup.py:109-133)
    _C.PROBABILISTIC_INFERENCE = ConfigNode()
    _C.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "standard_nms"
    _C.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.7
    # Monte-Carlo implementation of the two sampling stages of the
    # candidate core (inference/core.py):
    #   'mc_iid'    exact reference semantics (iid sample banks)
    #   'mc_shared' sample bank shared across anchors/candidates —
    #               identical per-candidate marginals, ~R× fewer
    #               random bits (threefry is ALU-bound on TPU)
    #   'analytic'  closed-form S→∞ moments (Gauss-Hermite sigmoid
    #               expectation / lognormal decode moments) — deterministic
    # Default 'analytic': the exact value both MC modes estimate, with no
    # sampling noise and no RNG cost (v5e batch-16 candidate core: 76 ms
    # mc_iid / 34 ms mc_shared / 21 ms analytic). Metric parity vs the
    # reference's sampled pipeline is asserted in-band for all three
    # (tests/test_pipeline_parity.py).
    _C.PROBABILISTIC_INFERENCE.CLS_SAMPLING = "analytic"
    _C.PROBABILISTIC_INFERENCE.BOX_SAMPLING = "analytic"
    # Compile the MC-dropout/ensembles pipeline as TWO sequential XLA
    # programs (head bank | sampling core+fusion) instead of one.
    # Bit-identical outputs (same ops, same keys, same order; pinned by
    # tests/test_split_program.py). This is the validated workaround for
    # the v5e mc_iid runtime fault (DESIGN.md §5d): the fused mc_iid
    # program crashes the worker at batch 17-20 while the split form runs
    # b20/b24 clean — at ~10% steady-state cost (32.1 vs 35.8 img/s at
    # b16), so the default stays fused with the b16 guard. Only
    # meaningful for multi-run pre-NMS modes (the faulting family).
    _C.PROBABILISTIC_INFERENCE.SPLIT_HEAD_PROGRAM = False
    # Int8-quantized head-tower evaluation at inference ('none' | 'int8').
    # Exceeds the reference (no quantized path there): per-channel int8
    # weights + dynamic per-image activation scales, int32 MXU
    # accumulation (ops/quant.py). Output convs stay full-precision. A
    # serving knob — default off; accuracy deltas are measured, not zero.
    _C.PROBABILISTIC_INFERENCE.HEAD_QUANT = "none"
    _C.PROBABILISTIC_INFERENCE.MC_DROPOUT = ConfigNode()
    _C.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = False
    _C.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 1
    # Share each MC run's dropout mask across the inference batch (B×
    # fewer threefry bits; every image's marginal output law is unchanged
    # — masks are iid per element within an image either way, and the
    # reference runs batch=1 so cross-image correlation has no reference
    # semantics to preserve). Training always uses per-sample masks.
    _C.PROBABILISTIC_INFERENCE.MC_DROPOUT.BATCH_SHARED_MASKS = True
    _C.PROBABILISTIC_INFERENCE.BAYES_OD = ConfigNode()
    _C.PROBABILISTIC_INFERENCE.BAYES_OD.BOX_MERGE_MODE = "bayesian_inference"
    _C.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE = "bayesian_inference"
    _C.PROBABILISTIC_INFERENCE.BAYES_OD.DIRCH_PRIOR = "uniform"
    _C.PROBABILISTIC_INFERENCE.ENSEMBLES_DROPOUT = ConfigNode()
    _C.PROBABILISTIC_INFERENCE.ENSEMBLES_DROPOUT.BOX_MERGE_MODE = "pre_nms"
    _C.PROBABILISTIC_INFERENCE.ENSEMBLES = ConfigNode()
    _C.PROBABILISTIC_INFERENCE.ENSEMBLES.BOX_MERGE_MODE = "pre_nms"
    _C.PROBABILISTIC_INFERENCE.ENSEMBLES.RANDOM_SEED_NUMS = [0, 1000, 2000, 3000, 4000]

    # ----------------------------------------------------------------- SOLVER
    _C.SOLVER = ConfigNode()
    _C.SOLVER.IMS_PER_BATCH = 16
    _C.SOLVER.BASE_LR = 0.01
    _C.SOLVER.MOMENTUM = 0.9
    _C.SOLVER.WEIGHT_DECAY = 1e-4
    _C.SOLVER.GAMMA = 0.1
    _C.SOLVER.STEPS = (60000, 80000)
    _C.SOLVER.MAX_ITER = 90000
    _C.SOLVER.WARMUP_FACTOR = 1.0 / 1000
    _C.SOLVER.WARMUP_ITERS = 1000
    _C.SOLVER.CHECKPOINT_PERIOD = 5000
    _C.SOLVER.CLIP_GRADIENTS = ConfigNode()
    _C.SOLVER.CLIP_GRADIENTS.ENABLED = False
    _C.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    # 'value' (elementwise, detectron2 default) or 'norm' (global L2 norm;
    # detectron2 clips per-parameter-group, here the whole tree — the only
    # grouping the reference's single param group produces anyway).
    _C.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "value"

    # ------------------------------------------------------------------ INPUT
    _C.INPUT = ConfigNode()
    _C.INPUT.MIN_SIZE_TRAIN = (800,)
    _C.INPUT.MAX_SIZE_TRAIN = 1333
    _C.INPUT.MIN_SIZE_TEST = 800
    _C.INPUT.MAX_SIZE_TEST = 1333
    _C.INPUT.FORMAT = "BGR"
    _C.INPUT.RANDOM_FLIP = "horizontal"
    # TPU-specific: static padded shape multiple (XLA needs fixed shapes).
    _C.INPUT.SIZE_DIVISIBILITY = 32
    # TPU-specific: static per-image ground-truth slot count.
    _C.INPUT.MAX_GT_BOXES = 100

    # --------------------------------------------------------------- DATASETS
    _C.DATASETS = ConfigNode()
    _C.DATASETS.TRAIN = ("bdd_train",)
    _C.DATASETS.TEST = ("bdd_val",)

    _C.DATALOADER = ConfigNode()
    _C.DATALOADER.NUM_WORKERS = 4
    # 'thread' (cv2 releases the GIL during imread/resize) or 'process'
    # (true multi-core decode — the analog of the reference's 32 torch
    # dataloader worker PROCESSES, apply_net.py:33-34; needed when one
    # host must feed >~40 img/s of 720p decode, DESIGN.md §5).
    _C.DATALOADER.WORKER_BACKEND = "thread"
    # Double-buffered host->device transfer (DevicePrefetcher): batch i+1
    # copies while batch i computes. Right on real TPU hosts (PCIe DMA,
    # transfer wait releases the GIL); measured HARMFUL through a remote
    # device tunnel, where the background copy RPCs contend with dispatch
    # RPCs (tools/bench_loader_e2e.py round 5: overlap 18.2 vs 16.9 img/s
    # on the thread-loader leg but 4.3 vs 11.3 on the pre-decoded leg).
    # Set False when the device is tunneled.
    _C.DATALOADER.H2D_OVERLAP = True

    # ------------------------------------------------------------------- TEST
    _C.TEST = ConfigNode()
    _C.TEST.DETECTIONS_PER_IMAGE = 100
    _C.TEST.EVAL_PERIOD = 0
    # Optional [[metric_key, expected, tolerance], ...] verified by the
    # eval-only path (detectron2 verify_results semantics; unset in the
    # reference's configs).
    _C.TEST.EXPECTED_RESULTS = []

    # ----------------------------------------------------------- TPU/PARALLEL
    # TPU-native additions (no reference equivalent; detectron2 `launch` is
    # replaced by a jax device mesh, SURVEY.md §2.4).
    _C.PARALLEL = ConfigNode()
    _C.PARALLEL.DATA_AXIS = "data"
    # Number of devices along the data axis; -1 = all local devices.
    _C.PARALLEL.NUM_DEVICES = -1
    # bfloat16 compute for backbone/head convs (MXU-native).
    _C.PARALLEL.COMPUTE_DTYPE = "bfloat16"
    # Rematerialize the forward under grad (jax.checkpoint): trades ~1/3
    # more FLOPs for a large activation-memory reduction, enabling bigger
    # per-chip batches.
    _C.PARALLEL.REMAT = False

    return _C


def add_probabilistic_config(cfg: ConfigNode) -> ConfigNode:
    """No-op kept for reference API parity (reference: setup.py:79-133); the
    probabilistic namespaces are part of the defaults here."""
    return cfg


def prior_logit_bias(prior_prob: float) -> float:
    """Classification-head bias init from a prior probability
    (reference: probabilistic_retinanet.py:453-455)."""
    return -math.log((1.0 - prior_prob) / prior_prob)
