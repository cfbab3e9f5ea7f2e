"""AOT serving export: freeze one inference pipeline into a portable artifact.

The reference has no deployment story beyond "run apply_net.py with the
training repo installed" (reference: apply_net.py:25-124 — rebuilds the
model, re-reads configs, and re-traces per run). A TPU-native framework
can do better: `jax.export` lowers the whole jitted pipeline (backbone →
stochastic head bank → candidate core → fusion → rescale) to versioned
StableHLO once, at export time, and the serving host needs only the
artifact — no configs, no model code, no Python model rebuild, and no
retrace. The same artifact can carry lowerings for several platforms
(e.g. ``("tpu", "cpu")``) so one file serves production TPU hosts and CPU
smoke environments.

Artifact layout (a directory):
    pipeline.stablehlo   serialized jax.export blob (versioned StableHLO)
    params.msgpack       flax-serialized parameter pytree
    manifest.json        metadata: mode, geometry, batch, platforms,
                         jax/export versions, config provenance

Use `pod_compare_tpu.cli.export_model` to produce one from a trained
checkpoint, and `load_artifact` to serve from it.
"""

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pod_compare_tpu.inference.core import Detections

_PIPELINE_FILE = "pipeline.stablehlo"
_PARAMS_FILE = "params.msgpack"
_MANIFEST_FILE = "manifest.json"


def _example_args(predictor, batch_size: int):
    """ShapeDtypeStructs matching the pipeline signature
    (params, images, rng, input_sizes, output_sizes)."""
    h, w = predictor.image_size
    params_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        predictor.params,
    )
    key = jax.random.PRNGKey(0)
    return (
        params_spec,
        jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct(key.shape, key.dtype),
        jax.ShapeDtypeStruct((batch_size, 2), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 2), jnp.float32),
    )


def export_predictor(predictor, batch_size: int,
                     platforms: Optional[Sequence[str]] = None):
    """Lower one predictor pipeline to a `jax.export.Exported`.

    The exported callable takes (params, images, rng, input_sizes,
    output_sizes) and returns the `Detections` fields as a plain tuple
    (namedtuple output trees are flattened so the artifact does not
    depend on this package's pytree registrations at load time).
    """
    from jax import export as jexport

    if predictor.mesh is not None:
        raise ValueError(
            "export_predictor lowers the single-host pipeline; build the "
            "predictor without a mesh (serving shards by replicating the "
            "artifact, not by partitioning one program)."
        )

    def serving_fn(params, images, rng, input_sizes, output_sizes):
        dets = predictor._fn(params, images, rng, input_sizes, output_sizes)
        return tuple(dets)

    kwargs = {}
    if platforms:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(serving_fn), **kwargs)(
        *_example_args(predictor, batch_size)
    )


def save_artifact(predictor, out_dir: str, batch_size: int,
                  platforms: Optional[Sequence[str]] = None,
                  extra_manifest: Optional[dict] = None) -> str:
    """Export `predictor` and write the serving artifact directory."""
    from flax import serialization

    exported = export_predictor(predictor, batch_size, platforms)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _PIPELINE_FILE), "wb") as f:
        f.write(exported.serialize())
    params_host = jax.tree_util.tree_map(np.asarray, predictor.params)
    with open(os.path.join(out_dir, _PARAMS_FILE), "wb") as f:
        f.write(serialization.to_bytes(params_host))

    cfg = predictor.cfg
    manifest = {
        "format": "pod_compare_tpu.serving/1",
        "inference_mode": predictor.mode,
        "image_size": list(predictor.image_size),
        "batch_size": int(batch_size),
        "platforms": list(exported.platforms),
        "num_members": int(predictor.num_members),
        "mc_runs": int(predictor.num_runs) if predictor.mc_enabled else 0,
        "detections_fields": list(Detections._fields),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        "num_params": int(
            sum(int(np.prod(np.shape(x)))
                for x in jax.tree_util.tree_leaves(predictor.params))
        ),
        "config": {
            "META_ARCHITECTURE": cfg.MODEL.META_ARCHITECTURE,
            "NUM_CLASSES": int(cfg.MODEL.RETINANET.NUM_CLASSES),
            "CLS_SAMPLING": cfg.PROBABILISTIC_INFERENCE.CLS_SAMPLING,
            "BOX_SAMPLING": cfg.PROBABILISTIC_INFERENCE.BOX_SAMPLING,
            "COVARIANCE_TYPE":
                cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.COVARIANCE_TYPE,
        },
    }
    if extra_manifest:
        manifest.update(extra_manifest)
    with open(os.path.join(out_dir, _MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


class ServingPredictor:
    """Runs inference from a saved artifact — no model code, no configs.

    The deserialized executable is AOT: the first call pays no retrace
    (XLA still finalizes the executable for the local device once).
    """

    def __init__(self, artifact_dir: str):
        from flax import serialization
        from jax import export as jexport

        with open(os.path.join(artifact_dir, _MANIFEST_FILE)) as f:
            self.manifest = json.load(f)
        if not str(self.manifest.get("format", "")).startswith(
            "pod_compare_tpu.serving/"
        ):
            raise ValueError(f"{artifact_dir} is not a serving artifact")
        with open(os.path.join(artifact_dir, _PIPELINE_FILE), "rb") as f:
            self._exported = jexport.deserialize(f.read())
        with open(os.path.join(artifact_dir, _PARAMS_FILE), "rb") as f:
            params_bytes = f.read()
        # msgpack restores the nested-dict tree directly; no template
        # module is needed (the tree structure is self-describing).
        self.params = serialization.msgpack_restore(params_bytes)
        self.batch_size = int(self.manifest["batch_size"])
        self.image_size = tuple(self.manifest["image_size"])
        self._call = jax.jit(self._exported.call)

    def __call__(self, images, input_sizes, output_sizes, rng=None) -> Detections:
        """Run the frozen pipeline on one padded batch (see
        `ProbabilisticPredictor.__call__` for the argument contract)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        out = self._call(
            self.params,
            jnp.asarray(images, jnp.float32),
            rng,
            jnp.asarray(input_sizes, jnp.float32),
            jnp.asarray(output_sizes, jnp.float32),
        )
        return Detections(*out)


def load_artifact(artifact_dir: str) -> ServingPredictor:
    """Load a serving artifact written by `save_artifact`."""
    return ServingPredictor(artifact_dir)
