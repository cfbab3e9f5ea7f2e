"""Orbax checkpointing with the reference's directory-layout semantics.

TPU-native replacement for detectron2's DetectionCheckpointer
(reference: train_net.py:9,70-72; probabilistic_inference.py:72-84):
  * periodic saves under OUTPUT_DIR (CHECKPOINT_PERIOD=30000,
    Base-RetinaNet.yaml:15-16)
  * resume-from-latest
  * ensemble member discovery from sibling `random_seed_<seed>` directories
    (probabilistic_inference.py:59-77 — that layout is API surface)

Saves are asynchronous (orbax async checkpointer) so the train loop never
blocks on serialization — a cheap improvement over the reference's
synchronous torch.save (SURVEY.md §5.3).
"""

import os
from typing import Any, List, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Save/restore train state pytrees under `<output_dir>/checkpoints`."""

    def __init__(self, output_dir: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.directory, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._manager.save(step, args=ocp.args.StandardSave(state), force=force)

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def restore(
        self, state_template: Any = None, step: Optional[int] = None
    ) -> Any:
        """Restore a checkpoint.

        With `state_template`, values are restored with its shapes/dtypes/
        shardings; without, the raw pytree is returned as host arrays (used
        by inference, which only needs `params`).
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {self.directory}")
        if state_template is None:
            return self._manager.restore(
                step, args=ocp.args.StandardRestore()
            )
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, state_template
        )
        return self._manager.restore(step, args=ocp.args.StandardRestore(abstract))

    def has_checkpoint(self) -> bool:
        return self.latest_step() is not None

    def wait(self) -> None:
        self._manager.wait_until_finished()

    def close(self) -> None:
        self._manager.close()


def resume_or_load(
    checkpointer: Checkpointer, state_template: Any, resume: bool
):
    """detectron2 resume_or_load semantics: with resume=True and an existing
    checkpoint, restore the full state; otherwise return the template
    (already initialized from WEIGHTS by the caller)."""
    if resume and checkpointer.has_checkpoint():
        return checkpointer.restore(state_template), True
    return state_template, False


def sibling_seed_dir(output_dir: str, seed: int) -> str:
    """data/<ds>/<model>/<config>/random_seed_<seed> sibling path."""
    return os.path.join(os.path.dirname(output_dir), f"random_seed_{seed}")


def load_ensemble_params(
    output_dir: str, seeds: List[int], params_template: Any
) -> List[Any]:
    """Load the latest params of each sibling-seed member
    (reference: probabilistic_inference.py:59-77)."""
    members = []
    for seed in seeds:
        members.append(load_params(sibling_seed_dir(output_dir, seed)))
    return members


def load_params(output_dir: str, params_template: Any = None) -> Any:
    """Load the latest params saved under `output_dir`."""
    ckpt = Checkpointer(output_dir)
    try:
        state = ckpt.restore()
    finally:
        ckpt.close()
    return state["params"]
