"""Golden regression test: the full candidate->fusion chain on fixed
synthetic inputs must stay bit-stable (threefry is deterministic across
platforms/versions; loosened tolerance covers backend fma differences)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pod_compare_tpu.inference import modes as M
from pod_compare_tpu.inference.core import probabilistic_inference_core

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "inference_core_v1.npz")


@pytest.mark.skipif(not os.path.isfile(GOLDEN), reason="golden missing")
def test_inference_chain_matches_golden():
    g = np.load(GOLDEN)
    cands = probabilistic_inference_core(
        jax.random.PRNGKey(7),
        jnp.asarray(g["inputs/anchors"]), jnp.asarray(g["inputs/cls"]),
        jnp.asarray(g["inputs/delta"]), jnp.asarray(g["inputs/cvar"]),
        jnp.asarray(g["inputs/rvar"]), None,
        topk=60, score_thresh=0.05, cls_num_samples=8, box_num_samples=64,
    )
    dets = {
        "nms": M.standard_nms(cands, 0.5, 15),
        "astat": M.anchor_statistics(cands, 0.5, 15, 0.7),
        "bayes": M.bayes_od(cands, 0.5, 15, 0.9, "bayesian_inference",
                            "max_score"),
    }
    for name, det in dets.items():
        valid = g[f"{name}/valid"]
        np.testing.assert_array_equal(np.asarray(det.valid), valid, err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(det.classes)[valid], g[f"{name}/classes"][valid],
            err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(det.boxes)[valid], g[f"{name}/boxes"][valid],
            rtol=1e-4, atol=1e-3, err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(det.scores)[valid], g[f"{name}/scores"][valid],
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(det.covs)[valid], g[f"{name}/covs"][valid],
            rtol=1e-3, atol=1e-3, err_msg=name,
        )
