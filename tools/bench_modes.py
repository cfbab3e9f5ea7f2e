"""Per-mode inference throughput benchmark (BDD geometry, real TPU).

Reproduces the per-mode steady-state table in STATUS.md/DESIGN.md §5 and
writes a per-round artifact `bench_modes_rNN.json` (mode -> img/s +
per-trial rates + git sha) so round-over-round regressions are tracked
instead of rediscovered from README diffs (VERDICT r3 weak #3):

    python tools/bench_modes.py [--batch 16] [--trials 3]
        [--round N] [--modes standard_nms,bayes_od]

When a previous round's artifact exists the tool prints the delta per
mode next to the fresh number. Each mode compiles its own XLA program;
the first timed trial after a compile runs slow on the remote tunnel, so
per-mode numbers report the LAST trial (steady state) and the artifact
keeps every trial for variance analysis.
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git_sha():
    try:
        return subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        return "unknown"


def _prev_artifact(this_round):
    best = None
    for path in glob.glob(os.path.join(REPO, "bench_modes_r*.json")):
        m = re.search(r"bench_modes_r(\d+)\.json$", path)
        if m and int(m.group(1)) < this_round:
            if best is None or int(m.group(1)) > best[0]:
                best = (int(m.group(1)), path)
    if best is None:
        return None, None
    with open(best[1]) as f:
        return best[0], json.load(f)


def _next_round():
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def main(batch: int, trials: int, this_round: int, only=None,
         canvas=(736, 1280)):
    import jax
    import jax.numpy as jnp

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.inference.predictor import build_predictor
    from pod_compare_tpu.models import build_model, init_model_params
    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    def base_cfg():
        cfg = get_cfg()
        cfg.MODEL.RETINANET.NUM_CLASSES = 7
        cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
        cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
        cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
        cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = (
            "negative_log_likelihood"
        )
        cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.9
        return cfg

    model = build_model(base_cfg())
    params = init_model_params(model, canvas, seed=0)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, *canvas, 3) * 255, jnp.float32)
    sizes = np.tile(np.array([720.0, 1280.0], np.float32), (batch, 1))

    prev_round, prev = _prev_artifact(this_round)
    results = {}

    def measure(name, cfg, params_list=None):
        if only and name.split(" ")[0] not in only and name not in only:
            return
        pred = build_predictor(
            cfg, canvas, params=None if params_list else params,
            params_list=params_list,
        )
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        d = pred(images, sizes, sizes, key)
        _ = np.asarray(d.boxes)
        compile_s = round(time.time() - t0, 1)
        rates = []
        for _trial in range(trials):
            t0 = time.time()
            iters = 5
            for _ in range(iters):
                key, sub = jax.random.split(key)
                d = pred(images, sizes, sizes, sub)
            _ = np.asarray(d.boxes)
            rates.append(round(batch * iters / (time.time() - t0), 2))
        rate = rates[-1]
        delta = ""
        if prev and name in prev.get("modes", {}):
            old = prev["modes"][name]["img_per_s"]
            delta = f"  (r{prev_round}: {old:.1f}, {rate - old:+.1f})"
        print(f"{name}: {rate:.1f} img/s (steady state; trials {rates})"
              f"{delta}", flush=True)
        results[name] = {
            "img_per_s": rate,
            "trials": rates,
            "compile_s": compile_s,
            "batch": batch,
            "sampling": cfg.PROBABILISTIC_INFERENCE.CLS_SAMPLING,
        }

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "standard_nms"
    measure("standard_nms", cfg)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "anchor_statistics"
    measure("anchor_statistics", cfg)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "bayes_od"
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 10
    cfg.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE = "max_score"
    measure("bayes_od + mc_dropout(10)", cfg)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "mc_dropout_ensembles"
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 10
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES_DROPOUT.BOX_MERGE_MODE = "post_nms"
    measure("mc_dropout post_nms(10)", cfg)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "ensembles"
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.BOX_MERGE_MODE = "pre_nms"
    measure("ensembles pre_nms(5)", cfg, params_list=[params] * 5)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "ensembles"
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.BOX_MERGE_MODE = "post_nms"
    measure("ensembles post_nms(5)", cfg, params_list=[params] * 5)

    artifact = {
        "round": this_round,
        "git_sha": _git_sha(),
        "batch": batch,
        "trials": trials,
        "canvas": list(canvas),
        "modes": results,
    }
    if only:
        # Partial (bisect) runs merge into the existing round artifact so
        # a full table is never clobbered by a single-mode rerun.
        path = os.path.join(REPO, f"bench_modes_r{this_round:02d}.json")
        if os.path.exists(path):
            with open(path) as f:
                old = json.load(f)
            old["modes"].update(results)
            old["git_sha"] = artifact["git_sha"]
            artifact = old
    path = os.path.join(REPO, f"bench_modes_r{this_round:02d}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--trials", type=int, default=3)
    parser.add_argument("--round", type=int, default=None,
                        help="round number for the artifact name "
                             "(default: max BENCH_rNN + 1)")
    parser.add_argument("--modes", type=str, default=None,
                        help="comma-separated mode-name filter (prefix "
                             "before the first space also matches)")
    args = parser.parse_args()
    only = set(args.modes.split(",")) if args.modes else None
    main(args.batch, args.trials, args.round or _next_round(), only)
