"""Cross-validate the first-party COCO mAP engines against pycocotools.

The reference's official mAP comes from pycocotools' C COCOeval
(/root/reference/src/offline_evaluation/compute_average_precision.py:9-10,
35-44). This repo ships two first-party engines (numpy + C++,
pod_compare_tpu/evaluation/coco_eval.py) validated against each other and
hand-derived golden fixtures — but pycocotools itself is not installed in
the build sandbox. Run this script on ANY machine that has pycocotools to
close the loop:

    pip install pycocotools
    python tools/crosscheck_pycocotools.py

It feeds the canned GT/detection fixture pairs under
tests/fixtures/cocoeval/ through
  (a) the numpy engine,
  (b) the C++ engine (skipped if the native lib isn't built), and
  (c) pycocotools.COCOeval('bbox')
and asserts all 12 standard stats agree to 1e-6. Without pycocotools it
still cross-checks (a) vs (b) and prints how to finish the check.

    python tools/crosscheck_pycocotools.py --regen   # rebuild fixtures

Fixtures cover: multi-category scenes, crowd GT (iscrowd IoU semantics),
explicitly ignored GT, unmatched detections (FPs), undetected GT (FNs),
area-range boundaries, and score ties.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "cocoeval",
)
FIXTURES = ["dense_multiclass", "crowd_and_ignore", "sparse_small_objects"]


def _make_fixture(name: str):
    """Deterministic synthetic GT + detections exercising COCOeval edge
    cases. Returns (gt_dict, detections_list)."""
    rng = np.random.RandomState(
        {"dense_multiclass": 0, "crowd_and_ignore": 1,
         "sparse_small_objects": 2}[name]
    )
    num_images = {"dense_multiclass": 8, "crowd_and_ignore": 6,
                  "sparse_small_objects": 10}[name]
    cats = [1, 2, 3]
    images = [
        {"id": i + 1, "width": 640, "height": 480} for i in range(num_images)
    ]
    anns, dets = [], []
    ann_id = 1
    for im in images:
        n_gt = rng.randint(1, 7)
        for _ in range(n_gt):
            if name == "sparse_small_objects" and rng.rand() < 0.6:
                w, h = rng.uniform(4, 18, 2)  # below the 32^2 small cutoff
            else:
                w, h = rng.uniform(16, 160, 2)
            x = rng.uniform(0, 640 - w)
            y = rng.uniform(0, 480 - h)
            cat = int(rng.choice(cats))
            iscrowd = int(name == "crowd_and_ignore" and rng.rand() < 0.2)
            ignore = int(name == "crowd_and_ignore" and rng.rand() < 0.15)
            anns.append({
                "id": ann_id, "image_id": im["id"], "category_id": cat,
                "bbox": [round(float(v), 2) for v in (x, y, w, h)],
                "area": round(float(w * h), 2),
                "iscrowd": iscrowd, "ignore": ignore,
            })
            ann_id += 1
            # matched detection with jitter (sometimes missing -> FN)
            if rng.rand() < 0.85:
                jit = rng.normal(0, 3, 4)
                score = float(np.round(rng.uniform(0.2, 0.99), 3))
                # occasional duplicated score to exercise tie-breaking
                if rng.rand() < 0.2:
                    score = 0.5
                dets.append({
                    "image_id": im["id"],
                    "category_id": cat if rng.rand() > 0.1
                    else int(rng.choice(cats)),
                    "bbox": [
                        round(float(v), 2)
                        for v in (x + jit[0], y + jit[1],
                                  max(4.0, w + jit[2]), max(4.0, h + jit[3]))
                    ],
                    "score": score,
                })
        # pure false positives
        for _ in range(rng.randint(0, 3)):
            w, h = rng.uniform(10, 80, 2)
            dets.append({
                "image_id": im["id"],
                "category_id": int(rng.choice(cats)),
                "bbox": [
                    round(float(v), 2)
                    for v in (rng.uniform(0, 640 - w), rng.uniform(0, 480 - h),
                              w, h)
                ],
                "score": float(np.round(rng.uniform(0.05, 0.9), 3)),
            })
    gt = {
        "images": images,
        "annotations": anns,
        "categories": [{"id": c, "name": f"cat{c}"} for c in cats],
    }
    return gt, dets


def regen():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name in FIXTURES:
        gt, dets = _make_fixture(name)
        with open(os.path.join(FIXTURE_DIR, f"{name}_gt.json"), "w") as f:
            json.dump(gt, f)
        with open(os.path.join(FIXTURE_DIR, f"{name}_dt.json"), "w") as f:
            json.dump(dets, f)
        print(f"wrote {name}: {len(gt['annotations'])} GT, "
              f"{len(dets)} detections")


def _first_party_stats(gt, dets, use_native):
    from pod_compare_tpu.evaluation.coco_eval import COCOEvaluator

    ev = COCOEvaluator(gt, dets)
    return ev.run(verbose=False, use_native=use_native)


def _pycocotools_stats(gt, dets):
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    coco = COCO()
    coco.dataset = json.loads(json.dumps(gt))  # deep copy: createIndex mutates
    coco.createIndex()
    coco_dt = coco.loadRes(json.loads(json.dumps(dets)))
    ev = COCOeval(coco, coco_dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return np.asarray(ev.stats)


def main(regen_fixtures: bool, gt_path=None, dt_path=None):
    if regen_fixtures:
        regen()
        return 0
    try:
        import pycocotools  # noqa: F401
        have_pycoco = True
    except ImportError:
        have_pycoco = False

    from pod_compare_tpu import native

    have_native = native.available()
    rc = 0
    cases = list(FIXTURES)
    if gt_path is not None:
        cases.append("__user__")
    for name in cases:
        if name == "__user__":
            with open(gt_path) as f:
                gt = json.load(f)
            with open(dt_path) as f:
                dets = json.load(f)
        else:
            with open(os.path.join(FIXTURE_DIR, f"{name}_gt.json")) as f:
                gt = json.load(f)
            with open(os.path.join(FIXTURE_DIR, f"{name}_dt.json")) as f:
                dets = json.load(f)
        stats_np = _first_party_stats(gt, dets, use_native=False)
        print(f"[{name}] numpy engine:  {np.round(stats_np, 6).tolist()}")
        if have_native:
            stats_cc = _first_party_stats(gt, dets, use_native=True)
            if not np.allclose(stats_np, stats_cc, atol=1e-6):
                print(f"[{name}] FAIL numpy vs C++: {stats_cc - stats_np}")
                rc = 1
            else:
                print(f"[{name}] C++ engine matches numpy (1e-6)")
        if have_pycoco:
            stats_ref = _pycocotools_stats(gt, dets)
            if not np.allclose(stats_np, stats_ref, atol=1e-6):
                print(f"[{name}] FAIL vs pycocotools: "
                      f"{(stats_ref - stats_np).tolist()}")
                rc = 1
            else:
                print(f"[{name}] pycocotools matches (1e-6)")
    if not have_pycoco:
        print("\npycocotools not installed — numpy/C++ cross-check ran, but "
              "the authority check did not. On a machine with network "
              "access:\n    pip install pycocotools\n    python "
              "tools/crosscheck_pycocotools.py")
    if rc == 0:
        print("\nALL ENGINES AGREE")
    return rc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--regen", action="store_true",
                   help="regenerate the canned fixtures")
    p.add_argument("--gt", default=None,
                   help="additional COCO-format GT json to cross-check")
    p.add_argument("--dt", default=None,
                   help="detections json matching --gt")
    args = p.parse_args()
    if (args.gt is None) != (args.dt is None):
        p.error("--gt and --dt must be given together")
    sys.exit(main(args.regen, args.gt, args.dt))
