"""COCO evaluator correctness on hand-checkable fixtures + full synthetic
dataset pipeline round trip (load → collate → format → evaluate)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from boxer_tpu.dataset.helper.coco_api import COCO
from boxer_tpu.evaluate.coco_eval import COCOEval, box_iou_xywh


def _gt_dataset():
    images = [{"id": 1, "height": 100, "width": 100, "file_name": "1.jpg"},
              {"id": 2, "height": 100, "width": 100, "file_name": "2.jpg"}]
    categories = [{"id": 1, "name": "a"}, {"id": 3, "name": "b"}]
    annotations = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "area": 400, "iscrowd": 0},
        {"id": 2, "image_id": 1, "category_id": 3, "bbox": [50, 50, 30, 30],
         "area": 900, "iscrowd": 0},
        {"id": 3, "image_id": 2, "category_id": 1, "bbox": [0, 0, 50, 50],
         "area": 2500, "iscrowd": 0},
    ]
    return {"images": images, "categories": categories,
            "annotations": annotations}


def test_perfect_predictions_ap1():
    coco = COCO(dataset=_gt_dataset())
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 3, "bbox": [50, 50, 30, 30], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [0, 0, 50, 50], "score": 0.95},
    ]
    ev = COCOEval(coco, "bbox")
    ev.evaluate(results)
    ev.accumulate()
    stats = ev.summarize()
    assert stats[0] == pytest.approx(1.0)  # AP
    assert stats[1] == pytest.approx(1.0)  # AP50
    assert stats[8] == pytest.approx(1.0)  # AR100


def test_no_predictions_ap0():
    coco = COCO(dataset=_gt_dataset())
    ev = COCOEval(coco, "bbox")
    ev.evaluate([])
    ev.accumulate()
    stats = ev.summarize()
    assert stats[0] == pytest.approx(0.0)


def test_half_precision_case():
    """One TP at IoU 1.0 and one FP with higher score for category 1:
    P at the TP = 0.5, so AP50 for that class = 101-pt interp of 0.5 over
    recall>=... -> 0.5 (precision 0.5 at all achieved recalls)."""
    coco = COCO(dataset=_gt_dataset())
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [70, 70, 20, 20], "score": 0.95},  # FP
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},   # TP
        {"image_id": 2, "category_id": 1, "bbox": [0, 0, 50, 50], "score": 0.9},     # TP
        {"image_id": 1, "category_id": 3, "bbox": [50, 50, 30, 30], "score": 0.8},   # TP
    ]
    ev = COCOEval(coco, "bbox")
    ev.evaluate(results)
    ev.accumulate()
    stats = ev.summarize()
    # cat1: precisions at recalls .5, 1.0 => after interp: max precision to the
    # right: rec .5 -> 2/3 (2 TPs of 3 dts), rec 1.0 -> 2/3; plus
    # monotonic fix -> p=2/3 at all recall pts; cat3: p=1
    assert stats[1] == pytest.approx((2 / 3 + 1.0) / 2, abs=1e-6)


def test_iou_crowd_semantics():
    dt = np.array([[0, 0, 10, 10]], np.float64)
    gt = np.array([[0, 0, 100, 100]], np.float64)
    iou = box_iou_xywh(dt, gt, np.array([1]))
    assert iou[0, 0] == pytest.approx(1.0)  # crowd: union = dt area
    iou = box_iou_xywh(dt, gt, np.array([0]))
    assert iou[0, 0] == pytest.approx(100.0 / 10000.0)


@pytest.fixture(scope="module")
def synthetic_coco_dir(tmp_path_factory):
    """Tiny on-disk COCO dataset with 4 images and box+polygon annotations."""
    root = tmp_path_factory.mktemp("coco")
    os.makedirs(root / "images", exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 5):
        h, w = 120 + img_id * 8, 160 + img_id * 4
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "images" / f"{img_id}.jpg")
        images.append({"id": img_id, "height": h, "width": w,
                       "file_name": f"{img_id}.jpg"})
        for _ in range(rng.randint(1, 4)):
            x = float(rng.randint(0, w // 2))
            y = float(rng.randint(0, h // 2))
            bw = float(rng.randint(16, w // 2))
            bh = float(rng.randint(16, h // 2))
            poly = [x, y, x + bw, y, x + bw, y + bh, x, y + bh]
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": int(rng.choice([1, 2, 5])),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
                "segmentation": [poly],
            })
            ann_id += 1
    categories = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"},
                  {"id": 5, "name": "c"}]
    anno = {"images": images, "annotations": annotations,
            "categories": categories}
    with open(root / "anno.json", "w") as f:
        json.dump(anno, f)
    return root


def test_dataset_pipeline_roundtrip(synthetic_coco_dir):
    """GT fed back as predictions through the full task pipeline → AP == 1."""
    from boxer_tpu.dataset.coco import COCODetection

    config = {
        "use_mask": False,
        "max_boxes": 16,
        "canvas_size": [192, 192],
        "processors": {
            "image_test_processor": {
                "type": "compose",
                "params": {"preprocessors": [
                    {"type": "random_resize",
                     "params": {"min_size": 128, "max_size": 176}},
                    {"type": "to_tensor", "params": {}},
                    {"type": "normalize",
                     "params": {"mean": [0.485, 0.456, 0.406],
                                "std": [0.229, 0.224, 0.225]}},
                ]}},
        },
    }
    imdb = {"anno_file": str(synthetic_coco_dir / "anno.json"),
            "image_folder": str(synthetic_coco_dir / "images")}
    task = COCODetection(config, "val", imdb)
    assert len(task) == 4
    assert task.get_answer_size() == 3

    rng = np.random.RandomState(0)
    items = [task.load(i, rng) for i in range(len(task))]
    batch = task.collate(items)
    assert batch["image"].shape == (4, 192, 192, 3)
    assert batch["targets"]["boxes"].shape == (4, 16, 4)
    assert batch["targets"]["valid"].any()

    # build fake "perfect" model outputs from the collated GT
    nq = 20
    b = 4
    ncls = 3
    logits = np.full((b, nq, ncls), -10.0, np.float32)
    boxes = np.full((b, nq, 4), 0.5, np.float32)
    for i in range(b):
        nv = int(batch["targets"]["valid"][i].sum())
        for t in range(nv):
            logits[i, t, batch["targets"]["labels"][i, t]] = 10.0
            boxes[i, t] = batch["targets"]["boxes"][i, t]
    out = {"pred_logits": logits, "pred_boxes": boxes}

    preds = task.format_for_evalai(out, batch["meta"], topk=10)
    records = task.prepare_for_evaluation(preds)
    assert records and {r["image_id"] for r in records} == {1, 2, 3, 4}

    ev = COCOEval(task.coco, "bbox")
    ev.evaluate(records)
    ev.accumulate()
    stats = ev.summarize()
    # resize+renormalize roundtrip is lossy at sub-pixel level; AP should
    # still be ~1 at the standard thresholds
    assert stats[0] > 0.85, stats
    assert stats[1] == pytest.approx(1.0, abs=0.01)


def test_merge_gathered_results_drops_padding_duplicates():
    """Multi-host eval merge: records for sampler-padding duplicate images
    must be dropped (first host wins), else duplicate detections are
    evaluated twice and depress AP (reference dedupe:
    e2edet/evaluate/coco_eval.py:175-205)."""
    from boxer_tpu.evaluate.coco_eval import merge_gathered_results

    def rec(img, score):
        return {"image_id": img, "category_id": 1,
                "bbox": [0, 0, 10, 10], "score": score}

    # host 0 saw images 1, 2; host 1 saw 3 and padding-duplicate 2
    host0 = ([1, 2], {"bbox": [rec(1, 0.9), rec(2, 0.8)],
                      "segm": [rec(1, 0.9)]})
    host1 = ([3, 2], {"bbox": [rec(3, 0.7), rec(2, 0.8)],
                      "segm": [rec(2, 0.5)]})

    ids, merged = merge_gathered_results([host0, host1], ("bbox", "segm"))
    assert ids == [1, 2, 3]
    assert [r["image_id"] for r in merged["bbox"]] == [1, 2, 3]
    # host1's duplicate image-2 bbox record dropped; its segm record for
    # image 2 is also dropped (image 2 was first seen on host 0)
    assert [r["image_id"] for r in merged["segm"]] == [1]


def test_evaluator_update_dedupes_within_host():
    """Same-host padding revisit of an image keeps the first evaluation."""
    from boxer_tpu.evaluate.coco_eval import CocoEvaluator

    ev = CocoEvaluator(coco_gt=None, iou_types=("bbox",))
    ev.update({"bbox": [{"image_id": 5, "score": 0.9}]}, [5])
    ev.update({"bbox": [{"image_id": 5, "score": 0.1},
                        {"image_id": 6, "score": 0.4}]}, [5, 6])
    assert ev.img_ids == [5, 6]
    assert [(r["image_id"], r["score"]) for r in ev.results["bbox"]] == [
        (5, 0.9), (6, 0.4)]


# ---- keypoints (OKS) iou_type (reference `evaluate/coco_eval.py:83,155-166`) ----

def _kp_gt_dataset():
    images = [{"id": 1, "height": 200, "width": 200, "file_name": "1.jpg"}]
    categories = [{"id": 1, "name": "person"}]
    kps = [0.0] * 51
    kps[0:3] = [20.0, 20.0, 2]    # keypoint 0 visible (sigma .26)
    kps[3:6] = [30.0, 30.0, 2]    # keypoint 1 visible (sigma .25)
    annotations = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 40, 80],
         "area": 3200.0, "iscrowd": 0, "keypoints": kps, "num_keypoints": 2},
    ]
    return {"images": images, "categories": categories,
            "annotations": annotations}


def test_keypoints_perfect_ap1():
    from boxer_tpu.evaluate.coco_eval import COCOEval

    coco = COCO(dataset=_kp_gt_dataset())
    kps = [0.0] * 51
    kps[0:3] = [20.0, 20.0, 1.0]
    kps[3:6] = [30.0, 30.0, 1.0]
    results = [{"image_id": 1, "category_id": 1, "keypoints": kps,
                "bbox": [10, 10, 40, 80], "score": 0.9}]
    ev = COCOEval(coco, "keypoints")
    ev.evaluate(results)
    ev.accumulate()
    stats = ev.summarize()
    assert len(stats) == 10
    assert stats[0] == pytest.approx(1.0)   # AP(OKS)
    assert stats[5] == pytest.approx(1.0)   # AR


def test_keypoints_oks_hand_value():
    """OKS of a displaced detection matches the pycocotools formula, and AP
    equals the fraction of OKS thresholds the match clears."""
    from boxer_tpu.evaluate.coco_eval import COCOEval, KP_SIGMAS, oks_matrix

    coco = COCO(dataset=_kp_gt_dataset())
    # displace keypoint 0 by (6, 8) -> d^2 = 100; keypoint 1 exact
    kps = [0.0] * 51
    kps[0:3] = [26.0, 28.0, 1.0]
    kps[3:6] = [30.0, 30.0, 1.0]
    area = 3200.0
    e0 = 100.0 / ((2 * KP_SIGMAS[0]) ** 2) / (area + np.spacing(1)) / 2
    expected = (np.exp(-e0) + 1.0) / 2.0

    gt_ann = _kp_gt_dataset()["annotations"][0]
    got = oks_matrix(np.asarray(kps, np.float64).reshape(1, -1, 3), [gt_ann])
    assert got[0, 0] == pytest.approx(expected, abs=1e-9)

    results = [{"image_id": 1, "category_id": 1, "keypoints": kps,
                "bbox": [10, 10, 40, 80], "score": 0.9}]
    ev = COCOEval(coco, "keypoints")
    ev.evaluate(results)
    ev.accumulate()
    stats = ev.summarize()
    from boxer_tpu.evaluate.coco_eval import IOU_THRS
    frac = float((IOU_THRS <= expected).mean())
    assert stats[0] == pytest.approx(frac, abs=1e-6)


def test_keypoints_unlabeled_gt_box_falloff():
    """gt with zero labeled keypoints: distances measured to the 2x-expanded
    box, so a detection inside that box has OKS 1 (pycocotools computeOks
    k1==0 branch)."""
    from boxer_tpu.evaluate.coco_eval import oks_matrix

    gt = {"id": 1, "image_id": 1, "category_id": 1,
          "bbox": [10.0, 10.0, 40.0, 80.0], "area": 3200.0, "iscrowd": 0,
          "keypoints": [0.0] * 51, "num_keypoints": 0}
    kps = np.zeros((1, 17, 3))
    kps[0, :, 0] = 25.0
    kps[0, :, 1] = 40.0
    assert oks_matrix(kps, [gt])[0, 0] == pytest.approx(1.0)


def test_keypoints_num_keypoints0_gt_is_ignored():
    """pycocotools _prepare: for iouType='keypoints' a gt with
    num_keypoints==0 is IGNORED — a detection matching it is neither TP nor
    FP, and it does not count toward recall's gt total."""
    from boxer_tpu.evaluate.coco_eval import COCOEval

    ds = _kp_gt_dataset()
    ds["annotations"].append(
        {"id": 2, "image_id": 1, "category_id": 1,
         "bbox": [100.0, 100.0, 40.0, 80.0], "area": 3200.0, "iscrowd": 0,
         "keypoints": [0.0] * 51, "num_keypoints": 0})
    coco = COCO(dataset=ds)

    # detection 1: perfect match of the labeled gt; detection 2: inside the
    # unlabeled gt's expanded box (OKS 1 via the k1==0 falloff) — it must be
    # matched-to-ignored (dropped), not become a FP or a second TP
    kps1 = [0.0] * 51
    kps1[0:3] = [20.0, 20.0, 1.0]
    kps1[3:6] = [30.0, 30.0, 1.0]
    kps2 = [0.0] * 51
    for k in range(17):
        kps2[3 * k:3 * k + 3] = [115.0, 130.0, 1.0]
    results = [
        {"image_id": 1, "category_id": 1, "keypoints": kps1, "score": 0.9},
        {"image_id": 1, "category_id": 1, "keypoints": kps2, "score": 0.8},
    ]
    ev = COCOEval(coco, "keypoints")
    ev.evaluate(results)
    ev.accumulate()
    stats = ev.summarize()
    # with the unlabeled gt ignored: 1 gt, 1 TP, det 2 ignored -> AP = AR = 1
    assert stats[0] == pytest.approx(1.0)
    assert stats[5] == pytest.approx(1.0)
