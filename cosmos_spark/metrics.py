"""Detection-quality metrics (SURVEY §2.5 A5) — the line-span analog of
the reference's healthcheck AP implementation
(`cosmos_service/src/healthcheck/page_metrics.py:63-175`): IoU between
spans, greedy best-IoU matching of scored predictions to expected
regions, average precision over IoU thresholds 0.5:0.05:0.95, AP50/AP75,
and per-doc pooling. Test-side metric (pandas/numpy), used by the e2e
gates the way the reference's annotated-fixture tests use AP > 0.9
(`test_bucky_pages.py:11-39`).
"""

from __future__ import annotations

import numpy as np

# exact COCO grid: rounded, not raw arange — accumulated float error
# (0.8500000000000001) would fail predictions sitting exactly ON a
# threshold (ADVICE r2). Rounding pins each threshold to the nearest
# double of the decimal literal, bit-equal to an IoU that computes to it.
IOU_THRESHOLDS = np.round(np.linspace(0.5, 0.95, 10), 2)


def span_iou(a: tuple[float, float], b: tuple[float, float]) -> float:
    """1-D interval IoU on inclusive line spans (the bbox-IoU analog,
    `page_metrics.py:22-42`)."""
    inter = min(a[1], b[1]) - max(a[0], b[0]) + 1
    if inter <= 0:
        return 0.0
    union = (a[1] - a[0] + 1) + (b[1] - b[0] + 1) - inter
    return inter / union


def _match(preds: list, expected: list, thr: float) -> list[bool]:
    """Greedy best-IoU matching at one threshold: predictions in
    descending score order each claim their best unmatched expected span
    (`page_metrics.py:63-95`). Returns per-prediction TP flags."""
    taken = [False] * len(expected)
    tp = []
    for _score, span in sorted(preds, key=lambda p: (-p[0], p[1])):
        best, best_iou = -1, 0.0
        for j, esp in enumerate(expected):
            if taken[j]:
                continue
            iou = span_iou(span, esp)
            if iou > best_iou:
                best, best_iou = j, iou
        if best >= 0 and best_iou >= thr:
            taken[best] = True
            tp.append(True)
        else:
            tp.append(False)
    return tp


def average_precision(preds: list, expected: list,
                      thr: float) -> float:
    """AP at one IoU threshold: area under the precision-recall curve
    (precision * delta-recall sum, `page_metrics.py:96-123`).

    ``preds`` = [(score, (start, end)), ...]; ``expected`` = [(start,
    end), ...]. Empty-vs-empty scores 1.0; predictions against nothing
    (or nothing predicted) score 0.0."""
    if not expected:
        return 1.0 if not preds else 0.0
    if not preds:
        return 0.0
    tp = _match(preds, expected, thr)
    ap = 0.0
    n_tp = 0
    prev_recall = 0.0
    for i, hit in enumerate(tp):
        if hit:
            n_tp += 1
            precision = n_tp / (i + 1)
            recall = n_tp / len(expected)
            ap += precision * (recall - prev_recall)
            prev_recall = recall
    return ap


def ap_summary(preds: list, expected: list) -> dict:
    """{'AP': mean over 0.5:0.05:0.95, 'AP50': ..., 'AP75': ...} —
    the COCO-style summary the reference reports per region class
    (`page_metrics.py:108-123`)."""
    by_thr = {round(float(t), 2): average_precision(preds, expected, t)
              for t in IOU_THRESHOLDS}
    return {
        "AP": float(np.mean(list(by_thr.values()))),
        "AP50": by_thr[0.5],
        "AP75": by_thr[0.75],
    }


def doc_ap(pred_df, exp_df, doc_cols=("repo", "path"),
           span_cols=("line_start", "line_end"),
           score_col: str = "score") -> dict:
    """Per-doc AP pooled to a corpus mean (`page_metrics.py:136-175`):
    both inputs are pandas frames of spans; every doc present in either
    side contributes."""
    s0, s1 = span_cols
    pg = {k: [(r[score_col], (r[s0], r[s1]))
              for _, r in g.iterrows()]
          for k, g in pred_df.groupby(list(doc_cols))}
    eg = {k: [(r[s0], r[s1]) for _, r in g.iterrows()]
          for k, g in exp_df.groupby(list(doc_cols))}
    docs = set(pg) | set(eg)
    per_doc = {d: ap_summary(pg.get(d, []), eg.get(d, [])) for d in docs}
    if not per_doc:
        # empty-vs-empty is a perfect match by average_precision's own
        # convention — np.mean([]) would return NaN and poison any gate
        return {"per_doc": per_doc, "AP": 1.0, "AP50": 1.0, "AP75": 1.0}
    return {
        "per_doc": per_doc,
        "AP": float(np.mean([v["AP"] for v in per_doc.values()])),
        "AP50": float(np.mean([v["AP50"] for v in per_doc.values()])),
        "AP75": float(np.mean([v["AP75"] for v in per_doc.values()])),
    }
