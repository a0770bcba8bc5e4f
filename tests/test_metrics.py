"""A5 metric tests (the analog of the reference's annotated-fixture AP
gate, `test_bucky_pages.py:11-39`): hand-computed AP cases, and the e2e
gate — pipeline segments score AP = 1.0 against the oracle's."""

import pytest

from cosmos_spark import metrics as M


@pytest.fixture(scope="module")
def pipeline_result(spark, source_df):
    from cosmos_spark.pipeline import run_pipeline
    res = run_pipeline(spark, source_df)
    return {k: v.toPandas() for k, v in res.items()}


def test_span_iou():
    assert M.span_iou((1, 10), (1, 10)) == 1.0
    assert M.span_iou((1, 10), (11, 20)) == 0.0
    # [1,10] vs [6,15]: inter 5, union 15
    assert M.span_iou((1, 10), (6, 15)) == pytest.approx(5 / 15)


def test_average_precision_hand_computed():
    expected = [(1, 10), (21, 30)]
    # perfect: two exact matches in score order -> AP 1
    preds = [(0.9, (1, 10)), (0.8, (21, 30))]
    assert M.average_precision(preds, expected, 0.5) == pytest.approx(1.0)
    # one hit, one miss ranked first: tp at rank 2 only ->
    # AP = precision(1/2) * recall_delta(1/2) = 0.25
    preds = [(0.9, (50, 60)), (0.8, (1, 10))]
    assert M.average_precision(preds, expected, 0.5) == pytest.approx(0.25)
    # empty cases
    assert M.average_precision([], [], 0.5) == 1.0
    assert M.average_precision([], expected, 0.5) == 0.0
    assert M.average_precision([(0.5, (1, 2))], [], 0.5) == 0.0


def test_ap_thresholds_discriminate():
    """A loose match passes AP50 but fails AP75 (IoU ~0.6)."""
    expected = [(1, 10)]
    preds = [(0.9, (3, 12))]  # inter [3,10]=8, union 12 -> IoU 0.667
    s = M.ap_summary(preds, expected)
    assert s["AP50"] == 1.0
    assert s["AP75"] == 0.0
    assert 0.0 < s["AP"] < 1.0


def test_pipeline_segments_ap_vs_oracle(pipeline_result, oracle_result):
    """The e2e AP gate: distributed segmentation scores AP 1.0 against the
    oracle's segments, per doc, pooled over the corpus."""
    cols = ["repo", "path", "line_start", "line_end", "score"]
    got = pipeline_result["segments"][cols]
    exp = oracle_result["segments"][cols]
    res = M.doc_ap(got, exp)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)
