"""Learned quality classifier (operators/classifier.py): separable weak
labels must be learned, scoring is deterministic, the filter keeps the
right side."""

from __future__ import annotations

import pytest

from oxbow_spark.operators.classifier import (
    classifier_filter,
    score_quality,
    train_quality_classifier,
    weak_labels_from_heuristics,
)


@pytest.fixture(scope="module")
def corpus(spark):
    goods = [
        "the quiet morning light moved across a wide valley while "
        "careful readers followed one long thoughtful argument about "
        "early local history and its many strange turns through old "
        "letters maps and half forgotten village records kept nearby",
        "a clear explanation of this method appears in another chapter "
        "where its author develops each idea with patient detail and "
        "compares several earlier attempts against newer simpler "
        "designs tested on small public examples over many months",
        "after that storm our small harbor town repaired its boats and "
        "the fishermen returned slowly to familiar daily routines as "
        "traders opened shops along wet stone streets selling rope "
        "salt bread and lamp oil to quiet patient customers",
        "scientists measured this signal again and found that a result "
        "agreed closely with earlier published independent estimates "
        "which strengthened their case for revising one widely used "
        "model of slow deep ocean currents near polar regions",
    ]
    bads = [
        "buy buy buy now now now cheap cheap cheap deal deal deal",
        "zzz qqq xxx www kkk jjj fff ggg hhh lll ppp mmm",
        "click here click here click here click here click here",
        "aaa bbb aaa bbb aaa bbb aaa bbb aaa bbb aaa bbb",
    ]
    rows = [(i, t) for i, t in enumerate(goods)]
    rows += [(100 + i, t) for i, t in enumerate(bads)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weak_labels(corpus):
    lbl = {r.doc_id: r.label
           for r in weak_labels_from_heuristics(corpus).collect()}
    assert all(lbl[i] == 1.0 for i in range(4)), lbl
    assert all(lbl[100 + i] == 0.0 for i in range(4)), lbl


def test_train_score_filter(corpus):
    labeled = weak_labels_from_heuristics(corpus)
    model = train_quality_classifier(labeled, num_features=1 << 12)
    scores = {r.doc_id: r.quality_prob
              for r in score_quality(model, corpus).collect()}
    for i in range(4):
        assert scores[i] > 0.5, scores
        assert scores[100 + i] < 0.5, scores
    kept = {r.doc_id for r in classifier_filter(
        corpus, model=model, threshold=0.5).collect()}
    assert kept == {0, 1, 2, 3}
    # scoring is deterministic for a fixed model
    again = {r.doc_id: r.quality_prob
             for r in score_quality(model, corpus).collect()}
    assert again == scores


def test_generalizes_to_unseen(corpus, spark):
    model = train_quality_classifier(
        weak_labels_from_heuristics(corpus), num_features=1 << 12)
    unseen = spark.createDataFrame(
        [(0, "the careful author explains the history of the valley "
             "with clear detail and a patient thoughtful argument"),
         (1, "cheap deal cheap deal click now zzz qqq buy buy")],
        "doc_id long, text string")
    s = {r.doc_id: r.quality_prob
         for r in score_quality(model, unseen).collect()}
    assert s[0] > s[1]
