"""Evaluation metrics with sklearn-exact semantics.

The reference computes test metrics with sklearn on host (mmbase.py:253-323)
— we do the same (sklearn is a host-side dependency, not a compute-path
one), plus a numpy port of the reference's MOSEI ``weighted_accuracy``
(mmbase.py:231-251).  Mask-before-metric ordering is preserved: predictions
are gathered from valid positions only, then metrics run on flat lists.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def weighted_accuracy(y_true: Sequence[int], y_pred: Sequence[int]):
    """Binary weighted accuracy (mmbase.py:231-251, MOSEI per-emotion)."""
    TP = TN = FN = FP = N = P = 0
    for i, j in zip(y_true, y_pred):
        if i == 1 and i == j:
            TP += 1
        elif i == 0 and i == j:
            TN += 1
        if i == 1 and i != j:
            FN += 1
        elif i == 0 and i != j:
            FP += 1
        if i == 1:
            P += 1
        else:
            N += 1
    # single-class columns (all-positive or all-negative ground truth)
    # would divide by zero in the reference formula; report 0 instead of
    # killing the whole metric block
    if P == 0 or N == 0:
        return 0.0, TP, TN, FP, FN, P, N
    w_acc = (1.0 * TP * (N / (1.0 * P)) + TN) / (2.0 * N)
    return w_acc, TP, TN, FP, FN, P, N


def classification_summary(true: List[int], pred: List[int], n_classes: int) -> Dict:
    """The full metric block of on_test_end (mmbase.py:259-275)."""
    from sklearn import metrics

    cm = metrics.confusion_matrix(true, pred, labels=range(n_classes))
    # labels= keeps per-class arrays aligned with class ids even when a
    # class is absent from this eval set (otherwise every class above the
    # missing one shifts down a slot)
    cls_pre, cls_rec, cls_f1, _ = metrics.precision_recall_fscore_support(
        true, pred, labels=range(n_classes), zero_division=0
    )
    return {
        "cm": cm,
        "cls_pre": cls_pre,
        "cls_rec": cls_rec,
        "cls_f1": cls_f1,
        "acc": metrics.accuracy_score(true, pred),
        "wa": metrics.balanced_accuracy_score(true, pred),
        "pre": metrics.precision_score(true, pred, average="weighted", zero_division=0),
        "rec": metrics.recall_score(true, pred, average="weighted", zero_division=0),
        "f1": metrics.f1_score(true, pred, average="weighted", zero_division=0),
        "mif1": metrics.f1_score(true, pred, average="micro", zero_division=0),
        "maf1": metrics.f1_score(true, pred, average="macro", zero_division=0),
    }


def mosei_multilabel_summary(
    true_multi: np.ndarray, pred_multi: np.ndarray, thresh: float = 0.5
) -> Dict:
    """Per-class acc/F1/weighted-acc @0.5 over 7 emotions (mmbase.py:277-296)."""
    from sklearn import metrics

    accs, f1s, waccs = [], [], []
    for i in range(7):
        column = (pred_multi[:, i] > thresh).astype(int)
        accs.append(metrics.accuracy_score(true_multi[:, i], column))
        f1s.append(
            metrics.precision_recall_fscore_support(
                true_multi[:, i], column, average="weighted", zero_division=0
            )[2]
        )
        w_acc, *_ = weighted_accuracy(true_multi[:, i], column)
        waccs.append(w_acc)
    return {
        "cls_acc": accs,
        "cls_f1": f1s,
        "cls_wa": waccs,
        "emo_acc": float(np.mean(accs)),
        "emo_f1": float(np.mean(f1s)),
        "emo_wa": float(np.mean(waccs)),
    }
