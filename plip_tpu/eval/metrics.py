"""Evaluation metrics — same output contract as the reference
(`/root/reference/reproducibility/metrics.py:5-71`): identical dict keys and
values so downstream results CSVs are drop-in comparable.

Differences by design: no debug prints by default (the reference prints a full
classification_report on every call), and the manual confusion-counting loop
is vectorized.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def retrieval_metrics(y_target: Sequence, y_predictions: Sequence) -> Dict[str, float]:
    """Fraction of queries whose target appears in top-10 / top-50
    (metrics.py:5-15)."""
    p_10 = 0
    p_50 = 0
    for t, predictions in zip(y_target, y_predictions):
        predictions = np.asarray(predictions)
        if t in predictions[:10]:
            p_10 += 1
        if t in predictions[:50]:
            p_50 += 1
    n = len(y_target)
    return {"p@10": p_10 / n, "p@50": p_50 / n}


def eval_metrics(
    y_true,
    y_pred,
    y_pred_proba: Optional[np.ndarray] = None,
    average_method: str = "weighted",
    verbose: bool = False,
) -> Dict[str, float]:
    """Classification metric dict (metrics.py:19-71): accuracy, binary AUROC
    (NaN for multiclass, as the reference), weighted/macro F1-precision-recall,
    MCC, and manual tp/fp/tn/fn-derived sensitivity/specificity/ppv/npv."""
    from sklearn.metrics import (
        accuracy_score,
        auc,
        classification_report,
        f1_score,
        matthews_corrcoef,
        precision_score,
        recall_score,
        roc_curve,
    )

    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    assert len(y_true) == len(y_pred)

    if y_pred_proba is None:
        auroc = np.nan
    elif len(np.unique(y_true)) > 2:
        # Reference: 'Multiclass AUC is not currently available.'
        auroc = np.nan
    else:
        fpr, tpr, _ = roc_curve(y_true, y_pred_proba)
        auroc = auc(fpr, tpr)

    f1 = f1_score(y_true, y_pred, average=average_method)
    if verbose:
        print(classification_report(y_true, y_pred))
    precision = precision_score(y_true, y_pred, average=average_method, zero_division=0)
    recall = recall_score(y_true, y_pred, average=average_method, zero_division=0)
    mcc = matthews_corrcoef(y_true, y_pred)
    acc = accuracy_score(y_true, y_pred)

    # Binary confusion counts over the {0, 1} labels (vectorized version of
    # metrics.py:35-46; non-binary labels contribute nothing, as there).
    tp = int(np.sum((y_true == 1) & (y_pred == 1)))
    fp = int(np.sum((y_pred == 1) & (y_true != y_pred)))
    tn = int(np.sum((y_true == 0) & (y_pred == 0)))
    fn = int(np.sum((y_pred == 0) & (y_true != y_pred)))

    sensitivity = tp / (tp + fn) if (tp + fn) else np.nan
    specificity = tn / (tn + fp) if (tn + fp) else np.nan
    ppv = tp / (tp + fp) if (tp + fp) else np.nan
    npv = tn / (tn + fn) if (tn + fn) else np.nan
    total = tp + tn + fp + fn
    hitrate = (tp + tn) / total if total else np.nan

    return {
        "Accuracy": acc,
        "AUC": auroc,
        "WF1": f1,
        "precision": precision,
        "recall": recall,
        "mcc": mcc,
        "tp": tp,
        "fp": fp,
        "tn": tn,
        "fn": fn,
        "sensitivity": sensitivity,
        "specificity": specificity,
        "ppv": ppv,
        "npv": npv,
        "hitrate": hitrate,
        "instances": len(y_true),
    }
