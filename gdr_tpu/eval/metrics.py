"""Retrieval metrics — exact ports of the reference's online metric suite.

The semantics below lock to ``cal_recall`` / ``cal_accuracy`` / ``cal_MRR`` /
``cal_MAP`` in GDR_model/main_models.py:1730-1789 (these are the numbers the
checkpoints are selected on) so that quality comparisons against the
reference are apples-to-apples:

- recall@k: per-query hit-fraction of the ground-truth set within the top-k
  predictions, macro-averaged over queries ("mac") and micro-averaged over
  positives ("mic").
- accuracy@k (a.k.a. hits@k): 1 if any ground truth appears in top-k.
- MRR@k: reciprocal rank of the first hit within top-k.
- MAP@k: average precision truncated at k, **divided by k** (reference quirk
  at main_models.py:1787 — kept for comparability).

Inputs are per-query prediction lists (ranked) and ground-truth collections;
any hashable id type works (the reference uses strings).
"""

from __future__ import annotations

from typing import Mapping, Sequence


def recall_at_k(preds: Mapping, gts: Mapping, k: int) -> tuple[float, float]:
    """Returns (macro, micro) recall@k.  Ref cal_recall main_models.py:1730-1744."""
    total_hit = 0
    total_positive = 0
    total_recall = 0.0
    for q, plist in preds.items():
        gt = gts[q]
        topk = plist[:k]
        hits = sum(1 for p in gt if p in topk)
        total_positive += len(gt)
        total_recall += hits / len(gt)
        total_hit += hits
    n = max(len(preds), 1)
    micro = total_hit / max(total_positive, 1)
    macro = total_recall / n
    return macro, micro


def accuracy_at_k(preds: Mapping, gts: Mapping, k: int) -> float:
    """hits@k.  Ref cal_accuracy main_models.py:1746-1757."""
    total = 0
    for q, plist in preds.items():
        gt = set(gts[q])
        total += int(any(p in gt for p in plist[:k]))
    return total / max(len(preds), 1)


def mrr_at_k(preds: Mapping, gts: Mapping, k: int) -> float:
    """MRR@k.  Ref cal_MRR main_models.py:1759-1772."""
    total = 0.0
    for q, plist in preds.items():
        gt = set(gts[q])
        for rank, p in enumerate(plist[:k], start=1):
            if p in gt:
                total += 1.0 / rank
                break
    return total / max(len(preds), 1)


def map_at_k(preds: Mapping, gts: Mapping, k: int) -> float:
    """MAP@k with the reference's /k normalisation (main_models.py:1774-1789)."""
    total = 0.0
    for q, plist in preds.items():
        gt = set(gts[q])
        pred_true = 1
        local = 0.0
        for rank, p in enumerate(plist[:k], start=1):
            if p in gt:
                local += pred_true / rank
                pred_true += 1
        total += local / k
    return total / max(len(preds), 1)


def full_suite(preds: Mapping, gts: Mapping,
               recall_ks: Sequence[int] = (1, 5, 10, 20, 50, 100),
               accuracy_ks: Sequence[int] = (1, 20, 100),
               mrr_ks: Sequence[int] = (10, 100),
               map_k: int = 100,
               prefix: str = "") -> dict[str, float]:
    """The reference's full logged metric set (main_models.py:1791-1908)."""
    out: dict[str, float] = {}
    for k in recall_ks:
        mac, mic = recall_at_k(preds, gts, k)
        out[f"{prefix}recall{k}"] = mac
        out[f"{prefix}recall{k}_micro"] = mic
    for k in accuracy_ks:
        out[f"{prefix}accuracy{k}"] = accuracy_at_k(preds, gts, k)
    for k in mrr_ks:
        out[f"{prefix}MRR{k}"] = mrr_at_k(preds, gts, k)
    out[f"{prefix}MAP{map_k}"] = map_at_k(preds, gts, map_k)
    return out
