"""Offline metrics over result TSVs — the reference's ``calculate`` mode.

Ref ``main_metrics.py``: ``recall(args)`` (:194-250) reads a TSV of
(query, comma-joined predictions, comma-joined ground truths, rank), keeps
rank-1 rows, and computes recall@{1,5,10,20,50,100}; ``MRR100`` (:253-267)
the reciprocal-rank mean.  Same file format here so result files stay
interchangeable.
"""

from __future__ import annotations

import csv
from typing import Sequence

from gdr_tpu.eval import metrics as M


def read_result_tsv(path: str) -> tuple[dict, dict]:
    """Rows: query \t preds(comma) \t gts(comma) \t rank.  Keeps rank==1 rows
    (ref main_metrics.py:212-218); first row per query wins."""
    preds: dict[str, list[str]] = {}
    gts: dict[str, list[str]] = {}
    with open(path, newline="") as fh:
        for row in csv.reader(fh, delimiter="\t"):
            if len(row) < 3:
                continue
            query, p, g = row[0], row[1], row[2]
            rank = int(row[3]) if len(row) > 3 else 1
            if rank != 1 or query in preds:
                continue
            preds[query] = p.split(",") if p else []
            gts[query] = sorted(set(g.split(","))) if g else []
    return preds, gts


def write_result_tsv(path: str, rows: Sequence[tuple[str, list, list, int]]
                     ) -> None:
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh, delimiter="\t")
        for query, preds, gts, rank in rows:
            w.writerow([query, ",".join(map(str, preds)),
                        ",".join(map(str, gts)), rank])


def calculate(path: str, recall_ks: Sequence[int] = (1, 5, 10, 20, 50, 100)
              ) -> dict[str, float]:
    preds, gts = read_result_tsv(path)
    out: dict[str, float] = {}
    for k in recall_ks:
        mac, mic = M.recall_at_k(preds, gts, k)
        out[f"recall{k}"] = mac
        out[f"recall{k}_micro"] = mic
    out["MRR100"] = M.mrr_at_k(preds, gts, 100)
    out["MRR10"] = M.mrr_at_k(preds, gts, 10)
    return out
