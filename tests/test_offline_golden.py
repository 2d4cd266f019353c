"""Golden parity for offline ``calculate`` (VERDICT r4 weak #3).

The oracle below is a line-for-line re-implementation of the reference's
``recall()`` / ``MRR100()`` (/root/reference/GDR_model/main_metrics.py:
194-267): the ``prev_q`` contiguous-run pred walk, the gt set that takes
the first row's split but later rows' WHOLE comma-joined string, binary
hits@k averaged over queries, and the per-ROW MRR divided by line count.
``calculate(ref_compat=True)`` must match it exactly on multi-positive
files; the default mode must agree with both on single-positive rank-1
files (where the definitions coincide for recall@k).
"""

import pytest

from gdr_tpu.eval.offline import calculate, write_result_tsv


def _oracle_recall(path, ks):
    """main_metrics.py:194-244, non-trivia branch, verbatim logic."""
    q_gt, q_pred = {}, {}
    with open(path, "r") as f:
        prev_q = ""
        for line in f.readlines():
            query, pred, gt, rank = line[:-1].split("\t")
            if query != prev_q:
                q_pred[query] = pred.split(",")
                prev_q = query
            if query in q_gt:
                if len(q_gt[query]) <= 100:
                    q_gt[query].add(gt)
            else:
                q_gt[query] = set(gt.split(","))
    out = {}
    for i in ks:
        total = 0
        for q in q_pred:
            is_hit = 0
            for p in q_gt[q]:
                if p in q_pred[q][: int(i)]:
                    is_hit = 1
            total += is_hit
        out[f"recall{i}"] = total / len(q_pred)
    return out


def _oracle_mrr100(path):
    """main_metrics.py:253-267 verbatim logic (per-row, whole gt string)."""
    mrr_total = 0
    query_num = 0
    with open(path, "r") as f:
        for line in f.readlines():
            query, pred, gt, rank = line.split("\t")
            pred_list = pred.split(",")
            if gt in pred_list:
                rank = pred_list.index(gt) + 1
                mrr_total += 1 / rank
            query_num += 1
    return mrr_total / query_num


def _multi_positive_rows():
    """A dev-style file: repeated query rows (one gt per row, the reference's
    multi-positive dev layout, generate_training_data.py:230-249), plus a
    single-positive query and a no-hit query."""
    return [
        # q1: three positive docs, two retrieved (d7 at rank 1, d9 at 3)
        ("q1", ["d7", "d2", "d9", "d4"], ["d7"], 1),
        ("q1", ["d7", "d2", "d9", "d4"], ["d9"], 2),
        ("q1", ["d7", "d2", "d9", "d4"], ["d13"], 3),
        # q2: single positive at rank 2
        ("q2", ["d1", "d5", "d3"], ["d5"], 1),
        # q3: nothing retrieved
        ("q3", ["d8", "d6"], ["d99"], 1),
        # q4: comma-joined multi-gt on ONE row (the other multi-positive
        # shape); second row's whole string lands in the gt set
        ("q4", ["d20", "d21"], ["d22", "d21"], 1),
        ("q4", ["d20", "d21"], ["d23"], 2),
    ]


def test_ref_compat_matches_oracle(tmp_path):
    path = str(tmp_path / "res1.tsv")
    write_result_tsv(path, _multi_positive_rows())
    ks = (1, 2, 5, 100)
    got = calculate(path, recall_ks=ks, ref_compat=True)
    want = _oracle_recall(path, ks)
    for k in ks:
        assert got[f"recall{k}"] == pytest.approx(want[f"recall{k}"]), k
    assert got["MRR100"] == pytest.approx(_oracle_mrr100(path))
    # sanity on the known divergence: default fraction-recall differs here
    default = calculate(path, recall_ks=ks)
    assert default["recall2"] != pytest.approx(got["recall2"])


def test_modes_agree_on_single_positive(tmp_path):
    rows = [
        ("q1", ["d7", "d2", "d9"], ["d7"], 1),
        ("q2", ["d1", "d5", "d3"], ["d5"], 1),
        ("q3", ["d8", "d6"], ["d99"], 1),
    ]
    path = str(tmp_path / "res1.tsv")
    write_result_tsv(path, rows)
    ks = (1, 2, 100)
    a = calculate(path, recall_ks=ks)
    b = calculate(path, recall_ks=ks, ref_compat=True)
    o = _oracle_recall(path, ks)
    for k in ks:
        assert a[f"recall{k}"] == pytest.approx(b[f"recall{k}"])
        assert b[f"recall{k}"] == pytest.approx(o[f"recall{k}"])
    assert b["MRR100"] == pytest.approx(_oracle_mrr100(path))
    assert a["MRR100"] == pytest.approx(b["MRR100"])


def test_cli_ref_compat_flag(tmp_path, capsys):
    import json

    from gdr_tpu import cli
    path = str(tmp_path / "res1.tsv")
    write_result_tsv(path, _multi_positive_rows())
    cli.main(["calculate", "--result", path, "--ref-compat"])
    got = json.loads(capsys.readouterr().out)
    want = _oracle_recall(path, (1, 5, 10, 20, 50, 100))
    assert got["recall5"] == pytest.approx(want["recall5"])
