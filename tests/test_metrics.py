from gdr_tpu.eval import metrics


PREDS = {
    "q1": ["a", "b", "c", "d"],
    "q2": ["x", "y", "z", "w"],
}
GTS = {
    "q1": ["a", "c"],      # hits at ranks 1 and 3
    "q2": ["w"],           # hit at rank 4
}


def test_recall():
    mac, mic = metrics.recall_at_k(PREDS, GTS, 1)
    assert mac == (0.5 + 0.0) / 2
    assert mic == 1 / 3
    mac, mic = metrics.recall_at_k(PREDS, GTS, 4)
    assert mac == 1.0
    assert mic == 1.0


def test_accuracy():
    assert metrics.accuracy_at_k(PREDS, GTS, 1) == 0.5
    assert metrics.accuracy_at_k(PREDS, GTS, 4) == 1.0


def test_mrr():
    # q1 first hit rank 1; q2 first hit rank 4
    assert metrics.mrr_at_k(PREDS, GTS, 10) == (1.0 + 0.25) / 2
    assert metrics.mrr_at_k(PREDS, GTS, 2) == (1.0 + 0.0) / 2


def test_map_reference_quirk():
    # reference divides by k, not by min(k, |gt|) (main_models.py:1787)
    k = 4
    q1_ap = (1 / 1 + 2 / 3) / k
    q2_ap = (1 / 4) / k
    assert abs(metrics.map_at_k(PREDS, GTS, k) - (q1_ap + q2_ap) / 2) < 1e-12


def test_full_suite_keys():
    out = metrics.full_suite(PREDS, GTS, prefix="cluster_")
    assert "cluster_recall1" in out
    assert "cluster_MRR100" in out
    assert "cluster_MAP100" in out
