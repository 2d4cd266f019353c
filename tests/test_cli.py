"""CLI end-to-end smoke: index → train → eval → expand → calculate,
all through files (the reference's train.sh/infer.sh workflow)."""

import json
import os

import numpy as np
import pytest

from gdr_tpu import cli


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cliworld")
    rng = np.random.default_rng(0)
    topics = ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"]
    n_docs = 18
    docs, queries = [], []
    for i in range(n_docs):
        topic = topics[i % 3]
        words = (topic + " ") * 4 + f"document number {i}"
        docs.append((f"Doc{i}", words))
        queries.append((f"find {topic} item {i}", str(i)))
    with open(tmp / "docs.tsv", "w") as fh:
        for t, x in docs:
            fh.write(f"{t}\t{x}\n")
    with open(tmp / "train.tsv", "w") as fh:
        for q, d in queries:
            fh.write(f"{q}\t{d}\n")
    with open(tmp / "dev.tsv", "w") as fh:
        for q, d in queries[:6]:
            fh.write(f"{q}\t{d}\n")
    return tmp


def test_cli_index_train_eval_expand(world, capsys):
    tmp = world
    cli.main(["index", "--corpus", str(tmp / "docs.tsv"),
              "--out", str(tmp / "index.npz"), "--kary", "3",
              "--leaf-cap", "6", "--encoder-max-len", "16",
              "--encoder-size", "tiny", "--batch-size", "8"])
    out = capsys.readouterr().out
    assert "18 docs" in out
    assert os.path.exists(tmp / "index.npz")
    from gdr_tpu.index.io import load_index
    assert np.isfinite(load_index(str(tmp / "index.npz")).store).all()

    cli.main(["train", "--index", str(tmp / "index.npz"),
              "--train", str(tmp / "train.tsv"), "--dev", str(tmp / "dev.tsv"),
              "--workdir", str(tmp / "run"), "--model-size", "tiny",
              "--kary", "3", "--max-output-length", "5",
              "--max-input-length", "12", "--batch-size", "6",
              "--epochs", "1", "--beam", "4", "--adaptor-layers", "1"])
    assert os.path.exists(tmp / "run" / "ckpt")
    with open(tmp / "run" / "train.metrics.jsonl") as fh:
        rows = [json.loads(line) for line in fh]
    losses = [r["avg_train_loss"] for r in rows if "avg_train_loss" in r]
    assert losses and all(np.isfinite(v) for v in losses), losses

    cli.main(["eval", "--index", str(tmp / "index.npz"),
              "--dev", str(tmp / "dev.tsv"), "--workdir", str(tmp / "run"),
              "--model-size", "tiny", "--kary", "3",
              "--max-output-length", "5", "--max-input-length", "12",
              "--beam", "4", "--eval-batch-size", "6",
              "--adaptor-layers", "1"])
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index("{"):])
    assert "recall1" in metrics and "cluster_recall1" in metrics

    with open(tmp / "new_docs.tsv", "w") as fh:
        fh.write("NewDoc\talpha beta gamma totally new document\n")
    cli.main(["expand", "--index", str(tmp / "index.npz"),
              "--corpus", str(tmp / "new_docs.tsv"),
              "--out", str(tmp / "index2.npz"), "--encoder-max-len", "16",
              "--encoder-size", "tiny"])
    out = capsys.readouterr().out
    assert "18 → 19" in out or "18 → 19" in out


def test_cli_calculate(world, capsys, tmp_path):
    path = tmp_path / "res.tsv"
    with open(path, "w") as fh:
        fh.write("q1\t3,5,7\t3\t1\n")
        fh.write("q2\t9,4\t8\t1\n")
    cli.main(["calculate", "--result", str(path)])
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index("{"):])
    assert metrics["recall1"] == 0.5
    assert metrics["MRR100"] == 0.5


def test_cli_real_vocab_end_to_end(world, capsys, tmp_path):
    """VERDICT.md round-1 'Done =' bar: index/train/eval on a REAL trained
    subword vocabulary, no HF download (tokenizers trained in-repo)."""
    tmp = world
    qtok = str(tmp_path / "queries.json")
    dtok = str(tmp_path / "docs.json")
    cli.main(["tokenizer", "--corpus", str(tmp / "train.tsv"),
              "--out", qtok, "--type", "unigram", "--vocab-size", "120"])
    cli.main(["tokenizer", "--corpus", str(tmp / "docs.tsv"),
              "--out", dtok, "--type", "wordpiece", "--vocab-size", "120"])
    out = capsys.readouterr().out
    assert "unigram" in out and "wordpiece" in out

    cli.main(["index", "--corpus", str(tmp / "docs.tsv"),
              "--out", str(tmp_path / "index.npz"), "--kary", "3",
              "--leaf-cap", "6", "--encoder-max-len", "16",
              "--encoder-size", "tiny", "--batch-size", "8",
              "--doc-tokenizer", dtok])
    from gdr_tpu.index.io import load_index
    assert np.isfinite(load_index(str(tmp_path / "index.npz")).store).all()

    cli.main(["train", "--index", str(tmp_path / "index.npz"),
              "--train", str(tmp / "train.tsv"), "--dev", str(tmp / "dev.tsv"),
              "--workdir", str(tmp_path / "run"), "--model-size", "tiny",
              "--kary", "3", "--max-output-length", "5",
              "--max-input-length", "12", "--batch-size", "6",
              "--epochs", "1", "--beam", "4", "--adaptor-layers", "1",
              "--tokenizer", qtok])
    with open(tmp_path / "run" / "train.metrics.jsonl") as fh:
        rows = [json.loads(line) for line in fh]
    losses = [r["avg_train_loss"] for r in rows if "avg_train_loss" in r]
    assert losses and all(np.isfinite(v) for v in losses), losses

    cli.main(["eval", "--index", str(tmp_path / "index.npz"),
              "--dev", str(tmp / "dev.tsv"), "--workdir", str(tmp_path / "run"),
              "--model-size", "tiny", "--kary", "3",
              "--max-output-length", "5", "--max-input-length", "12",
              "--beam", "4", "--eval-batch-size", "6",
              "--adaptor-layers", "1", "--tokenizer", qtok])
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index("{"):])
    assert "recall1" in metrics


def test_cli_qg_and_merge(world, capsys):
    """qg subcommand → .npz → train --qg merges pseudo-queries."""
    tmp = world
    assert os.path.exists(tmp / "index.npz"), "runs after the index test"
    cli.main(["qg", "--corpus", str(tmp / "docs.tsv"),
              "--out", str(tmp / "qg.npz"), "--model-size", "tiny",
              "--kary", "3", "--max-output-length", "5",
              "--train", str(tmp / "train.tsv"), "--doc-length", "12",
              "--max-query-length", "12", "--n-per-doc", "2",
              "--qg-epochs", "1", "--batch-size", "6"])
    out = capsys.readouterr().out
    assert "pseudo-queries" in out
    z = np.load(tmp / "qg.npz")
    assert z["query_tokens"].shape[0] == 36          # 2 per doc × 18
    assert z["source_doc"].max() == 17

    cli.main(["train", "--index", str(tmp / "index.npz"),
              "--train", str(tmp / "train.tsv"), "--dev", str(tmp / "dev.tsv"),
              "--workdir", str(tmp / "run_qg"), "--model-size", "tiny",
              "--kary", "3", "--max-output-length", "5",
              "--max-input-length", "12", "--batch-size", "6",
              "--epochs", "1", "--beam", "4", "--adaptor-layers", "1",
              "--qg", str(tmp / "qg.npz"), "--mesh", "none"])
    out = capsys.readouterr().out
    assert "18 gtq + 36 qg = 54 rows" in out


def test_cli_ensemble(world, capsys):
    tmp = world
    cli.main(["train", "--index", str(tmp / "index.npz"),
              "--train", str(tmp / "train.tsv"), "--dev", str(tmp / "dev.tsv"),
              "--workdir", str(tmp / "run_ens"), "--model-size", "tiny",
              "--kary", "3", "--max-output-length", "5",
              "--max-input-length", "12", "--batch-size", "6",
              "--epochs", "1", "--beam", "4", "--adaptor-layers", "1",
              "--ensemble", "2", "--leaf-cap", "6"])
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index("{"):])
    assert "recall1" in metrics
    assert os.path.exists(tmp / "run_ens" / "ensemble.msgpack")

    cli.main(["eval", "--index", str(tmp / "index.npz"),
              "--dev", str(tmp / "dev.tsv"),
              "--workdir", str(tmp / "run_ens"), "--model-size", "tiny",
              "--kary", "3", "--max-output-length", "5",
              "--max-input-length", "12", "--beam", "4",
              "--adaptor-layers", "1", "--ensemble", "2",
              "--eval-batch-size", "6"])
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index("{"):])
    assert "recall1" in metrics


def test_cli_softmax(world, capsys):
    tmp = world
    cli.main(["train", "--index", str(tmp / "index.npz"),
              "--train", str(tmp / "train.tsv"), "--dev", str(tmp / "dev.tsv"),
              "--workdir", str(tmp / "run_sm"), "--model-size", "tiny",
              "--kary", "3", "--max-output-length", "5",
              "--max-input-length", "12", "--batch-size", "6",
              "--epochs", "2", "--softmax"])
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index("{"):])
    assert "cluster_recall1" in metrics
    assert np.isfinite(metrics["final_loss"])
    assert os.path.exists(tmp / "run_sm" / "softmax.msgpack")


def test_cli_hierarchic(world, capsys):
    tmp = world
    cli.main(["train", "--index", str(tmp / "index.npz"),
              "--train", str(tmp / "train.tsv"), "--dev", str(tmp / "dev.tsv"),
              "--workdir", str(tmp / "run_h"), "--model-size", "tiny",
              "--kary", "3", "--max-output-length", "5",
              "--max-input-length", "12", "--batch-size", "6",
              "--epochs", "1", "--adaptor-layers", "1", "--hierarchic",
              "--beam", "4"])
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index("{"):])
    assert "cluster_recall1" in metrics
    assert "recall1" in metrics          # doc level, via the dense re-rank
    assert np.isfinite(metrics["final_loss"])
    assert os.path.exists(tmp / "run_h" / "hierarchic.msgpack")


def test_cli_ingest_nq(tmp_path, capsys):
    """ingest --nq-jsonl (+dev sharing the corpus table) → TSVs the rest of
    the chain parses (ref NQ_process.py:112-134)."""
    import gzip
    recs = [{"document_title": f"T{i % 4}",
             "document_text": f"Body of document {i % 4} with words\tand tab",
             "question_text": f"what is doc {i}?"} for i in range(8)]
    with gzip.open(tmp_path / "train.jsonl.gz", "wt") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")
    dev_recs = [{"document_title": "T1", "document_text": "Body 1",
                 "question_text": "dev q one"},
                {"document_title": "Tnew", "document_text": "unseen doc",
                 "question_text": "dev q two"}]
    with open(tmp_path / "dev.jsonl", "w") as fh:
        for r in dev_recs:
            fh.write(json.dumps(r) + "\n")

    cli.main(["ingest", "--nq-jsonl", str(tmp_path / "train.jsonl.gz"),
              "--dev-jsonl", str(tmp_path / "dev.jsonl"),
              "--out-dir", str(tmp_path / "data")])
    out = capsys.readouterr().out
    assert "5 docs" in out and "8 train" in out and "2 dev" in out

    titles, texts = cli._read_corpus_tsv(str(tmp_path / "data/corpus.tsv"))
    assert titles == ["T0", "T1", "T2", "T3", "Tnew"]  # dev doc appended
    assert "\t" not in texts[0]
    tq, tpos = cli._read_query_tsv(str(tmp_path / "data/train.tsv"))
    assert len(tq) == 8 and tpos[5] == [1]             # doc ids consistent
    dq, dpos = cli._read_query_tsv(str(tmp_path / "data/dev.tsv"))
    assert dpos == [[1], [4]]                          # T1 reused, Tnew new


def test_cli_ingest_pickle_and_dev_frac(tmp_path, capsys):
    """ingest --corpus-pickle with multi-positive rows; --dev-frac split."""
    import pickle
    corpus = [{"title": f"T{i}", "text": f"text {i}"} for i in range(6)]
    train = [{"query": f"q{i}",
              "positive_passages": [{"title": f"T{i}"},
                                    {"title": f"T{(i + 1) % 6}"}]}
             for i in range(10)]
    with open(tmp_path / "c.pkl", "wb") as fh:
        pickle.dump(corpus, fh)
    with open(tmp_path / "t.pkl", "wb") as fh:
        pickle.dump(train, fh)
    cli.main(["ingest", "--corpus-pickle", str(tmp_path / "c.pkl"),
              "--train-pickle", str(tmp_path / "t.pkl"),
              "--dev-frac", "0.2", "--out-dir", str(tmp_path / "data")])
    out = capsys.readouterr().out
    assert "6 docs" in out and "8 train" in out and "2 dev" in out
    tq, tpos = cli._read_query_tsv(str(tmp_path / "data/train.tsv"))
    assert tpos[0] == [0, 1]                           # multi-positive row
    dq, _ = cli._read_query_tsv(str(tmp_path / "data/dev.tsv"))
    assert dq == ["q8", "q9"]


def test_cli_query_type_mix_and_result_tsv(world, capsys, tmp_path):
    """`train --query-type gtq_doc_aug` mixes document-side pseudo-queries
    (ref main_utils.py:146-223); `eval --result-tsv` writes the res1 file
    `calculate` consumes (ref main.py:244-247)."""
    tmp = world
    assert os.path.exists(tmp / "index.npz"), "runs after the index test"
    cli.main(["train", "--index", str(tmp / "index.npz"),
              "--train", str(tmp / "train.tsv"), "--dev", str(tmp / "dev.tsv"),
              "--workdir", str(tmp_path / "run_mix"), "--model-size", "tiny",
              "--kary", "3", "--max-output-length", "5",
              "--max-input-length", "12", "--batch-size", "6",
              "--epochs", "1", "--beam", "4", "--adaptor-layers", "1",
              "--corpus", str(tmp / "docs.tsv"),
              "--query-type", "gtq_doc_aug"])
    out = capsys.readouterr().out
    assert "18 gtq + 18 doc" in out and "aug" in out

    res = str(tmp_path / "res1.tsv")
    cli.main(["eval", "--index", str(tmp / "index.npz"),
              "--dev", str(tmp / "dev.tsv"),
              "--workdir", str(tmp_path / "run_mix"),
              "--model-size", "tiny", "--kary", "3",
              "--max-output-length", "5", "--max-input-length", "12",
              "--beam", "4", "--eval-batch-size", "6",
              "--adaptor-layers", "1", "--result-tsv", res])
    out = capsys.readouterr().out
    online = json.loads(out[out.index("{"):])
    cli.main(["calculate", "--result", res])
    out = capsys.readouterr().out
    offline = json.loads(out[out.index("{"):])
    # offline metrics recomputed from the TSV must agree with the online run
    assert abs(offline["recall1"] - online["recall1"]) < 1e-9


def test_cli_retrieve_serving(world, capsys, tmp_path):
    """`retrieve` — the serving entry: free-text queries through a trained
    run dir → ranked docs.  TSV contract (header, 1-based ranks, scores
    non-increasing, ≤ top-k rows per query) and JSON mode via a queries
    file through the packed fast path."""
    tmp = world
    assert os.path.exists(tmp / "run" / "ckpt"), "runs after the train test"
    base = ["retrieve", "--index", str(tmp / "index.npz"),
            "--workdir", str(tmp / "run"), "--model-size", "tiny",
            "--kary", "3", "--max-output-length", "5",
            "--max-input-length", "12", "--beam", "4",
            "--adaptor-layers", "1"]
    cli.main(base + ["--top-k", "3",
                     "--query", "find alpha beta gamma item 0",
                     "--query", "find delta epsilon zeta item 1"])
    out = capsys.readouterr().out
    lines = [ln for ln in out.strip().splitlines() if ln]
    assert lines[0].split("\t") == ["query_idx", "rank", "doc_id",
                                    "score", "cid"]
    rows = [ln.split("\t") for ln in lines[1:]]
    assert rows and all(len(r) == 5 for r in rows)
    assert {int(r[0]) for r in rows} == {0, 1}
    from gdr_tpu.index.io import load_index
    index = load_index(str(tmp / "index.npz"))
    for q in (0, 1):
        rq = [r for r in rows if int(r[0]) == q]
        assert 1 <= len(rq) <= 3
        assert [int(r[1]) for r in rq] == list(range(1, len(rq) + 1))
        scores = [float(r[3]) for r in rq]
        assert scores == sorted(scores, reverse=True)
        for r in rq:    # cid column is the doc's true cluster id
            assert r[4] == index.cid_of_doc[int(r[2])]

    qf = tmp_path / "qs.txt"
    qf.write_text("find eta theta iota item 2\n")
    cli.main(base + ["--top-k", "2", "--json", "--packed",
                     "--queries-file", str(qf)])
    out = capsys.readouterr().out
    obj = json.loads([ln for ln in out.strip().splitlines()
                      if ln.startswith("{")][-1])
    assert obj["query"].startswith("find eta")
    assert 1 <= len(obj["results"]) <= 2
    for r in obj["results"]:
        assert isinstance(r["doc_id"], int)
        assert r["cid"] == index.cid_of_doc[r["doc_id"]]
