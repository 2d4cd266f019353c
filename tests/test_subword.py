"""In-repo trainable subword tokenizers (reference capability:
sentencepiece T5 + WordPiece BERT, environment.yml:151,160) and the
text → real subwords → model path VERDICT.md flagged as missing."""

import numpy as np
import pytest

from gdr_tpu.data.subword import (EOS, PAD, SubwordTokenizer, train_unigram,
                                  train_wordpiece)
from gdr_tpu.data.tokenize import load_tokenizer

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "natural questions is a benchmark for open domain question answering",
    "generative dense retrieval clusters documents hierarchically",
    "memory can be a burden for purely generative retrievers",
    "the dense index absorbs new documents without retraining",
    "tokenization splits words into subword units",
] * 4


@pytest.fixture(scope="module")
def unigram(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok") / "uni.json")
    return train_unigram(CORPUS, vocab_size=200, path=path)


@pytest.fixture(scope="module")
def wordpiece(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok") / "wp.json")
    return train_wordpiece(CORPUS, vocab_size=200, path=path)


def test_unigram_conventions(unigram):
    """pad=0, eos=1, an </s> terminates every sequence (T5 convention)."""
    ids, mask = unigram.encode("the quick brown fox", 16)
    n = int(mask.sum())
    assert n >= 2
    assert ids[n - 1] == EOS                 # trailing </s>
    assert (ids[n:] == PAD).all()
    assert (mask[:n] == 1).all() and (mask[n:] == 0).all()
    assert ids.max() < unigram.vocab_size


def test_unigram_roundtrip(unigram):
    ids, mask = unigram.encode("the quick brown fox", 32)
    text = unigram.decode(ids[: int(mask.sum()) - 1])
    assert "quick" in text and "fox" in text


def test_wordpiece_conventions(wordpiece):
    """[CLS] … [SEP] framing, pad=0 (BERT convention)."""
    ids, mask = wordpiece.encode("dense retrieval", 16)
    n = int(mask.sum())
    assert ids[0] == wordpiece.tok.token_to_id("[CLS]")
    assert ids[n - 1] == wordpiece.tok.token_to_id("[SEP]")
    assert (ids[n:] == 0).all()


def test_batch_matches_single(unigram):
    texts = CORPUS[:4]
    bids, bmask = unigram.encode_batch(texts, 24)
    for i, t in enumerate(texts):
        ids, mask = unigram.encode(t, 24)
        np.testing.assert_array_equal(bids[i], ids)
        np.testing.assert_array_equal(bmask[i], mask)


def test_truncation(unigram):
    ids, mask = unigram.encode(" ".join(CORPUS), 8)
    assert ids.shape == (8,)
    assert mask.sum() == 8


def test_load_tokenizer_resolves_json(unigram):
    tok = load_tokenizer(unigram.path)
    assert isinstance(tok, SubwordTokenizer)
    assert tok.vocab_size == unigram.vocab_size
    # absent path still falls back to the hermetic hash tokenizer
    fallback = load_tokenizer("/nonexistent/tok.json", vocab_size=128)
    assert fallback.vocab_size == 128


def test_text_to_subwords_to_model(unigram):
    """The full text → real subword ids → GenerativeRetriever forward path
    (the round-1 gap: tokenizer-dependent tests never exercised a real
    vocab)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from gdr_tpu.config import tiny_config
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params, shift_right

    cfg = dataclasses.replace(tiny_config().model,
                              vocab_size=unigram.vocab_size,
                              dropout_rate=0.0)
    model = GenerativeRetriever(cfg)
    params = init_params(model, jax.random.PRNGKey(0), input_len=12)
    ids, mask = unigram.encode_batch(
        ["what is generative dense retrieval", "the lazy dog"], 12)
    labels = np.zeros((2, cfg.max_output_length), np.int32)
    labels[:, 0] = 2
    labels[:, 1] = 1
    out = model.apply(params, jnp.asarray(ids), jnp.asarray(mask),
                      shift_right(jnp.asarray(labels)),
                      jnp.asarray((labels != 0).astype(np.int32)))
    assert np.isfinite(np.asarray(out["logits"]))[
        np.asarray(out["logits"]) > -1e8].all()
    assert np.isfinite(np.asarray(out["query_embedding"])).all()
