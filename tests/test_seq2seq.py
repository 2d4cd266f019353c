import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import tiny_config
from gdr_tpu.data.dataset import build_train_set_from_tokens
from gdr_tpu.models.seq2seq import Seq2SeqLM, generate_queries, sample

CFG = tiny_config(kary=3, max_output_length=5)
MCFG = dataclasses.replace(CFG.model, dropout_rate=0.0)


def _model_and_params():
    model = Seq2SeqLM(MCFG)
    b, s = 2, 8
    ids = jnp.zeros((b, s), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids,
                        jnp.ones_like(ids), ids[:, :4], jnp.ones((b, 4)))
    return model, params


def test_forward_shapes():
    model, params = _model_and_params()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 100, size=(2, 8)), jnp.int32)
    logits = model.apply(params, ids, jnp.ones_like(ids), ids[:, :4],
                         jnp.ones((2, 4), jnp.int32))
    assert logits.shape == (2, 4, MCFG.vocab_size)


def test_sample_stops_and_pads():
    model, params = _model_and_params()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 100, size=(3, 8)), jnp.int32)
    toks = sample(model, params, ids, jnp.ones_like(ids), max_len=6,
                  rng=jax.random.PRNGKey(1), temperature=1.0, top_k=5)
    toks = np.asarray(toks)
    assert toks.shape == (3, 6)
    for row in toks:
        eos = np.nonzero(row == 1)[0]
        if eos.size:                       # everything after EOS is PAD
            assert np.all(row[eos[0] + 1:] == 0)


def test_generate_queries_and_assembly():
    model, params = _model_and_params()
    rng = np.random.default_rng(0)
    docs = jnp.asarray(rng.integers(2, 100, size=(2, 8)), jnp.int32)
    q_toks, src = generate_queries(model, params, docs, jnp.ones_like(docs),
                                   n_per_doc=3, max_len=6,
                                   rng=jax.random.PRNGKey(2))
    assert q_toks.shape == (6, 6)
    np.testing.assert_array_equal(np.asarray(src), [0, 0, 0, 1, 1, 1])
    paths = [[0, 1], [2]]
    ts = build_train_set_from_tokens(
        np.asarray(q_toks), (np.asarray(q_toks) != 0).astype(np.int32),
        [int(s) for s in np.asarray(src)], paths, MCFG)
    assert len(ts) == 6
    assert ts.labels[0, 0] == 0 * 3 + 0 + 2   # path [0,1] first token
    assert ts.labels[3, 0] == 0 * 3 + 2 + 2   # path [2]


def test_qg_train_step_loss_decreases():
    import optax
    from gdr_tpu.models.seq2seq import make_qg_train_step

    model = Seq2SeqLM(MCFG)
    rng = np.random.default_rng(0)
    docs = jnp.asarray(rng.integers(2, 100, size=(4, 8)), jnp.int32)
    queries = np.zeros((4, 6), np.int32)
    for i in range(4):
        n = int(rng.integers(2, 5))
        queries[i, :n] = rng.integers(2, 100, size=n)
        queries[i, n] = 1
    batch = {"doc_tokens": docs, "doc_mask": jnp.ones_like(docs),
             "query_tokens": jnp.asarray(queries)}
    params = model.init({"params": jax.random.PRNGKey(0)}, docs,
                        jnp.ones_like(docs), jnp.asarray(queries),
                        jnp.ones((4, 6)))
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = make_qg_train_step(model, opt)
    first = None
    for i in range(25):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(i))
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.7, (first, float(loss))
