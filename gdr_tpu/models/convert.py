"""Pretrained-weight import: HuggingFace T5 → gdr_tpu parameter trees.

The reference warm-starts from t5-base by copying the pretrained encoder and
shared-embedding tensors into its custom model
(``param.copy_(pretrain_params[name])`` for names starting with ``shared.``
/ ``encoder.``, main_models.py:786-793) — the decoder side is custom
(decode vocabulary, asymmetric depth, PAWA) and trains from scratch.

``load_t5_encoder`` does the same against a HuggingFace T5 state dict
(torch tensors or numpy arrays, standard ``t5-base`` naming).  Dense kernels
are transposed (torch stores [out, in], flax [in, out]).  Works offline from
a local checkpoint directory via ``state_dict_from_pretrained``.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node[p]
    old = node[path[-1]]
    assert old.shape == value.shape, (path, old.shape, value.shape)
    node[path[-1]] = value.astype(np.asarray(old).dtype)


def hf_encoder_mapping(num_layers: int) -> dict[str, list[str]]:
    """HF t5 state-dict name → path inside ``params['params']`` (this repo).

    Marked "T" entries require a transpose (handled in load_t5_encoder).
    """
    m: dict[str, list[str]] = {
        "shared.weight": ["shared", "embedding"],
        "encoder.final_layer_norm.weight": ["encoder", "final_norm", "scale"],
        ("encoder.block.0.layer.0.SelfAttention."
         "relative_attention_bias.weight"): ["encoder", "rel_bias",
                                             "rel_embedding"],
    }
    for i in range(num_layers):
        hf = f"encoder.block.{i}.layer"
        my = f"block_{i}"
        for proj in ("q", "k", "v", "o"):
            m[f"{hf}.0.SelfAttention.{proj}.weight"] = \
                ["encoder", my, "attn", proj, "kernel"]
        m[f"{hf}.0.layer_norm.weight"] = ["encoder", my, "ln1", "scale"]
        m[f"{hf}.1.DenseReluDense.wi.weight"] = ["encoder", my, "ff", "wi",
                                                 "kernel"]
        m[f"{hf}.1.DenseReluDense.wo.weight"] = ["encoder", my, "ff", "wo",
                                                 "kernel"]
        m[f"{hf}.1.layer_norm.weight"] = ["encoder", my, "ln2", "scale"]
    return m


def load_t5_encoder(params: dict, state_dict: Mapping[str, Any],
                    num_layers: int) -> dict:
    """Copy HF T5 encoder + shared embeddings into a gdr_tpu param tree.

    ``params``: the tree returned by ``init_params`` (mutated copy returned).
    Unmatched HF entries (decoder.*, lm_head) are ignored, mirroring the
    reference's encoder-only warm start.
    """
    import jax

    tree = jax.tree_util.tree_map(np.asarray, params)
    inner = tree["params"]
    mapping = hf_encoder_mapping(num_layers)
    copied = 0
    for hf_name, path in mapping.items():
        if hf_name not in state_dict:
            raise KeyError(f"missing {hf_name} in state dict")
        val = _np(state_dict[hf_name])
        # torch Linear stores [out, in]; flax Dense kernels are [in, out]
        if path[-1] == "kernel":
            val = val.T
        _set(inner, path, val)
        copied += 1
    assert copied == len(mapping)
    return tree


def export_t5_encoder(params: dict, num_layers: int) -> dict[str, np.ndarray]:
    """Inverse of ``load_t5_encoder``: emit the encoder + shared-embedding
    tensors of a gdr_tpu tree under HF t5 state-dict names (kernels
    transposed back to torch's [out, in]).

    Used to hand a trained gdr_tpu encoder to another run's ``--t5-ckpt``
    warm start (and by the e2e warm-start test, which donates a trained
    tiny encoder instead of downloading t5-base)."""
    import jax

    inner = jax.tree_util.tree_map(np.asarray, params)["params"]
    sd: dict[str, np.ndarray] = {}
    for hf_name, path in hf_encoder_mapping(num_layers).items():
        node = inner
        for p in path:
            node = node[p]
        val = np.asarray(node)
        if path[-1] == "kernel":
            val = val.T
        sd[hf_name] = val
    return sd


def t5_model_overrides(path: str) -> dict[str, int]:
    """ModelConfig field overrides matching a local HF T5 checkpoint, so the
    warm-started encoder tensors fit the tree exactly (the reference
    hard-assumes t5-base shapes, main_models.py:748-793)."""
    from transformers import T5Config
    c = T5Config.from_pretrained(path)
    return dict(vocab_size=c.vocab_size, d_model=c.d_model, d_kv=c.d_kv,
                d_ff=c.d_ff, num_layers=c.num_layers, num_heads=c.num_heads)


def bert_model_overrides(path: str) -> dict[str, int]:
    """DocEncoder field overrides matching a local HF BERT/DPR checkpoint."""
    from transformers import BertConfig
    c = BertConfig.from_pretrained(path)
    return dict(vocab_size=c.vocab_size, d_model=c.hidden_size,
                num_layers=c.num_hidden_layers,
                num_heads=c.num_attention_heads,
                d_ff=c.intermediate_size,
                max_position=c.max_position_embeddings)


def bert_state_dict_from_pretrained(path: str) -> Mapping[str, Any]:
    """Load a local HF BERT-family checkpoint's state dict (no network).
    Accepts plain BERT, DPR context encoders, and AR2 exports —
    ``load_bert_encoder`` normalises the name prefixes."""
    from transformers import AutoModel
    model = AutoModel.from_pretrained(path)
    return model.state_dict()


def load_bert_encoder(params: dict, state_dict: Mapping[str, Any],
                      num_layers: int, num_heads: int) -> dict:
    """Copy a HuggingFace BERT state dict into a gdr_tpu DocEncoder tree.

    The reference's doc tower is a DPR/BERT context encoder with AR2 weights
    (main_models.py:66-75); this loads any standard ``bert-base``-style
    checkpoint (also accepts DPR's ``ctx_encoder.bert_model.`` or AR2's
    ``ctx_model.`` prefixes).  Flax attention kernels are reshaped to
    [d, heads, head_dim] (query/key/value) and [heads, head_dim, d] (out).
    """
    import jax

    # normalise prefixes
    sd = {}
    for k, v in state_dict.items():
        for pref in ("ctx_encoder.bert_model.", "ctx_model.", "bert.",
                     "bert_model.", ""):
            if k.startswith(pref):
                sd[k[len(pref):]] = v
                break

    tree = jax.tree_util.tree_map(np.asarray, params)
    inner = tree["params"]
    d = np.asarray(inner["tok_embed"]["embedding"]).shape[1]
    hd = d // num_heads

    def put(path, val):
        _set(inner, path, val)

    put(["tok_embed", "embedding"],
        _np(sd["embeddings.word_embeddings.weight"]))
    put(["pos_embed", "embedding"],
        _np(sd["embeddings.position_embeddings.weight"]))
    put(["type_embed", "embedding"],
        _np(sd["embeddings.token_type_embeddings.weight"]))
    put(["embed_ln", "scale"], _np(sd["embeddings.LayerNorm.weight"]))
    put(["embed_ln", "bias"], _np(sd["embeddings.LayerNorm.bias"]))
    for i in range(num_layers):
        hf = f"encoder.layer.{i}"
        my = f"block_{i}"
        for hf_n, my_n in (("query", "query"), ("key", "key"),
                           ("value", "value")):
            w = _np(sd[f"{hf}.attention.self.{hf_n}.weight"]).T  # [d, d]
            put([my, "attn", my_n, "kernel"], w.reshape(d, num_heads, hd))
            put([my, "attn", my_n, "bias"],
                _np(sd[f"{hf}.attention.self.{hf_n}.bias"]).reshape(
                    num_heads, hd))
        wo = _np(sd[f"{hf}.attention.output.dense.weight"]).T    # [d, d]
        put([my, "attn", "out", "kernel"], wo.reshape(num_heads, hd, d))
        put([my, "attn", "out", "bias"],
            _np(sd[f"{hf}.attention.output.dense.bias"]))
        put([my, "ln1", "scale"],
            _np(sd[f"{hf}.attention.output.LayerNorm.weight"]))
        put([my, "ln1", "bias"],
            _np(sd[f"{hf}.attention.output.LayerNorm.bias"]))
        put([my, "ff1", "kernel"],
            _np(sd[f"{hf}.intermediate.dense.weight"]).T)
        put([my, "ff1", "bias"], _np(sd[f"{hf}.intermediate.dense.bias"]))
        put([my, "ff2", "kernel"], _np(sd[f"{hf}.output.dense.weight"]).T)
        put([my, "ff2", "bias"], _np(sd[f"{hf}.output.dense.bias"]))
        put([my, "ln2", "scale"], _np(sd[f"{hf}.output.LayerNorm.weight"]))
        put([my, "ln2", "bias"], _np(sd[f"{hf}.output.LayerNorm.bias"]))
    return tree


def load_gdr_reference(params: dict, state_dict: Mapping[str, Any],
                       num_layers: int, num_decoder_layers: int,
                       adaptor_layers: int, adaptor_heads: int = 8) -> dict:
    """Copy the reference fork's FULL custom model (encoder + decoder +
    decode embeddings + lm head + efficient-PAWA adaptor) into a
    ``GenerativeRetriever`` parameter tree.

    Source naming is the vendored fork's ``T5ForConditionalGeneration``
    (reference modeling_t5.py:1153-1301): stock T5 stacks, a separate
    ``decode_embeddings`` table, an untied ``lm_head`` and the efficient
    adaptor built from ``nn.TransformerDecoderLayer`` (:1236-1244).

    Torch-vs-flax convention handling:
      - Dense kernels transpose ([out, in] → [in, out]).
      - torch MultiheadAttention scales q by head_dim**-0.5 after the
        projection; folded into the q kernel here (our Attention is
        unscaled, T5-style).
      - torch biases on the adaptor's attention/FF projections have no
        counterpart (our adaptor is biasless by design) — they must be zero
        in the source model; asserted.
      - ``adaptor_linear.weight`` [d·V, d] (out index o = i·V + v) becomes
        our U [d_j, V, d_i]: ``W.reshape(d, V, d).transpose(2, 1, 0)``.
    """
    import jax

    tree = jax.tree_util.tree_map(np.asarray, params)
    inner = tree["params"]

    # --- encoder + shared (same mapping as the stock HF loader) -------------
    for hf_name, path in hf_encoder_mapping(num_layers).items():
        val = _np(state_dict[hf_name])
        if path[-1] == "kernel":
            val = val.T
        _set(inner, path, val)

    # --- decoder stack -------------------------------------------------------
    _set(inner, ["decoder", "final_norm", "scale"],
         _np(state_dict["decoder.final_layer_norm.weight"]))
    _set(inner, ["decoder", "rel_bias", "rel_embedding"],
         _np(state_dict[
             "decoder.block.0.layer.0.SelfAttention."
             "relative_attention_bias.weight"]))
    # HF-3.4 T5 also has a cross-attention rel bias shared from layer 0
    _set(inner, ["decoder", "cross_rel_bias", "rel_embedding"],
         _np(state_dict[
             "decoder.block.0.layer.1.EncDecAttention."
             "relative_attention_bias.weight"]))
    for i in range(num_decoder_layers):
        hf = f"decoder.block.{i}.layer"
        my = f"block_{i}"
        for proj in ("q", "k", "v", "o"):
            _set(inner, ["decoder", my, "self_attn", proj, "kernel"],
                 _np(state_dict[f"{hf}.0.SelfAttention.{proj}.weight"]).T)
            _set(inner, ["decoder", my, "cross_attn", proj, "kernel"],
                 _np(state_dict[f"{hf}.1.EncDecAttention.{proj}.weight"]).T)
        _set(inner, ["decoder", my, "ln1", "scale"],
             _np(state_dict[f"{hf}.0.layer_norm.weight"]))
        _set(inner, ["decoder", my, "ln2", "scale"],
             _np(state_dict[f"{hf}.1.layer_norm.weight"]))
        _set(inner, ["decoder", my, "ff", "wi", "kernel"],
             _np(state_dict[f"{hf}.2.DenseReluDense.wi.weight"]).T)
        _set(inner, ["decoder", my, "ff", "wo", "kernel"],
             _np(state_dict[f"{hf}.2.DenseReluDense.wo.weight"]).T)
        _set(inner, ["decoder", my, "ln3", "scale"],
             _np(state_dict[f"{hf}.2.layer_norm.weight"]))

    # --- decode embeddings + lm head ------------------------------------------
    _set(inner, ["decode_embed", "embedding"],
         _np(state_dict["decode_embeddings.weight"]))
    if "lm_head" in inner:
        _set(inner, ["lm_head"], _np(state_dict["lm_head.weight"]).T)

    # --- efficient PAWA adaptor ------------------------------------------------
    if "pawa" in inner:
        d = _np(state_dict["adaptor_embeddings"]).shape[-1]
        head_dim = d // adaptor_heads
        scale = head_dim ** -0.5
        _set(inner, ["pawa", "memory"], _np(state_dict["adaptor_embeddings"]))
        for i in range(adaptor_layers):
            hf = f"adaptor.layers.{i}"
            my = ["pawa", f"layer_{i}"]
            for attn_hf, attn_my in (("self_attn", "self_attn"),
                                     ("multihead_attn", "cross_attn")):
                w = _np(state_dict[f"{hf}.{attn_hf}.in_proj_weight"])
                bias = state_dict.get(f"{hf}.{attn_hf}.in_proj_bias")
                if bias is not None:
                    assert not _np(bias).any(), (
                        "adaptor attention biases must be zero: the gdr_tpu "
                        "adaptor is biasless (T5-style)")
                wq, wk, wv = w[:d], w[d:2 * d], w[2 * d:]
                _set(inner, my + [attn_my, "q", "kernel"], (wq * scale).T)
                _set(inner, my + [attn_my, "k", "kernel"], wk.T)
                _set(inner, my + [attn_my, "v", "kernel"], wv.T)
                _set(inner, my + [attn_my, "o", "kernel"],
                     _np(state_dict[f"{hf}.{attn_hf}.out_proj.weight"]).T)
                out_b = state_dict.get(f"{hf}.{attn_hf}.out_proj.bias")
                if out_b is not None:
                    assert not _np(out_b).any(), (
                        "adaptor out_proj bias must be zero: the gdr_tpu "
                        "adaptor is biasless (T5-style)")
            for lin, ff in (("linear1", "ff1"), ("linear2", "ff2")):
                _set(inner, my + [ff, "kernel"],
                     _np(state_dict[f"{hf}.{lin}.weight"]).T)
                lb = state_dict.get(f"{hf}.{lin}.bias")
                if lb is not None:
                    assert not _np(lb).any(), (
                        f"adaptor {lin} bias must be zero: the gdr_tpu "
                        "adaptor is biasless (T5-style)")
            for n in (1, 2, 3):
                _set(inner, my + [f"ln{n}", "scale"],
                     _np(state_dict[f"{hf}.norm{n}.weight"]))
                _set(inner, my + [f"ln{n}", "bias"],
                     _np(state_dict[f"{hf}.norm{n}.bias"]))
        w = _np(state_dict["adaptor_linear.weight"])           # [d*V, d]
        v = w.shape[0] // d
        _set(inner, ["pawa", "u"], w.reshape(d, v, d).transpose(2, 1, 0))
    return tree


def state_dict_from_pretrained(path: str) -> Mapping[str, Any]:
    """Load a local HF T5 checkpoint's state dict (no network).  A ``.npz``
    path loads an ``export_t5_encoder`` dump instead — the torch-free
    interchange for donating a trained gdr_tpu encoder to another run."""
    if path.endswith(".npz"):
        z = np.load(path)
        return {k: z[k] for k in z.files}
    from transformers import T5ForConditionalGeneration
    model = T5ForConditionalGeneration.from_pretrained(path)
    return model.state_dict()
