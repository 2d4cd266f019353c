"""Reference-fork oracle: runs the ACTUAL vendored fork from
/root/reference/GDR_model/transformers (HF 3.4 + the GDR modifications) in an
isolated subprocess and dumps weights + golden outputs to an .npz.

Run as a subprocess (never import into the test process: the vendored
package registers itself as `transformers` and would poison the installed
one used by other tests):

    python tests/ref_oracle.py forward <out.npz>
    python tests/ref_oracle.py beam <out.npz>

Nothing here is copied from the reference; this file only *invokes* it to
produce golden values for tests/test_ref_parity.py.
"""

from __future__ import annotations

import sys

REF = "/root/reference/GDR_model"

# tiny operating point shared with the test (keep in sync)
D_MODEL = 32
D_KV = 8
N_HEADS = 4
D_FF = 48
N_ENC = 2
N_DEC = 2
KARY = 5
MAX_OUT = 4
DECODE_V = KARY * MAX_OUT + 2
ADAPTOR_LAYERS = 1
ADAPTOR_HEADS = 8          # hardcoded nhead=8 in the fork (modeling_t5.py:1240)
VOCAB = 64
BATCH = 3
ENC_LEN = 7


def _import_reference():
    import collections
    import collections.abc
    for n in ("Sequence", "Mapping", "MutableMapping", "Iterable",
              "Callable", "Hashable", "Sized"):
        if not hasattr(collections, n):
            setattr(collections, n, getattr(collections.abc, n))
    sys.path.insert(0, REF)
    import transformers  # noqa: F401  (the vendored fork)
    assert transformers.__version__ == "3.4.0", transformers.__version__
    return transformers


def _build_model(tr):
    import torch

    cfg = tr.T5Config(
        vocab_size=VOCAB, d_model=D_MODEL, d_kv=D_KV, d_ff=D_FF,
        num_layers=N_ENC, num_heads=N_HEADS, dropout_rate=0.0,
        decoder_start_token_id=0, eos_token_id=1, pad_token_id=0,
        tie_word_embeddings=False,
        # GDR custom fields (ride through kwargs, main_models.py:748-780)
        num_decoder_layers=N_DEC, decode_embedding=2,
        decode_vocab_size=DECODE_V, output_vocab_size=KARY,
        max_output_length=MAX_OUT, adaptor_decode=True,
        adaptor_efficient=True, adaptor_layer_num=ADAPTOR_LAYERS,
        tie_decode_embedding=False, hierarchic_decode=False,
        Rdrop=0.0, Rdrop_only_decoder=False,
        denoising=False, multiple_decoder=False,
        embedding_distillation=0.0, weight_distillation=0.0,
        use_cache=False,
    )
    torch.manual_seed(0)
    model = tr.modeling_t5.T5ForConditionalGeneration(cfg)
    model.eval()
    # the gdr_tpu adaptor is biasless (T5-style): zero the torch-only biases
    # so both parameterisations compute the same function
    with torch.no_grad():
        for layer in model.adaptor.layers:
            layer.self_attn.in_proj_bias.zero_()
            layer.self_attn.out_proj.bias.zero_()
            layer.multihead_attn.in_proj_bias.zero_()
            layer.multihead_attn.out_proj.bias.zero_()
            layer.linear1.bias.zero_()
            layer.linear2.bias.zero_()
    # determinism in train() mode: the adaptor hardcodes dropout=0.1
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0          # float attr, not an nn.Dropout module
    return model


def _inputs():
    import numpy as np
    rng = np.random.default_rng(42)
    input_ids = rng.integers(2, VOCAB, size=(BATCH, ENC_LEN))
    attn = np.ones((BATCH, ENC_LEN), np.int64)
    attn[1, 5:] = 0          # one padded row exercises the encoder mask
    input_ids[1, 5:] = 0

    def cid(digits):
        toks = [p * KARY + d + 2 for p, d in enumerate(digits)] + [1]
        return toks

    # rows: full depth-3 path, full depth-3 path, short depth-2 path (padded)
    labels = np.full((BATCH, MAX_OUT), -100, np.int64)
    for b, digits in enumerate([[0, 2, 4], [3, 1, 0], [2, 4]]):
        t = cid(digits)
        labels[b, : len(t)] = t
    dec_mask = (labels != -100).astype(np.int64)
    return input_ids.astype(np.int64), attn, labels, dec_mask


def run_forward(out_path: str) -> None:
    import numpy as np
    import torch

    tr = _import_reference()
    model = _build_model(tr)
    input_ids, attn, labels, dec_mask = _inputs()

    model.train()            # training path: logits + logit_mask, plain CE
    grabbed = {}

    def grab(name):
        def hook(mod, args, out):
            t = out[0] if isinstance(out, tuple) else out
            if hasattr(t, "last_hidden_state"):
                t = t.last_hidden_state
            grabbed[name] = t.detach().numpy()
        return hook

    model.encoder.register_forward_hook(grab("enc_hidden"))
    model.decoder.register_forward_hook(grab("dec_hidden"))
    model.adaptor.register_forward_hook(grab("adaptor_out"))
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(input_ids),
                    attention_mask=torch.from_numpy(attn),
                    labels=torch.from_numpy(labels),
                    decoder_attention_mask=torch.from_numpy(dec_mask),
                    return_dict=True)
    data = {
        "input_ids": input_ids, "attn": attn, "labels": labels,
        "dec_mask": dec_mask,
        "logits": out.logits.detach().numpy(),
        "loss": np.asarray(out.loss.detach().numpy()),
        **grabbed,
    }
    for k, v in model.state_dict().items():
        data["sd." + k] = v.detach().numpy()
    np.savez(out_path, **data)
    print(f"forward oracle -> {out_path} loss={float(data['loss']):.6f}")


class _Node:
    """Minimal stand-in for the reference trie Node (main_models.py:112-127):
    the beam-search walker only touches ``.children``."""

    def __init__(self):
        self.children = {}


def _toy_trie():
    # depths ≤ MAX_OUT-2: at the final decode position the reference's
    # eval-mode mask (select_valid_embedding) does NOT force EOS while its
    # train-mode mask (and gdr_tpu) does — shorter paths keep the oracle on
    # semantics where both agree (the shipped configs decode depth-3 CIDs
    # with max_output_length=10, far from the edge)
    paths = [[0, 2], [0, 4], [3, 1], [3, 0], [2, 4], [2, 0],
             [1, 1], [4, 0], [4, 2], [1, 3]]
    root = _Node()
    for digits in paths:
        toks = [p * KARY + d + 2 for p, d in enumerate(digits)] + [1]
        cur = root
        for t in toks:
            cur = cur.children.setdefault(t, _Node())
    return root, paths


def run_beam(out_path: str, num_beams: int = 4) -> None:
    import numpy as np
    import torch

    tr = _import_reference()
    from transformers import generation_utils_previous as gup

    base = tr.modeling_t5.T5ForConditionalGeneration

    class RefModelPrev(gup.GenerationMixin, base):
        """Bind the _previous_ beam search (live trie masking,
        generation_utils_previous.py:714-729) over the custom model.
        The model's own input-preparation hooks must win over the mixin's
        generic defaults (MRO puts the mixin first)."""

        prepare_inputs_for_generation = base.prepare_inputs_for_generation
        _reorder_cache = base._reorder_cache

    # rebuild with the subclass so `generate` resolves to the previous mixin
    cfg_model = _build_model(tr)
    model = RefModelPrev(cfg_model.config)
    model.load_state_dict(cfg_model.state_dict())
    model.eval()
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    root, paths = _toy_trie()
    input_ids, attn, _, _ = _inputs()
    with torch.no_grad():
        result = model.generate(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.from_numpy(attn),
            num_beams=num_beams, num_return_sequences=num_beams,
            max_length=MAX_OUT + 1,          # + leading pad token
            length_penalty=1.0, early_stopping=False,
            use_cache=False,
            decode_embedding=2, decode_vocab_size=DECODE_V,
            decode_tree=root, output_scores=True,
        )
    output, _enc = result            # generate returns (output, enc|None)
    seqs, scores = output            # output_scores=True → (decoded, scores)
    data = {
        "input_ids": input_ids, "attn": attn,
        "sequences": seqs.detach().numpy(),
        "scores": np.asarray([float(s) for s in scores], np.float32),
    }
    cfg_sd = cfg_model.state_dict()
    for k, v in cfg_sd.items():
        data["sd." + k] = v.detach().numpy()
    np.savez(out_path, **data)
    print(f"beam oracle -> {out_path} sequences={data['sequences'].shape}")


if __name__ == "__main__":
    mode, out = sys.argv[1], sys.argv[2]
    if mode == "forward":
        run_forward(out)
    elif mode == "beam":
        run_beam(out)
    else:
        raise SystemExit(f"unknown mode {mode}")
