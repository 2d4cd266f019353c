"""Configuration dataclasses for gdr_tpu.

The reference drives everything through ~100 argparse flags
(`GDR_model/main.py:260-448`); only ~40 of them are meaningful (the rest are
dead or debug artifacts — see SURVEY.md §2.1).  Here the meaningful surface is
organised into typed dataclasses grouped by subsystem.  Derived quantities
(e.g. ``decode_vocab_size = output_vocab_size * max_output_length + 2``,
reference `GDR_model/main_models.py:739-744`) are computed properties so they
can never drift out of sync.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of the generative retriever (T5 encoder-decoder).

    Mirrors the custom `T5Config` fields set in reference
    `GDR_model/main_models.py:748-780` plus the model-size presets of
    `GDR_model/main.py:422-442` (t5-base: 12 enc / 6 dec layers, d_model 768).
    """

    vocab_size: int = 32128          # input (text) vocabulary
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12             # encoder depth
    num_decoder_layers: int = 6      # asymmetric decoder (ref modeling_t5.py:1201-1219)
    num_heads: int = 12
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    # (the FF nonlinearity is relu — T5 v1.0, the only variant the
    # reference's HF-3.4 fork ships; no knob is exposed for it)

    # --- docid decoding head -------------------------------------------------
    kary: int = 30                   # branching factor of the CID tree
    max_output_length: int = 10      # max CID depth + eos
    position: bool = True            # position-aware decode vocabulary
    tie_decode_embedding: bool = True

    # --- PAWA adaptor (per-prefix adaptive lm-head) --------------------------
    # ref modeling_t5.py:1229-1244 (efficient variant), applied at 1615-1639
    adaptor_decode: bool = True
    adaptor_efficient: bool = True   # False → the reference's slow variant
                                     # (full [d,d] transform per prefix)
    adaptor_layer_num: int = 4
    adaptor_num_heads: int = 8
    # 0 → min(4·d_model, 2048); the reference constructs its adaptor with
    # torch's nn.TransformerDecoderLayer defaults, i.e. dim_feedforward=2048
    # regardless of d_model (modeling_t5.py:1240) — identical at d_model=768
    adaptor_d_ff: int = 0

    # --- regularisation ------------------------------------------------------
    rdrop: float = 0.1               # R-Drop weight (ref `--Rdrop`)
    rdrop_loss: str = "Contrast"     # forced in ref modeling_t5.py:1169
    input_dropout: float = 0.5       # prob. of applying 10% input token dropout
                                     # (ref main_models.py:938-941)
    denoising: bool = False          # masked reconstruction + discrimination
                                     # aux heads (ref modeling_t5.py:1466-1501)
    # distillation aux losses (ref modeling_t5.py:1697-1717; the reference
    # wires its versions to fake np.random targets — SURVEY.md §6 defect 7 —
    # here they train against real in-framework targets: the positive doc's
    # store embedding and the trie's prefix-node embeddings)
    embedding_distillation: float = 0.0
    weight_distillation: float = 0.0

    # --- dual encoder (stage 2 doc tower) ------------------------------------
    encoder_d_model: int = 768
    # dense-stage query representation (ref --use_query_embed_encoder /
    # _decoder_avg / _decoder_special, main.py:376-381):
    # "encoder" = encoder first-position state (reference default),
    # "decoder_avg" = masked mean of decoder states,
    # "decoder_special" = decoder state at the EOS position
    query_source: str = "encoder"
    # learned 2d'→d' fusion of decoder-side and encoder query reps — the
    # reference's "concate" fusion_strategy, whose fusion_layer it comments
    # out of its own model (main_models.py:797, used at :1561-1562)
    concate_fusion: bool = False

    # --- memory --------------------------------------------------------------
    remat: bool = False              # rematerialize transformer blocks in the
                                     # backward pass (jax.checkpoint)

    @property
    def output_vocab_size(self) -> int:
        """Digits per CID position (== kary).  Ref `--output_vocab_size`."""
        return self.kary

    @property
    def decode_vocab_size(self) -> int:
        """Positional decode vocabulary: pad(0) + eos(1) + kary tokens per
        position.  Ref main_models.py:739-744."""
        if self.position:
            return self.output_vocab_size * self.max_output_length + 2
        return self.output_vocab_size + 2

    def scaled(self, preset: str) -> "ModelConfig":
        """Model-size presets mirroring ref main.py:422-442."""
        presets = {
            "base": dict(num_layers=12, num_decoder_layers=6, d_model=768,
                         num_heads=12, d_ff=3072, d_kv=64),
            "large": dict(num_layers=24, num_decoder_layers=12, d_model=1024,
                          num_heads=16, d_ff=4096, d_kv=64),
            "small": dict(num_layers=6, num_decoder_layers=3, d_model=512,
                          num_heads=8, d_ff=2048, d_kv=64),
            "tiny": dict(num_layers=2, num_decoder_layers=2, d_model=64,
                         num_heads=4, d_ff=128, d_kv=16),
        }
        return dataclasses.replace(self, **presets[preset])


@dataclass(frozen=True)
class IndexConfig:
    """Hierarchical k-means index / CID tree construction.

    Ref `Data_process/NQ_dataset/kmeans/kmeans.py` (k=30, c=30) and the trie
    build in `GDR_model/main_models.py:690-733`.
    """

    kary: int = 30                   # k-means branching factor (k)
    leaf_cap: int = 30               # max docs per leaf cluster (c)
    max_iters: int = 25              # Lloyd iterations per split
    seed: int = 7
    embedding_dim: int = 768
    minibatch_threshold: int = 1000  # ≥ this → minibatch k-means (ref kmeans.py:53-56)
    minibatch_size: int = 1024
    max_docs_per_cluster: int = 64   # static padding bound for CSR expansion


@dataclass(frozen=True)
class DataConfig:
    """Dataset assembly knobs (ref main.py flags + l1_query behavior)."""

    max_input_length: int = 40       # query tokens (ref `--max_input_length`,
    #                                  = its --inf_max_input_length default)
    doc_length: int = 64             # doc-as-query span (ref `--doc_length`)
    encoder_max_len: int = 128       # doc tokens for dual encoder
    max_intraclass_num: int = 10     # contrastive candidates (ref `--max_intraclass_num`)
    query_type: str = "gtq_qg"       # which query mixes to train on
    aug_query: bool = False
    hard_negative: bool = False
    sample_neg_num: int = 0
    label_length_cutoff: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """Training loop configuration (ref train.sh + main.py + optimizer)."""

    train_batch_size: int = 64
    eval_batch_size: int = 1
    stage2_train_batch_size: int = 32
    stage2_eval_batch_size: int = 1
    num_train_epochs: int = 500
    train_encoder_epoch: int = 51    # stage-1 → stage-2 switch (ref main.py:384)
    learning_rate: float = 2e-4      # T5 encoder + shared embeddings
    decoder_learning_rate: float = 1e-4
    doc_encoder_learning_rate: float = 2e-4
    weight_decay: float = 1e-4
    adam_epsilon: float = 1e-8
    warmup_steps: int = 0
    scheduler: str = "linear"        # "linear" | "exp" (ref main_models.py:1966-1972)
    gradient_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    seed: int = 42
    tau: float = 0.05                # contrastive temperature (ref `--tau`)
    intra_rate: float = 1.0          # intra-cluster denominator weight
    loss_func: str = "tanh"          # similarity squashing: "tanh" | "sigmoid"
    bf16: bool = True                # bf16 compute (TPU-native AMP)
    checkpoint_dir: str = "checkpoints"
    save_top_k: int = 1
    async_checkpointing: bool = False  # background orbax serialization
    monitor: str = "recall1"
    log_every_steps: int = 50
    # stage-2 store refresh: fraction of the corpus re-embedded per eval
    # epoch (rotating slice).  1.0 = full re-embed (the reference
    # re-encodes candidates per eval batch, main_models.py:1455-1462); a
    # fraction amortises the ~full-corpus encode across eval epochs when
    # the corpus is large (round-2 Weak #8)
    stage2_refresh_fraction: float = 1.0


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation / retrieval operating point (ref infer.sh + main.py)."""

    num_beams: int = 100
    num_return_sequences: int = 100
    max_output_length: int = 10
    length_penalty: float = 0.8
    score_rates: Sequence[float] = (0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0)
    recall_ks: Sequence[int] = (1, 5, 10, 20, 50, 100)
    accuracy_ks: Sequence[int] = (1, 20, 100)
    mrr_ks: Sequence[int] = (10, 100)
    map_k: int = 100
    use_query_embed_encoder: bool = True
    use_query_embed_decoder_avg: bool = False
    use_query_embed_decoder_special: bool = False
    # "average" halves the two reps (ref main_models.py:1564-1565);
    # "concate" feeds their concatenation through the model's fusion layer
    # (requires ModelConfig.concate_fusion)
    fusion_strategy: str = "average"
    # decode mode (ref --gen_method, main.py:168-224): "beam" (also what
    # the reference runs for "greedy" — it beam-searches with
    # num_beams=num_return_sequences) or "sample" (the top_k/do_sample
    # path; see ops/beam.sample_cids)
    gen_method: str = "beam"
    temperature: float = 1.0
    sample_top_k: int = 0            # 0 → no top-k filter inside candidates
    sample_seed: int = 0
    # fused Pallas decoder sublayers for the full-width beam steps
    # (ops/pallas/decode_kernel.py): same math, activations stay in VMEM
    fused_decode: bool = False
    # (a fused_pawa sibling existed through round 4: PAWA-adaptor sublayer
    # kernels, hardware-measured SLOWER than XLA's own fusion and removed —
    # PARITY.md "fused PAWA")


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh / parallelism layout.

    The reference only has DDP data-parallelism (ref main.py:86-104); here
    the mesh supports dp (batch), mp (parameter/tensor), and the doc-embedding
    store is sharded over the flattened mesh.
    """

    dp: int = -1                     # -1 → all devices
    mp: int = 1
    axis_names: Sequence[str] = ("dp", "mp")
    tp_min_size: int = 1 << 14       # smallest param (elements) worth
                                     # column-sharding over mp


@dataclass(frozen=True)
class GDRConfig:
    """Top-level bundle."""

    model: ModelConfig = field(default_factory=ModelConfig)
    index: IndexConfig = field(default_factory=IndexConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw: Any) -> "GDRConfig":
        return dataclasses.replace(self, **kw)


def tiny_config(kary: int = 4, max_output_length: int = 5, d_model: int = 32,
                embedding_dim: int = 16) -> GDRConfig:
    """A CPU-testable configuration used across the test-suite (single-core
    friendly: 2-layer encoder, 1-layer decoder, 1-layer adaptor)."""
    model = ModelConfig(
        kary=kary, max_output_length=max_output_length,
        d_model=d_model, d_kv=16, d_ff=64, num_layers=2, num_decoder_layers=1,
        num_heads=2, vocab_size=128, encoder_d_model=embedding_dim,
        adaptor_layer_num=1, adaptor_num_heads=2, dropout_rate=0.1)
    index = IndexConfig(kary=kary, leaf_cap=8, embedding_dim=embedding_dim,
                        max_docs_per_cluster=16)
    data = DataConfig(max_input_length=16, doc_length=16, encoder_max_len=32,
                      max_intraclass_num=4)
    train = TrainConfig(train_batch_size=4, eval_batch_size=2,
                        num_train_epochs=2, train_encoder_epoch=1)
    ev = EvalConfig(num_beams=8, num_return_sequences=8,
                    max_output_length=max_output_length)
    return GDRConfig(model=model, index=index, data=data, train=train, eval=ev)
