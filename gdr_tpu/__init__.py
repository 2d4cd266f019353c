"""gdr_tpu — a TPU-native generative dense retrieval framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of the GDR
reference system ("Generative Dense Retrieval: Memory Can Be a Burden",
EACL 2024): a two-stage retriever that

  1. generates hierarchical cluster IDs (CIDs) with a T5 encoder-decoder
     under trie-constrained beam search (coarse, generative stage), and
  2. re-ranks documents inside the candidate clusters by dense dot-product
     similarity, fusing beam log-probabilities with dense scores
     (fine, dense stage).

Unlike the reference (PyTorch + Lightning + a vendored HuggingFace fork),
everything retrieval-critical here is expressed as device-resident tensors
and compiled XLA programs: the prefix trie is a packed children table, beam
search is a `lax.scan` with no host synchronisation, and the re-rank stage
is a fused gather·dot·top-k kernel over a (possibly sharded) document
embedding store.

Subpackages
-----------
- ``gdr_tpu.ops``     — codec, trie tensors, k-means, beam search, re-rank, losses
- ``gdr_tpu.models``  — Flax T5 generative retriever (PAWA adaptor), dual encoder
- ``gdr_tpu.parallel``— mesh construction, sharding rules, distributed top-k
- ``gdr_tpu.data``    — corpus ingest, training data assembly, tokenization
- ``gdr_tpu.train``   — train loop, multi-LR optimizer, checkpointing
- ``gdr_tpu.eval``    — metric suite and evaluation harness
- ``gdr_tpu.index``   — index building (embed + k-means + trie) and expansion
"""

__version__ = "0.1.0"

from gdr_tpu import config as config  # noqa: F401
