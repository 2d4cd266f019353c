"""Positional k-ary docid codec.

A CID (cluster ID) is a root-to-leaf path through the k-ary k-means tree,
written as a dash-joined digit string, e.g. ``"3-17-5"``.  The generative
model emits it as a sequence of *position-aware* tokens so that every tree
depth owns a private slice of the decode vocabulary:

    token(depth d, digit c) = d * kary + c + 2        (pad=0, eos=1)

Reference semantics: ``encode_single_newid`` (GDR_model/main_models.py:297-321)
and ``decode_token`` (GDR_model/main_models.py:322-346).  The vectorised
variants here operate on whole [N, L] arrays so encode/decode can run inside
jit if needed.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

PAD_ID = 0
EOS_ID = 1
TOKEN_OFFSET = 2  # first CID token id (after pad and eos)


def encode_cid(digits: Sequence[int], kary: int, position: bool = True) -> list[int]:
    """Encode a digit path into decode-vocab tokens, with trailing EOS.

    Matches reference ``encode_single_newid`` (main_models.py:297-321): the
    returned list has no leading pad/start token and ends with EOS.
    """
    if position:
        toks = [d * kary + int(c) + TOKEN_OFFSET for d, c in enumerate(digits)]
    else:
        toks = [int(c) + TOKEN_OFFSET for c in digits]
    return toks + [EOS_ID]


def encode_cid_string(cid: str, kary: int, position: bool = True) -> list[int]:
    """Encode a dash-joined CID string (e.g. ``"3-17-5"``)."""
    return encode_cid([int(c) for c in cid.split("-")], kary, position)


def decode_tokens(seq: np.ndarray, kary: int, position: bool = True) -> str:
    """Decode one token sequence back to a dash-joined CID string.

    Matches reference ``decode_token`` (main_models.py:322-346): the leading
    element (decoder start / pad) is dropped, decoding stops at the first EOS,
    and the positional offset is stripped.
    """
    seq = np.asarray(seq)
    eos_pos = np.nonzero(seq == EOS_ID)[0]
    end = int(eos_pos[0]) if eos_pos.size else len(seq)
    body = seq[1:end]
    if position:
        offset = np.arange(len(body)) * kary + TOKEN_OFFSET
    else:
        offset = TOKEN_OFFSET
    digits = body - offset
    return "-".join(str(int(d)) for d in digits)


def decode_token_batch(seqs: np.ndarray, kary: int, position: bool = True) -> list[str]:
    """Decode a [N, L] batch of sequences to CID strings.

    Vectorised equivalent of N ``decode_tokens`` calls (same semantics:
    leading start token dropped, stop at first EOS) — the per-sequence
    NumPy calls dominated eval's host-side decode at beam 100
    (``decode_host_mean_ms`` in the evaluator phase timings).
    """
    seqs = np.asarray(seqs)
    if seqs.ndim == 1:
        return [decode_tokens(seqs, kary, position)]
    body = seqs[:, 1:]
    digits = tokens_to_digits(body, kary, position)
    is_eos = body == EOS_ID
    has = is_eos.any(axis=1)
    end = np.where(has, is_eos.argmax(axis=1), body.shape[1])
    return ["-".join(map(str, row[:e])) for row, e in
            zip(digits.tolist(), end.tolist())]


def tokens_to_digits(tokens: np.ndarray, kary: int, position: bool = True) -> np.ndarray:
    """Vectorised token→digit conversion for a [N, L] token array.

    Positions holding pad/eos map to -1.  Runs in NumPy (host) but the same
    arithmetic is used on-device inside the beam decoder.
    """
    tokens = np.asarray(tokens)
    pos = np.arange(tokens.shape[-1])
    if position:
        digits = tokens - pos * kary - TOKEN_OFFSET
    else:
        digits = tokens - TOKEN_OFFSET
    return np.where(tokens >= TOKEN_OFFSET, digits, -1)


def digits_to_label(digits: Sequence[int], kary: int, max_output_length: int,
                    position: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Build fixed-length (labels, mask) arrays for training.

    Matches ``decode_embedding_process`` (main_models.py:545-578): tokens then
    EOS then pad to ``max_output_length``; mask is 1 on tokens+EOS.
    """
    toks = encode_cid(digits, kary, position)
    assert len(toks) <= max_output_length, (
        f"CID depth {len(toks) - 1} too deep for max_output_length={max_output_length}")
    labels = np.zeros(max_output_length, dtype=np.int32)
    labels[: len(toks)] = toks
    mask = (labels != PAD_ID).astype(np.int32)
    return labels, mask
