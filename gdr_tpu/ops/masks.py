"""Positional-validity logit masks for the decode vocabulary.

With the position-aware codec, step *p* of the decoder may only emit one of
``{p*kary+2 … p*kary+kary+1}`` or EOS.  The reference precomputes this as an
additive ``-1e9`` mask buffer (modeling_t5.py:1279-1301, applied at 1643-1644
during training and via ``select_valid_embedding`` at 1546-1571 in inference).
We reproduce it as a single ``[L, V]`` table shared by both paths.
"""

from __future__ import annotations

import numpy as np

from gdr_tpu.ops.codec import EOS_ID, TOKEN_OFFSET

NEG_INF = -1e9


def positional_logit_mask(kary: int, max_output_length: int,
                          position: bool = True) -> np.ndarray:
    """Additive mask [L, V]: 0 where valid, -1e9 elsewhere.

    Row p corresponds to the logits predicting output position p.  The last
    row allows only EOS (reference `valid_indices[-1,:] = 1`,
    modeling_t5.py:1296).
    """
    if position:
        vocab = kary * max_output_length + TOKEN_OFFSET
    else:
        vocab = kary + TOKEN_OFFSET
    mask = np.full((max_output_length, vocab), NEG_INF, dtype=np.float32)
    for p in range(max_output_length):
        if p == max_output_length - 1:
            mask[p, EOS_ID] = 0.0
            continue
        if position:
            lo = p * kary + TOKEN_OFFSET
            mask[p, lo:lo + kary] = 0.0
        else:
            mask[p, TOKEN_OFFSET:TOKEN_OFFSET + kary] = 0.0
        mask[p, EOS_ID] = 0.0
    return mask
