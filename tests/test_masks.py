import numpy as np

from gdr_tpu.ops.masks import NEG_INF, positional_logit_mask


def test_positional_mask_shape_and_validity():
    kary, L = 4, 5
    m = positional_logit_mask(kary, L)
    assert m.shape == (L, kary * L + 2)
    # step 0: tokens 2..5 and EOS valid, pad invalid
    valid0 = np.nonzero(m[0] == 0)[0]
    np.testing.assert_array_equal(valid0, [1, 2, 3, 4, 5])
    # step 2: tokens 10..13 and EOS
    valid2 = np.nonzero(m[2] == 0)[0]
    np.testing.assert_array_equal(valid2, [1, 10, 11, 12, 13])
    # last step: EOS only (ref modeling_t5.py:1296)
    validL = np.nonzero(m[-1] == 0)[0]
    np.testing.assert_array_equal(validL, [1])
    # pad never valid
    assert np.all(m[:, 0] == NEG_INF)


def test_nonpositional_mask():
    m = positional_logit_mask(4, 3, position=False)
    assert m.shape == (3, 6)
    np.testing.assert_array_equal(np.nonzero(m[0] == 0)[0], [1, 2, 3, 4, 5])
