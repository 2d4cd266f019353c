import numpy as np
import pytest

from gdr_tpu.ops import codec


@pytest.mark.parametrize("kary", [4, 10, 30])
@pytest.mark.parametrize("position", [True, False])
def test_roundtrip(kary, position, rng):
    for _ in range(50):
        depth = int(rng.integers(1, 8))
        digits = [int(d) for d in rng.integers(0, kary, size=depth)]
        toks = codec.encode_cid(digits, kary, position)
        assert toks[-1] == codec.EOS_ID
        # decode expects a leading start token as emitted by the decoder
        seq = np.array([0] + toks)
        cid = codec.decode_tokens(seq, kary, position)
        assert cid == "-".join(str(d) for d in digits)


def test_positional_token_values():
    # token = position * kary + digit + 2 (ref main_models.py:297-321)
    assert codec.encode_cid([3, 0, 7], kary=10, position=True) == [5, 12, 29, 1]
    assert codec.encode_cid([3, 0, 7], kary=10, position=False) == [5, 2, 9, 1]


def test_encode_cid_string():
    assert codec.encode_cid_string("3-17-5", kary=30) == [5, 49, 67, 1]


def test_decode_without_eos_pads():
    # no EOS found → decode full remainder (ref prints and keeps going)
    seq = np.array([0, 5, 12])
    assert codec.decode_tokens(seq, kary=10) == "3-0"


def test_digits_to_label_and_mask():
    labels, mask = codec.digits_to_label([2, 1], kary=4, max_output_length=5)
    np.testing.assert_array_equal(labels, [4, 7, 1, 0, 0])
    np.testing.assert_array_equal(mask, [1, 1, 1, 0, 0])


def test_tokens_to_digits():
    toks = np.array([[4, 7, 1, 0, 0]])
    digits = codec.tokens_to_digits(toks, kary=4)
    np.testing.assert_array_equal(digits, [[2, 1, -1, -1, -1]])
