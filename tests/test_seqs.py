import numpy as np

from c3poa_tpu.utils import (
    encode, decode, revcomp, revcomp_encoded,
    phred_to_array, array_to_phred, round_to_base,
)


def test_encode_decode_roundtrip():
    s = "ACGTNACGT"
    assert decode(encode(s)) == s
    assert encode("acgt").tolist() == [0, 1, 2, 3]
    assert encode("XRY-").tolist() == [4, 4, 4, 4]


def test_revcomp():
    assert revcomp("ACGT") == "ACGT"
    assert revcomp("AACGTN") == "NACGTT"
    s = "ACGTTGCANN"
    assert decode(revcomp_encoded(encode(s))) == revcomp(s)
    assert revcomp(revcomp(s)) == s


def test_phred():
    q = "!I5"
    arr = phred_to_array(q)
    assert arr.tolist() == [0, 40, 20]
    assert array_to_phred(arr) == q


def test_round_to_base_bankers():
    # reference C3POa.py:106-108 uses Python round (banker's rounding)
    assert round_to_base(125, 50) == 100   # 2.5 -> 2
    assert round_to_base(175, 50) == 200   # 3.5 -> 4
    assert round_to_base(174, 50) == 150
    assert round_to_base(76, 50) == 100
    assert round_to_base(25, 50) == 0      # 0.5 -> 0
