import numpy as np

from urmap_tpu import alphabet


def test_encode_decode_roundtrip():
    s = "ACGTacgtNnRYU"
    codes = alphabet.encode(s, is_genome=False)
    assert alphabet.decode(codes) == "ACGTACGTNNNNT"  # U→T, ambiguity→N


def test_genome_vs_read_n_sentinels_never_equal():
    g = alphabet.encode("N", is_genome=True)
    r = alphabet.encode("N", is_genome=False)
    assert g[0] == alphabet.GENOME_N and r[0] == alphabet.READ_N
    assert g[0] != r[0]


def test_revcomp():
    assert alphabet.revcomp_str("ACGTN") == "NACGT"
    codes = alphabet.encode("GATTACA", is_genome=False)
    assert np.array_equal(alphabet.revcomp(alphabet.revcomp(codes)), codes)
    assert alphabet.revcomp_str("GATTACA") == "TGTAATC"


def test_complement_table_involution():
    c = alphabet.COMP_CODE
    assert np.array_equal(c[c], np.arange(alphabet.NUM_CODES, dtype=np.uint8))
