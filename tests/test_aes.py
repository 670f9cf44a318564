"""AES core (functions/aes.py) pinned against the official vectors:
FIPS-197 Appendix C known-answer tests for all three key sizes, the
Appendix B worked example, and NIST SP 800-38A CBC-AES128."""

from __future__ import annotations

import numpy as np
import pytest

from documentai_ray.functions.aes import (cbc_decrypt, cbc_encrypt,
                                          decrypt_block, encrypt_block,
                                          key_expansion)

PT = bytes.fromhex("00112233445566778899aabbccddeeff")


@pytest.mark.parametrize("key_hex,ct_hex", [
    ("000102030405060708090a0b0c0d0e0f",
     "69c4e0d86a7b0430d8cdb78070b4c55a"),                    # AES-128
    ("000102030405060708090a0b0c0d0e0f1011121314151617",
     "dda97ca4864cdfe06eaf70a0ec0d7191"),                    # AES-192
    ("000102030405060708090a0b0c0d0e0f"
     "101112131415161718191a1b1c1d1e1f",
     "8ea2b7ca516745bfeafc49904b496089"),                    # AES-256
])
def test_fips197_appendix_c(key_hex, ct_hex):
    words = key_expansion(bytes.fromhex(key_hex))
    assert encrypt_block(PT, words).hex() == ct_hex
    assert decrypt_block(bytes.fromhex(ct_hex), words) == PT


def test_fips197_appendix_b_example():
    words = key_expansion(bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"))
    ct = encrypt_block(bytes.fromhex("3243f6a8885a308d313198a2e0370734"),
                       words)
    assert ct.hex() == "3925841d02dc09fbdc118597196a0b32"


def test_sp800_38a_cbc_aes128():
    k = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    p1 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    assert cbc_encrypt(k, iv, p1)[:16].hex() == \
        "7649abac8119b246cee98e9b12e9197d"


def test_cbc_roundtrip_all_paddings():
    rng = np.random.RandomState(7)
    k = bytes(rng.randint(0, 256, 16, dtype=np.uint8))
    iv = bytes(rng.randint(0, 256, 16, dtype=np.uint8))
    for n in (0, 1, 15, 16, 17, 31, 32, 1000):
        data = bytes(rng.randint(0, 256, n, dtype=np.uint8))
        assert cbc_decrypt(k, iv, cbc_encrypt(k, iv, data)) == data


def test_cbc_rejects_malformed():
    k = iv = bytes(16)
    with pytest.raises(ValueError):
        cbc_decrypt(k, iv, b"short")         # not a block multiple
    with pytest.raises(ValueError):
        cbc_decrypt(k, iv, b"")              # empty
    # random block: padding check must fail (probability 1-2^-8-ish;
    # this fixed vector is verified to fail)
    with pytest.raises(ValueError):
        cbc_decrypt(k, iv, bytes(range(16)))
    with pytest.raises(ValueError):
        key_expansion(b"badlen")


def test_vectorized_decrypt_pins_scalar_blocks():
    """The numpy block-parallel decrypt path must be bit-identical to
    the scalar decrypt_block for every key size."""
    import numpy as np

    from documentai_ray.functions import aes
    rng = np.random.default_rng(0)
    for klen in (16, 24, 32):
        key = bytes(rng.integers(0, 256, klen, dtype=np.uint8))
        words = aes.key_expansion(key)
        data = bytes(rng.integers(0, 256, 16 * 37, dtype=np.uint8))
        scalar = b"".join(aes.decrypt_block(data[i:i + 16], words)
                          for i in range(0, len(data), 16))
        assert aes._decrypt_blocks_np(data, words).tobytes() == scalar
