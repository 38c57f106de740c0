"""AES-CTR cipher pinned to the published FIPS-197 / NIST SP 800-38A
vectors (the same spec the reference's javax.crypto provider implements)."""

import numpy as np
import pytest

from orc_ray.codecs.aes import (
    LocalKeyProvider,
    _counter_blocks,
    _encrypt_blocks,
    _key_schedule,
    aes_ctr_xor,
    derive_iv,
    derive_local_key,
)


def _ecb1(key: bytes, pt: bytes) -> bytes:
    rk = _key_schedule(key)
    return _encrypt_blocks(np.frombuffer(pt, np.uint8).reshape(1, 16).copy(), rk).tobytes()


def test_fips197_appendix_c1_aes128():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert _ecb1(key, pt).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_fips197_appendix_c3_aes256():
    key = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert _ecb1(key, pt).hex() == "8ea2b7ca516745bfeafc49904b496089"


_PT4 = bytes.fromhex(
    "6bc1bee22e409f96e93d7e117393172a"
    "ae2d8a571e03ac9c9eb76fac45af8e51"
    "30c81c46a35ce411e5fbc1191a0a52ef"
    "f69f2445df4f9b17ad2b417be66c3710"
)
_IV = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")


def test_nist_sp800_38a_f51_ctr_aes128():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    exp = (
        "874d6191b620e3261bef6864990db6ce"
        "9806f66b7970fdff8617187bb9fffdff"
        "5ae4df3edbd5d35e5b4f09020db03eab"
        "1e031dda2fbe03d1792170a0f3009cee"
    )
    ct = aes_ctr_xor(key, _IV, _PT4)
    assert ct.hex() == exp
    assert aes_ctr_xor(key, _IV, ct) == _PT4  # CTR is its own inverse


def test_nist_sp800_38a_f55_ctr_aes256():
    key = bytes.fromhex(
        "603deb1015ca71be2b73aef0857d77811f352c073b6108d72d9810a30914dff4"
    )
    exp = (
        "601ec313775789a5b7a7f504bbf3d228"
        "f443e3ca4d62b59aca84e990cacaf5c5"
        "2b0930daa23de94ce87017ba2d84988d"
        "dfc9c58db67aada613c2dd08457941a6"
    )
    assert aes_ctr_xor(key, _IV, _PT4).hex() == exp


def test_ctr_counter_carry_across_low64():
    # IV whose low 64 bits are about to wrap: the 128-bit big-endian
    # increment must carry into the high word (NIST CTR semantics)
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    iv = bytes(8) + b"\xff" * 8  # lo = 2^64 - 1
    blocks = _counter_blocks(iv, 3)
    as_ints = [int.from_bytes(blocks[i].tobytes(), "big") for i in range(3)]
    base = int.from_bytes(iv, "big")
    assert as_ints == [base, base + 1, base + 2]


def test_odd_lengths_and_empty():
    key = bytes(range(16))
    iv = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 33, 1000):
        data = bytes(range(256)) * 4
        data = data[:n]
        ct = aes_ctr_xor(key, iv, data)
        assert len(ct) == n
        assert aes_ctr_xor(key, iv, ct) == data
    assert aes_ctr_xor(key, iv, b"") == b""


def test_key_schedule_rejects_bad_lengths():
    with pytest.raises(ValueError):
        _key_schedule(bytes(24))  # AES-192 deliberately unsupported
    with pytest.raises(ValueError):
        aes_ctr_xor(bytes(16), bytes(8), b"x")  # short IV


def test_derivations_deterministic_and_distinct():
    master = bytes(range(32))
    k1 = derive_local_key(master, "text", "k1")
    assert k1 == derive_local_key(master, "text", "k1")
    assert k1 != derive_local_key(master, "text", "k2")  # rotation changes key
    assert k1 != derive_local_key(master, "title", "k1")  # per-column keys
    assert len(k1) == 32 and len(derive_local_key(bytes(16), "c", "k1")) == 16
    iv = derive_iv(k1, "text", 0, b"digest")
    assert len(iv) == 16
    assert iv != derive_iv(k1, "text", 1, b"digest")
    assert iv != derive_iv(k1, "text", 0, b"other")
    # keyed PRF: without the local key the IV is unpredictable, so the
    # public header gives no offline plaintext-confirmation oracle
    k2 = derive_local_key(master, "text", "k2")
    assert iv != derive_iv(k2, "text", 0, b"digest")


def test_local_key_provider():
    kp = LocalKeyProvider({"pii": bytes(16)})
    kp.add_key("audit", bytes(32))
    assert kp.get_key("pii") == bytes(16)
    assert kp.get_key("nope") is None
    assert kp.names() == ["audit", "pii"]
    with pytest.raises(ValueError):
        kp.add_key("bad", bytes(10))
