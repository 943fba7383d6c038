"""ZUC / 128-EEA3 / 128-EIA3 against the 3GPP specification test sets."""

from srslte_emane_tpu.stack import security, zuc


def test_zuc_keystream_test_sets():
    # ZUC spec test set 1 (all-zero key/IV)
    z = zuc.Zuc(bytes(16), bytes(16)).keystream_words(2)
    assert [int(w) for w in z] == [0x27BEDE74, 0x018082DA]
    # test set 2 (all-ff)
    z = zuc.Zuc(bytes([0xFF] * 16), bytes([0xFF] * 16)).keystream_words(2)
    assert [int(w) for w in z] == [0x0657CFA0, 0x7096398B]
    # test set 3 (random)
    k = bytes.fromhex("3d4c4be96a82fdaeb58f641db17b455b")
    iv = bytes.fromhex("84319aa8de6915ca1f6bda6bfbd8c766")
    z = zuc.Zuc(k, iv).keystream_words(2)
    assert [int(w) for w in z] == [0x14F1C272, 0x3279C419]


def test_eea3_test_set_1():
    ck = bytes.fromhex("173d14ba5003731d7a60049470f00a29")
    m = bytes.fromhex("6cf65340735552ab0c9752fa6f9025fe0bd675d9005875b200000000")
    c = zuc.eea3(ck, 0x66035492, 0xF, 0, m, length_bits=193)
    assert c.hex() == "a6c85fc66afb8533aafc2518dfe784940ee1e4b030238cc800000000"
    # decryption round-trips
    assert zuc.eea3(ck, 0x66035492, 0xF, 0, c, length_bits=193) == \
        bytes.fromhex("6cf65340735552ab0c9752fa6f9025fe0bd675d9005875b200000000")


def test_eia3_test_sets():
    assert zuc.eia3(bytes(16), 0, 0, 0, b"\x00", 1).hex() == "c8a9595e"
    ik = bytes.fromhex("47054125561eb2dda94059da05097850")
    assert zuc.eia3(ik, 0x561EB2DD, 0x14, 0, bytes(12), 90).hex() == "6719a088"


def test_security_dispatch_eea3_eia3():
    key = bytes(range(16))
    data = b"hello zuc dispatch"
    c = security.cipher(security.EEA3, key, 7, 3, 1, data)
    assert c != data
    assert security.decipher(security.EEA3, key, 7, 3, 1, c) == data
    mac = security.integrity(security.EIA3, key, 7, 3, 1, data)
    assert len(mac) == 4
    assert mac != security.integrity(security.EIA3, key, 8, 3, 1, data)
