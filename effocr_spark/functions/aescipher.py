"""Minimal pure-Python AES-128/192/256 + CBC — stdlib only.

Backs the PDF standard security handler's /AESV2 crypt filter
(functions/pdftext.py): modern "encrypted" web PDFs use AES-128-CBC
with a per-object key, and most carry an empty user password
(permissions-only locking), so decrypting them is a container-parsing
job, not a secrets job. No cryptography library ships in this
container, so this is FIPS-197 from first principles: the S-box is
COMPUTED (GF(2^8) inverse + affine transform), not a pasted table, and
both directions are implemented (encrypt for fixture generation,
decrypt for extraction).

Performance note: ~1 µs/byte in CPython — fine for content streams
(KBs/doc inside an Arrow-batched UDF); a real deployment drops
`cryptography`'s AES in behind the same two functions.
"""

from __future__ import annotations


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B  # x^8 + x^4 + x^3 + x + 1
        b >>= 1
    return p


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse via exp/log tables over generator 3
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def inv(a: int) -> int:
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = bytearray(256)
    for a in range(256):
        q = inv(a)
        # affine transform: b ^ rot1 ^ rot2 ^ rot3 ^ rot4 ^ 0x63
        r = q
        for _ in range(4):
            q = ((q << 1) | (q >> 7)) & 0xFF
            r ^= q
        sbox[a] = r ^ 0x63
    inv_sbox = bytearray(256)
    for a, s in enumerate(sbox):
        inv_sbox[s] = a
    return bytes(sbox), bytes(inv_sbox)


SBOX, INV_SBOX = _build_sbox()
_RCON = [0x01]
while len(_RCON) < 14:
    _RCON.append(_gf_mul(_RCON[-1], 2))

# precomputed GF(2^8) multiplication tables for the (Inv)MixColumns
# constants — turns the per-byte _gf_mul bit loop into one list index
# (the PDF R6 password hash drives ~8k block encryptions per password,
# so block speed is user-visible)
_M2, _M3, _M9, _M11, _M13, _M14 = (
    [_gf_mul(a, c) for a in range(256)] for c in (2, 3, 9, 11, 13, 14))


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16/24/32 bytes")
    nr = nk + 6
    words = [list(key[4 * i: 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [sum(words[4 * r: 4 * r + 4], []) for r in range(nr + 1)]


def _add_round_key(s: list[int], rk: list[int]) -> None:
    for i in range(16):
        s[i] ^= rk[i]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    _add_round_key(s, rks[0])
    nr = len(rks) - 1
    for rnd in range(1, nr + 1):
        s = [SBOX[b] for b in s]                 # SubBytes
        s = [s[_SHIFT[i]] for i in range(16)]    # ShiftRows
        if rnd != nr:                            # MixColumns
            t = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c: 4 * c + 4]
                t += [
                    _M2[a0] ^ _M3[a1] ^ a2 ^ a3,
                    a0 ^ _M2[a1] ^ _M3[a2] ^ a3,
                    a0 ^ a1 ^ _M2[a2] ^ _M3[a3],
                    _M3[a0] ^ a1 ^ a2 ^ _M2[a3],
                ]
            s = t
        _add_round_key(s, rks[rnd])
    return bytes(s)


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    nr = len(rks) - 1
    _add_round_key(s, rks[nr])
    for rnd in range(nr - 1, -1, -1):
        s = [s[_INV_SHIFT[i]] for i in range(16)]   # InvShiftRows
        s = [INV_SBOX[b] for b in s]                # InvSubBytes
        _add_round_key(s, rks[rnd])
        if rnd != 0:                                # InvMixColumns
            t = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c: 4 * c + 4]
                t += [
                    _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3],
                    _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3],
                    _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3],
                    _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3],
                ]
            s = t
    return bytes(s)


def cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """AES-CBC with PKCS#7 padding → iv is NOT prepended (callers
    decide; the PDF format prepends it to the stream data)."""
    rks = _expand_key(key)
    pad = 16 - len(plaintext) % 16
    data = plaintext + bytes([pad]) * pad
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw AES-CBC over already-block-aligned data (no padding) — the
    primitive the PDF R6 password hash (Algorithm 2.B) iterates and
    the /UE file-key unwrap uses."""
    if len(data) % 16 or not data:
        raise ValueError("CBC-nopad data not block-aligned")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def cbc_decrypt_nopad(key: bytes, iv: bytes, ciphertext: bytes) -> bytes:
    """Raw AES-CBC decrypt without padding removal (the /UE // /OE
    entries wrap exactly 32 key bytes)."""
    if len(ciphertext) % 16 or not ciphertext:
        raise ValueError("CBC-nopad ciphertext not block-aligned")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(ciphertext), 16):
        blk = ciphertext[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks), prev))
        prev = blk
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, ciphertext: bytes) -> bytes:
    """AES-CBC decrypt + PKCS#7 unpad; raises ValueError on bad
    padding/length (callers quarantine)."""
    if len(ciphertext) % 16 or not ciphertext:
        raise ValueError("AES-CBC ciphertext not block-aligned")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(ciphertext), 16):
        blk = ciphertext[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES-CBC padding")
    return bytes(out[:-pad])
