"""Archive encryption: scrypt key stretching + AES-256 CTR framing.

Format (reference: /root/reference/ZSFX/zsfx.cpp:544-567 InputArchive,
libzpaq.cpp:666-668 stretchKey, 545-556 AES_CTR::encrypt):

- an encrypted archive starts with a 32-byte random salt; everything after
  is AES-256-CTR with key = scrypt(SHA-256(password), salt, N=2^14, r=8,
  p=1, dklen=32);
- the CTR counter block for byte offset ``off`` is
  ``salt[0:8] (two MSB-first words) || (off//16) as two 32-bit words``,
  i.e. keystream is keyed by the absolute file offset *including* the salt
  header, so random access decrypts without chaining.

The AES core is the native engine's (FIPS-197 vector-checked); scrypt comes
from hashlib (OpenSSL).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

from .. import native


SALT_LEN = 32


def stretch_key(password: str | bytes, salt: bytes) -> bytes:
    """scrypt(SHA-256(password), salt, N=16384, r=8, p=1) -> 32 bytes."""
    if isinstance(password, str):
        password = password.encode()
    pw = hashlib.sha256(password).digest()
    return hashlib.scrypt(pw, salt=salt, n=1 << 14, r=8, p=1, maxmem=1 << 28,
                          dklen=32)


def new_salt() -> bytes:
    """Random salt; first byte must not collide with archive magic
    (reference random() avoids 'z' and '7', libzpaq.cpp:670-697)."""
    while True:
        s = os.urandom(SALT_LEN)
        if s[0] not in (ord("z"), ord("7")):
            return s


class Cipher:
    """AES-256-CTR keyed by absolute archive offset."""

    def __init__(self, key: bytes, salt: bytes):
        if len(key) != 32:
            raise ValueError("key must be 32 bytes")
        self.key = key
        self.iv8 = salt[:8]

    @classmethod
    def from_password(cls, password: str | bytes, salt: bytes) -> "Cipher":
        return cls(stretch_key(password, salt), salt)

    def crypt(self, data: bytes, offset: int) -> bytes:
        """Encrypt or decrypt (CTR is symmetric) at the given offset."""
        return native.aes_ctr(self.key, self.iv8, data, offset)


def decrypt_archive(raw: bytes, password: str | bytes) -> bytes:
    """Salted archive bytes -> plaintext archive bytes."""
    if len(raw) < SALT_LEN:
        raise ValueError("archive too short for salt header")
    salt = raw[:SALT_LEN]
    c = Cipher.from_password(password, salt)
    plain = c.crypt(raw[SALT_LEN:], SALT_LEN)
    if plain[:4] != b"7kSt" and not (plain[:3] == b"zPQ" and plain[3] >= 1):
        # match the reference's password check (zsfx.cpp:1323-1332)
        raise ValueError("password incorrect (bad archive magic)")
    return plain


def encrypt_new_archive(plain: bytes, password: str | bytes,
                        salt: Optional[bytes] = None) -> bytes:
    """Plaintext archive bytes -> salt + ciphertext."""
    salt = salt or new_salt()
    c = Cipher.from_password(password, salt)
    return salt + c.crypt(plain, SALT_LEN)


def encrypt_append(chunk: bytes, password: str | bytes, salt: bytes,
                   file_offset: int) -> bytes:
    """Encrypt a chunk being appended at ``file_offset`` (absolute)."""
    c = Cipher.from_password(password, salt)
    return c.crypt(chunk, file_offset)
