"""PDF standard security handler (ISO 32000-1 §7.6.3) — RC4 variants.

Real crawls are full of "owner-locked" PDFs: encrypted with an OWNER
password but an EMPTY user password, which conforming readers open
transparently (the typical "you may read but not edit" document). This
module implements the standard security handler's Algorithms 1-5 for
V1/V2 (RC4 40..128-bit, revisions 2-3) AND V4 R4 crypt filters (/V2
RC4 and /AESV2 — AES-128-CBC via functions/aes.py, IV-prefixed
streams, the salted per-object key), so `pdfread` can extract text
from such files: derive the file key from the empty user password,
verify it against /U, then decrypt each object's streams with the
per-object key. AES-256 (V5 /AESV3) and non-empty user passwords
raise ValueError — honest unsupported, not faked.

Everything here is the public spec: the 32-byte padding constant and the
MD5/RC4 recipes are printed verbatim in ISO 32000-1 and the predecessor
Adobe PDF references. Reference parity: the reference's PDF path opens
documents through PyMuPDF (``fitz.open`` — entity-extraction-service/
app.py:515-533), which transparently decrypts exactly this
empty-user-password class; here the same behavior is engine-internal.
"""

from __future__ import annotations

import hashlib
import re
import struct

# §7.6.3.3, the standard padding string
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (ARCFOUR) — symmetric, used for both directions."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_o(owner_pw: bytes, user_pw: bytes, *, r: int,
              key_bytes: int) -> bytes:
    """Algorithm 3: the /O entry."""
    h = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:key_bytes]
    o = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(k ^ i for k in key), o)
    return o


def compute_key(user_pw: bytes, o: bytes, p: int, file_id: bytes, *,
                r: int, key_bytes: int) -> bytes:
    """Algorithm 2: the file encryption key."""
    m = hashlib.md5()
    m.update(_pad_password(user_pw))
    m.update(o[:32])
    m.update(struct.pack("<i", p))
    m.update(file_id)
    h = m.digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:key_bytes]).digest()
    return h[:key_bytes]


def compute_u(key: bytes, file_id: bytes, *, r: int) -> bytes:
    """Algorithm 4 (R2) / Algorithm 5 (R3+): the /U entry."""
    if r == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + file_id).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(k ^ i for k in key), u)
    return u + b"\x00" * 16  # 16 arbitrary padding bytes


def object_key(file_key: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1: the per-object RC4 key."""
    m = hashlib.md5()
    m.update(file_key)
    m.update(struct.pack("<I", num)[:3])
    m.update(struct.pack("<I", gen)[:2])
    return m.digest()[:min(len(file_key) + 5, 16)]


def _parse_crypt_string(raw: bytes) -> bytes:
    """/O and /U values as written: literal ``(…)`` with escapes, or hex
    ``<…>``."""
    raw = raw.strip()
    if raw.startswith(b"<") and not raw.startswith(b"<<"):
        return bytes.fromhex(
            re.sub(rb"[^0-9a-fA-F]", b"", raw[1:-1]).decode())
    if raw.startswith(b"("):
        out = bytearray()
        i = 1
        while i < len(raw) - 1:
            c = raw[i]
            if c == 0x5C and i + 1 < len(raw):
                nxt = raw[i + 1]
                esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                       0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
                if nxt in esc:
                    out.append(esc[nxt])
                    i += 2
                    continue
                if 0x30 <= nxt <= 0x37:  # octal
                    j = i + 1
                    oct_digits = b""
                    while j < len(raw) - 1 and len(oct_digits) < 3 \
                            and 0x30 <= raw[j] <= 0x37:
                        oct_digits += bytes([raw[j]])
                        j += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                    i = j
                    continue
                out.append(nxt)
                i += 2
                continue
            out.append(c)
            i += 1
        return bytes(out)
    raise ValueError("unparseable /O or /U string")


def escape_crypt_string(raw: bytes) -> bytes:
    """Binary string → hex PDF string (what encrypt dicts usually use)."""
    return b"<" + raw.hex().encode() + b">"


# a hex string object inside a dict body (the leading hex digit
# requirement keeps `<<`/`>>` from matching); literal `(…)` strings are
# located by the balance-aware scanner below, because ISO 32000
# §7.3.4.2 allows UNESCAPED balanced parentheses inside literals — a
# regex without recursion would truncate `(a (b) c)` at the first `)`
_PDF_HEX_RE = re.compile(rb"<[0-9a-fA-F][0-9a-fA-F\s]*>")


def _scan_literal_string(dct: bytes, start: int) -> int:
    """End index (exclusive) of the literal string opening at
    ``dct[start] == b'('``, honoring backslash escapes and nested
    balanced parentheses (ISO 32000 §7.3.4.2)."""
    depth = 0
    i = start
    n = len(dct)
    while i < n:
        c = dct[i]
        if c == 0x5C:  # backslash — skip the escaped byte
            i += 2
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unterminated PDF literal string")


def map_dict_strings(dct: bytes, fn) -> bytes:
    """Apply ``fn(raw_bytes) -> raw_bytes`` to every string object in a
    PDF dictionary body, re-embedding the result as a hex string.

    ISO 32000 §7.6.2: the standard security handler encrypts ALL
    strings in a document (with the per-object key), not just streams —
    this is the shared rewrite both the reader (decrypt /Info values,
    outline /Title, /URI actions) and the writer (encrypt them) use.
    Streams are untouched (callers handle them wholesale); names,
    numbers and references contain no strings and pass through."""
    out = bytearray()
    i = 0
    n = len(dct)
    while i < n:
        c = dct[i]
        if c == 0x28:  # ( — literal string, balance-aware
            end = _scan_literal_string(dct, i)
            out += escape_crypt_string(fn(_parse_crypt_string(dct[i:end])))
            i = end
            continue
        if c == 0x3C and i + 1 < n and dct[i + 1] != 0x3C:  # < not <<
            m = _PDF_HEX_RE.match(dct, i)
            if m:
                out += escape_crypt_string(
                    fn(_parse_crypt_string(m.group(0))))
                i = m.end()
                continue
        if c == 0x3C and dct[i:i + 2] == b"<<":
            out += b"<<"
            i += 2
            continue
        out.append(c)
        i += 1
    return bytes(out)


import functools


@functools.lru_cache(maxsize=256)
def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 iterated SHA-2/AES password
    hash: start from SHA-256(pw+salt+udata), then repeat (≥64 rounds,
    stop when the last byte of the round's AES output ≤ round−32):
    K1 = (pw+K+udata)×64; E = AES-128-CBC(K[:16], iv=K[16:32], K1);
    K = SHA-{256,384,512}(E) selected by (first 16 bytes of E) mod 3.
    Deliberately expensive per the spec (an offline-guessing brake);
    memoized because a batch pipeline re-derives the same (password,
    salt) pair for every document of a corpus."""
    import hashlib as _h

    from documentai_ray.functions.aes import cbc_encrypt_nopad

    k = _h.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (_h.sha256, _h.sha384, _h.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def r6_user_entries(file_key: bytes, *, vsalt: bytes, ksalt: bytes,
                    password: bytes = b"") -> tuple[bytes, bytes]:
    """Algorithm 8: (/U 48 bytes, /UE 32 bytes) for the given user
    password (empty by default — the common owner-locked wild case)."""
    from documentai_ray.functions.aes import cbc_encrypt_nopad

    u = hash_2b(password, vsalt) + vsalt + ksalt
    inter = hash_2b(password, ksalt)
    ue = cbc_encrypt_nopad(inter, b"\x00" * 16, file_key)
    return u, ue


def r6_owner_entries(file_key: bytes, u48: bytes, *, vsalt: bytes,
                     ksalt: bytes,
                     password: bytes = b"") -> tuple[bytes, bytes]:
    """Algorithm 9: (/O 48, /OE 32) for the given owner password (hash
    input includes the 48-byte /U)."""
    from documentai_ray.functions.aes import cbc_encrypt_nopad

    o = hash_2b(password, vsalt, u48) + vsalt + ksalt
    inter = hash_2b(password, ksalt, u48)
    oe = cbc_encrypt_nopad(inter, b"\x00" * 16, file_key)
    return o, oe


def recover_user_pw(owner_pw: bytes, o: bytes, *, r: int,
                    key_bytes: int) -> bytes:
    """Algorithm 7 core (R2-R4): decrypt /O with the owner-password RC4
    key, recovering the PADDED user password that drives Algorithm 2."""
    h = hashlib.md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:key_bytes]
    upw = o[:32]
    if r == 2:
        return rc4(key, upw)
    for i in range(19, -1, -1):  # inverse of compute_o's 1..19 passes
        upw = rc4(bytes(k ^ i for k in key), upw)
    return upw


def object_key_aes(file_key: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1 with the /AESV2 salt (ISO 32000 §7.6.2 step b)."""
    m = hashlib.md5()
    m.update(file_key)
    m.update(struct.pack("<I", num)[:3])
    m.update(struct.pack("<I", gen)[:2])
    m.update(b"sAlT")
    return m.digest()[:min(len(file_key) + 5, 16)]


class Decryptor:
    """File-key holder derived from an /Encrypt dictionary + file /ID.
    Handles V1/V2 (RC4, R2/R3) and V4 (R4) with the /StdCF crypt filter
    in /V2 (RC4) or /AESV2 (AES-128-CBC, IV-prefixed streams) mode, and
    V5 R5/R6 (/AESV3).

    ``password`` is tried FIRST as the user password (Algorithm 6 /
    Algorithm 11), then as the OWNER password (Algorithm 7: /O decrypts
    to the padded user password for R2-R4; the /OE envelope for V5) —
    the order ISO 32000 prescribes a conforming reader. Empty default
    covers the ubiquitous owner-locked wild PDF."""

    def __init__(self, encrypt_dct: bytes, file_id: bytes,
                 password: bytes = b"") -> None:
        fm = re.search(rb"/Filter\s*/(\w+)", encrypt_dct)
        if not fm or fm.group(1) != b"Standard":
            raise ValueError("unsupported PDF security handler")
        vm = re.search(rb"/V\s+(\d+)", encrypt_dct)
        rm = re.search(rb"/R\s+(\d+)", encrypt_dct)
        pm = re.search(rb"/P\s+(-?\d+)", encrypt_dct)
        om = re.search(rb"/O\s*(\([^)]*(?:\\\)[^)]*)*\)|<[0-9a-fA-F\s]+>)",
                       encrypt_dct)
        um = re.search(rb"/U\s*(\([^)]*(?:\\\)[^)]*)*\)|<[0-9a-fA-F\s]+>)",
                       encrypt_dct)
        if not (vm and rm and pm and om and um):
            raise ValueError("malformed /Encrypt dictionary")
        v, r = int(vm.group(1)), int(rm.group(1))
        self.aes = False
        self.v5 = False
        # V1/V2 have no crypt filters: every stream AND string encrypts
        # with the file key. V4/V5 route through /StmF and /StrF —
        # honoring an EXPLICIT `/StrF /Identity` (streams encrypted,
        # strings plaintext, legal per ISO 32000 §7.6.5) fixes wild
        # files whose strings were previously garbled by unconditional
        # decryption (ADVICE r4). Absent entries keep the old
        # encrypt-everything behavior, which is what wild writers mean.
        self.streams_encrypted = True
        self.strings_encrypted = True
        if v in (1, 2) and r in (2, 3):
            pass
        elif v == 4 and r == 4:
            stmf = re.search(rb"/StmF\s*/(\w+)", encrypt_dct)
            strf = re.search(rb"/StrF\s*/(\w+)", encrypt_dct)
            self.streams_encrypted = (stmf is None
                                      or stmf.group(1) != b"Identity")
            self.strings_encrypted = (strf is None
                                      or strf.group(1) != b"Identity")
            cfm = re.search(rb"/CFM\s*/(\w+)", encrypt_dct)
            if not cfm:
                raise ValueError("V4 encryption without /CFM")
            elif cfm.group(1) == b"AESV2":
                self.aes = True
            elif cfm.group(1) != b"V2":
                raise ValueError(
                    f"unsupported crypt filter /{cfm.group(1).decode()}")
        elif v == 5 and r in (5, 6):
            # AES-256 (/AESV3): SHA-2 password machinery, the FILE key
            # encrypts every stream directly (no per-object derivation);
            # empty user password verified via Algorithm 11. R6 (ISO
            # 32000-2) hashes with the iterated Algorithm 2.B; the
            # deprecated Adobe R5 is the same machinery with a plain
            # SHA-256(pw + salt [+ udata]) in its place.
            import hashlib as _h

            from documentai_ray.functions.aes import cbc_decrypt_nopad

            uem = re.search(rb"/UE\s*<([0-9a-fA-F\s]+)>", encrypt_dct)
            if not uem:
                raise ValueError("V5 encryption without /UE")
            u = _parse_crypt_string(um.group(1))
            if len(u) < 48:
                raise ValueError("short V5 /U entry")
            ue = bytes.fromhex(re.sub(rb"\s", b"", uem.group(1)).decode())

            def _h2(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
                if r == 6:
                    return hash_2b(pw, salt, udata)
                return _h.sha256(pw + salt + udata).digest()  # R5

            def try_user(pw: bytes) -> bytes | None:
                vsalt, ksalt = u[32:40], u[40:48]
                if _h2(pw, vsalt) != u[:32]:
                    return None
                return cbc_decrypt_nopad(_h2(pw, ksalt), b"\x00" * 16, ue)

            def try_owner(pw: bytes) -> bytes | None:
                o48 = _parse_crypt_string(om.group(1))
                oem = re.search(rb"/OE\s*<([0-9a-fA-F\s]+)>", encrypt_dct)
                if len(o48) < 48 or not oem:
                    return None
                u48 = u[:48]
                if _h2(pw, o48[32:40], u48) != o48[:32]:
                    return None
                oe = bytes.fromhex(
                    re.sub(rb"\s", b"", oem.group(1)).decode())
                return cbc_decrypt_nopad(_h2(pw, o48[40:48], u48),
                                         b"\x00" * 16, oe)

            key = try_user(password)
            if key is None:
                key = try_owner(password)
            if key is None and password:
                key = try_user(b"")  # fall back to the no-password case
            if key is None:
                raise ValueError(
                    "PDF password required or wrong (user and owner "
                    "verification both failed)")
            self.key = key
            self.aes = True
            self.v5 = True
            stmf = re.search(rb"/StmF\s*/(\w+)", encrypt_dct)
            strf = re.search(rb"/StrF\s*/(\w+)", encrypt_dct)
            self.streams_encrypted = (stmf is None
                                      or stmf.group(1) != b"Identity")
            self.strings_encrypted = (strf is None
                                      or strf.group(1) != b"Identity")
            return
        else:
            raise ValueError(
                f"unsupported PDF encryption V={v} R={r}")
        lm = re.search(rb"/Length\s+(\d+)", encrypt_dct)
        nbits = int(lm.group(1)) if lm else 40
        if nbits % 8 or not 40 <= nbits <= 128:
            raise ValueError("bad key length")
        key_bytes = 5 if r == 2 else nbits // 8
        p = int(pm.group(1))
        o = _parse_crypt_string(om.group(1))
        u = _parse_crypt_string(um.group(1))
        # EncryptMetadata=false appends FFFFFFFF to the KEY hash input
        # only (Algorithm 2 step f) — /U's Algorithm 5 hashes the plain ID
        id_for_key = file_id
        if re.search(rb"/EncryptMetadata\s+false", encrypt_dct):
            id_for_key = file_id + b"\xff\xff\xff\xff"
        def try_user_pw(pw: bytes) -> bytes | None:
            key = compute_key(pw, o, p, id_for_key,
                              r=min(r, 3), key_bytes=key_bytes)
            expect = compute_u(key, file_id, r=min(r, 3))
            ok = expect == u if r == 2 else expect[:16] == u[:16]
            return key if ok else None

        key = try_user_pw(password)
        if key is None and password:
            # Algorithm 7: the password as OWNER password — /O decrypts
            # to the padded user password, which must then pass /U
            key = try_user_pw(recover_user_pw(
                password, o, r=min(r, 3), key_bytes=key_bytes))
            if key is None:
                key = try_user_pw(b"")  # fall back to the empty-pw case
        if key is None:
            raise ValueError(
                "PDF password required or wrong (user and owner "
                "verification both failed)")
        self.key = key

    def _stream_key(self, num: int, gen: int) -> bytes:
        if self.v5:
            return self.key  # V5: the file key itself, no derivation
        return object_key_aes(self.key, num, gen)

    def decrypt(self, data: bytes, num: int, gen: int = 0) -> bytes:
        if self.aes:
            from documentai_ray.functions.aes import cbc_decrypt

            if len(data) < 32:
                raise ValueError("AES stream too short for IV + block")
            return cbc_decrypt(self._stream_key(num, gen),
                               data[:16], data[16:])
        return rc4(object_key(self.key, num, gen), data)

    def encrypt(self, data: bytes, num: int, gen: int = 0,
                iv: bytes | None = None) -> bytes:
        if self.aes:
            from documentai_ray.functions.aes import cbc_encrypt

            if iv is None:
                iv = hashlib.md5(struct.pack("<I", num) + data[:32]).digest()
            return iv + cbc_encrypt(self._stream_key(num, gen), iv, data)
        return rc4(object_key(self.key, num, gen), data)


def find_file_id(pdf: bytes) -> bytes:
    """First 16 ID bytes from the trailer ``/ID [<hex> <hex>]`` (empty
    bytes when absent — older files omit it)."""
    m = re.search(rb"/ID\s*\[\s*<([0-9a-fA-F]+)>", pdf)
    return bytes.fromhex(m.group(1).decode()) if m else b""
