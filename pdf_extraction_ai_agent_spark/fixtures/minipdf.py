"""Hand-written minimal real-PDF generator — vendored byte fixture so the
S2/S3 real-PDF extraction chain (reference extract_text.py:9-66) can be
exercised end-to-end in-sandbox with ZERO optional dependencies (round-2
verdict item 5).

Produces a spec-correct PDF 1.4: catalog → page tree → one page object +
one content stream per page (text via Td/Tj, optionally TJ arrays and
FlateDecode compression), a real xref table and trailer. pdfplumber/fitz
open these files on cluster images; the in-repo tokenizer
(operators/pdftext.py) parses them dependency-free.

Output bytes are latin-1-clean when the input text is, so a generated PDF
can ride in the transcripts `text` column (the batch kernel re-encodes
latin-1 before parsing — operators/extract.py real-pdf branch).
"""

from __future__ import annotations

import re
import struct
import zlib


def _esc(s: str) -> str:
    """PDF literal-string escaping: backslash, parens, and the three
    whitespace controls that may not appear raw inside a literal."""
    return (
        s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        .replace("\r", r"\r").replace("\n", r"\n").replace("\t", r"\t")
    )


def _content_stream(page, tj_arrays: bool, leading: bool = False) -> bytes:
    """Content stream for one page.

    ``page`` is either a plain string (text block: first line positioned
    with an absolute Td, each following line a relative `0 -16 Td` — the
    standard line-advance idiom real generators emit; ``tj_arrays`` renders
    every other line as a TJ array with kerning numbers; ``leading``
    switches to the OTHER mainstream idiom — `16 TL` + quote-shows, every
    third line via the " form with aw/ac spacing operands), or a list of
    structured ops for geometry-bearing fixtures:

      ("text", x, y, s)          → BT /F1 12 Tf x y Td (s) Tj ET
      ("line", x1, y1, x2, y2)   → x1 y1 m x2 y2 l S   (stroked ruling)
      ("image", data: bytes)     → BI … ID <data> EI   (inline image; raw
                                   binary — may contain adversarial bytes
                                   like '(', 'BT' or 'm … l S' decoys, but
                                   no whitespace+EI+delimiter run, which
                                   would terminate it early by the classic
                                   reader heuristic both twins share)
    """
    if not isinstance(page, str):
        ops: list[object] = []
        for item in page:
            if item[0] == "text":
                _, x, y, s = item
                ops.append(f"BT /F1 12 Tf {x:g} {y:g} Td ({_esc(s)}) Tj ET")
            elif item[0] == "line":
                _, x1, y1, x2, y2 = item
                ops.append(f"{x1:g} {y1:g} m {x2:g} {y2:g} l S")
            elif item[0] == "ctm":  # push graphics state + concat matrix
                _, a, b, c, d, e, f = item
                ops.append(f"q {a:g} {b:g} {c:g} {d:g} {e:g} {f:g} cm")
            elif item[0] == "cm":  # bare concat (no q — persists to EOS)
                _, a, b, c, d, e, f = item
                ops.append(f"{a:g} {b:g} {c:g} {d:g} {e:g} {f:g} cm")
            elif item[0] == "pop":  # restore graphics state
                ops.append("Q")
            elif item[0] == "raw":  # verbatim content ops (Tm/TL/T* axes)
                ops.append(item[1])
            elif item[0] == "image":
                data = item[1]
                assert not re.search(
                    rb"[\x00\t\n\x0c\r ]EI([\x00\t\n\x0c\r /<>\[\]()]|$)",
                    data + b"\n",
                ), "inline-image fixture data would self-terminate"
                ops.append(
                    b"q BI /W %d /H 1 /CS /DeviceGray /BPC 8 ID\n" % len(data)
                    + data + b"\nEI Q"
                )
            else:
                raise ValueError(f"unknown content op {item[0]!r}")
        return b"\n".join(
            o if isinstance(o, bytes) else o.encode("latin-1") for o in ops
        )
    if leading:
        ops = ["BT", "/F1 12 Tf", "16 TL", "72 720 Td"]
        for i, line in enumerate(page.split("\n")):
            if i == 0:
                ops.append(f"({_esc(line)}) Tj")
            elif i % 3 == 0:
                ops.append(f"1.5 0 ({_esc(line)}) \"")
            else:
                ops.append(f"({_esc(line)}) '")
        ops.append("ET")
        return "\n".join(ops).encode("latin-1")
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(page.split("\n")):
        if i > 0:
            ops.append("0 -16 Td")
        if tj_arrays and i % 2 == 1 and len(line) > 2:
            mid = len(line) // 2
            ops.append(f"[({_esc(line[:mid])}) -120 ({_esc(line[mid:])})] TJ")
        else:
            ops.append(f"({_esc(line)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def write_minimal_pdf(
    pages: list[str], compress: bool = False, tj_arrays: bool = False,
    leading: bool = False, rotate: int | None = None,
    rotate_on_pages: bool = False, annots: list | None = None,
) -> bytes:
    """One PDF with ``len(pages)`` pages; each element is that page's text
    ('\\n'-separated lines). ``compress`` wraps every content stream in
    FlateDecode (zlib), exercising the tokenizer's filter path;
    ``leading`` uses the TL/quote-show line-advance idiom instead of
    relative Td. ``rotate`` writes a /Rotate display rotation (r7,
    §7.7.3.3) — on every page dict, or on the /Pages node when
    ``rotate_on_pages`` (the inheritable-attribute shape). ``annots``
    (optional, one entry per page, None = no annotation) attaches a
    /FreeText annotation carrying that /Contents text — annotation text
    is NOT page content (fitz get_text default) and must never leak into
    extraction."""
    objs: dict[int, bytes] = {}
    n = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    rot_page = f"/Rotate {rotate} " if rotate is not None and not rotate_on_pages else ""
    rot_tree = f"/Rotate {rotate} " if rotate is not None and rotate_on_pages else ""
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages {rot_tree}/Kids [{kids}] /Count {n} >>"
    ).encode("latin-1")
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    next_extra = 4 + 2 * n  # contiguous slots after the page/content pairs
    for i, text in enumerate(pages):
        page_num, cont_num = 4 + 2 * i, 5 + 2 * i
        annots_ref = ""
        if annots is not None and annots[i] is not None:
            a = (
                str(annots[i])
                .replace("\\", r"\\")
                .replace("(", r"\(")
                .replace(")", r"\)")
            )
            objs[next_extra] = (
                f"<< /Type /Annot /Subtype /FreeText /Rect [400 700 580 760] "
                f"/Contents ({a}) /DA (/Helv 0 Tf 0 g) >>"
            ).encode("latin-1")
            annots_ref = f"/Annots [{next_extra} 0 R] "
            next_extra += 1
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R {rot_page}{annots_ref}"
            f"/MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode("latin-1")
        data = _content_stream(text, tj_arrays, leading)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs[cont_num] = (
            b"<< " + filt + f"/Length {len(data)} >>".encode("latin-1")
            + b"\nstream\n" + data + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode("latin-1") + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    total = max(objs) + 1
    out += f"xref\n0 {total}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for num in range(1, total):
        out += f"{offsets[num]:010d} 00000 n \n".encode("latin-1")
    out += (
        f"trailer\n<< /Size {total} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)


def _png_up_encode(rows: list[bytes]) -> bytes:
    """PNG Up-predictor (tag 2) encoding of fixed-width rows — the filter
    real generators apply to xref streams (/Predictor 12)."""
    out = bytearray()
    prev = bytes(len(rows[0]))
    for r in rows:
        out.append(2)
        out += bytes((a - b) & 0xFF for a, b in zip(r, prev))
        prev = r
    return bytes(out)


def write_objstm_pdf(
    pages: list, compress: bool = True, predictor: bool = True
) -> bytes:
    """PDF 1.5 variant of ``write_minimal_pdf``: the catalog, page-tree
    node, font and every page DICTIONARY are packed into a compressed
    object stream (``/Type /ObjStm`` — the dominant modern-PDF shape), and
    the cross-reference is a binary XREF STREAM (``/Type /XRef``,
    ``/W [1 3 1]``, FlateDecode, PNG Up predictor 12 when ``predictor``)
    instead of a classic `xref` table + trailer. Content streams stay
    top-level (the spec forbids stream-bearing objects inside an ObjStm),
    Flate-compressed when ``compress``.

    Exercises operators/pdftext.py's object-stream expansion, predictor
    decode, and /Root-from-xref-stream catalog lookup — round-3 verdict
    item 3."""
    n = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    packed: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("latin-1"),
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    top: dict[int, bytes] = {}
    for i, page in enumerate(pages):
        page_num, cont_num = 4 + 2 * i, 5 + 2 * i
        packed[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode("latin-1")
        data = _content_stream(page, tj_arrays=False)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        top[cont_num] = (
            b"<< " + filt + f"/Length {len(data)} >>".encode("latin-1")
            + b"\nstream\n" + data + b"\nendstream"
        )
    objstm_num = max(list(packed) + list(top)) + 1
    xref_num = objstm_num + 1

    member_nums = sorted(packed)
    bodies = [packed[m] for m in member_nums]
    offs, pos = [], 0
    for b in bodies:
        offs.append(pos)
        pos += len(b) + 1  # bodies joined by single '\n'
    header = (
        " ".join(f"{m} {o}" for m, o in zip(member_nums, offs)).encode("latin-1")
        + b"\n"
    )
    stm = header + b"\n".join(bodies) + b"\n"
    zstm = zlib.compress(stm)
    top[objstm_num] = (
        f"<< /Type /ObjStm /N {len(member_nums)} /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(zstm)} >>".encode("latin-1")
        + b"\nstream\n" + zstm + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num in sorted(top):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode("latin-1") + top[num] + b"\nendobj\n"

    xref_at = len(out)
    if xref_at >= (1 << 24):
        # W [1 3 1] gives 3-byte offsets; a silent modulo-2^24 wrap would
        # corrupt the xref for real readers on cluster images
        raise ValueError(
            f"write_objstm_pdf: file body {xref_at} bytes exceeds the 3-byte "
            "offset field (16 MB) — fewer/smaller pages, or widen /W"
        )
    size = xref_num + 1
    raw_rows: list[bytes] = []
    for num in range(size):
        if num == 0:
            t, f2, f3 = 0, 0, 255
        elif num == xref_num:
            t, f2, f3 = 1, xref_at, 0
        elif num in offsets:
            t, f2, f3 = 1, offsets[num], 0
        elif num in packed:
            t, f2, f3 = 2, objstm_num, member_nums.index(num)
        else:
            t, f2, f3 = 0, 0, 255
        raw_rows.append(bytes([t]) + struct.pack(">I", f2)[1:] + bytes([f3]))
    if predictor:
        xdata = _png_up_encode(raw_rows)
        parms = b"/DecodeParms << /Predictor 12 /Columns 5 >> "
    else:
        xdata = b"".join(raw_rows)
        parms = b""
    zx = zlib.compress(xdata)
    out += f"{xref_num} 0 obj\n".encode("latin-1")
    out += (
        f"<< /Type /XRef /Size {size} /W [1 3 1] /Index [0 {size}] "
        f"/Root 1 0 R /Filter /FlateDecode ".encode("latin-1")
        + parms
        + f"/Length {len(zx)} >>".encode("latin-1")
        + b"\nstream\n" + zx + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_at}\n%%EOF\n".encode("latin-1")
    return bytes(out)


# --- PDF standard security handler (V1/R2, 40-bit RC4) -------------------

PDF_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


_W_OPENSSL = None  # writer-side probe: (aes_cbc_encrypt, arc4) | False


def _w_openssl():
    """Writer-side OpenSSL delegation (same policy as the engine's, probed
    and wired independently — the twin invariant covers the PDF-layer
    crypto logic, which stays this module's own; the block primitives are
    standard-pinned by FIPS vectors and the parity test, and the
    pure-Python ciphers below remain the fallback on bare images)."""
    global _W_OPENSSL
    if _W_OPENSSL is None:
        try:
            from cryptography.hazmat.decrepit.ciphers.algorithms import ARC4
            from cryptography.hazmat.primitives.ciphers import (
                Cipher, algorithms, modes,
            )

            def aes_enc(key, iv, data):
                op = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
                return op.update(data) + op.finalize()

            def arc4(key, data):
                return Cipher(ARC4(key), mode=None).encryptor().update(data)

            _W_OPENSSL = (aes_enc, arc4)
        except Exception:
            _W_OPENSSL = False
    return _W_OPENSSL


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (symmetric) — stdlib-only, fixture-scale throughput."""
    fast = _w_openssl()
    if fast:
        return fast[1](key, data)
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for idx, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[idx] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_password(pwd: bytes) -> bytes:
    return (pwd + PDF_PAD)[:32]


def derive_rc4_key(o_value: bytes, p: int, file_id: bytes, user_pwd: bytes = b"",
                   revision: int = 2, n_key: int = 5) -> bytes:
    """Algorithm 2: md5(padded user pwd ‖ O ‖ P as int32-LE ‖ ID[0]); R3
    re-hashes the first n_key bytes 50 more times."""
    import hashlib
    import struct as _struct

    h = hashlib.md5()
    h.update(_pad_password(user_pwd))
    h.update(o_value)
    h.update(_struct.pack("<i", p))
    h.update(file_id)
    d = h.digest()
    if revision >= 3:
        for _ in range(50):
            d = hashlib.md5(d[:n_key]).digest()
    return d[:n_key]


def object_rc4_key(base_key: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1: md5(key ‖ objnum 3B-LE ‖ gen 2B-LE)[: len(key)+5]."""
    import hashlib

    h = hashlib.md5()
    h.update(base_key)
    h.update(bytes([num & 0xFF, (num >> 8) & 0xFF, (num >> 16) & 0xFF]))
    h.update(bytes([gen & 0xFF, (gen >> 8) & 0xFF]))
    return h.digest()[: min(len(base_key) + 5, 16)]


def _std_security_values(
    owner_pwd: bytes, user_pwd: bytes, permissions: int, revision: int,
    file_id: bytes, n_pages: int,
) -> tuple[bytes, bytes]:
    """(file key, /Encrypt dict body) for the STANDARD security handler at
    the given revision — the shared core of the classic and objstm
    encrypted writers (V1/R2 40-bit RC4, V2/R3 128-bit RC4, V4/R4 AESV2,
    V5/R6 AESV3 with Algorithm 2.B hashes and the key wrapped in /UE)."""
    import hashlib

    oe_value = ue_value = perms_value = None
    if revision == 6:
        # AES-256 (ISO 32000-2): deterministic salts; Algorithm 2.B hashes
        vsalt, ksalt, ovs, oks = r6_salts(n_pages)
        key = (hashlib.md5(b"r6-filekey-a" + owner_pwd).digest()
               + hashlib.md5(b"r6-filekey-b").digest())  # 32-byte file key
        u_value = hash_2b(user_pwd, vsalt) + vsalt + ksalt
        ue_value = _aes_cbc_encrypt_nopad(
            hash_2b(user_pwd, ksalt), bytes(16), key
        )
        o_value = hash_2b(owner_pwd, ovs, u_value) + ovs + oks
        oe_value = _aes_cbc_encrypt_nopad(
            hash_2b(owner_pwd, oks, u_value), bytes(16), key
        )
        perms_plain = (
            struct.pack("<i", permissions) + b"\xff\xff\xff\xff"
            + b"Tadb" + b"seed"
        )
        perms_value = _aes_encrypt_block(_aes_round_keys(key), perms_plain)
    n_key = 16 if revision >= 3 else 5
    if revision in (3, 4):
        # Algorithm 3 (R3): owner key = md5^51 of padded owner pwd, [:16];
        # O = 20-round RC4 chain over the padded user pwd with key^i
        okd = hashlib.md5(_pad_password(owner_pwd)).digest()
        for _ in range(50):
            okd = hashlib.md5(okd[:n_key]).digest()
        key_o = okd[:n_key]
        o_value = _pad_password(user_pwd)
        for i in range(20):
            o_value = rc4(bytes(b ^ i for b in key_o), o_value)
        key = derive_rc4_key(o_value, permissions, file_id, user_pwd,
                             revision=revision, n_key=n_key)
        # Algorithm 5 (R3): U = 20-round RC4 chain over md5(PAD ‖ ID)
        u_value = hashlib.md5(PDF_PAD + file_id).digest()
        for i in range(20):
            u_value = rc4(bytes(b ^ i for b in key), u_value)
        u_value += b"\x00" * 16  # arbitrary 16-byte tail per spec
    elif revision == 2:
        o_value = rc4(
            hashlib.md5(_pad_password(owner_pwd)).digest()[:5], _pad_password(user_pwd)
        )
        key = derive_rc4_key(o_value, permissions, file_id, user_pwd)
        u_value = rc4(key, PDF_PAD)

    v, length = {2: (1, 40), 3: (2, 128), 4: (4, 128), 6: (5, 256)}[revision]
    if revision == 4:
        cf = (
            b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> "
            b"/StmF /StdCF /StrF /StdCF "
        )
    elif revision == 6:
        cf = (
            b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF "
        )
    else:
        cf = b""
    extra = b""
    if revision == 6:
        extra = (
            b"/OE <" + oe_value.hex().encode() + b"> "
            + b"/UE <" + ue_value.hex().encode() + b"> "
            + b"/Perms <" + perms_value.hex().encode() + b"> "
        )
    enc_dict = (
        b"<< /Filter /Standard /V %d /R %d /Length %d " % (v, revision, length)
        + cf
        + b"/O <" + o_value.hex().encode() + b"> "
        + b"/U <" + u_value.hex().encode() + b"> "
        + extra
        + (b"/P %d >>" % permissions)
    )
    return key, enc_dict


def write_encrypted_pdf(
    pages: list, owner_pwd: bytes = b"", user_pwd: bytes = b"",
    permissions: int = -44, revision: int = 2,
    plain: bytes | None = None,
) -> bytes:
    """``write_minimal_pdf`` variant encrypted with the PDF STANDARD
    security handler (``user_pwd`` defaults to empty — the ubiquitous
    owner-locked shape; non-empty makes a genuinely password-protected
    file that only opens with that user password) — V1/R2 40-bit RC4 by
    default, V2/R3 128-bit RC4 with ``revision=3`` (the Acrobat 5+ shape
    that dominates real encrypted PDFs), or V4/R4 AESV2 (AES-128-CBC via
    the /StdCF crypt filter — the Acrobat 7+ default) with
    ``revision=4``, or V5/R6 AES-256 (AESV3, Algorithm 2.B hashes, file
    key wrapped in /UE) with ``revision=6`` — the ubiquitous
    "owner-locked" shape (viewers open it
    without prompting). Every stream is encrypted under its per-object
    key (AESV2 payloads get an IV prefix + PKCS#7 padding); the /Encrypt
    dict and /ID land in the trailer. pdftext.py's rung decrypts these
    dependency-free; a user password outside its candidate book makes
    the rung bail to the library chain.

    ``plain`` encrypts an ALREADY-ASSEMBLED classic file instead of
    building one from ``pages`` (any `_assemble_classic`-layout bytes —
    e.g. a tagged write_tagged_pdf file, whose structure-tree objects are
    dict-only and stay plaintext while its content streams encrypt);
    ``pages`` then only sizes the deterministic /ID and R6 salts."""
    import hashlib

    if plain is None:
        plain = write_minimal_pdf(pages)
    file_id = hashlib.md5(b"spark-extract-fixture" + bytes(len(pages))).digest()
    key, enc_dict = _std_security_values(
        owner_pwd, user_pwd, permissions, revision, file_id, len(pages)
    )

    # re-emit every object, encrypting stream bodies under per-object keys
    objs: dict[int, bytes] = {}
    pos = 0
    enc_re = __import__("re").compile(rb"(\d+) 0 obj\n(.*?)\nendobj\n", __import__("re").S)
    # object bodies in write_minimal_pdf are newline-delimited and contain
    # no nested 'endobj'; streams carry explicit /Length so the match is
    # unambiguous for THIS writer's output
    for m in enc_re.finditer(plain):
        num, body = int(m.group(1)), m.group(2)
        s_at = body.find(b"\nstream\n")
        if s_at >= 0:
            head, data = body[:s_at], body[s_at + len(b"\nstream\n"):]
            assert data.endswith(b"\nendstream")
            data = data[: -len(b"\nendstream")]
            if revision == 6:
                iv = hashlib.md5(b"fixture-iv6-%d" % num).digest()
                data = aes_cbc_encrypt(key, iv, data)  # FILE key, no salt
            elif revision == 4:
                iv = hashlib.md5(b"fixture-iv-%d" % num).digest()
                data = aes_cbc_encrypt(object_aes_key(key, num), iv, data)
            else:
                data = rc4(object_rc4_key(key, num), data)
            head = __import__("re").sub(
                rb"/Length \d+", b"/Length %d" % len(data), head
            )
            body = head + b"\nstream\n" + data + b"\nendstream"
        objs[num] = body
    enc_num = max(objs) + 1
    objs[enc_num] = enc_dict

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    total = max(objs) + 1
    out += b"xref\n0 %d\n" % total
    out += b"0000000000 65535 f \n"
    for num in range(1, total):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Encrypt %d 0 R /ID [<%s> <%s>] >>\n"
        % (total, enc_num, file_id.hex().encode(), file_id.hex().encode())
        + b"startxref\n%d\n%%%%EOF\n" % xref_at
    )
    return bytes(out)


# --- CID-keyed (Type0) fonts with ToUnicode CMaps -------------------------


def _cid_codes(pages: list[str]) -> dict[str, int]:
    """Deterministic char → 2-byte CID assignment: distinct chars of the
    whole document, sorted, numbered from 0x0100. The offset keeps every
    code DISJOINT from latin-1 byte values, so a tokenizer that ignored
    the CMap would produce garbage rather than accidentally-right text —
    the fixture actually proves the mapping is applied."""
    charset = sorted(set("".join(pages)))
    return {ch: 0x0100 + i for i, ch in enumerate(charset)}


def _tounicode_cmap(codes: dict[str, int], array_ranges: bool) -> bytes:
    """ToUnicode CMap stream body: maximal runs of consecutive codes
    mapping to consecutive code points become bfrange entries (increment
    form, or the `[ ]` array form when ``array_ranges``); singletons
    become bfchar entries — both constructs the parser must handle."""
    items = sorted((c, ord(ch)) for ch, c in codes.items())
    runs: list[tuple[int, int, list[int]]] = []  # (lo_code, hi_code, dsts)
    for code, cp in items:
        if runs and code == runs[-1][1] + 1 and cp == runs[-1][2][-1] + 1:
            runs[-1] = (runs[-1][0], code, runs[-1][2] + [cp])
        else:
            runs.append((code, code, [cp]))
    chars = [(lo, d[0]) for lo, hi, d in runs if lo == hi]
    ranges = [(lo, hi, d) for lo, hi, d in runs if hi > lo]
    parts = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CMapName /Adobe-Identity-UCS def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<0000> <FFFF>",
        "endcodespacerange",
    ]
    if chars:
        parts.append(f"{len(chars)} beginbfchar")
        parts += [f"<{c:04X}> <{cp:04X}>" for c, cp in chars]
        parts.append("endbfchar")
    if ranges:
        parts.append(f"{len(ranges)} beginbfrange")
        for lo, hi, dsts in ranges:
            if array_ranges:
                arr = " ".join(f"<{cp:04X}>" for cp in dsts)
                parts.append(f"<{lo:04X}> <{hi:04X}> [{arr}]")
            else:
                parts.append(f"<{lo:04X}> <{hi:04X}> <{dsts[0]:04X}>")
        parts.append("endbfrange")
    parts += ["endcmap", "CMapName currentdict /CMap defineresource pop", "end", "end"]
    return "\n".join(parts).encode("latin-1")


def _cid_content_stream(page: str, codes: dict[str, int], tj_arrays: bool) -> bytes:
    """Content stream showing the page text as hex CID strings under /F1
    (Identity-H): `<0100010B…> Tj`, same Td line-advance idiom as
    _content_stream; ``tj_arrays`` renders every other line as a kerned
    TJ array of two hex halves."""
    def hx(s: str) -> str:
        return "".join(f"{codes[ch]:04X}" for ch in s)

    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(page.split("\n")):
        if i > 0:
            ops.append("0 -16 Td")
        if tj_arrays and i % 2 == 1 and len(line) > 2:
            mid = len(line) // 2
            ops.append(f"[<{hx(line[:mid])}> -120 <{hx(line[mid:])}>] TJ")
        else:
            ops.append(f"<{hx(line)}> Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def write_cid_pdf(
    pages: list[str],
    compress: bool = False,
    tj_arrays: bool = False,
    array_ranges: bool = False,
) -> bytes:
    """``write_minimal_pdf`` variant whose text is shown through a CID-keyed
    Type0 font — /Encoding /Identity-H, a /DescendantFonts CIDFontType2
    stub and an embedded /ToUnicode CMap stream — the dominant shape
    modern office suites emit (reference extract_text.py handles it via
    pdfplumber/fitz; operators/pdftext.py's rung decodes it
    dependency-free). Shown strings are 2-byte-code hex strings whose
    values are NOT the characters (see _cid_codes); ``compress`` also
    Flate-wraps the CMap stream, exercising the filtered-CMap path."""
    codes = _cid_codes(pages)
    objs: dict[int, bytes] = {}
    n = len(pages)
    kids = " ".join(f"{6 + 2 * i} 0 R" for i in range(n))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("latin-1")
    objs[3] = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeSans "
        b"/Encoding /Identity-H /DescendantFonts [4 0 R] /ToUnicode 5 0 R >>"
    )
    objs[4] = (
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FakeSans "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> >>"
    )
    cmap = _tounicode_cmap(codes, array_ranges)
    cfilt = b""
    if compress:
        cmap = zlib.compress(cmap)
        cfilt = b"/Filter /FlateDecode "
    objs[5] = (
        b"<< " + cfilt + f"/Length {len(cmap)} >>".encode("latin-1")
        + b"\nstream\n" + cmap + b"\nendstream"
    )
    for i, text in enumerate(pages):
        page_num, cont_num = 6 + 2 * i, 7 + 2 * i
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode("latin-1")
        data = _cid_content_stream(text, codes, tj_arrays)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs[cont_num] = (
            b"<< " + filt + f"/Length {len(data)} >>".encode("latin-1")
            + b"\nstream\n" + data + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode("latin-1") + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    total = max(objs) + 1
    out += f"xref\n0 {total}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for num in range(1, total):
        out += f"{offsets[num]:010d} 00000 n \n".encode("latin-1")
    out += (
        f"trailer\n<< /Size {total} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)


# --- AES-128 forward cipher (AESV2 fixture encryption) --------------------
# The writer needs ENCRYPTION, which neither the engine nor the oracle
# carries (they only decrypt) — three independent codebases.

_SBOX_HEX = (
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_SBOX = bytes.fromhex(_SBOX_HEX)


def _xt(b: int) -> int:
    return ((b << 1) ^ 0x1B) & 0xFF if b & 0x80 else b << 1


# GF(2^8) ×2 / ×3 lookup tables: MixColumns via indexing instead of the
# per-byte _xt calls (the writer encrypts every stream of every fixture —
# profiled at ~half the q58 kernel before table-izing)
_MUL2 = bytes(_xt(b) for b in range(256))
_MUL3 = bytes(_xt(b) ^ b for b in range(256))


def _aes_round_keys(key: bytes) -> list[bytes]:
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = [_SBOX[t[1]] ^ rcon, _SBOX[t[2]], _SBOX[t[3]], _SBOX[t[0]]]
            rcon = _xt(rcon)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [bytes(sum(words[4 * r : 4 * r + 4], [])) for r in range(nr + 1)]


def _aes_encrypt_block(rks: list[bytes], block: bytes) -> bytes:
    nr = len(rks) - 1
    s = [b ^ k for b, k in zip(block, rks[0])]
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows on the column-major state: s'[r + 4c] = s[r + 4((c+r)%4)]
        s = [s[(i % 4) + 4 * (((i // 4) + (i % 4)) % 4)] for i in range(16)]
        if rnd < nr:
            t = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                t += [
                    _MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3,
                    a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3,
                    a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3],
                    _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3],
                ]
            s = t
        s = [b ^ k for b, k in zip(s, rks[rnd])]
    return bytes(s)


# Word-table fast path (r8): the writer's own FIPS-197 four-table
# formulation — LITTLE-endian column words (structurally distinct from the
# engine's big-endian tables; the two codebases stay independent, equality
# pinned by tests/test_aes_ttable.py).  SubBytes+ShiftRows+MixColumns per
# column = 4 lookups + 4 xors; ~8x the per-byte walk above, which stays as
# the readable reference.
_TL0 = tuple(
    _MUL2[s] | (s << 8) | (s << 16) | (_MUL3[s] << 24) for s in _SBOX
)
_TL1 = tuple(((t << 8) & 0xFFFFFFFF) | (t >> 24) for t in _TL0)
_TL2 = tuple(((t << 16) & 0xFFFFFFFF) | (t >> 16) for t in _TL0)
_TL3 = tuple(((t << 24) & 0xFFFFFFFF) | (t >> 8) for t in _TL0)


def _aes_words_le(rks: list[bytes]) -> list[int]:
    return [
        int.from_bytes(rk[4 * j : 4 * j + 4], "little")
        for rk in rks
        for j in range(4)
    ]


_RKW_LE_CACHE: dict[bytes, tuple[int, ...]] = {}


def _rkw_le(key: bytes) -> tuple[int, ...]:
    """Memoized LE round-key words (r8): the schedule is a pure function
    of the key and was re-derived on every per-stream encrypt call."""
    cached = _RKW_LE_CACHE.get(key)
    if cached is None:
        cached = tuple(_aes_words_le(_aes_round_keys(key)))
        if len(_RKW_LE_CACHE) > 256:
            _RKW_LE_CACHE.clear()
        _RKW_LE_CACHE[key] = cached
    return cached


def _aes_encrypt_block_le(rkw: list[int], nr: int, s0: int, s1: int, s2: int, s3: int):
    """One block over little-endian column words; inputs pre-xored with
    nothing (round-0 AddRoundKey happens here)."""
    t0, t1, t2, t3, sb = _TL0, _TL1, _TL2, _TL3, _SBOX
    s0 ^= rkw[0]
    s1 ^= rkw[1]
    s2 ^= rkw[2]
    s3 ^= rkw[3]
    i = 4
    for _ in range(nr - 1):
        u0 = t0[s0 & 255] ^ t1[(s1 >> 8) & 255] ^ t2[(s2 >> 16) & 255] ^ t3[s3 >> 24] ^ rkw[i]
        u1 = t0[s1 & 255] ^ t1[(s2 >> 8) & 255] ^ t2[(s3 >> 16) & 255] ^ t3[s0 >> 24] ^ rkw[i + 1]
        u2 = t0[s2 & 255] ^ t1[(s3 >> 8) & 255] ^ t2[(s0 >> 16) & 255] ^ t3[s1 >> 24] ^ rkw[i + 2]
        u3 = t0[s3 & 255] ^ t1[(s0 >> 8) & 255] ^ t2[(s1 >> 16) & 255] ^ t3[s2 >> 24] ^ rkw[i + 3]
        s0, s1, s2, s3 = u0, u1, u2, u3
        i += 4
    u0 = (sb[s0 & 255] | sb[(s1 >> 8) & 255] << 8 | sb[(s2 >> 16) & 255] << 16 | sb[s3 >> 24] << 24) ^ rkw[i]
    u1 = (sb[s1 & 255] | sb[(s2 >> 8) & 255] << 8 | sb[(s3 >> 16) & 255] << 16 | sb[s0 >> 24] << 24) ^ rkw[i + 1]
    u2 = (sb[s2 & 255] | sb[(s3 >> 8) & 255] << 8 | sb[(s0 >> 16) & 255] << 16 | sb[s1 >> 24] << 24) ^ rkw[i + 2]
    u3 = (sb[s3 & 255] | sb[(s0 >> 8) & 255] << 8 | sb[(s1 >> 16) & 255] << 16 | sb[s2 >> 24] << 24) ^ rkw[i + 3]
    return u0, u1, u2, u3


def _aes_cbc_core(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC over whole blocks with the LE word cipher (no padding)."""
    fast = _w_openssl()
    if fast:
        return fast[0](key, iv, data)
    rkw = _rkw_le(key)
    nr = len(rkw) // 4 - 1
    p0 = int.from_bytes(iv[0:4], "little")
    p1 = int.from_bytes(iv[4:8], "little")
    p2 = int.from_bytes(iv[8:12], "little")
    p3 = int.from_bytes(iv[12:16], "little")
    out = bytearray()
    for at in range(0, len(data), 16):
        p0, p1, p2, p3 = _aes_encrypt_block_le(
            rkw, nr,
            int.from_bytes(data[at : at + 4], "little") ^ p0,
            int.from_bytes(data[at + 4 : at + 8], "little") ^ p1,
            int.from_bytes(data[at + 8 : at + 12], "little") ^ p2,
            int.from_bytes(data[at + 12 : at + 16], "little") ^ p3,
        )
        out += p0.to_bytes(4, "little") + p1.to_bytes(4, "little") \
            + p2.to_bytes(4, "little") + p3.to_bytes(4, "little")
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """IV-prefixed AES-CBC (128 or 256 by key length) with PKCS#7
    padding — the AESV2/AESV3 stream payload layout."""
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    return iv + _aes_cbc_core(key, iv, data)


def object_aes_key(base_key: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1 with the AESV2 'sAlT' suffix."""
    import hashlib

    h = hashlib.md5()
    h.update(base_key)
    h.update(bytes([num & 0xFF, (num >> 8) & 0xFF, (num >> 16) & 0xFF]))
    h.update(bytes([gen & 0xFF, (gen >> 8) & 0xFF]))
    h.update(b"sAlT")
    return h.digest()[: min(len(base_key) + 5, 16)]


def write_differences_pdf(
    pages: list[str], compress: bool = False, encoding_ref: bool = False,
    resources_parent: int = 0,
) -> bytes:
    """``write_minimal_pdf`` variant whose simple Type1 font carries an
    /Encoding /Differences byte remap (the legacy-generator / scanner
    shape): every character with an AGL name is moved to a HIGH code
    (two runs, 0x80.. and 0xC0.., so the array carries two number tokens)
    and shown via those bytes — a tokenizer ignoring /Differences would
    emit high-latin-1 garbage instead of the text. Unnamed characters
    stay at their latin-1 bytes (the simple-font default the parser keeps
    for unmapped codes). ``encoding_ref`` puts the encoding dict in its
    own object (the indirect form). ``resources_parent`` moves the
    /Resources dict up the page tree (ISO 32000 §7.7.3.4 inheritable
    attributes — the shared-resources shape real generators emit): 0 =
    on each page (default), 1 = on the /Pages root, 2 = on an
    intermediate /Pages node of a two-level tree; in both inherited
    layouts the page dicts carry NO /Resources, so a parser that fails
    to climb /Parent cannot resolve the /Differences font and must bail
    (strict-fonts file) instead of emitting high-byte garbage."""
    from .. import spec

    rev: dict[str, str] = {}
    for name, ch in spec.GLYPH_TO_UNICODE.items():
        if len(ch) == 1:
            rev.setdefault(ch, name)
    charset = sorted({c for p in pages for c in p if c != "\n" and c in rev})
    # assigned codes must avoid the byte value of EVERY text character —
    # a char left at its literal latin-1 byte would otherwise collide
    # with a remapped code and decode as the wrong glyph
    used = {ord(c) for p in pages for c in p if ord(c) < 256}
    free = [b for b in range(0x80, 0x100) if b not in used]
    remap = {c: b for c, b in zip(charset, free)}  # cap at available codes

    def diff_array() -> str:
        # maximal consecutive-code runs, each "code /n1 /n2 …" — multiple
        # number tokens exercise the parser's code-reset handling
        items = sorted((b, rev[c]) for c, b in remap.items())
        runs: list[list] = []
        for b, name in items:
            if runs and b == runs[-1][0] + len(runs[-1]) - 1:
                runs[-1].append(name)
            else:
                runs.append([b, name])
        return "[ " + " ".join(
            " ".join([str(r[0])] + ["/" + n for n in r[1:]]) for r in runs
        ) + " ]"

    def encode_line(line: str) -> str:
        return "".join(chr(remap[c]) if c in remap else c for c in line)

    objs: dict[int, bytes] = {}
    n = len(pages)
    res = "/Resources << /Font << /F1 3 0 R >> >> "
    first_page = 5 + (1 if resources_parent == 2 else 0)
    kids = " ".join(f"{first_page + 2 * i} 0 R" for i in range(n))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    if resources_parent == 2:
        # two-level tree: root -> intermediate (carries /Resources) -> pages
        objs[2] = b"<< /Type /Pages /Kids [5 0 R] /Count %d >>" % n
        objs[5] = (
            f"<< /Type /Pages /Parent 2 0 R {res}"
            f"/Kids [{kids}] /Count {n} >>"
        ).encode("latin-1")
    else:
        objs[2] = (
            "<< /Type /Pages "
            + (res if resources_parent == 1 else "")
            + f"/Kids [{kids}] /Count {n} >>"
        ).encode("latin-1")
    enc_body = f"<< /Differences {diff_array()} >>"
    if encoding_ref:
        objs[3] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding 4 0 R >>"
        )
        objs[4] = enc_body.encode("latin-1")
    else:
        objs[3] = (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            f"/Encoding {enc_body} >>"
        ).encode("latin-1")
        objs[4] = b"<< /Type /Encoding >>"  # placeholder keeps numbering stable
    parent = 5 if resources_parent == 2 else 2
    for i, text in enumerate(pages):
        page_num, cont_num = first_page + 2 * i, first_page + 1 + 2 * i
        objs[page_num] = (
            f"<< /Type /Page /Parent {parent} 0 R /MediaBox [0 0 612 792] "
            + (res if resources_parent == 0 else "")
            + f"/Contents {cont_num} 0 R >>"
        ).encode("latin-1")
        remapped = "\n".join(encode_line(l) for l in text.split("\n"))
        data = _content_stream(remapped, tj_arrays=False)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs[cont_num] = (
            b"<< " + filt + f"/Length {len(data)} >>".encode("latin-1")
            + b"\nstream\n" + data + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode("latin-1") + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    total = max(objs) + 1
    out += f"xref\n0 {total}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for num in range(1, total):
        out += f"{offsets[num]:010d} 00000 n \n".encode("latin-1")
    out += (
        f"trailer\n<< /Size {total} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)


def _aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Unpadded CBC — Algorithm 2.B state and the /UE key wrap."""
    return _aes_cbc_core(key, iv, data)


# driver-precomputed Algorithm 2.B entries (kdf_warm_entries), seeded into
# worker processes so write_encrypted_pdf(revision=6) kernels don't re-pay
# the ~1s/call KDF per worker; misses fall through to the writer's own impl
_KDF_SEED: dict[tuple[bytes, bytes, bytes], bytes] = {}


def seed_kdf(entries: dict[tuple[bytes, bytes, bytes], bytes]) -> None:
    _KDF_SEED.update(entries)


def r6_salts(pages_count: int) -> tuple[bytes, bytes, bytes, bytes]:
    """(vsalt, ksalt, ovs, oks) that write_encrypted_pdf(revision=6) uses
    for a given page count — the ONE place the deterministic-salt formulas
    live, so seed derivation (kdf_warm_entries / the q58 parallel KDF
    stage) cannot drift from the writer."""
    import hashlib

    return (
        hashlib.md5(b"r6-vsalt" + bytes(pages_count)).digest()[:8],
        hashlib.md5(b"r6-ksalt" + bytes(pages_count)).digest()[:8],
        hashlib.md5(b"r6-ovsalt").digest()[:8],
        hashlib.md5(b"r6-oksalt").digest()[:8],
    )


def kdf_warm_entries(
    pages_count: int, owner_pwd: bytes, user_pwd: bytes = b""
) -> dict[tuple[bytes, bytes, bytes], bytes]:
    """The four Algorithm 2.B results write_encrypted_pdf(revision=6) needs
    for a given page count — computed with the WRITER's own impl on the
    caller (driver), so query kernels can close them over mapInPandas and
    seed each worker instead of re-deriving there. The seed is a pure
    cache: a stale/wrong entry set just means a worker re-derives."""
    vsalt, ksalt, ovs, oks = r6_salts(pages_count)
    u_value = hash_2b(user_pwd, vsalt) + vsalt + ksalt
    return {
        (user_pwd, vsalt, b""): hash_2b(user_pwd, vsalt),
        (user_pwd, ksalt, b""): hash_2b(user_pwd, ksalt),
        (owner_pwd, ovs, u_value): hash_2b(owner_pwd, ovs, u_value),
        (owner_pwd, oks, u_value): hash_2b(owner_pwd, oks, u_value),
    }


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — writer-side copy (engine and oracle
    each carry their own over their own AES primitives); memoized, with
    driver-seeded entries (seed_kdf) consulted first."""
    hit = _KDF_SEED.get((password, salt, udata))
    if hit is not None:
        return hit
    return _hash_2b_cached(password, salt, udata)


def _hash_2b_impl(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    import hashlib

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            break
    return k[:32]


from functools import lru_cache  # noqa: E402

_hash_2b_cached = lru_cache(maxsize=256)(_hash_2b_impl)


# --- named base encodings + subset fonts (round-6) -------------------------


def _assemble_classic(objs: dict[int, bytes]) -> bytes:
    """Classic-xref file from a CONTIGUOUS 1..N object dict (the layout
    write_differences_pdf uses, shared by the round-6 font writers)."""
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode("latin-1") + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    total = max(objs) + 1
    out += f"xref\n0 {total}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for num in range(1, total):
        out += f"{offsets[num]:010d} 00000 n \n".encode("latin-1")
    out += (
        f"trailer\n<< /Size {total} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)


def _page_objects(
    objs: dict[int, bytes], pages: list[str], encode_line, compress: bool,
    first: int = 6,
) -> None:
    """Append page + content objects (numbers first, first+1, …) and the
    catalog/pages tree for the simple-font writers."""
    n = len(pages)
    kids = " ".join(f"{first + 2 * i} 0 R" for i in range(n))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("latin-1")
    for i, text in enumerate(pages):
        page_num, cont_num = first + 2 * i, first + 1 + 2 * i
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode("latin-1")
        encoded = "\n".join(encode_line(l) for l in text.split("\n"))
        data = _content_stream(encoded, tj_arrays=False)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs[cont_num] = (
            b"<< " + filt + f"/Length {len(data)} >>".encode("latin-1")
            + b"\nstream\n" + data + b"\nendstream"
        )


def write_base_encoded_pdf(
    pages: list[str],
    encoding: str = "WinAnsiEncoding",
    differences: bool = False,
    indirect: bool = False,
    compress: bool = False,
) -> bytes:
    """Simple Type1 font whose /Encoding is a NAMED Annex D base encoding
    (WinAnsi / MacRoman / Standard) — text bytes are produced through the
    INVERSE of the spec table, so a parser reading them as latin-1 emits
    wrong 0x80–0x9F text (curly quotes, euro, dashes). ``differences``
    additionally overlays a /Differences array on codes the base table
    leaves UNDEFINED (cp1252's holes), exercising base+overlay precedence
    with no collision risk; ``indirect`` puts the encoding dict in its
    own object. Raises ValueError on a character the chosen base table
    cannot encode (fixture contract)."""
    from .. import spec

    tbl = spec.BASE_ENCODING_TABLES[encoding]
    inv: dict[str, int] = {}
    for code in sorted(tbl):
        inv.setdefault(tbl[code], code)
    remap: dict[str, int] = {}
    enc_val = f"/{encoding}"
    if differences:
        undefined = sorted(set(range(256)) - set(tbl))
        rev_glyph: dict[str, str] = {}
        for gname, ch in spec.GLYPH_TO_UNICODE.items():
            if len(ch) == 1:
                rev_glyph.setdefault(ch, gname)
        movable = [
            c for c in sorted({c for p in pages for c in p})
            if c in rev_glyph and c in inv
        ]
        remap = dict(zip(movable, undefined))
        if remap:
            items = sorted((b, rev_glyph[c]) for c, b in remap.items())
            arr = " ".join(f"{b} /{g}" for b, g in items)
            enc_val = f"<< /BaseEncoding /{encoding} /Differences [ {arr} ] >>"

    def encode_line(line: str) -> str:
        out = []
        for c in line:
            if c in remap:
                out.append(chr(remap[c]))
            elif c in inv:
                out.append(chr(inv[c]))
            else:
                raise ValueError(f"char {c!r} not encodable under {encoding}")
        return "".join(out)

    objs: dict[int, bytes] = {}
    if indirect:
        objs[3] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding 4 0 R >>"
        )
        objs[4] = enc_val.encode("latin-1")
    else:
        objs[3] = (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            f"/Encoding {enc_val} >>"
        ).encode("latin-1")
        objs[4] = b"<< /Type /Encoding >>"  # placeholder keeps numbering stable
    objs[5] = b"null"  # numbering parity with write_subset_font_pdf
    _page_objects(objs, pages, encode_line, compress)
    return _assemble_classic(objs)


def write_subset_font_pdf(
    pages: list[str], compress: bool = False, cmap_compress: bool = False
) -> bytes:
    """Simple Type1 SUBSET font (the Camelot-style real-world shape): the
    /Differences array names glyphs g3, g5, … — meaningless to any glyph
    list — and only the font's own 1-byte /ToUnicode CMap carries their
    text. Every distinct character is assigned a fresh code from 0x30, so
    a latin-1 or glyph-name reading of the bytes is garbage; correct
    extraction REQUIRES the CMap path."""
    charset = sorted({c for p in pages for c in p if c != "\n"})
    if len(charset) > 0xFF - 0x30:
        raise ValueError("fixture charset exceeds one-byte code space")
    codes = {c: 0x30 + i for i, c in enumerate(charset)}
    diff = "[ 48 " + " ".join(f"/g{3 + i}" for i in range(len(charset))) + " ]"
    bf = "\n".join(
        f"<{code:02X}> <{c.encode('utf-16-be').hex().upper()}>"
        for c, code in codes.items()
    )
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        f"{len(codes)} beginbfchar\n{bf}\nendbfchar\n"
        "endcmap end\n"
    ).encode("latin-1")
    filt = b""
    if cmap_compress:
        cmap = zlib.compress(cmap)
        filt = b"/Filter /FlateDecode "
    objs: dict[int, bytes] = {
        3: (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /GHIJKL+FakeSerif "
            f"/Encoding 4 0 R /ToUnicode 5 0 R >>"
        ).encode("latin-1"),
        4: f"<< /Type /Encoding /Differences {diff} >>".encode("latin-1"),
        5: (
            b"<< " + filt + f"/Length {len(cmap)} >>".encode("latin-1")
            + b"\nstream\n" + cmap + b"\nendstream"
        ),
    }

    def encode_line(line: str) -> str:
        return "".join(chr(codes[c]) for c in line)

    _page_objects(objs, pages, encode_line, compress)
    return _assemble_classic(objs)


# --- classic stream filters (round-6): LZW / ASCIIHex / ASCII85 ------------
# Encoders only — the fixture writer is the third, independent side of the
# twin protocol (engine and oracle each carry their OWN decoders).


def asciihex_encode(data: bytes) -> bytes:
    """/ASCIIHexDecode payload: hex pairs, 64-col lines, '>' EOD."""
    h = data.hex().upper().encode("ascii")
    lines = [h[i : i + 64] for i in range(0, len(h), 64)]
    return b"\n".join(lines) + b">"


def ascii85_encode(data: bytes) -> bytes:
    """/ASCII85Decode payload: 4-byte groups → 5 base-85 chars ('!'..'u'),
    all-zero groups abbreviated 'z', partial n-byte tail → n+1 chars,
    '~>' EOD."""
    out = bytearray()
    for i in range(0, len(data) - len(data) % 4, 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        if acc == 0:
            out += b"z"
            continue
        grp = bytearray(5)
        for j in range(4, -1, -1):
            grp[j] = 0x21 + acc % 85
            acc //= 85
        out += grp
    tail = data[len(data) - len(data) % 4 :]
    if tail:
        acc = int.from_bytes(tail + b"\x00" * (4 - len(tail)), "big")
        grp = bytearray(5)
        for j in range(4, -1, -1):
            grp[j] = 0x21 + acc % 85
            acc //= 85
        out += grp[: len(tail) + 1]
    return bytes(out) + b"~>"


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """/LZWDecode payload (TIFF-convention): 9→12-bit variable codes,
    clear (256) first and whenever the table fills, EOD (257) last;
    /EarlyChange=1 widens one entry early (the PDF default)."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    size, width = 258, 9
    emit(256, width)
    seq = b""
    for i in range(len(data)):
        nxt = seq + data[i : i + 1]
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq], width)
        table[nxt] = size
        size += 1
        # encoder-side widening happens one entry AFTER the decoder's
        # (the decoder's table lags by one): 2^w - early + 1, and at
        # width 12 a clear resets both sides
        if size + early - 1 >= (1 << width):
            if width == 12:
                emit(256, width)
                table = {bytes([j]): j for j in range(256)}
                size, width = 258, 9
            else:
                width += 1
        seq = data[i : i + 1]
    if seq:
        emit(table[seq], width)
        # the decoder ADDS an entry on this final code (the encoder does
        # not), so the lag closes: the EOD width check is the decoder's
        if size + early >= (1 << width) and width < 12:
            width += 1
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


_FILTER_ENCODERS = {
    "ASCIIHexDecode": asciihex_encode,
    "ASCII85Decode": ascii85_encode,
    "LZWDecode": lzw_encode,
    "FlateDecode": lambda b: zlib.compress(b),
}


def write_filtered_pdf(pages: list, filters: list) -> bytes:
    """``write_minimal_pdf`` variant whose content streams pass through a
    classic FILTER CHAIN — /LZWDecode, /ASCIIHexDecode, /ASCII85Decode
    (the pre-PDF-1.5 corpus shapes) or any chain of them with
    /FlateDecode. ``filters`` lists decode-order names as in the /Filter
    array; the writer applies the matching encoders in reverse."""
    import re as _re

    plain = write_minimal_pdf(pages)
    fnames = " ".join(f"/{f}" for f in filters)
    fval = (f"/Filter [ {fnames} ]" if len(filters) > 1
            else f"/Filter /{filters[0]}").encode("ascii")
    objs: dict[int, bytes] = {}
    # same re-emit walk as write_encrypted_pdf: this writer's object bodies
    # are newline-delimited with explicit /Length, so the match is exact
    for m in _re.finditer(rb"(\d+) 0 obj\n(.*?)\nendobj\n", plain, _re.S):
        num, body = int(m.group(1)), m.group(2)
        s_at = body.find(b"\nstream\n")
        if s_at >= 0:
            data = body[s_at + len(b"\nstream\n"):]
            assert data.endswith(b"\nendstream")
            data = data[: -len(b"\nendstream")]
            for f in reversed(filters):
                data = _FILTER_ENCODERS[f](data)
            body = (
                b"<< " + fval + b" /Length %d >>" % len(data)
                + b"\nstream\n" + data + b"\nendstream"
            )
        objs[num] = body
    return _assemble_classic(objs)


def _content_object(page, compress: bool, tj_arrays: bool = False) -> bytes:
    """One content-stream object body (dict + stream…endstream) for
    ``page`` — the unit an incremental update replaces."""
    data = _content_stream(page, tj_arrays)
    filt = b""
    if compress:
        data = zlib.compress(data)
        filt = b"/Filter /FlateDecode "
    return (
        b"<< " + filt + b"/Length %d >>" % len(data)
        + b"\nstream\n" + data + b"\nendstream"
    )


def append_update(base: bytes, objs: dict[int, bytes]) -> bytes:
    """ONE incremental-update section (ISO 32000 §7.5.6 — the Acrobat
    append-save shape; reference PDFs arrive in it constantly): the given
    object bodies are APPENDED after the base file's %%EOF, then a classic
    xref section covering exactly those objects (contiguous subsections)
    and a trailer whose /Prev points at the base's xref. An object number
    already in the base is thereby REPLACED (newest version wins); numbers
    past the base's /Size extend it. ``base`` must be a classic-xref file
    (the update carries /Root forward from its last trailer)."""
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)\s+%%EOF", base):
        pass
    assert m is not None, "base has no startxref"
    prev_at = int(m.group(1))
    t_at = base.rfind(b"trailer")
    assert t_at >= 0, "append_update needs a classic-trailer base"
    tail = base[t_at:]
    rm = re.search(rb"/Root\s+(\d+)\s+0\s+R", tail)
    sm = re.search(rb"/Size\s+(\d+)", tail)
    assert rm and sm, "base trailer lacks /Root or /Size"

    out = bytearray(base)
    if not out.endswith(b"\n"):
        out += b"\n"
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n"
    run: list[int] = []
    for num in sorted(objs) + [None]:  # sentinel flushes the last run
        if run and (num is None or num != run[-1] + 1):
            out += b"%d %d\n" % (run[0], len(run))
            for r in run:
                out += b"%010d 00000 n \n" % offsets[r]
            run = []
        if num is not None:
            run.append(num)
    size = max(int(sm.group(1)), max(objs) + 1)
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n"
        % (size, int(rm.group(1)), prev_at, xref_at)
    )
    return bytes(out)


def write_incremental_pdf(
    pages_v1: list, pages_v2: list, compress: bool = False
) -> bytes:
    """Append-save fixture: ``pages_v1`` as a classic base file plus ONE
    incremental update that rewrites every changed page's content stream
    and appends any extra ``pages_v2`` pages (new page+content objects and
    a replaced /Pages tree with the extended /Kids). The superseded v1
    bytes stay in the file — extraction must surface EXACTLY pages_v2."""
    assert len(pages_v2) >= len(pages_v1)
    base = write_minimal_pdf(pages_v1, compress=compress)
    upd: dict[int, bytes] = {}
    for i, (p1, p2) in enumerate(zip(pages_v1, pages_v2)):
        if p1 != p2:  # write_minimal_pdf numbering: content of page i
            upd[5 + 2 * i] = _content_object(p2, compress)
    n1, n2 = len(pages_v1), len(pages_v2)
    if n2 > n1:
        kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n2))
        upd[2] = (
            f"<< /Type /Pages /Kids [{kids}] /Count {n2} >>".encode("latin-1")
        )
        for i in range(n1, n2):
            upd[4 + 2 * i] = (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {5 + 2 * i} 0 R >>"
            ).encode("latin-1")
            upd[5 + 2 * i] = _content_object(pages_v2[i], compress)
    assert upd, "pages_v2 must differ from pages_v1"
    return append_update(base, upd)


def write_form_pdf(
    pages: list,
    header: list | str,
    sub: list | str | None = None,
    with_image: bool = False,
    compress: bool = False,
    explicit_matrix: bool = False,
    translate: tuple | None = None,
    sub_translate: tuple | None = None,
    page_wrap: tuple | None = None,
) -> bytes:
    """Pages whose content invokes a shared /Subtype /Form XObject header
    (`/FmHead Do`) before their own text — the letterhead/stamp shape
    real generators emit constantly. ``sub`` adds a NESTED form: the
    header invokes `/FmSub Do`, and the sub-form carries no /Resources of
    its own (the ISO 32000 §8.10.1 legacy inherit rule). ``with_image``
    also invokes a /Subtype /Image XObject from each page (pixels — must
    be dropped, not shown). ``explicit_matrix`` writes the identity
    /Matrix out explicitly. ``translate``/``sub_translate`` take a
    (tx, ty) shorthand or a full 6-tuple (a b c d e f) form /Matrix
    (scale / rotation fixtures). ``page_wrap`` (r7) wraps each page's
    ENTIRE content — Do invocations included — in `q a b c d e f cm … Q`,
    the page-level CTM shape q73 exercises. pages/header/sub are
    _content_stream inputs (item lists or '\\n'-joined strings)."""

    def _wrap(data: bytes, extra: bytes = b"") -> bytes:
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        return (
            b"<< " + extra + filt + b"/Length %d >>" % len(data)
            + b"\nstream\n" + data + b"\nendstream"
        )

    objs: dict[int, bytes] = {}
    n = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("latin-1")
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    fm_head = 4 + 2 * n
    fm_sub = fm_head + 1 if sub is not None else None
    im = fm_head + (2 if sub is not None else 1) if with_image else None
    xo_page = f"/FmHead {fm_head} 0 R"
    if im is not None:
        xo_page += f" /Im0 {im} 0 R"
    for i, page in enumerate(pages):
        page_num, cont_num = 4 + 2 * i, 5 + 2 * i
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> "
            f"/XObject << {xo_page} >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode("latin-1")
        content = b"/FmHead Do\n" + _content_stream(page, False)
        if im is not None:
            content += b"\n/Im0 Do"
        if page_wrap is not None:
            content = (
                b"q %g %g %g %g %g %g cm\n" % tuple(page_wrap)
                + content + b"\nQ"
            )
        objs[cont_num] = _wrap(content)
    def _matrix(tr: tuple | None) -> bytes:
        if tr is not None:
            if len(tr) == 2:  # (tx, ty) translate shorthand
                tr = (1, 0, 0, 1) + tuple(tr)
            return b"/Matrix [%g %g %g %g %g %g] " % tuple(tr)
        return b"/Matrix [1 0 0 1 0 0] " if explicit_matrix else b""

    head_res = b"/Font << /F1 3 0 R >>"
    head_content = _content_stream(header, False)
    if fm_sub is not None:
        head_res += b" /XObject << /FmSub %d 0 R >>" % fm_sub
        head_content += b"\n/FmSub Do"
    objs[fm_head] = _wrap(
        head_content,
        b"/Type /XObject /Subtype /Form /BBox [0 0 612 792] "
        + _matrix(translate)
        + b"/Resources << " + head_res + b" >> ",
    )
    if fm_sub is not None:
        # deliberately NO /Resources — the sub-form inherits the invoking
        # context's XObject/font namespace (legacy rule; engine threads
        # inherited_xo, the oracle's resource names are global anyway)
        objs[fm_sub] = _wrap(
            _content_stream(sub, False),
            b"/Type /XObject /Subtype /Form /BBox [0 0 612 792] "
            + _matrix(sub_translate),
        )
    if im is not None:
        pixels = bytes((7 * k + 13) % 256 for k in range(16))
        objs[im] = (
            b"<< /Type /XObject /Subtype /Image /Width 4 /Height 4 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            b"/Length %d >>\nstream\n" % len(pixels) + pixels + b"\nendstream"
        )
    return _assemble_classic(objs)


def write_encrypted_objstm_pdf(
    pages: list, owner_pwd: bytes = b"", user_pwd: bytes = b"",
    permissions: int = -44, revision: int = 4, predictor: bool = True,
) -> bytes:
    """The MODERN encrypted shape (PDF 1.6+, today's Acrobat default):
    object streams + a binary XREF STREAM + standard-handler encryption.
    The xref stream is NEVER encrypted (ISO 32000 §7.5.8.2) and carries
    /Encrypt + /ID in its dict instead of a classic trailer; the /ObjStm
    container encrypts AS A WHOLE under its own object key (members
    inherit — they are never individually encrypted); content streams
    encrypt under their per-object keys (file key for V5)."""
    import hashlib

    file_id = hashlib.md5(
        b"spark-extract-objstm" + bytes(len(pages)) + bytes([revision])
    ).digest()
    key, enc_dict = _std_security_values(
        owner_pwd, user_pwd, permissions, revision, file_id, len(pages)
    )

    def encrypt_stream(num: int, data: bytes) -> bytes:
        if revision == 6:
            iv = hashlib.md5(b"fixture-objstm-iv6-%d" % num).digest()
            return aes_cbc_encrypt(key, iv, data)  # FILE key, no salt
        if revision == 4:
            iv = hashlib.md5(b"fixture-objstm-iv-%d" % num).digest()
            return aes_cbc_encrypt(object_aes_key(key, num), iv, data)
        return rc4(object_rc4_key(key, num), data)

    n = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    packed: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("latin-1"),
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    top: dict[int, bytes] = {}
    for i, page in enumerate(pages):
        page_num, cont_num = 4 + 2 * i, 5 + 2 * i
        packed[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode("latin-1")
        data = encrypt_stream(
            cont_num,
            zlib.compress(_content_stream(page, tj_arrays=False)),
        )
        top[cont_num] = (
            b"<< /Filter /FlateDecode /Length %d >>" % len(data)
            + b"\nstream\n" + data + b"\nendstream"
        )
    objstm_num = max(list(packed) + list(top)) + 1
    enc_num = objstm_num + 1
    xref_num = objstm_num + 2

    member_nums = sorted(packed)
    bodies = [packed[m] for m in member_nums]
    offs, pos = [], 0
    for b in bodies:
        offs.append(pos)
        pos += len(b) + 1  # bodies joined by single '\n'
    header = (
        " ".join(f"{m} {o}" for m, o in zip(member_nums, offs)).encode("latin-1")
        + b"\n"
    )
    zstm = encrypt_stream(
        objstm_num, zlib.compress(header + b"\n".join(bodies) + b"\n")
    )
    top[objstm_num] = (
        f"<< /Type /ObjStm /N {len(member_nums)} /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(zstm)} >>".encode("latin-1")
        + b"\nstream\n" + zstm + b"\nendstream"
    )
    top[enc_num] = enc_dict  # the /Encrypt dict itself is NEVER encrypted

    out = bytearray(b"%PDF-1.6\n")
    offsets: dict[int, int] = {}
    for num in sorted(top):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + top[num] + b"\nendobj\n"

    xref_at = len(out)
    assert xref_at < (1 << 24), "3-byte offset field overflow"
    size = xref_num + 1
    raw_rows: list[bytes] = []
    for num in range(size):
        if num == 0:
            t, f2, f3 = 0, 0, 255
        elif num == xref_num:
            t, f2, f3 = 1, xref_at, 0
        elif num in offsets:
            t, f2, f3 = 1, offsets[num], 0
        elif num in packed:
            t, f2, f3 = 2, objstm_num, member_nums.index(num)
        else:
            t, f2, f3 = 0, 0, 255
        raw_rows.append(bytes([t]) + struct.pack(">I", f2)[1:] + bytes([f3]))
    if predictor:
        xdata = _png_up_encode(raw_rows)
        parms = b"/DecodeParms << /Predictor 12 /Columns 5 >> "
    else:
        xdata = b"".join(raw_rows)
        parms = b""
    zx = zlib.compress(xdata)  # the xref stream itself is NEVER encrypted
    out += b"%d 0 obj\n" % xref_num
    out += (
        b"<< /Type /XRef /Size %d /W [1 3 1] /Index [0 %d] " % (size, size)
        + b"/Root 1 0 R /Encrypt %d 0 R " % enc_num
        + b"/ID [<" + file_id.hex().encode() + b"> <"
        + file_id.hex().encode() + b">] /Filter /FlateDecode "
        + parms
        + b"/Length %d >>" % len(zx)
        + b"\nstream\n" + zx + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def make_hybrid_reference(classic: bytes) -> bytes:
    """HYBRID-REFERENCE form (ISO 32000 §7.5.8.4 — the Acrobat 6 compat
    shape): a classic-xref file gains an xref STREAM object describing the
    same objects, and the classic trailer points at it via /XRefStm.
    Readers that understand xref streams follow /XRefStm; older readers
    use the classic table. Both twins scan object headers directly, so a
    hybrid must extract bit-identically to its classic source."""
    import struct

    objs = {
        int(m.group(1)): m.start()
        for m in re.finditer(rb"(\d+) 0 obj\b", classic)
    }
    xref_num = max(objs) + 1
    size = xref_num + 1
    rows = [b"\x00\x00\x00\x00\xff"]
    for n in range(1, size):
        rows.append(bytes([1]) + struct.pack(">I", objs.get(n, 0))[1:] + b"\x00")
    z = zlib.compress(b"".join(rows))
    at = classic.rfind(b"trailer")
    xobj = (
        b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 3 1] /Index [0 %d] "
        b"/Root 1 0 R /Filter /FlateDecode /Length %d >>\nstream\n"
        % (xref_num, size, size, len(z))
        + z + b"\nendstream\nendobj\n"
    )
    hybrid = classic[:at] + xobj + classic[at:]
    return hybrid.replace(b"/Size ", b"/XRefStm %d /Size " % at, 1)


def write_type3_pdf(
    pages: list[str], compress: bool = False, charprocs_ref: bool = True,
) -> bytes:
    """``write_minimal_pdf`` variant whose font is a genuine /Subtype
    /Type3 user-defined font (old TeX output, fax overlays, stamp
    generators): glyphs are CONTENT STREAMS (/CharProcs — `wx 0 d0` plus
    pure path fills, never text or Do ops) placed through /FontMatrix,
    and /Encoding /Differences is the ONLY code→glyph map (ISO 32000
    §9.6.5: Type3 fonts have no built-in encoding). Every AGL-named
    character moves to a high code exactly like write_differences_pdf
    (same decode contract on both twins); unnamed characters stay at
    latin-1 bytes. Glyph procs are BT/Do-free BY CONSTRUCTION (asserted):
    the oracle's file-order stream walk must skip them as textless, and
    the engine's page walk never follows /CharProcs at all.
    ``charprocs_ref`` switches the /CharProcs dict between an indirect
    object (the common generator layout) and an inline dict."""
    from .. import spec

    rev: dict[str, str] = {}
    for name, ch in spec.GLYPH_TO_UNICODE.items():
        if len(ch) == 1:
            rev.setdefault(ch, name)
    charset = sorted({c for p in pages for c in p if c != "\n" and c in rev})
    used = {ord(c) for p in pages for c in p if ord(c) < 256}
    free = [b for b in range(0x80, 0x100) if b not in used]
    remap = {c: b for c, b in zip(charset, free)}

    items = sorted((b, rev[c]) for c, b in remap.items())
    runs: list[list] = []
    for b, name in items:
        if runs and b == runs[-1][0] + len(runs[-1]) - 1:
            runs[-1].append(name)
        else:
            runs.append([b, name])
    diff_array = "[ " + " ".join(
        " ".join([str(r[0])] + ["/" + n for n in r[1:]]) for r in runs
    ) + " ]"

    objs: dict[int, bytes] = {}
    n = len(pages)
    kids = " ".join(f"{5 + 2 * i} 0 R" for i in range(n))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("latin-1")
    next_obj = 5 + 2 * n
    # one glyph proc per remapped char: width, d0, then a path fill whose
    # shape deterministically varies per glyph — never BT/Tj/Do
    proc_refs: list[tuple[str, int]] = []
    for b, name in items:
        w = 400 + (b % 7) * 50
        proc = (
            f"{w} 0 d0\n"
            f"{b % 9} 0 m {w} {100 + b % 9} l {w // 2:d} {700 + b} l f"
        ).encode("latin-1")
        assert b"BT" not in proc and b"Do" not in proc and b"Tj" not in proc
        objs[next_obj] = (
            b"<< /Length %d >>\nstream\n" % len(proc) + proc + b"\nendstream"
        )
        proc_refs.append((name, next_obj))
        next_obj += 1
    cp_body = (
        "<< " + " ".join(f"/{nm} {num} 0 R" for nm, num in proc_refs) + " >>"
    ).encode("latin-1")
    if charprocs_ref:
        objs[next_obj] = cp_body
        cp_val = b"%d 0 R" % next_obj
        next_obj += 1
    else:
        cp_val = cp_body
    codes = sorted(b for b, _ in items)
    first, last = (codes[0], codes[-1]) if codes else (0, 0)
    widths = " ".join(
        str(400 + (b % 7) * 50) if b in dict(items) else "0"
        for b in range(first, last + 1)
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 1000 1000] "
        b"/FontMatrix [0.001 0 0 0.001 0 0] "
        b"/CharProcs " + cp_val + b" "
        + f"/Encoding << /Type /Encoding /Differences {diff_array} >> "
          f"/FirstChar {first} /LastChar {last} "
          f"/Widths [{widths}] >>".encode("latin-1")
    )
    objs[4] = b"<< /Type /Encoding >>"  # keeps classic numbering stable

    def encode_line(line: str) -> str:
        return "".join(chr(remap[c]) if c in remap else c for c in line)

    for i, text in enumerate(pages):
        page_num, cont_num = 5 + 2 * i, 6 + 2 * i
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode("latin-1")
        remapped = "\n".join(encode_line(l) for l in text.split("\n"))
        data = _content_stream(remapped, tj_arrays=False)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs[cont_num] = (
            b"<< " + filt + f"/Length {len(data)} >>".encode("latin-1")
            + b"\nstream\n" + data + b"\nendstream"
        )
    return _assemble_classic(objs)


def write_tagged_pdf(
    pages: list[list[tuple[float, float, str]]],
    compress: bool = False,
    artifact: str | None = None,
    nest_sections: bool = False,
    mcr_kids: bool = False,
) -> bytes:
    """TAGGED PDF (ISO 32000 §14.7–14.8): ``pages[p]`` lists that page's
    paragraphs (x, y, text) in LOGICAL reading order; the content stream
    emits them in GEOMETRIC order (y desc, then x asc — for a two-column
    page this interleaves the columns), each wrapped in
    `/P <</MCID i>> BDC … EMC`, so only the structure tree recovers the
    logical order. The catalog carries /MarkInfo <</Marked true>> +
    /StructTreeRoot; each paragraph gets a /StructElem kid in logical
    order (bare-integer MCID inheriting the element's /Pg, or an /MCR
    reference dict with ``mcr_kids``); ``nest_sections`` wraps each
    page's elements in one /Sect parent that carries the /Pg its children
    inherit. ``artifact`` adds a footer line wrapped in /Artifact BDC …
    EMC (odd pages: the propertyless /Artifact BMC form) that tagged
    readers must DROP per §14.8.2.2 while geometric readers keep it."""
    objs: dict[int, bytes] = {}
    n = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    struct_root = 4 + 2 * n
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("latin-1")
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objs[1] = (
        b"<< /Type /Catalog /Pages 2 0 R "
        b"/MarkInfo << /Marked true >> "
        b"/StructTreeRoot %d 0 R >>" % struct_root
    )
    next_obj = struct_root + 1
    root_kids: list[int] = []
    for p, items in enumerate(pages):
        page_num, cont_num = 4 + 2 * p, 5 + 2 * p
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode("latin-1")
        # content stream: GEOMETRIC order, MCID = logical index
        ops: list[str] = []
        order = sorted(range(len(items)), key=lambda k: (-items[k][1], items[k][0]))
        for k in order:
            x, y, s = items[k]
            ops.append(
                f"/P << /MCID {k} >> BDC\n"
                f"BT /F1 12 Tf {x:g} {y:g} Td ({_esc(s)}) Tj ET\nEMC"
            )
        if artifact is not None:
            open_op = (
                "/Artifact BMC" if p % 2
                else "/Artifact << /Type /Pagination >> BDC"
            )
            ops.append(
                f"{open_op}\n"
                f"BT /F1 9 Tf 72 30 Td ({_esc(artifact)}) Tj ET\nEMC"
            )
        data = "\n".join(ops).encode("latin-1")
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs[cont_num] = (
            b"<< " + filt + b"/Length %d >>" % len(data)
            + b"\nstream\n" + data + b"\nendstream"
        )
        # structure elements, one per paragraph, LOGICAL order
        elem_nums: list[int] = []
        for k in range(len(items)):
            if mcr_kids:
                kid = (
                    b"<< /Type /MCR /Pg %d 0 R /MCID %d >>" % (page_num, k)
                )
                pg = b""
            else:
                kid = b"%d" % k
                # bare-int kids name the page on the ELEMENT unless a
                # /Sect parent carries it for inheritance
                pg = b"" if nest_sections else b"/Pg %d 0 R " % page_num
            objs[next_obj] = (
                b"<< /Type /StructElem /S /P " + pg + b"/K " + kid + b" >>"
            )
            elem_nums.append(next_obj)
            next_obj += 1
        if nest_sections:
            refs = b" ".join(b"%d 0 R" % e for e in elem_nums)
            objs[next_obj] = (
                b"<< /Type /StructElem /S /Sect /Pg %d 0 R /K [" % page_num
                + refs + b"] >>"
            )
            root_kids.append(next_obj)
            next_obj += 1
        else:
            root_kids.extend(elem_nums)
    refs = b" ".join(b"%d 0 R" % e for e in root_kids)
    objs[struct_root] = b"<< /Type /StructTreeRoot /K [" + refs + b"] >>"
    return _assemble_classic(objs)
