#!/usr/bin/env python3
"""Generate src/test/resources/fixtures/*.pdf — real (minimal, valid)
PDFs for PdfSource's pure-JDK text kernel: one with two uncompressed
content streams (pages), one with a FlateDecode-compressed stream.
Regenerate with: python3 scripts/make_pdf_fixture.py
"""
import os
import zlib

OUT_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "fixtures")


def lzw_encode(data, early=1):
    """PDF LZWDecode-compatible encoder (TIFF variant): 9->12 bit
    codes, 256 = clear, 257 = EOD, width grows `early` entries before
    the table would fill the current width.
    """
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)  # customary leading clear
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w = w + c
        else:
            emit(table[w])
            table[w + c] = next_code
            next_code += 1
            # decoder's table is one behind the encoder's at this point
            if next_code - 1 + early >= (1 << width) and width < 12:
                width += 1
            w = c
    if w:
        emit(table[w])
    emit(257)  # EOD
    if nbits > 0:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def build_pdf(content_streams, compress=False, filters=None, font=None,
              extra_objs=None):
    """Assemble a classic-xref PDF with one page per content stream.

    `filters`: optional (names, encode_fn) applying a /Filter chain,
    e.g. ("[/ASCII85Decode /LZWDecode]", lambda d: a85(lzw(d))).
    `font`: override the default Type1 font object body (the CID
    fixture injects /Type0 + /ToUnicode, plus extra objects).
    """
    objs = []
    n_pages = len(content_streams)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, cs in enumerate(content_streams):
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R /Resources << /Font << /F1 "
            f"{3 + 2 * n_pages} 0 R >> >> >>".encode())
        data = cs.encode("latin-1")
        if filters is not None:
            names, encode = filters
            data = encode(data)
            head = f"<< /Length {len(data)} /Filter {names} >>"
        elif compress:
            data = zlib.compress(data)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(data)} >>"
        objs.append(head.encode() + b"\nstream\n" + data + b"\nendstream")
    objs.append(font if font is not None
                else b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for extra in (extra_objs or []):
        objs.append(extra)

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


PAD = bytes([0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
             0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
             0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
             0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def rc4(key, data):
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    x = y = 0
    for b in data:
        x = (x + 1) & 0xFF
        y = (y + s[x]) & 0xFF
        s[x], s[y] = s[y], s[x]
        out.append(b ^ s[(s[x] + s[y]) & 0xFF])
    return bytes(out)


def build_encrypted_pdf(content, owner_pw=b"fixture-owner", user_pw=b""):
    """Standard security handler V2/R3 (RC4-128): the common
    owner-restricted-but-readable document (empty user password) or,
    with `user_pw`, a password-to-open file. O/U computed per spec
    algorithms 3/2/5; the one content stream is Flate-compressed then
    RC4-encrypted with its per-object key.
    """
    import hashlib
    keylen, r, p = 16, 3, -4
    fid = hashlib.md5(b"graft-encrypted-fixture-id").digest()

    # /O (algorithm 3)
    h = hashlib.md5((owner_pw + PAD)[:32]).digest()
    for _ in range(50):
        h = hashlib.md5(h).digest()
    okey = h[:keylen]
    o = rc4(okey, (user_pw + PAD)[:32])
    for i in range(1, 20):
        o = rc4(bytes(b ^ i for b in okey), o)

    # file key (algorithm 2)
    md = hashlib.md5()
    md.update((user_pw + PAD)[:32])
    md.update(o)
    md.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    md.update(fid)
    key = md.digest()
    for _ in range(50):
        key = hashlib.md5(key[:keylen]).digest()
    fkey = key[:keylen]

    # /U (algorithm 5)
    u = rc4(fkey, hashlib.md5(PAD + fid).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in fkey), u)
    u = u + bytes(16)  # R>=3: last 16 bytes arbitrary

    def obj_key(num, gen=0):
        m = hashlib.md5()
        m.update(fkey + num.to_bytes(3, "little") + gen.to_bytes(2, "little"))
        return m.digest()[:min(keylen + 5, 16)]

    data = rc4(obj_key(4), zlib.compress(content.encode("latin-1")))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        + b"\nstream\n" + data + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        (f"<< /Filter /Standard /V 2 /R 3 /Length 128 /P {p} "
         f"/O <{o.hex()}> /U <{u.hex()}> >>").encode(),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R /Encrypt 6 0 R "
            f"/ID [<{fid.hex()}> <{fid.hex()}>] >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def hash_2b(pw, salt, udata):
    """ISO 32000-2 7.6.4.3.4 algorithm 2.B — the R6 iterated hash.
    Independent of the Scala implementation (hashlib + cryptography)
    so reader and writer cross-validate.
    """
    import hashlib
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
    k = hashlib.sha256(pw + salt + udata).digest()
    count = 0
    while True:
        count += 1
        k1 = (pw + k + udata) * 64
        enc = Cipher(algorithms.AES(k[:16]), modes.CBC(k[16:32])).encryptor()
        e = enc.update(k1) + enc.finalize()
        k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][sum(e[:16]) % 3](e).digest()
        if count >= 64 and e[-1] <= count - 32:
            break
    return k[:32]


def build_encrypted_pdf_aes256(content, user_pw=b"",
                               owner_pw=b"fixture-owner-256", r=6):
    """Standard security handler V5/R6 (AES-256, ISO 32000-2 7.6.4):
    U/UE/O/OE per algorithms 8/9, Perms per algorithm 10, the content
    stream AES-256-CBC encrypted with the file key directly (no
    per-object derivation). All deterministic (salts and file key are
    SHA-256 of fixed strings) so the fixture is reproducible.
    """
    import hashlib
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    def aes_cbc_enc(key, iv, data):
        enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
        return enc.update(data) + enc.finalize()

    def h(pw, salt, udata):
        if r == 6:
            return hash_2b(pw, salt, udata)
        return hashlib.sha256(pw + salt + udata).digest()

    fkey = hashlib.sha256(b"graft-aes256-file-key").digest()  # 32 bytes
    uvs = hashlib.sha256(b"user-vsalt").digest()[:8]
    uks = hashlib.sha256(b"user-ksalt").digest()[:8]
    u = h(user_pw, uvs, b"") + uvs + uks
    ue = aes_cbc_enc(h(user_pw, uks, b""), bytes(16), fkey)
    ovs = hashlib.sha256(b"owner-vsalt").digest()[:8]
    oks = hashlib.sha256(b"owner-ksalt").digest()[:8]
    o = h(owner_pw, ovs, u) + ovs + oks
    oe = aes_cbc_enc(h(owner_pw, oks, u), bytes(16), fkey)
    p = -4
    # /Perms (algorithm 10): P LE ++ ffffffff ++ 'T' (metadata) ++ 'adb'
    # ++ 4 filler bytes, AES-ECB with the file key
    perms_clear = ((p & 0xFFFFFFFF).to_bytes(4, "little") + b"\xff\xff\xff\xff"
                   + b"Tadb" + b"grft")
    ecb = Cipher(algorithms.AES(fkey), modes.ECB()).encryptor()
    perms = ecb.update(perms_clear) + ecb.finalize()

    raw = zlib.compress(content.encode("latin-1"))
    padlen = 16 - len(raw) % 16
    iv = hashlib.sha256(b"stream-iv").digest()[:16]
    data = iv + aes_cbc_enc(fkey, iv, raw + bytes([padlen]) * padlen)

    enc_dict = (
        f"<< /Filter /Standard /V 5 /R {r} /Length 256 "
        f"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
        f"/StmF /StdCF /StrF /StdCF /P {p} "
        f"/U <{u.hex()}> /UE <{ue.hex()}> /O <{o.hex()}> /OE <{oe.hex()}> "
        f"/Perms <{perms.hex()}> >>")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        + b"\nstream\n" + data + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        enc_dict.encode(),
    ]
    fid = __import__("hashlib").md5(b"graft-aes256-fixture-id").digest()
    out = bytearray(b"%PDF-2.0\n")
    offsets = []
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R /Encrypt 6 0 R "
            f"/ID [<{fid.hex()}> <{fid.hex()}>] >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def build_pdf_xrefstream(content_streams):
    """PDF 1.5 layout: catalog/pages/page dicts inside a FlateDecode
    object stream (/ObjStm, type-2 xref entries), a cross-reference
    STREAM (/Type /XRef, W=[1 2 2]) encoded with PNG predictor 12 —
    the shape virtually every modern generator emits. Content streams
    are emitted in REVERSE byte order so only a reader that walks the
    page tree (not a linear stream scan) gets the page order right.
    """
    n = len(content_streams)
    page_nums = list(range(3, 3 + n))
    content_nums = list(range(3 + n, 3 + 2 * n))
    objstm_num = 3 + 2 * n
    xref_num = objstm_num + 1
    size = xref_num + 1

    kids = " ".join(f"{p} 0 R" for p in page_nums)
    in_objstm = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()),
    ] + [
        (p, f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {c} 0 R >>".encode())
        for p, c in zip(page_nums, content_nums)
    ]
    bodies = b""
    pair_offs = []
    for num, body in in_objstm:
        pair_offs.append((num, len(bodies)))
        bodies += body + b" "
    header = (" ".join(f"{num} {off}" for num, off in pair_offs) + " ").encode()
    objstm_data = zlib.compress(header + bodies)

    out = bytearray(b"%PDF-1.5\n")
    offsets = {}

    def emit(num, dict_bytes, stream=None):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + dict_bytes)
        if stream is not None:
            out.extend(b"\nstream\n" + stream + b"\nendstream")
        out.extend(b"\nendobj\n")

    # reverse byte order on purpose (see docstring)
    for cnum, cs in reversed(list(zip(content_nums, content_streams))):
        data = zlib.compress(cs.encode("latin-1"))
        emit(cnum, f"<< /Length {len(data)} /Filter /FlateDecode >>".encode(), data)
    emit(objstm_num,
         f"<< /Type /ObjStm /N {len(in_objstm)} /First {len(header)} "
         f"/Filter /FlateDecode /Length {len(objstm_data)} >>".encode(),
         objstm_data)

    entries = {0: (0, 0, 65535)}
    for i, (num, _) in enumerate(in_objstm):
        entries[num] = (2, objstm_num, i)
    for cnum in content_nums:
        entries[cnum] = (1, offsets[cnum], 0)
    entries[objstm_num] = (1, offsets[objstm_num], 0)
    xref_offset = len(out)
    entries[xref_num] = (1, xref_offset, 0)
    rows = [bytes([entries[num][0]]) + entries[num][1].to_bytes(2, "big")
            + entries[num][2].to_bytes(2, "big") for num in range(size)]
    cols = 5
    pred = bytearray()
    prev = bytes(cols)
    for row in rows:
        pred.append(2)  # PNG "Up" filter
        pred.extend((row[i] - prev[i]) & 0xff for i in range(cols))
        prev = row
    xdata = zlib.compress(bytes(pred))
    emit(xref_num,
         (f"<< /Type /XRef /Size {size} /W [1 2 2] /Root 1 0 R "
          f"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns {cols} >> "
          f"/Length {len(xdata)} >>").encode(), xdata)
    out.extend(f"startxref\n{xref_offset}\n%%EOF\n".encode())
    return bytes(out)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    plain = build_pdf([
        "BT /F1 12 Tf 72 720 Td (Hello, first page!) Tj T* "
        "[(Kerned ) -250 (text \\(grouped\\)) ] TJ ET",
        "BT /F1 12 Tf 72 720 Td (Second page) Tj T* "
        "(line with \\051 octal and <68657821> follows) Tj "
        "<776f726c64> Tj ET",
    ])
    with open(os.path.join(OUT_DIR, "plain.pdf"), "wb") as f:
        f.write(plain)
    flate = build_pdf([
        "BT /F1 12 Tf 72 720 Td (Compressed stream says hi) Tj ET",
    ], compress=True)
    with open(os.path.join(OUT_DIR, "flate.pdf"), "wb") as f:
        f.write(flate)
    # identical text to plain.pdf, PDF 1.5 xref-stream + ObjStm layout
    xrefstream = build_pdf_xrefstream([
        "BT /F1 12 Tf 72 720 Td (Hello, first page!) Tj T* "
        "[(Kerned ) -250 (text \\(grouped\\)) ] TJ ET",
        "BT /F1 12 Tf 72 720 Td (Second page) Tj T* "
        "(line with \\051 octal and <68657821> follows) Tj "
        "<776f726c64> Tj ET",
    ])
    with open(os.path.join(OUT_DIR, "xrefstream.pdf"), "wb") as f:
        f.write(xrefstream)

    # LZWDecode: content long enough (~600 chars with variety) that the
    # code table crosses 511 entries and the 9->10 bit width change is
    # exercised, not just the narrow-code path
    lzw_text = ("BT /F1 12 Tf 72 720 Td (LZW compressed page: "
                + " ".join(f"token{i:03d}" for i in range(60))
                + ") Tj ET")
    lzw_pdf = build_pdf([lzw_text], filters=("/LZWDecode", lzw_encode))
    with open(os.path.join(OUT_DIR, "lzw.pdf"), "wb") as f:
        f.write(lzw_pdf)

    # filter CHAIN: ASCII85(LZW(data)) declared as
    # [/ASCII85Decode /LZWDecode] — decoders must apply in array order
    import base64
    a85lzw = build_pdf(
        ["BT /F1 12 Tf 72 720 Td (chained filters decoded fine) Tj ET"],
        filters=("[/ASCII85Decode /LZWDecode]",
                 lambda d: base64.a85encode(lzw_encode(d), adobe=True)))
    with open(os.path.join(OUT_DIR, "a85lzw.pdf"), "wb") as f:
        f.write(a85lzw)

    # CID font with /ToUnicode CMap: 2-byte hex-string codes that only
    # a bfchar/bfrange-aware reader extracts as "Hello fi"
    cmap = ("/CIDInit /ProcSet findresource begin\n"
            "begincmap\n"
            "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            "3 beginbfchar\n"
            "<0001> <0048>\n"          # H
            "<0002> <0065>\n"          # e
            "<0003> <00660069>\n"      # fi ligature -> two chars
            "endbfchar\n"
            "2 beginbfrange\n"
            "<0010> <0014> <006C>\n"   # l..p
            "<0020> <0021> [<0020> <0021>]\n"  # space, !
            "endbfrange\n"
            "endcmap\nend\n").encode()
    # page 1 content: codes H e l l o <space> fi => "Hello fi"
    cid = build_pdf(
        ["BT /F1 12 Tf <000100020010001000130020> Tj <0003> Tj ET"],
        font=b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeCID "
             b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        extra_objs=[f"<< /Length {len(cmap)} >>".encode()
                    + b"\nstream\n" + cmap + b"\nendstream"])
    with open(os.path.join(OUT_DIR, "cid.pdf"), "wb") as f:
        f.write(cid)

    enc = build_encrypted_pdf(
        "BT /F1 12 Tf 72 720 Td (Owner-locked but readable) Tj ET")
    with open(os.path.join(OUT_DIR, "encrypted.pdf"), "wb") as f:
        f.write(enc)

    # legacy RC4 with a NON-empty user password (password-to-open)
    rc4_userpw = build_encrypted_pdf(
        "BT /F1 12 Tf 72 720 Td (Legacy password-locked text) Tj ET",
        user_pw=b"legacy-pw")
    with open(os.path.join(OUT_DIR, "rc4_userpw.pdf"), "wb") as f:
        f.write(rc4_userpw)

    # AES-256 R6: empty user password (owner-restricted), and a
    # password-to-open variant
    aes256 = build_encrypted_pdf_aes256(
        "BT /F1 12 Tf 72 720 Td (AES-256 secured but readable) Tj ET")
    with open(os.path.join(OUT_DIR, "aes256.pdf"), "wb") as f:
        f.write(aes256)
    aes256_userpw = build_encrypted_pdf_aes256(
        "BT /F1 12 Tf 72 720 Td (AES-256 password-locked text) Tj ET",
        user_pw=b"s3cret-user")
    with open(os.path.join(OUT_DIR, "aes256_userpw.pdf"), "wb") as f:
        f.write(aes256_userpw)
    # R5 (the pre-R6 AESV3 revision): single-SHA-256 validation
    aes256_r5 = build_encrypted_pdf_aes256(
        "BT /F1 12 Tf 72 720 Td (AES-256 R5 legacy revision) Tj ET", r=5)
    with open(os.path.join(OUT_DIR, "aes256_r5.pdf"), "wb") as f:
        f.write(aes256_r5)

    # TWO CID fonts whose CMaps map the SAME code <0001> to different
    # glyphs — only per-font (Tf-tracked) decoding extracts "AZ"; a
    # union map would emit "AA" or "ZZ"
    cmap_a = (b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
              b"endcodespacerange\n1 beginbfchar\n<0001> <0041>\n"
              b"endbfchar\nendcmap\n")            # 0001 -> 'A'
    cmap_z = (b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
              b"endcodespacerange\n1 beginbfchar\n<0001> <005A>\n"
              b"endbfchar\nendcmap\n")            # 0001 -> 'Z'
    content = b"BT /F1 12 Tf <0001> Tj /F2 12 Tf <0001> Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> >>",
        f"<< /Length {len(content)} >>".encode()
        + b"\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FontA "
        b"/Encoding /Identity-H /ToUnicode 7 0 R >>",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FontZ "
        b"/Encoding /Identity-H /ToUnicode 8 0 R >>",
        f"<< /Length {len(cmap_a)} >>".encode()
        + b"\nstream\n" + cmap_a + b"\nendstream",
        f"<< /Length {len(cmap_z)} >>".encode()
        + b"\nstream\n" + cmap_z + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    with open(os.path.join(OUT_DIR, "cid2.pdf"), "wb") as f:
        f.write(bytes(out))

    print(f"wrote plain.pdf ({len(plain)}b), flate.pdf ({len(flate)}b), "
          f"xrefstream.pdf ({len(xrefstream)}b), lzw.pdf ({len(lzw_pdf)}b), "
          f"a85lzw.pdf ({len(a85lzw)}b), cid.pdf ({len(cid)}b), "
          f"encrypted.pdf ({len(enc)}b) in {OUT_DIR}")


if __name__ == "__main__":
    main()
