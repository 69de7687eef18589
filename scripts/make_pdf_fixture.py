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


def build_pdf(content_streams, compress=False):
    """Assemble a classic-xref PDF with one page per content stream."""
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
        if compress:
            data = zlib.compress(data)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(data)} >>"
        objs.append(head.encode() + b"\nstream\n" + data + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

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
    print(f"wrote plain.pdf ({len(plain)}b), flate.pdf ({len(flate)}b) in {OUT_DIR}")


if __name__ == "__main__":
    main()
