#!/usr/bin/env python3
"""Build WebP header fixtures INDEPENDENTLY of the Scala parser
(the make_mp3_fixture.py cross-validation precedent).

synthetic.webp: extended (VP8X) container — alpha flag set, canvas
  640x360 — followed by an EXIF chunk ("Exif\0\0"-prefixed
  little-endian TIFF whose IFD0 carries the GPS Info pointer tag
  0x8825), so one fixture exercises the extended header, the RIFF
  chunk walk AND the GPS PII flag.
synthetic_lossless.webp: a VP8L header — 33x17, no alpha — the
  odd dimensions straddle the 14-bit field's byte boundaries.
"""
import os
import struct

HERE = os.path.dirname(__file__)
FIX = os.path.join(HERE, "../src/test/resources/fixtures")


def chunk(fourcc, payload):
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def riff_webp(body):
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def tiff_with_gps():
    # little-endian TIFF: header -> IFD0 at offset 8 with one entry,
    # tag 0x8825 (GPS Info IFD pointer), type LONG, count 1, value 0
    ifd = struct.pack("<H", 1)
    ifd += struct.pack("<HHI", 0x8825, 4, 1) + struct.pack("<I", 0)
    ifd += struct.pack("<I", 0)  # no next IFD
    return b"II" + struct.pack("<H", 42) + struct.pack("<I", 8) + ifd


def make_vp8x():
    w, h = 640, 360
    flags = 0x10 | 0x08  # alpha + EXIF present
    vp8x = bytes([flags, 0, 0, 0])
    vp8x += struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
    exif = b"Exif\x00\x00" + tiff_with_gps()
    body = chunk(b"VP8X", vp8x) + chunk(b"EXIF", exif)
    with open(os.path.join(FIX, "synthetic.webp"), "wb") as fh:
        fh.write(riff_webp(body))


def make_vp8l():
    w, h = 33, 17
    bits = (w - 1) | ((h - 1) << 14)  # then alpha bit 28 = 0
    payload = bytes([0x2F]) + struct.pack("<I", bits)
    with open(os.path.join(FIX, "synthetic_lossless.webp"), "wb") as fh:
        fh.write(riff_webp(chunk(b"VP8L", payload)))


if __name__ == "__main__":
    make_vp8x()
    make_vp8l()
    print("wrote synthetic.webp, synthetic_lossless.webp")
