#!/usr/bin/env python3
"""Independent TIFF fixture writer (pure python struct packing — no
imaging libs), cross-validating the JVM reader half: decodeTiff header
facts, decodePixels' ImageIO raster path, and the exifGpsPresent GPS
flag for TIFF files. Writes:

  src/test/resources/fixtures/synthetic.tiff       little-endian, 6x4
      uncompressed RGB, pixel (x,y) = (10x+y, 20x, 250-10y)
  src/test/resources/fixtures/synthetic_gps.tiff   big-endian, 3x2
      uncompressed RGB solid (40, 80, 120), GPS Info IFD pointer
      (tag 0x8825) in IFD0
"""
import struct
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def tiff(width, height, pix, little, gps):
    e = "<" if little else ">"
    tags = []  # (tag, type, count, value)
    strip = b"".join(bytes(pix(x, y)) for y in range(height)
                     for x in range(width))
    ntags = 9 if gps else 8
    ifd_off = 8
    ifd_bytes = 2 + 12 * ntags + 4
    gps_ifd_off = ifd_off + ifd_bytes
    strip_off = gps_ifd_off + (6 if gps else 0)
    tags = [
        (0x0100, 3, 1, width),       # ImageWidth
        (0x0101, 3, 1, height),      # ImageLength
        (0x0102, 3, 1, 8),           # BitsPerSample (count 1 = all)
        (0x0103, 3, 1, 1),           # Compression: none
        (0x0106, 3, 1, 2),           # Photometric: RGB
        (0x0111, 4, 1, strip_off),   # StripOffsets
        (0x0115, 3, 1, 3),           # SamplesPerPixel
        (0x0117, 4, 1, len(strip)),  # StripByteCounts
    ]
    if gps:
        tags.append((0x8825, 4, 1, gps_ifd_off))  # GPS Info IFD pointer
    out = (b"II" if little else b"MM")
    out += struct.pack(e + "HI", 42, ifd_off)
    out += struct.pack(e + "H", len(tags))
    for tag, typ, count, value in sorted(tags):
        if typ == 3:  # SHORT: left-justified in the 4-byte slot
            out += struct.pack(e + "HHIHH", tag, typ, count, value, 0)
        else:
            out += struct.pack(e + "HHII", tag, typ, count, value)
    out += struct.pack(e + "I", 0)  # next-IFD pointer
    if gps:
        out += struct.pack(e + "HI", 0, 0)  # empty GPS IFD
    out += strip
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    plain = tiff(6, 4, lambda x, y: (10 * x + y, 20 * x, 250 - 10 * y),
                 little=True, gps=False)
    with open(os.path.join(OUT, "synthetic.tiff"), "wb") as f:
        f.write(plain)
    tagged = tiff(3, 2, lambda x, y: (40, 80, 120), little=False, gps=True)
    with open(os.path.join(OUT, "synthetic_gps.tiff"), "wb") as f:
        f.write(tagged)
    print("wrote", len(plain), "and", len(tagged), "bytes")


if __name__ == "__main__":
    main()
