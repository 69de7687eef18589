#!/usr/bin/env python3
"""Independent JPEG XL SizeHeader fixture writer (pure bit packing
from ISO/IEC 18181-1/-2), cross-validating
graft.operators.Multimodal.jxlInfo:

  synthetic.jxl            naked codestream FF 0A, ysize 777 via the
                           13-bit selector, EXPLICIT xsize 1234 via
                           the 18-bit selector (mixed selectors — the
                           scala builder always uses 30-bit)
  synthetic_container.jxl  BMFF container: signature + ftyp + a skip
                           box before jxlc; 320x240 via ratio 4:3
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.bit = 0

    def write(self, value, nbits):  # LSB-first
        for i in range(nbits):
            if self.bit == 0:
                self.bytes.append(0)
            if (value >> i) & 1:
                self.bytes[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) % 8


SELECTOR_BITS = [9, 13, 18, 30]


def write_u32(bw, v):
    """The spec's U32(bits+1) with the SMALLEST selector that fits."""
    for sel, bits in enumerate(SELECTOR_BITS):
        if v - 1 < (1 << bits):
            bw.write(sel, 2)
            bw.write(v - 1, bits)
            return
    raise ValueError(v)


def codestream(w, h, ratio=0):
    bw = BitWriter()
    bw.write(0, 1)  # div8 = 0
    write_u32(bw, h)
    bw.write(ratio, 3)
    if ratio == 0:
        write_u32(bw, w)
    return b"\xff\x0a" + bytes(bw.bytes)


def box(fourcc, payload):
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "synthetic.jxl"), "wb") as f:
        f.write(codestream(1234, 777))
    sig = b"\x00\x00\x00\x0cJXL \x0d\x0a\x87\x0a"
    ftyp = box(b"ftyp", b"jxl \x00\x00\x00\x00jxl ")
    skip = box(b"free", b"\x00" * 6)  # a box the walk must step over
    jxlc = box(b"jxlc", codestream(0, 240, ratio=3))  # 4:3 -> 320x240
    with open(os.path.join(OUT, "synthetic_container.jxl"), "wb") as f:
        f.write(sig + ftyp + skip + jxlc)
    print("wrote synthetic.jxl + synthetic_container.jxl")


if __name__ == "__main__":
    main()
