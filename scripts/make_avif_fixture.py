#!/usr/bin/env python3
"""Independent AVIF header fixture writer (pure struct packing),
cross-validating graft.operators.Multimodal.avifInfo: an ISO-BMFF
ftyp(avif) + meta(hdlr pict, iprp(ipco(ispe, pixi))) skeleton with a
placeholder mdat. Writes synthetic.avif: 1234x777, 4 channels, with
the avif brand only in the COMPATIBLE list (major brand mif1) — the
brand-scan path a lazy major-brand check would miss.
"""
import struct
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def box(fourcc, payload):
    return struct.pack(">I", 8 + len(payload)) + fourcc.encode() + payload


def main():
    w, h, channels = 1234, 777, 4
    ftyp = box("ftyp", b"mif1" + b"\x00" * 4 + b"avif" + b"miaf")
    hdlr = box("hdlr", b"\x00" * 8 + b"pict" + b"\x00" * 12)
    ispe = box("ispe", struct.pack(">III", 0, w, h))
    pixi = box("pixi", struct.pack(">IB", 0, channels) + b"\x08" * channels)
    # an unknown sibling property the walker must step over intact
    av1c = box("av1C", b"\x81\x0c\x00\x00")
    meta = box("meta", b"\x00" * 4 + hdlr +
               box("iprp", box("ipco", av1c + ispe + pixi)))
    mdat = box("mdat", b"\x00" * 32)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "synthetic.avif"), "wb") as f:
        f.write(ftyp + meta + mdat)
    print("wrote synthetic.avif")


if __name__ == "__main__":
    main()
