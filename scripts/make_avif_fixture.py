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


def gps_tiff():
    """Minimal little-endian TIFF: IFD0 with the GPS Info IFD pointer
    (tag 0x8825) and an empty GPS IFD behind it."""
    ifd = struct.pack("<H", 1) + \
        struct.pack("<HHII", 0x8825, 4, 1, 8 + 2 + 12 + 4) + \
        struct.pack("<I", 0)
    gps_ifd = struct.pack("<HI", 0, 0)
    return b"II" + struct.pack("<HI", 42, 8) + ifd + gps_ifd


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

    # GPS variant: EXIF behind the iinf/iloc item indirection, using
    # the PATHS THE SCALA BUILDER DOESN'T — infe version 3 (u32 item
    # id), iloc version 1 (construction_method + base_offset 4B +
    # index_size 4), the libavif-style ExifDataBlock offset 6 pointing
    # PAST an "Exif\0\0" prefix, and a primary-item av01 entry before
    # the Exif one (walkers must match by type, not take the first).
    exif_payload = struct.pack(">I", 6) + b"Exif\x00\x00" + gps_tiff()
    infe_av01 = box("infe", struct.pack(">I", 3 << 24) +
                    struct.pack(">IH", 1, 0) + b"av01" + b"img\x00")
    infe_exif = box("infe", struct.pack(">I", 3 << 24) +
                    struct.pack(">IH", 7, 0) + b"Exif" + b"Exif\x00")
    iinf = box("iinf", struct.pack(">I", 1 << 24) +  # v1: u32 count
               struct.pack(">I", 2) + infe_av01 + infe_exif)
    # iloc v1: off/len size 4, base_offset 4, index_size 4; two items
    # (av01 first). Each item: u16 id, u16 reserved+method(0), u16
    # dataref, base_offset, u16 extent count, per-extent idx/off/len.
    # The Exif extent splits base+offset so BOTH must be summed.
    def iloc_item(item_id, base, extents):
        body = struct.pack(">HHH", item_id, 0, 0) + struct.pack(">I", base) + \
            struct.pack(">H", len(extents))
        for (idx, off, ln) in extents:
            body += struct.pack(">III", idx, off, ln)
        return body
    meta2_of = None
    exif_off = 0  # two-pass: sizes are fixed, only the value changes
    for _ in range(2):
        iloc = box("iloc", struct.pack(">I", 1 << 24) +
                   bytes([0x44, 0x44]) + struct.pack(">H", 2) +
                   iloc_item(1, 0, [(0, 0, 8)]) +
                   iloc_item(7, exif_off - 4 if exif_off else 0,
                             [(0, 4, len(exif_payload))]))
        meta2 = box("meta", b"\x00" * 4 + hdlr +
                    box("iprp", box("ipco", av1c + ispe + pixi)) +
                    iinf + iloc)
        meta2_of = meta2
        exif_off = len(ftyp) + len(meta2) + 8  # into mdat's body
    mdat2 = box("mdat", exif_payload)
    with open(os.path.join(OUT, "synthetic_gps.avif"), "wb") as f:
        f.write(ftyp + meta2_of + mdat2)
    print("wrote synthetic.avif + synthetic_gps.avif")


if __name__ == "__main__":
    main()
