#!/usr/bin/env python3
"""Independent ID3v2 / M4A-ilst tag fixture writer (pure struct
packing), cross-validating the JVM readers (Multimodal.id3v2Tags /
m4aTags). Writes:

  synthetic_tags_v23.mp3  ID3v2.3: UTF-16-BOM title, latin-1 artist,
                          UTF-16BE album, a frame to skip, padding,
                          prepended to a bare MPEG frame
  synthetic_tags_v24.mp3  ID3v2.4: UTF-8 text, syncsafe frame sizes
                          (one frame > 127 bytes to make plain-size
                          parsing visibly wrong), extended header
  synthetic_tags.m4a      moov/udta/meta/ilst with nam/ART/alb data
                          atoms plus an unknown atom to step over
  synthetic_apic_v23.mp3  APIC cover art with a UTF-16 description
                          (double-NUL terminator) around a real PNG
  synthetic_pic_v22.mp3   v2.2 PIC frame: 3-char image format
  synthetic_art.flac      PICTURE metadata block (type 6) with
                          non-zero dims fields and a description
  synthetic_covr.m4a      covr data atom with TYPE 0 (implicit:
                          the reader must sniff the PNG magic)
"""
import struct
import os
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def syncsafe(n):
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def frame_v22(fid, payload):
    assert len(fid) == 3
    n = len(payload)
    return fid.encode() + bytes([(n >> 16) & 0xFF, (n >> 8) & 0xFF, n & 0xFF]) + payload


def frame_v23(fid, payload):
    return fid.encode() + struct.pack(">I", len(payload)) + b"\x00\x00" + payload


def frame_v24(fid, payload, fmt_flags=0):
    return fid.encode() + syncsafe(len(payload)) + bytes([0, fmt_flags]) + payload


def unsync(data):
    """ID3v2 unsynchronisation: insert 0x00 after every 0xFF."""
    out = bytearray()
    for b in data:
        out.append(b)
        if b == 0xFF:
            out.append(0)
    return bytes(out)


def tag(version, frames, ext_header=b"", padding=0, unsync_flag=False,
        unsync_body=False):
    body = ext_header + b"".join(frames) + b"\x00" * padding
    if unsync_body:
        body = unsync(body)
    flags = (0x40 if ext_header else 0) | (0x80 if unsync_flag else 0)
    return b"ID3" + bytes([version, 0, flags]) + syncsafe(len(body)) + body


def v23():
    frames = [
        frame_v23("TIT2", b"\x01\xff\xfe" + "Le Titre é".encode("utf-16-le")),
        frame_v23("TPE1", b"\x00" + b"Artist A"),
        frame_v23("TXXX", b"\x00desc\x00ignored"),  # must be stepped over
        frame_v23("TALB", b"\x02" + "Album B".encode("utf-16-be")),
    ]
    return tag(3, frames, padding=24)


def v24():
    long_title = "T" * 130  # frame size > 127: syncsafe vs plain diverges
    # v2.4 extended header: syncsafe size INCLUDING itself, minimal 6
    ext = syncsafe(6) + b"\x01\x00"
    frames = [
        frame_v24("TIT2", b"\x03" + long_title.encode("utf-8")),
        frame_v24("TPE1", b"\x03" + "Artíst".encode("utf-8") + b"\x00extra"),
        frame_v24("TALB", b"\x03" + b"Al bum"),
    ]
    return tag(4, frames, ext_header=ext, padding=8)


def v22():
    # the pre-1999 iTunes-legacy layout: 3-char IDs, u24 plain sizes
    frames = [
        frame_v22("TT2", b"\x01\xff\xfe" + "Vieux Titre à".encode("utf-16-le")),
        frame_v22("TP1", b"\x00" + b"Old Artist"),
        frame_v22("UFI", b"owner\x00\x01\x02"),  # must be stepped over
        frame_v22("TAL", b"\x00" + b"Old Album"),
    ]
    return tag(2, frames, padding=16)


def v23_unsync():
    # whole-tag unsynchronisation (v2.3 scope): the UTF-16 BOMs carry
    # 0xFF bytes, so the stuffing actually fires — a reader ignoring
    # the 0x80 flag sees shifted frame sizes and garbled text
    frames = [
        frame_v23("TIT2", b"\x01\xff\xfe" + "Unsync é".encode("utf-16-le")),
        frame_v23("TPE1", b"\x01\xff\xfe" + "Artist ü".encode("utf-16-le")),
        frame_v23("TALB", b"\x00" + b"Plain Album"),
    ]
    return tag(3, frames, padding=12, unsync_flag=True, unsync_body=True)


def v24_unsync():
    # v2.4 scope: per-frame unsynchronisation, frame format bit 0x02;
    # stored frame size counts the stuffed bytes
    def uframe(fid, payload):
        return frame_v24(fid, unsync(payload), fmt_flags=0x02)
    frames = [
        uframe("TIT2", b"\x01\xff\xfe" + "Frame Unsync".encode("utf-16-le")),
        frame_v24("TPE1", b"\x03" + "Mixed Artist".encode("utf-8")),
        uframe("TALB", b"\x01\xff\xfe" + "Al ÿ bum".encode("utf-16-le")),
    ]
    return tag(4, frames, padding=8)


def mpeg_frame():
    # one MPEG1 Layer III 32 kbps 44.1 kHz frame of zeros (header only
    # matters: the tag readers must not care what follows the tag)
    hdr = struct.pack(">I", 0xFFFB1000)
    return hdr + b"\x00" * 100


def box(fourcc, payload):
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def m4a():
    def atom(fid, value):
        data = box(b"data", struct.pack(">II", 1, 0) + value.encode("utf-8"))
        return box(fid, data)

    ilst = box(b"ilst", atom(b"\xa9nam", "M4A Title") +
               box(b"skip", b"\x00" * 4) +
               atom(b"\xa9ART", "M4A Artist") +
               atom(b"\xa9alb", "M4A Album"))
    meta = box(b"meta", b"\x00" * 4 + box(b"hdlr", b"\x00" * 24) + ilst)
    udta = box(b"udta", meta)
    mdhd = struct.pack(">IIIII", 0, 0, 0, 8000, 16000) + b"\x00" * 4
    hdlr = b"\x00" * 8 + b"soun" + b"\x00" * 12
    entry = struct.pack(">I", 36) + b"mp4a" + b"\x00" * 16 + \
        struct.pack(">HH", 2, 16) + b"\x00" * 4 + struct.pack(">I", 8000 << 16)
    stsd = struct.pack(">II", 0, 1) + entry
    mdia = box(b"mdia", box(b"mdhd", mdhd) + box(b"hdlr", hdlr) +
               box(b"minf", box(b"stbl", box(b"stsd", stsd))))
    ftyp = box(b"ftyp", b"M4A \x00\x00\x02\x00isomiso2")
    return ftyp + box(b"moov", box(b"trak", mdia) + udta)


def tiny_png():
    """A real, decodable 2x2 RGB PNG — deterministic bytes."""
    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data +
                struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    raw = (b"\x00\x10\x20\x30\x40\x50\x60" +
           b"\x00\x70\x80\x90\xA0\xB0\xC0")  # filter byte + 2 RGB px/row
    idat = zlib.compress(raw, 9)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def apic_v23():
    png = tiny_png()
    # UTF-16 description terminates on an ALIGNED double-NUL — a
    # latin-1 single-NUL scan would cut inside the BOM'd text
    desc = b"\xff\xfe" + "Front cover é".encode("utf-16-le") + b"\x00\x00"
    apic = b"\x01" + b"image/png\x00" + b"\x03" + desc + png
    frames = [frame_v23("TIT2", b"\x00" + b"Art Title"),
              frame_v23("APIC", apic)]
    return tag(3, frames, padding=8)


def pic_v22():
    png = tiny_png()
    pic = b"\x00" + b"PNG" + b"\x03" + b"cover\x00" + png
    frames = [frame_v22("TT2", b"\x00" + b"Old Art"),
              frame_v22("PIC", pic)]
    return tag(2, frames, padding=8)


def flac_art():
    png = tiny_png()

    def block(btype, body, last=False):
        n = len(body)
        return bytes([(0x80 if last else 0) | btype,
                      (n >> 16) & 0xFF, (n >> 8) & 0xFF, n & 0xFF]) + body

    streaminfo = (struct.pack(">HHBBB", 16, 16, 0, 0, 0) +
                  b"\x00" * 10 + b"\x00" * 16)[:34]
    vendor = b"py fixture"
    comment = (struct.pack("<I", len(vendor)) + vendor +
               struct.pack("<I", 1) +
               struct.pack("<I", len(b"TITLE=Flac Art")) + b"TITLE=Flac Art")
    mime = b"image/png"
    desc = "couverture avant é".encode("utf-8")
    picture = (struct.pack(">I", 3) +
               struct.pack(">I", len(mime)) + mime +
               struct.pack(">I", len(desc)) + desc +
               struct.pack(">IIII", 2, 2, 24, 0) +  # REAL dims: must be skipped right
               struct.pack(">I", len(png)) + png)
    return (b"fLaC" + block(0, streaminfo) + block(4, comment) +
            block(6, picture, last=True))


def m4a_covr():
    png = tiny_png()
    ilst = box(b"ilst",
               box(b"\xa9nam", box(b"data",
                   struct.pack(">II", 1, 0) + b"Covr Title")) +
               box(b"covr", box(b"data",
                   struct.pack(">II", 0, 0) + png)))  # type 0: sniffed
    meta = box(b"meta", b"\x00" * 4 + ilst)
    ftyp = box(b"ftyp", b"M4A \x00\x00\x02\x00isomiso2")
    return ftyp + box(b"moov", box(b"udta", meta))


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "synthetic_apic_v23.mp3"), "wb") as f:
        f.write(apic_v23() + mpeg_frame())
    with open(os.path.join(OUT, "synthetic_pic_v22.mp3"), "wb") as f:
        f.write(pic_v22() + mpeg_frame())
    with open(os.path.join(OUT, "synthetic_art.flac"), "wb") as f:
        f.write(flac_art())
    with open(os.path.join(OUT, "synthetic_covr.m4a"), "wb") as f:
        f.write(m4a_covr())
    with open(os.path.join(OUT, "synthetic_tags_v23.mp3"), "wb") as f:
        f.write(v23() + mpeg_frame())
    with open(os.path.join(OUT, "synthetic_tags_v24.mp3"), "wb") as f:
        f.write(v24() + mpeg_frame())
    with open(os.path.join(OUT, "synthetic_tags.m4a"), "wb") as f:
        f.write(m4a())
    with open(os.path.join(OUT, "synthetic_tags_v22.mp3"), "wb") as f:
        f.write(v22() + mpeg_frame())
    with open(os.path.join(OUT, "synthetic_tags_v23_unsync.mp3"), "wb") as f:
        f.write(v23_unsync() + mpeg_frame())
    with open(os.path.join(OUT, "synthetic_tags_v24_unsync.mp3"), "wb") as f:
        f.write(v24_unsync() + mpeg_frame())
    print("wrote 10 tag/art fixtures")


if __name__ == "__main__":
    main()
