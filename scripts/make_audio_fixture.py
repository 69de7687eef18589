#!/usr/bin/env python3
"""Build FLAC and Ogg-Opus fixtures INDEPENDENTLY of the Scala parsers
(the make_mp3_fixture.py cross-validation precedent).

synthetic.flac: fLaC magic + last-marked STREAMINFO —
  22050 Hz, 1 channel, 8-bit, 55125 total samples (-> 2500 ms),
  with a VORBIS_COMMENT block AFTER it (the walk must not require
  STREAMINFO to be the only block).
synthetic.opus: OpusHead page (2ch, pre-skip 120, input 24000 Hz) +
  one audio page + an EOS page at granule 48120 (-> 48000 samples,
  1000 ms at the fixed 48 kHz Opus clock).
"""
import os
import struct

HERE = os.path.dirname(__file__)
FIX = os.path.join(HERE, "../src/test/resources/fixtures")


def make_flac():
    sr, ch, bps, total = 22050, 1, 8, 55125
    info = bytearray(34)
    info[0:2] = struct.pack(">H", 4096)   # min blocksize
    info[2:4] = struct.pack(">H", 4096)   # max blocksize
    packed = (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    info[10:18] = struct.pack(">Q", packed)
    # STREAMINFO (not last) then a VORBIS_COMMENT (last)
    head = b"fLaC" + bytes([0x00, 0, 0, 34]) + bytes(info)
    comment = b"\x84" + bytes([0, 0, 4]) + b"test"
    with open(os.path.join(FIX, "synthetic.flac"), "wb") as fh:
        fh.write(head + comment)


def ogg_page(header_type, granule, seq, payload):
    assert len(payload) < 255
    return (b"OggS" + bytes([0, header_type]) +
            struct.pack("<q", granule) + struct.pack("<I", 1) +
            struct.pack("<I", seq) + struct.pack("<I", 0) +
            bytes([1, len(payload)]) + payload)


def make_opus():
    head = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 120) +
            struct.pack("<I", 24000) + struct.pack("<H", 0) + bytes([0]))
    pages = (ogg_page(0x02, 0, 0, head) +
             ogg_page(0x00, 24120, 1, b"\x01\x02\x03") +
             ogg_page(0x04, 48120, 2, b"\x04"))
    with open(os.path.join(FIX, "synthetic.opus"), "wb") as fh:
        fh.write(pages)


def vorbis_comment(title, artist, album):
    def field(s):
        b = s.encode("utf-8")
        return struct.pack("<I", len(b)) + b
    vendor = field("python fixture writer")
    # ALBUM is written with a lowercase key: Vorbis comment keys are
    # case-insensitive, so the reader must still find it; COMMENT must
    # be stepped over
    fields = [field("TITLE=" + title), field("ARTIST=" + artist),
              field("album=" + album), field("COMMENT=ignored key")]
    return vendor + struct.pack("<I", len(fields)) + b"".join(fields)


def make_flac_tagged():
    sr, ch, bps, total = 48000, 2, 16, 96000
    info = bytearray(34)
    info[0:2] = struct.pack(">H", 4096)
    info[2:4] = struct.pack(">H", 4096)
    packed = (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    info[10:18] = struct.pack(">Q", packed)
    body = vorbis_comment("Flac Tïtle", "Lossless Ärtist", "Album Nr. 3")
    head = b"fLaC" + bytes([0x00, 0, 0, 34]) + bytes(info)
    comment = bytes([0x84]) + struct.pack(">I", len(body))[1:] + body
    with open(os.path.join(FIX, "synthetic_tags.flac"), "wb") as fh:
        fh.write(head + comment)


def make_opus_tagged():
    head = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 120) +
            struct.pack("<I", 48000) + struct.pack("<H", 0) + bytes([0]))
    tags = b"OpusTags" + vorbis_comment("Opus Tïtle", "Voice Ünit", "Ogg LP")
    pages = (ogg_page(0x02, 0, 0, head) +
             ogg_page(0x00, 0, 1, tags) +
             ogg_page(0x04, 96120, 2, b"\x04"))
    with open(os.path.join(FIX, "synthetic_tags.opus"), "wb") as fh:
        fh.write(pages)


def make_vorbis_tagged():
    ident = (bytes([1]) + b"vorbis" + struct.pack("<I", 0) +
             bytes([2]) + struct.pack("<I", 32000) +
             struct.pack("<III", 0, 0, 0) + bytes([0xB8, 1]))
    comment = (bytes([3]) + b"vorbis" +
               vorbis_comment("Vorbis Tïtle", "Ogg Ärtist", "Älbum V") +
               bytes([1]))  # framing bit
    pages = (ogg_page(0x02, 0, 0, ident) +
             ogg_page(0x00, 0, 1, comment) +
             ogg_page(0x04, 64000, 2, b"\x05"))
    with open(os.path.join(FIX, "synthetic_tags.ogg"), "wb") as fh:
        fh.write(pages)


def make_wav_tagged():
    """PCM WAV + a RIFF LIST/INFO tag chunk (INAM/IART/IPRD), with an
    ODD-length string (pad byte) and an unknown ICMT to step over."""
    sr, ch, nsamp = 8000, 1, 64
    data = b"".join(struct.pack("<h", (i * 50) % 3000) for i in range(nsamp))
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * 2 * ch, 2 * ch, 16)
    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad
    def info_sub(cid, text):
        return chunk(cid, text.encode("utf-8") + b"\x00")
    info = b"INFO" + info_sub(b"INAM", "Wäve Tïtle") + \
        info_sub(b"ICMT", "step over me") + \
        info_sub(b"IART", "Mono Märtyr") + info_sub(b"IPRD", "PCM LP")
    body = b"WAVE" + chunk(b"fmt ", fmt) + chunk(b"data", data) + \
        chunk(b"LIST", info)
    with open(os.path.join(FIX, "synthetic_tags.wav"), "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def ext80(rate):
    """IEEE 754 80-bit extended from an integer sample rate —
    independent of the scala writer's normalization."""
    bits = rate.bit_length()
    exp = 16383 + bits - 1
    mant = rate << (64 - bits)
    return struct.pack(">H", exp) + struct.pack(">Q", mant)


def make_aiff_tagged():
    """AIFF with NAME/AUTH text chunks BEFORE the COMM (chunk order is
    free per spec), an odd-length padded NAME, and an ANNO to skip."""
    sr, ch, n = 11025, 1, 32
    samples = b"".join(struct.pack(">h", 7000 if i % 2 == 0 else -7000)
                       for i in range(n))
    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack(">I", len(body)) + body + pad
    comm = chunk(b"COMM", struct.pack(">HIH", ch, n, 16) + ext80(sr))
    ssnd = chunk(b"SSND", struct.pack(">II", 0, 0) + samples)
    body = (b"AIFF" + chunk(b"NAME", "Fïxture Aiff".encode("utf-8")) +
            chunk(b"ANNO", b"skip me") +
            chunk(b"AUTH", "Pythön Author".encode("utf-8")) +
            comm + ssnd)
    with open(os.path.join(FIX, "synthetic_tags.aiff"), "wb") as fh:
        fh.write(b"FORM" + struct.pack(">I", len(body)) + body)


if __name__ == "__main__":
    make_flac()
    make_opus()
    make_flac_tagged()
    make_opus_tagged()
    make_vorbis_tagged()
    make_wav_tagged()
    make_aiff_tagged()
    print("wrote audio fixtures incl. synthetic_tags.aiff")
