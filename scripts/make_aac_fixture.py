#!/usr/bin/env python3
"""Build ADTS (AAC) and M4A fixtures INDEPENDENTLY of the Scala
parsers (the make_mp3_fixture.py cross-validation precedent).

synthetic.adts: a 40-byte ID3v2 tag, then 3 AAC-LC frames
  (16000 Hz, mono, payload sizes 20/30/25 -> frame lengths 27/37/32,
  1024 samples each -> 3072 samples, 192 ms), then 4 junk bytes the
  walk must stop at cleanly.
synthetic.m4a: audio-only ISO-BMFF — mp4a sample entry, 2 channels,
  44100 Hz (16.16 fixed), mdhd timescale 44100 / duration 88200
  -> exactly 2000 ms.
"""
import os
import struct

HERE = os.path.dirname(__file__)
FIX = os.path.join(HERE, "../src/test/resources/fixtures")


def adts_frame(profile, sf_idx, channels, payload_len):
    length = 7 + payload_len
    h = bytearray(7)
    h[0] = 0xFF
    h[1] = 0xF1  # MPEG-4, layer 00, no CRC
    h[2] = (profile << 6) | (sf_idx << 2) | ((channels >> 2) & 1)
    h[3] = ((channels & 3) << 6) | ((length >> 11) & 3)
    h[4] = (length >> 3) & 0xFF
    h[5] = ((length & 7) << 5) | 0x1F
    h[6] = 0xFC  # buffer fullness low bits, 1 raw data block
    return bytes(h) + bytes(payload_len)


def make_adts():
    id3 = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 40]) + bytes(40)
    frames = b"".join(adts_frame(1, 8, 1, n) for n in (20, 30, 25))
    with open(os.path.join(FIX, "synthetic.adts"), "wb") as fh:
        fh.write(id3 + frames + b"junk")


def box(fourcc, payload):
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def make_m4a():
    sr, ch, samples = 44100, 2, 88200
    mdhd = struct.pack(">IIIII", 0, 0, 0, sr, samples) + struct.pack(">I", 0)
    hdlr = struct.pack(">II", 0, 0) + b"soun" + bytes(12)
    entry = struct.pack(">I", 36) + b"mp4a" + bytes(16) + \
        struct.pack(">HH", ch, 16) + struct.pack(">I", 0) + \
        struct.pack(">I", sr << 16)
    stsd = struct.pack(">II", 0, 1) + entry
    stbl = box(b"stbl", box(b"stsd", stsd))
    mdia = box(b"mdia", box(b"mdhd", mdhd) + box(b"hdlr", hdlr) +
               box(b"minf", stbl))
    moov = box(b"moov", box(b"trak", mdia))
    ftyp = box(b"ftyp", b"M4A " + bytes(4) + b"isomiso2")
    with open(os.path.join(FIX, "synthetic.m4a"), "wb") as fh:
        fh.write(ftyp + moov)


if __name__ == "__main__":
    make_adts()
    make_m4a()
    print("wrote synthetic.adts, synthetic.m4a")
