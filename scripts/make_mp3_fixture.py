#!/usr/bin/env python3
"""Build an MPEG-1 Layer III fixture INDEPENDENTLY of the Scala walk
(same cross-validation idea as make_pdf_fixture.py): real frame
headers per ISO/IEC 11172-3, real side-info geometry with planted
per-granule global_gain values, zeroed main data, an ID3v2 tag the
reader must skip, a padded frame, and a trailing ID3v1 tag the walk
must stop at. The spec (SemanticSpec) asserts graft's mpegAudioInfo
recovers exactly the facts encoded here.

Layout encoded below (stereo, 44100 Hz, MPEG1 Layer III):
  - ID3v2.4 tag with a 77-byte body
  - 6 frames, bitrate indexes [9, 9, 10, 9, 11, 9] -> kbps
    [128, 128, 160, 128, 192, 128] (VBR; mean 144.0)
  - frame 2 (0-based) carries padding=1 (size +1)
  - per-frame granule gains (max of the two channels):
    frame i granule g -> 60 + 10*i + g
  - ID3v1 tag ("TAG" + 125 bytes) after the last frame
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__),
                   "../src/test/resources/fixtures/synthetic.mp3")

BITRATES_V1_L3 = [None, 32, 40, 48, 56, 64, 80, 96,
                  112, 128, 160, 192, 224, 256, 320]
SR = 44100
SR_IDX = 0


def set_bits(buf, bit_off, width, value):
    for i in range(width):
        if (value >> (width - 1 - i)) & 1:
            abs_bit = bit_off + i
            buf[abs_bit // 8] |= 1 << (7 - (abs_bit % 8))


def frame(br_idx, padding, gains_by_granule_channel):
    kbps = BITRATES_V1_L3[br_idx]
    size = 144 * kbps * 1000 // SR + padding
    f = bytearray(size)
    f[0] = 0xFF
    # sync(3) | verId=11 (MPEG1) | layer=01 (III) | protection=1 (no CRC)
    f[1] = 0b11111011
    f[2] = (br_idx << 4) | (SR_IDX << 2) | (padding << 1)
    f[3] = 0x00  # mode 00 = stereo
    # side info (stereo MPEG1, 32 bytes at offset 4):
    # main_data_begin(9) + private(3) + scfsi(8), then 4 blocks of 59
    # bits (gr0ch0, gr0ch1, gr1ch0, gr1ch1); global_gain 21 bits in
    base = 9 + 3 + 8
    for gr in range(2):
        for ch in range(2):
            gain = gains_by_granule_channel[gr][ch]
            off = 4 * 8 + base + (gr * 2 + ch) * 59 + 21
            set_bits(f, off, 8, gain)
    return bytes(f)


def main():
    body = bytearray()
    # ID3v2.4 header: "ID3", version, flags=0, syncsafe size 77
    body += b"ID3" + bytes([4, 0, 0]) + bytes(
        [(77 >> 21) & 0x7F, (77 >> 14) & 0x7F, (77 >> 7) & 0x7F, 77 & 0x7F])
    body += bytes(77)
    br_idxs = [9, 9, 10, 9, 11, 9]
    for i, br in enumerate(br_idxs):
        pad = 1 if i == 2 else 0
        # channel 1 carries the envelope value, channel 0 stays lower,
        # so max-over-channels == 60 + 10*i + gr
        gains = [[50, 60 + 10 * i + gr] for gr in range(2)]
        body += frame(br, pad, gains)
    body += b"TAG" + bytes(125)  # ID3v1 trailer the walk must stop at
    with open(OUT, "wb") as fh:
        fh.write(bytes(body))
    mean = sum(BITRATES_V1_L3[i] for i in br_idxs) / len(br_idxs)
    print(f"wrote {OUT}: {len(body)} bytes, 6 frames, mean {mean} kbps")


if __name__ == "__main__":
    main()
