#!/usr/bin/env python3
"""Independent Matroska/WebM EBML fixture writer (pure struct
packing), cross-validating graft.operators.Multimodal.webmInfo on the
layout axes the scala builder does NOT use:

  synthetic.webm        video: UNKNOWN-size Segment (the live-muxed
                        convention — all value bits set), 1-byte and
                        2-byte size VINTs, a 4-byte FLOAT Duration,
                        TrackType written AFTER the Video element,
                        an unknown element (SeekHead) to step over,
                        an audio track BEFORE the video track
                        (primary-modality selection), and a Cues
                        seek table
  synthetic_audio.mka   audio-only matroska (docType matroska):
                        8-byte float SamplingFrequency, no Duration
                        (duration_ms must stay null)
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def vint_size(n, width=None):
    """Size VINT; width=None picks the smallest, explicit width pads."""
    if width is None:
        width = 1
        while n >= (1 << (7 * width)) - 1:  # all-ones is reserved
            width += 1
    marker = 1 << (8 - width)
    out = bytearray(width)
    v = n | (marker << (8 * (width - 1)))
    for i in range(width - 1, -1, -1):
        out[i] = v & 0xFF
        v >>= 8
    return bytes(out)


def unknown_size(width=8):
    """All value bits set = 'size unknown' (live-muxed Segment)."""
    marker = 1 << (8 - width)
    return bytes([marker | (marker - 1)] + [0xFF] * (width - 1))


def eid(i):
    n = (i.bit_length() + 7) // 8
    return i.to_bytes(n, "big")


def el(i, payload, size_width=None):
    return eid(i) + vint_size(len(payload), size_width) + payload


def uint_el(i, v):
    n = max(1, (v.bit_length() + 7) // 8)
    return el(i, v.to_bytes(n, "big"))


def main():
    os.makedirs(OUT, exist_ok=True)
    # --- video webm, unknown-size segment -------------------------
    ebml = el(0x1A45DFA3, el(0x4282, b"webm"))
    info = el(0x1549A966,
              uint_el(0x2AD7B1, 1000000) +
              el(0x4489, struct.pack(">f", 2500.0)))  # 4-byte float
    audio_track = el(0xAE,
                     uint_el(0xD7, 1) + uint_el(0x83, 2) +
                     el(0x86, b"A_VORBIS") +
                     el(0xE1, el(0xB5, struct.pack(">f", 44100.0)) +
                        uint_el(0x9F, 2)))
    # TrackType AFTER the Video element — order must not matter
    video_track = el(0xAE,
                     uint_el(0xD7, 2) +
                     el(0xE0, uint_el(0xB0, 1920) + uint_el(0xBA, 1080)) +
                     el(0x86, b"V_VP9") + uint_el(0x83, 1))
    tracks = el(0x1654AE6B, audio_track + video_track)
    seekhead = el(0x114D9B74, b"\x00" * 11)  # unknown to the walker
    cues = el(0x1C53BB6B, b"".join(
        el(0xBB, uint_el(0xB3, t * 500)) for t in range(4)))
    seg_body = seekhead + info + tracks + cues
    segment = eid(0x18538067) + unknown_size(8) + seg_body
    with open(os.path.join(OUT, "synthetic.webm"), "wb") as f:
        f.write(ebml + segment)

    # --- audio-only matroska, no duration, with Tags ----------------
    # SimpleTag names in mixed case (the reader matches
    # case-insensitively), a nested non-text SimpleTag to step over
    ebml2 = el(0x1A45DFA3, el(0x4282, b"matroska"))
    info2 = el(0x1549A966, uint_el(0x2AD7B1, 1000000))
    atrack = el(0xAE,
                uint_el(0xD7, 1) + uint_el(0x83, 2) +
                el(0x86, b"A_OPUS") +
                el(0xE1, el(0xB5, struct.pack(">d", 48000.0)) +  # 8-byte
                   uint_el(0x9F, 1)))
    def simple_tag(name, value):
        return el(0x67C8, el(0x45A3, name.encode("utf-8")) +
                  el(0x4487, value.encode("utf-8")))
    tags = el(0x1254C367, el(0x7373,
              simple_tag("Title", "Mätroska Tïtle") +
              simple_tag("RATING", "5") +
              simple_tag("artist", "EBML Ärtist") +
              simple_tag("Album", "Cluster LP")))
    seg2 = el(0x18538067, info2 + el(0x1654AE6B, atrack) + tags)
    with open(os.path.join(OUT, "synthetic_audio.mka"), "wb") as f:
        f.write(ebml2 + seg2)
    print("wrote synthetic.webm + synthetic_audio.mka")


if __name__ == "__main__":
    main()
