#!/usr/bin/env python3
"""Build an ISO-BMFF fixture INDEPENDENTLY of the Scala walk (the
make_mp3_fixture.py / make_pdf_fixture.py cross-validation precedent):
a valid box tree whose video track uses MULTI-RUN sample-to-chunk
mapping — the layout real muxers emit and the hardest part of the
stbl reconstruction:

  - ftyp, then mdat holding 5 distinct fake samples
  - chunk 1 holds samples 1-3, chunk 2 holds samples 4-5
    (stsc runs [(1,3),(2,2)], stco two offsets)
  - per-sample sizes 11,12,13,14,15 (stsz uniform=0 table form)
  - sync samples stss = {1,4}
  - mdhd timescale 600, total duration 125 ticks -> 208 ms

SemanticSpec asserts graft's mp4VideoTrack recovers exactly these
facts and mp4KeyframeSamples returns the planted sync-sample bytes.
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__),
                   "../src/test/resources/fixtures/synthetic.mp4")


def box(kind, payload):
    return struct.pack(">I", 8 + len(payload)) + kind.encode() + payload


def u32s(*vals):
    return b"".join(struct.pack(">I", v) for v in vals)


def main():
    samples = [bytes([0x40 + i]) * (11 + i) for i in range(5)]
    ftyp = box("ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_payload = b"".join(samples)
    mdat = box("mdat", mdat_payload)
    mdat_start = len(ftyp) + 8
    # chunk 1 = samples 0-2, chunk 2 = samples 3-4
    chunk1_off = mdat_start
    chunk2_off = mdat_start + sum(len(s) for s in samples[:3])
    mdhd = u32s(0, 0, 0, 600, 125, 0)
    hdlr = u32s(0, 0) + b"vide" + bytes(12)
    stsd = u32s(0, 1) + box("fake", bytes(70))
    stts = u32s(0, 1, 5, 25)
    stsc = u32s(0, 2, 1, 3, 1, 2, 2, 1)
    stsz = u32s(0, 0, 5, *[len(s) for s in samples])
    stco = u32s(0, 2, chunk1_off, chunk2_off)
    stss = u32s(0, 2, 1, 4)
    stbl = box("stbl", box("stsd", stsd) + box("stts", stts) +
               box("stsc", stsc) + box("stsz", stsz) + box("stco", stco) +
               box("stss", stss))
    mdia = box("mdia", box("mdhd", mdhd) + box("hdlr", hdlr) +
               box("minf", stbl))
    moov = box("moov", box("trak", mdia))
    with open(OUT, "wb") as fh:
        fh.write(ftyp + mdat + moov)
    print(f"wrote {OUT}: {len(ftyp + mdat + moov)} bytes, "
          f"chunks at {chunk1_off}/{chunk2_off}")


if __name__ == "__main__":
    main()
