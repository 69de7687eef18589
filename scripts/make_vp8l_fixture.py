#!/usr/bin/env python3
"""Independent VP8L (WebP lossless) encoder for decoder fixtures —
pure-python bit packing straight from the spec, cross-validating the
JVM decoder (graft.operators.Vp8l). Emits one .webp per feature axis
plus a .argb sidecar (text: "w h" then one 8-hex-digit ARGB per pixel,
row-major) holding the EXPECTED decode, so the Scala spec compares
bytes-to-pixels without re-deriving any formula:

  vp8l_lit.webp       literals only, normal prefix codes, alpha 255
  vp8l_backref.webp   LZ77 copies: mapped plane codes 1 and 2 + a
                      direct distance (code > 120)
  vp8l_cache.webp     color cache (4 bits) hits between literals
  vp8l_subgreen.webp  SUBTRACT_GREEN transform
  vp8l_pred.webp      PREDICTOR transform, modes 1-12 across blocks
  vp8l_palette.webp   COLOR_INDEXING, 3 colors, 2-bit packed indices
  vp8l_meta.webp      meta prefix codes: 2 groups split by block
"""
import heapq
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")

CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


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

    def write_code(self, code, length):  # prefix codes go MSB-first
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)


def huffman_lengths(freqs):
    """Code lengths from a {symbol: freq} dict with >= 2 used symbols."""
    heap = sorted([(f, [s]) for s, f in freqs.items() if f > 0])
    lengths = {g[0]: 0 for _, g in heap}
    heapq.heapify(heap)
    while len(heap) > 1:
        fa, ga = heapq.heappop(heap)
        fb, gb = heapq.heappop(heap)
        for s in ga + gb:
            lengths[s] += 1
        heapq.heappush(heap, (fa + fb, sorted(ga + gb)))
    return lengths


def canonical(lengths):
    """{symbol: (code, len)}: canonical by (length, symbol)."""
    maxlen = max(lengths.values())
    count = [0] * (maxlen + 1)
    for l in lengths.values():
        count[l] += 1
    next_code = [0] * (maxlen + 1)
    code = 0
    for l in range(1, maxlen + 1):
        code = (code + count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for s in sorted(lengths):
        l = lengths[s]
        out[s] = (next_code[l], l)
        next_code[l] += 1
    return out


def write_prefix_code(bw, freqs, alphabet_size):
    """Serialize one prefix code; returns {symbol: (code, len)}."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if len(used) == 1 and used[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        bw.write(1, 1)  # 8-bit symbol field
        bw.write(used[0], 8)
        return {used[0]: (0, 0)}  # zero-bit code
    if len(used) == 2 and used[1] < 256:
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        bw.write(1, 1)  # 8-bit first symbol
        bw.write(used[0], 8)
        bw.write(used[1], 8)
        # canonical over two length-1 codes: smaller symbol gets 0
        return {used[0]: (0, 1), used[1]: (1, 1)}
    bw.write(0, 1)  # normal (code-length-coded)
    lengths = huffman_lengths(freqs)
    # the length array up to the last used symbol; the decoder leaves
    # everything after the serialized prefix as zero
    full = [lengths.get(s, 0) for s in range(max(used) + 1)]
    cl_syms = []  # (cl symbol, extra value, extra bits)
    i = 0
    while i < len(full):
        if full[i] == 0:
            run = 1
            while i + run < len(full) and full[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                n = min(left, 138)
                cl_syms.append((18, n - 11, 7))
                left -= n
            while left >= 3:
                n = min(left, 10)
                cl_syms.append((17, n - 3, 3))
                left -= n
            for _ in range(left):
                cl_syms.append((0, 0, 0))
            i += run
        else:
            cl_syms.append((full[i], 0, 0))
            i += 1
    while len(cl_syms) < 2:  # cutoff field needs >= 2 symbols read
        cl_syms.append((0, 0, 0))
    cl_freqs = {}
    for s, _, _ in cl_syms:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    if len(cl_freqs) == 1:
        # pad with an unused symbol so the CL code itself is 2-symbol
        cl_freqs[15 if 15 not in cl_freqs else 14] = 1
    cl_lengths = huffman_lengths(cl_freqs)
    assert max(cl_lengths.values()) <= 7, "cl lengths must fit 3 bits"
    bw.write(15, 4)  # num_code_lengths = 4 + 15 = 19
    for s in CL_ORDER:
        bw.write(cl_lengths.get(s, 0), 3)
    # max-symbol cutoff: the serialized lengths stop at the last used
    # symbol, so the decoder must be told how many CL symbols to read
    bw.write(1, 1)
    k = 0
    while (len(cl_syms) - 2) >= (1 << (2 + 2 * k)):
        k += 1
    bw.write(k, 3)
    bw.write(len(cl_syms) - 2, 2 + 2 * k)
    cl_codes = canonical(cl_lengths)
    for s, extra, ebits in cl_syms:
        c, l = cl_codes[s]
        bw.write_code(c, l)
        if ebits:
            bw.write(extra, ebits)
    return canonical(lengths)


def length_to_code(v):
    """Inverse LZ77 prefix coding: value -> (code, extra, extra_bits)."""
    if v <= 4:
        return v - 1, 0, 0
    code = 4
    while True:
        ebits = (code - 2) >> 1
        lo = ((2 + (code & 1)) << ebits) + 1
        if lo <= v <= lo + (1 << ebits) - 1:
            return code, v - lo, ebits
        code += 1


def cache_index(argb, bits):
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def token_freqs(tokens, cache_bits):
    freqs = [{} for _ in range(5)]

    def bump(c, s):
        freqs[c][s] = freqs[c].get(s, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            argb = t[1]
            bump(0, (argb >> 8) & 0xFF)
            bump(1, (argb >> 16) & 0xFF)
            bump(2, argb & 0xFF)
            bump(3, (argb >> 24) & 0xFF)
        elif t[0] == "copy":
            bump(0, 256 + length_to_code(t[1])[0])
            bump(4, length_to_code(t[2])[0])
        else:
            bump(0, 280 + cache_index(t[1], cache_bits))
    return freqs


def write_codes(bw, freqs, cache_bits):
    codes = []
    for c in range(5):
        size = (256 + 24 + ((1 << cache_bits) if cache_bits else 0)
                ) if c == 0 else (40 if c == 4 else 256)
        f = freqs[c] if freqs[c] else {0: 1}  # unused code: 1-symbol dummy
        codes.append(write_prefix_code(bw, f, size))
    return codes


def write_tokens(bw, tokens, codes, cache_bits):
    for t in tokens:
        if t[0] == "lit":
            argb = t[1]
            for c, s in ((0, (argb >> 8) & 0xFF), (1, (argb >> 16) & 0xFF),
                         (2, argb & 0xFF), (3, (argb >> 24) & 0xFF)):
                code, ln = codes[c][s]
                bw.write_code(code, ln)
        elif t[0] == "copy":
            _, length, plane = t
            lcode, lex, lebits = length_to_code(length)
            code, ln = codes[0][256 + lcode]
            bw.write_code(code, ln)
            if lebits:
                bw.write(lex, lebits)
            dcode, dex, debits = length_to_code(plane)
            code, ln = codes[4][dcode]
            bw.write_code(code, ln)
            if debits:
                bw.write(dex, debits)
        else:
            code, ln = codes[0][280 + cache_index(t[1], cache_bits)]
            bw.write_code(code, ln)


def write_entropy_image(bw, tokens, cache_bits=0, toplevel=False):
    """Single-group entropy-coded image: cache bit, (top level only)
    meta bit = 0, the five prefix codes, the token stream."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if toplevel:
        bw.write(0, 1)  # no meta prefix partition
    codes = write_codes(bw, token_freqs(tokens, cache_bits), cache_bits)
    write_tokens(bw, tokens, codes, cache_bits)


def header(bw, w, h, alpha=False):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if alpha else 0, 1)
    bw.write(0, 3)


def wrap_webp(payload):
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def emit(name, bw, w, h, pixels):
    with open(os.path.join(OUT, name + ".webp"), "wb") as f:
        f.write(wrap_webp(bytes(bw.bytes)))
    with open(os.path.join(OUT, name + ".argb"), "w") as f:
        f.write("%d %d\n" % (w, h))
        for p in pixels:
            f.write("%08x\n" % (p & 0xFFFFFFFF))


def rgb(r, g, b, a=0xFF):
    return (a << 24) | (r << 16) | (g << 8) | b


def fixture_literals():
    w, h = 11, 5
    pix = [rgb((3 * x + y) * 7 % 256, (5 * y + x) * 9 % 256,
               (x * y + 13) * 8 % 256) for y in range(h) for x in range(w)]
    bw = BitWriter()
    header(bw, w, h)
    bw.write(0, 1)  # no transforms
    write_entropy_image(bw, [("lit", p) for p in pix], toplevel=True)
    emit("vp8l_lit", bw, w, h, pix)


def fixture_backref():
    w, h = 8, 6
    row0 = [rgb(10 * x, 255 - 20 * x, 40 + x) for x in range(w)]
    pix = row0 * 3                       # rows 1-2 copy row 0
    row3 = [rgb(200, 30, 60)] * w        # one literal + dist-1 run
    pix = pix + row3
    pix = pix + pix[2 * w:4 * w]         # rows 4-5 copy rows 2-3
    tokens = [("lit", p) for p in row0]
    tokens.append(("copy", 2 * w, 1))            # mapped (0,1): dist w
    tokens.append(("lit", rgb(200, 30, 60)))
    tokens.append(("copy", w - 1, 2))            # mapped (1,0): dist 1
    tokens.append(("copy", 2 * w, 2 * w + 120))  # direct distance 2w
    bw = BitWriter()
    header(bw, w, h)
    bw.write(0, 1)
    write_entropy_image(bw, tokens, toplevel=True)
    emit("vp8l_backref", bw, w, h, pix)


def fixture_cache():
    w, h = 9, 4
    bits = 4
    a, b, c = rgb(17, 34, 51), rgb(204, 170, 136), rgb(68, 136, 17)
    seq = ([a, b, c] + [a, c, b] * ((w * h) // 3))[: w * h]
    tokens = []
    cache = {}
    for p in seq:
        idx = cache_index(p, bits)
        if cache.get(idx) == p:
            tokens.append(("cache", p))
        else:
            tokens.append(("lit", p))
            cache[idx] = p
    assert any(t[0] == "cache" for t in tokens)
    bw = BitWriter()
    header(bw, w, h)
    bw.write(0, 1)
    write_entropy_image(bw, tokens, cache_bits=bits, toplevel=True)
    emit("vp8l_cache", bw, w, h, seq)


def sub_pixels(a, b):
    return ((((a >> 24) - (b >> 24)) & 0xFF) << 24) | \
        (((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16) | \
        (((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8) | \
        (((a & 0xFF) - (b & 0xFF)) & 0xFF)


def fixture_subgreen():
    w, h = 7, 5
    pix = [rgb((60 + 10 * x + y) % 256, (30 * y + 5 * x) % 256,
               (220 - 9 * x * y) % 256) for y in range(h) for x in range(w)]
    coded = []
    for p in pix:
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) - g) % 256
        b = ((p & 0xFF) - g) % 256
        coded.append((p & 0xFF00FF00) | (r << 16) | b)
    bw = BitWriter()
    header(bw, w, h)
    bw.write(1, 1)  # a transform follows
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    write_entropy_image(bw, [("lit", p) for p in coded], toplevel=True)
    emit("vp8l_subgreen", bw, w, h, pix)


def avg2(a, b):
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def clip255(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def predict(mode, l, t, tl, tr):
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return avg2(avg2(l, tr), t)
    if mode == 6:
        return avg2(l, tl)
    if mode == 7:
        return avg2(l, t)
    if mode == 8:
        return avg2(tl, t)
    if mode == 9:
        return avg2(t, tr)
    if mode == 10:
        return avg2(avg2(l, tl), avg2(t, tr))
    if mode == 11:
        def sub3(x, y, z):
            return abs(y - z) - abs(x - z)
        p = sum(sub3((t >> s) & 0xFF, (l >> s) & 0xFF, (tl >> s) & 0xFF)
                for s in (24, 16, 8, 0))
        return t if p <= 0 else l
    if mode == 12:
        return sum(clip255(((l >> s) & 0xFF) + ((t >> s) & 0xFF)
                           - ((tl >> s) & 0xFF)) << s
                   for s in (24, 16, 8, 0))
    ave = avg2(l, t)  # mode 13

    def ch(s):
        v = (ave >> s) & 0xFF
        d = v - ((tl >> s) & 0xFF)
        half = -((-d) // 2) if d < 0 else d // 2  # trunc toward zero
        return clip255(v + half)
    return sum(ch(s) << s for s in (24, 16, 8, 0))


def fixture_predictor():
    w, h = 16, 12
    size_bits = 2  # 4x4 blocks -> 4x3 = 12 blocks, modes 1-12
    modes = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
    pix = [rgb((x * 23 + y * 11) % 256, (x * 7 + y * 31) % 256,
               (x * 13 + y * 3 + 97) % 256) for y in range(h)
           for x in range(w)]
    mw = (w + 3) >> 2
    residuals = []
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[pos - 1]
            elif x == 0:
                pred = pix[pos - w]
            else:
                mode = modes[(y >> size_bits) * mw + (x >> size_bits)]
                pred = predict(mode, pix[pos - 1], pix[pos - w],
                               pix[pos - w - 1], pix[pos - w + 1])
            residuals.append(sub_pixels(pix[pos], pred))
    bw = BitWriter()
    header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(size_bits - 2, 3)
    write_entropy_image(bw, [("lit", 0xFF000000 | (m << 8)) for m in modes])
    bw.write(0, 1)  # no more transforms
    write_entropy_image(bw, [("lit", p) for p in residuals], toplevel=True)
    emit("vp8l_pred", bw, w, h, pix)


def fixture_bad_predictor():
    """A spec-INVALID predictor mode (14) in one block: the decoder
    must reject the whole decode (None) — half-transformed residuals
    reported as pixels would silently feed dHash signatures."""
    w, h = 16, 12
    size_bits = 2
    modes = [1, 2, 3, 14, 5, 6, 7, 8, 9, 10, 11, 12]  # block 3 invalid
    pix = [rgb((x * 23 + y * 11) % 256, (x * 7 + y * 31) % 256,
               (x * 13 + y * 3 + 97) % 256) for y in range(h)
           for x in range(w)]
    mw = (w + 3) >> 2
    residuals = []
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[pos - 1]
            elif x == 0:
                pred = pix[pos - w]
            else:
                mode = modes[(y >> size_bits) * mw + (x >> size_bits)]
                # mode 14 has no spec meaning; encode vs mode-1 so the
                # stream is structurally valid right up to the walk
                mode = 1 if mode > 13 else mode
                pred = predict(mode, pix[pos - 1], pix[pos - w],
                               pix[pos - w - 1], pix[pos - w + 1])
            residuals.append(sub_pixels(pix[pos], pred))
    bw = BitWriter()
    header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(size_bits - 2, 3)
    write_entropy_image(bw, [("lit", 0xFF000000 | (m << 8)) for m in modes])
    bw.write(0, 1)  # no more transforms
    write_entropy_image(bw, [("lit", p) for p in residuals], toplevel=True)
    with open(os.path.join(OUT, "vp8l_badpred.webp"), "wb") as f:
        f.write(wrap_webp(bytes(bw.bytes)))  # no .argb: decode must be None


def fixture_palette():
    w, h = 13, 4
    palette = [rgb(250, 10, 10), rgb(10, 250, 10), rgb(10, 10, 250)]
    idx = [(x + 2 * y) % 3 for y in range(h) for x in range(w)]
    pix = [palette[i] for i in idx]
    packed_w = (w + 3) >> 2  # 3 colors -> 2-bit indices, 4 per pixel
    packed = []
    for y in range(h):
        for px in range(packed_w):
            v = 0
            for k in range(4):
                x = px * 4 + k
                if x < w:
                    v |= idx[y * w + x] << (2 * k)
            packed.append(0xFF000000 | (v << 8))
    deltas = [palette[0]] + [sub_pixels(palette[i], palette[i - 1])
                             for i in range(1, len(palette))]
    bw = BitWriter()
    header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(len(palette) - 1, 8)
    write_entropy_image(bw, [("lit", p) for p in deltas])
    bw.write(0, 1)  # no more transforms
    write_entropy_image(bw, [("lit", p) for p in packed], toplevel=True)
    emit("vp8l_palette", bw, w, h, pix)


def fixture_meta():
    w, h = 8, 4
    bits = 2  # 4x4 blocks -> meta image 2x1, group per x-half
    pix = [rgb(40 + x, 80, 120 + y) if x < 4 else rgb(200 - x, 160, 30 + y)
           for y in range(h) for x in range(w)]
    bw = BitWriter()
    header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix partition present
    bw.write(bits - 2, 3)
    write_entropy_image(bw, [("lit", 0xFF000000 | (0 << 8)),
                             ("lit", 0xFF000000 | (1 << 8))])
    # two groups: codes for group 0 then group 1, tokens routed by x
    halves = [[("lit", pix[y * w + x]) for y in range(h) for x in range(w)
               if (x < 4) == (g == 0)] for g in range(2)]
    freqs = [token_freqs(halves[g], 0) for g in range(2)]
    codes = [write_codes(bw, freqs[g], 0) for g in range(2)]
    for y in range(h):
        for x in range(w):
            g = 0 if x < 4 else 1
            write_tokens(bw, [("lit", pix[y * w + x])], codes[g], 0)
    emit("vp8l_meta", bw, w, h, pix)


def main():
    os.makedirs(OUT, exist_ok=True)
    fixture_literals()
    fixture_backref()
    fixture_cache()
    fixture_subgreen()
    fixture_predictor()
    fixture_bad_predictor()
    fixture_palette()
    fixture_meta()
    print("wrote 8 vp8l fixtures to", OUT)


if __name__ == "__main__":
    main()
