#!/usr/bin/env python3
"""Second-implementation H.264 CAVLC-intra fixtures.

graft.multimodal.{H264,H264Intra,H264Cavlc} (Scala) and this script are
separate implementations of the same public spec subset (ITU-T H.264:
CAVLC residual coding 9.2, intra prediction 8.3, inverse transforms and
dequantization 8.5, I-slice macroblock layer 7.3.5). This script both
ENCODES fixture pictures (deterministic, formula-stated prediction
modes and residual coefficients) and RECONSTRUCTS the expected YUV
planes with its own prediction/transform arithmetic, so the Scala
decoder is held to independently-computed pixels and the Scala encoder
to independently-computed bytes. (The VLC table constants are spec
constants shared by both sides; the cross-check therefore validates
the surrounding arithmetic and bit-serialization, while the Scala
H264CavlcSpec validates the tables structurally: prefix-freeness and
Kraft completeness.)

Output: src/test/resources/h264_cavlc_fixtures.txt, one line per
fixture: `name mbW mbH qp nal_hex y_hex cb_hex cr_hex`.
Regenerate with: python3 scripts/h264_cavlc_fixture_gen.py
"""
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / \
    "src/test/resources/h264_cavlc_fixtures.txt"


class BitWriter:
    def __init__(self):
        self.bytes_ = bytearray()
        self.cur = 0
        self.nbits = 0

    def bit(self, b):
        self.cur = (self.cur << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == 8:
            self.bytes_.append(self.cur)
            self.cur = 0
            self.nbits = 0

    def u(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def ue(self, v):
        cw = v + 1
        ln = cw.bit_length()
        self.u(0, ln - 1)
        self.u(cw, ln)

    def se(self, v):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def code(self, s):
        for ch in s:
            self.bit(1 if ch == "1" else 0)

    def trailing(self):
        self.bit(1)
        while self.nbits != 0:
            self.bit(0)

    def rbsp(self):
        assert self.nbits == 0
        return bytes(self.bytes_)


def ebsp(rbsp):
    out = bytearray()
    zeros = 0
    for v in rbsp:
        if zeros >= 2 and v <= 3:
            out.append(3)
            zeros = 0
        out.append(v)
        zeros = zeros + 1 if v == 0 else 0
    return bytes(out)


def nal(nal_type, rbsp):
    return bytes([0x60 | nal_type]) + ebsp(rbsp)


# ---- CAVLC tables (ITU-T H.264 Table 9-5 .. 9-10) -----------------------

CT_N0 = [
    ["1"], ["000101", "01"], ["00000111", "000100", "001"],
    ["000000111", "00000110", "0000101", "00011"],
    ["0000000111", "000000110", "00000101", "000011"],
    ["00000000111", "0000000110", "000000101", "0000100"],
    ["0000000001111", "00000000110", "0000000101", "00000100"],
    ["0000000001011", "0000000001110", "00000000101", "000000100"],
    ["0000000001000", "0000000001010", "0000000001101", "0000000100"],
    ["00000000001111", "00000000001110", "0000000001001", "00000000100"],
    ["00000000001011", "00000000001010", "00000000001101", "0000000001100"],
    ["000000000001111", "000000000001110", "00000000001001", "00000000001100"],
    ["000000000001011", "000000000001010", "000000000001101", "00000000001000"],
    ["0000000000001111", "000000000000001", "000000000001001", "000000000001100"],
    ["0000000000001011", "0000000000001110", "0000000000001101", "000000000001000"],
    ["0000000000000111", "0000000000001010", "0000000000001001", "0000000000001100"],
    ["0000000000000100", "0000000000000110", "0000000000000101", "0000000000001000"],
]
CT_N2 = [
    ["11"], ["001011", "10"], ["000111", "00111", "011"],
    ["0000111", "001010", "001001", "0101"],
    ["00000111", "000110", "000101", "0100"],
    ["00000100", "0000110", "0000101", "00110"],
    ["000000111", "00000110", "00000101", "001000"],
    ["00000001111", "000000110", "000000101", "000100"],
    ["00000001011", "00000001110", "00000001101", "0000100"],
    ["000000001111", "00000001010", "00000001001", "000000100"],
    ["000000001011", "000000001110", "000000001101", "00000001100"],
    ["000000001000", "000000001010", "000000001001", "00000001000"],
    ["0000000001111", "0000000001110", "0000000001101", "000000001100"],
    ["0000000001011", "0000000001010", "0000000001001", "0000000001100"],
    ["0000000000111", "00000000001011", "0000000000110", "0000000001000"],
    ["00000000001001", "00000000001000", "00000000001010", "0000000000001"],
    ["00000000000111", "00000000000110", "00000000000101", "00000000000100"],
]
# 4 <= nC < 8 column of Table 9-5, as (bitlength, value) pairs —
# deliberately a different representation from the Scala bit-string
# table (H264Cavlc.CoeffTokenN4) so a transcription slip on either side
# breaks the byte-level cross-check instead of cancelling out.
CT_N4_LV = [
    [(4, 15)],
    [(6, 15), (4, 14)],
    [(6, 11), (5, 15), (4, 13)],
    [(6, 8), (5, 12), (5, 14), (4, 12)],
    [(7, 15), (5, 10), (5, 11), (4, 11)],
    [(7, 11), (5, 8), (5, 9), (4, 10)],
    [(7, 9), (6, 14), (6, 13), (4, 9)],
    [(7, 8), (6, 10), (6, 9), (4, 8)],
    [(8, 15), (7, 14), (7, 13), (5, 13)],
    [(8, 11), (8, 14), (7, 10), (6, 12)],
    [(9, 15), (8, 10), (8, 13), (7, 12)],
    [(9, 11), (9, 14), (8, 9), (8, 12)],
    [(9, 8), (9, 10), (9, 13), (8, 8)],
    [(10, 13), (9, 7), (9, 9), (9, 12)],
    [(10, 9), (10, 12), (10, 11), (10, 10)],
    [(10, 5), (10, 8), (10, 7), (10, 6)],
    [(10, 1), (10, 4), (10, 3), (10, 2)],
]
CT_CDC = [
    ["01"], ["000111", "1"], ["000100", "000110", "001"],
    ["000011", "0000011", "0000010", "000101"],
    ["000010", "00000011", "00000010", "0000000"],
]
TZ = [
    ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
     "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
     "000000010", "000000001"],
    ["111", "110", "101", "100", "011", "0101", "0100", "0011",
     "0010", "00011", "00010", "000011", "000010", "000001", "000000"],
    ["0101", "111", "110", "101", "0100", "0011", "100", "011",
     "0010", "00011", "00010", "000001", "00001", "000000"],
    ["00011", "111", "0101", "0100", "110", "101", "100", "0011",
     "011", "0010", "00010", "00001", "00000"],
    ["0101", "0100", "0011", "111", "110", "101", "100", "011",
     "0010", "00001", "0001", "00000"],
    ["000001", "00001", "111", "110", "101", "100", "011", "010",
     "0001", "001", "000000"],
    ["000001", "00001", "101", "100", "011", "11", "010", "0001",
     "001", "000000"],
    ["000001", "0001", "00001", "011", "11", "10", "010", "001",
     "000000"],
    ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    ["00001", "00000", "001", "11", "10", "01", "0001"],
    ["0000", "0001", "001", "010", "1", "011"],
    ["0000", "0001", "01", "1", "001"],
    ["000", "001", "1", "01"],
    ["00", "01", "1"],
    ["0", "1"],
]
TZ_CDC = [["1", "01", "001", "000"], ["1", "01", "00"], ["1", "0"]]
RB = [
    ["1", "0"], ["1", "01", "00"], ["11", "10", "01", "00"],
    ["11", "10", "01", "001", "000"],
    ["11", "10", "011", "010", "001", "000"],
    ["11", "000", "001", "011", "010", "101", "100"],
    ["111", "110", "101", "100", "011", "010", "001"],
]

ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
BLK_POS = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
           (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3)]
CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
             16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
             8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41]
DEQUANT_V = [(10, 13, 16), (11, 14, 18), (13, 16, 20),
             (14, 18, 23), (16, 20, 25), (18, 23, 29)]
CHROMA_QP = [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
             38, 38, 38, 39, 39, 39, 39]


def chroma_qp(qp):
    return qp if qp < 30 else CHROMA_QP[qp - 30]


def v_class(raster):
    i, j = raster >> 2, raster & 3
    if i % 2 == 0 and j % 2 == 0:
        return 0
    if i % 2 == 1 and j % 2 == 1:
        return 2
    return 1


# ---- CAVLC residual encode ---------------------------------------------

NC_SEEN = set()  # coeff_token contexts exercised, asserted at the end


def encode_residual(w, levels, nC):
    """levels: scan-order ints (len 4, 15 or 16). Returns TotalCoeff."""
    NC_SEEN.add(nC)
    nz = [(v, p) for p, v in enumerate(levels) if v != 0]
    nz.reverse()  # highest frequency first
    tc = len(nz)
    t1 = 0
    while t1 < min(3, tc) and abs(nz[t1][0]) == 1:
        t1 += 1
    if nC == -1:
        w.code(CT_CDC[tc][t1])
    elif nC < 2:
        w.code(CT_N0[tc][t1])
    elif nC < 4:
        w.code(CT_N2[tc][t1])
    elif nC < 8:
        ln, val = CT_N4_LV[tc][t1]
        w.u(val, ln)
    else:  # nC >= 8: the 6-bit FLC
        w.u(3 if tc == 0 else (tc - 1) * 4 + t1, 6)
    if tc == 0:
        return 0
    for i in range(t1):
        w.bit(1 if nz[i][0] < 0 else 0)
    suffix_len = 1 if tc > 10 and t1 < 3 else 0
    for i in range(t1, tc):
        level = nz[i][0]
        lc = 2 * level - 2 if level > 0 else -2 * level - 1
        if i == t1 and t1 < 3:
            lc -= 2
        if lc < (14 if suffix_len == 0 else 15 << suffix_len):
            w.u(0, lc >> suffix_len)
            w.bit(1)
            if suffix_len > 0:
                w.u(lc & ((1 << suffix_len) - 1), suffix_len)
        elif suffix_len == 0 and lc < 30:
            w.u(0, 14)
            w.bit(1)
            w.u(lc - 14, 4)
        else:
            adj = lc - 15 if suffix_len == 0 else lc
            rem = adj - (15 << suffix_len)
            p = 15
            while p < 28 and rem - ((1 << (p - 3)) - 4096 if p >= 16 else 0) \
                    >= (1 << (p - 3)):
                p += 1
            w.u(0, p)
            w.bit(1)
            w.u(rem - ((1 << (p - 3)) - 4096 if p >= 16 else 0), p - 3)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    highest = nz[0][1]
    total_zeros = highest + 1 - tc
    if tc < len(levels):
        if len(levels) == 4:
            w.code(TZ_CDC[tc - 1][total_zeros])
        else:
            w.code(TZ[tc - 1][total_zeros])
    zeros_left = total_zeros
    for i in range(tc - 1):
        if zeros_left <= 0:
            break
        run = nz[i][1] - nz[i + 1][1] - 1
        zl = min(zeros_left, 7)
        if zl < 7:
            w.code(RB[zl - 1][run])
        elif run < 7:
            w.code(RB[6][run])
        else:
            w.u(0, run - 4)
            w.bit(1)
        zeros_left -= run
    return tc


# ---- transforms / reconstruction ---------------------------------------

def clip(v):
    return max(0, min(255, v))


def dequant4x4(levels, qp, skip_dc, dc_override):
    d = [0] * 16
    m, shift = qp % 6, qp // 6
    for s in range(16):
        raster = ZIGZAG[s]
        c = levels[s]
        if c != 0 and not (skip_dc and s == 0):
            ls = DEQUANT_V[m][v_class(raster)] * 16
            if qp >= 24:
                d[raster] = (c * ls) << (shift - 4)
            else:
                d[raster] = (c * ls + (1 << (3 - shift))) >> (4 - shift)
    if skip_dc:
        d[0] = dc_override
    return d


def itransform(d):
    e = [0] * 16
    for i in range(4):
        d0, d1, d2, d3 = d[i * 4:i * 4 + 4]
        a0, a1 = d0 + d2, d0 - d2
        a2, a3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        e[i * 4:i * 4 + 4] = [a0 + a3, a1 + a2, a1 - a2, a0 - a3]
    r = [0] * 16
    for j in range(4):
        d0, d1, d2, d3 = e[j], e[4 + j], e[8 + j], e[12 + j]
        a0, a1 = d0 + d2, d0 - d2
        a2, a3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        vals = [a0 + a3, a1 + a2, a1 - a2, a0 - a3]
        for k in range(4):
            r[k * 4 + j] = (vals[k] + 32) >> 6
    return r


def luma_dc_transform(zz, qp):
    f = [0] * 16
    for s in range(16):
        f[ZIGZAG[s]] = zz[s]
    g = [0] * 16
    for i in range(4):
        a, b = f[i * 4] + f[i * 4 + 2], f[i * 4] - f[i * 4 + 2]
        c, d = f[i * 4 + 1] + f[i * 4 + 3], f[i * 4 + 1] - f[i * 4 + 3]
        g[i * 4:i * 4 + 4] = [a + c, b + d, b - d, a - c]
    h = [0] * 16
    for j in range(4):
        a, b = g[j] + g[8 + j], g[j] - g[8 + j]
        c, d = g[4 + j] + g[12 + j], g[4 + j] - g[12 + j]
        h[j], h[4 + j], h[8 + j], h[12 + j] = a + c, b + d, b - d, a - c
    ls = DEQUANT_V[qp % 6][0] * 16
    out = []
    for v in h:
        if qp >= 36:
            out.append((v * ls) << (qp // 6 - 6))
        else:
            out.append((v * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6))
    return out


def chroma_dc_transform(c, qpc):
    f = [c[0] + c[1] + c[2] + c[3], c[0] - c[1] + c[2] - c[3],
         c[0] + c[1] - c[2] - c[3], c[0] - c[1] - c[2] + c[3]]
    ls = DEQUANT_V[qpc % 6][0] * 16
    return [((v * ls) << (qpc // 6)) >> 5 for v in f]


# ---- intra prediction ---------------------------------------------------

MODE_NEEDS = {0: {"up"}, 1: {"left"}, 2: set(), 3: {"up"},
              4: {"up", "left", "upleft"}, 5: {"up", "left", "upleft"},
              6: {"up", "left", "upleft"}, 7: {"up"}, 8: {"left"}}


def predict4x4(get, x0, y0, mode, avail, pred):
    aL, aU, aUL, aUR = (avail["left"], avail["up"], avail["upleft"],
                        avail["upright"])
    left = [get(x0 - 1, y0 + i) for i in range(4)] if aL else [0] * 4
    up = [0] * 8
    if aU:
        for i in range(4):
            up[i] = get(x0 + i, y0 - 1)
        if aUR:
            for j in range(4, 8):
                up[j] = get(x0 + j, y0 - 1)
        else:
            for j in range(4, 8):
                up[j] = up[3]
    ul = get(x0 - 1, y0 - 1) if aUL else 0

    def px(k):
        return ul if k < 0 else up[k]

    def pl(k):
        return ul if k < 0 else left[k]

    def st(i, j, v):
        pred[j * 4 + i] = v
    if mode == 0:
        for j in range(4):
            for i in range(4):
                st(i, j, up[i])
    elif mode == 1:
        for j in range(4):
            for i in range(4):
                st(i, j, left[j])
    elif mode == 2:
        if aL and aU:
            dc = (sum(left) + sum(up[:4]) + 4) >> 3
        elif aL:
            dc = (sum(left) + 2) >> 2
        elif aU:
            dc = (sum(up[:4]) + 2) >> 2
        else:
            dc = 128
        for j in range(4):
            for i in range(4):
                st(i, j, dc)
    elif mode == 3:
        for j in range(4):
            for i in range(4):
                if i == 3 and j == 3:
                    st(i, j, (up[6] + 3 * up[7] + 2) >> 2)
                else:
                    st(i, j, (up[i + j] + 2 * up[i + j + 1] + up[i + j + 2] + 2) >> 2)
    elif mode == 4:
        for j in range(4):
            for i in range(4):
                if i > j:
                    st(i, j, (px(i - j - 2) + 2 * px(i - j - 1) + px(i - j) + 2) >> 2)
                elif i < j:
                    st(i, j, (pl(j - i - 2) + 2 * pl(j - i - 1) + pl(j - i) + 2) >> 2)
                else:
                    st(i, j, (up[0] + 2 * ul + left[0] + 2) >> 2)
    elif mode == 5:
        for j in range(4):
            for i in range(4):
                z = 2 * i - j
                if z >= 0 and z % 2 == 0:
                    k = i - (j >> 1)
                    st(i, j, (px(k - 1) + px(k) + 1) >> 1)
                elif z >= 0:
                    k = i - (j >> 1)
                    st(i, j, (px(k - 2) + 2 * px(k - 1) + px(k) + 2) >> 2)
                elif z == -1:
                    st(i, j, (left[0] + 2 * ul + up[0] + 2) >> 2)
                else:
                    st(i, j, (pl(j - 1) + 2 * pl(j - 2) + pl(j - 3) + 2) >> 2)
    elif mode == 6:
        for j in range(4):
            for i in range(4):
                z = 2 * j - i
                if z >= 0 and z % 2 == 0:
                    k = j - (i >> 1)
                    st(i, j, (pl(k - 1) + pl(k) + 1) >> 1)
                elif z >= 0:
                    k = j - (i >> 1)
                    st(i, j, (pl(k - 2) + 2 * pl(k - 1) + pl(k) + 2) >> 2)
                elif z == -1:
                    st(i, j, (left[0] + 2 * ul + up[0] + 2) >> 2)
                else:
                    st(i, j, (px(i - 1) + 2 * px(i - 2) + px(i - 3) + 2) >> 2)
    elif mode == 7:
        for j in range(4):
            for i in range(4):
                k = i + (j >> 1)
                if j % 2 == 0:
                    st(i, j, (up[k] + up[k + 1] + 1) >> 1)
                else:
                    st(i, j, (up[k] + 2 * up[k + 1] + up[k + 2] + 2) >> 2)
    elif mode == 8:
        for j in range(4):
            for i in range(4):
                z = i + 2 * j
                if z % 2 == 0 and z < 6:
                    st(i, j, (left[j + (i >> 1)] + left[j + (i >> 1) + 1] + 1) >> 1)
                elif z % 2 == 1 and z < 5:
                    st(i, j, (left[j + (i >> 1)] + 2 * left[j + (i >> 1) + 1] +
                              left[j + (i >> 1) + 2] + 2) >> 2)
                elif z == 5:
                    st(i, j, (left[2] + 3 * left[3] + 2) >> 2)
                else:
                    st(i, j, left[3])
    else:
        raise ValueError(mode)


def predict16x16(get, x0, y0, mode, aL, aU, aUL, pred):
    left = [get(x0 - 1, y0 + i) for i in range(16)] if aL else [0] * 16
    up = [get(x0 + i, y0 - 1) for i in range(16)] if aU else [0] * 16
    if mode == 0:
        for j in range(16):
            for i in range(16):
                pred[j * 16 + i] = up[i]
    elif mode == 1:
        for j in range(16):
            for i in range(16):
                pred[j * 16 + i] = left[j]
    elif mode == 2:
        if aL and aU:
            dc = (sum(left) + sum(up) + 16) >> 5
        elif aL:
            dc = (sum(left) + 8) >> 4
        elif aU:
            dc = (sum(up) + 8) >> 4
        else:
            dc = 128
        for k in range(256):
            pred[k] = dc
    elif mode == 3:
        ul = get(x0 - 1, y0 - 1)
        hs = sum(i * (up[7 + i] - (up[7 - i] if 7 - i >= 0 else ul))
                 for i in range(1, 9))
        vs = sum(i * (left[7 + i] - (left[7 - i] if 7 - i >= 0 else ul))
                 for i in range(1, 9))
        b = (5 * hs + 32) >> 6
        c = (5 * vs + 32) >> 6
        a = 16 * (left[15] + up[15])
        for j in range(16):
            for i in range(16):
                pred[j * 16 + i] = clip((a + b * (i - 7) + c * (j - 7) + 16) >> 5)
    else:
        raise ValueError(mode)


def predict_chroma(get, x0, y0, mode, aL, aU, aUL, pred):
    left = [get(x0 - 1, y0 + i) for i in range(8)] if aL else [0] * 8
    up = [get(x0 + i, y0 - 1) for i in range(8)] if aU else [0] * 8
    if mode == 0:
        for sb in range(4):
            sx, sy = (sb & 1) * 4, (sb >> 1) * 4
            if sb == 0:
                if aU and aL:
                    dc = (sum(up[:4]) + sum(left[:4]) + 4) >> 3
                elif aU:
                    dc = (sum(up[:4]) + 2) >> 2
                elif aL:
                    dc = (sum(left[:4]) + 2) >> 2
                else:
                    dc = 128
            elif sb == 1:
                if aU:
                    dc = (sum(up[4:]) + 2) >> 2
                elif aL:
                    dc = (sum(left[:4]) + 2) >> 2
                else:
                    dc = 128
            elif sb == 2:
                if aL:
                    dc = (sum(left[4:]) + 2) >> 2
                elif aU:
                    dc = (sum(up[:4]) + 2) >> 2
                else:
                    dc = 128
            else:
                if aU and aL:
                    dc = (sum(up[4:]) + sum(left[4:]) + 4) >> 3
                elif aU:
                    dc = (sum(up[4:]) + 2) >> 2
                elif aL:
                    dc = (sum(left[4:]) + 2) >> 2
                else:
                    dc = 128
            for j in range(4):
                for i in range(4):
                    pred[(sy + j) * 8 + sx + i] = dc
    elif mode == 1:
        for j in range(8):
            for i in range(8):
                pred[j * 8 + i] = left[j]
    elif mode == 2:
        for j in range(8):
            for i in range(8):
                pred[j * 8 + i] = up[i]
    elif mode == 3:
        ul = get(x0 - 1, y0 - 1)
        hs = sum(i * (up[3 + i] - (up[3 - i] if 3 - i >= 0 else ul))
                 for i in range(1, 5))
        vs = sum(i * (left[3 + i] - (left[3 - i] if 3 - i >= 0 else ul))
                 for i in range(1, 5))
        b = (17 * hs + 16) >> 5
        c = (17 * vs + 16) >> 5
        a = 16 * (left[7] + up[7])
        for j in range(8):
            for i in range(8):
                pred[j * 8 + i] = clip((a + b * (i - 3) + c * (j - 3) + 16) >> 5)
    else:
        raise ValueError(mode)

# ---- SPS / PPS (same subset fields as the I_PCM generator) --------------

def sps_nal(width, height):
    w = BitWriter()
    w.u(66, 8)          # profile_idc baseline
    w.u(0, 8)
    w.u(10, 8)          # level
    w.ue(0)             # sps id
    w.ue(0)             # log2_max_frame_num_minus4
    w.ue(2)             # pic_order_cnt_type
    w.ue(0)             # max_num_ref_frames
    w.u(0, 1)
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)           # frame_mbs_only
    w.u(0, 1)           # direct_8x8
    crop_r = (mb_w * 16 - width) // 2
    crop_b = (mb_h * 16 - height) // 2
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)           # vui
    w.trailing()
    return nal(7, w.rbsp())


def pps_nal():
    w = BitWriter()
    w.ue(0); w.ue(0)
    w.u(0, 1); w.u(0, 1)
    w.ue(0); w.ue(0); w.ue(0)
    w.u(0, 1); w.u(0, 2)
    w.se(0); w.se(0); w.se(0)
    w.u(0, 1); w.u(0, 1); w.u(0, 1)
    w.trailing()
    return nal(8, w.rbsp())


# ---- picture state -------------------------------------------------------

class Pic:
    def __init__(self, mb_w, mb_h, qp):
        self.mb_w, self.mb_h, self.qp = mb_w, mb_h, qp
        self.w, self.h = mb_w * 16, mb_h * 16
        self.y = [0] * (self.w * self.h)
        self.cb = [0] * (self.w * self.h // 4)
        self.cr = [0] * (self.w * self.h // 4)
        self.luma_tc = [-1] * (mb_w * 4 * mb_h * 4)
        self.cb_tc = [-1] * (mb_w * 2 * mb_h * 2)
        self.cr_tc = [-1] * (mb_w * 2 * mb_h * 2)
        self.i4_mode = [-1] * (mb_w * 4 * mb_h * 4)

    def luma_tc_at(self, bx, by):
        if bx < 0 or by < 0 or bx >= self.mb_w * 4 or by >= self.mb_h * 4:
            return -1
        return self.luma_tc[by * self.mb_w * 4 + bx]

    def chroma_tc_at(self, arr, bx, by):
        if bx < 0 or by < 0 or bx >= self.mb_w * 2 or by >= self.mb_h * 2:
            return -1
        return arr[by * self.mb_w * 2 + bx]

    @staticmethod
    def nC(a, b):
        if a >= 0 and b >= 0:
            return (a + b + 1) >> 1
        return a if a >= 0 else (b if b >= 0 else 0)


IDX_OF = {pos: i for i, pos in enumerate(BLK_POS)}


def luma_block_avail(pic, mx, my, k, bx, by):
    if bx < 0 or by < 0 or bx >= pic.mb_w * 4 or by >= pic.mb_h * 4:
        return False
    nmx, nmy = bx // 4, by // 4
    if nmy < my or (nmy == my and nmx < mx):
        return True
    if nmx == mx and nmy == my:
        return IDX_OF[(bx % 4, by % 4)] < k
    return False


def legal_modes(pic, mx, my, k):
    bx0, by0 = mx * 4, my * 4
    x4, y4 = BLK_POS[k]
    avail = {
        "left": luma_block_avail(pic, mx, my, k, bx0 + x4 - 1, by0 + y4),
        "up": luma_block_avail(pic, mx, my, k, bx0 + x4, by0 + y4 - 1),
        "upleft": luma_block_avail(pic, mx, my, k, bx0 + x4 - 1, by0 + y4 - 1),
    }
    return [m for m in range(9) if all(
        avail.get(need, False) for need in MODE_NEEDS[m])], avail


# ---- the shared recipe formulas (restated in the Scala interop spec) ----

def i4_levels(k, m):
    lv = [0] * 16
    for p in range(16):
        if (p * 7 + k * 3 + m * 5) % 6 == 0:
            v = ((p + k + m) % 5) - 2
            if v == 0:
                v = 1
            if p == 0:
                v *= 3
            lv[p] = v
    return lv


def i4_mid_levels(k, m):
    # ~5-6 nonzeros per block: neighbor-averaged nC lands in 4 <= nC < 8
    lv = [0] * 16
    for p in range(16):
        if (p + k + m) % 3 == 0:
            v = ((p + 2 * k + m) % 7) - 3
            if v == 0:
                v = -2
            lv[p] = v
    return lv


def i4_dense_levels(k, m):
    # ~14 nonzeros per block: neighbor-averaged nC reaches the >= 8 FLC
    lv = [0] * 16
    for p in range(16):
        if (p + k + m) % 8 != 7:
            v = ((p * 3 + k + m) % 9) - 4
            if v == 0:
                v = 2
            lv[p] = v
    return lv


I4_FORMULAS = {"std": i4_levels, "mid": i4_mid_levels, "dense": i4_dense_levels}


def i16_dc_levels(m):
    lv = [0] * 16
    for p in range(16):
        if (p * 5 + m * 7) % 7 == 0:
            v = ((p + m) % 7) - 3
            if v == 0:
                v = 2
            lv[p] = v
    return lv


def i16_ac_levels(k, m):
    lv = [0] * 16
    for p in range(1, 16):
        if (p * 7 + k * 3 + m * 5) % 8 == 0:
            v = ((p + k + m) % 5) - 2
            if v == 0:
                v = 1
            lv[p] = v
    return lv


def chroma_dc_levels(c, m):
    lv = [0] * 4
    for p in range(4):
        if (p + c + m) % 2 == 0:
            v = ((p + c + m) % 3) - 1
            if v == 0:
                v = 1
            lv[p] = v
    return lv


def chroma_ac_levels(c, b, m):
    lv = [0] * 16
    for p in range(1, 16):
        if (p * 5 + b * 3 + c + m * 7) % 9 == 0:
            v = ((p + b + c + m) % 5) - 2
            if v == 0:
                v = -1
            lv[p] = v
    return lv


# ---- macroblock encode + reconstruct ------------------------------------

def do_chroma(w, pic, mx, my, m, cbp_chroma, chroma_mode, qpc):
    cg = pic.mb_w * 2
    cx0, cy0 = mx * 2, my * 2
    for plane, arr, comp in ((pic.cb, pic.cb_tc, 0), (pic.cr, pic.cr_tc, 1)):
        pass  # residual bits are interleaved Cb-DC, Cr-DC, Cb-AC, Cr-AC below
    dc_levels = [chroma_dc_levels(0, m) if cbp_chroma else [0] * 4,
                 chroma_dc_levels(1, m) if cbp_chroma else [0] * 4]
    ac_levels = [[chroma_ac_levels(c, b, m) if cbp_chroma == 2 else [0] * 16
                  for b in range(4)] for c in range(2)]
    if cbp_chroma:
        encode_residual(w, dc_levels[0], -1)
        encode_residual(w, dc_levels[1], -1)
    for c in range(2):
        arr = pic.cb_tc if c == 0 else pic.cr_tc
        for b in range(4):
            bx, by = cx0 + (b & 1), cy0 + (b >> 1)
            if cbp_chroma == 2:
                nc = Pic.nC(pic.chroma_tc_at(arr, bx - 1, by),
                            pic.chroma_tc_at(arr, bx, by - 1))
                tc = encode_residual(w, ac_levels[c][b][1:], nc)
                arr[by * cg + bx] = tc
            else:
                arr[by * cg + bx] = 0
    # reconstruction
    cw, chh = pic.w // 2, pic.h // 2
    for c in range(2):
        plane = pic.cb if c == 0 else pic.cr
        pred = [0] * 64

        def get(x, yy):
            return plane[yy * cw + x]
        predict_chroma(get, mx * 8, my * 8, chroma_mode,
                       mx > 0, my > 0, mx > 0 and my > 0, pred)
        dc = chroma_dc_transform(dc_levels[c], qpc)
        for b in range(4):
            x4, y4 = b & 1, b >> 1
            d = dequant4x4(ac_levels[c][b], qpc, True, dc[b])
            r = itransform(d)
            for j in range(4):
                for i in range(4):
                    px, py = x4 * 4 + i, y4 * 4 + j
                    plane[(my * 8 + py) * cw + mx * 8 + px] = \
                        clip(pred[py * 8 + px] + r[j * 4 + i])


def encode_mb(w, pic, mx, my, m, spec, mb_type_offset=0):
    kind = spec["kind"]
    lg = pic.mb_w * 4
    bx0, by0 = mx * 4, my * 4
    qp_delta = spec.get("qp_delta", 0)
    chroma_mode = spec.get("chroma_mode", 0)
    cbp_chroma = spec.get("cbp_chroma", 0)
    if kind == "i16":
        mode = spec["mode"]
        cbp_luma_ac = spec.get("ac", False)
        t = mode + cbp_chroma * 4 + (12 if cbp_luma_ac else 0)
        w.ue(t + 1 + mb_type_offset)
        w.ue(chroma_mode)
        w.se(qp_delta)
        pic.qp = ((pic.qp + qp_delta) % 52 + 52) % 52
        qp, qpc = pic.qp, chroma_qp(pic.qp)
        dc_zz = i16_dc_levels(m)
        nc = Pic.nC(pic.luma_tc_at(bx0 - 1, by0), pic.luma_tc_at(bx0, by0 - 1))
        encode_residual(w, dc_zz, nc)
        ac = [i16_ac_levels(k, m) if cbp_luma_ac else [0] * 16
              for k in range(16)]
        for k in range(16):
            x4, y4 = BLK_POS[k]
            bx, by = bx0 + x4, by0 + y4
            if cbp_luma_ac:
                nck = Pic.nC(pic.luma_tc_at(bx - 1, by), pic.luma_tc_at(bx, by - 1))
                tc = encode_residual(w, ac[k][1:], nck)
                pic.luma_tc[by * lg + bx] = tc
            else:
                pic.luma_tc[by * lg + bx] = 0
        # reconstruction
        pred = [0] * 256

        def gety(x, yy):
            return pic.y[yy * pic.w + x]
        predict16x16(gety, mx * 16, my * 16, mode,
                     mx > 0, my > 0, mx > 0 and my > 0, pred)
        dc = luma_dc_transform(dc_zz, qp)
        for k in range(16):
            x4, y4 = BLK_POS[k]
            d = dequant4x4(ac[k], qp, True, dc[y4 * 4 + x4])
            r = itransform(d)
            for j in range(4):
                for i in range(4):
                    px, py = x4 * 4 + i, y4 * 4 + j
                    pic.y[(my * 16 + py) * pic.w + mx * 16 + px] = \
                        clip(pred[py * 16 + px] + r[j * 4 + i])
        do_chroma(w, pic, mx, my, m, cbp_chroma, chroma_mode, qpc)
    else:  # i4
        w.ue(mb_type_offset)
        modes = []
        for k in range(16):
            legal, _ = legal_modes(pic, mx, my, k)
            mode = legal[(k * 3 + m * 5) % len(legal)]
            modes.append(mode)
        # signal modes with prediction
        for k in range(16):
            x4, y4 = BLK_POS[k]

            def nb_mode(bx, by):
                if bx < 0 or by < 0 or bx >= lg or by >= pic.mb_h * 4:
                    return 2
                nmx, nmy = bx // 4, by // 4
                decoded = (nmy < my or (nmy == my and nmx < mx) or
                           (nmx == mx and nmy == my and
                            IDX_OF[(bx % 4, by % 4)] < k))
                if not decoded:
                    return 2
                mm = (modes[IDX_OF[(bx % 4, by % 4)]]
                      if (nmx, nmy) == (mx, my)
                      else pic.i4_mode[by * lg + bx])
                return 2 if mm < 0 else mm
            pm = min(nb_mode(bx0 + x4 - 1, by0 + y4),
                     nb_mode(bx0 + x4, by0 + y4 - 1))
            if modes[k] == pm:
                w.bit(1)
            else:
                w.bit(0)
                w.u(modes[k] if modes[k] < pm else modes[k] - 1, 3)
        w.ue(chroma_mode)
        formula = I4_FORMULAS[spec.get("levels", "std")]
        luma = [formula(k, m) for k in range(16)]
        cbp_luma = 0
        for q in range(4):
            if any(any(luma[q * 4 + i]) for i in range(4)):
                cbp_luma |= 1 << q
        cbp = cbp_luma | (cbp_chroma << 4)
        w.ue(CBP_INTRA.index(cbp))
        if cbp != 0:
            w.se(qp_delta)
            pic.qp = ((pic.qp + qp_delta) % 52 + 52) % 52
        qp, qpc = pic.qp, chroma_qp(pic.qp)
        for k in range(16):
            x4, y4 = BLK_POS[k]
            bx, by = bx0 + x4, by0 + y4
            if cbp_luma & (1 << (k >> 2)):
                nck = Pic.nC(pic.luma_tc_at(bx - 1, by), pic.luma_tc_at(bx, by - 1))
                tc = encode_residual(w, luma[k], nck)
                pic.luma_tc[by * lg + bx] = tc
            else:
                pic.luma_tc[by * lg + bx] = 0
        # sequential per-block reconstruction
        for k in range(16):
            x4, y4 = BLK_POS[k]
            x0, y0 = mx * 16 + x4 * 4, my * 16 + y4 * 4
            bx, by = bx0 + x4, by0 + y4
            avail = {
                "left": luma_block_avail(pic, mx, my, k, bx - 1, by),
                "up": luma_block_avail(pic, mx, my, k, bx, by - 1),
                "upleft": luma_block_avail(pic, mx, my, k, bx - 1, by - 1),
                "upright": luma_block_avail(pic, mx, my, k, bx + 1, by - 1),
            }
            pred = [0] * 16

            def gety(x, yy):
                return pic.y[yy * pic.w + x]
            predict4x4(gety, x0, y0, modes[k], avail, pred)
            d = dequant4x4(luma[k], qp, False, 0)
            r = itransform(d)
            for j in range(4):
                for i in range(4):
                    pic.y[(y0 + j) * pic.w + x0 + i] = \
                        clip(pred[j * 4 + i] + r[j * 4 + i])
            pic.i4_mode[by * lg + bx] = modes[k]
        do_chroma(w, pic, mx, my, m, cbp_chroma, chroma_mode, qpc)


def encode_picture(mb_w, mb_h, slice_qp_delta, specs):
    w = BitWriter()
    w.ue(0)        # first_mb_in_slice
    w.ue(7)        # slice_type I
    w.ue(0)        # pps id
    w.u(0, 4)      # frame_num
    w.ue(0)        # idr_pic_id
    w.u(0, 1); w.u(0, 1)
    w.se(slice_qp_delta)
    pic = Pic(mb_w, mb_h, ((26 + slice_qp_delta) % 52 + 52) % 52)
    for my in range(mb_h):
        for mx in range(mb_w):
            m = my * mb_w + mx
            encode_mb(w, pic, mx, my, m, specs[m])
    w.trailing()
    return nal(5, w.rbsp()), pic


# ---- fixtures ------------------------------------------------------------

FIXTURES = {
    # Intra_16x16: all four pred modes, AC residuals, chroma DC+AC,
    # per-MB qp deltas, all four chroma modes
    "i16_rich": (2, 2, 2, [
        {"kind": "i16", "mode": 2, "ac": True, "cbp_chroma": 2,
         "qp_delta": 0, "chroma_mode": 0},
        {"kind": "i16", "mode": 1, "ac": True, "cbp_chroma": 1,
         "qp_delta": 2, "chroma_mode": 1},
        {"kind": "i16", "mode": 0, "ac": False, "cbp_chroma": 0,
         "qp_delta": -2, "chroma_mode": 2},
        {"kind": "i16", "mode": 3, "ac": True, "cbp_chroma": 2,
         "qp_delta": 0, "chroma_mode": 3},
    ]),
    # Intra_4x4: availability-derived mode sweep (all nine modes reached),
    # dense residual formulas, mixed chroma patterns
    "i4_rich": (2, 2, 0, [
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": 0, "chroma_mode": 0},
        {"kind": "i4", "cbp_chroma": 0, "qp_delta": 2, "chroma_mode": 1},
        {"kind": "i4", "cbp_chroma": 1, "qp_delta": -4, "chroma_mode": 2},
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": 2, "chroma_mode": 3},
    ]),
    # high QP: the qp >= 36 luma DC branch and the chroma QP table
    "i16_hiqp": (1, 1, 14, [
        {"kind": "i16", "mode": 2, "ac": True, "cbp_chroma": 2,
         "qp_delta": 0, "chroma_mode": 0},
    ]),
    # low QP: the qp < 24 dequant rounding branch
    "i4_loqp": (2, 1, -6, [
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": 0, "chroma_mode": 0},
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": 0, "chroma_mode": 1},
    ]),
    # medium residual density: neighbor-averaged nC lands in the
    # 4 <= nC < 8 coeff_token VLC column (Table 9-5 column 3)
    "i4_nc_mid": (2, 2, 0, [
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": 0, "chroma_mode": 0,
         "levels": "mid"},
        {"kind": "i4", "cbp_chroma": 1, "qp_delta": 2, "chroma_mode": 1,
         "levels": "mid"},
        {"kind": "i4", "cbp_chroma": 0, "qp_delta": 0, "chroma_mode": 2,
         "levels": "mid"},
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": -2, "chroma_mode": 3,
         "levels": "mid"},
    ]),
    # dense residuals: neighbor-averaged nC reaches the nC >= 8 FLC
    "i4_nc_hi": (2, 1, 0, [
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": 0, "chroma_mode": 0,
         "levels": "dense"},
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": 0, "chroma_mode": 1,
         "levels": "dense"},
    ]),
}

lines = []
for name, (mb_w, mb_h, sqd, specs) in sorted(FIXTURES.items()):
    nal_bytes, pic = encode_picture(mb_w, mb_h, sqd, specs)
    lines.append(" ".join([
        name, str(mb_w), str(mb_h), str(sqd), nal_bytes.hex(),
        bytes(pic.y).hex(), bytes(pic.cb).hex(), bytes(pic.cr).hex()]))

# the fixture suite must exercise every coeff_token context class,
# in particular the 4 <= nC < 8 VLC column and the nC >= 8 FLC
assert any(n == -1 for n in NC_SEEN), NC_SEEN
assert any(0 <= n < 2 for n in NC_SEEN), NC_SEEN
assert any(2 <= n < 4 for n in NC_SEEN), NC_SEEN
assert any(4 <= n < 8 for n in NC_SEEN), NC_SEEN
assert any(n >= 8 for n in NC_SEEN), NC_SEEN

OUT.parent.mkdir(parents=True, exist_ok=True)
OUT.write_text("\n".join(lines) + "\n")
print(f"wrote {len(lines)} CAVLC fixtures to {OUT}; nC contexts: {sorted(NC_SEEN)}")


# ==== P-slice fixtures (graft.multimodal.H264Inter) =======================
#
# Second implementation of the integer-MV P subset: mb_skip_run, the
# 8.4.1.1 skip vector and 8.4.1.3 median predictor, P_L0_16x16 with
# mvd + inter CBP (Table 9-4) + CAVLC residuals over motion-compensated
# prediction (edge-clamped luma, eighth-pel bilinear chroma), and intra
# macroblocks inside P slices (mb_type offset 5). Output:
# src/test/resources/h264_p_fixtures.txt, one line per fixture:
# `name mbW mbH nal0,nal1,... y0,y1,... cb0,... cr0,...`
# (comma-joined per frame; frame 0 is the IDR).

P_OUT = Path(__file__).resolve().parent.parent / \
    "src/test/resources/h264_p_fixtures.txt"

CBP_INTER = [0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
             14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
             17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41]
assert sorted(CBP_INTER) == list(range(48))


def median3(a, b, c):
    return max(min(a, b), min(max(a, b), c))


class Motion:
    """Per-4x4-BLOCK motion state (grid 4*mb_w x 4*mb_h)."""

    def __init__(self, mb_w, mb_h):
        self.mb_w, self.mb_h = mb_w, mb_h
        self.gw, self.gh = mb_w * 4, mb_h * 4
        self.mv = [(0, 0)] * (self.gw * self.gh)
        self.kind = [0] * (self.gw * self.gh)  # 0 undecoded, 1 inter, 2 intra

    def avail_blk(self, bx, by):
        return (0 <= bx < self.gw and 0 <= by < self.gh
                and self.kind[by * self.gw + bx] != 0)

    def info_blk(self, bx, by):
        if not self.avail_blk(bx, by) or self.kind[by * self.gw + bx] != 1:
            return (0, 0, -1)
        vx, vy = self.mv[by * self.gw + bx]
        return (vx, vy, 0)

    def set_rect(self, bx0, by0, wb, hb, vx, vy, kind):
        for by in range(by0, by0 + hb):
            for bx in range(bx0, bx0 + wb):
                self.mv[by * self.gw + bx] = (vx, vy)
                self.kind[by * self.gw + bx] = kind

    def set(self, mx, my, vx, vy, kind):
        self.set_rect(mx * 4, my * 4, 4, 4, vx, vy, kind)

    def inside(self, mx, my):
        return 0 <= mx < self.mb_w and 0 <= my < self.mb_h


# partition kinds for the 8.4.1.3.2 directional preferences
PART_NONE, P16X8_TOP, P16X8_BOT, P8X16_LEFT, P8X16_RIGHT = range(5)


def mv_pred_partition(mot, bx0, by0, wb, hb, pref):
    a = mot.info_blk(bx0 - 1, by0)
    b = mot.info_blk(bx0, by0 - 1)
    c_av = mot.avail_blk(bx0 + wb, by0 - 1)
    c = mot.info_blk(bx0 + wb, by0 - 1) if c_av \
        else mot.info_blk(bx0 - 1, by0 - 1)
    if pref == P16X8_TOP and b[2] == 0:
        return b[0], b[1]
    if pref in (P16X8_BOT, P8X16_LEFT) and a[2] == 0:
        return a[0], a[1]
    if pref == P8X16_RIGHT and c[2] == 0:
        return c[0], c[1]
    b_av = mot.avail_blk(bx0, by0 - 1)
    d_av = mot.avail_blk(bx0 - 1, by0 - 1)
    if not b_av and not c_av and not d_av and mot.avail_blk(bx0 - 1, by0):
        return a[0], a[1]
    matches = [x for x in (a, b, c) if x[2] == 0]
    if len(matches) == 1:
        return matches[0][0], matches[0][1]
    return (median3(a[0], b[0], c[0]), median3(a[1], b[1], c[1]))


def mv_pred(mot, mx, my):
    return mv_pred_partition(mot, mx * 4, my * 4, 4, 4, PART_NONE)


def skip_mv(mot, mx, my):
    if not mot.inside(mx - 1, my) or not mot.inside(mx, my - 1):
        return (0, 0)
    a = mot.info_blk(mx * 4 - 1, my * 4)
    b = mot.info_blk(mx * 4, my * 4 - 1)
    if (a[2] == 0 and a[0] == 0 and a[1] == 0) or \
       (b[2] == 0 and b[0] == 0 and b[1] == 0):
        return (0, 0)
    return mv_pred(mot, mx, my)


def clamp_fetch(plane, w, h, x, y):
    return plane[max(0, min(h - 1, y)) * w + max(0, min(w - 1, x))]


def luma_sample(plane, w, h, xq, yq):
    """8.4.2.2.1 fractional luma sample at quarter-pel (xq, yq)."""
    xi, yi = xq >> 2, yq >> 2
    xf, yf = xq & 3, yq & 3

    def g(dx, dy):
        return clamp_fetch(plane, w, h, xi + dx, yi + dy)
    if xf == 0 and yf == 0:
        return g(0, 0)

    def b1(dy):  # unrounded horizontal 6-tap at row yi + dy
        return (g(-2, dy) - 5 * g(-1, dy) + 20 * g(0, dy)
                + 20 * g(1, dy) - 5 * g(2, dy) + g(3, dy))

    def h1(dx):  # unrounded vertical 6-tap at column xi + dx
        return (g(dx, -2) - 5 * g(dx, -1) + 20 * g(dx, 0)
                + 20 * g(dx, 1) - 5 * g(dx, 2) + g(dx, 3))

    b = clip((b1(0) + 16) >> 5)
    s = clip((b1(1) + 16) >> 5)
    hv = clip((h1(0) + 16) >> 5)
    m = clip((h1(1) + 16) >> 5)
    j1 = (b1(-2) - 5 * b1(-1) + 20 * b1(0) + 20 * b1(1)
          - 5 * b1(2) + b1(3))
    j = clip((j1 + 512) >> 10)

    def avg(a, c):
        return (a + c + 1) >> 1
    return {
        (1, 0): avg(g(0, 0), b), (2, 0): b, (3, 0): avg(g(1, 0), b),
        (0, 1): avg(g(0, 0), hv), (0, 2): hv, (0, 3): avg(g(0, 1), hv),
        (1, 1): avg(b, hv), (3, 1): avg(b, m),
        (1, 3): avg(hv, s), (3, 3): avg(m, s),
        (2, 1): avg(b, j), (2, 2): j, (2, 3): avg(j, s),
        (1, 2): avg(hv, j), (3, 2): avg(j, m),
    }[(xf, yf)]


def motion_compensate_rect(pic, prev, x0, y0, pw, ph, mvx, mvy):
    w, h = pic.w, pic.h
    for py in range(ph):
        for px in range(pw):
            pic.y[(y0 + py) * w + x0 + px] = luma_sample(
                prev.y, w, h, (x0 + px) * 4 + mvx, (y0 + py) * 4 + mvy)
    cw, ch = w // 2, h // 2
    cx0, cy0 = x0 // 2, y0 // 2
    cdx, cdy = mvx >> 3, mvy >> 3
    xf, yf = mvx & 7, mvy & 7
    for plane, src in ((pic.cb, prev.cb), (pic.cr, prev.cr)):
        for cy in range(ph // 2):
            for cx in range(pw // 2):
                bx, by = cx0 + cx + cdx, cy0 + cy + cdy
                if xf == 0 and yf == 0:
                    v = clamp_fetch(src, cw, ch, bx, by)
                else:
                    p00 = clamp_fetch(src, cw, ch, bx, by)
                    p10 = clamp_fetch(src, cw, ch, bx + 1, by)
                    p01 = clamp_fetch(src, cw, ch, bx, by + 1)
                    p11 = clamp_fetch(src, cw, ch, bx + 1, by + 1)
                    v = ((8 - xf) * (8 - yf) * p00 + xf * (8 - yf) * p10 +
                         (8 - xf) * yf * p01 + xf * yf * p11 + 32) >> 6
                plane[(cy0 + cy) * cw + cx0 + cx] = v


def motion_compensate(pic, prev, mx, my, mvx, mvy):
    motion_compensate_rect(pic, prev, mx * 16, my * 16, 16, 16, mvx, mvy)


def zero_tc(pic, mx, my):
    lg, cg = pic.mb_w * 4, pic.mb_w * 2
    for k in range(16):
        x4, y4 = BLK_POS[k]
        pic.luma_tc[(my * 4 + y4) * lg + mx * 4 + x4] = 0
    for b in range(4):
        bx, by = mx * 2 + (b & 1), my * 2 + (b >> 1)
        pic.cb_tc[by * cg + bx] = 0
        pic.cr_tc[by * cg + bx] = 0


def encode_p16(w, pic, prev, mot, mx, my, spec):
    mvx, mvy = spec["mv"]
    px, py = mv_pred(mot, mx, my)
    w.se(mvx - px)
    w.se(mvy - py)
    mot.set(mx, my, mvx, mvy, 1)
    motion_compensate(pic, prev, mx, my, mvx, mvy)
    encode_p_residual(w, pic, mx, my, spec)


def encode_p2(w, pic, prev, mot, mx, my, spec):
    """16x8 (vertical False) / 8x16 (vertical True): per-partition mvd
    with the 8.4.1.3.2 directional predictors, MB-level residual."""
    bx0, by0 = mx * 4, my * 4
    if not spec["vertical"]:
        parts = [(bx0, by0, 4, 2, P16X8_TOP, spec["mv0"]),
                 (bx0, by0 + 2, 4, 2, P16X8_BOT, spec["mv1"])]
    else:
        parts = [(bx0, by0, 2, 4, P8X16_LEFT, spec["mv0"]),
                 (bx0 + 2, by0, 2, 4, P8X16_RIGHT, spec["mv1"])]
    for bx, by, wb, hb, pref, (vx, vy) in parts:
        px, py = mv_pred_partition(mot, bx, by, wb, hb, pref)
        w.se(vx - px)
        w.se(vy - py)
        mot.set_rect(bx, by, wb, hb, vx, vy, 1)
        motion_compensate_rect(pic, prev, bx * 4, by * 4, wb * 4, hb * 4,
                               vx, vy)
    encode_p_residual(w, pic, mx, my, spec)


def sub_partitions(px8, py8, sub_type):
    if sub_type == 0:
        return [(px8, py8, 2, 2)]
    if sub_type == 1:
        return [(px8, py8, 2, 1), (px8, py8 + 1, 2, 1)]
    if sub_type == 2:
        return [(px8, py8, 1, 2), (px8 + 1, py8, 1, 2)]
    return [(px8, py8, 1, 1), (px8 + 1, py8, 1, 1),
            (px8, py8 + 1, 1, 1), (px8 + 1, py8 + 1, 1, 1)]


def encode_p8x8(w, pic, prev, mot, mx, my, spec):
    for st in spec["sub_types"]:
        w.ue(st)
    bx0, by0 = mx * 4, my * 4
    for p8 in range(4):
        px8, py8 = bx0 + (p8 & 1) * 2, by0 + (p8 >> 1) * 2
        parts = sub_partitions(px8, py8, spec["sub_types"][p8])
        assert len(parts) == len(spec["mvs"][p8])
        for (bx, by, wb, hb), (vx, vy) in zip(parts, spec["mvs"][p8]):
            px, py = mv_pred_partition(mot, bx, by, wb, hb, PART_NONE)
            w.se(vx - px)
            w.se(vy - py)
            mot.set_rect(bx, by, wb, hb, vx, vy, 1)
            motion_compensate_rect(pic, prev, bx * 4, by * 4, wb * 4, hb * 4,
                                   vx, vy)
    encode_p_residual(w, pic, mx, my, spec)


def encode_p_residual(w, pic, mx, my, spec):
    luma = spec["luma"]
    cbp_luma = 0
    for q in range(4):
        if any(any(luma[q * 4 + i]) for i in range(4)):
            cbp_luma |= 1 << q
    cbp = cbp_luma | (spec["cbp_chroma"] << 4)
    w.ue(CBP_INTER.index(cbp))
    if cbp != 0:
        w.se(spec["qp_delta"])
        pic.qp = ((pic.qp + spec["qp_delta"]) % 52 + 52) % 52
    qp = pic.qp
    qpc = chroma_qp(qp)
    lg = pic.mb_w * 4
    bx0, by0 = mx * 4, my * 4
    for k in range(16):
        x4, y4 = BLK_POS[k]
        bx, by = bx0 + x4, by0 + y4
        if cbp_luma & (1 << (k >> 2)):
            nc = Pic.nC(pic.luma_tc_at(bx - 1, by), pic.luma_tc_at(bx, by - 1))
            tc = encode_residual(w, luma[k], nc)
            pic.luma_tc[by * lg + bx] = tc
            d = dequant4x4(luma[k], qp, False, 0)
            r = itransform(d)
            x0, y0 = mx * 16 + x4 * 4, my * 16 + y4 * 4
            for j in range(4):
                for i in range(4):
                    at = (y0 + j) * pic.w + x0 + i
                    pic.y[at] = clip(pic.y[at] + r[j * 4 + i])
        else:
            pic.luma_tc[by * lg + bx] = 0
    # chroma residual over the MC prediction
    cg = pic.mb_w * 2
    cx0, cy0 = mx * 2, my * 2
    cbp_chroma = spec["cbp_chroma"]
    dc_levels = [spec["chroma_dc"][c] if cbp_chroma else [0] * 4
                 for c in range(2)]
    ac_levels = [[spec["chroma_ac"][c][b] if cbp_chroma == 2 else [0] * 16
                  for b in range(4)] for c in range(2)]
    if cbp_chroma:
        encode_residual(w, dc_levels[0], -1)
        encode_residual(w, dc_levels[1], -1)
    cw = pic.w // 2
    for c in range(2):
        arr = pic.cb_tc if c == 0 else pic.cr_tc
        plane = pic.cb if c == 0 else pic.cr
        dc = chroma_dc_transform(dc_levels[c], qpc)
        for b in range(4):
            bx, by = cx0 + (b & 1), cy0 + (b >> 1)
            if cbp_chroma == 2:
                nc = Pic.nC(pic.chroma_tc_at(arr, bx - 1, by),
                            pic.chroma_tc_at(arr, bx, by - 1))
                tc = encode_residual(w, ac_levels[c][b][1:], nc)
                arr[by * cg + bx] = tc
            else:
                arr[by * cg + bx] = 0
            d = dequant4x4(ac_levels[c][b], qpc, True, dc[b])
            r = itransform(d)
            x0, y0 = mx * 8 + (b & 1) * 4, my * 8 + (b >> 1) * 4
            for j in range(4):
                for i in range(4):
                    at = (y0 + j) * cw + x0 + i
                    plane[at] = clip(plane[at] + r[j * 4 + i])


def encode_p_picture(prev_pic, mb_w, mb_h, frame_num, sqd, specs):
    w = BitWriter()
    w.ue(0)              # first_mb_in_slice
    w.ue(5)              # slice_type: P (all-slices-same form)
    w.ue(0)              # pps id
    w.u(frame_num, 4)
    w.u(0, 1)            # num_ref_idx_active_override_flag
    w.u(0, 1)            # ref_pic_list_modification_flag_l0
    w.u(0, 1)            # adaptive_ref_pic_marking_mode_flag
    w.se(sqd)
    pic = Pic(mb_w, mb_h, ((26 + sqd) % 52 + 52) % 52)
    mot = Motion(mb_w, mb_h)
    skip_run = 0
    for idx in range(mb_w * mb_h):
        mx, my = idx % mb_w, idx // mb_w
        spec = specs[idx]
        if spec["kind"] == "skip":
            vx, vy = skip_mv(mot, mx, my)
            mot.set(mx, my, vx, vy, 1)
            motion_compensate(pic, prev_pic, mx, my, vx, vy)
            zero_tc(pic, mx, my)
            skip_run += 1
        elif spec["kind"] == "p16":
            w.ue(skip_run)
            skip_run = 0
            w.ue(0)      # mb_type: P_L0_16x16
            encode_p16(w, pic, prev_pic, mot, mx, my, spec)
        elif spec["kind"] == "p2":
            w.ue(skip_run)
            skip_run = 0
            w.ue(2 if spec["vertical"] else 1)  # mb_type 8x16 / 16x8
            encode_p2(w, pic, prev_pic, mot, mx, my, spec)
        elif spec["kind"] == "p8x8":
            w.ue(skip_run)
            skip_run = 0
            w.ue(3)  # mb_type P_8x8
            encode_p8x8(w, pic, prev_pic, mot, mx, my, spec)
        else:            # intra MB inside the P slice (mb_type offset 5)
            w.ue(skip_run)
            skip_run = 0
            encode_mb(w, pic, mx, my, spec["m"], spec, mb_type_offset=5)
            mot.set(mx, my, 0, 0, 2)
    if skip_run:
        w.ue(skip_run)   # trailing all-skip run
    w.trailing()
    # nal_ref_idc 2, type 1; motion returned for B colocated derivation
    return bytes([0x41]) + ebsp(w.rbsp()), pic, mot


# ---- the shared P recipe (restated in the Scala H264InterInteropSpec) ----

def p16_luma(k, m):
    # quadrant-gated mid-density levels: exactly two cbp quadrants set
    if ((k >> 2) + m) % 2 == 1:
        return [0] * 16
    return i4_mid_levels(k, m)


def p16_spec(m, t):
    return {"kind": "p16",
            "mv": (4 * ((m + t) % 5 - 2), 4 * ((2 * m + t) % 5 - 2)),
            "luma": [p16_luma(k, m + t) for k in range(16)],
            "cbp_chroma": (m + t) % 3,
            "qp_delta": (t % 3) - 1,
            "chroma_dc": [chroma_dc_levels(c, m + t) for c in range(2)],
            "chroma_ac": [[chroma_ac_levels(c, b, m + t) for b in range(4)]
                          for c in range(2)]}


def p_intra_spec(m, t):
    return {"kind": "i16", "mode": 2, "ac": False, "cbp_chroma": 0,
            "qp_delta": 0, "chroma_mode": 0, "m": m + t}


def p_frame_specs(mb_w, mb_h, t):
    out = []
    for m in range(mb_w * mb_h):
        role = (m + t) % 3
        if role == 0:
            out.append({"kind": "skip"})
        elif role == 1:
            out.append(p16_spec(m, t))
        else:
            out.append(p_intra_spec(m, t))
    return out


def p_subpel_spec(m, t):
    # frac combo index (t-1)*4 + m sweeps ALL 16 (xF, yF) pairs over
    # 4 frames x 4 MBs; integer part varies sign for negative vectors
    i = (t - 1) * 4 + m
    xf, yf = i & 3, i >> 2
    mvx = 4 * ((m + t) % 3 - 1) + xf
    mvy = 4 * ((2 * m + t) % 3 - 1) + yf
    return {"kind": "p16", "mv": (mvx, mvy),
            "luma": [[0] * 16 for _ in range(16)],
            "cbp_chroma": (m + t) % 3, "qp_delta": 0,
            "chroma_dc": [chroma_dc_levels(c, m + t) for c in range(2)],
            "chroma_ac": [[chroma_ac_levels(c, b, m + t) for b in range(4)]
                          for c in range(2)]}


# every quarter-pel phase pair must be exercised by the p_subpel recipe
_fracs = {(p_subpel_spec(m, t)["mv"][0] & 3, p_subpel_spec(m, t)["mv"][1] & 3)
          for t in range(1, 5) for m in range(4)}
assert _fracs == {(x, y) for x in range(4) for y in range(4)}, _fracs


def p_part_spec(m, t):
    return {"kind": "p2", "vertical": (m + t) % 2 == 1,
            "mv0": (((m * 5 + t) % 11) - 5, ((m * 3 + t * 2) % 11) - 5),
            "mv1": (((m * 7 + t * 3) % 11) - 5, ((m + t * 5) % 11) - 5),
            "luma": [p16_luma(k, m + t) for k in range(16)],
            "cbp_chroma": (m + t) % 3, "qp_delta": (t % 3) - 1,
            "chroma_dc": [chroma_dc_levels(c, m + t) for c in range(2)],
            "chroma_ac": [[chroma_ac_levels(c, b, m + t) for b in range(4)]
                          for c in range(2)]}


def p_part_frame(t):
    out = []
    for m in range(4):
        role = (m + 2 * t) % 4
        if role == 0:
            out.append({"kind": "skip"})
        elif role == 1:
            out.append(p_part_spec(m, t))
        elif role == 2:
            out.append(p16_spec(m, t))
        else:
            out.append(p_intra_spec(m, t))
    return out


def p8_spec(m, t):
    # one of each sub_mb_type across the four 8x8s, rotated per MB/frame
    sub_types = [(m + t + i) % 4 for i in range(4)]
    mvs = []
    n_of = [1, 2, 2, 4]
    for p8 in range(4):
        mvs.append([((m * 3 + t + p8 * 5 + s * 7) % 11 - 5,
                     (m + t * 3 + p8 * 2 + s * 5) % 11 - 5)
                    for s in range(n_of[sub_types[p8]])])
    return {"kind": "p8x8", "sub_types": sub_types, "mvs": mvs,
            "luma": [p16_luma(k, m + t) for k in range(16)],
            "cbp_chroma": (m + t) % 3, "qp_delta": (t % 3) - 1,
            "chroma_dc": [chroma_dc_levels(c, m + t) for c in range(2)],
            "chroma_ac": [[chroma_ac_levels(c, b, m + t) for b in range(4)]
                          for c in range(2)]}


def p8_frame(t):
    out = []
    for m in range(4):
        role = (m + 3 * t) % 4
        if role == 0:
            out.append({"kind": "skip"})
        elif role == 1:
            out.append(p8_spec(m, t))
        elif role == 2:
            out.append(p_part_spec(m, t))
        else:
            out.append(p16_spec(m, t))
    return out


P_FIXTURES = {
    # P_8x8 sub-macroblock partitions: all four sub_mb_types, sub-pel
    # per-sub-partition vectors, mixed with 16x8/8x16/16x16/skip
    "p_8x8": (2, 2, 0, [
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": 0, "chroma_mode": 0},
        {"kind": "i4", "cbp_chroma": 1, "qp_delta": 2, "chroma_mode": 1},
        {"kind": "i4", "cbp_chroma": 0, "qp_delta": 0, "chroma_mode": 2},
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": -2, "chroma_mode": 3},
    ], [p8_frame, 3]),
    # two-partition MBs (16x8 / 8x16) with per-partition sub-pel vectors,
    # mixed with skip / 16x16 / intra so the directional predictors see
    # both matching-inter and intra/unavailable neighbors
    "p_partitions": (2, 2, 0, [
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": 0, "chroma_mode": 0},
        {"kind": "i4", "cbp_chroma": 1, "qp_delta": 2, "chroma_mode": 1},
        {"kind": "i4", "cbp_chroma": 0, "qp_delta": 0, "chroma_mode": 2},
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": -2, "chroma_mode": 3},
    ], [p_part_frame, 3]),
    # quarter/half-pel vectors over a textured Intra_4x4 IDR: all 16
    # fractional phase pairs, negative integer parts, border clamping
    "p_subpel": (2, 2, 0, [
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": 0, "chroma_mode": 0},
        {"kind": "i4", "cbp_chroma": 1, "qp_delta": 2, "chroma_mode": 1},
        {"kind": "i4", "cbp_chroma": 0, "qp_delta": 0, "chroma_mode": 2},
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": -2, "chroma_mode": 3},
    ], [lambda t: [p_subpel_spec(m, t) for m in range(4)], 4]),
    # mixed skip/coded/intra P MBs over an Intra_4x4 IDR; leading,
    # mid and trailing skip runs across the three P frames
    "p_mixed": (2, 2, 0, [
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": 0, "chroma_mode": 0},
        {"kind": "i4", "cbp_chroma": 1, "qp_delta": 2, "chroma_mode": 1},
        {"kind": "i4", "cbp_chroma": 0, "qp_delta": 0, "chroma_mode": 2},
        {"kind": "i4", "cbp_chroma": 2, "qp_delta": -2, "chroma_mode": 3},
    ], [lambda t: p_frame_specs(2, 2, t), 3]),
    # all-P16 with varied vectors (negative, border-clamping, odd-pel →
    # half-phase chroma) and zero residual: the cbp = 0 coded path
    "p_motion": (2, 2, 0, [
        {"kind": "i16", "mode": 2, "ac": True, "cbp_chroma": 2,
         "qp_delta": 0, "chroma_mode": 0},
        {"kind": "i16", "mode": 1, "ac": True, "cbp_chroma": 1,
         "qp_delta": 2, "chroma_mode": 1},
        {"kind": "i16", "mode": 0, "ac": False, "cbp_chroma": 0,
         "qp_delta": -2, "chroma_mode": 2},
        {"kind": "i16", "mode": 3, "ac": True, "cbp_chroma": 2,
         "qp_delta": 0, "chroma_mode": 3},
    ], [lambda t: [{"kind": "p16",
                    "mv": (4 * ((m + t) % 5 - 2), 4 * ((2 * m + t) % 5 - 2)),
                    "luma": [[0] * 16 for _ in range(16)],
                    "cbp_chroma": 0, "qp_delta": 0,
                    "chroma_dc": [[0] * 4] * 2,
                    "chroma_ac": [[[0] * 16] * 4] * 2}
                   for m in range(4)], 2]),
    # one all-skip P frame (a single trailing skip run, stationary copy)
    "p_allskip": (2, 1, 2, [
        {"kind": "i16", "mode": 2, "ac": True, "cbp_chroma": 2,
         "qp_delta": 0, "chroma_mode": 0},
        {"kind": "i16", "mode": 2, "ac": False, "cbp_chroma": 0,
         "qp_delta": 0, "chroma_mode": 1},
    ], [lambda t: [{"kind": "skip"}, {"kind": "skip"}], 1]),
}

p_lines = []
for name, (mb_w, mb_h, sqd, idr_specs, (p_spec_fn, n_p)) in sorted(
        P_FIXTURES.items()):
    nal0, pic = encode_picture(mb_w, mb_h, sqd, idr_specs)
    nals = [nal0]
    planes = [(bytes(pic.y), bytes(pic.cb), bytes(pic.cr))]
    prev = pic
    for t in range(1, n_p + 1):
        p_sqd = (t % 2) * 2
        nal_t, pic_t, _ = encode_p_picture(prev, mb_w, mb_h, t, p_sqd,
                                           p_spec_fn(t))
        nals.append(nal_t)
        planes.append((bytes(pic_t.y), bytes(pic_t.cb), bytes(pic_t.cr)))
        prev = pic_t
    p_lines.append(" ".join([
        name, str(mb_w), str(mb_h),
        ",".join(n.hex() for n in nals),
        ",".join(p[0].hex() for p in planes),
        ",".join(p[1].hex() for p in planes),
        ",".join(p[2].hex() for p in planes)]))

P_OUT.write_text("\n".join(p_lines) + "\n")
print(f"wrote {len(p_lines)} P-slice fixtures to {P_OUT}")


# ==== B-slice fixtures (graft.multimodal.H264BInter) ======================
#
# Second implementation of the CAVLC B subset: two one-picture reference
# lists (list0 = the newer stored reference, list1 = the older), B_Skip
# and B_Direct_16x16 via SPATIAL direct prediction (8.4.1.2.2: min
# positive refIdx over A/B/C with C->D substitution, the
# directZeroPrediction fallback, per-list 8.4.1.3 medians, per-4x4
# colZeroFlag off the colocated list1 motion), B_L0/L1/Bi_16x16 with
# per-list mv prediction, DEFAULT bi-prediction ((p0 + p1 + 1) >> 1
# after full quarter-pel/eighth-pel interpolation per list), inter CBP
# residuals, and intra MBs inside B slices (mb_type offset 23).
# Output: src/test/resources/h264_b_fixtures.txt, same line format as
# the P fixtures (frame 0 is the IDR).

B_OUT = Path(__file__).resolve().parent.parent / \
    "src/test/resources/h264_b_fixtures.txt"


class BMotion:
    """Per-4x4-block TWO-LIST motion state for one B picture."""

    def __init__(self, mb_w, mb_h):
        self.mb_w, self.mb_h = mb_w, mb_h
        self.gw, self.gh = mb_w * 4, mb_h * 4
        n = self.gw * self.gh
        self.mv = [[(0, 0)] * n, [(0, 0)] * n]
        self.use = [[False] * n, [False] * n]
        self.kind = [0] * n  # 0 undecoded, 1 inter, 2 intra

    def avail_blk(self, bx, by):
        return (0 <= bx < self.gw and 0 <= by < self.gh
                and self.kind[by * self.gw + bx] != 0)

    def info_blk(self, lst, bx, by):
        at = by * self.gw + bx
        if (not self.avail_blk(bx, by) or self.kind[at] != 1
                or not self.use[lst][at]):
            return (0, 0, -1)
        vx, vy = self.mv[lst][at]
        return (vx, vy, 0)

    def set_blk(self, lst, bx, by, vx, vy):
        at = by * self.gw + bx
        self.mv[lst][at] = (vx, vy)
        self.use[lst][at] = True
        self.kind[at] = 1

    def set_inter(self, bx, by):
        self.kind[by * self.gw + bx] = 1

    def set_intra(self, mx, my):
        for by in range(my * 4, my * 4 + 4):
            for bx in range(mx * 4, mx * 4 + 4):
                self.kind[by * self.gw + bx] = 2


def col_zero_of(mot):
    """colZeroFlag predicate over a colocated P Motion (None: never)."""
    if mot is None:
        return lambda bx, by: False

    def f(bx, by):
        at = by * mot.gw + bx
        if mot.kind[at] != 1:
            return False
        vx, vy = mot.mv[at]
        return -1 <= vx <= 1 and -1 <= vy <= 1
    return f


def mv_pred_list(m, lst, mx, my):
    """8.4.1.3 median prediction for a 16x16 partition in list lst."""
    bx0, by0 = mx * 4, my * 4
    a = m.info_blk(lst, bx0 - 1, by0)
    b = m.info_blk(lst, bx0, by0 - 1)
    c_av = m.avail_blk(bx0 + 4, by0 - 1)
    c = m.info_blk(lst, bx0 + 4, by0 - 1) if c_av \
        else m.info_blk(lst, bx0 - 1, by0 - 1)
    b_av = m.avail_blk(bx0, by0 - 1)
    d_av = m.avail_blk(bx0 - 1, by0 - 1)
    if not b_av and not c_av and not d_av and m.avail_blk(bx0 - 1, by0):
        return a[0], a[1]
    matches = [x for x in (a, b, c) if x[2] == 0]
    if len(matches) == 1:
        return matches[0][0], matches[0][1]
    return (median3(a[0], b[0], c[0]), median3(a[1], b[1], c[1]))


def direct_ref_idx(m, lst, mx, my):
    bx0, by0 = mx * 4, my * 4
    a = m.info_blk(lst, bx0 - 1, by0)[2]
    b = m.info_blk(lst, bx0, by0 - 1)[2]
    c = (m.info_blk(lst, bx0 + 4, by0 - 1)[2]
         if m.avail_blk(bx0 + 4, by0 - 1)
         else m.info_blk(lst, bx0 - 1, by0 - 1)[2])
    pos = [x for x in (a, b, c) if x >= 0]
    return min(pos) if pos else -1


def derive_direct(m, mx, my, col_zero):
    """Spatial direct for one MB: (useL0, useL1, v0[16], v1[16])."""
    r0 = direct_ref_idx(m, 0, mx, my)
    r1 = direct_ref_idx(m, 1, mx, my)
    if r0 < 0 and r1 < 0:
        z = [(0, 0)] * 16
        return True, True, z, z
    mb0 = mv_pred_list(m, 0, mx, my) if r0 == 0 else (0, 0)
    mb1 = mv_pred_list(m, 1, mx, my) if r1 == 0 else (0, 0)
    v0, v1 = [mb0] * 16, [mb1] * 16
    for blk in range(16):
        bx, by = mx * 4 + (blk & 3), my * 4 + (blk >> 2)
        if col_zero(bx, by):
            if r0 == 0:
                v0[blk] = (0, 0)
            if r1 == 0:
                v1[blk] = (0, 0)
    return r0 == 0, r1 == 0, v0, v1


def chroma_sample(src, cw, ch, bx, by, xf, yf):
    if xf == 0 and yf == 0:
        return clamp_fetch(src, cw, ch, bx, by)
    p00 = clamp_fetch(src, cw, ch, bx, by)
    p10 = clamp_fetch(src, cw, ch, bx + 1, by)
    p01 = clamp_fetch(src, cw, ch, bx, by + 1)
    p11 = clamp_fetch(src, cw, ch, bx + 1, by + 1)
    return ((8 - xf) * (8 - yf) * p00 + xf * (8 - yf) * p10 +
            (8 - xf) * yf * p01 + xf * yf * p11 + 32) >> 6


def bi_compensate_rect(pic, r0, r1, x0, y0, pw, ph, mv0, mv1):
    """Default bi-prediction (8.4.2.3.1): per-list full interpolation,
    then (p0 + p1 + 1) >> 1 per sample."""
    w, h = pic.w, pic.h
    for py in range(ph):
        for px in range(pw):
            p0 = luma_sample(r0.y, w, h, (x0 + px) * 4 + mv0[0],
                             (y0 + py) * 4 + mv0[1])
            p1 = luma_sample(r1.y, w, h, (x0 + px) * 4 + mv1[0],
                             (y0 + py) * 4 + mv1[1])
            pic.y[(y0 + py) * w + x0 + px] = (p0 + p1 + 1) >> 1
    cw, ch = w // 2, h // 2
    cx0, cy0 = x0 // 2, y0 // 2
    for plane, s0, s1 in ((pic.cb, r0.cb, r1.cb), (pic.cr, r0.cr, r1.cr)):
        for cy in range(ph // 2):
            for cx in range(pw // 2):
                p0 = chroma_sample(s0, cw, ch, cx0 + cx + (mv0[0] >> 3),
                                   cy0 + cy + (mv0[1] >> 3),
                                   mv0[0] & 7, mv0[1] & 7)
                p1 = chroma_sample(s1, cw, ch, cx0 + cx + (mv1[0] >> 3),
                                   cy0 + cy + (mv1[1] >> 3),
                                   mv1[0] & 7, mv1[1] & 7)
                plane[(cy0 + cy) * cw + cx0 + cx] = (p0 + p1 + 1) >> 1


def direct_compensate(pic, r0, r1, mx, my, u0, u1, v0, v1):
    for blk in range(16):
        x0, y0 = mx * 16 + (blk & 3) * 4, my * 16 + (blk >> 2) * 4
        if u0 and u1:
            bi_compensate_rect(pic, r0, r1, x0, y0, 4, 4, v0[blk], v1[blk])
        elif u0:
            motion_compensate_rect(pic, r0, x0, y0, 4, 4, *v0[blk])
        else:
            motion_compensate_rect(pic, r1, x0, y0, 4, 4, *v1[blk])


def record_direct(m, mx, my, u0, u1, v0, v1):
    for blk in range(16):
        bx, by = mx * 4 + (blk & 3), my * 4 + (blk >> 2)
        m.set_inter(bx, by)
        if u0:
            m.set_blk(0, bx, by, *v0[blk])
        if u1:
            m.set_blk(1, bx, by, *v1[blk])


def record16(m, mx, my, u0, u1, mv0, mv1):
    for by in range(my * 4, my * 4 + 4):
        for bx in range(mx * 4, mx * 4 + 4):
            m.set_inter(bx, by)
            if u0:
                m.set_blk(0, bx, by, *mv0)
            if u1:
                m.set_blk(1, bx, by, *mv1)


def encode_b_picture(ref0, ref1, col_zero, mb_w, mb_h, frame_num, sqd,
                     specs):
    """ref0 = RefPicList0[0] (newer), ref1 = RefPicList1[0] (older)."""
    w = BitWriter()
    w.ue(0)              # first_mb_in_slice
    w.ue(6)              # slice_type: B (all-slices-same form)
    w.ue(0)              # pps id
    w.u(frame_num, 4)
    w.u(1, 1)            # direct_spatial_mv_pred_flag
    w.u(0, 1)            # num_ref_idx_active_override_flag
    w.u(0, 1)            # ref_pic_list_modification_flag_l0
    w.u(0, 1)            # ref_pic_list_modification_flag_l1
    w.se(sqd)            # nal_ref_idc 0 -> no dec_ref_pic_marking
    pic = Pic(mb_w, mb_h, ((26 + sqd) % 52 + 52) % 52)
    mot = BMotion(mb_w, mb_h)
    skip_run = 0
    for idx in range(mb_w * mb_h):
        mx, my = idx % mb_w, idx // mb_w
        spec = specs[idx]
        kind = spec["kind"]
        if kind == "bskip":
            u0, u1, v0, v1 = derive_direct(mot, mx, my, col_zero)
            direct_compensate(pic, ref0, ref1, mx, my, u0, u1, v0, v1)
            record_direct(mot, mx, my, u0, u1, v0, v1)
            zero_tc(pic, mx, my)
            skip_run += 1
        elif kind == "bdirect":
            w.ue(skip_run)
            skip_run = 0
            w.ue(0)      # mb_type B_Direct_16x16
            u0, u1, v0, v1 = derive_direct(mot, mx, my, col_zero)
            direct_compensate(pic, ref0, ref1, mx, my, u0, u1, v0, v1)
            record_direct(mot, mx, my, u0, u1, v0, v1)
            encode_p_residual(w, pic, mx, my, spec)
        elif kind == "b16":
            mode = spec["mode"]  # 0 = L0, 1 = L1, 2 = Bi
            w.ue(skip_run)
            skip_run = 0
            w.ue(mode + 1)
            u0, u1 = mode in (0, 2), mode in (1, 2)
            mv0 = spec["mv0"] if u0 else (0, 0)
            mv1 = spec["mv1"] if u1 else (0, 0)
            if u0:
                px, py = mv_pred_list(mot, 0, mx, my)
                w.se(mv0[0] - px)
                w.se(mv0[1] - py)
            if u1:
                px, py = mv_pred_list(mot, 1, mx, my)
                w.se(mv1[0] - px)
                w.se(mv1[1] - py)
            if u0 and u1:
                bi_compensate_rect(pic, ref0, ref1, mx * 16, my * 16,
                                   16, 16, mv0, mv1)
            elif u0:
                motion_compensate_rect(pic, ref0, mx * 16, my * 16,
                                       16, 16, *mv0)
            else:
                motion_compensate_rect(pic, ref1, mx * 16, my * 16,
                                       16, 16, *mv1)
            record16(mot, mx, my, u0, u1, mv0, mv1)
            encode_p_residual(w, pic, mx, my, spec)
        else:                # intra MB inside the B slice
            w.ue(skip_run)
            skip_run = 0
            encode_mb(w, pic, mx, my, spec["m"], spec, mb_type_offset=23)
            mot.set_intra(mx, my)
    if skip_run:
        w.ue(skip_run)       # trailing all-skip run
    w.trailing()
    return bytes([0x01]) + ebsp(w.rbsp()), pic  # nal_ref_idc 0, type 1


# ---- the shared B recipe (restated in the Scala H264BInterInteropSpec) ---

def b16_spec(m, t, mode):
    return {"kind": "b16", "mode": mode,
            "mv0": (((m * 5 + t) % 13) - 6, ((m * 3 + 2 * t) % 13) - 6),
            "mv1": (((m * 7 + 3 * t) % 13) - 6, ((m + 5 * t) % 13) - 6),
            "luma": [p16_luma(k, m + t) for k in range(16)],
            "cbp_chroma": (m + t) % 3, "qp_delta": (t % 3) - 1,
            "chroma_dc": [chroma_dc_levels(c, m + t) for c in range(2)],
            "chroma_ac": [[chroma_ac_levels(c, b, m + t) for b in range(4)]
                          for c in range(2)]}


def bdirect_spec(m, t):
    return {"kind": "bdirect",
            "luma": [p16_luma(k, m + t) for k in range(16)],
            "cbp_chroma": (m + t) % 3, "qp_delta": (t % 3) - 1,
            "chroma_dc": [chroma_dc_levels(c, m + t) for c in range(2)],
            "chroma_ac": [[chroma_ac_levels(c, b, m + t) for b in range(4)]
                          for c in range(2)]}


def b_intra_spec(m, t):
    return {"kind": "i16", "mode": 2, "ac": False, "cbp_chroma": 0,
            "qp_delta": 0, "chroma_mode": 0, "m": m + t}


def b_mixed_frame(t):
    # cycle Bi / direct / L0 / skip / L1 / intra across the 2x2 grid and
    # frames; a Bi MB leads so direct/skip always see both lists
    out = []
    for m in range(4):
        role = (m + 2 * t) % 6
        if m == 0 or role == 0:
            out.append(b16_spec(m, t, 2))
        elif role == 1:
            out.append(bdirect_spec(m, t))
        elif role == 2:
            out.append(b16_spec(m, t, 0))
        elif role == 3:
            out.append({"kind": "bskip"})
        elif role == 4:
            out.append(b16_spec(m, t, 1))
        else:
            out.append(b_intra_spec(m, t))
    return out


def b_subpel_frame(t):
    # Bi MBs sweeping distinct quarter-pel phase PAIRS on the two lists
    out = []
    for m in range(4):
        i = (t - 1) * 4 + m
        s = b16_spec(m, t, 2)
        s["mv0"] = (4 * ((m + t) % 3 - 1) + (i & 3),
                    4 * ((2 * m + t) % 3 - 1) + (i >> 2 & 3))
        s["mv1"] = (4 * ((m + 2 * t) % 3 - 1) + (15 - i & 3),
                    4 * ((m + t) % 3 - 1) + (15 - i >> 2 & 3))
        out.append(s)
    return out


def b_onelist_frame(t):
    # direct MBs whose neighborhoods carry only ONE list: MB0 = L0,
    # MB1 = direct (A has L0 only -> L0-only direct), MB2 = L1,
    # MB3 = direct (A = L1-only, B = L0-only -> both lists)
    return [b16_spec(0, t, 0), bdirect_spec(1, t),
            b16_spec(2, t, 1), bdirect_spec(3, t)]


B_FIXTURES = {
    # every in-subset B MB kind mixed over IDR+P references, with
    # residuals, qp deltas and chroma; direct/skip derive from mixed
    # neighborhoods
    "b_mixed": ("idr_p", 3, b_mixed_frame),
    # bi-prediction quarter-pel phases: both lists interpolate at
    # different fractional positions, then average
    "b_subpel": ("idr_p", 4, b_subpel_frame),
    # one-list direct: derived refIdx covers L0-only / both-lists cases
    "b_onelist": ("idr_p", 2, b_onelist_frame),
    # colZero: colocated P1 has small (|mv| <= 1) and large vectors ->
    # per-4x4 zero overrides fire inside direct/skip MBs of a B whose
    # list1 ref is that P1
    "b_colzero": ("idr_p_p", 2, b_mixed_frame),
    # a single all-skip B picture (one trailing skip run)
    "b_allskip": ("idr_p", 1,
                  lambda t: [{"kind": "bskip"}] * 4),
}

IDR_SPECS_B = [
    {"kind": "i4", "cbp_chroma": 2, "qp_delta": 0, "chroma_mode": 0},
    {"kind": "i4", "cbp_chroma": 1, "qp_delta": 2, "chroma_mode": 1},
    {"kind": "i4", "cbp_chroma": 0, "qp_delta": 0, "chroma_mode": 2},
    {"kind": "i4", "cbp_chroma": 2, "qp_delta": -2, "chroma_mode": 3},
]


def b_p1_specs(t):
    # colZero-relevant P: half the MBs move by <= 1 quarter-pel
    return [{"kind": "p16",
             "mv": ((m + t) % 3 - 1, (2 * m + t) % 3 - 1) if m % 2 == 0
                   else (8 + m, -6 - t),
             "luma": [p16_luma(k, m + t) for k in range(16)],
             "cbp_chroma": 0, "qp_delta": 0,
             "chroma_dc": [[0] * 4] * 2,
             "chroma_ac": [[[0] * 16] * 4] * 2}
            for m in range(4)]


b_lines = []
for name, (shape, n_b, b_spec_fn) in sorted(B_FIXTURES.items()):
    mb_w, mb_h = 2, 2
    nal0, idr_pic = encode_picture(mb_w, mb_h, 0, IDR_SPECS_B)
    nals = [nal0]
    planes = [(bytes(idr_pic.y), bytes(idr_pic.cb), bytes(idr_pic.cr))]
    # references: decode order IDR, P1[, P2]; B list0 = newest, list1 =
    # the one before; colocated = list1's motion (None for the IDR)
    p1_nal, p1_pic, p1_mot = encode_p_picture(idr_pic, mb_w, mb_h, 1, 0,
                                              b_p1_specs(1))
    nals.append(p1_nal)
    planes.append((bytes(p1_pic.y), bytes(p1_pic.cb), bytes(p1_pic.cr)))
    if shape == "idr_p":
        ref0, ref1, col = p1_pic, idr_pic, col_zero_of(None)
        next_frame_num = 2
    else:  # idr_p_p: a second P so the B's colocated picture is P1
        p2_nal, p2_pic, _ = encode_p_picture(p1_pic, mb_w, mb_h, 2, 2,
                                             b_p1_specs(2))
        nals.append(p2_nal)
        planes.append((bytes(p2_pic.y), bytes(p2_pic.cb), bytes(p2_pic.cr)))
        ref0, ref1, col = p2_pic, p1_pic, col_zero_of(p1_mot)
        next_frame_num = 3
    for t in range(1, n_b + 1):
        b_sqd = (t % 2) * 2
        b_nal, b_pic = encode_b_picture(ref0, ref1, col, mb_w, mb_h,
                                        next_frame_num, b_sqd,
                                        b_spec_fn(t))
        nals.append(b_nal)
        planes.append((bytes(b_pic.y), bytes(b_pic.cb), bytes(b_pic.cr)))
        # B pictures are non-references: refs and frame_num stay put
    b_lines.append(" ".join([
        name, str(mb_w), str(mb_h),
        ",".join(n.hex() for n in nals),
        ",".join(p[0].hex() for p in planes),
        ",".join(p[1].hex() for p in planes),
        ",".join(p[2].hex() for p in planes)]))

B_OUT.write_text("\n".join(b_lines) + "\n")
print(f"wrote {len(b_lines)} B-slice fixtures to {B_OUT}")
