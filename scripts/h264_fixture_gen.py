#!/usr/bin/env python3
"""Second-implementation H.264 I_PCM fixtures.

graft.multimodal.H264 (Scala) and this script are INDEPENDENT encodings
of the same public spec subset (ITU-T Rec. H.264: NAL + emulation
prevention, Exp-Golomb, baseline SPS with frame cropping, CAVLC PPS,
IDR slice header, I_PCM macroblocks). This script writes byte-exact
NAL fixtures from the spec text alone — sharing no code with the Scala
implementation — so an encoder/decoder bug pair that cancels out inside
H264.scala (e.g. both sides agreeing on a wrong Exp-Golomb length or a
wrong crop unit) cannot survive the cross-check in H264FixtureInteropSpec:

 - the Scala DECODER must recover pixel-exact planes from these bytes;
 - the Scala ENCODER must reproduce these exact bytes (the subset fixes
   every header field, so two correct implementations are byte-equal).

Frame content is a stated formula (y[i] = (7*i + 3) mod 256 etc.), so
the Scala side derives the expected planes independently.

Output: src/test/resources/h264_ipcm_fixtures.txt, one `name<SP>hex`
per line. Regenerate with: python3 scripts/h264_fixture_gen.py
"""
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / \
    "src/test/resources/h264_ipcm_fixtures.txt"


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

    def align_zero(self):
        while self.nbits != 0:
            self.bit(0)

    def raw(self, b):
        assert self.nbits == 0
        self.bytes_.append(b & 0xFF)

    def trailing(self):
        self.bit(1)
        self.align_zero()

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
    return bytes([(3 << 5) | nal_type]) + ebsp(rbsp)


def sps_nal(width, height):
    mbw = (width + 15) // 16
    mbh = (height + 15) // 16
    crop_r = (mbw * 16 - width) // 2
    crop_b = (mbh * 16 - height) // 2
    w = BitWriter()
    w.u(66, 8)   # profile_idc baseline
    w.u(0, 8)    # constraint flags
    w.u(10, 8)   # level 1.0
    w.ue(0)      # sps id
    w.ue(0)      # log2_max_frame_num_minus4
    w.ue(2)      # pic_order_cnt_type
    w.ue(0)      # max_num_ref_frames
    w.u(0, 1)    # gaps_in_frame_num
    w.ue(mbw - 1)
    w.ue(mbh - 1)
    w.u(1, 1)    # frame_mbs_only
    w.u(0, 1)    # direct_8x8_inference
    if crop_r == 0 and crop_b == 0:
        w.u(0, 1)
    else:
        w.u(1, 1)
        w.ue(0); w.ue(crop_r); w.ue(0); w.ue(crop_b)
    w.u(0, 1)    # vui
    w.trailing()
    return nal(7, w.rbsp())


def pps_nal():
    w = BitWriter()
    w.ue(0); w.ue(0)
    w.u(0, 1)    # CAVLC
    w.u(0, 1)    # bottom_field_poc
    w.ue(0)      # slice groups
    w.ue(0); w.ue(0)
    w.u(0, 1)    # weighted_pred
    w.u(0, 2)    # weighted_bipred
    w.se(0); w.se(0); w.se(0)
    w.u(0, 1); w.u(0, 1); w.u(0, 1)
    w.trailing()
    return nal(8, w.rbsp())


def idr_ipcm_nal(width, height, y, cb, cr):
    """Planes are functions (x, y) -> sample for the TRUE frame size;
    padding to the MB grid replicates the nearest edge sample."""
    mbw = (width + 15) // 16
    mbh = (height + 15) // 16
    w = BitWriter()
    w.ue(0)      # first_mb_in_slice
    w.ue(7)      # slice_type I
    w.ue(0)      # pps id
    w.u(0, 4)    # frame_num
    w.ue(0)      # idr_pic_id
    w.u(0, 1); w.u(0, 1)  # dec_ref_pic_marking
    w.se(0)      # slice_qp_delta
    for my in range(mbh):
        for mx in range(mbw):
            w.ue(25)  # I_PCM
            w.align_zero()
            for py in range(16):
                sy = min(my * 16 + py, height - 1)
                for px in range(16):
                    sx = min(mx * 16 + px, width - 1)
                    w.raw(y(sx, sy))
            for plane in (cb, cr):
                for py in range(8):
                    sy = min(my * 8 + py, height // 2 - 1)
                    for px in range(8):
                        sx = min(mx * 8 + px, width // 2 - 1)
                        w.raw(plane(sx, sy))
    w.trailing()
    return nal(5, w.rbsp())


# ---- the scripted fixtures ------------------------------------------------

# frame A: 18x22 (exercises cropping: 2x2 MBs, crop_right 7, crop_bottom 5),
# formula planes — the Scala spec derives the same planes from the formula
W, H = 18, 22
def ya(x, yy): return (7 * (yy * W + x) + 3) % 256
def cba(x, yy): return (5 * (yy * (W // 2) + x) + 11) % 256
def cra(x, yy): return (3 * (yy * (W // 2) + x) + 29) % 256

# frame B: 16x16 all-zero planes — the emulation-prevention wall
def zero(x, yy): return 0

fx = {
    "sps_18x22": sps_nal(W, H),
    "pps": pps_nal(),
    "idr_18x22_formula": idr_ipcm_nal(W, H, ya, cba, cra),
    "sps_16x16": sps_nal(16, 16),
    "idr_16x16_zero": idr_ipcm_nal(16, 16, zero, zero, zero),
}

OUT.parent.mkdir(parents=True, exist_ok=True)
with OUT.open("w") as f:
    for name in sorted(fx):
        f.write(f"{name} {fx[name].hex()}\n")
print(f"wrote {len(fx)} fixtures to {OUT}")
