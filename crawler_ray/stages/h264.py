"""Intra-only H.264 (ITU-T H.264 / ISO 14496-10) keyframe codec.

The training-data access pattern for video corpora is KEYFRAME SAMPLING
(decode I-frames, skip the inter-frame majority), so this module
implements the intra subset of H.264 from the public spec, pure
stdlib/numpy like the rest of stages/codecs.py:

  * NAL layer: EBSP emulation-prevention escaping both directions,
    SPS/PPS exp-Golomb parsing, IDR slice headers (baseline profile,
    CAVLC, frame_mbs_only, deblocking disabled by the slice header).
  * Macroblock layer: **I_PCM** (mb_type 25 — raw 4:2:0 samples, the
    spec's lossless intra mode every conformant decoder must handle),
    both directions: the encoder emits conformant baseline I_PCM
    streams, the decoder reconstructs them bit-exactly.

Out of scope, refused by NAME at the exact syntax element: CABAC (PPS
entropy_coding_mode_flag), inter slices (P/B, by slice_type),
transform-coded intra macroblocks (Intra_4x4 / Intra_16x16 by
mb_type — their CAVLC residual tables, clause 9.2 Tables 9-5..9-10,
cannot be VALIDATED in this sandbox: no ffmpeg/reference bitstreams
exist to test a transcription against, and an encoder-mirrored table
typo would pass every roundtrip while corrupting real streams; wire a
validated table module to extend), interlace, multi-slice pictures.
The MP4 integration (stages/codecs.py mp4_decode) routes 'avc1'
sample entries here via their avcC configuration record.

RGB <-> YCbCr uses the same full-range JFIF matrix as the JPEG codec
(codecs._rgb_to_ycbcr) — chosen for cross-codec consistency in this
repo, documented here because H.264 carries no colorimetry in this
subset (no VUI).
"""
from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- bits


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def u(self, val: int, bits: int):
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def ue(self, v: int):
        code = v + 1
        nz = code.bit_length() - 1
        self.u(0, nz)
        self.u(code, nz + 1)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self):
        if self.nbits:
            self.u(0, 8 - self.nbits)

    def trailing(self):
        self.u(1, 1)
        self.align_zero()

    def raw_bytes(self, data: bytes):
        assert self.nbits == 0
        self.buf += data

    def bytes(self) -> bytes:
        assert self.nbits == 0, "unaligned RBSP"
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("H.264 RBSP exhausted")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        nz = 0
        while self.u(1) == 0:
            nz += 1
            if nz > 32:
                raise ValueError("bad exp-Golomb code")
        return ((1 << nz) | self.u(nz)) - 1

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def read_aligned(self, n: int) -> bytes:
        assert self.pos & 7 == 0
        byte = self.pos >> 3
        if byte + n > len(self.data):
            raise ValueError("H.264 RBSP exhausted")
        self.pos += 8 * n
        return self.data[byte : byte + n]


def _ebsp(rbsp: bytes) -> bytes:
    """RBSP → EBSP: insert emulation_prevention_three_byte."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unebsp(ebsp: bytes) -> bytes:
    """EBSP → RBSP: strip emulation_prevention_three_byte."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# ---------------------------------------------------------------- SPS/PPS


def _sps_rbsp(w: int, h: int) -> bytes:
    """Baseline-profile SPS for a frame_mbs_only 4:2:0 stream of
    display size (w, h); crop encodes the MB padding."""
    if w % 2 or h % 2:
        # 4:2:0 frame cropping offsets count 2-luma-sample units
        # (CropUnitX/Y = 2), so odd display dims are not expressible
        raise ValueError("H.264 4:2:0 needs even frame dimensions")
    wmb = (w + 15) // 16
    hmb = (h + 15) // 16
    bw = _BitWriter()
    bw.u(66, 8)   # profile_idc: Baseline
    bw.u(0xC0, 8)  # constraint_set0/1
    bw.u(30, 8)   # level_idc 3.0
    bw.ue(0)      # sps_id
    bw.ue(0)      # log2_max_frame_num_minus4 → 4-bit frame_num
    bw.ue(2)      # pic_order_cnt_type 2 (order = decode order)
    bw.ue(0)      # max_num_ref_frames
    bw.u(0, 1)    # gaps_in_frame_num_value_allowed_flag
    bw.ue(wmb - 1)
    bw.ue(hmb - 1)
    bw.u(1, 1)    # frame_mbs_only_flag
    bw.u(1, 1)    # direct_8x8_inference_flag
    crop_r = (wmb * 16 - w) // 2  # CropUnitX = 2 (4:2:0)
    crop_b = (hmb * 16 - h) // 2  # CropUnitY = 2 (frame)
    if crop_r or crop_b:
        bw.u(1, 1)
        bw.ue(0)
        bw.ue(crop_r)
        bw.ue(0)
        bw.ue(crop_b)
    else:
        bw.u(0, 1)
    bw.u(0, 1)    # vui_parameters_present_flag
    bw.trailing()
    return bw.bytes()


def _pps_rbsp(qp: int) -> bytes:
    bw = _BitWriter()
    bw.ue(0)      # pps_id
    bw.ue(0)      # sps_id
    bw.u(0, 1)    # entropy_coding_mode_flag: CAVLC
    bw.u(0, 1)    # bottom_field_pic_order_in_frame_present_flag
    bw.ue(0)      # num_slice_groups_minus1
    bw.ue(0)      # num_ref_idx_l0_default_active_minus1
    bw.ue(0)      # num_ref_idx_l1_default_active_minus1
    bw.u(0, 1)    # weighted_pred_flag
    bw.u(0, 2)    # weighted_bipred_idc
    bw.se(qp - 26)  # pic_init_qp_minus26
    bw.se(0)      # pic_init_qs_minus26
    bw.se(0)      # chroma_qp_index_offset
    bw.u(1, 1)    # deblocking_filter_control_present_flag
    bw.u(0, 1)    # constrained_intra_pred_flag
    bw.u(0, 1)    # redundant_pic_cnt_present_flag
    bw.trailing()
    return bw.bytes()


def parse_sps(rbsp: bytes) -> dict:
    br = _BitReader(rbsp)
    profile = br.u(8)
    br.u(8)  # constraint flags
    level = br.u(8)
    sps = {"profile_idc": profile, "level_idc": level}
    sps["sps_id"] = br.ue()
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135):
        raise NotImplementedError(
            f"H.264 profile_idc {profile} (high-profile SPS extensions) unsupported"
        )
    sps["log2_max_frame_num"] = br.ue() + 4
    poc_type = br.ue()
    sps["pic_order_cnt_type"] = poc_type
    if poc_type == 0:
        sps["log2_max_poc_lsb"] = br.ue() + 4
    elif poc_type == 1:
        br.u(1)
        br.se()
        br.se()
        for _ in range(br.ue()):
            br.se()
    sps["max_num_ref_frames"] = br.ue()
    br.u(1)  # gaps_in_frame_num
    wmb = br.ue() + 1
    hmb = br.ue() + 1
    if wmb > 1024 or hmb > 1024:
        # level 6.2 caps frames at 16,384 px/side (1024 MBs); anything
        # larger is a corrupt SPS — refuse before allocating frame planes
        raise ValueError(f"implausible H.264 SPS dimensions ({wmb}x{hmb} MBs)")
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        raise NotImplementedError("interlaced H.264 (frame_mbs_only_flag=0) unsupported")
    br.u(1)  # direct_8x8_inference
    crop = [0, 0, 0, 0]
    if br.u(1):
        crop = [br.ue(), br.ue(), br.ue(), br.ue()]  # l, r, t, b
    sps.update(
        wmb=wmb, hmb=hmb,
        width=wmb * 16 - 2 * (crop[0] + crop[1]),
        height=hmb * 16 - 2 * (crop[2] + crop[3]),
        crop=crop,
    )
    return sps


def parse_pps(rbsp: bytes) -> dict:
    br = _BitReader(rbsp)
    pps = {"pps_id": br.ue(), "sps_id": br.ue()}
    if br.u(1):
        raise NotImplementedError("H.264 CABAC entropy coding unsupported (CAVLC only)")
    pps["bottom_field_poc"] = br.u(1)
    if br.ue() != 0:
        raise NotImplementedError("H.264 slice groups (FMO) unsupported")
    br.ue()  # num_ref_idx_l0
    br.ue()  # num_ref_idx_l1
    br.u(1)  # weighted_pred
    br.u(2)  # weighted_bipred
    pps["pic_init_qp"] = 26 + br.se()
    br.se()  # qs
    pps["chroma_qp_index_offset"] = br.se()
    pps["deblocking_control_present"] = br.u(1)
    br.u(1)  # constrained_intra_pred
    br.u(1)  # redundant_pic_cnt_present
    return pps


# ------------------------------------------------------------ color / pad


def _to_420(frame_rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RGB frame → MB-padded (Y, Cb, Cr) uint8 planes (4:2:0, edge
    replication to 16-multiples; JFIF full-range matrix — see module
    docstring)."""
    from .codecs import _rgb_to_ycbcr

    h, w = frame_rgb.shape[:2]
    ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
    padded = np.pad(frame_rgb, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded.astype(np.float64))
    y = np.clip(np.rint(ycc[:, :, 0]), 0, 255).astype(np.uint8)
    sub = ycc.reshape(ph // 2, 2, pw // 2, 2, 3).mean(axis=(1, 3))
    cb = np.clip(np.rint(sub[:, :, 1]), 0, 255).astype(np.uint8)
    cr = np.clip(np.rint(sub[:, :, 2]), 0, 255).astype(np.uint8)
    return y, cb, cr


def _from_420(y: np.ndarray, cb: np.ndarray, cr: np.ndarray, w: int, h: int) -> np.ndarray:
    from .codecs import _ycbcr_to_rgb

    cb_full = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
    cr_full = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
    ycc = np.stack(
        [y.astype(np.float64), cb_full.astype(np.float64), cr_full.astype(np.float64)],
        axis=-1,
    )
    return _ycbcr_to_rgb(ycc)[:h, :w]


# ---------------------------------------------------------------- encoder


def _slice_header(bw: _BitWriter, qp_delta: int = 0):
    bw.ue(0)   # first_mb_in_slice
    bw.ue(7)   # slice_type: I (all slices in picture)
    bw.ue(0)   # pps_id
    bw.u(0, 4)  # frame_num (log2_max_frame_num = 4)
    bw.ue(0)   # idr_pic_id
    bw.u(0, 1)  # no_output_of_prior_pics_flag
    bw.u(0, 1)  # long_term_reference_flag
    bw.se(qp_delta)
    bw.ue(1)   # disable_deblocking_filter_idc: OFF


def _encode_frame_ipcm(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> bytes:
    """One IDR slice, every macroblock I_PCM — the spec's raw mode;
    lossless in YCbCr and bit-exact through the decoder."""
    hmb, wmb = y.shape[0] // 16, y.shape[1] // 16
    bw = _BitWriter()
    _slice_header(bw)
    for my in range(hmb):
        for mx in range(wmb):
            bw.ue(25)  # mb_type I_PCM
            bw.align_zero()  # pcm_alignment_zero_bit
            bw.raw_bytes(y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].tobytes())
            bw.raw_bytes(cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
            bw.raw_bytes(cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
    bw.trailing()
    return bw.bytes()


def h264_encode(frames: np.ndarray, qp: int = 26):
    """(n, h, w, 3) uint8 RGB → (sps_nal, pps_nal, [idr_nal, ...]) —
    complete NAL units (header byte + EBSP), every macroblock I_PCM
    (lossless in 4:2:0 YCbCr; ``qp`` only lands in the PPS, I_PCM
    carries no quantized coefficients)."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("h264_encode expects (n, h, w, 3) uint8")
    _n, h, w = frames.shape[:3]
    sps_nal = b"\x67" + _ebsp(_sps_rbsp(w, h))
    pps_nal = b"\x68" + _ebsp(_pps_rbsp(qp))
    aus = []
    for f in frames:
        y, cb, cr = _to_420(f)
        rbsp = _encode_frame_ipcm(y, cb, cr)
        aus.append(b"\x65" + _ebsp(rbsp))  # nal_ref_idc=3, type 5 (IDR)
    return sps_nal, pps_nal, aus


# ---------------------------------------------------------------- decoder


def _decode_mb_ipcm(br: _BitReader, y, cb, cr, mx: int, my: int):
    br.align()
    ly = np.frombuffer(br.read_aligned(256), dtype=np.uint8).reshape(16, 16)
    lcb = np.frombuffer(br.read_aligned(64), dtype=np.uint8).reshape(8, 8)
    lcr = np.frombuffer(br.read_aligned(64), dtype=np.uint8).reshape(8, 8)
    y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = ly
    cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = lcb
    cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = lcr


def h264_decode_frame(idr_nal: bytes, sps: dict, pps: dict) -> np.ndarray:
    """One IDR/I NAL unit → (h, w, 3) uint8 RGB."""
    if (idr_nal[0] & 0x1F) not in (1, 5):
        raise ValueError("not a slice NAL unit")
    br = _BitReader(_unebsp(idr_nal[1:]))
    if br.ue() != 0:
        raise NotImplementedError("multi-slice H.264 pictures unsupported")
    slice_type = br.ue()
    if slice_type % 5 != 2:  # I slice (2 or 7)
        raise NotImplementedError(
            f"H.264 slice_type {slice_type} is inter-predicted — intra-only decoder"
        )
    br.ue()  # pps_id
    br.u(sps["log2_max_frame_num"])  # frame_num
    if (idr_nal[0] & 0x1F) == 5:
        br.ue()  # idr_pic_id
    if sps["pic_order_cnt_type"] == 0:
        br.u(sps["log2_max_poc_lsb"])
        if pps["bottom_field_poc"]:
            br.se()
    if (idr_nal[0] & 0x1F) == 5:
        br.u(1)  # no_output_of_prior_pics
        br.u(1)  # long_term_reference
    elif (idr_nal[0] >> 5) & 3:  # nal_ref_idc: adaptive marking flag
        if br.u(1):
            raise NotImplementedError("adaptive ref pic marking unsupported")
    qp = pps["pic_init_qp"] + br.se()
    if pps["deblocking_control_present"]:
        if br.ue() != 1:  # disable_deblocking_filter_idc: deblocking on
            # alpha/beta offsets follow in the header.  No filtering
            # ever applies to the pictures this decoder can produce:
            # every decodable MB is I_PCM, whose QpY is 0 (clause
            # 8.7.2), so the edge-average QP index is <= 12 even at
            # the maximal +6 slice offsets — below 16, where the
            # spec's alpha table is 0 and filterSamplesFlag is never
            # set.  Consuming the offsets and emitting unfiltered
            # samples is therefore EXACT, not an approximation.
            br.se()
            br.se()
    del qp  # I_PCM carries no coefficients; kept for the header walk
    wmb, hmb = sps["wmb"], sps["hmb"]
    y = np.zeros((hmb * 16, wmb * 16), dtype=np.uint8)
    cb = np.zeros((hmb * 8, wmb * 8), dtype=np.uint8)
    cr = np.zeros((hmb * 8, wmb * 8), dtype=np.uint8)
    for my in range(hmb):
        for mx in range(wmb):
            mb_type = br.ue()
            if mb_type == 25:  # I_PCM
                _decode_mb_ipcm(br, y, cb, cr, mx, my)
            elif mb_type <= 24:
                raise NotImplementedError(
                    f"H.264 transform-coded intra mb_type {mb_type} "
                    "(Intra_4x4/Intra_16x16) needs the clause-9.2 CAVLC "
                    "residual tables — unvalidatable without reference "
                    "bitstreams in this sandbox; I_PCM decodes"
                )
            else:
                raise ValueError(f"bad I-slice mb_type {mb_type}")
    if sps["crop"][0] or sps["crop"][2]:
        raise NotImplementedError("H.264 left/top frame cropping unsupported")
    return _from_420(y, cb, cr, sps["width"], sps["height"])


def h264_decode(nals: list[bytes]) -> np.ndarray:
    """A sequence of complete NAL units (SPS/PPS/slices, any order with
    parameter sets first) → (n, h, w, 3) uint8 frames."""
    sps = pps = None
    frames = []
    for nal in nals:
        t = nal[0] & 0x1F
        if t == 7:
            sps = parse_sps(_unebsp(nal[1:]))
        elif t == 8:
            pps = parse_pps(_unebsp(nal[1:]))
        elif t in (1, 5):
            if sps is None or pps is None:
                raise ValueError("H.264 slice before SPS/PPS")
            frames.append(h264_decode_frame(nal, sps, pps))
        # SEI/AUD/filler NALs are skipped
    if not frames:
        raise ValueError("H.264 stream holds no decodable slices")
    return np.stack(frames)
