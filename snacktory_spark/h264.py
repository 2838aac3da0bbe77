"""H.264/AVC Baseline intra codec — I_PCM macroblocks, CONFORMANT.

Closes the video-codec gap a tier ABOVE the audio codecs' honesty
contract: unlike the MPEG/AAC tiers (real machinery, substituted code
tables), this module needs NO substitutions, because it emits only
I_PCM macroblocks — H.264's raw-sample macroblock type (ISO/IEC
14496-10 §7.3.5, mb_type 25 in I slices), which carries pixels
verbatim with no entropy coding, no prediction and no transform. Every
bit written here follows the public spec body:

- Annex-B byte-stream framing: start codes + NAL headers + the
  emulation-prevention escape (00 00 0x -> 00 00 03 0x) in BOTH
  directions — mandatory here, since raw PCM bytes routinely contain
  00 00 runs;
- Exp-Golomb ue(v)/se(v) entropy for every header field (closed-form,
  §9.1);
- SPS (Baseline profile_idc 66, frame_mbs_only, pic_order_cnt_type 2,
  frame cropping for non-multiple-of-16 sizes), PPS (CAVLC mode,
  single slice group), IDR slice headers (frame_num 0,
  dec_ref_pic_marking for IDR, slice_qp_delta), and the macroblock
  layer: mb_type ue = 25, pcm_alignment_zero_bit, then 256 luma +
  2x64 chroma samples per macroblock (4:2:0).

Consequence: encode→decode round-trips BIT-EXACTLY (I_PCM is
lossless), and the output is a conformant stream a reference H.264
decoder would reconstruct identically — so no foreign-stream guard is
needed on the encode side. The decoder is an honest PARTIAL decoder:
it fully decodes the I_PCM Baseline subset and raises ImageError for
streams using predicted/transform-coded macroblocks (CAVLC/CABAC
residual decode is out of scope; the scan tier in av.py handles
arbitrary real streams without decoding).

Input contract: grayscale frames (h, w) uint8; chroma planes are
written as the fixed neutral value 128 and SKIPPED on decode (the
luma-only grayscale contract — a foreign I_PCM stream's real chroma is
stepped over, not reconstructed). Width/height must be even (the
spec's 4:2:0 frame-cropping units are 2-pixel steps).

Hostile-input contract (CLAUDE.md): public decode raises ImageError
only; caps fire before allocation.

Reference parity note: the reference routes video URLs without
decoding (HtmlFetcher.java isVideoLink); this module serves SURVEY
§2's beyond-reference multimodal operators.
"""

from __future__ import annotations

import numpy as np

from .imaging import ImageError
from .mpeg import _BitReader, _BitWriter

MAX_DIM = 1 << 14                 # 16384px per side cap
MAX_FRAMES_PCM = 1 << 12          # frame-count cap (PCM is ~1.5 B/px)

# ISO/IEC 14496-10 Annex A Table A-1: (level_idc, MaxFS in macroblocks).
# Levels sharing a MaxFS are collapsed to the lowest level_idc with that
# capacity. Table A-1 also bounds each picture DIMENSION at
# sqrt(8 * MaxFS) MBs. ADVICE r7: the encoder must declare a level the
# frame actually fits, or the conformance claim fails for >720p frames.
_LEVEL_MAX_FS = (
    (10, 99), (11, 396), (21, 792), (22, 1620), (31, 3600), (32, 5120),
    (40, 8192), (42, 8704), (50, 22080), (51, 36864), (60, 139264),
)


def _level_for(mb_w: int, mb_h: int) -> int:
    """Smallest level_idc whose Table A-1 frame-size (MaxFS) and
    per-dimension (sqrt(8*MaxFS)) limits admit an (mb_w x mb_h)
    picture; ImageError when even level 6 cannot — for these SPATIAL
    limits the encoder refuses rather than misdeclare. Scope (ADVICE
    r8): Table A-1's rate-dependent bounds (MaxMBPS, MaxBR/MaxCPB) are
    NOT factored in — the bitstream carries no VUI timing_info, so no
    frame rate is declared and the ~3072-bit/MB I_PCM payload of a
    multi-frame stream can exceed the chosen level's bitrate bound
    under a decoder-assumed frame rate; callers needing rate
    conformance must pick the level from their own timing."""
    fs = mb_w * mb_h
    for level_idc, max_fs in _LEVEL_MAX_FS:
        dim_cap = int((8 * max_fs) ** 0.5)
        if fs <= max_fs and mb_w <= dim_cap and mb_h <= dim_cap:
            return level_idc
    raise ImageError("frame exceeds H.264 level 6 limits")
MAX_TOTAL_PIXELS_PCM = 1 << 26    # aggregate decode cap, checked
# BEFORE each frame's allocation (review finding r7: the per-side and
# per-count caps alone admit a multi-GB total; this is the
# MAX_VIDEO_PIXELS analog for the frame-list decoders)


# --- Exp-Golomb (spec §9.1, closed-form) ------------------------------------

def _ue_write(w: _BitWriter, v: int):
    if v < 0:
        raise ImageError("ue(v) requires a non-negative value")
    n = (v + 1).bit_length() - 1
    w.write(0, n)
    w.write(v + 1, n + 1)


def _ue_read(br: _BitReader) -> int:
    n = 0
    while br.read(1) == 0:
        n += 1
        if n > 32:
            raise ImageError("Exp-Golomb prefix runaway")
    return ((1 << n) | br.read(n)) - 1 if n else 0


def _se_write(w: _BitWriter, v: int):
    _ue_write(w, 2 * v - 1 if v > 0 else -2 * v)


def _se_read(br: _BitReader) -> int:
    k = _ue_read(br)
    return (k + 1) // 2 if k % 2 else -(k // 2)


# --- RBSP <-> EBSP (emulation prevention, spec §7.4.1.1) --------------------

def _rbsp_to_ebsp(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _ebsp_to_rbsp(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            if i + 1 < n and ebsp[i + 1] > 3:
                raise ImageError("invalid emulation-prevention escape")
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _trailing(w: _BitWriter):
    """rbsp_trailing_bits: stop bit + byte-align zeros."""
    w.write(1, 1)
    if w.nbits:
        w.write(0, 8 - w.nbits)


def _nal(ref_idc: int, typ: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" \
        + bytes([(ref_idc << 5) | typ]) + _rbsp_to_ebsp(rbsp)


# --- encoder ----------------------------------------------------------------

def encode_h264_ipcm(frames: list[np.ndarray]) -> bytes:
    """Grayscale frames (h, w) uint8 → a conformant Baseline Annex-B
    stream of I_PCM-only IDR pictures (lossless). See module docstring
    for the syntax inventory."""
    if not frames:
        raise ImageError("no frames")
    if len(frames) > MAX_FRAMES_PCM:
        raise ImageError("frame-count cap exceeded")
    f0 = np.asarray(frames[0])
    if f0.ndim != 2:
        raise ImageError("frames must be 2-D grayscale")
    h, w = f0.shape
    if not (1 <= w <= MAX_DIM and 1 <= h <= MAX_DIM):
        raise ImageError("frame dimensions out of range")
    if w % 2 or h % 2:
        raise ImageError("width/height must be even (4:2:0 crop units)")
    mb_w = (w + 15) // 16
    mb_h = (h + 15) // 16

    # SPS
    s = _BitWriter()
    s.write(66, 8)                      # profile_idc: Baseline
    s.write(0, 8)                       # constraint flags + reserved
    s.write(_level_for(mb_w, mb_h), 8)  # level_idc from Table A-1
    _ue_write(s, 0)                     # seq_parameter_set_id
    _ue_write(s, 0)                     # log2_max_frame_num_minus4
    _ue_write(s, 2)                     # pic_order_cnt_type
    _ue_write(s, 0)                     # max_num_ref_frames
    s.write(0, 1)                       # gaps_in_frame_num_allowed
    _ue_write(s, mb_w - 1)              # pic_width_in_mbs_minus1
    _ue_write(s, mb_h - 1)              # pic_height_in_map_units_minus1
    s.write(1, 1)                       # frame_mbs_only_flag
    s.write(1, 1)                       # direct_8x8_inference_flag
    crop = (w % 16 != 0) or (h % 16 != 0)
    s.write(1 if crop else 0, 1)        # frame_cropping_flag
    if crop:
        _ue_write(s, 0)                 # crop_left
        _ue_write(s, (mb_w * 16 - w) // 2)   # crop_right (x unit = 2)
        _ue_write(s, 0)                 # crop_top
        _ue_write(s, (mb_h * 16 - h) // 2)   # crop_bottom (y unit = 2)
    s.write(0, 1)                       # vui_parameters_present_flag
    _trailing(s)
    out = bytearray(_nal(3, 7, bytes(s.buf)))

    # PPS
    p = _BitWriter()
    _ue_write(p, 0)                     # pic_parameter_set_id
    _ue_write(p, 0)                     # seq_parameter_set_id
    p.write(0, 1)                       # entropy_coding_mode: CAVLC
    p.write(0, 1)                       # bottom_field_poc_present
    _ue_write(p, 0)                     # num_slice_groups_minus1
    _ue_write(p, 0)                     # num_ref_idx_l0_default
    _ue_write(p, 0)                     # num_ref_idx_l1_default
    p.write(0, 1)                       # weighted_pred_flag
    p.write(0, 2)                       # weighted_bipred_idc
    _se_write(p, 0)                     # pic_init_qp_minus26
    _se_write(p, 0)                     # pic_init_qs_minus26
    _se_write(p, 0)                     # chroma_qp_index_offset
    p.write(0, 1)                       # deblocking_control_present
    p.write(0, 1)                       # constrained_intra_pred
    p.write(0, 1)                       # redundant_pic_cnt_present
    _trailing(p)
    out += _nal(3, 8, bytes(p.buf))

    for fi, frame in enumerate(frames):
        fr = np.asarray(frame)
        if fr.shape != (h, w) or fr.dtype != np.uint8:
            raise ImageError("all frames must be uint8 with one shape")
        # pad to whole macroblocks by edge replication (cropped away)
        pad = np.pad(fr, ((0, mb_h * 16 - h), (0, mb_w * 16 - w)),
                     mode="edge")
        sl = _BitWriter()
        _ue_write(sl, 0)                # first_mb_in_slice
        _ue_write(sl, 7)                # slice_type: I (all slices I)
        _ue_write(sl, 0)                # pic_parameter_set_id
        sl.write(0, 4)                  # frame_num (log2_max=4, IDR->0)
        _ue_write(sl, fi % 2)           # idr_pic_id (alternates)
        sl.write(0, 1)                  # no_output_of_prior_pics_flag
        sl.write(0, 1)                  # long_term_reference_flag
        _se_write(sl, 0)                # slice_qp_delta
        for my in range(mb_h):
            for mx in range(mb_w):
                _ue_write(sl, 25)       # mb_type: I_PCM
                if sl.nbits:            # pcm_alignment_zero_bit(s)
                    sl.write(0, 8 - sl.nbits)
                block = pad[my * 16:(my + 1) * 16,
                            mx * 16:(mx + 1) * 16]
                sl.buf.extend(block.tobytes())   # 256 luma samples
                sl.buf.extend(b"\x80" * 128)     # neutral Cb + Cr
        _trailing(sl)
        out += _nal(3, 5, bytes(sl.buf))
    return bytes(out)


# --- decoder ----------------------------------------------------------------

def _parse_sps(rbsp: bytes) -> dict:
    br = _BitReader(rbsp, 0)
    profile = br.read(8)
    br.read(8)                          # constraint flags
    level = br.read(8)
    _ue_read(br)                        # seq_parameter_set_id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise ImageError("high-profile SPS extensions not supported")
    log2_mfn = _ue_read(br) + 4
    poc_type = _ue_read(br)
    if poc_type != 2:
        # types 0/1 add slice-header POC fields this narrow decoder
        # does not carry parsing for — honest refusal, not a mis-parse
        raise ImageError(f"pic_order_cnt_type {poc_type} not supported")
    _ue_read(br)                        # max_num_ref_frames
    br.read(1)
    mb_w = _ue_read(br) + 1
    mb_h = _ue_read(br) + 1
    if mb_w * 16 > MAX_DIM or mb_h * 16 > MAX_DIM:
        raise ImageError("SPS dimensions out of range")
    if br.read(1) == 0:                 # frame_mbs_only_flag
        raise ImageError("field/MBAFF coding not supported")
    br.read(1)                          # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if br.read(1):                      # frame_cropping_flag
        crop_l, crop_r = _ue_read(br), _ue_read(br)
        crop_t, crop_b = _ue_read(br), _ue_read(br)
    w = mb_w * 16 - 2 * (crop_l + crop_r)
    h = mb_h * 16 - 2 * (crop_t + crop_b)
    if w <= 0 or h <= 0:
        raise ImageError("SPS cropping larger than the frame")
    return {"profile": profile, "level": level, "mb_w": mb_w,
            "mb_h": mb_h, "w": w, "h": h, "crop_l": 2 * crop_l,
            "crop_t": 2 * crop_t, "log2_mfn": log2_mfn,
            "poc_type": poc_type}


def decode_h264_ipcm(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode an I_PCM Baseline Annex-B stream → (width, height,
    [luma (h, w) uint8 per IDR picture]), bit-exact. Streams using
    predicted / transform-coded macroblocks raise (honest partial
    decoder — see module docstring)."""
    try:
        return _decode_h264_ipcm(data)
    except ImageError:
        raise
    except (ValueError, IndexError, OverflowError, MemoryError) as e:
        raise ImageError(f"malformed H.264: {type(e).__name__}: {e}") \
            from None


def _decode_h264_ipcm(data: bytes):
    from .av import iter_h264_nals
    sps = None
    frames: list[np.ndarray] = []
    for _off, _ref, typ, payload in iter_h264_nals(data):
        if typ == 7:
            got = _parse_sps(_ebsp_to_rbsp(bytes(payload)))
            if sps is not None and got != sps:
                raise ImageError("mid-stream SPS change")
            sps = got
        elif typ == 8:
            br = _BitReader(_ebsp_to_rbsp(bytes(payload)), 0)
            _ue_read(br)                # pic_parameter_set_id
            _ue_read(br)                # seq_parameter_set_id
            if br.read(1):
                raise ImageError("CABAC streams not supported (I_PCM "
                                 "decoder)")
        elif typ in (1, 5):
            if sps is None:
                raise ImageError("slice before SPS")
            if typ == 1:
                raise ImageError("non-IDR slices not supported (I_PCM "
                                 "decoder)")
            if len(frames) >= MAX_FRAMES_PCM:
                raise ImageError("frame-count cap exceeded")
            if (len(frames) + 1) * sps["mb_w"] * sps["mb_h"] * 256 \
                    > MAX_TOTAL_PIXELS_PCM:
                raise ImageError("I_PCM output exceeds total pixel cap")
            rbsp = _ebsp_to_rbsp(bytes(payload))
            br = _BitReader(rbsp, 0)
            if _ue_read(br) != 0:
                raise ImageError("multi-slice pictures not supported")
            st = _ue_read(br)
            if st not in (2, 7):
                raise ImageError("only I slices carry I_PCM pictures")
            _ue_read(br)                # pic_parameter_set_id
            br.read(sps["log2_mfn"])    # frame_num
            _ue_read(br)                # idr_pic_id
            br.read(1)                  # no_output_of_prior_pics
            br.read(1)                  # long_term_reference_flag
            _se_read(br)                # slice_qp_delta
            mb_w, mb_h = sps["mb_w"], sps["mb_h"]
            pic = np.empty((mb_h * 16, mb_w * 16), dtype=np.uint8)
            for my in range(mb_h):
                for mx in range(mb_w):
                    if _ue_read(br) != 25:
                        raise ImageError(
                            "non-I_PCM macroblock: predicted/transform"
                            "-coded streams need a full CAVLC decoder "
                            "(out of scope — see module docstring)")
                    if br.pos % 8:      # pcm_alignment_zero_bit(s)
                        if br.read(8 - br.pos % 8):
                            raise ImageError("nonzero PCM alignment")
                    byte0 = br.pos // 8
                    if byte0 + 384 > len(rbsp):
                        raise ImageError("truncated I_PCM macroblock")
                    blk = np.frombuffer(rbsp, np.uint8, 256, byte0)
                    pic[my * 16:(my + 1) * 16,
                        mx * 16:(mx + 1) * 16] = blk.reshape(16, 16)
                    br.pos = (byte0 + 384) * 8   # skip chroma
            frames.append(pic[sps["crop_t"]:sps["crop_t"] + sps["h"],
                              sps["crop_l"]:sps["crop_l"] + sps["w"]]
                          .copy())
    if sps is None or not frames:
        raise ImageError("no decodable H.264 pictures")
    return sps["w"], sps["h"], frames
