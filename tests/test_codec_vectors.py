"""Externally-assembled known-good codec test vectors.

Round 7 closes the one self-referential verification loop left in the
repo (VERDICT r6 "What's missing" #1): until now the PNG/JPEG/GIF/FLAC
codecs were verified by round-trip + spec-constant pins + fuzzing, and
an encoder/decoder pair sharing one wrong assumption (a transposed
zigzag, an LZW width off-by-one, an LPC sign) round-trips cleanly.

Every byte string below was hand-assembled DIRECTLY from the public
spec (PNG/RFC 2083 chunk+filter layout, GIF89a Appendix F LZW, ITU-T
T.81 canonical Huffman + IDCT, FLAC/RFC 9639 frame+Rice coding) by an
independent generator that shares NO code with melodist_spark — the
repo's encoders are never invoked here. The expected pixels/samples
are fixed literals (for the JPEG AC vector, computed from the spec's
direct IDCT formula). A decoder bug that the encoder mirrors can NOT
pass these tests.

Coverage per the r6 brief: all five PNG filter types + palette/tRNS,
a GIF LZW code-width increase and an interlaced GIF89a with an
extension block, a 4:2:0-subsampled JPEG and a single-AC-coefficient
JPEG (pins zigzag orientation + IDCT scaling + sign convention), and
FLAC CONSTANT/VERBATIM/FIXED subframes incl. stereo left/side
decorrelation with header CRC-8 and frame CRC-16 enforced.
"""

import numpy as np
import pytest

from melodist_spark.pipeline.flac import decode_flac
from melodist_spark.pipeline.jpeg import decode_jpeg
from melodist_spark.pipeline.multimodal import decode_gif, decode_png

# -- PNG ------------------------------------------------------------------

# 4x3 RGB8, per-row filters None(0)/Sub(1)/Up(2)/Average(3)
PNG_RGB = bytes.fromhex(
    "89504e470d0a1a0a0000000d4948445200000003000000040802000000c44f12"
    "50000000334944415478da012800d7ff00afc419f643d397675c01b98e178fcb"
    "57e2811a02ee582d6826198226c303e487e4a000e660e7fd75991323224810b9"
    "0000000049454e44ae426082"
)
PNG_RGB_PIXELS = [
    [[175, 196, 25], [246, 67, 211], [151, 103, 92]],
    [[185, 142, 23], [72, 89, 110], [42, 218, 136]],
    [[167, 230, 68], [176, 127, 135], [172, 0, 75]],
    [[55, 250, 6], [19, 188, 44], [191, 69, 56]],
]

# 3x4 grayscale with two Paeth(4) rows
PNG_GRAY = bytes.fromhex(
    "89504e470d0a1a0a0000000d4948445200000004000000030800000000919ff1"
    "1a000000174944415478da6398b17d6b014bf221e64d2cb6135959002fb3052e"
    "9ae933920000000049454e44ae426082"
)
PNG_GRAY_PIXELS = [[152, 183, 181, 112], [251, 189, 192, 34], [56, 201, 206, 38]]

# 2x3 paletted (color type 3) + tRNS alpha (entries 0,1 -> 10,200)
PNG_PAL = bytes.fromhex(
    "89504e470d0a1a0a0000000d4948445200000003000000020803000000aaaa96"
    "2800000009504c5445ff000000ff000000ff2d4acd8a0000000274524e530ac8"
    "19c36f30000000104944415478da636060646264faff1f00031f0205aa56bd02"
    "0000000049454e44ae426082"
)
PNG_PAL_PIXELS = [
    [[255, 0, 0, 10], [0, 255, 0, 200], [0, 0, 255, 255]],
    [[0, 0, 255, 255], [0, 255, 0, 200], [255, 0, 0, 10]],
]


def test_png_external_vector_rgb_filters():
    got = decode_png(PNG_RGB)
    assert got.shape == (4, 3, 3)
    assert (got == np.array(PNG_RGB_PIXELS, dtype=np.uint8)).all()


def test_png_external_vector_gray_paeth():
    got = decode_png(PNG_GRAY)
    assert got.shape == (3, 4)
    assert (got == np.array(PNG_GRAY_PIXELS, dtype=np.uint8)).all()


def test_png_external_vector_palette_trns():
    got = decode_png(PNG_PAL)
    assert got.shape == (2, 3, 4)
    assert (got == np.array(PNG_PAL_PIXELS, dtype=np.uint8)).all()


# -- GIF ------------------------------------------------------------------

GIF_PALETTE = np.array(
    [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]], dtype=np.uint8
)

# 4x5 GIF87a, non-interlaced; the run structure forces an LZW
# code-width increase (min code size 2: width 3 -> 4 at next_code 8)
GIF_PLAIN = bytes.fromhex(
    "47494638376104000500810000ff000000ff000000ffffff002c000000000400"
    "05000002080412862233ec4e2b003b"
)
GIF_PLAIN_IDX = [
    [0, 0, 1, 1],
    [0, 0, 1, 1],
    [2, 2, 3, 3],
    [2, 2, 3, 3],
    [0, 1, 2, 3],
]

# 4x10 GIF89a, INTERLACED (h=10 exercises all four passes:
# rows 0,8 / 4 / 2,6 / 1,3,5,7,9) with a graphic-control extension
GIF_INTERLACED = bytes.fromhex(
    "47494638396104000a00810000ff000000ff000000ffffff0021f90400050000"
    "002c0000000004000a0040020fcc702610ac2082990cd4d50c12ab00003b"
)
GIF_INTERLACED_IDX = [
    [1, 3, 0, 3],
    [1, 3, 1, 0],
    [1, 3, 2, 0],
    [1, 0, 0, 1],
    [0, 1, 0, 1],
    [0, 2, 0, 1],
    [2, 1, 1, 3],
    [0, 1, 3, 0],
    [0, 1, 3, 2],
    [3, 2, 2, 0],
]


def test_gif_external_vector_code_width_growth():
    got = decode_gif(GIF_PLAIN)
    exp = GIF_PALETTE[np.array(GIF_PLAIN_IDX, dtype=np.uint8)]
    assert got.shape == exp.shape and (got == exp).all()


def test_gif_external_vector_interlaced():
    got = decode_gif(GIF_INTERLACED)
    exp = GIF_PALETTE[np.array(GIF_INTERLACED_IDX, dtype=np.uint8)]
    assert got.shape == exp.shape and (got == exp).all()


# -- JPEG -----------------------------------------------------------------

# 8x8 grayscale flat 130: DC-only block (S00 = 8*(130-128) = 16 with a
# unit quant table), custom minimal canonical Huffman tables. A flat
# DC-only block must decode EXACTLY (IDCT of a constant is exact).
JPEG_FLAT_GRAY = bytes.fromhex(
    "ffd8ffdb00430001010101010101010101010101010101010101010101010101"
    "0101010101010101010101010101010101010101010101010101010101010101"
    "01010101010101ffc0000b080008000801011100ffc4002e0000000800000000"
    "0000000000000000000001020304050607100002000000000000000000000000"
    "00000006ffda0008010100003f00b03fffd9"
)

# 16x16 color, 4:2:0 subsampling, flat RGB(140,140,140): Y=140,
# Cb=Cr=128 -> chroma diffs are zero; exact decode expected.
JPEG_FLAT_420 = bytes.fromhex(
    "ffd8ffdb00430001010101010101010101010101010101010101010101010101"
    "0101010101010101010101010101010101010101010101010101010101010101"
    "01010101010101ffc00011080010001003012200021100031100ffc4002e0000"
    "0008000000000000000000000000000001020304050607100002000000000000"
    "00000000000000000006ffda000c03010002000300003f00f800000007ffd9"
)

# 8x8 grayscale, DC=0 + single AC coefficient: zigzag index 1 (raster
# (v=0,u=1)) = 50. Decodes to a horizontal cosine ramp — pins the
# zigzag orientation, IDCT scaling, and magnitude-bits sign convention
# all at once. Expected row from the direct T.81 IDCT formula.
JPEG_AC_RAMP = bytes.fromhex(
    "ffd8ffdb00430001010101010101010101010101010101010101010101010101"
    "0101010101010101010101010101010101010101010101010101010101010101"
    "01010101010101ffc0000b080008000801011100ffc4002e0000000800000000"
    "0000000000000000000001020304050607100002000000000000000000000000"
    "00000006ffda0008010100003f000e47ffd9"
)
JPEG_AC_RAMP_ROW = [137, 135, 133, 130, 126, 123, 121, 119]


def test_jpeg_external_vector_flat_gray():
    got = decode_jpeg(JPEG_FLAT_GRAY)
    assert got.shape == (8, 8)
    assert (got == 130).all()


def test_jpeg_external_vector_flat_420_color():
    got = decode_jpeg(JPEG_FLAT_420)
    assert got.shape == (16, 16, 3)
    assert (got == 140).all()


def test_jpeg_external_vector_single_ac_ramp():
    got = decode_jpeg(JPEG_AC_RAMP)
    assert got.shape == (8, 8)
    exp = np.tile(np.array(JPEG_AC_RAMP_ROW, dtype=np.int64), (8, 1))
    # every row identical (v=0), horizontal cosine ramp; allow +/-1 for
    # float rounding (the spec's IDCT accuracy clause allows more)
    assert np.abs(got.astype(np.int64) - exp).max() <= 1


def test_jpeg_unsupported_sampling_ratio_rejected():
    """Round-7 guard (ADVICE r6): a legal-but-non-integer sampling
    combo (luma 3x1, chroma 2x1) must fail at SOF parse with a clear
    error, not deep in the scan loop."""
    body = bytes([8]) + (8).to_bytes(2, "big") + (24).to_bytes(2, "big")
    body += bytes([2, 1, 0x31, 0, 2, 0x21, 0])
    sof = b"\xff\xc0" + (len(body) + 2).to_bytes(2, "big") + body
    blob = b"\xff\xd8" + sof + b"\xff\xd9"
    with pytest.raises(ValueError, match="sampling ratio"):
        decode_jpeg(blob)


# -- FLAC -----------------------------------------------------------------

# mono 16-bit @8 kHz, two 8-sample frames: CONSTANT(-300) then FIXED
# order-2 Rice-coded; frame-number UTF-8 coding, header CRC-8 and
# frame CRC-16 all hand-computed from the spec polynomials.
FLAC_MONO = bytes.fromhex(
    "664c6143800000220008000800000000000001f400f000000010000000000000"
    "00000000000000000000fff860080007ae00fed4cbbbfff860080107bb14000a"
    "000c009995d45005be"
)
FLAC_MONO_SAMPLES = [-300] * 8 + [10, 12, 17, 25, 30, 31, 29, 20]

# stereo left/side (channel code 8) @44.1 kHz: left VERBATIM at 16
# bits, side FIXED order-1 at 17 bits (the +1 decorrelation bit),
# full-scale +/-32767/-32768 endpoints included.
FLAC_STEREO_LS = bytes.fromhex(
    "664c614380000022000800080000000000000ac442f000000008000000000000"
    "00000000000000000000fff860880007a5020064ff38012cfe7001f4fda87fff"
    "80001200050070600002c0032000000000000000000000000000000000000000"
    "0000000007000000000000000000000000000000000000000000000000d06bae"
)
FLAC_STEREO_SAMPLES = [
    [100, 90],
    [-200, -210],
    [300, 280],
    [-400, -350],
    [500, 500],
    [-600, -600],
    [32767, 32000],
    [-32768, -32768],
]


def test_flac_external_vector_mono_constant_fixed():
    samples, rate, bps = decode_flac(FLAC_MONO)
    assert (rate, bps) == (8000, 16)
    assert samples.shape == (16, 1)
    assert samples[:, 0].tolist() == FLAC_MONO_SAMPLES


def test_flac_external_vector_stereo_left_side():
    samples, rate, bps = decode_flac(FLAC_STEREO_LS)
    assert (rate, bps) == (44100, 16)
    assert samples.shape == (8, 2)
    assert samples.tolist() == FLAC_STEREO_SAMPLES


def test_flac_external_vector_crc_enforced():
    """Flipping one payload bit must trip the frame CRC-16 — proves
    the CRCs in the vector are actually being checked, not skipped."""
    corrupted = bytearray(FLAC_MONO)
    corrupted[-10] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(corrupted))


# -- progressive JPEG (SOF2, round 7) -------------------------------------

# 8x8 gray flat 130 as a minimal two-scan progressive stream
# (DC-first + AC-first 1..63); must decode exactly like its baseline
# twin JPEG_FLAT_GRAY.
JPEG_PROG_FLAT = bytes.fromhex(
    "ffd8ffdb00430001010101010101010101010101010101010101010101010101"
    "0101010101010101010101010101010101010101010101010101010101010101"
    "01010101010101ffc2000b080008000801011100ffc400a0000000000c000000"
    "000000000000000000000102030405060708090a0b1000000000000000700000"
    "0000000000000001020304050610111213141516202122232425263031323334"
    "3536404142434445465051525354555660616263646566707172737475768081"
    "828384858690919293949596a0a1a2a3a4a5a6b0b1b2b3b4b5b6c0c1c2c3c4c5"
    "c6d0d1d2d3d4d5d6e0e1e2e3e4e5e6f0f1f2f3f4f5f6ffda0008010100000000"
    "587fffda0008010100013f0000ffd9"
)

# 16x16 gray, the full Annex-G scan algebra: successive approximation
# (Al=1 first passes + Ah=1/Al=0 refinements) x spectral selection
# (bands 1-5 and 6-63), EOB-run batching, newly-significant-coefficient
# refinement. Expected pixels from the direct IDCT formula over the
# hand-chosen coefficients (unit quant table -> exact).
JPEG_PROG_SA = bytes.fromhex(
    "ffd8ffdb00430001010101010101010101010101010101010101010101010101"
    "0101010101010101010101010101010101010101010101010101010101010101"
    "01010101010101ffc2000b080010001001011100ffc400a0000000000c000000"
    "000000000000000000000102030405060708090a0b1000000000000000700000"
    "0000000000000001020304050610111213141516202122232425263031323334"
    "3536404142434445465051525354555660616263646566707172737475768081"
    "828384858690919293949596a0a1a2a3a4a5a6b0b1b2b3b4b5b6c0c1c2c3c4c5"
    "c6d0d1d2d3d4d5d6e0e1e2e3e4e5e6f0f1f2f3f4f5f6ffda0008010100000001"
    "47324ae7ffda00080101000105011f00960016a0501a000b300fffda00080101"
    "00063f013400923e5a49d50f1220003c2485a82d1a4242e72065e200103590b4"
    "4809208a001450f81199ac7e08f038d2401fffda00080101000000107fffda00"
    "080101000105100080000007ffda0008010100063f1008b4f6919401007e00a8"
    "0147ffd9"
)
JPEG_PROG_SA_PIXELS = [[121, 122, 124, 137, 128, 118, 131, 128, 118, 126, 121, 128, 121, 128, 117, 109], [121, 134, 125, 129, 134, 119, 117, 129, 134, 131, 126, 121, 118, 128, 122, 122], [128, 121, 131, 132, 127, 124, 119, 126, 133, 133, 127, 125, 129, 126, 132, 124], [127, 113, 128, 134, 125, 128, 126, 127, 143, 130, 131, 114, 122, 123, 125, 127], [124, 120, 127, 124, 134, 133, 114, 133, 119, 121, 125, 127, 136, 120, 122, 110], [129, 125, 124, 129, 132, 126, 119, 123, 128, 120, 125, 121, 124, 120, 113, 114], [133, 119, 123, 135, 128, 124, 128, 117, 126, 125, 120, 131, 129, 124, 119, 117], [123, 127, 115, 128, 138, 126, 126, 125, 141, 133, 121, 128, 121, 127, 122, 130], [115, 117, 125, 128, 115, 117, 124, 125, 131, 120, 123, 123, 133, 138, 123, 117], [120, 119, 124, 128, 120, 123, 128, 126, 122, 119, 135, 127, 139, 127, 126, 119], [121, 115, 116, 122, 117, 122, 122, 116, 128, 134, 123, 131, 118, 127, 127, 134], [131, 122, 120, 127, 126, 132, 130, 121, 132, 132, 136, 120, 130, 112, 139, 137], [127, 117, 115, 121, 120, 126, 124, 115, 115, 138, 132, 151, 126, 129, 126, 132], [135, 128, 127, 131, 126, 130, 130, 124, 127, 130, 141, 133, 140, 126, 135, 130], [127, 125, 128, 130, 120, 122, 127, 125, 144, 138, 123, 130, 124, 142, 133, 138], [129, 130, 135, 135, 121, 122, 128, 130, 144, 132, 131, 128, 133, 142, 134, 135]]

# 8x16 color (1x1x1 sampling): interleaved 3-component DC scan +
# three single-component AC scans.
JPEG_PROG_COLOR = bytes.fromhex(
    "ffd8ffdb00430001010101010101010101010101010101010101010101010101"
    "0101010101010101010101010101010101010101010101010101010101010101"
    "01010101010101ffc20011080008001003011100021100031100ffc400a00000"
    "00000c000000000000000000000000000102030405060708090a0b1000000000"
    "0000007000000000000000000001020304050610111213141516202122232425"
    "2630313233343536404142434445465051525354555660616263646566707172"
    "737475768081828384858690919293949596a0a1a2a3a4a5a6b0b1b2b3b4b5b6"
    "c0c1c2c3c4c5c6d0d1d2d3d4d5d6e0e1e2e3e4e5e6f0f1f2f3f4f5f6ffda000c"
    "03010002000300000000481148001fffda0008010100013f001960b803203003"
    "3c2d42a974807fffda0008010200013f0027e011340a20017031c1044a003fff"
    "da0008010300013f0009cb70c20380041041c16808401fffd9"
)
JPEG_PROG_COLOR_PIXELS = [[[128, 126, 131], [128, 126, 127], [130, 127, 120], [133, 128, 124], [133, 130, 137], [132, 131, 139], [131, 130, 128], [132, 127, 123], [126, 130, 129], [131, 126, 130], [135, 122, 131], [132, 120, 134], [125, 121, 135], [123, 123, 133], [125, 123, 126], [131, 123, 121]], [[127, 126, 131], [127, 127, 127], [128, 127, 122], [132, 129, 124], [131, 130, 136], [131, 132, 137], [130, 130, 128], [131, 127, 124], [124, 131, 124], [126, 128, 125], [128, 126, 127], [128, 127, 132], [124, 129, 133], [123, 131, 133], [127, 132, 128], [131, 131, 123]], [[127, 128, 132], [126, 128, 127], [127, 128, 122], [129, 130, 124], [131, 130, 136], [128, 131, 136], [129, 131, 128], [129, 128, 124], [125, 127, 124], [127, 127, 125], [127, 129, 126], [124, 130, 130], [122, 132, 133], [124, 132, 134], [129, 131, 128], [133, 130, 125]], [[129, 129, 131], [127, 129, 128], [127, 128, 122], [128, 129, 124], [130, 129, 134], [130, 131, 136], [129, 131, 128], [128, 129, 124], [133, 122, 130], [132, 123, 128], [128, 126, 127], [126, 127, 129], [124, 128, 131], [126, 125, 131], [129, 123, 127], [132, 120, 122]], [[132, 130, 133], [129, 129, 129], [128, 129, 123], [129, 128, 124], [130, 128, 133], [130, 129, 134], [129, 129, 127], [129, 128, 126], [134, 121, 130], [130, 124, 128], [127, 127, 125], [124, 129, 125], [126, 127, 129], [127, 125, 130], [131, 122, 127], [131, 120, 124]], [[135, 130, 134], [130, 130, 132], [128, 129, 124], [129, 128, 124], [132, 127, 133], [130, 128, 133], [130, 129, 127], [128, 127, 125], [129, 124, 128], [126, 128, 125], [122, 132, 121], [121, 133, 121], [125, 132, 124], [129, 131, 128], [130, 130, 128], [129, 131, 128]], [[134, 132, 135], [130, 131, 133], [125, 130, 124], [127, 128, 123], [129, 127, 130], [130, 128, 133], [128, 128, 126], [127, 127, 125], [129, 127, 130], [124, 129, 125], [121, 132, 118], [124, 132, 117], [128, 129, 121], [130, 129, 125], [129, 131, 128], [126, 132, 128]], [[134, 134, 136], [128, 132, 133], [124, 131, 124], [126, 128, 123], [128, 128, 130], [128, 128, 130], [127, 129, 126], [124, 129, 125], [135, 125, 136], [129, 127, 130], [126, 129, 122], [126, 126, 118], [131, 121, 119], [132, 120, 122], [127, 122, 126], [122, 126, 129]]]


def test_jpeg_progressive_flat_matches_baseline_twin():
    got = decode_jpeg(JPEG_PROG_FLAT)
    assert got.shape == (8, 8)
    assert (got == 130).all()
    assert (got == decode_jpeg(JPEG_FLAT_GRAY)).all()


def test_jpeg_progressive_successive_approximation():
    got = decode_jpeg(JPEG_PROG_SA)
    exp = np.array(JPEG_PROG_SA_PIXELS, dtype=np.int64)
    assert got.shape == (16, 16)
    assert np.abs(got.astype(np.int64) - exp).max() <= 1


def test_jpeg_progressive_interleaved_color():
    got = decode_jpeg(JPEG_PROG_COLOR)
    exp = np.array(JPEG_PROG_COLOR_PIXELS, dtype=np.int64)
    assert got.shape == (8, 16, 3)
    # the expected pixels round each Y/Cb/Cr plane to uint8 before the
    # color transform (the decoder keeps floats), hence the +/-2 slack
    assert np.abs(got.astype(np.int64) - exp).max() <= 2


# -- PNG: Adam7 interlace / 16-bit / sub-byte depths (round 7) ------------

# 9x10 RGB8, Adam7-interlaced — odd dimensions exercise every ragged
# pass geometry; per-pass rows cycle through all five filter types.
PNG_ADAM7 = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000090000000a08020000019e60d3"
    "7f0000012d4944415478da012201ddfe00c9cf38ee64e6018cec2362fe0e00ca"
    "486e010e76e60005ab12fb7190c2564a0078a3bcfde9fd016084a2a197ff02bf"
    "ac2d64f1a000f0520f1c89d045ebb94c1e1ea0fada01035e26becbdbfcc4188c"
    "5703b774820004307062fff1bfac3df67a300186d45ae7ac2b0963ff56031502"
    "a121a4c5e0b46d1eaf2a3a86039be2196cf283997b7bd9c115043476c2f7c0da"
    "0bf7a2b5141e00543b9477ccb8a985e6e512c632b8ece230350550fa2370f8db"
    "a10c017aa070c5f95f766573c449df8ff3915fa466b2a053271b718e96cb0263"
    "b9e1bfaa328cd15fb8daea0393448ed9cd8b58121130419dc2d50360d526db02"
    "4f79ff3220349f9561246356a1e0a79a86fd18039a12049602c821674522d7ea"
    "d69ef710643169252a0f3803723d6cb3a5e1cb7f8af897b029cd000000004945"
    "4e44ae426082"
)
PNG_ADAM7_PIXELS = [[[201, 207, 56], [4, 48, 112], [120, 163, 188], [98, 255, 241], [202, 72, 110], [191, 172, 61], [253, 233, 253], [246, 122, 48], [238, 100, 230]], [[84, 59, 148], [119, 204, 184], [169, 133, 230], [229, 18, 198], [50, 184, 236], [226, 48, 53], [5, 80, 250], [35, 112, 248], [219, 161, 12]], [[240, 82, 15], [134, 212, 90], [28, 137, 208], [109, 128, 133], [69, 235, 185], [118, 227, 132], [76, 30, 30], [204, 230, 153], [160, 250, 218]], [[122, 160, 112], [63, 153, 207], [181, 254, 66], [121, 71, 33], [8, 58, 178], [103, 222, 24], [25, 126, 107], [64, 153, 220], [206, 47, 167]], [[5, 171, 18], [39, 245, 254], [96, 132, 162], [50, 96, 57], [251, 113, 144], [227, 1, 51], [1, 27, 161], [246, 32, 31], [194, 86, 74]], [[221, 89, 81], [254, 67, 1], [65, 207, 161], [49, 33, 11], [11, 205, 246], [245, 183, 229], [164, 214, 125], [81, 201, 29], [107, 241, 124]], [[3, 94, 38], [174, 92, 152], [193, 41, 1], [220, 80, 235], [189, 237, 25], [120, 163, 10], [73, 68, 28], [144, 34, 41], [0, 184, 158]], [[206, 1, 78], [193, 36, 118], [250, 120, 189], [181, 128, 3], [245, 7, 160], [88, 181, 99], [94, 108, 10], [221, 151, 43], [167, 94, 101]], [[140, 236, 35], [226, 210, 90], [31, 48, 207], [217, 146, 114], [14, 118, 230], [131, 154, 172], [101, 12, 65], [69, 54, 202], [238, 234, 49]], [[100, 3, 22], [133, 139, 147], [227, 98, 167], [139, 0, 250], [197, 100, 43], [193, 218, 85], [208, 237, 13], [79, 42, 151], [2, 207, 120]]]

# 3x4 grayscale, 16-bit depth (decodes to the high byte per the
# uint8 output contract)
PNG_GRAY16 = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000030000000410000000003ed606"
    "98000000254944415478da6348f3d6fe2d2dc358bf917d51673dd3ab3d535932"
    "1630fb2eb9b3e3e61400966b0c2f4c611f370000000049454e44ae426082"
)
PNG_GRAY16_PIXELS = [[102, 43, 27], [127, 134, 15], [105, 27, 119], [129, 42, 41]]

# 7x3 grayscale, 2-bit depth (samples 0..3 rescale by 85)
PNG_GRAY2 = bytes.fromhex(
    "89504e470d0a1a0a0000000d4948445200000007000000030200000000301852"
    "b8000000114944415478da63781fc2b8e704d3bc070012c10449285394090000"
    "000049454e44ae426082"
)
PNG_GRAY2_PIXELS = [[255, 170, 255, 255, 85, 85, 85], [170, 255, 255, 0, 170, 0, 85], [85, 85, 170, 170, 85, 170, 85]]

# 5x5 paletted 4-bit AND Adam7-interlaced (both features at once)
PNG_PAL4_ADAM7 = bytes.fromhex(
    "89504e470d0a1a0a0000000d494844520000000500000005040300000108460b"
    "400000000f504c5445ff000000ff000000ffffff000a141e2cc6d43d00000023"
    "4944415478da633060306060643060546030546030611460626610643260547c"
    "a40b001bee02c201622b250000000049454e44ae426082"
)
PNG_PAL4_ADAM7_PIXELS = [[[255, 255, 0], [255, 255, 0], [255, 255, 0], [10, 20, 30], [255, 255, 0]], [[0, 255, 0], [0, 255, 0], [255, 0, 0], [0, 0, 255], [255, 255, 0]], [[255, 255, 0], [0, 255, 0], [0, 255, 0], [255, 0, 0], [0, 0, 255]], [[0, 0, 255], [0, 255, 0], [255, 0, 0], [255, 255, 0], [255, 255, 0]], [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0], [0, 255, 0]]]


def test_png_external_vector_adam7_interlaced():
    got = decode_png(PNG_ADAM7)
    assert got.shape == (10, 9, 3)
    assert (got == np.array(PNG_ADAM7_PIXELS, dtype=np.uint8)).all()


def test_png_external_vector_16bit():
    got = decode_png(PNG_GRAY16)
    assert got.shape == (4, 3)
    assert (got == np.array(PNG_GRAY16_PIXELS, dtype=np.uint8)).all()


def test_png_external_vector_2bit_gray():
    got = decode_png(PNG_GRAY2)
    assert got.shape == (3, 7)
    assert (got == np.array(PNG_GRAY2_PIXELS, dtype=np.uint8)).all()


def test_png_external_vector_4bit_palette_interlaced():
    got = decode_png(PNG_PAL4_ADAM7)
    assert got.shape == (5, 5, 3)
    assert (got == np.array(PNG_PAL4_ADAM7_PIXELS, dtype=np.uint8)).all()


# -- bitflip fuzz over the vector corpus ----------------------------------
#
# The round-trip encoders cannot emit progressive JPEG, interlaced or
# sub-byte PNG, or interlaced GIF, so the general bitflip fuzz in
# test_properties.py (which corrupts encoder output) never reaches those
# decode paths with *plausible* corrupt streams. The external vectors
# are valid streams of exactly those shapes — flip one byte anywhere
# past the magic and the decoder must still resolve to ValueError or a
# well-formed array (the poison-blob contract the 100 TB media pass
# relies on), never an IndexError/OverflowError/hang.

from hypothesis import given, settings
from hypothesis import strategies as st

_IMAGE_VECTORS = [
    PNG_ADAM7, PNG_GRAY16, PNG_GRAY2, PNG_PAL4_ADAM7,
    JPEG_PROG_FLAT, JPEG_PROG_SA, JPEG_PROG_COLOR,
    GIF_INTERLACED,
]


@settings(max_examples=120, deadline=None, derandomize=True)
@given(vec=st.integers(0, len(_IMAGE_VECTORS) - 1), flip=st.integers(0, 10**9))
def test_vector_bitflip_fuzz_images(vec, flip):
    raw = bytearray(_IMAGE_VECTORS[vec])
    dec = decode_gif if raw[:3] == b"GIF" else (
        decode_png if raw[:4] == b"\x89PNG" else decode_jpeg
    )
    pos = 8 + flip % max(len(raw) - 9, 1)
    raw[pos] ^= 1 + (flip % 255)
    try:
        out = dec(bytes(raw))
        assert isinstance(out, np.ndarray)
    except ValueError:
        pass
    except Exception as e:
        raise AssertionError(
            f"{dec.__name__} leaked {type(e).__name__} on vector bitflip: {e}"
        ) from e


@settings(max_examples=60, deadline=None, derandomize=True)
@given(vec=st.integers(0, 1), flip=st.integers(0, 10**9))
def test_vector_bitflip_fuzz_flac(vec, flip):
    raw = bytearray([FLAC_MONO, FLAC_STEREO_LS][vec])
    pos = 4 + flip % max(len(raw) - 5, 1)
    raw[pos] ^= 1 + (flip % 255)
    try:
        out = decode_flac(bytes(raw))
        assert isinstance(out[0], np.ndarray)
    except ValueError:
        pass
    except Exception as e:
        raise AssertionError(
            f"decode_flac leaked {type(e).__name__} on vector bitflip: {e}"
        ) from e


# -- animated GIF (round 7: frame sampling) -------------------------------
#
# 5x4 canvas, 4-entry GCT (bg = yellow), Netscape loop extension, four
# frames exercising the full GIF89a animation state machine: full-canvas
# disposal-1 frame; a 2x2 offset frame with a LOCAL palette, transparency
# index (revealing the prior canvas) and disposal 2 (rect restored to
# background); a disposal-3 frame (rect restored to the PREVIOUS canvas);
# and a final GCT frame observing both restorations. The independent
# generator uses the CLEAR-before-every-code LZW form (legal, dictionary
# never grows) — structurally unlike the repo encoder's output — and
# composites expectations with a from-scratch spec walk.
GIF_ANIM = bytes.fromhex(
    "47494638396105000400810300ff000000ff000000ffffff0021ff0b4e455453"
    "43415045322e30030100000021f904040a0000002c0000000005000400000210"
    "044371044371044371044371044371050021f90409140001002c010001000200"
    "020081ff00ffffffff00ffff0102030204044331050021f9040c1e0000002c03"
    "0000000200020080000000808080020404c310050021f90400280000002c0000"
    "0300020001000002020c55003b"
)
GIF_ANIM_DELAYS = [10, 20, 30, 40]
GIF_ANIM_PIXELS = [
    [[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0], [255, 0, 0]], [[0, 255, 0], [0, 0, 255], [255, 255, 0], [255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], [[255, 255, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]]],
    [[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0], [255, 0, 0]], [[0, 255, 0], [255, 0, 255], [255, 255, 0], [255, 0, 0], [0, 255, 0]], [[0, 0, 255], [0, 255, 255], [255, 0, 0], [0, 255, 0], [0, 0, 255]], [[255, 255, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]]],
    [[[255, 0, 0], [0, 255, 0], [0, 0, 255], [0, 0, 0], [128, 128, 128]], [[0, 255, 0], [255, 255, 0], [255, 255, 0], [128, 128, 128], [0, 0, 0]], [[0, 0, 255], [255, 255, 0], [255, 255, 0], [0, 255, 0], [0, 0, 255]], [[255, 255, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]]],
    [[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0], [255, 0, 0]], [[0, 255, 0], [255, 255, 0], [255, 255, 0], [255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0], [255, 255, 0], [0, 255, 0], [0, 0, 255]], [[0, 255, 0], [0, 0, 255], [0, 255, 0], [0, 0, 255], [255, 255, 0]]],
]


def test_gif_external_vector_animation_compositing():
    from melodist_spark.pipeline.multimodal import decode_gif_frames

    got = decode_gif_frames(GIF_ANIM)
    assert [g[0] for g in got] == [0, 1, 2, 3]
    assert [g[1] for g in got] == GIF_ANIM_DELAYS
    for (_, _, canvas), exp in zip(got, GIF_ANIM_PIXELS):
        assert (canvas == np.array(exp, dtype=np.uint8)).all()


def test_gif_external_vector_animation_sampling():
    from melodist_spark.pipeline.multimodal import decode_gif, decode_gif_frames

    got = decode_gif_frames(GIF_ANIM, every_n=2)
    assert [g[0] for g in got] == [0, 2]
    assert (got[1][2] == np.array(GIF_ANIM_PIXELS[2], dtype=np.uint8)).all()
    # single-frame entry point = frame 0 of the animation walk
    assert (decode_gif(GIF_ANIM) == np.array(GIF_ANIM_PIXELS[0], dtype=np.uint8)).all()


@settings(max_examples=60, deadline=None, derandomize=True)
@given(flip=st.integers(0, 10**9))
def test_vector_bitflip_fuzz_gif_animation(flip):
    """Bitflip fuzz through the whole animation walk (disposal /
    transparency / local-palette state machine), not just frame 0."""
    from melodist_spark.pipeline.multimodal import decode_gif_frames

    raw = bytearray(GIF_ANIM)
    pos = 8 + flip % max(len(raw) - 9, 1)
    raw[pos] ^= 1 + (flip % 255)
    try:
        out = decode_gif_frames(bytes(raw))
        assert all(isinstance(c, np.ndarray) for _, _, c in out)
    except ValueError:
        pass
    except Exception as e:
        raise AssertionError(
            f"decode_gif_frames leaked {type(e).__name__} on bitflip: {e}"
        ) from e


# -- AVI / MJPEG (round 7) ------------------------------------------------

# A hand-assembled RIFF/AVI container (struct-built in this test,
# fully independent of encode_avi_mjpeg's writer) wrapping two video
# chunks: frame 0 is the JPEG_FLAT_GRAY external vector above; frame
# 1 is a TABLE-LESS frame — DQT + SOF + SOS only, no DHT — whose
# entropy bits were hand-coded against the Annex K.3 typical tables
# (DC cat 5 code '110' + 16 = '10000', EOB '1010', 1-padded to
# 0xD0AF). Real MJPEG hardware writes exactly this shape; decoding it
# pins the decoder's standard-table fallback against the spec, not
# against our own encoder. Frame 1 is delivered as a '00db'
# (uncompressed-flagged) chunk inside a 'rec ' grouping LIST to cover
# both chunk spellings and the interleave wrapper.
JPEG_FLAT_GRAY_NO_DHT = bytes.fromhex(
    "ffd8ffdb00430001010101010101010101010101010101010101010101010101"
    "0101010101010101010101010101010101010101010101010101010101010101"
    "01010101010101ffc0000b080008000801011100"
    "ffda0008010100003f00d0afffd9"
)


def _avi_hand_assembled() -> bytes:
    import struct

    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    avih = struct.pack(
        "<14I", 100_000, 0, 0, 0x10, 2, 0, 1, 4096, 8, 8, 0, 0, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 100_000, 1_000_000, 0, 2,
        4096, 0xFFFFFFFF, 0, 0, 0, 8, 8,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, 8, 8, 1, 24, b"MJPG", 4096, 0, 0, 0, 0
    )
    hdrl = chunk(
        b"LIST",
        b"hdrl" + chunk(b"avih", avih)
        + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    rec = chunk(b"LIST", b"rec " + chunk(b"00db", JPEG_FLAT_GRAY_NO_DHT))
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", JPEG_FLAT_GRAY) + rec)
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def test_avi_external_vector_container_walk():
    from melodist_spark.pipeline.avi import decode_avi_frames, parse_avi

    avi = _avi_hand_assembled()
    meta = parse_avi(avi)
    assert (meta["width"], meta["height"]) == (8, 8)
    assert meta["usec_per_frame"] == 100_000
    assert meta["handler"] == "MJPG"
    assert len(meta["frames"]) == 2
    # offsets index the ORIGINAL payload — both chunk bodies must be
    # byte-identical to the vectors they wrap
    (o0, s0), (o1, s1) = meta["frames"]
    assert avi[o0 : o0 + s0] == JPEG_FLAT_GRAY
    assert avi[o1 : o1 + s1] == JPEG_FLAT_GRAY_NO_DHT

    dec = decode_avi_frames(avi)
    assert [i for i, _, _ in dec] == [0, 1]
    assert all(d == 10 for _, d, _ in dec)  # 100 ms/frame
    for _, _, rgb in dec:
        assert rgb.shape == (8, 8, 3)
        assert (rgb == 130).all()


def test_jpeg_tableless_external_vector_standard_tables():
    """The table-less frame decodes standalone — Annex K.3 fallback
    reproduces the hand-coded bitstream's intent exactly."""
    got = decode_jpeg(JPEG_FLAT_GRAY_NO_DHT)
    assert got.shape == (8, 8)
    assert (got == 130).all()


@settings(max_examples=40, deadline=None, derandomize=True)
@given(flip=st.integers(0, 10**9))
def test_vector_bitflip_fuzz_avi(flip):
    """Bitflips anywhere in the container (header, index, frame
    bytes) must yield ValueError or a decode — never an unhandled
    exception from the chunk walker or the JPEG fallback."""
    from melodist_spark.pipeline.avi import decode_avi_frames

    raw = bytearray(_avi_hand_assembled())
    pos = 4 + flip % (len(raw) - 4)
    raw[pos] ^= 1 + (flip % 255)
    try:
        out = decode_avi_frames(bytes(raw))
        assert all(isinstance(c, np.ndarray) for _, _, c in out)
    except ValueError:
        pass
    except Exception as e:
        raise AssertionError(
            f"decode_avi_frames leaked {type(e).__name__} on bitflip: {e}"
        ) from e


def test_tiff_external_vectors():
    """Hand-assembled known-good TIFF byte streams (struct-packed
    directly from the TIFF 6.0 spec layout, independent of both the
    repo decoder and the test-suite TIFF writer): a little-endian
    uncompressed 2x2 gray, and a big-endian PackBits 2x2 gray with
    WhiteIsZero inversion. Byte-exact pixel assertions."""
    from melodist_spark.pipeline.multimodal import decode_tiff

    t1 = bytes.fromhex(
        "49492a00080000000800000103000100000002000000010103000100000002"
        "00000002010300010000000800000003010300010000000100000006010300"
        "010000000100000011010400010000006e0000001501030001000000010000"
        "00170104000100000004000000000000000a141e28"
    )
    assert decode_tiff(t1).tolist() == [[10, 20], [30, 40]]

    t2 = bytes.fromhex(
        "4d4d002a000000080008010000030000000100020000010100030000000100"
        "02000001020003000000010008000001030003000000018005000001060003"
        "000000010000000001110004000000010000006e0115000300000001000100"
        "0001170004000000010000000400000000fec80007"
    )
    # PackBits run(3 x 200) + literal 7; WhiteIsZero: 255-200 / 255-7
    assert decode_tiff(t2).tolist() == [[55, 55], [55, 248]]


def _build_tiff_ifd(endian, entries, blobs):
    """entries: [(tag, typ, [values])] with 'OFF:i'/'LEN:i' sentinels
    resolved to blob offsets/lengths; blobs appended after the IFD
    and any externalized value arrays. Module-level so the bitflip
    fuzz can reuse the planar/16-bit base streams."""
    import struct

    e = "<" if endian == "little" else ">"
    magic = b"II*\x00" if endian == "little" else b"MM\x00*"
    tsz = {3: 2, 4: 4}
    fmt = {3: "H", 4: "I"}
    ifd_size = 2 + 12 * len(entries) + 4
    # first pass: which entries externalize, and total extern size
    ext_pos = {}
    pos = 8 + ifd_size
    for i, (tag, typ, vals) in enumerate(entries):
        if len(vals) * tsz[typ] > 4:
            ext_pos[i] = pos
            pos += len(vals) * tsz[typ]
    offs = []
    p = pos
    for b in blobs:
        offs.append(p)
        p += len(b)

    def resolve(v):
        if isinstance(v, str) and v.startswith("OFF:"):
            return offs[int(v[4:])]
        if isinstance(v, str) and v.startswith("LEN:"):
            return len(blobs[int(v[4:])])
        return v

    ifd = struct.pack(e + "H", len(entries))
    ext = b""
    for i, (tag, typ, vals) in enumerate(entries):
        vals = [resolve(v) for v in vals]
        if i in ext_pos:
            ifd += struct.pack(e + "HHII", tag, typ, len(vals), ext_pos[i])
            ext += struct.pack(e + str(len(vals)) + fmt[typ], *vals)
        else:
            packed = struct.pack(e + str(len(vals)) + fmt[typ], *vals)
            ifd += struct.pack(e + "HHI", tag, typ, len(vals))
            ifd += packed + b"\x00" * (4 - len(packed))
    ifd += struct.pack(e + "I", 0)
    return magic + struct.pack(e + "I", 8) + ifd + ext + b"".join(blobs)


def test_tiff_planar_and_16bit_external_vectors():
    """Round 9 (VERDICT item 7): PLANAR-configuration and 16-bit
    TIFF vectors, struct-packed directly from the TIFF 6.0 layout
    (general builder with external value arrays — no repo code).
    Covers: plane-major strip order (PlanarConfiguration=2, RGB),
    plane-major TILE order, and big-endian 16-bit grayscale with the
    predictor's mod-65536 wrap + WhiteIsZero + high-byte
    downconvert."""
    import struct

    from melodist_spark.pipeline.multimodal import decode_tiff

    build = _build_tiff_ifd

    # vector 1: planar STRIPS — 2x2 RGB, one strip per plane,
    # plane-major offsets (TIFF 6.0 PlanarConfiguration=2)
    planes = [bytes([1, 2, 3, 4]), bytes([5, 6, 7, 8]),
              bytes([9, 10, 11, 12])]
    t1 = build(
        "little",
        [
            (256, 3, [2]), (257, 3, [2]), (258, 3, [8, 8, 8]),
            (259, 3, [1]), (262, 3, [1]),
            (273, 4, ["OFF:0", "OFF:1", "OFF:2"]),
            (277, 3, [3]), (278, 3, [2]),
            (279, 4, ["LEN:0", "LEN:1", "LEN:2"]),
            (284, 3, [2]),
        ],
        planes,
    )
    got = decode_tiff(t1)
    assert got.shape == (2, 2, 3)
    assert got[:, :, 0].tolist() == [[1, 2], [3, 4]]
    assert got[:, :, 1].tolist() == [[5, 6], [7, 8]]
    assert got[:, :, 2].tolist() == [[9, 10], [11, 12]]

    # vector 2: planar TILES — same pixels, tile walk per plane
    t2 = build(
        "little",
        [
            (256, 3, [2]), (257, 3, [2]), (258, 3, [8, 8, 8]),
            (259, 3, [1]), (262, 3, [1]), (277, 3, [3]),
            (284, 3, [2]), (322, 3, [2]), (323, 3, [2]),
            (324, 4, ["OFF:0", "OFF:1", "OFF:2"]),
            (325, 4, ["LEN:0", "LEN:1", "LEN:2"]),
        ],
        planes,
    )
    assert decode_tiff(t2).tolist() == decode_tiff(t1).tolist()

    # vector 3: 16-bit big-endian gray, predictor 2 (16-bit deltas,
    # mod-65536 wrap on row 1), WhiteIsZero, high-byte downconvert.
    # stored deltas: row0 [0x1234, 0x0100] -> [0x1234, 0x1334];
    #                row1 [0xFF00, 0x0101] -> [0xFF00, 0x0001 (wrap)]
    deltas = struct.pack(">4H", 0x1234, 0x0100, 0xFF00, 0x0101)
    t3 = build(
        "big",
        [
            (256, 3, [2]), (257, 3, [2]), (258, 3, [16]),
            (259, 3, [1]), (262, 3, [0]), (273, 4, ["OFF:0"]),
            (277, 3, [1]), (278, 3, [2]), (279, 4, ["LEN:0"]),
            (317, 3, [2]),
        ],
        [deltas],
    )
    got16 = decode_tiff(t3)
    assert got16.tolist() == [
        [255 - 0x12, 255 - 0x13],
        [255 - 0xFF, 255 - 0x00],
    ]

    # poison-blob contract intact: sub-8-bit and mixed depths raise
    import pytest

    bad_bits = build(
        "little",
        [
            (256, 3, [2]), (257, 3, [2]), (258, 3, [4]),
            (273, 4, ["OFF:0"]), (279, 4, ["LEN:0"]),
        ],
        [bytes(2)],
    )
    with pytest.raises(ValueError, match="bits/sample"):
        decode_tiff(bad_bits)


def test_tiff_tiled_external_vectors():
    """Round 8 (VERDICT item 8): TILED TIFF vectors, struct-packed
    here directly from the TIFF 6.0 §15 layout (independent of the
    repo decoder — the builder below writes raw IFD bytes, no repo
    code). A 3x3 gray image in 2x2 tiles exercises the
    left-to-right/top-to-bottom tile order AND the padded right/
    bottom edge-tile crop; the second vector layers PackBits
    compression + horizontal-differencing predictor (per tile row) +
    WhiteIsZero on the same geometry, big-endian."""
    import struct

    from melodist_spark.pipeline.multimodal import decode_tiff

    def build(endian, comp, pred, photo, tiles):
        e = "<" if endian == "little" else ">"
        magic = b"II*\x00" if endian == "little" else b"MM\x00*"
        # layout: header(8) | IFD | offsets array | counts array | tiles
        entries = [
            (256, 3, 1, 3),  # ImageWidth
            (257, 3, 1, 3),  # ImageLength
            (258, 3, 1, 8),  # BitsPerSample
            (259, 3, 1, comp),
            (262, 3, 1, photo),
            (277, 3, 1, 1),  # SamplesPerPixel
            (317, 3, 1, pred),
            (322, 3, 1, 2),  # TileWidth
            (323, 3, 1, 2),  # TileLength
            (324, 4, 4, None),  # TileOffsets -> patched
            (325, 4, 4, None),  # TileByteCounts -> patched
        ]
        ifd_size = 2 + 12 * len(entries) + 4
        off_arr = 8 + ifd_size
        cnt_arr = off_arr + 16
        data0 = cnt_arr + 16
        offs, cnts, blob = [], [], b""
        for t in tiles:
            offs.append(data0 + len(blob))
            cnts.append(len(t))
            blob += t
        ifd = struct.pack(e + "H", len(entries))
        for tag, typ, cnt, val in entries:
            if tag == 324:
                ifd += struct.pack(e + "HHII", tag, typ, cnt, off_arr)
            elif tag == 325:
                ifd += struct.pack(e + "HHII", tag, typ, cnt, cnt_arr)
            else:
                if typ == 3:  # SHORT packs in the low half of value
                    ifd += struct.pack(e + "HHIHH", tag, typ, cnt, val, 0)
                else:
                    ifd += struct.pack(e + "HHII", tag, typ, cnt, val)
        ifd += struct.pack(e + "I", 0)  # next-IFD terminator
        return (
            magic + struct.pack(e + "I", 8) + ifd
            + struct.pack(e + "4I", *offs) + struct.pack(e + "4I", *cnts)
            + blob
        )

    # vector 1: uncompressed tiles, pad bytes 0xEE must be cropped
    tiles = [
        bytes([1, 2, 4, 5]),
        bytes([3, 0xEE, 6, 0xEE]),
        bytes([7, 8, 0xEE, 0xEE]),
        bytes([9, 0xEE, 0xEE, 0xEE]),
    ]
    t1 = build("little", 1, 1, 1, tiles)
    assert decode_tiff(t1).tolist() == [[1, 2, 3], [4, 5, 6], [7, 8, 9]]

    # vector 2: PackBits + predictor 2 (deltas reset per TILE row) +
    # WhiteIsZero, big-endian. Stored deltas for tile (r0=[10,20],
    # r1=[40,50]) are [10,10],[40,10]; PackBits literal run header 3.
    def pb(raw):
        return bytes([len(raw) - 1]) + raw

    tiles2 = [
        pb(bytes([10, 10, 40, 10])),
        pb(bytes([30, 0, 60, 0])),
        pb(bytes([70, 10, 0, 0])),
        pb(bytes([90, 0, 0, 0])),
    ]
    t2 = build("big", 32773, 2, 0, tiles2)
    got = decode_tiff(t2)
    want = [[255 - v for v in row] for row in
            [[10, 20, 30], [40, 50, 60], [70, 80, 90]]]
    assert got.tolist() == want


def test_tiff_planar_16bit_bitflip_fuzz():
    """Round 9: the new planar and 16-bit decode paths inherit the
    poison-blob contract — bitflipped planar-strip, planar-tile and
    16-bit-predictor streams either decode to uint8 or raise
    ValueError, never an uncontrolled exception class."""
    import struct

    import numpy as np

    from melodist_spark.pipeline.multimodal import decode_tiff

    planes = [bytes([1, 2, 3, 4]), bytes([5, 6, 7, 8]),
              bytes([9, 10, 11, 12])]
    bases = [
        _build_tiff_ifd(
            "little",
            [(256, 3, [2]), (257, 3, [2]), (258, 3, [8, 8, 8]),
             (259, 3, [1]), (262, 3, [1]),
             (273, 4, ["OFF:0", "OFF:1", "OFF:2"]),
             (277, 3, [3]), (278, 3, [2]),
             (279, 4, ["LEN:0", "LEN:1", "LEN:2"]), (284, 3, [2])],
            planes,
        ),
        _build_tiff_ifd(
            "little",
            [(256, 3, [2]), (257, 3, [2]), (258, 3, [8, 8, 8]),
             (259, 3, [1]), (262, 3, [1]), (277, 3, [3]),
             (284, 3, [2]), (322, 3, [2]), (323, 3, [2]),
             (324, 4, ["OFF:0", "OFF:1", "OFF:2"]),
             (325, 4, ["LEN:0", "LEN:1", "LEN:2"])],
            planes,
        ),
        _build_tiff_ifd(
            "big",
            [(256, 3, [2]), (257, 3, [2]), (258, 3, [16]),
             (259, 3, [1]), (262, 3, [0]), (273, 4, ["OFF:0"]),
             (277, 3, [1]), (278, 3, [2]), (279, 4, ["LEN:0"]),
             (317, 3, [2])],
            [struct.pack(">4H", 0x1234, 0x0100, 0xFF00, 0x0101)],
        ),
    ]
    rng = np.random.default_rng(17)
    for base in bases:
        for _ in range(300):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                buf[int(rng.integers(0, len(buf)))] ^= 1 << int(
                    rng.integers(0, 8)
                )
            try:
                out = decode_tiff(bytes(buf))
                assert out.dtype == np.uint8
            except ValueError:
                pass
