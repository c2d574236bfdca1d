package graft.functions.expressions

/** Native VP8 INTRA-KEYFRAME decoder (RFC 6386) for the lossy leg of
  * WebP content identity: boolean arithmetic decoder, keyframe header
  * (segmentation, loop-filter params, multi-partition tokens, quantizer
  * indices, coefficient-probability updates), intra mode parsing
  * (16x16, chroma, and full 4x4 B_PRED with keyframe context trees),
  * token decoding with band/context machinery, per-segment
  * dequantization, the inverse WHT (Y2) and 4x4 iDCT, all intra
  * predictors, and the normal in-loop deblocking filter — to raw YUV420
  * planes, the NORMATIVE decoder output (no upsampler/colorspace
  * choices). Differential-verified BYTE-EXACT against the system
  * libwebp's own YUV reconstruction on vendored fixtures
  * (WebpVp8DifferentialSpec); returns null on anything unclean (fuzz:
  * never throws).
  *
  * Probability/quantizer tables are the normative RFC 6386 §13/§11
  * constants (values extracted from the system libwebp read-only data
  * and verified by the byte-exact differential). WHY lossy VP8: CDN
  * re-encodes of JPEG/PNG are overwhelmingly lossy WebP — VP8L-only
  * coverage left the dominant duplicate class at byte level
  * (round-14 verdict item #2).
  */
private[expressions] object Vp8Decode {

  // ---- normative tables (RFC 6386) ----
  val AcQ: Array[Int] = Array(
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284)
  val DcQ: Array[Int] = Array(
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157)
  val CoeffUpdateProba: Array[Int] = Array(
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255, 223, 241, 252, 255,
    255, 255, 255, 255, 255, 255, 255, 249, 253, 253, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255, 234, 254, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 253, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255, 239, 253,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 254, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255, 251,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 254, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 254, 253, 255, 254, 255, 255, 255, 255, 255,
    255, 250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 217, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255, 234, 250,
    241, 250, 253, 255, 253, 254, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 238,
    253, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 248, 254, 255, 255, 255,
    255, 255, 255, 255, 255, 249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 253, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 247, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 253, 254, 255,
    255, 255, 255, 255, 255, 255, 255, 252, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 253, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 250, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255, 234, 251, 244, 254, 255,
    255, 255, 255, 255, 255, 255, 251, 251, 243, 253, 254, 255, 254, 255, 255, 255,
    255, 255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 236, 253, 254, 255,
    255, 255, 255, 255, 255, 255, 255, 251, 253, 253, 254, 254, 255, 255, 255, 255,
    255, 255, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 254, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 248, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255, 248, 254,
    249, 253, 255, 255, 255, 255, 255, 255, 255, 255, 253, 253, 255, 255, 255, 255,
    255, 255, 255, 255, 246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255, 252,
    254, 251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 254, 252, 255, 255, 255,
    255, 255, 255, 255, 255, 248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 251, 254, 255, 255,
    255, 255, 255, 255, 255, 255, 245, 251, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 251, 253, 255,
    255, 255, 255, 255, 255, 255, 255, 252, 253, 254, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 252, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 249, 255, 254, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 250, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)
  val KfBModeProba: Array[Int] = Array(
    231, 120, 48, 89, 115, 113, 120, 152, 112, 152, 179, 64, 126, 170, 118, 46,
    70, 95, 175, 69, 143, 80, 85, 82, 72, 155, 103, 56, 58, 10, 171, 218,
    189, 17, 13, 152, 114, 26, 17, 163, 44, 195, 21, 10, 173, 121, 24, 80,
    195, 26, 62, 44, 64, 85, 144, 71, 10, 38, 171, 213, 144, 34, 26, 170,
    46, 55, 19, 136, 160, 33, 206, 71, 63, 20, 8, 114, 114, 208, 12, 9,
    226, 81, 40, 11, 96, 182, 84, 29, 16, 36, 134, 183, 89, 137, 98, 101,
    106, 165, 148, 72, 187, 100, 130, 157, 111, 32, 75, 80, 66, 102, 167, 99,
    74, 62, 40, 234, 128, 41, 53, 9, 178, 241, 141, 26, 8, 107, 74, 43,
    26, 146, 73, 166, 49, 23, 157, 65, 38, 105, 160, 51, 52, 31, 115, 128,
    104, 79, 12, 27, 217, 255, 87, 17, 7, 87, 68, 71, 44, 114, 51, 15,
    186, 23, 47, 41, 14, 110, 182, 183, 21, 17, 194, 66, 45, 25, 102, 197,
    189, 23, 18, 22, 88, 88, 147, 150, 42, 46, 45, 196, 205, 43, 97, 183,
    117, 85, 38, 35, 179, 61, 39, 53, 200, 87, 26, 21, 43, 232, 171, 56,
    34, 51, 104, 114, 102, 29, 93, 77, 39, 28, 85, 171, 58, 165, 90, 98,
    64, 34, 22, 116, 206, 23, 34, 43, 166, 73, 107, 54, 32, 26, 51, 1,
    81, 43, 31, 68, 25, 106, 22, 64, 171, 36, 225, 114, 34, 19, 21, 102,
    132, 188, 16, 76, 124, 62, 18, 78, 95, 85, 57, 50, 48, 51, 193, 101,
    35, 159, 215, 111, 89, 46, 111, 60, 148, 31, 172, 219, 228, 21, 18, 111,
    112, 113, 77, 85, 179, 255, 38, 120, 114, 40, 42, 1, 196, 245, 209, 10,
    25, 109, 88, 43, 29, 140, 166, 213, 37, 43, 154, 61, 63, 30, 155, 67,
    45, 68, 1, 209, 100, 80, 8, 43, 154, 1, 51, 26, 71, 142, 78, 78,
    16, 255, 128, 34, 197, 171, 41, 40, 5, 102, 211, 183, 4, 1, 221, 51,
    50, 17, 168, 209, 192, 23, 25, 82, 138, 31, 36, 171, 27, 166, 38, 44,
    229, 67, 87, 58, 169, 82, 115, 26, 59, 179, 63, 59, 90, 180, 59, 166,
    93, 73, 154, 40, 40, 21, 116, 143, 209, 34, 39, 175, 47, 15, 16, 183,
    34, 223, 49, 45, 183, 46, 17, 33, 183, 6, 98, 15, 32, 183, 57, 46,
    22, 24, 128, 1, 54, 17, 37, 65, 32, 73, 115, 28, 128, 23, 128, 205,
    40, 3, 9, 115, 51, 192, 18, 6, 223, 87, 37, 9, 115, 59, 77, 64,
    21, 47, 104, 55, 44, 218, 9, 54, 53, 130, 226, 64, 90, 70, 205, 40,
    41, 23, 26, 57, 54, 57, 112, 184, 5, 41, 38, 166, 213, 30, 34, 26,
    133, 152, 116, 10, 32, 134, 39, 19, 53, 221, 26, 114, 32, 73, 255, 31,
    9, 65, 234, 2, 15, 1, 118, 73, 75, 32, 12, 51, 192, 255, 160, 43,
    51, 88, 31, 35, 67, 102, 85, 55, 186, 85, 56, 21, 23, 111, 59, 205,
    45, 37, 192, 55, 38, 70, 124, 73, 102, 1, 34, 98, 125, 98, 42, 88,
    104, 85, 117, 175, 82, 95, 84, 53, 89, 128, 100, 113, 101, 45, 75, 79,
    123, 47, 51, 128, 81, 171, 1, 57, 17, 5, 71, 102, 57, 53, 41, 49,
    38, 33, 13, 121, 57, 73, 26, 1, 85, 41, 10, 67, 138, 77, 110, 90,
    47, 114, 115, 21, 2, 10, 102, 255, 166, 23, 6, 101, 29, 16, 10, 85,
    128, 101, 196, 26, 57, 18, 10, 102, 102, 213, 34, 20, 43, 117, 20, 15,
    36, 163, 128, 68, 1, 26, 102, 61, 71, 37, 34, 53, 31, 243, 192, 69,
    60, 71, 38, 73, 119, 28, 222, 37, 68, 45, 128, 34, 1, 47, 11, 245,
    171, 62, 17, 19, 70, 146, 85, 55, 62, 70, 37, 43, 37, 154, 100, 163,
    85, 160, 1, 63, 9, 92, 136, 28, 64, 32, 201, 85, 75, 15, 9, 9,
    64, 255, 184, 119, 16, 86, 6, 28, 5, 64, 255, 25, 248, 1, 56, 8,
    17, 132, 137, 255, 55, 116, 128, 58, 15, 20, 82, 135, 57, 26, 121, 40,
    164, 50, 31, 137, 154, 133, 25, 35, 218, 51, 103, 44, 131, 131, 123, 31,
    6, 158, 86, 40, 64, 135, 148, 224, 45, 183, 128, 22, 26, 17, 131, 240,
    154, 14, 1, 209, 45, 16, 21, 91, 64, 222, 7, 1, 197, 56, 21, 39,
    155, 60, 138, 23, 102, 213, 83, 12, 13, 54, 192, 255, 68, 47, 28, 85,
    26, 85, 85, 128, 128, 32, 146, 171, 18, 11, 7, 63, 144, 171, 4, 4,
    246, 35, 27, 10, 146, 174, 171, 12, 26, 128, 190, 80, 35, 99, 180, 80,
    126, 54, 45, 85, 126, 47, 87, 176, 51, 41, 20, 32, 101, 75, 128, 139,
    118, 146, 116, 128, 85, 56, 41, 15, 176, 236, 85, 37, 9, 62, 71, 30,
    17, 119, 118, 255, 17, 18, 138, 101, 38, 60, 138, 55, 70, 43, 26, 142,
    146, 36, 19, 30, 171, 255, 97, 27, 20, 138, 45, 61, 62, 219, 1, 81,
    188, 64, 32, 41, 20, 117, 151, 142, 20, 21, 163, 112, 19, 12, 61, 195,
    128, 48, 4, 24)
  val CoeffProba0: Array[Int] = Array(
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128, 189, 129, 242, 255,
    227, 213, 255, 219, 128, 128, 128, 106, 126, 227, 252, 214, 209, 255, 255, 128,
    128, 128, 1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128, 181, 133, 238,
    254, 221, 234, 255, 154, 128, 128, 128, 78, 134, 202, 247, 198, 180, 255, 219,
    128, 128, 128, 1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128, 184, 150,
    247, 255, 236, 224, 128, 128, 128, 128, 128, 77, 110, 216, 255, 236, 230, 128,
    128, 128, 128, 128, 1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128, 170,
    139, 241, 252, 236, 209, 255, 255, 128, 128, 128, 37, 116, 196, 243, 228, 255,
    255, 255, 128, 128, 128, 1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128,
    207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128, 102, 103, 231, 255, 211,
    171, 128, 128, 128, 128, 128, 1, 152, 252, 255, 240, 255, 128, 128, 128, 128,
    128, 177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128, 80, 129, 211, 255,
    194, 224, 128, 128, 128, 128, 128, 1, 1, 255, 128, 128, 128, 128, 128, 128,
    128, 128, 246, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128, 255, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 198, 35, 237, 223, 193, 187, 162, 160,
    145, 155, 62, 131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1, 68, 47,
    146, 208, 149, 167, 221, 162, 255, 223, 128, 1, 149, 241, 255, 221, 224, 255,
    255, 128, 128, 128, 184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128, 81,
    99, 181, 242, 176, 190, 249, 202, 255, 255, 128, 1, 129, 232, 253, 214, 197,
    242, 196, 255, 255, 128, 99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128,
    23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128, 1, 200, 246, 255, 234,
    255, 128, 128, 128, 128, 128, 109, 178, 241, 255, 231, 245, 255, 255, 128, 128,
    128, 44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128, 1, 132, 239, 251,
    219, 209, 255, 165, 128, 128, 128, 94, 136, 225, 251, 218, 190, 255, 255, 128,
    128, 128, 22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128, 1, 182, 249,
    255, 232, 235, 128, 128, 128, 128, 128, 124, 143, 241, 255, 227, 234, 128, 128,
    128, 128, 128, 35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128, 1, 157,
    247, 255, 236, 231, 255, 255, 128, 128, 128, 121, 141, 235, 255, 225, 227, 255,
    255, 128, 128, 128, 45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128, 1,
    1, 251, 255, 213, 255, 128, 128, 128, 128, 128, 203, 1, 248, 255, 255, 128,
    128, 128, 128, 128, 128, 137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128,
    253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128, 175, 13, 224, 243, 193,
    185, 249, 198, 255, 255, 128, 73, 17, 171, 221, 161, 179, 236, 167, 255, 234,
    128, 1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128, 239, 90, 244, 250,
    211, 209, 255, 255, 128, 128, 128, 155, 77, 195, 248, 188, 195, 255, 255, 128,
    128, 128, 1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128, 201, 51, 219,
    255, 196, 186, 128, 128, 128, 128, 128, 69, 46, 190, 239, 201, 218, 255, 228,
    128, 128, 128, 1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128, 223, 165,
    249, 255, 213, 255, 128, 128, 128, 128, 128, 141, 124, 248, 255, 255, 128, 128,
    128, 128, 128, 128, 1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128, 190,
    36, 230, 255, 236, 255, 128, 128, 128, 128, 128, 149, 1, 255, 128, 128, 128,
    128, 128, 128, 128, 128, 1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128, 240, 128, 255, 128, 128,
    128, 128, 128, 128, 128, 128, 1, 134, 252, 255, 255, 128, 128, 128, 128, 128,
    128, 213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128, 55, 93, 255, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 202, 24, 213, 235, 186, 191, 220, 160,
    240, 175, 255, 126, 38, 182, 232, 169, 184, 228, 174, 255, 187, 128, 61, 46,
    138, 219, 151, 178, 240, 170, 255, 216, 128, 1, 112, 230, 250, 199, 191, 247,
    159, 255, 255, 128, 166, 109, 228, 252, 211, 215, 255, 174, 128, 128, 128, 39,
    77, 162, 232, 172, 180, 245, 178, 255, 255, 128, 1, 52, 220, 246, 198, 199,
    249, 220, 255, 255, 128, 124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128,
    24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128, 1, 182, 225, 249, 219,
    240, 255, 224, 128, 128, 128, 149, 150, 226, 252, 216, 205, 255, 171, 128, 128,
    128, 28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128, 1, 81, 230, 252,
    204, 203, 255, 192, 128, 128, 128, 123, 102, 209, 247, 188, 196, 255, 233, 128,
    128, 128, 20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128, 1, 222, 248,
    255, 216, 213, 128, 128, 128, 128, 128, 168, 175, 246, 252, 235, 205, 255, 255,
    128, 128, 128, 47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128, 1, 121,
    236, 253, 212, 214, 255, 255, 128, 128, 128, 141, 84, 213, 252, 201, 202, 255,
    219, 128, 128, 128, 42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128, 1,
    1, 255, 128, 128, 128, 128, 128, 128, 128, 128, 244, 1, 255, 128, 128, 128,
    128, 128, 128, 128, 128, 238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128)

  /** Keyframe Y-mode tree and fixed probs (RFC 6386 s11.2); modes:
    * 0=DC 1=V 2=H 3=TM 4=B_PRED.
    */
  private[expressions] val KfYModeTree = Array(-4, 2, 4, 6, -0, -1, -2, -3)
  private[expressions] val KfYModeProb = Array(145, 156, 163, 128)
  private[expressions] val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
  private[expressions] val KfUvModeProb = Array(142, 114, 183)

  /** 4x4 submode tree (RFC 6386 s11.5) in the DECODING-TABLE numbering
    * the extracted kBModesProba rows are indexed with (libwebp's enum,
    * which swaps the RFC's LD/RD/VR block): B_DC=0 B_TM=1 B_VE=2 B_HE=3
    * B_RD=4 B_VR=5 B_LD=6 B_VL=7 B_HD=8 B_HU=9. [[predict4]] uses the
    * same numbering.
    */
  private[expressions] val BModeTree = Array(
    -0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, -6, 14, -7, 16, -8, -9)

  /** Token tree (RFC 6386 s13.2): leaves 0..4 literal values, 5..10 the
    * six extra-bit categories, 11 = EOB.
    */
  private[expressions] val TokenTree = Array(
    -11, 2, -0, 4, -1, 6, 8, 12, -2, 10, -3, -4, 14, 16, -5, -6, 18, 20, -7, -8, -9, -10)
  private[expressions] val CatProbs: Array[Array[Int]] = Array(
    Array(159), Array(165, 145), Array(173, 148, 140), Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130), Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private[expressions] val CatBase = Array(5, 7, 11, 19, 35, 67)

  /** Coefficient-position -> probability band (RFC 6386 s13.3). */
  private[expressions] val Bands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  /** Zigzag scan. */
  private[expressions] val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private[expressions] val SegTree = Array(2, 4, -0, -1, -2, -3)

  private object Bad extends RuntimeException with scala.util.control.NoStackTrace
  private def bad(): Nothing = throw Bad


  /** RFC 6386 s7.3 boolean arithmetic decoder (reads zeros past end). */
  private final class Br(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var range = 255
    private var value = 0
    private var bitCount = 0
    private def nextByte(): Int =
      if (pos < end) { val v = b(pos) & 0xff; pos += 1; v } else 0
    value = (nextByte() << 8) | nextByte()

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigsplit = split << 8
      var ret = 0
      if (value >= bigsplit) { ret = 1; range -= split; value -= bigsplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= nextByte() }
      }
      ret
    }

    def lit(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    def slit(n: Int): Int = { val v = lit(n); if (bool(128) == 1) -v else v }

    def flagged(n: Int): Int = if (bool(128) == 1) slit(n) else 0

    /** Generic tree read; `probs(node >> 1)` indexes the probability. */
    def tree(t: Array[Int], probs: Array[Int], startIdx: Int = 0): Int = {
      var i = startIdx
      while (true) {
        i = t(i + bool(probs(i >> 1)))
        if (i <= 0) return -i
      }
      -1 // unreachable
    }

    /** Token tree with a probability base offset into a flat table. */
    def treeFlat(t: Array[Int], probs: Array[Int], probOff: Int, startIdx: Int): Int = {
      var i = startIdx
      while (true) {
        i = t(i + bool(probs(probOff + (i >> 1))))
        if (i <= 0) return -i
      }
      -1 // unreachable
    }
  }

  /** Decoded frame: padded planes (strides are MB multiples) + the
    * logical crop.
    */
  final case class Frame(
      y: Array[Int], u: Array[Int], v: Array[Int],
      w: Int, h: Int, yStride: Int, uvStride: Int)

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def clipQ(v: Int, hi: Int): Int = if (v < 0) 0 else if (v > hi) hi else v
  private def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
  private def avg3(a: Int, b: Int, c: Int): Int = (a + 2 * b + c + 2) >> 2
  private def mul1(a: Int): Int = ((a * 20091) >> 16) + a
  private def mul2(a: Int): Int = (a * 35468) >> 16

  /** Decode the `VP8 ` payload at [start, end) to YUV420, null if not a
    * cleanly-decodable intra keyframe. Never throws.
    */
  def decode(b: Array[Byte], start: Int, end: Int): Frame =
    try decodeOrBad(b, start, end)
    catch { case Bad => null; case scala.util.control.NonFatal(_) => null }

  private def decodeOrBad(b: Array[Byte], start: Int, end: Int): Frame = {
    if (end - start < 10) bad()
    val tag = (b(start) & 0xff) | ((b(start + 1) & 0xff) << 8) | ((b(start + 2) & 0xff) << 16)
    if ((tag & 1) != 0) bad() // interframe: not a standalone payload
    val firstPartSize = tag >> 5
    if ((b(start + 3) & 0xff) != 0x9d || (b(start + 4) & 0xff) != 0x01 ||
        (b(start + 5) & 0xff) != 0x2a) bad()
    val w = ((b(start + 6) & 0xff) | ((b(start + 7) & 0xff) << 8)) & 0x3fff
    val h = ((b(start + 8) & 0xff) | ((b(start + 9) & 0xff) << 8)) & 0x3fff
    if (w <= 0 || h <= 0 || w.toLong * h > 67108864L) bad()
    val part0 = start + 10
    if (part0 + firstPartSize > end) bad()
    val br = new Br(b, part0, part0 + firstPartSize)

    br.lit(1) // color space (0 only in practice)
    br.lit(1) // clamping type

    // ---- segmentation ----
    val segEnabled = br.lit(1) == 1
    var updateMap = false
    var segAbs = false
    val segQ = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segProbs = Array(255, 255, 255)
    if (segEnabled) {
      updateMap = br.lit(1) == 1
      val updData = br.lit(1) == 1
      if (updData) {
        segAbs = br.lit(1) == 1
        var i = 0
        while (i < 4) { segQ(i) = br.flagged(7); i += 1 }
        i = 0
        while (i < 4) { segLf(i) = br.flagged(6); i += 1 }
      }
      if (updateMap) {
        var i = 0
        while (i < 3) { if (br.bool(128) == 1) segProbs(i) = br.lit(8); i += 1 }
      }
    }

    // ---- loop filter header ----
    val simpleFilter = br.lit(1) == 1
    val filterLevel = br.lit(6)
    val sharpness = br.lit(3)
    var lfDelta = false
    val refDelta = new Array[Int](4)
    val modeDelta = new Array[Int](4)
    lfDelta = br.lit(1) == 1
    if (lfDelta) {
      if (br.lit(1) == 1) {
        var i = 0
        while (i < 4) { if (br.bool(128) == 1) refDelta(i) = br.slit(6); i += 1 }
        i = 0
        while (i < 4) { if (br.bool(128) == 1) modeDelta(i) = br.slit(6); i += 1 }
      }
    }

    // ---- token partitions ----
    val nParts = 1 << br.lit(2)
    val sizesAt = part0 + firstPartSize
    val partBrs = new Array[Br](nParts)
    var dataAt = sizesAt + 3 * (nParts - 1)
    if (dataAt > end) bad()
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi == nParts - 1) end - dataAt
        else (b(sizesAt + 3 * pi) & 0xff) | ((b(sizesAt + 3 * pi + 1) & 0xff) << 8) |
          ((b(sizesAt + 3 * pi + 2) & 0xff) << 16)
      if (sz < 0 || dataAt + sz > end) bad()
      partBrs(pi) = new Br(b, dataAt, dataAt + sz)
      dataAt += sz
      pi += 1
    }

    // ---- quantizers (per segment) ----
    val yAcQi = br.lit(7)
    val yDcD = br.flagged(4)
    val y2DcD = br.flagged(4)
    val y2AcD = br.flagged(4)
    val uvDcD = br.flagged(4)
    val uvAcD = br.flagged(4)
    val nSeg = if (segEnabled) 4 else 1
    val qy1dc = new Array[Int](nSeg); val qy1ac = new Array[Int](nSeg)
    val qy2dc = new Array[Int](nSeg); val qy2ac = new Array[Int](nSeg)
    val quvdc = new Array[Int](nSeg); val quvac = new Array[Int](nSeg)
    var s = 0
    while (s < nSeg) {
      val q =
        if (!segEnabled) yAcQi
        else if (segAbs) segQ(s)
        else yAcQi + segQ(s)
      qy1dc(s) = DcQ(clipQ(q + yDcD, 127))
      qy1ac(s) = AcQ(clipQ(q, 127))
      qy2dc(s) = DcQ(clipQ(q + y2DcD, 127)) * 2
      qy2ac(s) = { val v = AcQ(clipQ(q + y2AcD, 127)) * 155 / 100; if (v < 8) 8 else v }
      quvdc(s) = DcQ(clipQ(q + uvDcD, 117))
      quvac(s) = AcQ(clipQ(q + uvAcD, 127))
      s += 1
    }

    br.lit(1) // refresh entropy (keyframe: ignore)

    // ---- coefficient probabilities (defaults + flagged updates) ----
    val probs = new Array[Int](4 * 8 * 3 * 11)
    System.arraycopy(CoeffProba0, 0, probs, 0, probs.length)
    var idx = 0
    while (idx < probs.length) {
      if (br.bool(CoeffUpdateProba(idx)) == 1) probs(idx) = br.lit(8)
      idx += 1
    }

    val mbNoSkip = br.lit(1) == 1
    val skipProb = if (mbNoSkip) br.lit(8) else 0

    // ---- per-MB mode parse (rest of partition 0, raster order) ----
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val ymodes = new Array[Byte](mbW * mbH)
    val uvmodes = new Array[Byte](mbW * mbH)
    val skips = new Array[Boolean](mbW * mbH)
    val segs = new Array[Byte](mbW * mbH)
    val submodes = new Array[Byte](mbW * mbH * 16) // row-major 4x4 per MB
    val aboveSub = new Array[Byte](4 * mbW) // B_DC
    val leftSub = new Array[Byte](4)
    var mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(leftSub, 0.toByte)
      var mbX = 0
      while (mbX < mbW) {
        val mi = mbY * mbW + mbX
        if (updateMap) segs(mi) = br.tree(SegTree, segProbs).toByte
        if (mbNoSkip) skips(mi) = br.bool(skipProb) == 1
        val ym = br.tree(KfYModeTree, KfYModeProb)
        ymodes(mi) = ym.toByte
        if (ym == 4) { // B_PRED: 16 submodes with (above, left) context
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2; val c = sb & 3
            val a = if (r == 0) aboveSub(mbX * 4 + c) else submodes(mi * 16 + sb - 4)
            val l = if (c == 0) leftSub(r) else submodes(mi * 16 + sb - 1)
            val m = br.tree(BModeTree,
              java.util.Arrays.copyOfRange(KfBModeProba, (a * 10 + l) * 9, (a * 10 + l) * 9 + 9))
            submodes(mi * 16 + sb) = m.toByte
            sb += 1
          }
          var i = 0
          while (i < 4) {
            aboveSub(mbX * 4 + i) = submodes(mi * 16 + 12 + i)
            leftSub(i) = submodes(mi * 16 + i * 4 + 3)
            i += 1
          }
        } else {
          // implied submode for neighbor context: DC->B_DC, V->B_VE,
          // H->B_HE, TM->B_TM
          val implied = ym match {
            case 0 => 0; case 1 => 2; case 2 => 3; case _ => 1
          }
          var i = 0
          while (i < 4) {
            aboveSub(mbX * 4 + i) = implied.toByte
            leftSub(i) = implied.toByte
            i += 1
          }
        }
        uvmodes(mi) = br.tree(UvModeTree, KfUvModeProb).toByte
        mbX += 1
      }
      mbY += 1
    }

    // ---- residuals + reconstruction ----
    val yStride = mbW * 16
    val uvStride = mbW * 8
    val yP = new Array[Int](yStride * mbH * 16)
    val uP = new Array[Int](uvStride * mbH * 8)
    val vP = new Array[Int](uvStride * mbH * 8)

    val coeffs = new Array[Int](25 * 16) // 16 Y + 4 U + 4 V + Y2 last
    // nonzero contexts: per-subblock bits
    val aboveNzY = new Array[Int](4 * mbW)
    val aboveNzU = new Array[Int](2 * mbW)
    val aboveNzV = new Array[Int](2 * mbW)
    val aboveNzDc = new Array[Int](mbW)
    val leftNzY = new Array[Int](4)
    val leftNzU = new Array[Int](2)
    val leftNzV = new Array[Int](2)
    var leftNzDc = 0
    val hasCoeffs = new Array[Boolean](mbW * mbH)

    mbY = 0
    while (mbY < mbH) {
      val tbr = partBrs(mbY & (nParts - 1))
      java.util.Arrays.fill(leftNzY, 0)
      java.util.Arrays.fill(leftNzU, 0)
      java.util.Arrays.fill(leftNzV, 0)
      leftNzDc = 0
      var mbX = 0
      while (mbX < mbW) {
        val mi = mbY * mbW + mbX
        val seg = if (segEnabled) segs(mi) & 0xff else 0
        val i4 = ymodes(mi) == 4
        java.util.Arrays.fill(coeffs, 0)
        var any = false
        if (skips(mi)) {
          var i = 0
          while (i < 4) { leftNzY(i) = 0; aboveNzY(mbX * 4 + i) = 0; i += 1 }
          i = 0
          while (i < 2) {
            leftNzU(i) = 0; aboveNzU(mbX * 2 + i) = 0
            leftNzV(i) = 0; aboveNzV(mbX * 2 + i) = 0
            i += 1
          }
          if (!i4) { leftNzDc = 0; aboveNzDc(mbX) = 0 }
        } else {
          var first = 0
          var ytype = 3
          if (!i4) {
            // Y2
            val ctx = leftNzDc + aboveNzDc(mbX)
            val n = decodeCoeffs(tbr, probs, 1, ctx, 0, qy2dc(seg), qy2ac(seg),
              coeffs, 24 * 16)
            val nz = if (n > 0) 1 else 0
            leftNzDc = nz; aboveNzDc(mbX) = nz
            if (nz == 1) any = true
            iwht(coeffs, 24 * 16)
            first = 1
            ytype = 0
          }
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2; val c = sb & 3
            val ctx = leftNzY(r) + aboveNzY(mbX * 4 + c)
            val n = decodeCoeffs(tbr, probs, ytype, ctx, first,
              qy1dc(seg), qy1ac(seg), coeffs, sb * 16)
            val nz = if (n > first) 1 else 0
            leftNzY(r) = nz; aboveNzY(mbX * 4 + c) = nz
            if (nz == 1) any = true
            sb += 1
          }
          var pl = 0
          while (pl < 2) {
            val (leftNzC, aboveNzC) = if (pl == 0) (leftNzU, aboveNzU) else (leftNzV, aboveNzV)
            var sb2 = 0
            while (sb2 < 4) {
              val r = sb2 >> 1; val c = sb2 & 1
              val ctx = leftNzC(r) + aboveNzC(mbX * 2 + c)
              val n = decodeCoeffs(tbr, probs, 2, ctx, 0,
                quvdc(seg), quvac(seg), coeffs, (16 + pl * 4 + sb2) * 16)
              val nz = if (n > 0) 1 else 0
              leftNzC(r) = nz; aboveNzC(mbX * 2 + c) = nz
              if (nz == 1) any = true
              sb2 += 1
            }
            pl += 1
          }
        }
        hasCoeffs(mi) = any
        // Y2 dc scatter: each Y block's coeff 0 comes from the iWHT
        if (!i4 && !skips(mi)) {
          var i = 0
          while (i < 16) { coeffs(i * 16) = coeffs(24 * 16 + i); i += 1 }
        }
        reconstructMb(yP, uP, vP, yStride, uvStride, mbW, mbH, mbX, mbY,
          ymodes(mi), uvmodes(mi), submodes, mi, coeffs)
        mbX += 1
      }
      mbY += 1
    }

    // ---- loop filter ----
    if (filterLevel > 0) {
      mbY = 0
      while (mbY < mbH) {
        var mbX = 0
        while (mbX < mbW) {
          val mi = mbY * mbW + mbX
          val i4 = ymodes(mi) == 4
          val seg = if (segEnabled) segs(mi) & 0xff else 0
          var level =
            if (!segEnabled) filterLevel
            else if (segAbs) segLf(seg)
            else filterLevel + segLf(seg)
          if (lfDelta) {
            level += refDelta(0) // keyframe: INTRA ref
            if (i4) level += modeDelta(0)
          }
          if (level < 0) level = 0
          if (level > 63) level = 63
          if (level > 0) {
            var ilimit = level
            if (sharpness > 0) {
              ilimit >>= (if (sharpness > 4) 2 else 1)
              if (ilimit > 9 - sharpness) ilimit = 9 - sharpness
            }
            if (ilimit < 1) ilimit = 1
            val hevT = if (level >= 40) 2 else if (level >= 15) 1 else 0
            val edgeE = ((level + 2) * 2) + ilimit
            val innerE = (level * 2) + ilimit
            val inner = hasCoeffs(mi) || i4
            if (simpleFilter) {
              filterMbSimple(yP, yStride, mbX, mbY, edgeE, innerE, inner)
            } else {
              filterMbNormal(yP, uP, vP, yStride, uvStride, mbX, mbY,
                edgeE, innerE, ilimit, hevT, inner)
            }
          }
          mbX += 1
        }
        mbY += 1
      }
    }

    Frame(yP, uP, vP, w, h, yStride, uvStride)
  }

  /** Token run for one 4x4 block; returns the position AFTER the last
    * nonzero coefficient (n > firstCoeff means the block has one).
    */
  private def decodeCoeffs(
      br: Br, probs: Array[Int], blockType: Int, ctx0: Int, firstCoeff: Int,
      qdc: Int, qac: Int, out: Array[Int], off: Int): Int = {
    var n = firstCoeff
    var ctx = ctx0
    var startIdx = 0 // 2 after a zero token: EOB cannot follow DCT_0
    var last = firstCoeff
    while (n < 16) {
      val probOff = ((blockType * 8 + Bands(n)) * 3 + ctx) * 11
      val token = br.treeFlat(TokenTree, probs, probOff, startIdx)
      if (token == 11) return last // EOB
      if (token == 0) {
        ctx = 0; startIdx = 2; n += 1
      } else {
        startIdx = 0
        var value = 0
        if (token <= 4) {
          value = token
          ctx = if (token == 1) 1 else 2
        } else {
          val cat = token - 5
          val cp = CatProbs(cat)
          var i = 0
          while (i < cp.length) { value = (value << 1) | br.bool(cp(i)); i += 1 }
          value += CatBase(cat)
          ctx = 2
        }
        if (br.bool(128) == 1) value = -value
        out(off + Zigzag(n)) = value * (if (n == 0) qdc else qac)
        n += 1
        last = n
      }
    }
    last
  }

  /** Inverse WHT (Y2): 16 DCs for the luma blocks (RFC 6386 s14.3). */
  private def iwht(c: Array[Int], off: Int): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a0 = c(off + i) + c(off + 12 + i)
      val a1 = c(off + 4 + i) + c(off + 8 + i)
      val a2 = c(off + 4 + i) - c(off + 8 + i)
      val a3 = c(off + i) - c(off + 12 + i)
      tmp(i) = a0 + a1
      tmp(8 + i) = a0 - a1
      tmp(4 + i) = a3 + a2
      tmp(12 + i) = a3 - a2
      i += 1
    }
    i = 0
    while (i < 4) {
      val dc = tmp(i * 4) + 3
      val a0 = dc + tmp(i * 4 + 3)
      val a1 = tmp(i * 4 + 1) + tmp(i * 4 + 2)
      val a2 = tmp(i * 4 + 1) - tmp(i * 4 + 2)
      val a3 = dc - tmp(i * 4 + 3)
      c(off + i * 4) = (a0 + a1) >> 3
      c(off + i * 4 + 1) = (a3 + a2) >> 3
      c(off + i * 4 + 2) = (a0 - a1) >> 3
      c(off + i * 4 + 3) = (a3 - a2) >> 3
      i += 1
    }
  }

  /** 4x4 inverse DCT, ADDED into the plane at (x0, y0) (RFC 6386 s14.4). */
  private def idctAdd(
      plane: Array[Int], stride: Int, x0: Int, y0: Int,
      c: Array[Int], off: Int): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a = c(off + i) + c(off + 8 + i)
      val b = c(off + i) - c(off + 8 + i)
      val cc = mul2(c(off + 4 + i)) - mul1(c(off + 12 + i))
      val d = mul1(c(off + 4 + i)) + mul2(c(off + 12 + i))
      tmp(i * 4) = a + d
      tmp(i * 4 + 1) = b + cc
      tmp(i * 4 + 2) = b - cc
      tmp(i * 4 + 3) = a - d
      i += 1
    }
    i = 0
    while (i < 4) {
      val dc = tmp(i) + 4
      val a = dc + tmp(8 + i)
      val b = dc - tmp(8 + i)
      val cc = mul2(tmp(4 + i)) - mul1(tmp(12 + i))
      val d = mul1(tmp(4 + i)) + mul2(tmp(12 + i))
      val base = (y0 + i) * stride + x0
      plane(base) = clip255(plane(base) + ((a + d) >> 3))
      plane(base + 1) = clip255(plane(base + 1) + ((b + cc) >> 3))
      plane(base + 2) = clip255(plane(base + 2) + ((b - cc) >> 3))
      plane(base + 3) = clip255(plane(base + 3) + ((a - d) >> 3))
      i += 1
    }
  }
  /** Neighbor fetch with the RFC border conventions: virtual row -1 is
    * 127, virtual column -1 is 129 (the top-left corner of MB(0,0) reads
    * 127 — part of the top row memset).
    */
  private def px(plane: Array[Int], stride: Int, wPix: Int, x: Int, y: Int): Int =
    if (y < 0) { if (x < 0) { if (y < 0) 127 else 129 } else 127 }
    else if (x < 0) 129
    else plane(y * stride + x)

  private def reconstructMb(
      yP: Array[Int], uP: Array[Int], vP: Array[Int],
      yStride: Int, uvStride: Int, mbW: Int, mbH: Int, mbX: Int, mbY: Int,
      ymode: Int, uvmode: Int, submodes: Array[Byte], mi: Int,
      coeffs: Array[Int]): Unit = {
    val yx = mbX * 16; val yy = mbY * 16
    val cx = mbX * 8; val cy = mbY * 8

    if (ymode != 4) {
      predictBlock(yP, yStride, yx, yy, 16, ymode, mbX > 0, mbY > 0)
      var sb = 0
      while (sb < 16) {
        idctAdd(yP, yStride, yx + (sb & 3) * 4, yy + (sb >> 2) * 4, coeffs, sb * 16)
        sb += 1
      }
    } else {
      // B_PRED: per-subblock predict + add, sequential (later subblocks
      // read earlier reconstructed pixels)
      // top-right pixels of the MB (above row, cols 16..19)
      val topRight = new Array[Int](4)
      var i = 0
      while (i < 4) {
        topRight(i) =
          if (mbY == 0) 127
          else if (mbX < mbW - 1) yP((yy - 1) * yStride + yx + 16 + i)
          else yP((yy - 1) * yStride + yx + 15)
        i += 1
      }
      var sb = 0
      while (sb < 16) {
        val r = sb >> 2; val c = sb & 3
        val x0 = yx + c * 4; val y0 = yy + r * 4
        val a = new Array[Int](8)
        var j = 0
        while (j < 4) { a(j) = px(yP, yStride, 0, x0 + j, y0 - 1); j += 1 }
        // above-right: right-column subblocks use the MB's top-right
        // pixels whatever their row (libwebp replicates them down)
        j = 0
        while (j < 4) {
          a(4 + j) =
            if (c == 3) topRight(j)
            else px(yP, yStride, 0, x0 + 4 + j, y0 - 1)
          j += 1
        }
        val l = new Array[Int](4)
        j = 0
        while (j < 4) { l(j) = px(yP, yStride, 0, x0 - 1, y0 + j); j += 1 }
        val tl = px(yP, yStride, 0, x0 - 1, y0 - 1)
        predict4(yP, yStride, x0, y0, submodes(mi * 16 + sb), a, l, tl)
        idctAdd(yP, yStride, x0, y0, coeffs, sb * 16)
        sb += 1
      }
    }

    predictBlock(uP, uvStride, cx, cy, 8, uvmode, mbX > 0, mbY > 0)
    predictBlock(vP, uvStride, cx, cy, 8, uvmode, mbX > 0, mbY > 0)
    var sb = 0
    while (sb < 4) {
      idctAdd(uP, uvStride, cx + (sb & 1) * 4, cy + (sb >> 1) * 4, coeffs, (16 + sb) * 16)
      idctAdd(vP, uvStride, cx + (sb & 1) * 4, cy + (sb >> 1) * 4, coeffs, (20 + sb) * 16)
      sb += 1
    }
  }

  /** Whole-block intra prediction (16x16 luma / 8x8 chroma):
    * 0=DC 1=V 2=H 3=TM (RFC 6386 s12.2).
    */
  private def predictBlock(
      plane: Array[Int], stride: Int, x0: Int, y0: Int, size: Int,
      mode: Int, haveLeft: Boolean, haveAbove: Boolean): Unit = {
    mode match {
      case 0 =>
        var sum = 0; var shift = 0
        if (haveAbove) {
          var i = 0
          while (i < size) { sum += plane((y0 - 1) * stride + x0 + i); i += 1 }
        }
        if (haveLeft) {
          var i = 0
          while (i < size) { sum += plane((y0 + i) * stride + x0 - 1); i += 1 }
        }
        val dc =
          if (haveAbove && haveLeft) { shift = if (size == 16) 5 else 4; (sum + (1 << (shift - 1))) >> shift }
          else if (haveAbove || haveLeft) { shift = if (size == 16) 4 else 3; (sum + (1 << (shift - 1))) >> shift }
          else 128
        fill(plane, stride, x0, y0, size, dc)
      case 1 =>
        var r = 0
        while (r < size) {
          var c = 0
          while (c < size) {
            plane((y0 + r) * stride + x0 + c) = px(plane, stride, 0, x0 + c, y0 - 1)
            c += 1
          }
          r += 1
        }
      case 2 =>
        var r = 0
        while (r < size) {
          val v = px(plane, stride, 0, x0 - 1, y0 + r)
          var c = 0
          while (c < size) { plane((y0 + r) * stride + x0 + c) = v; c += 1 }
          r += 1
        }
      case _ =>
        val p = px(plane, stride, 0, x0 - 1, y0 - 1)
        var r = 0
        while (r < size) {
          val l = px(plane, stride, 0, x0 - 1, y0 + r)
          var c = 0
          while (c < size) {
            plane((y0 + r) * stride + x0 + c) =
              clip255(l + px(plane, stride, 0, x0 + c, y0 - 1) - p)
            c += 1
          }
          r += 1
        }
    }
  }

  private def fill(plane: Array[Int], stride: Int, x0: Int, y0: Int, size: Int, v: Int): Unit = {
    var r = 0
    while (r < size) {
      var c = 0
      while (c < size) { plane((y0 + r) * stride + x0 + c) = v; c += 1 }
      r += 1
    }
  }

  /** 4x4 B_PRED subblock predictors (RFC 6386 s12.3). a(0..7) = above +
    * above-right, l(0..3) = left, tl = above-left.
    */
  private def predict4(
      plane: Array[Int], stride: Int, x0: Int, y0: Int, mode: Int,
      a: Array[Int], l: Array[Int], tl: Int): Unit = {
    @inline def set(r: Int, c: Int, v: Int): Unit = plane((y0 + r) * stride + x0 + c) = v
    mode match {
      case 0 => // B_DC
        var sum = 4; var i = 0
        while (i < 4) { sum += a(i) + l(i); i += 1 }
        val dc = sum >> 3
        var r = 0
        while (r < 4) { var c = 0; while (c < 4) { set(r, c, dc); c += 1 }; r += 1 }
      case 1 => // B_TM
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { set(r, c, clip255(l(r) + a(c) - tl)); c += 1 }
          r += 1
        }
      case 2 => // B_VE
        val v = Array(avg3(tl, a(0), a(1)), avg3(a(0), a(1), a(2)),
          avg3(a(1), a(2), a(3)), avg3(a(2), a(3), a(4)))
        var r = 0
        while (r < 4) { var c = 0; while (c < 4) { set(r, c, v(c)); c += 1 }; r += 1 }
      case 3 => // B_HE
        val v = Array(avg3(tl, l(0), l(1)), avg3(l(0), l(1), l(2)),
          avg3(l(1), l(2), l(3)), avg3(l(2), l(3), l(3)))
        var r = 0
        while (r < 4) { var c = 0; while (c < 4) { set(r, c, v(r)); c += 1 }; r += 1 }
      case 6 => // B_LD (down-left)
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val d = r + c
            set(r, c,
              if (d == 6) avg3(a(6), a(7), a(7))
              else avg3(a(d), a(d + 1), a(d + 2)))
            c += 1
          }
          r += 1
        }
      case 4 => // B_RD (down-right): edge L3 L2 L1 L0 TL A0 A1 A2 A3
        val e = Array(l(3), l(2), l(1), l(0), tl, a(0), a(1), a(2), a(3))
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { set(r, c, avg3(e(c - r + 3), e(c - r + 4), e(c - r + 5))); c += 1 }
          r += 1
        }
      case 5 => // B_VR
        val x = tl; val i0 = l(0); val j = l(1); val k = l(2)
        val aa = a(0); val bb = a(1); val cc = a(2); val dd = a(3)
        set(0, 0, avg2(x, aa)); set(2, 1, avg2(x, aa))
        set(0, 1, avg2(aa, bb)); set(2, 2, avg2(aa, bb))
        set(0, 2, avg2(bb, cc)); set(2, 3, avg2(bb, cc))
        set(0, 3, avg2(cc, dd))
        set(3, 0, avg3(k, j, i0))
        set(2, 0, avg3(j, i0, x))
        set(1, 0, avg3(i0, x, aa)); set(3, 1, avg3(i0, x, aa))
        set(1, 1, avg3(x, aa, bb)); set(3, 2, avg3(x, aa, bb))
        set(1, 2, avg3(aa, bb, cc)); set(3, 3, avg3(aa, bb, cc))
        set(1, 3, avg3(bb, cc, dd))
      case 7 => // B_VL
        val aa = a(0); val bb = a(1); val cc = a(2); val dd = a(3)
        val ee = a(4); val ff = a(5); val gg = a(6); val hh = a(7)
        set(0, 0, avg2(aa, bb))
        set(0, 1, avg2(bb, cc)); set(2, 0, avg2(bb, cc))
        set(0, 2, avg2(cc, dd)); set(2, 1, avg2(cc, dd))
        set(0, 3, avg2(dd, ee)); set(2, 2, avg2(dd, ee))
        set(1, 0, avg3(aa, bb, cc))
        set(1, 1, avg3(bb, cc, dd)); set(3, 0, avg3(bb, cc, dd))
        set(1, 2, avg3(cc, dd, ee)); set(3, 1, avg3(cc, dd, ee))
        set(1, 3, avg3(dd, ee, ff)); set(3, 2, avg3(dd, ee, ff))
        set(2, 3, avg3(ee, ff, gg))
        set(3, 3, avg3(ff, gg, hh))
      case 8 => // B_HD
        val x = tl; val i0 = l(0); val j = l(1); val k = l(2); val ll = l(3)
        val aa = a(0); val bb = a(1); val cc = a(2)
        set(0, 0, avg2(i0, x)); set(1, 2, avg2(i0, x))
        set(1, 0, avg2(j, i0)); set(2, 2, avg2(j, i0))
        set(2, 0, avg2(k, j)); set(3, 2, avg2(k, j))
        set(3, 0, avg2(ll, k))
        set(0, 3, avg3(aa, bb, cc))
        set(0, 2, avg3(x, aa, bb))
        set(0, 1, avg3(i0, x, aa)); set(1, 3, avg3(i0, x, aa))
        set(1, 1, avg3(x, i0, j)); set(2, 3, avg3(x, i0, j))
        set(2, 1, avg3(i0, j, k)); set(3, 3, avg3(i0, j, k))
        set(3, 1, avg3(j, k, ll))
      case _ => // B_HU
        val i0 = l(0); val j = l(1); val k = l(2); val ll = l(3)
        set(0, 0, avg2(i0, j))
        set(0, 2, avg2(j, k)); set(1, 0, avg2(j, k))
        set(1, 2, avg2(k, ll)); set(2, 0, avg2(k, ll))
        set(0, 1, avg3(i0, j, k))
        set(0, 3, avg3(j, k, ll)); set(1, 1, avg3(j, k, ll))
        set(1, 3, avg3(k, ll, ll)); set(2, 1, avg3(k, ll, ll))
        set(2, 2, ll); set(2, 3, ll)
        set(3, 0, ll); set(3, 1, ll); set(3, 2, ll); set(3, 3, ll)
    }
  }
  // ---- in-loop deblocking (RFC 6386 s15) ----

  private def sclamp(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v

  /** Shared two-tap adjust; returns F1 for the subblock outer taps. */
  private def commonAdjust(
      p: Array[Int], base: Int, step: Int, useOuter: Boolean): Int = {
    val p1 = p(base - 2 * step) - 128
    val p0 = p(base - step) - 128
    val q0 = p(base) - 128
    val q1 = p(base + step) - 128
    val a = sclamp((if (useOuter) sclamp(p1 - q1) else 0) + 3 * (q0 - p0))
    val f1 = sclamp(a + 4) >> 3
    val f2 = sclamp(a + 3) >> 3
    p(base) = sclamp(q0 - f1) + 128
    p(base - step) = sclamp(p0 + f2) + 128
    f1
  }

  private def filterMask(
      p: Array[Int], base: Int, step: Int, iLim: Int, eLim: Int): Boolean = {
    def d(a: Int, b: Int) = math.abs(p(base + a * step) - p(base + b * step))
    d(-1, 0) * 2 + d(-2, 1) / 2 <= eLim &&
      d(-4, -3) <= iLim && d(-3, -2) <= iLim && d(-2, -1) <= iLim &&
      d(1, 0) <= iLim && d(2, 1) <= iLim && d(3, 2) <= iLim
  }

  private def hev(p: Array[Int], base: Int, step: Int, t: Int): Boolean =
    math.abs(p(base - 2 * step) - p(base - step)) > t ||
      math.abs(p(base + step) - p(base)) > t

  private def subblockFilter(
      p: Array[Int], base: Int, step: Int, iLim: Int, eLim: Int, hevT: Int): Unit =
    if (filterMask(p, base, step, iLim, eLim)) {
      val hv = hev(p, base, step, hevT)
      val f1 = commonAdjust(p, base, step, hv)
      if (!hv) {
        val a = (f1 + 1) >> 1
        p(base + step) = sclamp((p(base + step) - 128) - a) + 128
        p(base - 2 * step) = sclamp((p(base - 2 * step) - 128) + a) + 128
      }
    }

  private def mbEdgeFilter(
      p: Array[Int], base: Int, step: Int, iLim: Int, eLim: Int, hevT: Int): Unit =
    if (filterMask(p, base, step, iLim, eLim)) {
      if (hev(p, base, step, hevT)) {
        commonAdjust(p, base, step, useOuter = true)
      } else {
        val p2 = p(base - 3 * step) - 128; val p1 = p(base - 2 * step) - 128
        val p0 = p(base - step) - 128
        val q0 = p(base) - 128; val q1 = p(base + step) - 128
        val q2 = p(base + 2 * step) - 128
        val w = sclamp(sclamp(p1 - q1) + 3 * (q0 - p0))
        var a = (27 * w + 63) >> 7
        p(base) = sclamp(q0 - a) + 128
        p(base - step) = sclamp(p0 + a) + 128
        a = (18 * w + 63) >> 7
        p(base + step) = sclamp(q1 - a) + 128
        p(base - 2 * step) = sclamp(p1 + a) + 128
        a = (9 * w + 63) >> 7
        p(base + 2 * step) = sclamp(q2 - a) + 128
        p(base - 3 * step) = sclamp(p2 + a) + 128
      }
    }

  private def simpleFilter(p: Array[Int], base: Int, step: Int, eLim: Int): Unit = {
    val p0 = p(base - step) - 128; val q0 = p(base) - 128
    val p1 = p(base - 2 * step) - 128; val q1 = p(base + step) - 128
    if (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= eLim)
      commonAdjust(p, base, step, useOuter = true)
  }

  /** Normal filter over one MB: all vertical edges (left MB edge, inner
    * x=4,8,12) then all horizontal; chroma MB edges + inner at 4.
    */
  private def filterMbNormal(
      yP: Array[Int], uP: Array[Int], vP: Array[Int],
      yStride: Int, uvStride: Int, mbX: Int, mbY: Int,
      edgeE: Int, innerE: Int, iLim: Int, hevT: Int, inner: Boolean): Unit = {
    val yx = mbX * 16; val yy = mbY * 16
    val cx = mbX * 8; val cy = mbY * 8
    // vertical edges (filter across columns, step 1)
    if (mbX > 0) {
      var r = 0
      while (r < 16) { mbEdgeFilter(yP, (yy + r) * yStride + yx, 1, iLim, edgeE, hevT); r += 1 }
      r = 0
      while (r < 8) {
        mbEdgeFilter(uP, (cy + r) * uvStride + cx, 1, iLim, edgeE, hevT)
        mbEdgeFilter(vP, (cy + r) * uvStride + cx, 1, iLim, edgeE, hevT)
        r += 1
      }
    }
    if (inner) {
      var c = 4
      while (c < 16) {
        var r = 0
        while (r < 16) { subblockFilter(yP, (yy + r) * yStride + yx + c, 1, iLim, innerE, hevT); r += 1 }
        c += 4
      }
      var r = 0
      while (r < 8) {
        subblockFilter(uP, (cy + r) * uvStride + cx + 4, 1, iLim, innerE, hevT)
        subblockFilter(vP, (cy + r) * uvStride + cx + 4, 1, iLim, innerE, hevT)
        r += 1
      }
    }
    // horizontal edges (filter across rows, step = stride)
    if (mbY > 0) {
      var c = 0
      while (c < 16) { mbEdgeFilter(yP, yy * yStride + yx + c, yStride, iLim, edgeE, hevT); c += 1 }
      c = 0
      while (c < 8) {
        mbEdgeFilter(uP, cy * uvStride + cx + c, uvStride, iLim, edgeE, hevT)
        mbEdgeFilter(vP, cy * uvStride + cx + c, uvStride, iLim, edgeE, hevT)
        c += 1
      }
    }
    if (inner) {
      var rr = 4
      while (rr < 16) {
        var c = 0
        while (c < 16) { subblockFilter(yP, (yy + rr) * yStride + yx + c, yStride, iLim, innerE, hevT); c += 1 }
        rr += 4
      }
      var c = 0
      while (c < 8) {
        subblockFilter(uP, (cy + 4) * uvStride + cx + c, uvStride, iLim, innerE, hevT)
        subblockFilter(vP, (cy + 4) * uvStride + cx + c, uvStride, iLim, innerE, hevT)
        c += 1
      }
    }
  }

  /** Simple filter: luma only. */
  private def filterMbSimple(
      yP: Array[Int], yStride: Int, mbX: Int, mbY: Int,
      edgeE: Int, innerE: Int, inner: Boolean): Unit = {
    val yx = mbX * 16; val yy = mbY * 16
    if (mbX > 0) {
      var r = 0
      while (r < 16) { simpleFilter(yP, (yy + r) * yStride + yx, 1, edgeE); r += 1 }
    }
    if (inner) {
      var c = 4
      while (c < 16) {
        var r = 0
        while (r < 16) { simpleFilter(yP, (yy + r) * yStride + yx + c, 1, innerE); r += 1 }
        c += 4
      }
    }
    if (mbY > 0) {
      var c = 0
      while (c < 16) { simpleFilter(yP, yy * yStride + yx + c, yStride, edgeE); c += 1 }
    }
    if (inner) {
      var rr = 4
      while (rr < 16) {
        var c = 0
        while (c < 16) { simpleFilter(yP, (yy + rr) * yStride + yx + c, yStride, innerE); c += 1 }
        rr += 4
      }
    }
  }
}
