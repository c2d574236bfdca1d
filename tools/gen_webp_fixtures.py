#!/usr/bin/env python3
"""Vendor real-libwebp differential fixtures for the WebP decoders.

Drives the SYSTEM libwebp (an independent, production codec) through
ctypes to produce (source RGB, encoded WebP, libwebp-decoded RGB)
triples for deterministic synthetic images. The Scala specs then assert:

  - VP8L (lossless): graft's decoder reproduces BOTH the source raster
    and libwebp's own decode byte-exactly on real cwebp-class streams —
    the independent-codec differential the round-14 ADVICE asked for.
  - VP8 (lossy): graft's decoder reproduces libwebp's decode EXACTLY
    (both implement the normative RFC 6386 reconstruction).

Deterministic: images derive from a fixed LCG seed; libwebp encoding is
deterministic for a given version. Regenerate with:
    python3 tools/gen_webp_fixtures.py
Outputs to src/test/resources/webp/ as flat .bin files + manifest.txt
(lines: name width height quality kind).
"""
import ctypes, os, struct, sys

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LIB.WebPEncodeRGB.restype = ctypes.c_size_t
LIB.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LIB.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
LIB.WebPEncodeLosslessRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int,
                                      ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LIB.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def lcg(seed):
    s = seed & 0xFFFFFFFF
    while True:
        s = (s * 1664525 + 1013904223) & 0xFFFFFFFF
        yield (s >> 16) & 0xFF


def image(w, h, seed, kind):
    """Deterministic RGB bytes: smooth gradients + blocks + mild noise
    (smooth content keeps lossy reconstruction representative)."""
    g = lcg(seed)
    px = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            if kind == "grad":
                r, gg, b = (x * 255) // max(w - 1, 1), (y * 255) // max(h - 1, 1), ((x + y) * 127) // max(w + h - 2, 1)
            elif kind == "blocks":
                r = 200 if (x // 8 + y // 8) % 2 == 0 else 40
                gg = 60 if (x // 16) % 2 == 0 else 180
                b = (x * 3 + y * 5) % 256
            else:  # noise-ish but smooth rows
                r, gg, b = next(g), (x + next(g)) % 256, (y * 2 + next(g)) % 256
            px[i], px[i + 1], px[i + 2] = r, gg, b
    return bytes(px)


def enc_lossy(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LIB.WebPEncodeRGB(rgb, w, h, w * 3, ctypes.c_float(q), ctypes.byref(out))
    assert n > 0
    data = bytes(bytearray(out[:n]))
    LIB.WebPFree(out)
    return data


def enc_lossless(rgb, w, h):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LIB.WebPEncodeLosslessRGB(rgb, w, h, w * 3, ctypes.byref(out))
    assert n > 0
    data = bytes(bytearray(out[:n]))
    LIB.WebPFree(out)
    return data


def dec(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    p = LIB.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p
    rgb = bytes(bytearray(p[: w.value * h.value * 3]))
    LIB.WebPFree(p)
    return rgb, w.value, h.value


def dec_yuv(data):
    """libwebp's raw YUV420 reconstruction — the NORMATIVE decoder output
    before any upsampler/colorspace choice; what the Scala VP8 decoder
    must reproduce byte-exactly."""
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)(); v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    p = LIB.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert p
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y = b"".join(bytes(bytearray(p[r * S: r * S + W])) for r in range(H))
    uu = b"".join(bytes(bytearray(u[r * US: r * US + cw])) for r in range(ch))
    vv = b"".join(bytes(bytearray(v[r * US: r * US + cw])) for r in range(ch))
    LIB.WebPFree(p)
    return y, uu, vv, W, H


def main():
    outdir = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/webp")
    os.makedirs(outdir, exist_ok=True)
    manifest = []

    shapes = [(32, 32), (48, 32), (64, 48), (33, 17), (16, 16), (80, 64)]
    kinds = ["grad", "blocks", "noise"]
    idx = 0
    for (w, h) in shapes:
        for kind in kinds:
            rgb = image(w, h, 0xC0FFEE + idx * 7919, kind)
            name = f"f{idx:02d}_{kind}_{w}x{h}"
            with open(os.path.join(outdir, name + ".rgb"), "wb") as f:
                f.write(rgb)
            # lossless: source == decode, assert graft VP8L == both
            ll = enc_lossless(rgb, w, h)
            drgb, dw, dh = dec(ll)
            assert (dw, dh) == (w, h) and drgb == rgb, "lossless must round-trip"
            with open(os.path.join(outdir, name + ".vp8l.webp"), "wb") as f:
                f.write(ll)
            manifest.append(f"{name} {w} {h} 100 vp8l")
            # lossy at two qualities: vendor libwebp's own decode as truth
            for q in (75, 95):
                ly = enc_lossy(rgb, w, h, q)
                lrgb, lw, lh = dec(ly)
                assert (lw, lh) == (w, h)
                yy, uu, vv, _, _ = dec_yuv(ly)
                with open(os.path.join(outdir, f"{name}.q{q}.webp"), "wb") as f:
                    f.write(ly)
                with open(os.path.join(outdir, f"{name}.q{q}.rgb"), "wb") as f:
                    f.write(lrgb)
                with open(os.path.join(outdir, f"{name}.q{q}.yuv"), "wb") as f:
                    f.write(yy + uu + vv)
                manifest.append(f"{name} {w} {h} {q} vp8")
            idx += 1

    with open(os.path.join(outdir, "manifest.txt"), "w") as f:
        f.write("\n".join(manifest) + "\n")
    print(f"wrote {idx} images x (1 lossless + 2 lossy) to {outdir}")


if __name__ == "__main__":
    main()
