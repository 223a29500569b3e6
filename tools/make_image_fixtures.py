"""Generate the checked-in tiny image fixtures for the multimodal
header-decode path (round-9 verdict item 3).

Four containers, one file each, all built byte-by-byte from the
PUBLIC format specs (PNG RFC 2083 / ISO 15948, JPEG ITU-T T.81,
GIF89a spec, BMP BITMAPINFOHEADER) with zero codec dependencies —
the same specs ``multimodal.parse_image_header`` reads. The PNG,
GIF, and BMP are fully valid decodable files; the JPEG carries the
complete baseline marker structure (SOI/APP0/DQT/SOF0/DHT/SOS/EOI)
with a minimal entropy segment — sufficient for any header parser
and for most decoders of an all-DC gray image.

Deterministic: running this twice writes identical bytes. Output:
my_mapreduce_spark/data/images/ — committed to the repo so the
registry query q_multimodal_image_meta and the decode tests run the
REAL path on every container, no synthesis at test time.
"""

from __future__ import annotations

import os
import struct
import zlib

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "my_mapreduce_spark", "data", "images")

# (file, mime, width, height, channels) — the expected-constants table
# the query oracle and the tests share; keep in sync with
# my_mapreduce_spark/multimodal.py IMAGE_FIXTURES.
SPECS = [
    ("px_3x2.png", "image/png", 3, 2, 3),
    ("px_5x4.jpg", "image/jpeg", 5, 4, 1),
    ("px_2x2.gif", "image/gif", 2, 2, 3),
    ("px_4x3.bmp", "image/bmp", 4, 3, 3),
]


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def make_png(w: int, h: int) -> bytes:
    """Truecolor 8-bit PNG; each scanline = filter byte 0 + RGB where
    pixel (x, y) is (x*40, y*40, (x+y)*20) — deterministic content."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # color type 2 = RGB
    raw = b"".join(
        b"\x00" + bytes(v for x in range(w)
                        for v in (x * 40 % 256, y * 40 % 256,
                                  (x + y) * 20 % 256))
        for y in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 9))
            + _png_chunk(b"IEND", b""))


def make_jpeg(w: int, h: int) -> bytes:
    """Baseline grayscale JPEG marker stream (ITU-T T.81): SOI, APP0
    (JFIF), DQT (all-16 luma table), SOF0 with the given dims and one
    component, DHT (a 1-code DC table + 1-code AC table), SOS, one
    entropy byte (DC code 0 => all-gray block) padded, EOI."""
    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01" + b"\x01\x11\x00")
    # DC table 0: one code of length 1 mapping to symbol 0 (diff size 0)
    dht_dc = (b"\xff\xc4" + struct.pack(">H", 20) + b"\x00"
              + bytes([1] + [0] * 15) + b"\x00")
    # AC table 0: one code of length 1 mapping to symbol 0 (EOB)
    dht_ac = (b"\xff\xc4" + struct.pack(">H", 20) + b"\x10"
              + bytes([1] + [0] * 15) + b"\x00")
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    # per MCU: DC code '0' (1 bit) + AC EOB '0' (1 bit); 1 MCU per
    # 8x8 block => ceil(w/8)*ceil(h/8) = 1 block here; pad with 1s
    scan = b"\x00"
    eoi = b"\xff\xd9"
    return soi + app0 + dqt + sof0 + dht_dc + dht_ac + sos + scan + eoi


def make_gif(w: int, h: int) -> bytes:
    """GIF89a, 2-color global table, one image, minimal LZW data."""
    header = b"GIF89a"
    lsd = struct.pack("<HH", w, h) + b"\x80\x00\x00"  # GCT, 2 colors
    gct = b"\x00\x00\x00\xff\xff\xff"
    img_desc = b"," + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    # LZW min code size 2; data: clear(100b) + w*h color-0 pixels + end
    # encoded trivially: clear=4, end=5 at 3-bit codes
    codes = [4] + [0] * (w * h) + [5]
    bits = 0
    acc = 0
    out = bytearray()
    for c in codes:
        acc |= c << bits
        bits += 3
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    lzw = b"\x02" + bytes([len(out)]) + bytes(out) + b"\x00"
    return header + lsd + gct + img_desc + lzw + b";"


def make_bmp(w: int, h: int) -> bytes:
    """24-bit BITMAPINFOHEADER BMP; pixel (x, y) = (x*30, y*30, 60)."""
    row_raw = lambda y: bytes(  # noqa: E731
        v for x in range(w) for v in (60, y * 30 % 256, x * 30 % 256))
    pad = (4 - (w * 3) % 4) % 4
    # BMP rows are stored bottom-up
    pixels = b"".join(row_raw(y) + b"\x00" * pad
                      for y in range(h - 1, -1, -1))
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0,
                                 14 + 40)
    return header + dib + pixels


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    makers = {"image/png": make_png, "image/jpeg": make_jpeg,
              "image/gif": make_gif, "image/bmp": make_bmp}
    for fname, mime, w, h, _ in SPECS:
        data = makers[mime](w, h)
        path = os.path.join(OUT_DIR, fname)
        with open(path, "wb") as f:
            f.write(data)
        print(f"wrote {path} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
