"""Seeded minimal-GIF writer: palette + index matrix -> GIF89a bytes.

Fixture-side counterpart of
:func:`markmuse_spark.operators.multimodal.decode_gif_pixels` — the
same independence contract as :mod:`png_writer`: the Spark query
encodes the SPEC pixels to GIF on executors, the engine decodes them
back with its own from-scratch LZW decoder, and the fixture oracle
computes expected features from the spec pixels directly, never
running any GIF code.  GIF's LZW is LOSSLESS, so decoded pixels are
bit-identical to the spec — the property that keeps the oracle exact
(JPEG, being lossy, cannot play this role; its decode stays behind
the labeled codec seam).

Format subset (GIF89a, the dominant web form): one image, global
color table, non-interlaced, no extensions.
"""

from __future__ import annotations

import hashlib

GIF_PALETTE_SIZE = 64  # 2^6 entries -> LZW min code size 6


def gif_palette(doc_id: int):
    """Deterministic 64-entry RGB palette from an md5 counter stream."""
    import numpy as np

    seed = f"gifpal|{doc_id}".encode()
    blocks = []
    while sum(len(b) for b in blocks) < GIF_PALETTE_SIZE * 3:
        blocks.append(
            hashlib.md5(seed + len(blocks).to_bytes(4, "big")).digest()
        )
    buf = b"".join(blocks)[: GIF_PALETTE_SIZE * 3]
    return np.frombuffer(buf, dtype=np.uint8).reshape(GIF_PALETTE_SIZE, 3)


def gif_index_spec(doc_id: int, text: str):
    """Deterministic (H, W) palette-index matrix — same size recipe as
    the PNG spec so the two populations interleave naturally."""
    import numpy as np

    w = 4 + doc_id % 13
    h = 4 + doc_id % 11
    seed = f"gif|{doc_id}|{text}".encode("utf-8")
    blocks = []
    counter = 0
    while sum(len(b) for b in blocks) < h * w:
        blocks.append(hashlib.md5(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    buf = b"".join(blocks)[: h * w]
    idx = np.frombuffer(buf, dtype=np.uint8) % GIF_PALETTE_SIZE
    return idx.reshape(h, w)


def gif_pixel_spec(doc_id: int, text: str):
    """The (H, W, 3) uint8 RGB matrix a conforming GIF decode of
    :func:`encode_gif`'s output must reproduce exactly."""
    return gif_palette(doc_id)[gif_index_spec(doc_id, text)]


def _lzw_encode_gif(indices, min_code_size: int) -> bytes:
    """GIF variable-width LZW (spec appendix F): LSB-first bit packing,
    clear/EOI codes, dictionary growth to 12 bits with a clear-reset."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    cur = b""
    for k in indices:
        probe = cur + bytes([int(k)])
        if probe in table:
            cur = probe
            continue
        emit(table[cur])
        if next_code < 4096:
            table[probe] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([int(k)])
    if cur:
        emit(table[cur])
    emit(eoi)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def encode_gif(palette, idx) -> bytes:
    """One-image GIF89a: header, logical screen descriptor, global
    color table, image descriptor, LZW data in <=255-byte sub-blocks,
    trailer."""
    h, w = idx.shape
    n_colors = len(palette)
    k = max(1, (n_colors - 1).bit_length() - 1)  # GCT size field: 2^(k+1)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | k)  # GCT present, size 2^(k+1)
    out += b"\x00\x00"  # background index, aspect
    gct = bytearray(bytes(palette.reshape(-1)))
    gct += b"\x00" * (3 * (1 << (k + 1)) - len(gct))  # pad table to 2^(k+1)
    out += gct
    out += b"\x2c" + b"\x00\x00\x00\x00"  # image descriptor at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0)  # no LCT, non-interlaced
    min_code = max(2, (n_colors - 1).bit_length())
    out.append(min_code)
    data = _lzw_encode_gif(idx.reshape(-1).tolist(), min_code)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)
