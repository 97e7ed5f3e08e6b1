"""GIF87a/89a codec — REAL pure-Python/numpy LZW kernels.

Decode: header + logical screen descriptor, global AND local color
tables, 4-pass interlace, Graphic Control Extensions (per-frame delay,
transparency index, disposal methods 0-3), frame composition onto the
logical screen (sub-rectangle frames at offsets), and full
variable-width LZW (3..12-bit codes, table growth, deferred-clear
streams that keep emitting 12-bit codes on a full table).

Encode: real LZW compression (dict-based string table, code-width
growth, clear-code reset at table overflow), still or animated GIFs
(NETSCAPE2.0 loop extension + per-frame GCE delays), optional
interlacing — enough to mint genuine bit-exact fixtures in-flight for
the decode oracle without any image library.

Reference parity: the reference stores media payloads as opaque binary
columns and leaves decode to the consumer (SURVEY §2 multimodal rows;
e.g. pulsar-functions/java-examples-builtin thumbnailer pattern). This
kernel promotes ``gif`` into ``functions/multimodal.REAL_CODECS`` so
``decode_media(strict=True)`` exercises actual LZW entropy decode on
the engine side, same tier as the PNG/JPEG/BMP/WAV/AVI kernels.

Spec: CompuServe GIF89a (public, 1990) — the layout constants below
(block introducers, packed-field bit positions, interlace pass table)
are from that public specification.
"""

from __future__ import annotations

import struct

__all__ = ["encode_gif", "decode_gif", "lzw_encode", "lzw_decode"]

#: interlace passes: (row offset, row step) in spec order
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ------------------------------------------------------------- LZW core


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-variant LZW: variable code width starting at
    ``min_code_size + 1``, codes packed LSB-first, CLEAR resets the
    table, and a full table (4096 entries) stops growing until the
    encoder sends CLEAR (deferred-clear streams are legal per spec
    appendix). Stops after ``n_pixels`` indices or an EOI code."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # table as list of bytes-objects; rebuilt on CLEAR
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev: bytes | None = None

    acc = 0  # bit accumulator, LSB-first
    nbits = 0
    pos = 0
    data_len = len(data)
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= data_len:
                return out  # truncated stream: hand back what decoded
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            # the cScSc case: code not yet in table == prev + prev[0]
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        prev = entry
        # width grows when the NEXT code to be assigned needs it;
        # at 4096 the table is frozen (deferred clear)
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compression: CLEAR first (per spec
    recommendation), dict-based string table, code width grows with the
    table, CLEAR + reset when the table hits 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for b in bytes(indices):
        wc = w + bytes((b,))
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wc] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes((b,))
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------- encode


def _sub_blocks(data: bytes) -> bytes:
    """Split into <=255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_rows(h: int) -> list[int]:
    """Source-row order of an interlaced image (spec appendix E)."""
    return [r for off, step in _INTERLACE_PASSES for r in range(off, h, step)]


def encode_gif(
    frames,
    delays_cs=None,
    interlace: bool = False,
    loop: int = 0,
) -> bytes:
    """Encode HxWx3 uint8 frame(s) into a real GIF.

    One frame -> still GIF89a; several -> animated (NETSCAPE2.0 loop
    block, per-frame GCE delay in centiseconds, full-canvas frames with
    disposal=1 "do not dispose"). The palette is exact: the union of
    colors across frames must fit 256 (fixture encoder — quantization
    is out of scope; a too-colorful input raises).
    """
    import numpy as np

    if hasattr(frames, "ndim") and getattr(frames, "ndim", 0) == 3:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must be HxWx3 uint8 of equal size")
    if delays_cs is None:
        delays_cs = [10] * len(frames)
    if len(delays_cs) != len(frames):
        raise ValueError("delays_cs must match frames")

    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors exceed GIF's 256")
    # color-table size: 2^(n+1) entries, minimum 2
    gct_bits = max(1, int(len(palette) - 1).bit_length())
    n_slots = 1 << gct_bits
    min_code_size = max(2, gct_bits)  # spec: LZW min code size >= 2

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (gct_bits - 1))  # GCT present, size field
    out += b"\x00\x00"  # background index, no aspect ratio
    table = np.zeros((n_slots, 3), np.uint8)
    table[: len(palette)] = palette
    out += table.tobytes()

    animated = len(frames) > 1
    if animated:
        out += b"\x21\xff\x0bNETSCAPE2.0"
        out += bytes((3, 1)) + struct.pack("<H", loop) + b"\x00"

    idx_frames = inverse.astype(np.uint8).reshape(len(frames), h, w)
    for fi, (fr, delay) in enumerate(zip(idx_frames, delays_cs)):
        # GCE: disposal=1 (leave in place), no transparency
        out += b"\x21\xf9\x04"
        out.append(0x04 if animated else 0x00)
        out += struct.pack("<H", int(delay))
        out += b"\x00\x00"
        # image descriptor, full canvas
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out.append(0x40 if interlace else 0x00)  # no LCT
        rows = fr[_interlace_rows(h)] if interlace else fr
        out.append(min_code_size)
        out += _sub_blocks(lzw_encode(rows.tobytes(), min_code_size))
    out.append(0x3B)  # trailer
    return bytes(out)


# --------------------------------------------------------------- decode


def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("truncated GIF sub-blocks")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += buf[pos : pos + n]
        pos += n


def decode_gif(payload: bytes) -> dict:
    """Parse + fully decode a GIF.

    Returns ``{"width", "height", "frames": [HxWx3 uint8 ...],
    "delays_cs": [int ...], "loop_count": int | None}`` with every
    frame composed onto the logical screen honoring frame offsets,
    transparency, and disposal methods 1 (keep), 2 (restore
    background), 3 (restore previous).

    Total over arbitrary bytes: malformed/truncated payloads raise
    ValueError (never IndexError/struct.error — a corrupt length byte
    must not change the exception contract a crawl pipeline relies on).
    """
    try:
        return _decode_gif(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt GIF: {exc}") from exc


def _decode_gif(payload: bytes) -> dict:
    import numpy as np

    buf = bytes(payload)
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", buf, 6)
    packed = buf[10]
    bg_index = buf[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None:
        canvas[:] = gct[min(bg_index, len(gct) - 1)]
    frames: list = []
    delays: list[int] = []
    loop_count = None
    # pending GCE state for the next image descriptor
    delay_cs, transparent, disposal = 0, None, 0

    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = buf[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = buf[pos]
                if size != 4:
                    # GIF89a §23: the GCE data sub-block is exactly 4
                    # bytes; any other declared size would make the
                    # fixed-offset reads below land on the wrong bytes
                    raise ValueError(f"malformed GCE block size {size}")
                fields = buf[pos + 1]
                delay_cs = struct.unpack_from("<H", buf, pos + 2)[0]
                t_idx = buf[pos + 4]
                pos += 1 + size
                disposal = (fields >> 2) & 0x07
                transparent = t_idx if fields & 0x01 else None
                if buf[pos] != 0:
                    raise ValueError("malformed GCE terminator")
                pos += 1
            else:
                data, pos = _read_sub_blocks(buf, pos)
                if label == 0xFF and data[:11] == b"NETSCAPE2.0":
                    if len(data) >= 14 and data[11] == 1:
                        loop_count = struct.unpack_from("<H", data, 12)[0]
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        left, top, fw, fh = struct.unpack_from("<HHHH", buf, pos)
        fields = buf[pos + 8]
        pos += 9
        lct = None
        if fields & 0x80:
            n = 2 << (fields & 0x07)
            lct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        color_table = lct if lct is not None else gct
        if color_table is None:
            raise ValueError("GIF image with no color table")
        min_code_size = buf[pos]
        pos += 1
        data, pos = _read_sub_blocks(buf, pos)
        idx = np.frombuffer(
            lzw_decode(data, min_code_size, fw * fh), np.uint8
        )
        if len(idx) < fw * fh:  # truncated: pad with background
            idx = np.concatenate([idx, np.zeros(fw * fh - len(idx), np.uint8)])
        idx = idx.reshape(fh, fw)
        if fields & 0x40:  # interlaced: invert the row permutation
            de = np.empty_like(idx)
            de[_interlace_rows(fh)] = idx
            idx = de

        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        pixels = color_table[np.minimum(idx, len(color_table) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            region[:] = np.where(mask, pixels, region)
        else:
            region[:] = pixels
        frames.append(canvas.copy())
        delays.append(delay_cs)

        if disposal == 2:  # restore background in the frame rect
            bg = color_table[min(bg_index, len(color_table) - 1)]
            canvas[top : top + fh, left : left + fw] = bg
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        delay_cs, transparent, disposal = 0, None, 0

    if not frames:
        raise ValueError("GIF contained no image data")
    return {
        "width": int(w),
        "height": int(h),
        "frames": frames,
        "delays_cs": delays,
        "loop_count": loop_count,
    }
