"""Pure-python/numpy codecs for container-free public media formats.

The sandbox has no PIL/ffmpeg/torchaudio, but three REAL, standard,
uncompressed formats are fully decodable with the stdlib + numpy:

- **PPM (P6)** binary images (Netpbm, public spec): ASCII header
  ``P6 <w> <h> <maxval>`` then ``w*h*3`` RGB bytes.
- **WAV** PCM audio via the stdlib ``wave`` module (16-bit mono here).
- **Y4M (YUV4MPEG2)** uncompressed video (public spec, the format
  ffmpeg/mjpegtools pipe raw video through): one ASCII stream header
  ``YUV4MPEG2 W<w> H<h> F<n>:<d> C420``, then per frame an ASCII
  ``FRAME`` line + ``w*h*3/2`` bytes of 4:2:0 planar YUV.

Two REAL compressed codecs are also implemented from their public specs:

- **PNG** truecolor 8-bit (color type 2, no interlace; W3C spec): chunk
  walk with CRC-32 verification (``zlib.crc32``), concatenated-IDAT
  DEFLATE decompress (stdlib ``zlib`` — the same inflate every PNG
  library uses), and all five row filters (None/Sub/Up/Average/Paeth) on
  both the encode and decode sides. The fixture encoder cycles the
  filter type per row, so a decode that gets any unfilter rule or the
  byte stride wrong produces different pixel sums.
- **Baseline JPEG** (ITU-T T.81), grayscale and YCbCr 4:4:4 color:
  marker-segment walk, canonical Huffman tables loaded from the DHT
  segments, interleaved entropy decode with per-component DC prediction
  and 0xFF00 byte unstuffing, zigzag, dequantize, 8x8 IDCT, color
  transform. Unit quant tables make flat blocks bit-exact (the SQL
  oracle's lever); arbitrary content round-trips within the DCT
  rounding bound (pytest).

So the engine's multimodal decode stage is a REAL parser pipeline — the
only codecs still stubbed in ``pipelines/multimodal`` are ones that
genuinely need external libraries (MP3/H.264).

Encoders here exist for the deterministic fixture generator; decoders are
what the actor-pool stage runs. Both sides are exercised round-trip in
pytest, and the decoded statistics are integer-exact mirrors of the
generator arithmetic, so a DuckDB oracle checks the REAL parse path
end-to-end (wrong stride/offset arithmetic ⇒ hash mismatch).
"""

from __future__ import annotations

import io
import wave
import zlib

import numpy as np

# ------------------------------------------------------------------ PPM --


def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Real header parse: magic,
    whitespace/comment-tolerant token scan, then a zero-copy frombuffer."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


def resize_nearest(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize, pure numpy fancy-indexing (vectorized)."""
    h, w, _ = rgb.shape
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return rgb[rows[:, None], cols[None, :]]


# ------------------------------------------------------------------ WAV --


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → RIFF/WAV bytes (stdlib ``wave``)."""
    assert samples.dtype == np.int16
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono samples, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("only 16-bit mono supported")
        rate = w.getframerate()
        samples = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    return samples, rate


# ----------------------------------------------------------- IMA ADPCM --
# A real COMPRESSED audio codec written from the public IMA/DVI ADPCM
# specification (the WAVE format-0x11 layout documented in Microsoft's
# public multimedia registration and the IMA Recommended Practices):
# 4-bit differential nibbles, the canonical 89-entry step table and
# 16-entry index-adaptation table, per-block header carrying
# (predictor:int16, step_index:uint8). Low nibble first within a byte.

IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]  # symmetric over the sign bit


def _ima_decode_nibbles(nibbles, pred: int, idx: int) -> list[int]:
    """Run the IMA state machine: decoded samples AFTER the header
    predictor (which is itself output sample 0 of the block)."""
    out = []
    for n in nibbles:
        step = IMA_STEP_TABLE[idx]
        diff = step >> 3
        if n & 4:
            diff += step
        if n & 2:
            diff += step >> 1
        if n & 1:
            diff += step >> 2
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + IMA_INDEX_TABLE[n & 7]))
        out.append(pred)
    return out


def _ima_encode_sample(s: int, pred: int, idx: int) -> tuple[int, int, int]:
    """Quantize one sample → (nibble, new_pred, new_idx) — the standard
    successive-approximation encoder from the IMA recommended practice."""
    step = IMA_STEP_TABLE[idx]
    diff = s - pred
    n = 0
    if diff < 0:
        n = 8
        diff = -diff
    if diff >= step:
        n |= 4
        diff -= step
    if diff >= step >> 1:
        n |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        n |= 1
    dec = _ima_decode_nibbles([n], pred, idx)[0]
    idx = max(0, min(88, idx + IMA_INDEX_TABLE[n & 7]))
    return n, dec, idx


def encode_adpcm(samples: np.ndarray, rate: int,
                 index0: int = 0) -> bytes:
    """int16 mono samples → WAV (format 0x11, IMA ADPCM), ONE block:
    sample 0 becomes the block-header predictor, the rest are encoded as
    4-bit nibbles (padded with a repeat of the last sample if the count
    is even, since nibbles pack two per byte)."""
    assert samples.dtype == np.int16 and samples.size >= 1
    pred = int(samples[0])
    idx = int(index0)
    rest = [int(x) for x in samples[1:]]
    if len(rest) % 2:
        rest.append(rest[-1])
    nibbles = []
    for s in rest:
        n, pred, idx0 = _ima_encode_sample(s, pred, idx)
        idx = idx0
        nibbles.append(n)
    return adpcm_container(int(samples[0]), int(index0), nibbles, rate,
                           n_samples=int(samples.size))


def adpcm_container(pred0: int, index0: int, nibbles: list[int],
                    rate: int, n_samples: int | None = None) -> bytes:
    """Assemble the RIFF/WAVE format-0x11 container: fmt (with the
    2-byte samples-per-block extension), fact (total sample count), one
    data block = 4-byte header + packed nibbles (low nibble first)."""
    assert len(nibbles) % 2 == 0
    if n_samples is None:
        n_samples = 1 + len(nibbles)
    block_align = 4 + len(nibbles) // 2
    data = bytearray()
    data += int(pred0 & 0xFFFF).to_bytes(2, "little")
    data += bytes([index0 & 0xFF, 0])
    for i in range(0, len(nibbles), 2):
        data.append((nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4))
    fmt = (
        (17).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block_align // (2 * (block_align - 4) + 1)).to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little")
        + (2 * (block_align - 4) + 1).to_bytes(2, "little")
    )
    fact = n_samples.to_bytes(4, "little")
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"fact" + len(fact).to_bytes(4, "little") + fact
        + b"data" + len(data).to_bytes(4, "little") + bytes(data)
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_adpcm(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV/IMA-ADPCM bytes → (int16 samples, rate): RIFF chunk walk, fmt
    tag check, per-block header + low-first nibble unpack (numpy), then
    the sequential IMA state machine."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, block_align, spb, total = 12, None, None, None, None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        clen = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            tag = int.from_bytes(body[0:2], "little")
            if tag != 17:
                raise ValueError(f"not IMA ADPCM (fmt tag {tag})")
            if int.from_bytes(body[2:4], "little") != 1:
                raise ValueError("only mono supported")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            spb = int.from_bytes(body[18:20], "little")
        elif cid == b"fact":
            total = int.from_bytes(body[0:4], "little")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    out: list[int] = []
    for off in range(0, len(data), block_align):
        blk = data[off:off + block_align]
        pred = int.from_bytes(blk[0:2], "little", signed=True)
        idx = blk[2]
        if idx > 88:
            raise ValueError("corrupt step index")
        packed = np.frombuffer(blk[4:], np.uint8)
        nib = np.empty(packed.size * 2, np.uint8)
        nib[0::2] = packed & 0xF
        nib[1::2] = packed >> 4
        out.append(pred)
        out.extend(_ima_decode_nibbles(nib.tolist(), pred, idx))
    if total is not None:
        out = out[:total]
    return np.asarray(out, np.int16), rate


# ------------------------------------------------------------------ Y4M --


def encode_y4m(frames_y: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w) uint8 luma planes → YUV4MPEG2 C420 bytes (U=V=128)."""
    n, h, w = frames_y.shape
    uv = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps)]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(frames_y[f].tobytes())
        out.append(uv)  # U plane
        out.append(uv)  # V plane
    return b"".join(out)


def decode_y4m(payload: bytes, every: int = 1) -> tuple[np.ndarray, int, int, int]:
    """Y4M C420 bytes → (sampled luma planes (k, h, w), w, h, n_frames).

    Real stream parse: header tag scan, then fixed-stride frame walk —
    ``every=k`` SEEKS to every k-th frame without touching the bytes in
    between (the scale path for frame sampling: I/O ∝ sampled frames)."""
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    for tag in header[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C" and tag != b"C420":
            raise ValueError(f"unsupported chroma {tag!r}")
    frame_bytes = w * h + 2 * ((h // 2) * (w // 2))
    stride = len(b"FRAME\n") + frame_bytes
    body = len(payload) - (nl + 1)
    if body % stride:
        raise ValueError("truncated Y4M stream")
    n_frames = body // stride
    planes = []
    for f in range(0, n_frames, every):
        off = nl + 1 + f * stride
        if payload[off : off + 6] != b"FRAME\n":
            raise ValueError(f"bad frame marker at frame {f}")
        planes.append(
            np.frombuffer(payload, np.uint8, count=w * h, offset=off + 6).reshape(h, w)
        )
    return np.stack(planes), w, h, n_frames


# ------------------------------------------------------------------ PNG --
# Truecolor 8-bit PNG (public W3C spec). bpp = 3 bytes/pixel throughout.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return (
        len(data).to_bytes(4, "big") + ctype + data + crc.to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(rgb: np.ndarray, filter_of_row=lambda y: y % 5) -> bytes:
    """(h, w, 3) uint8 → PNG bytes. ``filter_of_row(y)`` picks the filter
    type per scanline (default cycles 0..4 so every filter is exercised);
    each row is filtered exactly per spec before DEFLATE."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    px = rgb.astype(np.int64)
    raw = bytearray()
    prev = np.zeros((w, 3), np.int64)
    for y in range(h):
        cur = px[y]
        ft = filter_of_row(y)
        raw.append(ft)
        left = np.zeros((w, 3), np.int64)
        left[1:] = cur[:-1]
        if ft == 0:
            out = cur
        elif ft == 1:  # Sub
            out = cur - left
        elif ft == 2:  # Up
            out = cur - prev
        elif ft == 3:  # Average
            out = cur - (left + prev) // 2
        else:  # Paeth
            ul = np.zeros((w, 3), np.int64)
            ul[1:] = prev[:-1]
            pred = np.array(
                [
                    [_paeth(int(left[x, ch]), int(prev[x, ch]), int(ul[x, ch]))
                     for ch in range(3)]
                    for x in range(w)
                ],
                np.int64,
            )
            out = cur - pred
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, truecolor, deflate, adaptive, no interlace
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Real decode path: signature check,
    chunk walk with CRC-32 verification of every chunk, concatenated-IDAT
    zlib inflate, then per-scanline unfiltering of all five filter types.
    Supports what the encoder emits (8-bit truecolor, non-interlaced)."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, w = len(_PNG_SIG), None
    idat = bytearray()
    while pos < len(payload):
        length = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        crc = int.from_bytes(payload[pos + 8 + length : pos + 12 + length], "big")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, color, comp, filt, interlace = data[8:13]
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit truecolor non-interlaced supported")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = 1 + w * 3
    if len(raw) != h * stride:
        raise ValueError("decompressed size mismatch")
    out = np.zeros((h, w, 3), np.int64)
    prev = np.zeros((w, 3), np.int64)
    for y in range(h):
        ft = raw[y * stride]
        cur = np.frombuffer(
            raw, np.uint8, count=w * 3, offset=y * stride + 1
        ).astype(np.int64).reshape(w, 3)
        if ft == 0:
            rec = cur
        elif ft == 1:  # Sub: per-channel cumulative sum mod 256
            rec = np.cumsum(cur, axis=0) % 256
        elif ft == 2:  # Up
            rec = (cur + prev) % 256
        elif ft == 3:  # Average (sequential in the left operand)
            rec = np.zeros((w, 3), np.int64)
            for x in range(w):
                left = rec[x - 1] if x else np.zeros(3, np.int64)
                rec[x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth
            rec = np.zeros((w, 3), np.int64)
            for x in range(w):
                for ch in range(3):
                    a = int(rec[x - 1, ch]) if x else 0
                    b = int(prev[x, ch])
                    cc = int(prev[x - 1, ch]) if x else 0
                    rec[x, ch] = (cur[x, ch] + _paeth(a, b, cc)) % 256
        else:
            raise ValueError(f"bad filter type {ft} on row {y}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


# ------------------------------------------------------------------ GIF --
# GIF89a (CompuServe spec, public): logical screen descriptor + global
# color table + one table-based image whose pixel data is REAL LZW with
# GIF's variable code width (9→12 bits, LSB-first bit packing, CLEAR /
# EOI control codes, dictionary reset at 4096). Encoder exists for the
# deterministic fixture; the decoder is what the actor-pool stage runs.

_GIF_MIN_CODE = 8  # 256-color palette → 8-bit literals
_GIF_CLEAR = 1 << _GIF_MIN_CODE
_GIF_EOI = _GIF_CLEAR + 1


def _lzw_encode(indices: bytes) -> bytes:
    """GIF-flavor LZW: emits CLEAR first, grows the code width when
    next_code exceeds the current range (non-early-change pairing with the
    decoder's grow-at-(1<<width) rule — the decoder's table lags one add),
    resets at 4096. LSB-first bit packing."""
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

    width = _GIF_MIN_CODE + 1
    table: dict[bytes, int] = {}
    next_code = _GIF_EOI + 1
    emit(_GIF_CLEAR, width)
    w = indices[:1]
    for i in range(1, len(indices)):
        c = indices[i:i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w] if len(w) > 1 else w[0], width)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(_GIF_CLEAR, width)
            table.clear()
            width = _GIF_MIN_CODE + 1
            next_code = _GIF_EOI + 1
        w = c
    emit(table[w] if len(w) > 1 else w[0], width)
    emit(_GIF_EOI, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, n_expected: int) -> bytes:
    """Inverse of ``_lzw_encode`` incl. the KwKwK (code == next_code)
    case; stops at EOI or when ``n_expected`` indices are produced."""
    out = bytearray()
    pos = 0  # bit position
    width = _GIF_MIN_CODE + 1
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    total_bits = len(data) * 8
    while len(out) < n_expected:
        if pos + width > total_bits:
            raise ValueError("GIF: LZW stream truncated")
        byte0 = pos >> 3
        chunk = int.from_bytes(data[byte0:byte0 + 3], "little")
        code = (chunk >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        if code == _GIF_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = _GIF_MIN_CODE + 1
            prev = None
            continue
        if code == _GIF_EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """GIF89a writer: (h, w) uint8 index raster + (256, 3) uint8 palette →
    one non-interlaced full-frame image with a global color table."""
    h, w = indices.shape
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])  # GCT present, 8-bit color, 256 entries
    out += palette.astype(np.uint8).tobytes()
    out += b"\x2c" + b"\x00" * 4  # image descriptor at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    out += bytes([_GIF_MIN_CODE])
    lzw = _lzw_encode(indices.astype(np.uint8).tobytes())
    for i in range(0, len(lzw), 255):  # data sub-blocks
        blk = lzw[i:i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF89a reader for the subset above → (h, w, 3) uint8 RGB. Walks the
    container for real: header, screen descriptor, global color table,
    image descriptor, sub-block reassembly, LZW decompress, palette map."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    packed = payload[10]
    if not packed & 0x80:
        raise ValueError("GIF: no global color table")
    gct_n = 2 << (packed & 0x07)
    pos = 13
    palette = np.frombuffer(payload[pos:pos + 3 * gct_n],
                            np.uint8).reshape(gct_n, 3)
    pos += 3 * gct_n
    while payload[pos] == 0x21:  # skip extension blocks
        pos += 2
        while payload[pos]:
            pos += 1 + payload[pos]
        pos += 1
    if payload[pos] != 0x2C:
        raise ValueError("GIF: image descriptor not found")
    w = int.from_bytes(payload[pos + 5:pos + 7], "little")
    h = int.from_bytes(payload[pos + 7:pos + 9], "little")
    if payload[pos + 9] & 0xC0:
        raise ValueError("GIF: local color table / interlace unsupported")
    pos += 10
    if payload[pos] != _GIF_MIN_CODE:
        raise ValueError("GIF: unexpected LZW min code size")
    pos += 1
    lzw = bytearray()
    while payload[pos]:  # sub-block reassembly
        n = payload[pos]
        lzw += payload[pos + 1:pos + 1 + n]
        pos += 1 + n
    idx = np.frombuffer(_lzw_decode(bytes(lzw), w * h), np.uint8)
    if idx.size != w * h:
        raise ValueError("GIF: pixel count mismatch")
    return palette[idx.reshape(h, w)]


# ------------------------------------- deterministic fixture generators --
# Payload CONTENT is simple arithmetic in media_id so the decoded integer
# statistics are SQL-expressible; the CONTAINERS are the real formats.

IMG_W = IMG_H = 8
WAV_RATE = 8000
VID_W = VID_H = 8


def gen_image(media_id: int) -> bytes:
    k = np.arange(IMG_W * IMG_H * 3, dtype=np.int64)
    px = ((media_id * 13 + k) % 256).astype(np.uint8)
    return encode_ppm(px.reshape(IMG_H, IMG_W, 3))


def wav_n_samples(media_id: int) -> int:
    return 200 + media_id % 100


def gen_audio(media_id: int) -> bytes:
    j = np.arange(wav_n_samples(media_id), dtype=np.int64)
    s = (((media_id * 31 + j * 7) % 2048) - 1024).astype(np.int16)
    return encode_wav(s, WAV_RATE)


def adpcm_n_nibbles(media_id: int) -> int:
    return 2 * (150 + media_id % 100)


def gen_adpcm(media_id: int) -> bytes:
    """Deterministic format-0x11 payload: the COMPRESSED nibble stream is
    the fixture (nibble k = (media_id*7 + 5k) % 16 — every sign/magnitude
    bit pattern occurs, so the full decoder state machine is on the
    oracle's hash path), header predictor/index derived from media_id."""
    nn = adpcm_n_nibbles(media_id)
    k = np.arange(nn, dtype=np.int64)
    nib = [int(x) for x in (media_id * 7 + 5 * k) % 16]
    pred0 = int((media_id * 97) % 65536) - 32768
    index0 = int(media_id % 89)
    return adpcm_container(pred0, index0, nib, WAV_RATE)


def gen_png(media_id: int) -> bytes:
    """Deterministic truecolor PNG: pixel byte k = (media_id*19 + 5k) % 256,
    filter type cycling (y + media_id) % 5 so every unfilter path runs."""
    k = np.arange(IMG_W * IMG_H * 3, dtype=np.int64)
    px = ((media_id * 19 + 5 * k) % 256).astype(np.uint8)
    return encode_png(
        px.reshape(IMG_H, IMG_W, 3), filter_of_row=lambda y: (y + media_id) % 5
    )


# GIF raster is bigger than the other fixtures ON PURPOSE: ~4.9k mostly
# incompressible indices push the LZW dictionary through every code width
# (9→12 bits), so the decoder's width ladder is on the oracle's hash
# path; the >4096-entry CLEAR/reset branch is exercised by the pytest
# round-trips over longer random streams.
GIF_W = GIF_H = 70
_GIF_HASH_MULT = 2654435761  # Knuth multiplicative constant (public)


def gif_index(media_id: int, k: np.ndarray) -> np.ndarray:
    """Palette index of pixel k: a multiplicative-hash pseudo-random byte
    (incompressible ⇒ one LZW emit per pixel ⇒ full width ladder)."""
    return (((k * _GIF_HASH_MULT + media_id) >> 13) % 256).astype(np.uint8)


def gif_palette() -> np.ndarray:
    i = np.arange(256, dtype=np.int64)
    return np.stack([i, (7 * i + 3) % 256, (13 * i + 5) % 256],
                    axis=1).astype(np.uint8)


def gen_gif(media_id: int) -> bytes:
    k = np.arange(GIF_W * GIF_H, dtype=np.int64)
    idx = gif_index(media_id, k).reshape(GIF_H, GIF_W)
    return encode_gif(idx, gif_palette())


def vid_n_frames(media_id: int) -> int:
    return 2 + media_id % 4


def gen_video(media_id: int) -> bytes:
    n = vid_n_frames(media_id)
    k = np.arange(VID_W * VID_H, dtype=np.int64)
    frames = np.stack(
        [((media_id * 17 + f * 29 + k) % 256).astype(np.uint8).reshape(VID_H, VID_W)
         for f in range(n)]
    )
    return encode_y4m(frames)


# ----------------------------------------------------------------- JPEG --
# Baseline sequential-DCT JPEG, grayscale (ITU-T T.81 / ISO 10918-1, the
# public spec). REAL interchange format end-to-end: DQT/SOF0/DHT/SOS
# marker segments, canonical Huffman entropy coding with 0xFF00 byte
# stuffing, zigzag coefficient order, 8x8 FDCT/IDCT, DC prediction.
# The Huffman tables are our own canonical ones (fixed-length layers) —
# JPEG carries tables in the DHT segment, so any valid canonical table is
# a conforming file; this avoids transcribing the (optional) Annex K
# example tables. Unit quantization tables make flat 8x8 blocks decode
# BIT-EXACTLY (DC-only blocks survive FDCT→round→IDCT→round unchanged),
# which is what makes the SQL oracle over the fixture arithmetic exact;
# non-flat content round-trips within ±2 (AC path, proven in pytest).


def _zigzag_order() -> list[int]:
    out = []
    for s in range(15):
        rng = range(s + 1)
        for r in (rng if s % 2 else reversed(rng)):
            c = s - r
            if r < 8 and c < 8:
                out.append(r * 8 + c)
    return out


_ZZ = np.array(_zigzag_order(), np.int64)  # zigzag position -> raster index

# canonical Huffman layouts: 12 DC categories at length 4; EOB + ZRL +
# (run 0..15 x size 1..10) = 162 AC symbols at length 8 (Kraft 162/256<1;
# the reserved all-ones code 0xFF is never assigned since 162 <= 255)
_JDC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JDC_VALS = list(range(12))
_JAC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_JAC_VALS = [0x00, 0xF0] + [r * 16 + s for r in range(16) for s in range(1, 11)]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), the canonical JPEG construction (T.81
    Annex C): codes count up within a length, shift left between lengths."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return codes


_DCT_M: np.ndarray | None = None


def _dct_matrix() -> np.ndarray:
    global _DCT_M
    if _DCT_M is None:
        x = np.arange(8, dtype=np.float64)
        u = x.reshape(8, 1)
        m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
        m[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
        _DCT_M = m
    return _DCT_M


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec F.1.2.3)
        return bytes(self.out)


def _jcategory(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _encode_block(bw: "_BitWriter", plane: np.ndarray, by: int, bx: int,
                  q_raster: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """FDCT+quantize+entropy-code one 8x8 block; returns the new DC pred."""
    m = _dct_matrix()
    f = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64) - 128.0
    coef = m @ f @ m.T
    zq = np.round(coef.flatten() / q_raster).astype(np.int64)[_ZZ]
    diff = int(zq[0]) - pred
    s = _jcategory(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zq[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _jcategory(v)
        code, ln = ac_codes[run * 16 + s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zq[0])


def _jpeg_headers(h: int, w: int, ncomp: int, qz: np.ndarray) -> bytes:
    head = b"\xff\xd8"  # SOI
    head += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qz))  # DQT
    comp_spec = b"".join(bytes([c + 1, 0x11, 0]) for c in range(ncomp))
    head += _seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([ncomp]) + comp_spec,
    )  # SOF0, 1x1 sampling everywhere
    head += _seg(0xC4, bytes([0x00]) + bytes(_JDC_BITS) + bytes(_JDC_VALS))
    head += _seg(0xC4, bytes([0x10]) + bytes(_JAC_BITS) + bytes(_JAC_VALS))
    scan_spec = b"".join(bytes([c + 1, 0x00]) for c in range(ncomp))
    head += _seg(0xDA, bytes([ncomp]) + scan_spec + bytes([0, 63, 0]))  # SOS
    return head


def encode_jpeg_gray(img: np.ndarray, qz: np.ndarray | None = None) -> bytes:
    """(h, w) uint8 grayscale → baseline JPEG bytes. h, w must be multiples
    of 8 (no partial-MCU padding). ``qz`` = 64 quantization divisors in
    ZIGZAG order (default all-ones → near-lossless)."""
    h, w = img.shape
    if h % 8 or w % 8:
        raise ValueError("dimensions must be multiples of 8")
    qz = np.ones(64, np.int64) if qz is None else np.asarray(qz, np.int64)
    q_raster = np.empty(64, np.int64)
    q_raster[_ZZ] = qz
    dc_codes = _huff_codes(_JDC_BITS, _JDC_VALS)
    ac_codes = _huff_codes(_JAC_BITS, _JAC_VALS)
    bw = _BitWriter()
    pred = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            pred = _encode_block(bw, img, by, bx, q_raster, pred,
                                 dc_codes, ac_codes)
    return _jpeg_headers(h, w, 1, qz) + bw.flush() + b"\xff\xd9"


def encode_jpeg_color(rgb: np.ndarray, qz: np.ndarray | None = None) -> bytes:
    """(h, w, 3) uint8 RGB → baseline color JPEG (YCbCr 4:4:4, interleaved
    MCUs, per-component DC prediction, one shared quant/Huffman table set
    — a conforming JFIF-style stream). Gray content (R=G=B) maps to
    Cb=Cr=128 exactly, which with unit quant tables keeps flat gray
    blocks bit-exact through the full color path."""
    h, w, _ = rgb.shape
    if h % 8 or w % 8:
        raise ValueError("dimensions must be multiples of 8")
    qz = np.ones(64, np.int64) if qz is None else np.asarray(qz, np.int64)
    q_raster = np.empty(64, np.int64)
    q_raster[_ZZ] = qz
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    planes = np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    )
    planes = np.clip(np.round(planes), 0, 255)
    dc_codes = _huff_codes(_JDC_BITS, _JDC_VALS)
    ac_codes = _huff_codes(_JAC_BITS, _JAC_VALS)
    bw = _BitWriter()
    pred = [0, 0, 0]
    for by in range(h // 8):
        for bx in range(w // 8):
            for c in range(3):  # interleaved MCU
                pred[c] = _encode_block(bw, planes[c], by, bx, q_raster,
                                        pred[c], dc_codes, ac_codes)
    return _jpeg_headers(h, w, 3, qz) + bw.flush() + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self, nbits: int) -> None:
        while self.n < nbits:
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.d[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy data")
                self.pos += 1  # skip the stuffed zero byte
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill(nbits)
        v = (self.acc >> (self.n - nbits)) & ((1 << nbits) - 1)
        self.n -= nbits
        self.acc &= (1 << self.n) - 1
        return v

    def receive_extend(self, s: int) -> int:
        v = self.read(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        for _ in range(16):
            code = (code << 1) | self.read(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w) uint8 grayscale or (h, w, 3) uint8
    RGB. Real decode path: marker-segment walk, DQT/DHT table load (any
    conforming canonical tables — read from the file, not assumed), SOF0
    frame header, SOS interleaved entropy decode (Huffman + per-component
    DC prediction + run-length AC + byte unstuffing), dequantize,
    zigzag→raster, IDCT, level shift + clamp, and for 3 components the
    JFIF YCbCr→RGB transform. Supports what the encoders emit: 8-bit,
    1 or 3 components, 1x1 sampling, no restart intervals (raises
    otherwise — documented limitation)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qz = None
    h = w = None
    ncomp = 1
    dc_tab: dict[tuple[int, int], int] = {}
    ac_tab: dict[tuple[int, int], int] = {}
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        length = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if tq == 0:
                    qz = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                tab = {
                    (ln, code): sym
                    for sym, (code, ln) in _huff_codes(bits, vals).items()
                }
                if th == 0:
                    if tc == 0:
                        dc_tab = tab
                    else:
                        ac_tab = tab
                i += 17 + nv
        elif marker == 0xC0:  # SOF0
            ncomp = body[5]
            if body[0] != 8 or ncomp not in (1, 3):
                raise ValueError("only 8-bit 1- or 3-component supported")
            for c in range(ncomp):
                if body[7 + 3 * c] != 0x11:
                    raise ValueError("only 1x1 sampling (no subsampling)")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if h is None or qz is None or not dc_tab or not ac_tab:
                raise ValueError("SOS before required tables/frame header")
            if h % 8 or w % 8:
                raise ValueError("partial MCUs unsupported")
            q_raster = np.empty(64, np.int64)
            q_raster[_ZZ] = qz
            m = _dct_matrix()
            planes = np.zeros((ncomp, h, w), np.float64)
            br = _BitReader(payload, pos)
            pred = [0] * ncomp
            for by in range(h // 8):
                for bx in range(w // 8):
                    for c in range(ncomp):  # interleaved MCU: one block/comp
                        z = np.zeros(64, np.int64)
                        s = br.huff(dc_tab)
                        pred[c] += br.receive_extend(s) if s else 0
                        z[0] = pred[c]
                        k = 1
                        while k < 64:
                            sym = br.huff(ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 15
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            z[k] = br.receive_extend(size)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[_ZZ] = z * qz
                        f = m.T @ coef.reshape(8, 8) @ m
                        planes[c, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            np.round(f) + 128
                        )
            if ncomp == 1:
                return np.clip(planes[0], 0, 255).astype(np.uint8)
            y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
            rgb = np.stack(
                [
                    y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb,
                ],
                axis=-1,
            )
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        # other APPn/COM segments: skipped
    raise ValueError("no scan data found")


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Grayscale-only entry: decode and insist on a single component."""
    out = decode_jpeg(payload)
    if out.ndim != 2:
        raise ValueError("expected a grayscale JPEG")
    return out


IMG_JW, IMG_JH = 48, 32  # 6x4 MCUs


def gen_jpeg(media_id: int) -> bytes:
    """Deterministic grayscale JPEG: 8x8 block b (raster order) is flat
    value (media_id*31 + 17b) % 256. Flat blocks + unit quant tables make
    the decode bit-exact, so channel sums are SQL-expressible while the
    full entropy-coded container is real (DC prediction across 24 blocks
    exercises every category; the pytest gradient round-trip exercises
    the AC path)."""
    bcols, brows = IMG_JW // 8, IMG_JH // 8
    b = np.arange(brows * bcols, dtype=np.int64)
    vals = ((media_id * 31 + 17 * b) % 256).astype(np.uint8).reshape(brows, bcols)
    img = np.kron(vals, np.ones((8, 8), np.uint8))
    return encode_jpeg_gray(img)


def gen_jpeg_color(media_id: int) -> bytes:
    """Deterministic color JPEG: 8x8 block b (raster order) is flat GRAY
    value (media_id*23 + 13b) % 256 on all three channels — gray content
    keeps the YCbCr round trip bit-exact (Cb=Cr=128), so the decoded RGB
    sums stay SQL-expressible while the interleaved 3-component entropy
    stream is real."""
    bcols, brows = IMG_JW // 8, IMG_JH // 8
    b = np.arange(brows * bcols, dtype=np.int64)
    vals = ((media_id * 23 + 13 * b) % 256).astype(np.uint8).reshape(brows, bcols)
    gray = np.kron(vals, np.ones((8, 8), np.uint8))
    return encode_jpeg_color(np.stack([gray, gray, gray], axis=-1))
