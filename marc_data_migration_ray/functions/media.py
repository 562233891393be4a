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

So the engine's multimodal decode stage is a REAL parser pipeline — the
only thing stubbed in ``pipelines/multimodal`` is compressed codecs
(JPEG/MP3/H.264), which genuinely need external libraries.

Encoders here exist for the deterministic fixture generator; decoders are
what the actor-pool stage runs. Both sides are exercised round-trip in
pytest, and the decoded statistics are integer-exact mirrors of the
generator arithmetic, so a DuckDB oracle checks the REAL parse path
end-to-end (wrong stride/offset arithmetic ⇒ hash mismatch).
"""

from __future__ import annotations

import io
import wave

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
