"""Pure-Python image/video codecs for the multimodal pipeline — no
imaging library needed (SURVEY §2.10 multimodal; VERDICT r2 "Next
round" #3).

Two deterministic container formats:

- **PPM (P6)** — the standard Netpbm binary RGB format:
  ``P6\\n{w} {h}\\n255\\n`` followed by w*h*3 raw RGB bytes. Any image
  viewer opens these; the codec here is a from-scratch implementation
  of the published spec (public knowledge), ~30 lines.
- **PVID** — a trivially demuxable uncompressed "video": header
  ``PV\\n{w} {h} {n_frames}\\n255\\n`` followed by n_frames contiguous
  w*h*3 RGB frame payloads. Stand-in for a real container so the demux
  → frame-sample stage operates on actual framed pixel data.

Synthesis derives pixel bytes by cycling the document's UTF-8 text —
fully deterministic and reproducible in SQL (repeat+substr), which
keeps the multimodal query keys hash-checked against the DuckDB
oracle even though the transforms run in numpy.
"""

from __future__ import annotations

import numpy as np

PPM_MAGIC = b"P6"
PVID_MAGIC = b"PV"


def ppm_encode(width: int, height: int, pixels: bytes) -> bytes:
    """Encode raw RGB bytes (len == width*height*3) as binary PPM."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}x3")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def ppm_decode(data: bytes) -> tuple[int, int, bytes]:
    """Decode a binary PPM produced by ``ppm_encode`` (P6, maxval 255,
    single-whitespace header — the canonical form). Returns
    (width, height, raw RGB bytes)."""
    if not data.startswith(b"P6\n"):
        raise ValueError("not a P6 PPM payload")
    # header: P6\n{w} {h}\n255\n
    nl1 = data.index(b"\n")
    nl2 = data.index(b"\n", nl1 + 1)
    nl3 = data.index(b"\n", nl2 + 1)
    w_s, h_s = data[nl1 + 1 : nl2].split()
    if data[nl2 + 1 : nl3] != b"255":
        raise ValueError("unsupported maxval")
    width, height = int(w_s), int(h_s)
    pixels = data[nl3 + 1 :]
    if len(pixels) != width * height * 3:
        raise ValueError("truncated pixel section")
    return width, height, pixels


def resize_nearest(
    pixels: bytes, width: int, height: int, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of an RGB buffer. Index math is pinned
    to ``sx = (x * width) // out_w`` (floor) so the DuckDB oracle can
    replay it with integer arithmetic."""
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    sy = (np.arange(out_h, dtype=np.int64) * height) // out_h
    sx = (np.arange(out_w, dtype=np.int64) * width) // out_w
    return arr[sy][:, sx].tobytes()


def pvid_encode(width: int, height: int, frames: list[bytes]) -> bytes:
    """Encode raw RGB frames (each len == width*height*3) as PVID."""
    fb = width * height * 3
    if any(len(f) != fb for f in frames):
        raise ValueError("frame size mismatch")
    return b"PV\n%d %d %d\n255\n" % (width, height, len(frames)) + b"".join(frames)


def pvid_decode(data: bytes) -> tuple[int, int, list[bytes]]:
    """Demux a PVID payload → (width, height, [frame RGB bytes...])."""
    if not data.startswith(b"PV\n"):
        raise ValueError("not a PVID payload")
    nl1 = data.index(b"\n")
    nl2 = data.index(b"\n", nl1 + 1)
    nl3 = data.index(b"\n", nl2 + 1)
    w_s, h_s, n_s = data[nl1 + 1 : nl2].split()
    width, height, n_frames = int(w_s), int(h_s), int(n_s)
    fb = width * height * 3
    body = data[nl3 + 1 :]
    if len(body) != n_frames * fb:
        raise ValueError("truncated frame section")
    return width, height, [body[i * fb : (i + 1) * fb] for i in range(n_frames)]


def cycle_bytes(src: bytes, n: int) -> bytes:
    """Cycle ``src`` to exactly ``n`` bytes (SQL: substr(repeat(...)))."""
    if not src:
        return bytes(n)
    reps = -(-n // len(src))
    return (src * reps)[:n]
