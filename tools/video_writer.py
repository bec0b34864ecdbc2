#!/usr/bin/env python
"""Assemble rendered frame folders into videos — without ffmpeg.

The reference assembles its result videos with ffmpeg one-liners
(`videos.txt`, `commands_rebuttal_videos.txt`): triptychs of
driving-actor frames | render | normals hstacked at 50 fps. This image
ships no ffmpeg, so this tool writes the two formats that need nothing
beyond PIL:

- **MJPEG AVI** (`.avi`): a RIFF container of per-frame JPEGs — written
  directly (the container format is ~5 fixed structs), plays everywhere,
  frame-exact, and encodes at PIL-JPEG speed.
- **GIF** (`.gif`): PIL's native animated-GIF path (256-color; previews).

Compositions mirror the reference's ffmpeg filtergraphs: each input is a
frame directory (or a single repeated image), scaled to a common height
and hstacked. RUNBOOK.md §7 keeps the original ffmpeg commands for
machines that have it.

    python tools/video_writer.py out.avi --fps 50 \
        renders/driven/ renders/driven/normals/        # side-by-side
    python tools/video_writer.py out.gif --fps 25 renders/person_1/
"""

from __future__ import annotations

import argparse
import io
import itertools
import os
import struct
from typing import Iterable, List, Sequence


def _jpeg_bytes(frame, quality: int) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame).convert("RGB").save(
        buf, format="JPEG", quality=quality
    )
    return buf.getvalue()


def write_mjpeg_avi(
    path: str, frames: Iterable, fps: int = 25, quality: int = 92
) -> int:
    """Write frames (HxWx3 uint8 arrays) as an MJPEG AVI; returns the
    frame count. True single streaming pass: each JPEG chunk goes to
    disk as it is encoded (only the 16-byte-per-frame index entry is
    retained), and the length/count header fields — unknown up front —
    are seek-patched at the end. Keeps a 50 fps triptych of thousands of
    512x512 frames from holding hundreds of MB of JPEG data resident."""
    u32 = lambda x: struct.pack("<I", x)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + u32(len(payload)) + payload + pad

    it = iter(frames)
    try:
        first = next(it)
    except StopIteration:
        raise ValueError("no frames")
    height, width = first.shape[:2]

    with open(path, "wb") as f:
        f.write(b"RIFF" + u32(0) + b"AVI ")          # riff size @4

        # AVIMAINHEADER: µs/frame, max bytes/s, pad, flags (HASINDEX),
        # frames, initial, streams, buffer, WxH, reserved[4] — the
        # max-bytes/frame-count fields are placeholders patched below
        avih = chunk(b"avih", struct.pack(
            "<10I4I", 1_000_000 // fps, 0, 0, 0x10, 0, 0, 1,
            0, width, height, 0, 0, 0, 0,
        ))
        # AVISTREAMHEADER: vids/MJPG, then flags/priority/frames/etc.
        strh = chunk(b"strh", struct.pack(
            "<4s4sI2H8I4h", b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, 0,
            0, 0xFFFFFFFF, 0, 0, 0, width, height,
        ))
        # BITMAPINFOHEADER
        strf = chunk(b"strf", struct.pack(
            "<I2i2H2I2i2I", 40, width, height, 1, 24, 0x47504A4D,
            width * height * 3, 0, 0, 0, 0,
        ))
        strl = b"LIST" + u32(4 + len(strh) + len(strf)) + b"strl"
        hdrl_payload = len(avih) + len(strl) + len(strh) + len(strf)
        f.write(b"LIST" + u32(4 + hdrl_payload) + b"hdrl")
        pos_avih = f.tell() + 8                       # avih payload
        f.write(avih)
        f.write(strl)
        pos_strh = f.tell() + 8                       # strh payload
        f.write(strh + strf)

        pos_movi_size = f.tell() + 4                  # LIST size field
        f.write(b"LIST" + u32(0) + b"movi")

        index: List[tuple] = []                       # (offset, jpeg size)
        off = 4                                       # from 'movi' tag
        max_bytes = 0
        n = 0
        for frame in itertools.chain((first,), it):
            if frame.shape[:2] != (height, width):
                raise ValueError(
                    f"frame size {frame.shape[:2]} != first frame "
                    f"{(height, width)}"
                )
            e = _jpeg_bytes(frame, quality)
            c = chunk(b"00dc", e)
            f.write(c)
            index.append((off, len(e)))
            off += len(c)
            max_bytes = max(max_bytes, len(e))
            n += 1
        movi_payload = 4 + sum(
            8 + s + (s % 2) for _, s in index
        )

        # idx1: fourcc, flags (KEYFRAME), offset from 'movi' tag, size
        f.write(chunk(b"idx1", b"".join(
            struct.pack("<4s3I", b"00dc", 0x10, o, s) for o, s in index
        )))

        end = f.tell()
        f.seek(4)
        f.write(u32(end - 8))
        f.seek(pos_avih + 4)                          # dwMaxBytesPerSec
        f.write(u32(max_bytes * fps))
        f.seek(pos_avih + 16)                         # dwTotalFrames
        f.write(u32(n))
        f.seek(pos_avih + 28)                         # dwSuggestedBufferSize
        f.write(u32(max_bytes))
        f.seek(pos_strh + 32)                         # dwLength
        f.write(u32(n))
        f.seek(pos_strh + 36)                         # dwSuggestedBufferSize
        f.write(u32(max_bytes))
        f.seek(pos_movi_size)
        f.write(u32(movi_payload))
    return n


def write_gif(path: str, frames: Iterable, fps: int = 25) -> int:
    from PIL import Image

    imgs = [Image.fromarray(f).convert("RGB") for f in frames]
    if not imgs:
        raise ValueError("no frames")
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=max(1000 // fps, 20), loop=0,
    )
    return len(imgs)


def _list_frames(src: str) -> List[str]:
    if os.path.isfile(src):
        return [src]
    names = sorted(
        f for f in os.listdir(src)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not names:
        raise FileNotFoundError(f"no image frames in {src}")
    return [os.path.join(src, f) for f in names]


def compose_frames(
    sources: Sequence[str], height: int = 0, max_frames: int = 0
):
    """Yield hstacked frames from N image folders (the reference's
    `hstack=inputs=N` filtergraph). A single-file source repeats for the
    whole sequence; folders are time-aligned and truncated to the
    shortest. `height` rescales every column (0 = first source's)."""
    import numpy as np
    from PIL import Image

    lists = [_list_frames(s) for s in sources]
    n = min(len(l) for l in lists if len(l) > 1) if any(
        len(l) > 1 for l in lists
    ) else 1
    if max_frames:
        n = min(n, max_frames)
    for i in range(n):
        cols = []
        for frames in lists:
            img = Image.open(frames[i % len(frames)]).convert("RGB")
            h = height or (cols[0].shape[0] if cols else img.height)
            if img.height != h:
                img = img.resize(
                    (max(round(img.width * h / img.height), 1), h),
                    Image.BILINEAR,
                )
            cols.append(np.asarray(img))
        yield np.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="Assemble frame folders into an .avi (MJPEG) or .gif "
                    "without ffmpeg; multiple sources are hstacked."
    )
    ap.add_argument("output", help="output path ending in .avi or .gif")
    ap.add_argument("sources", nargs="+",
                    help="frame folders (or single images, repeated)")
    ap.add_argument("--fps", type=int, default=25)
    ap.add_argument("--height", type=int, default=0,
                    help="rescale all columns to this height")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--quality", type=int, default=92, help="JPEG quality")
    args = ap.parse_args(argv)

    frames = compose_frames(args.sources, args.height, args.max_frames)
    if args.output.lower().endswith(".avi"):
        n = write_mjpeg_avi(args.output, frames, args.fps, args.quality)
    elif args.output.lower().endswith(".gif"):
        n = write_gif(args.output, frames, args.fps)
    else:
        raise SystemExit("output must end in .avi or .gif")
    print(f"wrote {n} frames -> {args.output}")


if __name__ == "__main__":
    main()
