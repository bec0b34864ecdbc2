"""Video assembly without ffmpeg (`tools/video_writer.py`) — the
reference's `videos.txt` ffmpeg filtergraphs (hstack triptychs of
frames | render | normals) as a pure-PIL MJPEG-AVI / GIF writer."""

import io
import struct

import numpy as np
import pytest
from PIL import Image

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.video_writer import (
    compose_frames,
    main,
    write_gif,
    write_mjpeg_avi,
)


def _frames(n=6, h=24, w=16, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 255, (h, w, 3), np.uint8) for _ in range(n)]


def _frame_dir(tmp_path, name, frames):
    d = tmp_path / name
    d.mkdir()
    for i, f in enumerate(frames):
        Image.fromarray(f).save(d / f"{i:04d}.png")
    return str(d)


class TestAvi:
    def test_container_structure(self, tmp_path):
        frames = _frames(6)
        path = str(tmp_path / "out.avi")
        assert write_mjpeg_avi(path, iter(frames), fps=50) == 6
        blob = open(path, "rb").read()

        assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
        assert struct.unpack("<I", blob[4:8])[0] == len(blob) - 8
        assert blob.count(b"00dc") == 12  # 6 movi chunks + 6 idx1 rows

        # Main header: µs/frame at 50 fps, frame count, dimensions.
        avih = blob.index(b"avih") + 8
        us, _, _, flags, total = struct.unpack("<5I", blob[avih:avih + 20])
        assert us == 20000 and total == 6 and flags & 0x10
        w, h = struct.unpack("<2I", blob[avih + 32:avih + 40])
        assert (w, h) == (16, 24)

        # Every movi chunk decodes back to a frame-shaped JPEG.
        idx = blob.index(b"idx1") + 8
        movi = blob.index(b"movi")
        for i in range(6):
            fcc, fl, off, size = struct.unpack(
                "<4s3I", blob[idx + 16 * i: idx + 16 * (i + 1)]
            )
            assert fcc == b"00dc" and fl == 0x10
            jpeg = blob[movi + off + 8: movi + off + 8 + size]
            img = Image.open(io.BytesIO(jpeg))
            assert img.size == (16, 24) and img.format == "JPEG"

    def test_jpeg_content_matches(self, tmp_path):
        frame = np.full((16, 16, 3), 128, np.uint8)
        path = str(tmp_path / "flat.avi")
        write_mjpeg_avi(path, [frame], quality=95)
        blob = open(path, "rb").read()
        start = blob.index(b"movi") + 4
        fcc, size = blob[start:start + 4], struct.unpack(
            "<I", blob[start + 4:start + 8]
        )[0]
        assert fcc == b"00dc"
        decoded = np.asarray(
            Image.open(io.BytesIO(blob[start + 8:start + 8 + size]))
        )
        assert np.abs(decoded.astype(int) - 128).max() <= 3

    def test_mismatched_sizes_rejected(self, tmp_path):
        with pytest.raises(ValueError):
            write_mjpeg_avi(
                str(tmp_path / "x.avi"),
                [np.zeros((8, 8, 3), np.uint8), np.zeros((9, 8, 3), np.uint8)],
            )
        with pytest.raises(ValueError):
            write_mjpeg_avi(str(tmp_path / "y.avi"), [])


class TestGif:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "out.gif")
        assert write_gif(path, _frames(4, 8, 8), fps=25) == 4
        img = Image.open(path)
        assert img.n_frames == 4 and img.size == (8, 8)


class TestCompose:
    def test_hstack_and_rescale(self, tmp_path):
        a = _frame_dir(tmp_path, "a", _frames(3, 24, 16, seed=1))
        b = _frame_dir(tmp_path, "b", _frames(5, 12, 10, seed=2))
        out = list(compose_frames([a, b]))
        # truncated to the shorter sequence; column b upscaled to h=24
        assert len(out) == 3
        assert out[0].shape == (24, 16 + 20, 3)

    def test_single_image_repeats(self, tmp_path):
        a = _frame_dir(tmp_path, "a", _frames(4, 8, 8))
        still = tmp_path / "still.png"
        Image.fromarray(_frames(1, 8, 8)[0]).save(still)
        out = list(compose_frames([str(still), a]))
        assert len(out) == 4
        np.testing.assert_array_equal(
            out[0][:, :8], out[3][:, :8]
        )  # the still column never changes

    def test_cli(self, tmp_path, capsys):
        a = _frame_dir(tmp_path, "a", _frames(3, 8, 8))
        out = str(tmp_path / "clip.avi")
        main([out, a, a, "--fps", "10", "--max-frames", "2"])
        assert "wrote 2 frames" in capsys.readouterr().out
        blob = open(out, "rb").read()
        avih = blob.index(b"avih") + 8
        w, h = struct.unpack("<2I", blob[avih + 32:avih + 40])
        assert (w, h) == (16, 8)  # two hstacked 8x8 columns
