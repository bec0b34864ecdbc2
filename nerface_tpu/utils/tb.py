"""TensorBoard-compatible logging.

Same scalar/image panel names as the reference's SummaryWriter usage
(`train_transformed_rays.py:200-206,415-424,518-541`): train/coarse_loss,
train/fine_loss, train/psnr, train/code_loss, train/bg_loss,
validation/{loss,coarse_loss,fine_loss,psnr} and image panels
validation/{rgb_coarse,rgb_fine,img_target,background,weights}.  The
config snapshot is dumped to `logdir/config.yml` on construction.
"""

from __future__ import annotations

import os
import threading

import numpy as np


class ScalarWriter:
    """Thread-safe: the train loop logs train scalars from a background IO
    thread (metric pulls cost a host round trip each on the tunneled
    backend — train/loop.py round 4) while validation images are written
    from the main thread; a lock serializes the underlying writer."""

    def __init__(self, logdir: str, cfg=None, enabled: bool = True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._lock = threading.Lock()
        self._writer = None
        if enabled:
            try:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(logdir)
            except ImportError:  # pragma: no cover
                self._writer = None
        if cfg is not None:
            with open(os.path.join(logdir, "config.yml"), "w") as f:
                f.write(cfg.dump())

    def scalar(self, tag: str, value, step: int):
        with self._lock:
            if self._writer is not None:
                self._writer.add_scalar(tag, float(value), step)

    def image(self, tag: str, img: np.ndarray, step: int, dataformats: str = "HWC"):
        with self._lock:
            if self._writer is not None:
                img = np.asarray(img)
                if img.dtype != np.uint8:
                    img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
                self._writer.add_image(tag, img, step, dataformats=dataformats)

    def flush(self):
        with self._lock:
            if self._writer is not None:
                self._writer.flush()

    def close(self):
        with self._lock:
            if self._writer is not None:
                self._writer.close()
                self._writer = None
