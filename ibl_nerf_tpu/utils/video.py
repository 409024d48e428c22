"""PNG sequence -> video export.

Parity: /root/reference/src/utils/video_export.py:8-59 (cv2
VideoWriter .avi).
"""

from __future__ import annotations

import glob
import os

import cv2


def export_as_video(image_dir: str, pattern: str, out_path: str,
                    fps: int = 30):
    """Encode `{image_dir}/{pattern}` (glob) into out_path (.avi/.mp4)."""
    files = sorted(glob.glob(os.path.join(image_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no frames match {pattern} in {image_dir}")
    first = cv2.imread(files[0])
    h, w = first.shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*("XVID" if out_path.endswith(".avi")
                                      else "mp4v"))
    writer = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
    for f in files:
        writer.write(cv2.imread(f))
    writer.release()
    return out_path


def export_stack_as_video(stack, out_path: str, fps: int = 30):
    """(N, H, W, 3) float [0,1] array -> video."""
    import numpy as np

    n, h, w = stack.shape[:3]
    fourcc = cv2.VideoWriter_fourcc(*("XVID" if out_path.endswith(".avi")
                                      else "mp4v"))
    writer = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
    for i in range(n):
        frame = (np.clip(stack[i], 0, 1) * 255).astype("uint8")
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()
    return out_path
