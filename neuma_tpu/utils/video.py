"""Video/GIF packing from saved frames (reference
``modules/tune/utils.py:89-154`` save_video_mediapy/save_gif_imageio;
imageio-backed here since mediapy is not in the image)."""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def _natsorted(paths):
    import re

    def key(p):
        return [
            int(t) if t.isdigit() else t
            for t in re.split(r"(\d+)", str(p))
        ]

    return sorted(paths, key=key)


def _load_frames(frame_dir, frame_glob, skip_frame, white_bg, resize=None):
    from PIL import Image

    paths = _natsorted(Path(frame_dir).glob(frame_glob))[::skip_frame]
    frames = []
    bg = np.array([1, 1, 1]) if white_bg else np.array([0, 0, 0])
    for p in paths:
        image = Image.open(p)
        if resize is not None:
            image = image.resize(resize)
        if image.mode == "RGBA":
            rgba = np.array(image) / 255.0
            rgb = rgba[:, :, :3] * rgba[:, :, 3:] + (1 - rgba[:, :, 3:]) * bg
            frames.append((rgb * 255).astype(np.uint8))
        else:
            frames.append(np.array(image.convert("RGB")))
    return frames


def save_video(
    frame_dir,
    frame_glob: str,
    output_path,
    skip_frame: int = 1,
    fps: int = 30,
    white_bg: bool = False,
) -> None:
    import imageio

    frames = _load_frames(frame_dir, frame_glob, skip_frame, white_bg)
    if not frames:
        print(f"No frames matching {frame_glob} in {frame_dir}")
        return
    try:
        imageio.mimsave(output_path, frames, fps=fps)
    except Exception:
        # ffmpeg plugin may be unavailable; fall back to GIF
        output_path = Path(output_path).with_suffix(".gif")
        imageio.mimsave(output_path, frames, duration=1.0 / fps, loop=0)
    print(f"Video saved to {output_path} (skip {skip_frame}, fps {fps})")


def save_gif(
    frame_dir,
    frame_glob: str,
    output_path,
    skip_frame: int = 1,
    fps: int = 30,
    white_bg: bool = False,
    resize: Optional[Tuple[int, int]] = None,
) -> None:
    import imageio

    frames = _load_frames(
        frame_dir, frame_glob, skip_frame, white_bg, resize
    )
    imageio.mimsave(output_path, frames, duration=1.0 / fps, loop=0)
    print(f"GIF saved to {output_path}")
