"""Raw YUV420 reader (geometry supplied externally, like the app's -i *.yuv path).

ref: Source/App/app_process_cmd.c:612-770 (mmap / normal / buffered read modes).
On this side a single memory-mapped numpy view covers all three modes.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple, Union

import numpy as np


class YuvReader:
    def __init__(self, path: Union[str, os.PathLike], width: int, height: int,
                 bit_depth: int = 8):
        self.width, self.height, self.bit_depth = width, height, bit_depth
        self._dt = np.uint16 if bit_depth > 8 else np.uint8
        bpp = 2 if bit_depth > 8 else 1
        self._frame_bytes = (width * height * 3 // 2) * bpp
        self._data = np.memmap(path, dtype=np.uint8, mode="r")
        self.num_frames = len(self._data) // self._frame_bytes

    def read_frame(self, idx: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if not 0 <= idx < self.num_frames:
            raise IndexError(idx)
        raw = self._data[idx * self._frame_bytes:(idx + 1) * self._frame_bytes]
        a = raw.view(self._dt)
        w, h = self.width, self.height
        yl, cl = w * h, (w // 2) * (h // 2)
        y = a[:yl].reshape(h, w)
        u = a[yl:yl + cl].reshape(h // 2, w // 2)
        v = a[yl + cl:yl + 2 * cl].reshape(h // 2, w // 2)
        return y, u, v

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        for i in range(self.num_frames):
            yield self.read_frame(i)

    def __len__(self):
        return self.num_frames
