"""Storage writing field time series as (lossily quantized) video files.

Reference: `/root/reference/pde/storage/movie.py:83`: fields are quantized to
16-bit gray frames between `vmin` and `vmax`, encoded with the lossless FFV1
codec via ffmpeg, and the metadata needed for reconstruction is stored in a
JSON sidecar. When the `ffmpeg` binary is unavailable the frames are written
uncompressed ("raw" backend) with identical quantization semantics, so stored
series remain readable and the format logic stays exercised in environments
without ffmpeg.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import numpy as np

from ..fields.base import FieldBase
from ..trackers.base import InfoDict
from .base import StorageBase


class MovieStorage(StorageBase):
    """Stores scalar-field time series in a video file (16-bit quantization)."""

    def __init__(
        self,
        filename: str,
        *,
        vmin: float = 0,
        vmax: float = 1,
        bits_per_channel: int = 16,
        video_format: str = "auto",
        bitrate: int = -1,
        info: InfoDict | None = None,
        write_mode: str = "truncate_once",
        write_times: bool = True,
    ):
        super().__init__(info=info, write_mode=write_mode)
        self._backend = "ffmpeg" if shutil.which("ffmpeg") else "raw"
        if self._backend == "raw":
            import logging

            logging.getLogger(__name__).warning(
                "ffmpeg not found: MovieStorage falls back to uncompressed "
                "raw frames"
            )
        self.filename = str(filename)
        self.vmin = float(vmin)
        self.vmax = float(vmax)
        if bits_per_channel not in (8, 16):
            raise ValueError("bits_per_channel must be 8 or 16")
        self.bits_per_channel = bits_per_channel
        self.write_times = write_times
        self._times: list[float] = []
        self._proc = None
        self._shape: tuple[int, ...] | None = None

        import os

        if os.path.exists(self._meta_path) and os.path.exists(self.filename):
            self._load_meta()

    @property
    def _meta_path(self) -> str:
        return self.filename + ".json"

    # -- writing -----------------------------------------------------------------------
    def start_writing(self, field: FieldBase, info: InfoDict | None = None) -> None:
        if field.data.ndim != 2:
            raise NotImplementedError("MovieStorage only supports 2d scalar fields")
        super().start_writing(field, info)
        self._times = []
        self._shape = tuple(np.asarray(field.data).shape)
        h, w = self._shape
        if self._backend == "raw":
            self._raw_fh = open(self.filename, "wb")
            return
        pix_fmt = "gray16le" if self.bits_per_channel == 16 else "gray"
        cmd = [
            "ffmpeg", "-y",
            "-f", "rawvideo", "-vcodec", "rawvideo",
            "-s", f"{w}x{h}", "-pix_fmt", pix_fmt, "-r", "30", "-i", "-",
            "-an", "-vcodec", "ffv1", self.filename,
        ]
        self._proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    def _quantize(self, data: np.ndarray) -> np.ndarray:
        scale = (2**self.bits_per_channel - 1) / (self.vmax - self.vmin)
        clipped = np.clip((data - self.vmin) * scale, 0, 2**self.bits_per_channel - 1)
        dtype = np.uint16 if self.bits_per_channel == 16 else np.uint8
        return clipped.astype(dtype)

    def _dequantize(self, raw: np.ndarray) -> np.ndarray:
        scale = (self.vmax - self.vmin) / (2**self.bits_per_channel - 1)
        return raw.astype(float) * scale + self.vmin

    def append(self, field: FieldBase, time: float | None = None) -> None:
        if self._proc is None and getattr(self, "_raw_fh", None) is None:
            self.start_writing(field)
        data = np.asarray(field.data)
        payload = self._quantize(data).tobytes()
        if self._backend == "raw":
            self._raw_fh.write(payload)
        else:
            self._proc.stdin.write(payload)
        self._times.append(float(time) if time is not None else len(self._times))

    def end_writing(self) -> None:
        if self._proc is not None:
            self._proc.stdin.close()
            self._proc.wait()
            self._proc = None
        if getattr(self, "_raw_fh", None) is not None:
            self._raw_fh.close()
            self._raw_fh = None
        meta = {
            "vmin": self.vmin,
            "vmax": self.vmax,
            "bits_per_channel": self.bits_per_channel,
            "backend": self._backend,
            "shape": list(self._shape or ()),
            "times": self._times,
            "field_attributes": (
                self._field.attributes_serialized if self._field else None
            ),
        }
        with open(self._meta_path, "w") as fh:
            json.dump(meta, fh)

    # -- reading ------------------------------------------------------------------------
    def _load_meta(self) -> None:
        with open(self._meta_path) as fh:
            meta = json.load(fh)
        self.vmin = meta["vmin"]
        self.vmax = meta["vmax"]
        self.bits_per_channel = meta["bits_per_channel"]
        self._backend = meta.get("backend", self._backend)
        self._shape = tuple(meta["shape"])
        self._times = list(meta["times"])
        attrs = meta.get("field_attributes")
        if attrs:
            field_cls = FieldBase._subclasses[attrs["class"]]
            kwargs = field_cls.unserialize_attributes(attrs)
            kwargs.pop("class", None)
            kwargs.pop("dtype", None)
            grid = kwargs.pop("grid")
            self._field = field_cls(grid, **kwargs)  # type: ignore[call-arg]
            self._grid = grid
            self._data_shape = self._shape
            self._dtype = np.dtype(float)

    @property
    def times(self):
        return list(self._times)

    def __len__(self) -> int:
        return len(self._times)

    @property
    def data(self):
        return _MovieFrames(self)

    def _read_frames(self) -> np.ndarray:
        h, w = self._shape  # type: ignore[misc]
        dtype = np.uint16 if self.bits_per_channel == 16 else np.uint8
        if self._backend == "raw":
            raw = open(self.filename, "rb").read()
        else:
            pix_fmt = "gray16le" if self.bits_per_channel == 16 else "gray"
            cmd = [
                "ffmpeg", "-i", self.filename,
                "-f", "rawvideo", "-pix_fmt", pix_fmt, "-",
            ]
            raw = subprocess.run(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                check=True,
            ).stdout
        frames = np.frombuffer(raw, dtype=dtype)
        count = len(frames) // (h * w)
        return frames[: count * h * w].reshape(count, h, w)

    def _get_field(self, t_index: int) -> FieldBase:
        frames = self._read_frames()
        return self._reconstruct_field(self._dequantize(frames[t_index]))


class _MovieFrames:
    """Lazy frame accessor for MovieStorage."""

    def __init__(self, storage: MovieStorage):
        self._storage = storage

    def __getitem__(self, index):
        frames = self._storage._read_frames()
        return self._storage._dequantize(frames[index])

    def __len__(self):
        return len(self._storage)
