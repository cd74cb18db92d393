"""Storage writing field time series as (lossily quantized) video files.

Format-interchangeable with the reference (`/root/reference/pde/storage/
movie.py:83`): fields are normalized to ``[vmin, vmax]``, quantized to the
chosen pixel format, encoded with the lossless FFV1 codec via an ffmpeg
subprocess, and the reconstruction metadata is stored as a shlex-quoted JSON
string in the container's ``comment`` tag (version 1 — the reference's
scheme, so movies written by either implementation read back in the other).
Exact time stamps go to a ``<filename>.times`` sidecar text file (one float
per line), matching the reference's ``write_times`` behavior.

Three encode backends, in preference order: ``native`` (the in-process C++
codec ``pde_tpu/native/movie_codec.cpp`` linking libavformat directly — no
binary dependency, same on-disk format), ``ffmpeg`` (the external binary,
driven like the reference does), and ``raw`` (uncompressed frames with a
JSON sidecar, identical quantization semantics) when neither libav nor the
binary is present.  Files written by any backend read back through any
other — they are the same container/codec bytes for the first two, and the
raw fallback keeps the format logic exercised.
"""

from __future__ import annotations

import json
import os
import shlex
import shutil
import subprocess

import numpy as np

from ..fields.base import FieldBase
from ..trackers.base import InfoDict
from ..utils import ffmpeg as ffmpeg_formats
from ..utils import movie_native
from .base import StorageBase


class MovieStorage(StorageBase):
    """Stores scalar-field time series in a video file (quantized)."""

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
        if movie_native.is_available():
            self._backend = "native"
        elif shutil.which("ffmpeg"):
            self._backend = "ffmpeg"
        else:
            self._backend = "raw"
            import logging

            logging.getLogger(__name__).warning(
                "neither libav nor ffmpeg found: MovieStorage falls back to "
                "uncompressed raw frames"
            )
        self.filename = str(filename)
        self.vmin = float(vmin)
        self.vmax = float(vmax)
        if bits_per_channel not in (8, 16):
            raise ValueError("bits_per_channel must be 8 or 16")
        self.bits_per_channel = bits_per_channel
        self.video_format = video_format
        self.bitrate = int(bitrate)
        self.write_times = write_times
        self._times: list[float] = []
        self._proc = None
        self._writer = None
        self._shape: tuple[int, ...] | None = None
        self._meta_loaded = False

        if os.path.exists(self.filename):
            if os.path.exists(self._meta_path):
                self._load_meta()  # raw backend / legacy JSON sidecar
            elif self._backend != "raw":
                self._read_metadata()

    @property
    def _meta_path(self) -> str:
        return self.filename + ".json"

    @property
    def _times_path(self) -> str:
        return self.filename + ".times"

    @property
    def _format(self) -> ffmpeg_formats.FFmpegFormat:
        name = self.video_format
        if name == "auto":
            name = "gray16le" if self.bits_per_channel == 16 else "gray"
        return ffmpeg_formats.formats[name]

    def _get_metadata(self) -> str:
        """JSON metadata string stored in the movie comment (version 1)."""
        info = {
            "version": 1,
            "vmin": self.vmin,
            "vmax": self.vmax,
            "write_times": self.write_times,
            # extra keys (ignored by the reference, which reads frame
            # geometry from the stream): used by our ffprobe-less fallback
            "bits_per_channel": self.bits_per_channel,
            "width": self._shape[0] if self._shape else None,
            "height": self._shape[1] if self._shape and len(self._shape) > 1 else 1,
        }
        if self._field is not None:
            info["field_attributes"] = self._field.attributes_serialized
        return json.dumps(info)

    # -- writing -----------------------------------------------------------------------
    def start_writing(self, field: FieldBase, info: InfoDict | None = None) -> None:
        if field.data.ndim not in (1, 2):
            raise NotImplementedError(
                "MovieStorage only supports 1d/2d scalar fields"
            )
        super().start_writing(field, info)
        self._times = []
        self._shape = tuple(np.asarray(field.data).shape)
        # reference frame layout: -s {shape[0]}x{shape[1]} with C-order
        # bytes — the video's pixel grid is transposed relative to the
        # field, consistently on both ends (`movie.py:356-360, 484`)
        w0 = self._shape[0]
        h0 = self._shape[1] if len(self._shape) > 1 else 1
        if self._backend == "raw":
            self._raw_fh = open(self.filename, "wb")
            return
        fmt = self._format
        if self._backend == "native":
            if fmt.codec == "ffv1" and fmt.channels == 1:
                # the tag value is the shlex-QUOTED json, matching the
                # reference's ffmpeg-python invocation (unquoted on read)
                self._writer = movie_native.MovieWriter(
                    self.filename, w0, h0, bits=fmt.bits_per_channel,
                    comment=shlex.quote(self._get_metadata()),
                )
                return
            if not shutil.which("ffmpeg"):  # exotic format, no binary
                raise NotImplementedError(
                    f"video_format {self.video_format!r} requires the "
                    "ffmpeg binary"
                )
            self._backend = "ffmpeg"
        cmd = [
            "ffmpeg", "-y",
            "-f", "rawvideo", "-vcodec", "rawvideo",
            "-s", f"{w0}x{h0}", "-pix_fmt", fmt.pix_fmt_data,
            "-r", "30", "-i", "-",
            "-an", "-vcodec", fmt.codec, "-pix_fmt", fmt.pix_fmt_file,
            # the tag value is the shlex-QUOTED json — the reference writes
            # it through ffmpeg-python the same way and unquotes on read
            "-metadata", "comment=" + shlex.quote(self._get_metadata()),
        ]
        if self.bitrate > 0:
            cmd += ["-b:v", str(self.bitrate)]
        cmd.append(self.filename)
        self._proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    def _quantize(self, data: np.ndarray) -> np.ndarray:
        normalized = (data - self.vmin) / (self.vmax - self.vmin)
        return self._format.data_to_frame(normalized)

    def _dequantize(self, raw: np.ndarray) -> np.ndarray:
        normalized = self._format.data_from_frame(raw)
        return normalized * (self.vmax - self.vmin) + self.vmin

    def append(self, field: FieldBase, time: float | None = None) -> None:
        if (
            self._proc is None
            and getattr(self, "_writer", None) is None
            and getattr(self, "_raw_fh", None) is None
        ):
            self.start_writing(field)
        data = np.asarray(field.data)
        payload = self._quantize(data).tobytes()
        if self._backend == "raw":
            self._raw_fh.write(payload)
        elif self._backend == "native":
            self._writer.write(payload)
        else:
            self._proc.stdin.write(payload)
        self._times.append(float(time) if time is not None else len(self._times))

    def _write_times_sidecar(self) -> None:
        if self.write_times:
            with open(self._times_path, "w") as fh:
                fh.writelines(f"{t}\n" for t in self._times)

    def end_writing(self) -> None:
        if getattr(self, "_writer", None) is not None:
            self._writer.close()
            self._writer = None
            self._write_times_sidecar()
            return
        if self._proc is not None:
            self._proc.stdin.close()
            self._proc.wait()
            self._proc = None
            self._write_times_sidecar()
            return
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
    def _apply_field_attributes(self, attrs) -> None:
        if not attrs:
            return
        from ..fields.base import field_from_serialized_attributes

        # handles plain fields AND FieldCollections (multi-channel movies
        # written by the reference carry collection attributes)
        self._field = field_from_serialized_attributes(dict(attrs))
        self._grid = self._field.grid
        self._data_shape = self._shape
        self._dtype = np.dtype(float)

    def _load_meta(self) -> None:
        with open(self._meta_path) as fh:
            meta = json.load(fh)
        self.vmin = meta["vmin"]
        self.vmax = meta["vmax"]
        self.bits_per_channel = meta["bits_per_channel"]
        self._backend = meta.get("backend", self._backend)
        self._shape = tuple(meta["shape"])
        self._times = list(meta["times"])
        self._apply_field_attributes(meta.get("field_attributes"))
        self._meta_loaded = True

    def _read_metadata(self) -> None:
        """Read the comment-tag metadata of an ffmpeg-written movie.

        Understands movies written by this class AND by the reference
        implementation (same version-1 comment scheme)."""
        if self._backend == "native":
            # metadata-only probe: works for ANY pixel format (multi-channel
            # movies read their metadata here and decode via the ffmpeg
            # binary fallback in _read_frames)
            probe_info = movie_native.MovieProbe(self.filename)
            raw_comment = probe_info.comment or "{}"
            width, height = probe_info.width, probe_info.height
            pix = probe_info.pix_fmt or (
                "gray16le" if probe_info.bits == 16 else "gray"
            )
            n_frames = probe_info.n_frames
        else:
            probe = subprocess.run(
                [
                    "ffprobe", "-v", "quiet", "-print_format", "json",
                    "-show_format", "-show_streams", self.filename,
                ],
                stdout=subprocess.PIPE, check=True,
            )
            info = json.loads(probe.stdout)
            tags = info.get("format", {}).get("tags", {})
            raw_comment = tags.get("comment", tags.get("COMMENT", "{}"))
            stream = info.get("streams", [{}])[0]
            width = stream.get("width")
            height = stream.get("height")
            pix = stream.get("pix_fmt")
            n = stream.get("nb_frames")
            n_frames = int(n) if n is not None else None
        try:
            metadata = json.loads(shlex.split(raw_comment)[0])
        except (ValueError, IndexError):
            metadata = {}
        self.vmin = metadata.get("vmin", 0)
        self.vmax = metadata.get("vmax", 1)
        self.write_times = metadata.get("write_times", self.write_times)
        # the video pixel grid is the transposed field (see start_writing)
        if width is None:
            width = metadata.get("width")
            height = metadata.get("height", 1)
        self._shape = (int(width),) if height in (1, None) else (
            int(width), int(height)
        )
        for name, fmt in ffmpeg_formats.formats.items():
            if fmt.pix_fmt_file == pix:
                self.video_format = name
                self.bits_per_channel = fmt.bits_per_channel
                break
        # times: exact stamps from the sidecar when present
        if os.path.exists(self._times_path):
            with open(self._times_path) as fh:
                self._times = [float(line) for line in fh if line.strip()]
        else:
            count = (
                n_frames if n_frames is not None else len(self._read_frames())
            )
            self._times = [float(i) for i in range(count)]
        self._apply_field_attributes(metadata.get("field_attributes"))
        self._meta_loaded = True

    @property
    def times(self):
        return list(self._times)

    def __len__(self) -> int:
        return len(self._times)

    @property
    def data(self):
        return _MovieFrames(self)

    def _read_frames(self) -> np.ndarray:
        shape = self._shape  # type: ignore[misc]
        w0 = shape[0]
        h0 = shape[1] if len(shape) > 1 else 1
        fmt = self._format
        if self._backend == "raw":
            raw = open(self.filename, "rb").read()
        elif self._backend == "native" and fmt.channels == 1:
            # decoded as (n, h0, w0) rows; the byte stream is the C-order
            # field payload, so a plain reshape below recovers it exactly
            frames = movie_native.MovieInfo(self.filename).frames
            raw = frames.tobytes()
        elif self._backend == "native":
            # multi-channel formats (rgb24/rgb32/gbrp16le): the native
            # decoder is grayscale-only — decode via the ffmpeg binary
            # when present (the reference's own read path)
            if not shutil.which("ffmpeg"):
                raise NotImplementedError(
                    f"decoding video_format {self.video_format!r} requires "
                    "the ffmpeg binary (the native codec reads gray movies)"
                )
            cmd = [
                "ffmpeg", "-i", self.filename,
                "-f", "rawvideo", "-pix_fmt", fmt.pix_fmt_data, "-",
            ]
            raw = subprocess.run(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                check=True,
            ).stdout
        else:
            cmd = [
                "ffmpeg", "-i", self.filename,
                "-f", "rawvideo", "-pix_fmt", fmt.pix_fmt_data, "-",
            ]
            raw = subprocess.run(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                check=True,
            ).stdout
        frames = np.frombuffer(raw, dtype=fmt.dtype)
        count = len(frames) // (w0 * h0)
        frames = frames[: count * w0 * h0].reshape(count, w0, h0)
        if len(shape) == 1:
            frames = frames[:, :, 0]
        return frames

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
