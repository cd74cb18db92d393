"""Minimal `ffmpeg-python`-compatible module backed by in-process libav.

The reference package (`/root/reference/pde/storage/movie.py`) drives movie
I/O through the `ffmpeg-python` package, which shells out to the ffmpeg
BINARY. This environment has the libav* libraries (pde_tpu's native codec
links them) but no binary, so the cross-implementation interchange tests
insert this shim into ``sys.path``: it implements exactly the API surface
the reference uses — ``probe``, ``input(...).filter(...).output(...)`` with
``run``/``run_async`` — with encode/decode done by
:mod:`pde_tpu.utils.movie_native` (the same libavformat/libavcodec the
ffmpeg CLI wraps). The reference's MovieStorage logic (metadata parsing,
normalization, frame layout) executes unmodified.

Only the invocations the reference makes are supported:

- ``probe(path)`` → format tags + first-video-stream geometry
- read: ``input(file).output("pipe:", format="rawvideo", pix_fmt=...)``
  (+ optional ``filter("select", "gte(n,K)")`` and ``vframes``) via
  ``run(capture_stdout=True)`` or ``run_async(pipe_stdout=True)``
- write: ``input("pipe:", format="rawvideo", s="WxH", pixel_format=...)``
  ``.output(filename=..., vcodec="ffv1", pix_fmt=..., metadata=...)``
  ``.run_async(pipe_stdin=True)``
"""

from __future__ import annotations

import io

import numpy as np

from pde_tpu.utils import movie_native

_BITS = {"gray": 8, "gray16le": 16}


class Error(Exception):
    """Mirror of ffmpeg-python's error class."""


def probe(path):
    p = movie_native.MovieProbe(str(path))
    stream = {
        "width": p.width,
        "height": p.height,
        "pix_fmt": p.pix_fmt,
        "avg_frame_rate": "30/1",
    }
    if p.n_frames is not None:
        stream["nb_frames"] = str(p.n_frames)
    fmt = {
        "nb_streams": 1,
        "tags": {"comment": p.comment} if p.comment else {},
    }
    return {"format": fmt, "streams": [stream]}


class _Stream:
    def __init__(self, src, input_kwargs):
        self.src = src
        self.input_kwargs = dict(input_kwargs)
        self.select_from = 0
        self.vframes = None
        self.out_target = None
        self.out_kwargs = {}

    def filter(self, name, expr):
        if name != "select":  # the reference only seeks via select
            raise NotImplementedError(f"filter {name!r}")
        # expression form: 'gte(n,K)'
        self.select_from = int(str(expr).rstrip(")").split(",")[1])
        return self

    def output(self, target=None, *, filename=None, **kwargs):
        self.out_target = filename if filename is not None else target
        self.out_kwargs = dict(kwargs)
        if "vframes" in kwargs:
            self.vframes = int(kwargs["vframes"])
        return self

    def run(self, capture_stdout=False, capture_stderr=False, **_):
        if self.out_target != "pipe:":
            raise NotImplementedError("run() is only used for pipe reads")
        data = self._decode_bytes()
        return (data if capture_stdout else None, b"")

    def run_async(self, pipe_stdout=False, pipe_stdin=False, **_):
        if pipe_stdin:
            return _EncodeProc(self)
        return _DecodeProc(self._decode_bytes())

    def _decode_bytes(self) -> bytes:
        info = movie_native.MovieInfo(str(self.src))
        requested = self.out_kwargs.get("pix_fmt")
        native = "gray16le" if info.bits == 16 else "gray"
        if requested is not None and requested != native:
            raise NotImplementedError(
                f"decode to {requested!r} from a {native} stream"
            )
        frames = info.frames[self.select_from :]
        if self.vframes is not None:
            frames = frames[: self.vframes]
        return np.ascontiguousarray(frames).tobytes()


def input(src, **kwargs):  # noqa: A001 - ffmpeg-python's public name
    return _Stream(src, kwargs)


class _DecodeProc:
    def __init__(self, payload: bytes):
        self.stdout = io.BytesIO(payload)

    def wait(self):
        return 0


class _EncodeProc:
    """Pipe-writer protocol: buffers rawvideo frames, encodes on close."""

    def __init__(self, stream: _Stream):
        self._stream = stream
        self._buf = io.BytesIO()
        self._done = False
        outer = self

        class _Stdin:
            def write(self, b):
                outer._buf.write(b)
                return len(b)

            def close(self):
                outer._encode()

        self.stdin = _Stdin()

    def _encode(self) -> None:
        if self._done:
            return
        self._done = True
        st = self._stream
        codec = st.out_kwargs.get("vcodec", "ffv1")
        if codec != "ffv1":
            raise NotImplementedError(f"encode codec {codec!r}")
        w, h = (int(x) for x in st.input_kwargs["s"].split("x"))
        pix_in = st.input_kwargs.get(
            "pixel_format", st.input_kwargs.get("pix_fmt", "gray")
        )
        bits = _BITS[pix_in]
        meta = st.out_kwargs.get("metadata", "")
        comment = meta[len("comment="):] if meta.startswith("comment=") else ""
        writer = movie_native.MovieWriter(
            str(st.out_target), w, h, bits=bits, comment=comment
        )
        payload = self._buf.getvalue()
        fb = w * h * (bits // 8)
        for off in range(0, len(payload) - fb + 1, fb):
            writer.write(payload[off : off + fb])
        writer.close()

    def wait(self):
        self._encode()
        return 0
