"""Pure-Python RIFF/AVI demuxer + muxer (VERDICT r11 #1: the codec-FREE
real-container path for S2/S3).

The reference decodes real video containers via cv2.VideoCapture
(uav/frame_reader.py:116-155); this container ships no codec, so until
now the real-file lane of the `uav_video` DataSource was presence-gated.
AVI demux is pure container arithmetic — RIFF chunk walking, header
structs, and an offset index — no pixel decode required:

- **DIB (BI_RGB)** streams store uncompressed bottom-up BGR rows padded
  to 4-byte boundaries; converting a chunk to an RGB tensor is a numpy
  slice-and-flip, so real AVI files decode to REAL PIXELS here with zero
  dependencies and the full S2→F1→T1/T2→K1/K2 pipeline runs un-gated.
- **MJPG** streams demux to per-frame JPEG byte payloads (frame_number,
  jpeg_bytes) — the container layer is fully exercised; pixel decode of
  the JPEG payload still needs an image codec and stays behind the
  engine-codec seam.
- **UAVR** (engine raw-tensor codec, operators/pixel.py encode_image) —
  frames pass through byte-identical; lets fixtures round-trip the
  engine's native buffers through a spec-correct container.

Scale design: `AviFile` parses only the header LISTs and the `idx1`
index (KBs, one sequential read) and then serves any frame range by
SEEK — so a 1000-executor cluster can split one large AVI into
frame-range partitions (`framesPerPartition`) where each task reads
exactly its byte range, the same access pattern cv2.CAP_PROP_POS_FRAMES
gives the gated decoder. Files without idx1 fall back to one linear
`movi` walk to rebuild the offset table (still header-only I/O: chunk
sizes are skipped over, payloads are not read).

Format facts used here are public RIFF/AVI structure: chunks are
fourcc + u32le size + data padded to even length; `hdrl` holds the
MainAVIHeader (`avih`) and per-stream `strl` lists (`strh` stream
header, `strf` BITMAPINFOHEADER for video); frame data lives in the
`movi` list as `00db`/`00dc` chunks; `idx1` entries are 16 bytes
(ckid, flags, offset, size) with offsets either relative to the `movi`
list's fourcc position or absolute (both occur in the wild; detected by
probing the first entry).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from pathlib import Path

import numpy as np

# engine raw-tensor codec fourcc (operators/pixel.py encode_image buffers)
FOURCC_UAVR = "UAVR"
FOURCC_DIB = "DIB "
FOURCC_MJPG = "MJPG"

_U32 = struct.Struct("<I")
# MainAVIHeader: usec/frame, maxbytes/sec, padding, flags, total frames,
# initial frames, streams, suggested buf, width, height, reserved[4]
_AVIH = struct.Struct("<14I")
# AVIStreamHeader: fccType, fccHandler, flags, prio+lang, initial frames,
# scale, rate, start, length, suggested buf, quality (signed), sample
# size, rcFrame (4×u16)
_STRH = struct.Struct("<4s4sIIIIIIIIiI4H")
# BITMAPINFOHEADER: size, width, height, planes, bitcount, compression,
# size image, xppm, yppm, clr used, clr important
_BMIH = struct.Struct("<IiiHHIIiiII")
_IDX1_ENTRY = struct.Struct("<4sIII")

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _pad(n: int) -> int:
    return n + (n & 1)


class AviFile:
    """Header+index parse of one AVI; frames served by seek.

    Only the first 'vids' stream is exposed (the reference's readers are
    single-video-stream too, frame_reader.py:116). The file handle opens
    per call — instances are picklable, so a partition reader can carry
    one across the executor boundary."""

    def __init__(self, path: str):
        self.path = str(path)
        with open(self.path, "rb") as f:
            riff, _size, ftype = struct.unpack("<4sI4s", f.read(12))
            if riff != b"RIFF" or ftype != b"AVI ":
                raise ValueError(f"{path!r} is not a RIFF/AVI file")
            self._parse_toplevel(f)
        if not hasattr(self, "width"):
            raise ValueError(f"{self.path!r}: no video ('vids') stream found")
        if not self._index:
            raise ValueError(f"{self.path!r}: no video frame chunks found")
        self.n_frames = len(self._index)

    # -- parsing ---------------------------------------------------------

    def _parse_toplevel(self, f) -> None:
        self._index: list[tuple[int, int]] = []  # (payload offset, size)
        self._movi_pos: int | None = None
        idx1_raw: bytes | None = None
        flags = 0
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            ck, size = hdr[:4], _U32.unpack(hdr[4:])[0]
            body_at = f.tell()
            if ck == b"LIST":
                ltype = f.read(4)
                if ltype == b"hdrl":
                    flags = self._parse_hdrl(f, body_at + size)
                elif ltype == b"movi":
                    # remember where the list TYPE fourcc sits: idx1
                    # offsets are commonly relative to this position
                    self._movi_pos = body_at
                # skip to end of list either way (hdrl parse consumed it)
                f.seek(body_at + _pad(size))
            elif ck == b"idx1":
                idx1_raw = f.read(size)
                f.seek(body_at + _pad(size))
            else:
                f.seek(body_at + _pad(size))
        if idx1_raw is not None and (flags & _AVIF_HASINDEX):
            self._index = self._index_from_idx1(idx1_raw)
        if not self._index and self._movi_pos is not None:
            self._index = self._scan_movi()

    def _parse_hdrl(self, f, end: int) -> int:
        flags = 0
        in_video_strl = False
        while f.tell() < end:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            ck, size = hdr[:4], _U32.unpack(hdr[4:])[0]
            body_at = f.tell()
            if ck == b"LIST":
                f.read(4)  # 'strl' / 'odml' — recurse into sub-lists
                continue
            data = f.read(size)
            if ck == b"avih":
                a = _AVIH.unpack_from(data)
                flags = a[3]
            elif ck == b"strh":
                s = _STRH.unpack_from(data)
                in_video_strl = s[0] == b"vids" and not hasattr(self, "width")
                if in_video_strl:
                    scale, rate = s[5], s[6]
                    self.fps = (rate / scale) if scale else 0.0
                    self._fourcc_strh = s[1].decode("latin1")
            elif ck == b"strf" and in_video_strl:
                b = _BMIH.unpack_from(data)
                self.width = b[1]
                # negative biHeight = top-down DIB rows
                self.height = abs(b[2])
                self._topdown = b[2] < 0
                self._bitcount = b[4]
                comp = b[5]
                if comp == 0:
                    self.fourcc = FOURCC_DIB
                else:
                    self.fourcc = comp.to_bytes(4, "little").decode("latin1")
                in_video_strl = False
            f.seek(body_at + _pad(size))
        return flags

    def _index_from_idx1(self, raw: bytes) -> list[tuple[int, int]]:
        """idx1 → (payload offset, size) per video chunk. Entry offsets
        point at the chunk FOURCC; writers disagree on the base (movi
        list position vs file start) — probed on the first entry."""
        entries = [
            _IDX1_ENTRY.unpack_from(raw, i)
            for i in range(0, len(raw) - len(raw) % 16, 16)
        ]
        vid = [e for e in entries if e[0][:2] == b"00" and e[0][2:] in (b"db", b"dc")]
        if not vid:
            return []
        base = 0
        if self._movi_pos is not None:
            with open(self.path, "rb") as f:
                f.seek(self._movi_pos + vid[0][2])
                if f.read(4) == vid[0][0]:
                    base = self._movi_pos
        # +8 skips the chunk's own fourcc+size header to the payload
        return [(base + off + 8, size) for _ck, _fl, off, size in vid]

    def _scan_movi(self) -> list[tuple[int, int]]:
        """No-idx1 fallback: linear chunk walk over the movi list —
        header-only reads, payloads seeked over."""
        out = []
        with open(self.path, "rb") as f:
            f.seek(self._movi_pos - 8)
            size = _U32.unpack(f.read(8)[4:])[0]
            end = self._movi_pos + size
            f.seek(self._movi_pos + 4)  # past the 'movi' fourcc
            while f.tell() < end:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                ck, csize = hdr[:4], _U32.unpack(hdr[4:])[0]
                at = f.tell()
                if ck[:2] == b"00" and ck[2:] in (b"db", b"dc"):
                    out.append((at, csize))
                f.seek(at + _pad(csize))
        return out

    # -- frame access ----------------------------------------------------

    def frame_bytes(self, i: int) -> bytes:
        off, size = self._index[i]
        with open(self.path, "rb") as f:
            f.seek(off)
            return f.read(size)

    def frames(self, start: int = 0, end: int | None = None) -> Iterator[bytes]:
        end = self.n_frames if end is None else min(end, self.n_frames)
        with open(self.path, "rb") as f:
            for i in range(start, end):
                off, size = self._index[i]
                f.seek(off)
                yield f.read(size)

    def frame_array(self, i: int) -> np.ndarray:
        """DIB-only: decode one uncompressed frame chunk to RGB HxWx3.
        DIB rows are BGR, bottom-up (unless biHeight<0), each padded to a
        4-byte boundary — a numpy reshape/flip, no codec."""
        if self.fourcc != FOURCC_DIB:
            raise ValueError(
                f"frame_array needs an uncompressed DIB stream, got "
                f"{self.fourcc!r}"
            )
        if self._bitcount != 24:
            raise ValueError(f"only 24-bit DIB supported, got {self._bitcount}")
        stride = (self.width * 3 + 3) & ~3
        buf = np.frombuffer(self.frame_bytes(i), dtype=np.uint8)
        rows = buf[: stride * self.height].reshape(self.height, stride)
        bgr = rows[:, : self.width * 3].reshape(self.height, self.width, 3)
        if not self._topdown:
            bgr = bgr[::-1]
        return bgr[:, :, ::-1]  # BGR → RGB


def _dib_payload(a: np.ndarray, width: int, height: int) -> bytes:
    """HxWx3 RGB array → BI_RGB chunk payload: bottom-up BGR rows padded
    to a 4-byte stride (the standard uncompressed DIB layout)."""
    if a.shape != (height, width, 3):
        raise ValueError(
            f"DIB frame shape {a.shape} != latched ({height}, {width}, 3)"
        )
    stride = (width * 3 + 3) & ~3
    row = np.zeros((height, stride), dtype=np.uint8)
    row[:, : width * 3] = a[::-1, :, ::-1].reshape(height, width * 3)
    return row.tobytes()


class AviStreamWriter:
    """Incremental AVI muxer: frames stream to disk one at a time (a
    per-frame payload is the only buffered state), the header and idx1
    are patched in on close — the standard AVI writer protocol, and the
    codec-free K1 recorder path (streaming/sinks._AviCameraWriter).

    The header region has a fixed byte length for a given fourcc, so
    `close()` rewrites it in place with the final frame count / sizes
    (seek(0) + one small write) after appending idx1. Payload frames:
    HxWx3 RGB uint8 arrays for DIB (converted via _dib_payload), opaque
    pre-encoded bytes for any other fourcc; `write_payload` accepts an
    already-containerized payload verbatim for lossless segment remux
    (sinks._remux_avi — unlike the mp4 path there is NO decode→re-encode
    generation loss)."""

    def __init__(
        self,
        path: str,
        width: int,
        height: int,
        fps: float = 25.0,
        fourcc: str = FOURCC_DIB,
        with_idx1: bool = True,
    ):
        self.path = str(path)
        self._w, self._h = int(width), int(height)
        self._fps = float(fps)
        self._fourcc = fourcc
        self._with_idx1 = with_idx1
        self._chunk_id = b"00db" if fourcc == FOURCC_DIB else b"00dc"
        self._sizes: list[int] = []
        self._f = open(self.path, "wb")
        # placeholder header; rewritten with final sizes on close
        self._prefix_len = len(self._prefix(0, 0))
        self._f.write(b"\x00" * self._prefix_len)

    def _prefix(self, n: int, max_size: int) -> bytes:
        """Everything before the first frame chunk: RIFF header, hdrl
        (avih + video strl), and the movi LIST header. Constant length
        for a given fourcc — patchable in place."""
        fps = self._fps
        rate = max(1, round(fps * 1000))
        compression = (
            0
            if self._fourcc == FOURCC_DIB
            else int.from_bytes(self._fourcc.encode("latin1"), "little")
        )

        def chunk(ck: bytes, data: bytes) -> bytes:
            pad = b"\x00" if len(data) & 1 else b""
            return ck + _U32.pack(len(data)) + data + pad

        def lst(ltype: bytes, body: bytes) -> bytes:
            return chunk(b"LIST", ltype + body)

        avih = _AVIH.pack(
            round(1e6 / fps) if fps else 0, max_size * round(fps or 1), 0,
            _AVIF_HASINDEX if self._with_idx1 else 0, n, 0, 1, max_size,
            self._w, self._h, 0, 0, 0, 0,
        )
        strh = _STRH.pack(
            b"vids", self._fourcc.encode("latin1"), 0, 0, 0,
            1000, rate, 0, n, max_size, -1, 0, 0, 0, self._w, self._h,
        )
        strf = _BMIH.pack(
            _BMIH.size, self._w, self._h, 1, 24, compression,
            max_size, 0, 0, 0, 0,
        )
        hdrl = lst(
            b"hdrl",
            chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
        )
        movi_body = sum(8 + _pad(s) for s in self._sizes)
        movi_list_size = 4 + movi_body
        idx1_total = (8 + 16 * n) if self._with_idx1 else 0
        riff_size = 4 + len(hdrl) + 8 + movi_list_size + idx1_total
        return (
            b"RIFF" + _U32.pack(riff_size) + b"AVI " + hdrl
            + b"LIST" + _U32.pack(movi_list_size) + b"movi"
        )

    def write_frame(self, frame) -> None:
        """DIB: HxWx3 RGB uint8 array. Other fourccs: encoded bytes."""
        if self._fourcc == FOURCC_DIB:
            payload = _dib_payload(
                np.asarray(frame, dtype=np.uint8), self._w, self._h
            )
        else:
            payload = bytes(frame)
        self.write_payload(payload)

    def write_payload(self, payload: bytes) -> None:
        """Append one already-encoded chunk payload verbatim (the
        lossless remux path — no pixel conversion, any fourcc)."""
        self._f.write(self._chunk_id + _U32.pack(len(payload)))
        self._f.write(payload)
        if len(payload) & 1:
            self._f.write(b"\x00")
        self._sizes.append(len(payload))

    @property
    def n_frames(self) -> int:
        return len(self._sizes)

    def close(self) -> str:
        if self._f.closed:
            return self.path
        if self._with_idx1:
            entries, off = [], 4  # first chunk follows the 'movi' fourcc
            for s in self._sizes:
                entries.append(
                    _IDX1_ENTRY.pack(self._chunk_id, _AVIIF_KEYFRAME, off, s)
                )
                off += 8 + _pad(s)
            body = b"".join(entries)
            self._f.write(b"idx1" + _U32.pack(len(body)) + body)
        prefix = self._prefix(
            len(self._sizes), max(self._sizes, default=0)
        )
        assert len(prefix) == self._prefix_len, "header length must be fixed"
        self._f.seek(0)
        self._f.write(prefix)
        self._f.close()
        return self.path


def write_avi(
    path: str,
    frames,
    fps: float = 25.0,
    fourcc: str = FOURCC_DIB,
    width: int | None = None,
    height: int | None = None,
    with_idx1: bool = True,
) -> str:
    """Spec-correct AVI muxer for fixtures and the recorder's codec-free
    single-file deliverable (one-shot wrapper over AviStreamWriter, so
    the batch and streaming paths emit identical bytes).

    DIB: `frames` are HxWx3 RGB uint8 arrays, stored as bottom-up BGR
    rows with 4-byte stride padding (the standard BI_RGB layout any
    player/demuxer reads). Other fourccs (MJPG, UAVR): `frames` are
    pre-encoded byte payloads stored opaquely in '00dc' chunks; `width`/
    `height` then describe the coded size for the headers."""
    frames = list(frames)
    if fourcc == FOURCC_DIB:
        if not frames:
            raise ValueError("DIB AVI needs at least one frame")
        a0 = np.asarray(frames[0], dtype=np.uint8)
        height, width = a0.shape[:2]
    elif width is None or height is None:
        raise ValueError(f"{fourcc!r} frames need explicit width/height")
    w = AviStreamWriter(
        path, width, height, fps=fps, fourcc=fourcc, with_idx1=with_idx1
    )
    try:
        for fr in frames:
            w.write_frame(fr)
    finally:
        w.close()
    return str(path)


def write_engine_frames_avi(path: str, frames, fps: float = 25.0) -> str:
    """Round-trip helper: pack engine raw-tensor buffers (encode_image
    output) into a real AVI container under the UAVR fourcc."""
    from uav_streamprocessor_spark.operators.pixel import decode_image

    frames = [bytes(b) for b in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = decode_image(frames[0]).shape[:2]
    return write_avi(path, frames, fps=fps, fourcc=FOURCC_UAVR, width=w, height=h)
