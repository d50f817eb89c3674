"""Pure-Python RIFF/WAVE reader + writer (r16): the codec-free REAL
audio-container lane, the symmetric closure of the AVI video lane
(sources/avi.py).

The reference has no audio path at all (the 841-LoC pipeline is
video-only, uav/main.py); the engine's training-data-pipeline surface
carries PCM audio operators (operators/multimodal.extract_audio_features
and the media_audio_* registry family) that until now ran only over
in-memory synthetic payloads. WAV is RIFF like AVI, and PCM16 needs NO
codec — so real .wav files ingest with zero native dependencies and the
full metadata→decode→feature pipeline runs un-gated against files on
disk, the same codec-free argument that un-gated the AVI lane
(VERDICT r11 #1).

Format facts used here are public RIFF/WAVE structure: the file is one
RIFF chunk with form type 'WAVE'; subchunks are fourcc + u32le size +
data padded to even length; 'fmt ' carries (audio_format, channels,
sample_rate, byte_rate, block_align, bits_per_sample) as
<HHIIHH after the u32 chunk size; sample data lives in 'data'.
Readers must WALK the chunk list — real files carry LIST/fact/cue
chunks between fmt and data, so the classic fixed-44-byte-header
assumption is wrong; the writer emits the canonical 44-byte layout.

Scale design: `WavFile` parses only the chunk headers (one sequential
read of a few KB) and serves any sample range by SEEK — fixed-rate PCM
makes byte offsets pure arithmetic (data_offset + start * block_align),
so a large recording splits into sample-range partitions where each
task reads exactly its byte range, the AVI framesPerPartition access
pattern applied to audio.
"""

from __future__ import annotations

import struct
from pathlib import Path

_FMT_STRUCT = struct.Struct("<HHIIHH")

PCM_FORMAT = 1  # WAVE_FORMAT_PCM


def write_wav(
    path,
    pcm: bytes,
    sample_rate: int = 16000,
    channels: int = 1,
    bits_per_sample: int = 16,
) -> None:
    """Canonical 44-byte-header PCM WAV writer (the K1 FrameSaver
    analogue for the audio lane): RIFF size arithmetic only, payload
    bytes pass through verbatim — a read-back is byte-identical, which
    is what lets the media_wav_features oracle sign the container
    round trip."""
    block_align = channels * bits_per_sample // 8
    byte_rate = sample_rate * block_align
    if len(pcm) % block_align:
        raise ValueError(
            f"pcm length {len(pcm)} is not a whole number of "
            f"{block_align}-byte frames"
        )
    out = bytearray()
    out += b"RIFF"
    out += struct.pack("<I", 36 + len(pcm) + (len(pcm) & 1))
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", 16)
    out += _FMT_STRUCT.pack(
        PCM_FORMAT, channels, sample_rate, byte_rate, block_align,
        bits_per_sample,
    )
    out += b"data" + struct.pack("<I", len(pcm))
    out += pcm
    if len(pcm) & 1:  # RIFF chunks pad to even length
        out += b"\x00"
    Path(path).write_bytes(bytes(out))


class WavFile:
    """Chunk-walking WAV reader with random access by sample index.

    Only uncompressed PCM (format 1) is supported codec-free; any other
    audio_format raises NotImplementedError at open — the same
    capability-gate contract as the AVI MJPG/codec seam (a soundfile/
    ffmpeg-backed decoder drops in behind the same samples_bytes
    interface when codecs exist)."""

    def __init__(self, path):
        self.path = str(path)
        file_size = Path(path).stat().st_size
        fmt = None
        self._data_off = None
        self._data_len = 0
        # header-only I/O: read the 12-byte RIFF header and each 8-byte
        # chunk header, SEEKING past chunk bodies (a multi-GB recording
        # costs a few hundred bytes of reads to open — the AviFile
        # header-walk contract)
        with open(path, "rb") as fh:
            head = fh.read(12)
            if len(head) < 12 or head[:4] != b"RIFF" or head[8:12] != b"WAVE":
                raise ValueError(f"not a RIFF/WAVE file: {self.path!r}")
            while True:
                hdr = fh.read(8)
                if len(hdr) < 8:
                    break
                ckid = hdr[:4]
                (size,) = struct.unpack("<I", hdr[4:])
                body = fh.tell()
                if ckid == b"fmt ":
                    # ADVICE r16: a fmt chunk smaller than the PCM header
                    # must fail the missing-fmt contract, not silently
                    # read into the next chunk's header and parse garbage
                    # format fields
                    if size < _FMT_STRUCT.size:
                        raise ValueError(
                            f"fmt chunk too small ({size} bytes) in "
                            f"{self.path!r}"
                        )
                    fmt = _FMT_STRUCT.unpack(fh.read(_FMT_STRUCT.size))
                elif ckid == b"data":
                    self._data_off = body
                    self._data_len = min(size, file_size - body)
                fh.seek(body + size + (size & 1))  # even-length padding
        if fmt is None or self._data_off is None:
            raise ValueError(f"missing fmt/data chunk in {self.path!r}")
        (
            self.audio_format,
            self.channels,
            self.sample_rate,
            self.byte_rate,
            self.block_align,
            self.bits_per_sample,
        ) = fmt
        if self.audio_format != PCM_FORMAT:
            raise NotImplementedError(
                f"audio_format {self.audio_format} in {self.path!r} needs "
                "a real audio codec; only PCM (1) decodes codec-free — "
                "a soundfile-backed decoder implements the same "
                "samples_bytes(start, end) contract"
            )
        self.n_samples = self._data_len // self.block_align

    def samples_bytes(self, start: int = 0, end: int | None = None) -> bytes:
        """Raw little-endian PCM bytes for sample range [start, end) —
        one seek + one read of exactly the requested byte range, the
        audio analogue of AviFile's indexed frame seek (a sample-range
        partition never touches bytes outside its slice)."""
        end = self.n_samples if end is None else min(end, self.n_samples)
        start = max(0, start)
        if start >= end:
            return b""
        with open(self.path, "rb") as fh:
            fh.seek(self._data_off + start * self.block_align)
            return fh.read((end - start) * self.block_align)
