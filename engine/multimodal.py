"""Multimodal (binary-column) stage plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns beside them. The Ray-side plumbing -- schema, actor
signatures, batch sizing, output layout -- is real and tested; the
actual codec work is stubbed behind ``NotImplementedError`` (the decode
libraries are not in this container) with a deterministic fake mode so
pipelines are testable end-to-end (per the round brief).

Real (non-stub) member: :func:`html_to_text` -- regex-based tag strip +
entity decode over the pages ``html`` column, the engine's version of
the reference's decode step (``file_service.py:36-39``), with
invalid-UTF8 rows quarantined into a dead-letter column instead of
aborting the job.

Batch-size guidance: binary payloads dominate block size -- callers
should pass small ``batch_size`` (e.g. 64-256 rows) and rely on
``DataContext.target_max_block_size`` so a batch x concurrency fits the
worker heap.
"""

from __future__ import annotations

import hashlib
import html as _htmllib
import re

import numpy as np
import pyarrow as pa

_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def html_to_text_batch(batch: pa.Table, html_col: str = "html", out_col: str = "extracted_text") -> pa.Table:
    """Strip tags + decode entities; undecodable rows -> null text and a
    ``decode_error`` message (dead-letter column, SURVEY M6)."""
    payloads = batch.column(html_col).to_pylist()
    texts, errors = [], []
    for raw in payloads:
        if raw is None:
            texts.append(None)
            errors.append("null payload")
            continue
        try:
            stripped = _TAG_RE.sub(b" ", raw)
            text = stripped.decode("utf-8")
        except UnicodeDecodeError as e:
            texts.append(None)
            errors.append(str(e))
            continue
        texts.append(_WS_RE.sub(" ", _htmllib.unescape(text)).strip())
        errors.append(None)
    batch = batch.append_column(out_col, pa.array(texts, type=pa.string()))
    return batch.append_column("decode_error", pa.array(errors, type=pa.string()))


class ImageDecoder:
    """Actor-pool stage for an image binary column.

    ``__init__`` is where a real build would load the codec / model once
    per actor; ``__call__`` maps a batch of binary payloads to fixed
    feature columns ``(width, height, channels, feat_mean)``.

    fake=True produces deterministic pseudo-decodes (seeded by a
    payload digest) so the schema/plumbing is testable; fake=False
    raises NotImplementedError (no image libs in this container).
    """

    OUTPUT_FIELDS = [("width", pa.int32()), ("height", pa.int32()),
                     ("channels", pa.int32()), ("feat_mean", pa.float64())]

    def __init__(self, image_col: str = "image", fake: bool = False):
        self.image_col = image_col
        self.fake = fake
        # real build: self.codec = load_codec(); once per actor

    def _decode_one(self, payload: bytes):
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires a codec library not present in "
                "this container; run with fake=True for plumbing tests"
            )
        digest = hashlib.blake2b(payload or b"", digest_size=8).digest()
        v = np.frombuffer(digest, dtype=np.uint16).astype(np.int64)
        return int(16 + v[0] % 2048), int(16 + v[1] % 2048), int(1 + v[2] % 4), float(v[3] % 256) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        decoded = [self._decode_one(p) for p in batch.column(self.image_col).to_pylist()]
        for i, (name, typ) in enumerate(self.OUTPUT_FIELDS):
            batch = batch.append_column(name, pa.array([d[i] for d in decoded], type=typ))
        return batch


class AudioFrameSampler:
    """Actor-pool stage for audio binary columns: emits
    ``(n_frames, sample_rate, duration_s)``; same stub discipline."""

    def __init__(self, audio_col: str = "audio", fake: bool = False):
        self.audio_col = audio_col
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_frames, out_rate, out_dur = [], [], []
        for p in batch.column(self.audio_col).to_pylist():
            if not self.fake:
                raise NotImplementedError("audio decode not available in this container")
            digest = hashlib.blake2b(p or b"", digest_size=8).digest()
            v = np.frombuffer(digest, dtype=np.uint32).astype(np.int64)
            rate = [8000, 16000, 44100, 48000][int(v[0] % 4)]
            frames = int(v[1] % 10_000_000)
            out_frames.append(frames)
            out_rate.append(rate)
            out_dur.append(frames / rate)
        batch = batch.append_column("n_frames", pa.array(out_frames, type=pa.int64()))
        batch = batch.append_column("sample_rate", pa.array(out_rate, type=pa.int32()))
        return batch.append_column("duration_s", pa.array(out_dur, type=pa.float64()))


class VideoFrameSampler:
    """Actor-pool stage for video binary columns: deterministic frame
    sampling plan ``(n_frames_total, sampled_frame_indices, fps)``;
    decode itself is stubbed (no codec libs in this container)."""

    def __init__(self, video_col: str = "video", every_n: int = 30, fake: bool = False):
        self.video_col = video_col
        self.every_n = every_n
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        totals, samples, fps_out = [], [], []
        for p in batch.column(self.video_col).to_pylist():
            if not self.fake:
                raise NotImplementedError("video decode not available in this container")
            digest = hashlib.blake2b(p or b"", digest_size=8).digest()
            v = np.frombuffer(digest, dtype=np.uint32).astype(np.int64)
            fps = [24, 25, 30, 60][int(v[0] % 4)]
            n = int(v[1] % 100_000)
            totals.append(n)
            samples.append(list(range(0, n, self.every_n))[:32])
            fps_out.append(fps)
        batch = batch.append_column("n_frames_total", pa.array(totals, type=pa.int64()))
        batch = batch.append_column(
            "sampled_frames", pa.array(samples, type=pa.list_(pa.int32()))
        )
        return batch.append_column("fps", pa.array(fps_out, type=pa.int32()))


def decode_html(ds, html_col: str = "html", batch_size: int = 256):
    """Stateless tag-strip stage (small batches: binary payloads)."""
    return ds.map_batches(
        html_to_text_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        fn_kwargs={"html_col": html_col},
    )


def decode_images(ds, image_col: str = "image", fake: bool = False, concurrency=2, batch_size: int = 64):
    return ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"image_col": image_col, "fake": fake},
    )
