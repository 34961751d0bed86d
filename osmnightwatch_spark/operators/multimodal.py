"""Multimodal binary-column operators beyond images: resize, video
frame-sampling, audio features.

Design rule (SURVEY §7.0 environment constraints): every operator's
Spark-side plumbing — schema, Arrow batching, partitioning, explode
shapes — is REAL and tested; the only stubs are the external-format
decoders (JPEG/MP4/MP3 libraries don't ship in this container), which
raise ``NotImplementedError`` exactly like ``functions.codecs`` does
for unsupported image formats. The container formats the engine owns
are fully implemented:

* images: ``raw``/``ppm``/``lossy1`` (functions/codecs.py);
* video: ``rawvid`` — a length-prefixed concatenation of raw RGB
  frames (n_frames × h × w × 3 bytes);
* audio: ``pcm16`` — little-endian signed 16-bit mono samples.

All kernels are ``mapInPandas`` (Arrow batches, no per-row Python at
the plan level); per-item loops inside a batch are inherent to
variable-size binaries, exactly as in ``images_ops``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..functions import codecs as K

RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"
FRAME_SCHEMA = ("video_id string, frame_idx int, bytes binary, w int, h int,"
                " fmt string")
AUDIO_SCHEMA = ("audio_id string, n_samples long, rms double,"
                " zero_crossings long, peak int")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (pure index arithmetic)."""
    h, w, _ = img.shape
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi[:, None], xi[None, :], :]


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode raw.

    Input: input_hint-shaped images table; output keeps ``image_id``
    with normalized (w, h) and ``fmt='raw'`` — the shape a training
    pipeline feeds to a fixed-input-size model."""

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt")}
            for img_id, buf, fmt, w_, h_ in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                img = K.decode(buf, fmt, int(w_), int(h_))
                rs = resize_nearest(img, out_w, out_h)
                out["image_id"].append(img_id)
                out["bytes"].append(rs.tobytes())
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append("raw")
            pdf_out = pd.DataFrame(out)
            pdf_out["w"] = pdf_out["w"].astype("int32")
            pdf_out["h"] = pdf_out["h"].astype("int32")
            yield pdf_out

    return images.mapInPandas(kernel, RESIZE_SCHEMA)


def encode_rawvid(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 → the engine's rawvid container bytes."""
    return frames.astype(np.uint8).tobytes()


def frame_sample(videos: DataFrame, every_n: int = 10,
                 max_frames: int | None = None) -> DataFrame:
    """Sample every ``every_n``-th frame of each video into image rows.

    Input: videos(video_id STRING, bytes BINARY, w INT, h INT,
    n_frames INT, fmt STRING). ``rawvid`` decodes for real; external
    containers (mp4/webm) raise ``NotImplementedError`` — the stub is
    the codec, never the plumbing. Output explodes one row per sampled
    frame (raw RGB), the shape a frame-level featurizer consumes."""

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("video_id", "frame_idx", "bytes", "w", "h",
                                   "fmt")}
            for vid, buf, w_, h_, nf, fmt in zip(
                pdf["video_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["n_frames"], pdf["fmt"]
            ):
                if fmt != "rawvid":
                    raise NotImplementedError(
                        f"video container {fmt!r} needs an external decoder "
                        f"(not shipped in this environment); use 'rawvid'")
                w_, h_, nf = int(w_), int(h_), int(nf)
                frames = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(
                    nf, h_, w_, 3)
                idxs = list(range(0, nf, every_n))
                if max_frames is not None:
                    idxs = idxs[:max_frames]
                for i in idxs:
                    out["video_id"].append(vid)
                    out["frame_idx"].append(i)
                    out["bytes"].append(frames[i].tobytes())
                    out["w"].append(w_)
                    out["h"].append(h_)
                    out["fmt"].append("raw")
            pdf_out = pd.DataFrame(out)
            pdf_out["frame_idx"] = pdf_out["frame_idx"].astype("int32")
            pdf_out["w"] = pdf_out["w"].astype("int32")
            pdf_out["h"] = pdf_out["h"].astype("int32")
            yield pdf_out

    return videos.mapInPandas(kernel, FRAME_SCHEMA)


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip scalar features over pcm16 buffers: RMS, zero-crossing
    count, peak amplitude — the text-quality-scoring analog for audio.
    External formats (mp3/flac) raise ``NotImplementedError``."""

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "n_samples", "rms",
                                   "zero_crossings", "peak")}
            for aid, buf, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf["fmt"]):
                if fmt != "pcm16":
                    raise NotImplementedError(
                        f"audio format {fmt!r} needs an external decoder "
                        f"(not shipped in this environment); use 'pcm16'")
                s = np.frombuffer(bytes(buf), dtype="<i2").astype(np.float64)
                out["audio_id"].append(aid)
                out["n_samples"].append(len(s))
                out["rms"].append(float(np.sqrt(np.mean(s * s))) if len(s) else 0.0)
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))))
                out["peak"].append(int(np.abs(s).max()) if len(s) else 0)
            yield pd.DataFrame(out)

    return audio.mapInPandas(kernel, AUDIO_SCHEMA)
