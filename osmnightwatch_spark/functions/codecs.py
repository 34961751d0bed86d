"""Image codecs + perceptual hash — closed-world numpy implementations.

The graft input (BASELINE.json ``input_hint``) is an image+caption
table ``(image_id, bytes, w, h, fmt, caption, phash)``. No image
libraries exist in this environment, so the engine defines its own
three formats (the synthetic generator in ``sources/images.py`` emits
exactly these, keeping the world closed):

* ``raw``    — H×W×3 uint8, C-order, no header (lossless);
* ``ppm``    — binary PPM P6 with maxval 255 (lossless);
* ``lossy1`` — engine-defined lossy codec: per-8×8-block DCT-II on
  each channel, quantized by a fixed table, zigzag-free row-major
  int16 storage. Round-trip PSNR ≥ 40 dB by construction (quant steps
  are small); the per-row invariant required by input_hint.

Everything is vectorized numpy; the Spark surface is
``mapInPandas`` / pandas UDFs over the ``bytes`` BinaryType column —
never per-row Python at the plan level.

Real-world decode (JPEG/PNG) would slot in here behind the same
``decode(buf, fmt, w, h)`` signature; those branches raise
``NotImplementedError`` with the dependency named.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# DCT basis for the lossy1 codec (8×8, orthonormal DCT-II)
# ---------------------------------------------------------------------------

_N = 8
_k = np.arange(_N)
_DCT = np.sqrt(2.0 / _N) * np.cos(np.pi * (2 * _k[None, :] + 1) * _k[:, None] / (2 * _N))
_DCT[0, :] = 1.0 / np.sqrt(_N)
# fixed quant table: DC fine, HF coarser — keeps PSNR >= 40dB
_QUANT = (1.0 + 0.5 * (_k[:, None] + _k[None, :])).astype(np.float64)


def _blockify(img: np.ndarray) -> tuple[np.ndarray, int, int]:
    """HxWxC uint8 → (nblocks, 8, 8, C) float64 with edge padding."""
    h, w, c = img.shape
    ph = (-h) % _N
    pw = (-w) % _N
    img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge").astype(np.float64)
    H, W = h + ph, w + pw
    blocks = (
        img.reshape(H // _N, _N, W // _N, _N, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, _N, _N, c)
    )
    return blocks, H, W


def _unblockify(blocks: np.ndarray, H: int, W: int, h: int, w: int) -> np.ndarray:
    c = blocks.shape[-1]
    img = (
        blocks.reshape(H // _N, W // _N, _N, _N, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(H, W, c)
    )
    return img[:h, :w, :]


def encode_lossy1(img: np.ndarray) -> bytes:
    """HxWx3 uint8 → lossy1 bytes (int16 quantized DCT coefficients)."""
    h, w, _ = img.shape
    blocks, H, W = _blockify(img)
    shifted = blocks - 128.0
    coef = np.einsum("ij,bjkc,lk->bilc", _DCT, shifted, _DCT)
    q = np.round(coef / _QUANT[None, :, :, None]).astype(np.int16)
    return q.astype("<i2").tobytes()


def decode_lossy1(buf: bytes, w: int, h: int) -> np.ndarray:
    H = h + ((-h) % _N)
    W = w + ((-w) % _N)
    nblocks = (H // _N) * (W // _N)
    q = np.frombuffer(buf, dtype="<i2").astype(np.float64).reshape(nblocks, _N, _N, 3)
    coef = q * _QUANT[None, :, :, None]
    blocks = np.einsum("ji,bjkc,kl->bilc", _DCT, coef, _DCT) + 128.0
    img = _unblockify(blocks, H, W, h, w)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    # header: P6\n<w> <h>\n255\n
    nl2 = buf.index(b"\n", buf.index(b"\n", 3) + 1)
    dims = buf[3 : buf.index(b"\n", 3)].split()
    w, h = int(dims[0]), int(dims[1])
    return np.frombuffer(buf, dtype=np.uint8, offset=nl2 + 1, count=h * w * 3).reshape(h, w, 3)


def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return img.astype(np.uint8).tobytes()
    if fmt == "ppm":
        return encode_ppm(img)
    if fmt == "lossy1":
        return encode_lossy1(img)
    raise NotImplementedError(
        f"fmt={fmt!r}: real-world codecs (jpeg/png) need an image library "
        "not present in this environment; plumbing is format-agnostic"
    )


def decode(buf: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return np.frombuffer(buf, dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)
    if fmt == "ppm":
        return decode_ppm(buf)
    if fmt == "lossy1":
        return decode_lossy1(buf, w, h)
    raise NotImplementedError(f"fmt={fmt!r} (see encode())")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(img: np.ndarray) -> int:
    """Deterministic 64-bit perceptual hash: 32×32 grayscale → 8×8 DCT
    low-frequency block → sign-vs-median bits. Pure numpy."""
    h, w, _ = img.shape
    gray = img.astype(np.float64).mean(axis=2)
    # area-average resize to 32x32 via index binning (deterministic)
    yi = (np.arange(32)[:, None] * h) // 32
    xi = (np.arange(32)[None, :] * w) // 32
    small = gray[yi, xi]
    k = np.arange(32)
    D = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 64.0)
    coef = D @ small @ D.T
    block = coef[:8, :8].ravel()
    med = np.median(block[1:])  # skip DC
    bits = (block > med).astype(np.uint8)
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.uint64(val).astype(np.int64))  # signed int64 for Spark LongType


def lonlat_from_phash(phash: np.ndarray, city_frac: float = 0.0,
                      cities: np.ndarray | None = None):
    """Documented deterministic geotag derivation (shared by engine,
    generator, tests and the SQL oracle):

        lon = -180 + (phash mod 2^32) / 2^32 * 360
        lat =  -85 + ((phash >> 32) mod 2^32) / 2^32 * 170

    phash is interpreted as unsigned 64-bit. ``sources/images.py``
    plants skew by overriding a fraction of rows into "city" centers
    *before* hashing is consumed downstream (skew lives in the data,
    not this formula).
    """
    u = np.asarray(phash, dtype=np.int64).astype(np.uint64)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.float64)
    hi = ((u >> np.uint64(32)) & np.uint64(0xFFFFFFFF)).astype(np.float64)
    lon = -180.0 + lo / 4294967296.0 * 360.0
    lat = -85.0 + hi / 4294967296.0 * 170.0
    return lon, lat


LONLAT_SQL = (
    # DuckDB rendering of lonlat_from_phash over a BIGINT column {p}
    "(-180.0 + (({p}) & 4294967295) / 4294967296.0 * 360.0)",
    "(-85.0 + ((({p}) >> 32) & 4294967295) / 4294967296.0 * 170.0)",
)
