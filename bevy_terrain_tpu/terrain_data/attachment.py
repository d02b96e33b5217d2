"""In-RAM tile pixel payloads: (de)serialization, mipmaps, CPU sampling.

Behavioral twin of ``AttachmentData`` (reference
src/terrain_data/mod.rs:112-264), with numpy arrays instead of Vecs:

* payload layout: row-major (texture_size, texture_size, channels) in the
  attachment's native dtype; disk bytes are the raw little-endian pixels of
  mip 0 only (mipmaps regenerate at load, tile_atlas.rs:141)
* mipmap rule: 2x2 box filter; the R16 variant skips zero texels
  (nodata) and averages only the valid ones (mod.rs:168-198)
* sampling: bilinear with the GPU half-texel convention (mod.rs:221-264)
"""

from __future__ import annotations

import numpy as np

from bevy_terrain_tpu.config import AttachmentConfig, AttachmentFormat


def data_from_bytes(data: bytes, config: AttachmentConfig) -> np.ndarray:
    """Raw mip-0 bytes -> (H, W, C) array (reference mod.rs:125-132)."""
    fmt = config.format
    if fmt == AttachmentFormat.RGB8:
        raise NotImplementedError("Rgb8 payloads cannot be represented (mod.rs:115,127)")
    arr = np.frombuffer(data, dtype=fmt.dtype.newbyteorder("<"))
    size = config.texture_size
    expected = size * size * fmt.channels
    if arr.size != expected:
        raise ValueError(
            f"payload has {arr.size} texels, expected {expected} "
            f"({size}x{size}x{fmt.channels})"
        )
    return arr.reshape(size, size, fmt.channels).astype(fmt.dtype)


def data_to_bytes(data: np.ndarray) -> bytes:
    """(H, W, C) array -> raw little-endian bytes (reference mod.rs:134-141)."""
    return np.ascontiguousarray(data).astype(data.dtype.newbyteorder("<")).tobytes()


def generate_mipmaps(mip0: np.ndarray, mip_level_count: int) -> list[np.ndarray]:
    """Box-filtered mip chain [mip0, mip1, ...] (reference mod.rs:143-219).

    uint16 single-channel data uses the nodata-aware average (zero texels
    excluded, all-zero quad stays zero — mod.rs:168-198); other formats use
    the plain truncating average (mod.rs:144-166).
    """
    mips = [mip0]
    nodata_aware = mip0.dtype == np.uint16 and mip0.shape[-1] == 1
    for _ in range(1, mip_level_count):
        parent = mips[-1]
        h, w, c = parent.shape
        quads = parent.reshape(h // 2, 2, w // 2, 2, c).transpose(0, 2, 1, 3, 4)
        quads = quads.reshape(h // 2, w // 2, 4, c).astype(np.uint64)
        if nodata_aware:
            valid = quads != 0
            count = valid.sum(axis=2)
            total = quads.sum(axis=2)
            child = np.zeros((h // 2, w // 2, c), np.uint64)
            np.divide(total, count, out=child, where=count > 0, casting="unsafe")
        else:
            child = quads.sum(axis=2) // 4
        mips.append(child.astype(parent.dtype))
    return mips


def sample_bilinear_host(data: np.ndarray, uv: np.ndarray, max_value: float) -> np.ndarray:
    """CPU bilinear sample with the half-texel convention (mod.rs:221-264).

    ``uv`` f64 (..., 2) in [0, 1]; returns (..., 4) f32-style values in
    [0, 1] padded to 4 channels like the reference's Vec4.
    """
    size = data.shape[0]
    c = data.shape[-1]
    uvs = np.asarray(uv, np.float64) * size - 0.5
    base = np.floor(uvs).astype(np.int64)
    frac = uvs - base
    out = np.zeros(uvs.shape[:-1] + (4,), np.float64)

    def texel(ix, iy):
        ix = np.clip(ix, 0, size - 1)
        iy = np.clip(iy, 0, size - 1)
        v = data[iy, ix].astype(np.float64) / max_value  # row-major: [y, x]
        pad = np.zeros(v.shape[:-1] + (4,), np.float64)
        pad[..., :c] = v
        return pad

    v00 = texel(base[..., 0], base[..., 1])
    v10 = texel(base[..., 0] + 1, base[..., 1])
    v01 = texel(base[..., 0], base[..., 1] + 1)
    v11 = texel(base[..., 0] + 1, base[..., 1] + 1)

    fx = frac[..., 0:1]
    fy = frac[..., 1:2]
    # reference lerp order (mod.rs:259-263): y then x
    left = v00 + (v01 - v00) * fy
    right = v10 + (v11 - v10) * fy
    return left + (right - left) * fx
