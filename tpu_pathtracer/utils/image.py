"""Image IO: PNG (via PIL), PPM, and a self-contained OpenEXR codec.

Replaces the reference's `sutil::loadImage` / `sutil::saveImage` (used at
reference optixSphere.cpp:359, 836, 1489).  The reference loads 8-bit PNG
textures (converted to float4 by /255, cpp:366-380) and float EXR
environment maps.

The EXR implementation here is written from the public OpenEXR 2.0 file
format specification: scanline images, NO_COMPRESSION / ZIPS / ZIP
(zlib + delta-predictor + two-half deinterleave), HALF / FLOAT / UINT
channels.  That covers every file Blender/Photoshop-era tools produce for
HDR environments (the reference's env1-5.exr are stripped from the repo;
`procedural_hdr` synthesizes test substitutes).
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# PNG / generic LDR via PIL
# ---------------------------------------------------------------------------


def load_image(path: str) -> np.ndarray:
    """Load PNG/JPG/...; returns float32 [H,W,3] in [0,1] (u8/255 like the
    reference's texture conversion, cpp:366-380).  EXR routed to load_exr."""
    if str(path).lower().endswith(".exr"):
        return load_exr(path)
    from PIL import Image

    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr


def save_png(path: str, rgb_u8: np.ndarray) -> None:
    """Save [H,W,3] uint8 (row 0 = top)."""
    from PIL import Image

    Image.fromarray(np.ascontiguousarray(rgb_u8), "RGB").save(path)


def save_ppm(path: str, rgb_u8: np.ndarray) -> None:
    h, w = rgb_u8.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(np.ascontiguousarray(rgb_u8).tobytes())


def save_image(path: str, rgb_u8: np.ndarray) -> None:
    """PNG or PPM by extension (sutil::saveImage equivalent, cpp:1489)."""
    p = str(path).lower()
    if p.endswith(".ppm"):
        save_ppm(path, rgb_u8)
    elif p.endswith(".exr"):
        save_exr(path, rgb_u8.astype(np.float32))
    else:
        save_png(path, rgb_u8)


# ---------------------------------------------------------------------------
# OpenEXR scanline codec (subset: what HDR environment maps actually use)
# ---------------------------------------------------------------------------

_EXR_MAGIC = 20000630
_PT_UINT, _PT_HALF, _PT_FLOAT = 0, 1, 2
_PT_BYTES = {_PT_UINT: 4, _PT_HALF: 2, _PT_FLOAT: 4}
_PT_DTYPE = {_PT_UINT: np.uint32, _PT_HALF: np.float16, _PT_FLOAT: np.float32}
# compression ids
_NO_COMP, _RLE, _ZIPS, _ZIP = 0, 1, 2, 3
_LINES_PER_BLOCK = {_NO_COMP: 1, _ZIPS: 1, _ZIP: 16}


def _read_cstr(buf: bytes, off: int) -> Tuple[str, int]:
    end = buf.index(b"\x00", off)
    return buf[off:end].decode("latin-1"), end + 1


def _exr_unpredict(data: bytes) -> bytes:
    """Invert ZIP post-deflate transform: delta-decode, then deinterleave."""
    arr = np.frombuffer(data, np.uint8).astype(np.int16)
    # delta decode: d[i] += d[i-1] - 128 (sequential; use cumsum)
    deltas = arr.copy()
    deltas[1:] = (arr[1:] - 128).astype(np.int16)
    out = np.cumsum(deltas, dtype=np.int64).astype(np.uint8)
    # deinterleave: first half -> even bytes, second half -> odd bytes
    n = len(out)
    half = (n + 1) // 2
    result = np.empty(n, np.uint8)
    result[0::2] = out[:half]
    result[1::2] = out[half:]
    return result.tobytes()


def _exr_predict(data: bytes) -> bytes:
    """Forward ZIP pre-deflate transform (interleave + delta-encode)."""
    arr = np.frombuffer(data, np.uint8)
    n = len(arr)
    half = (n + 1) // 2
    inter = np.empty(n, np.uint8)
    inter[:half] = arr[0::2]
    inter[half:] = arr[1::2]
    out = inter.astype(np.int16)
    out[1:] = (inter[1:].astype(np.int16) - inter[:-1].astype(np.int16) + 128)
    return out.astype(np.uint8).tobytes()


def load_exr(path: str) -> np.ndarray:
    """Read a scanline EXR; returns float32 [H,W,3] (R,G,B; missing channels
    filled with the luminance channel or zeros)."""
    with open(path, "rb") as f:
        buf = f.read()

    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _EXR_MAGIC:
        raise ValueError(f"{path}: not an EXR file")
    if version & 0x200:
        raise ValueError(f"{path}: tiled EXR not supported")
    off = 8

    # --- parse header attributes ---
    channels = []  # list of (name, pixel_type)
    compression = _NO_COMP
    data_window = None
    while True:
        name, off = _read_cstr(buf, off)
        if name == "":
            break
        atype, off = _read_cstr(buf, off)
        (size,) = struct.unpack_from("<i", buf, off)
        off += 4
        payload = buf[off : off + size]
        off += size
        if name == "channels" and atype == "chlist":
            p = 0
            while payload[p] != 0:
                cname, p = _read_cstr(payload, p)
                # entry: pixelType i32, pLinear u8 + 3 reserved, xSampling
                # i32, ySampling i32 = 16 bytes
                (ptype,) = struct.unpack_from("<i", payload, p)
                p += 16
                channels.append((cname, ptype))
            # chlist is stored alphabetically already, but be safe:
            channels.sort(key=lambda c: c[0])
        elif name == "compression":
            compression = payload[0]
        elif name == "dataWindow":
            data_window = struct.unpack("<iiii", payload)

    if data_window is None or not channels:
        raise ValueError(f"{path}: missing required EXR attributes")
    if compression not in _LINES_PER_BLOCK:
        raise ValueError(f"{path}: unsupported EXR compression {compression}")

    xmin, ymin, xmax, ymax = data_window
    width = xmax - xmin + 1
    height = ymax - ymin + 1
    lines_per_block = _LINES_PER_BLOCK[compression]
    num_blocks = (height + lines_per_block - 1) // lines_per_block

    # --- scanline offset table ---
    offsets = struct.unpack_from("<%dQ" % num_blocks, buf, off)

    per_line_bytes = sum(width * _PT_BYTES[pt] for _, pt in channels)
    chan_data: Dict[str, np.ndarray] = {
        cname: np.zeros((height, width), np.float32) for cname, _ in channels
    }

    for block_off in offsets:
        y, size = struct.unpack_from("<ii", buf, block_off)
        raw = buf[block_off + 8 : block_off + 8 + size]
        n_lines = min(lines_per_block, ymax - y + 1)
        expect = per_line_bytes * n_lines
        if compression in (_ZIPS, _ZIP):
            if size < expect:  # compressed only when it helps (spec)
                raw = _exr_unpredict(zlib.decompress(raw))
        p = 0
        for line in range(n_lines):
            yy = y - ymin + line
            for cname, ptype in channels:
                nbytes = width * _PT_BYTES[ptype]
                vals = np.frombuffer(raw, _PT_DTYPE[ptype], count=width, offset=p)
                chan_data[cname][yy] = vals.astype(np.float32)
                p += nbytes

    def pick(*names):
        for n in names:
            if n in chan_data:
                return chan_data[n]
        return None

    r = pick("R", "Y")
    g = pick("G", "Y")
    b = pick("B", "Y")
    zero = np.zeros((height, width), np.float32)
    return np.stack([x if x is not None else zero for x in (r, g, b)], axis=-1)


def save_exr(path: str, rgb: np.ndarray, compression: int = _ZIP) -> None:
    """Write float32 [H,W,3] as scanline EXR (FLOAT channels, ZIP)."""
    rgb = np.asarray(rgb, np.float32)
    h, w = rgb.shape[:2]

    def attr(name: str, atype: str, payload: bytes) -> bytes:
        return (
            name.encode() + b"\x00" + atype.encode() + b"\x00"
            + struct.pack("<i", len(payload)) + payload
        )

    # channels: B, G, R (alphabetical), FLOAT
    chlist = b""
    for cname in (b"B", b"G", b"R"):
        # pixelType i32, pLinear u8 + 3 reserved, xSampling i32, ySampling i32
        chlist += cname + b"\x00" + struct.pack("<i4Bii", _PT_FLOAT, 0, 0, 0, 0, 1, 1)
    chlist += b"\x00"

    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = b""
    header += attr("channels", "chlist", chlist)
    header += attr("compression", "compression", bytes([compression]))
    header += attr("dataWindow", "box2i", box)
    header += attr("displayWindow", "box2i", box)
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    lines_per_block = _LINES_PER_BLOCK[compression]
    num_blocks = (h + lines_per_block - 1) // lines_per_block

    blocks = []
    for bi in range(num_blocks):
        y0 = bi * lines_per_block
        n_lines = min(lines_per_block, h - y0)
        parts = []
        for line in range(n_lines):
            row = rgb[y0 + line]
            for ci in (2, 1, 0):  # B, G, R order
                parts.append(row[:, ci].astype("<f4").tobytes())
        raw = b"".join(parts)
        if compression in (_ZIPS, _ZIP):
            comp = zlib.compress(_exr_predict(raw))
            data = comp if len(comp) < len(raw) else raw
        else:
            data = raw
        blocks.append((y0, data))

    base = 8 + len(header) + 8 * num_blocks
    out = [struct.pack("<ii", _EXR_MAGIC, 2), header]
    offsets = []
    pos = base
    for y0, data in blocks:
        offsets.append(pos)
        pos += 8 + len(data)
    out.append(struct.pack("<%dQ" % num_blocks, *offsets))
    for y0, data in blocks:
        out.append(struct.pack("<ii", y0, len(data)))
        out.append(data)
    with open(path, "wb") as f:
        f.write(b"".join(out))


# ---------------------------------------------------------------------------
# Procedural HDR environments (substitutes for the stripped env1-5.exr)
# ---------------------------------------------------------------------------


def procedural_hdr(
    height: int = 256,
    width: int = 512,
    sun_dir=(0.0, 2.0, 3.0),
    sun_intensity: float = 200.0,
    seed: int = 0,
) -> np.ndarray:
    """Synthesize an equirect HDR: gradient sky + warm sun disc + ground.

    Stands in for the reference's stripped env1-5.exr assets
    (.MISSING_LARGE_BLOBS); intensity scale mirrors the procedural sun+sky
    in the miss program (reference optixSphere.cu:552-557)."""
    v, u = np.meshgrid(
        (np.arange(height) + 0.5) / height,
        (np.arange(width) + 0.5) / width,
        indexing="ij",
    )
    phi = (u - 0.5) * 2.0 * np.pi
    theta = (0.5 - v) * np.pi
    y = np.sin(theta)
    c = np.cos(theta)
    dirs = np.stack([c * np.cos(phi), y, c * np.sin(phi)], axis=-1)

    sd = np.asarray(sun_dir, np.float64)
    sd = sd / np.linalg.norm(sd)
    cos_sun = dirs @ sd

    horizon = np.array([0.55, 0.6, 0.7])
    zenith = np.array([0.15, 0.25, 0.5])
    tsky = np.clip(y, 0.0, 1.0)[..., None]
    sky = horizon + (zenith - horizon) * tsky
    ground = np.array([0.25, 0.2, 0.15]) * (1.0 + 0.3 * np.clip(-y, 0, 1))[..., None]
    img = np.where(y[..., None] >= 0.0, sky, ground)

    sun_col = np.array([1.0, 0.875, 0.625]) * sun_intensity
    disc = np.clip((cos_sun - 0.995) / 0.005, 0.0, 1.0) ** 2
    img = img + disc[..., None] * sun_col
    # mild warm glow around the sun
    glow = np.clip(cos_sun, 0.0, 1.0) ** 32
    img = img + glow[..., None] * np.array([1.5, 1.0, 0.5])

    rs = np.random.RandomState(seed)
    img *= 1.0 + 0.02 * rs.randn(height, width, 1)
    return np.maximum(img, 0.0).astype(np.float32)
