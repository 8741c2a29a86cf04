"""Packed feature store: one mmap'd blob instead of per-image pickled .npy.

The reference loads a pickled dict per image per __getitem__
(base_dataset.py:27-34) — unpickle + allocation dominates host time and
starves the TPU.  `pack_features` converts a feature directory once into a
contiguous binary pack; `PackedFeatureStore` serves per-image dicts from an
mmap with zero-copy views, using the native C++ gather library
(native/feature_pack.cc, built by native/build.sh) when present and a pure
numpy mmap fallback otherwise.

Pack layout (little endian):
  b"OVQAPACK" | u64 header_len | header json | payload (f32 blocks)
header: {"keys": [k...], "shapes": {key: [n, d]}, "images": {id: payload_row},
         "row_bytes": int}   — each image's payload is the concatenation of
its keys' (n, d) float32 blocks in `keys` order, all images same shape
(static shapes are a framework invariant).
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
from typing import Dict, List, Optional, Sequence

import numpy as np

MAGIC = b"OVQAPACK"

_NATIVE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libovqa_pack.so",
)


def _load_native():
    if not os.path.isfile(_NATIVE_PATH):
        return None
    try:
        lib = ctypes.CDLL(_NATIVE_PATH)
    except OSError:
        return None
    lib.ovqa_pack_open.restype = ctypes.c_void_p
    lib.ovqa_pack_open.argtypes = [ctypes.c_char_p]
    lib.ovqa_pack_close.argtypes = [ctypes.c_void_p]
    lib.ovqa_pack_gather.restype = ctypes.c_int
    lib.ovqa_pack_gather.argtypes = [
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    return lib


_native = None
_native_checked = False


def native_library():
    global _native, _native_checked
    if not _native_checked:
        _native = _load_native()
        _native_checked = True
    return _native


def pack_features(
    feature_dir: str,
    out_path: str,
    keys: Optional[Sequence[str]] = None,
    pad_rows: Optional[Dict[str, int]] = None,
) -> Dict:
    """Convert a directory of {image_id}.npy dicts into one pack file."""
    files = sorted(
        f for f in os.listdir(feature_dir) if f.endswith(".npy")
    )
    if not files:
        raise FileNotFoundError(f"no .npy feature files in {feature_dir}")

    first = np.load(os.path.join(feature_dir, files[0]), allow_pickle=True)[()]
    if keys is None:
        keys = [
            k
            for k, v in first.items()
            if isinstance(v, np.ndarray) and v.dtype != object and v.ndim >= 1
        ]
    pad_rows = dict(pad_rows or {})
    shapes = {}
    for key in keys:
        value = np.asarray(first[key], np.float32)
        if value.ndim == 1:
            value = value[:, None]
        rows = pad_rows.get(key, value.shape[0])
        shapes[key] = [int(rows), int(value.shape[1])]

    row_bytes = sum(n * d * 4 for n, d in shapes.values())
    images = {}
    with open(out_path, "wb") as out:
        out.write(MAGIC)
        header_pos = out.tell()
        out.write(struct.pack("<Q", 0))  # patched later
        placeholder_written = out.tell()

        payload = []
        for row, fname in enumerate(files):
            image_id = os.path.splitext(fname)[0]
            raw = np.load(os.path.join(feature_dir, fname), allow_pickle=True)[()]
            blocks = []
            for key in keys:
                value = np.asarray(raw[key], np.float32)
                if value.ndim == 1:
                    value = value[:, None]
                n, d = shapes[key]
                block = np.zeros((n, d), np.float32)
                usable = min(n, value.shape[0])
                block[:usable] = value[:usable, :d]
                blocks.append(block.reshape(-1))
            payload.append(np.concatenate(blocks))
            images[image_id] = row

        header = json.dumps(
            {
                "keys": list(keys),
                "shapes": shapes,
                "images": images,
                "row_bytes": row_bytes,
            }
        ).encode()
        out.write(header)
        payload_arr = np.concatenate(payload).astype("<f4")
        out.write(payload_arr.tobytes())
        out.seek(header_pos)
        out.write(struct.pack("<Q", len(header)))
    return {"keys": list(keys), "shapes": shapes, "n_images": len(images)}


class PackedFeatureStore:
    """Per-image feature dicts from a pack file (native gather or mmap)."""

    def __init__(self, pack_path: str, use_native: bool = True):
        with open(pack_path, "rb") as handle:
            magic = handle.read(8)
            if magic != MAGIC:
                raise ValueError(f"{pack_path} is not a feature pack")
            (header_len,) = struct.unpack("<Q", handle.read(8))
            header = json.loads(handle.read(header_len))
        self.keys: List[str] = header["keys"]
        self.shapes = {k: tuple(v) for k, v in header["shapes"].items()}
        self.images: Dict[str, int] = header["images"]
        self.row_bytes: int = header["row_bytes"]
        self.payload_offset = 8 + 8 + header_len
        self._offsets = {}
        offset = 0
        for key in self.keys:
            n, d = self.shapes[key]
            self._offsets[key] = offset
            offset += n * d * 4

        self._mmap = np.memmap(pack_path, dtype=np.uint8, mode="r")
        self._lib = native_library() if use_native else None
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.ovqa_pack_open(pack_path.encode())
            if not self._handle:
                self._lib = None

    def __contains__(self, image_id) -> bool:
        return str(image_id) in self.images

    def _row_offset(self, image_id) -> int:
        return self.payload_offset + self.images[str(image_id)] * self.row_bytes

    def get(self, image_id) -> Dict[str, np.ndarray]:
        base = self._row_offset(image_id)
        out = {}
        for key in self.keys:
            n, d = self.shapes[key]
            start = base + self._offsets[key]
            view = self._mmap[start : start + n * d * 4]
            array = np.frombuffer(view, dtype="<f4").reshape(n, d)
            out[key] = array.squeeze(-1) if d == 1 else array
        return out

    def gather(
        self, image_ids: Sequence, key: str
    ) -> np.ndarray:
        """Batched gather of one key for many images -> (len(ids), n, d).

        Uses the native threaded memcpy when available."""
        n, d = self.shapes[key]
        bytes_per = n * d * 4
        out = np.empty((len(image_ids), n, d), np.float32)
        if self._lib is not None and self._handle:
            src = (ctypes.c_uint64 * len(image_ids))(
                *[self._row_offset(i) + self._offsets[key] for i in image_ids]
            )
            sizes = (ctypes.c_uint64 * len(image_ids))(
                *([bytes_per] * len(image_ids))
            )
            dst_offsets = (ctypes.c_uint64 * len(image_ids))(
                *[i * bytes_per for i in range(len(image_ids))]
            )
            rc = self._lib.ovqa_pack_gather(
                ctypes.c_void_p(self._handle),
                len(image_ids),
                src,
                sizes,
                out.ctypes.data_as(ctypes.c_char_p),
                dst_offsets,
            )
            if rc == 0:
                return out
        for i, image_id in enumerate(image_ids):
            out[i] = self.get(image_id)[key].reshape(n, d)
        return out

    def close(self):
        if self._lib is not None and self._handle:
            self._lib.ovqa_pack_close(ctypes.c_void_p(self._handle))
            self._handle = None
